"""DataDog DDSketch wire-format codec (pure Python).

Implements the binary encoding used by ``github.com/DataDog/sketches-go``
v1.4.7 so that sketches produced by this engine are byte-compatible with the
reference DuckDB extension (see ``/root/reference/src/datadog_encoding.rs``,
notably lines 103-217 for the varint/varfloat primitives and 306-595 for the
section codec — re-derived here from the wire-format description, not
translated).

Wire layout: a stream of sections, each introduced by a flag byte whose two
least-significant bits select the section type and whose six most-significant
bits are a subflag:

* ``IndexMapping`` (type 0b10): gamma and index_offset as float64
  little-endian (subflag 0 = logarithmic mapping).
* ``PositiveStore`` / ``NegativeStore`` (0b01 / 0b11): bin payload; subflag 1
  = IndexDeltasAndCounts (uvarint bin count then per bin zig-zag-varint delta
  index + varfloat64 count), subflag 2 = IndexDeltas (implicit count 1),
  subflag 3 = ContiguousCounts (start index, index delta, then counts).
* ``SketchFeatures`` (0b00): subflag 1 zero-count (varfloat64); decoders also
  accept sum/min/max (0x21/0x22/0x23, float64LE) and count (0x28, varfloat64)
  but the encoder intentionally never writes them — Go's decoder mishandles
  FlagCount, so stats are recomputed from bins on decode.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_uvarint64",
    "decode_uvarint64",
    "encode_varint64",
    "decode_varint64",
    "encode_varfloat64",
    "decode_varfloat64",
    "encode_float64_le",
    "decode_float64_le",
]

_U64 = (1 << 64) - 1
_VARFLOAT_ROTATE = 6
_MAX_VAR_LEN_64 = 9
_FLOAT_BITS_1 = struct.unpack("<Q", struct.pack("<d", 1.0))[0]

# Flag types (2 LSB of the flag byte).
FLAG_SKETCH_FEATURES = 0b00
FLAG_POSITIVE_STORE = 0b01
FLAG_INDEX_MAPPING = 0b10
FLAG_NEGATIVE_STORE = 0b11

# SketchFeatures subflags.
SUBFLAG_ZERO_COUNT = 0x01
SUBFLAG_SUM = 0x21
SUBFLAG_MIN = 0x22
SUBFLAG_MAX = 0x23
SUBFLAG_COUNT = 0x28

# Store bin-encoding subflags.
SUBFLAG_INDEX_DELTAS_AND_COUNTS = 1
SUBFLAG_INDEX_DELTAS = 2
SUBFLAG_CONTIGUOUS_COUNTS = 3

# IndexMapping subflags.
SUBFLAG_LOG_MAPPING = 0


def make_flag(flag_type: int, subflag: int) -> int:
    return ((subflag << 2) | flag_type) & 0xFF


def flag_type_of(flag: int) -> int:
    return flag & 0b11


def subflag_of(flag: int) -> int:
    return flag >> 2


# ---------------------------------------------------------------------------
# Primitive codecs
# ---------------------------------------------------------------------------


def encode_uvarint64(buf: bytearray, value: int) -> None:
    """LEB128-style unsigned varint: 7 bits/byte, MSB = continuation."""
    value &= _U64
    while value >= 0x80:
        buf.append((value & 0x7F) | 0x80)
        value >>= 7
    buf.append(value)


def decode_uvarint64(data: bytes, pos: int) -> tuple[int, int]:
    """Return (value, new_pos). Raises ValueError on overflow/truncation."""
    result = 0
    shift = 0
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated uvarint")
        byte = data[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if byte < 0x80:
            break
        shift += 7
        if shift >= 64:
            raise ValueError("uvarint overflow")
    return result & _U64, pos


def encode_varint64(buf: bytearray, value: int) -> None:
    """Signed varint via zig-zag: (v << 1) ^ (v >> 63) in 64-bit arithmetic."""
    zigzag = ((value << 1) ^ (value >> 63)) & _U64
    encode_uvarint64(buf, zigzag)


def decode_varint64(data: bytes, pos: int) -> tuple[int, int]:
    zigzag, pos = decode_uvarint64(data, pos)
    return (zigzag >> 1) ^ -(zigzag & 1), pos


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _U64


def _rotr64(x: int, r: int) -> int:
    return ((x >> r) | (x << (64 - r))) & _U64


def encode_varfloat64(buf: bytearray, v: float) -> None:
    """DataDog varfloat64, optimized for small non-negative integers.

    bits(v + 1) - bits(1.0), rotated left 6, emitted MSB-first 7 bits/byte
    with continuation MSBs; at most 9 bytes (last byte holds 8 bits).
    """
    bits = struct.unpack("<Q", struct.pack("<d", v + 1.0))[0]
    x = _rotl64((bits - _FLOAT_BITS_1) & _U64, _VARFLOAT_ROTATE)
    for _ in range(_MAX_VAR_LEN_64 - 1):
        n = x >> 57  # top 7 bits
        x = (x << 7) & _U64
        if x == 0:
            buf.append(n)
            return
        buf.append(n | 0x80)
    buf.append((x >> 56) & 0xFF)


def decode_varfloat64(data: bytes, pos: int) -> tuple[float, int]:
    x = 0
    s = 64 - 7
    for i in range(_MAX_VAR_LEN_64):
        if pos >= len(data):
            raise ValueError("truncated varfloat64")
        n = data[pos]
        pos += 1
        if i == _MAX_VAR_LEN_64 - 1:
            x |= n
            break
        if n < 0x80:
            x |= n << s
            break
        x |= (n & 0x7F) << s
        s = max(s - 7, 0)
    bits = (_rotr64(x, _VARFLOAT_ROTATE) + _FLOAT_BITS_1) & _U64
    return struct.unpack("<d", struct.pack("<Q", bits))[0] - 1.0, pos


def encode_float64_le(buf: bytearray, value: float) -> None:
    buf += struct.pack("<d", value)


def decode_float64_le(data: bytes, pos: int) -> tuple[float, int]:
    if pos + 8 > len(data):
        raise ValueError("truncated float64")
    return struct.unpack_from("<d", data, pos)[0], pos + 8
