"""Property-based tests (hypothesis) for the wire codec and kernel —
coverage beyond the reference's fixed vectors.
"""

import math

from hypothesis import given, settings, strategies as st

from duckdb_ddsketch_spark import codec
from duckdb_ddsketch_spark.sketch import DDSketch

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
counts = st.floats(min_value=1.0, max_value=1e9)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_uvarint_roundtrip(v):
    buf = bytearray()
    codec.encode_uvarint64(buf, v)
    decoded, pos = codec.decode_uvarint64(bytes(buf), 0)
    assert decoded == v and pos == len(buf)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip(v):
    buf = bytearray()
    codec.encode_varint64(buf, v)
    decoded, pos = codec.decode_varint64(bytes(buf), 0)
    assert decoded == v and pos == len(buf)


@given(finite_floats)
def test_varfloat_roundtrip(v):
    # varfloat64 stores bits(v+1)-bits(1), so magnitudes below ~2^-52 are
    # absorbed into 1.0 and decode as 0 — inherent to the DataDog format
    # (it encodes counts, which are >= 1 in practice)
    buf = bytearray()
    codec.encode_varfloat64(buf, v)
    decoded, pos = codec.decode_varfloat64(bytes(buf), 0)
    assert pos == len(buf) <= 9
    assert decoded == v or abs(decoded - v) <= max(abs(v) * 1e-15, 2.0**-50)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9),
        min_size=0,
        max_size=200,
    )
)
def test_sketch_wire_roundtrip_properties(values):
    s = DDSketch(0.01).extend(values)
    d = DDSketch.decode(s.encode())
    # count is exact through the wire
    assert d.count == s.count
    # bins and zero counts are exact
    assert d.positive_bins == s.positive_bins
    assert d.negative_bins == s.negative_bins
    assert d.zero_count == s.zero_count
    # second round-trip is a fixed point (canonical form)
    assert d.encode() == DDSketch.decode(d.encode()).encode()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=0.001, max_value=1e6),
        min_size=1,
        max_size=300,
    ),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_quantile_error_bound(values, q):
    """Reference-mapping accuracy envelope: with bin = ceil(log_gamma(v))
    and representative gamma^bin * (1+eta), every reported positive value
    sits in [v*(1+eta), v*gamma*(1+eta)] of some sample v at the queried
    rank — i.e. biased 1%..3.06% above for alpha=0.01 (the reference's own
    tests use a 3% tolerance for exactly this reason)."""
    alpha = 0.01
    gamma = 1.0 + 2.0 * alpha / (1.0 - alpha)
    eta = 1.0 - 2.0 / (1.0 + gamma)
    s = DDSketch(alpha).extend(values)
    got = s.quantile(q)
    rank = q * (len(values) - 1)
    srt = sorted(values)
    lo = srt[max(0, min(int(rank), len(values) - 1))]
    hi = srt[max(0, min(int(math.ceil(rank)), len(values) - 1))]
    ok = any(
        t * (1.0 + eta) * (1 - 1e-12) <= got <= t * gamma * (1.0 + eta) * (1 + 1e-12)
        for t in (lo, hi)
    )
    assert ok, (got, lo, hi, q)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(finite_floats, min_size=0, max_size=100),
    st.lists(finite_floats, min_size=0, max_size=100),
)
def test_merge_equals_union(a, b):
    """merge(sketch(A), sketch(B)) has identical bins to sketch(A ∪ B)."""
    s1 = DDSketch(0.01).extend(a)
    s2 = DDSketch(0.01).extend(b)
    s1.merge(s2)
    u = DDSketch(0.01).extend(list(a) + list(b))
    assert s1.count == u.count
    assert s1.positive_bins == u.positive_bins
    assert s1.negative_bins == u.negative_bins
    assert s1.zero_count == u.zero_count
    assert s1.min == u.min and s1.max == u.max


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=1e6), min_size=1, max_size=100))
def test_extend_array_equals_sequential(values):
    import numpy as np

    seq = DDSketch(0.01).extend(values)
    vec = DDSketch(0.01).extend_array(np.array(values))
    assert vec.count == seq.count
    assert vec.positive_bins == seq.positive_bins
    assert vec.min == seq.min and vec.max == seq.max


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_never_crashes(data):
    """Arbitrary bytes either decode to a sketch or raise ValueError —
    no hangs, no other exception types (the scalar SQL surface relies on
    this to map bad blobs to NULL)."""
    try:
        s = DDSketch.decode(data)
    except ValueError:
        return
    assert s.count >= 0.0


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_decode_prefix_of_valid_sketch(data):
    """Truncations of a valid sketch must also fail cleanly or decode."""
    s = DDSketch(0.01).extend([1.0, 2.5, 1000.0, 0.0, -3.0])
    raw = s.encode()
    for cut in range(0, len(raw)):
        try:
            DDSketch.decode(raw[:cut])
        except ValueError:
            pass


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    ),
    st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False),
)
def test_cdf_bounds_and_edges(values, v):
    """cdf is in [0,1], 1 at/above the max, 0 below the min."""
    s = DDSketch(0.01).extend(values)
    c = s.cdf(v)
    assert 0.0 <= c <= 1.0
    assert s.cdf(max(values) + 1.0) == 1.0
    if min(values) > 0:
        assert s.cdf(min(values) / 2.0) in (0.0, s.zero_count / s.count)
    # empty sketch -> None
    assert DDSketch(0.01).cdf(v) is None


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    st.floats(min_value=-2e5, max_value=2e5, allow_nan=False, allow_infinity=False),
    st.floats(min_value=-2e5, max_value=2e5, allow_nan=False, allow_infinity=False),
)
def test_cdf_monotone(values, a, b):
    """cdf is non-decreasing in v."""
    s = DDSketch(0.01).extend(values)
    lo, hi = (a, b) if a <= b else (b, a)
    assert s.cdf(lo) <= s.cdf(hi)


@given(
    st.lists(finite_floats, min_size=1, max_size=120),
    st.floats(min_value=0.0, max_value=0.45),
    st.floats(min_value=0.05, max_value=0.5),
)
@settings(max_examples=150, deadline=None)
def test_trimmed_mean_properties(values, q_lo, width):
    """Rank-window mean invariants across sign classes:
    - (0, 1) window == the bin-representative mean;
    - every window mean lies inside [min rep, max rep];
    - negating the inputs mirrors the window: tm_neg(1-hi, 1-lo) == -tm."""
    q_hi = min(q_lo + width, 1.0)
    s = DDSketch(0.01).extend(values)

    reps = (
        [-s.bin_to_value(i) for i in s.negative_bins]
        + ([0.0] if s.zero_count > 0 else [])
        + [s.bin_to_value(i) for i in s.positive_bins]
    )
    rep_mean = (
        sum(-s.bin_to_value(i) * c for i, c in s.negative_bins.items())
        + sum(s.bin_to_value(i) * c for i, c in s.positive_bins.items())
    ) / s.count

    full = s.trimmed_mean(0.0, 1.0)
    # tolerance must scale with the SUMMAND magnitudes, not the result:
    # mixed-sign inputs like [±5.4e11, 1.5, 0.5] cancel to ~0.5, and the
    # two summation orders (trimmed_mean's sign-ordered fold vs this
    # per-store comprehension) legitimately differ by ~ulp(max |term|)
    # (hypothesis-found, 2026-08-14)
    mag = (
        sum(abs(s.bin_to_value(i)) * c for i, c in s.negative_bins.items())
        + sum(abs(s.bin_to_value(i)) * c for i, c in s.positive_bins.items())
    ) / s.count
    assert math.isclose(full, rep_mean, rel_tol=1e-9, abs_tol=1e-12 * max(mag, 1.0))

    tm = s.trimmed_mean(q_lo, q_hi)
    assert tm is not None
    slack = 1e-9 * max(abs(min(reps)), abs(max(reps))) + 1e-9
    assert min(reps) - slack <= tm <= max(reps) + slack

    neg = DDSketch(0.01).extend([-v for v in values])
    mirrored = neg.trimmed_mean(1.0 - q_hi, 1.0 - q_lo)
    # mirroring reverses the fold order — same cancellation exposure
    assert math.isclose(mirrored, -tm, rel_tol=1e-9, abs_tol=1e-12 * max(mag, 1.0))
