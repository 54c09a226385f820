"""Golden wire-format vectors from github.com/DataDog/sketches-go v1.4.7.

These are *data* (hex strings + expected stats) taken from the reference's
compatibility suite (/root/reference/src/datadog_encoding.rs:970-1354), which
in turn generated them with Go's LogarithmicMapping(relativeAccuracy=0.01) +
DenseStore. They pin byte-level compatibility of our codec.
"""

# uvarint vectors from sketches-go encoding_test.go
UVARINT_VECTORS = [
    (0, bytes([0x00])),
    (127, bytes([0x7F])),
    (128, bytes([0x80, 0x01])),
    (2**64 - 1, bytes([0xFF] * 9 + [0x01])),
]

# zig-zag signed varint vectors
VARINT_VECTORS = [
    (0, bytes([0x00])),
    (1, bytes([0x02])),
    (-1, bytes([0x01])),
    (-64, bytes([0x7F])),
    (2**63 - 1, bytes([0xFE] + [0xFF] * 8 + [0x01])),
]

# (name, hex, expected_count, expected_sum, {q: expected_quantile})
# Quantile expectations are Go-exact values; tolerance 2% in tests.
GO_SKETCHES = [
    ("empty", "02fd4a815abf52f03f0000000000000000", 0, 0.0, {}),
    ("single_42", "02fd4a815abf52f03f00000000000000000501f40202", 1,
     41.682206632978456, {}),
    ("two_10_20", "02fd4a815abf52f03f00000000000000000502e601024402", 2,
     29.96136693037751, {}),
    ("sequential_1_10",
     "02fd4a815abf52f03f0000000000000000050a0002440228021e021602120210020c020c020c02",
     10, 54.948952462932695, {0.50: 5.002829575110703, 0.90: 8.935418643763573}),
    ("small_values", "02fd4a815abf52f03f00000000000000000505b30502460228021c021802",
     5, 0.015008577971483281, {}),
    ("large_values", "02fd4a815abf52f03f00000000000000000503e40a0246022802",
     3, 5987460.634366453, {}),
    ("mixed_magnitude",
     "02fd4a815abf52f03f00000000000000000505e70102e80102e60102e60102e60102",
     5, 1114.1065215656804, {}),
    ("duplicates_50x5", "02fd4a815abf52f03f00000000000000000501860305",
     5, 249.51480474533258, {}),
    ("uniform_10_100",
     "02fd4a815abf52f03f0000000000000000050ae6010244022a021c021602120210020e020a020c02",
     10, 550.3092442194343, {0.50: 49.90296094906652, 0.90: 89.1303293363591}),
    ("skewed_latency",
     "02fd4a815abf52f03f00000000000000000509a00104120310020c021802280278024602a00102",
     12, 715.2227847478571, {0.50: 7.028793021534767, 0.99: 100.49456770856489}),
    ("merged_1_10",
     "02fd4a815abf52f03f0000000000000000050a0002440228021e021602120210020c020c020c02",
     10, 54.948952462932695, {}),
    ("merged_overlapping",
     "02fd4a815abf52f03f000000000000000005070002440228031e03160312021002",
     10, 40.00576175735671, {}),
]

# ContiguousCounts (subflag 3) sketch: values 51..100, 57 bytes, 35 bins.
CONTIGUOUS_COUNTS_HEX = (
    "02fd4a815abf52f03f00000000000000000d23880302020202020202020302020203"
    "0202030202030203020302030302030303020303030302"
)

# Issue #1 / quantile compat vectors: (hex, count, {q: expected})
QUANTILE_VECTORS = [
    ("02fd4a815abf52f03f000000000000000005010002", 1, {0.50: 1.01}),
    ("040302fd4a815abf52f03f00000000000000000501008440", 6, {0.50: 1.01}),
    ("02fd4a815abf52f03f00000000000000000501ef04afd5fb13", 15399717,
     {0.50: 0.0019689445}),
    ("02fd4a815abf52f03f00000000000000000529ef04aad7cb660ea8fbc52c0aa8fbc6440ca8fbc8080ca8fbc9500ca8fbcb3c12a7b5983006a7b5992808a7b59a1806a7b59b0806a7b59c400c9fbf26069fbf29049fbf2b049fbf2b069fbf2e08989058049891080498913804989138029891382096e8701a96e9501a96e9501c96ea301a96ea30269aa01c0c9aa0340c9aa04c0c9aa06c0c9aa07c1690510c90570c90570a90570c90571887200c89100a87200c89700c8830",
     15435728,
     {0.25: 0.0022648358, 0.50: 0.0031820117, 0.75: 0.0045609257,
      0.90: 0.0052463378, 0.95: 0.0055707643, 0.99: 0.0072249545}),
]
