"""Probe: where does bm25's pre-explode INSET prune stop winning?

Round 12 adopted the prefilter branch for <= _BM25_PREFILTER_MAX=128
distinct query terms on measurement at 9 and 128 terms; the cap itself
was caution, not measurement (VERDICT r12 item 7). This probe forces
BOTH branches (by patching the cap) on 128/256/512-term query sets over
the 15M-doc bench corpus and interleaves reps, so the cap can be placed
on a measured crossover — or confirmed absent.

Term sets are natural prefixes of the corpus's token namespaces
(aK K<101, bK<97, cK<89, dK<83, eK<79, fK<73): most terms EXIST, so the
hit rate — and with it the number of rows the prefilter saves the
explode — shrinks as sets grow. Catalyst folds the literal IN to an
INSET hash set above inSetConversionThreshold, so per-token probe cost
is ~flat in set size; what changes is rows-materialized.

Branch equality for every probe set is asserted at 200k docs + edges.

Usage: python scripts/bm25_crossover_probe.py [n_docs] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_TEXT_D = 1_000_000

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("bm25-crossover-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.operators import text as text_ops


def minhash_text_sql(d: str) -> str:
    parts = []
    for tag, mod, div in (
        ("a", 101, 1), ("b", 97, 101), ("c", 89, 3), ("d", 83, 7),
        ("e", 79, 11), ("f", 73, 13), ("g", 71, 17), ("h", 67, 19),
    ):
        parts.append(f"'{tag}' || CAST((({d}) div {div}) % {mod} AS STRING)")
    return " || ' ' || ".join(parts)


def docs_df(n):
    t = minhash_text_sql(f"id % {N_TEXT_D}")
    return spark.range(n, numPartitions=64).selectExpr(
        "id AS doc_id", f"{t} AS text"
    )


# natural-prefix term pools: every class tag in corpus order
_POOL = (
    [f"a{j}" for j in range(101)]
    + [f"b{j}" for j in range(97)]
    + [f"c{j}" for j in range(89)]
    + [f"d{j}" for j in range(83)]
    + [f"e{j}" for j in range(79)]
    + [f"f{j}" for j in range(73)]
)


def qdf_of(nterms):
    terms = _POOL[:nterms]
    rows = [
        (i + 1, " ".join(terms[i * 16 : (i + 1) * 16]))
        for i in range((nterms + 15) // 16)
    ]
    return spark.createDataFrame(rows, "query_id int, query_text string")


def run(df, qdf, cap):
    """bm25_scores with the prefilter cap patched: cap=0 forces the
    explode + broadcast-semi-join branch, a large cap forces the
    pre-explode INSET branch."""
    old = text_ops._BM25_PREFILTER_MAX
    text_ops._BM25_PREFILTER_MAX = cap
    try:
        return text_ops.bm25_scores(df, qdf, k=10).collect()
    finally:
        text_ops._BM25_PREFILTER_MAX = old


edge = spark.createDataFrame(
    [(10_000_001, ""), (10_000_002, None), (10_000_003, "   "),
     (10_000_004, "a7 a7 a7"), (10_000_005, "a7 b13 c55 d9 e30 f8 g2 h1")],
    "doc_id long, text string",
)
small = docs_df(200_000).unionByName(edge)
for nt in (128, 256, 512):
    q = qdf_of(nt)
    a = sorted(tuple(r) for r in run(small, q, 0))
    b = sorted(tuple(r) for r in run(small, q, 1024))
    assert a == b, f"branch MISMATCH at {nt} terms: {a[:2]} vs {b[:2]}"
    print(f"branch equality at 200k docs, {nt} terms: OK ({len(a)} rows)",
          flush=True)

big = docs_df(N)
forms = [
    (f"join_{nt}t", nt, 0) for nt in (128, 256, 512)
] + [
    (f"prefilter_{nt}t", nt, 1024) for nt in (128, 256, 512)
]
qdfs = {nt: qdf_of(nt) for nt in (128, 256, 512)}
for rnd in range(REPS):
    for name, nt, cap in forms:
        t0 = time.perf_counter()
        res = run(big, qdfs[nt], cap)
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  rows={len(res)}", flush=True)
