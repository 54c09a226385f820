"""Probe: cheaper corpus-stats pass for bm25_scores.

bm25's (N, total_tokens) scan computes per-doc token counts as
size(filter(split(trim(lower(text)), ' +'), t != '')) — materializing a
token array + a filtered copy per document just to COUNT. Hypothesis
(guide §1.2 per-task work): regexp_count(trim(text), '[^ ]+') counts
maximal non-space runs without allocating arrays, and is provably equal
to the filtered-split size for every string (after the space-trim both
count the non-empty space-separated segments; NULL handled by coalesce).

Also probes the dl term carried in the heavy explode pass.

Usage: python scripts/bm25_count_probe.py [n_docs] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_TEXT_D = 1_000_000

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("bm25-count-probe")
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
from duckdb_ddsketch_spark.operators.text import tokens


def minhash_text_sql(d: str) -> str:
    # mirror of bench._minhash_text_sql with STRING casts
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


def tok_n_old(c):
    return F.greatest(
        F.size(F.filter(tokens(F.lower(c)), lambda t: t != F.lit(""))),
        F.lit(0),
    )


def tok_n_new(c):
    return F.coalesce(
        F.regexp_count(F.trim(c), F.lit("[^ ]+")), F.lit(0)
    )


# --- equality over adversarial strings ------------------------------------
adv = spark.createDataFrame(
    [(s,) for s in [
        "", " ", "   ", "a", " a ", "a b", "a  b", "\ta b\n", "a\tb",
        "\t a", "a \t b", " \t ", "x" * 100, ("w1 " * 50).strip(), None,
    ]],
    "text string",
)
bad = adv.select(
    "text", tok_n_old(F.col("text")).alias("o"), tok_n_new(F.col("text")).alias("n")
).where(F.col("o") != F.col("n")).collect()
assert not bad, f"MISMATCH: {bad}"
print("equality on adversarial strings: OK", flush=True)

big = docs_df(N)
cnt = big.count()  # warm the generator path
print(f"docs: {cnt}", flush=True)

forms = (
    ("stats_old_splitfilter", lambda: big.select(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(tok_n_old(F.col("text"))).alias("total_tokens"),
    )),
    ("stats_new_regexpcount", lambda: big.select(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(tok_n_new(F.col("text"))).alias("total_tokens"),
    )),
)
for rnd in range(REPS):
    for name, build in forms:
        t0 = time.perf_counter()
        res = build().collect()
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  {res}", flush=True)
