"""Probe: exact_dedup_summary aggregate shape.

The shipped form computes count(*) + countDistinct(h) in ONE aggregate:
Catalyst plans mixed distinct/non-distinct aggregates through an Expand
node that doubles the input rows (60M -> 120M through the first hash
aggregate). Hypothesis (guide §2.3 — aggregate before you shuffle):
a manual two-level aggregate (groupBy(keys, h).count() then
groupBy(keys)) avoids the Expand; additionally, unhex(md5) shuffles a
16-byte binary instead of the 32-byte hex string (narrower types).

Usage: python scripts/dedup_agg_probe.py [n_rows] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("dedup-agg-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.operators import dedup
from duckdb_ddsketch_spark.operators.dedup import normalize_text


def gen(n):
    return spark.range(n, numPartitions=64).selectExpr(
        "id % 4 AS src",
        "'lorem ipsum dolor ' || CAST((id % 30000000) AS STRING) AS text",
    )


def two_level(df, keys, text="text", id_col="id", binary=True):
    h = F.md5(normalize_text(F.col(text)))
    if binary:
        h = F.unhex(h)
    pairs = (
        df.select(*keys, h.alias("h"))
        .groupBy(*keys, "h")
        .agg(F.count("*").alias("c"))
    )
    return pairs.groupBy(*keys).agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        (F.sum("c") - F.count("*")).cast("long").alias("n_dups"),
    )


def mixed_binary(df, keys, text="text"):
    h = F.unhex(F.md5(normalize_text(F.col(text))))
    return (
        df.select(*keys, h.alias("h"))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
            (F.count("*") - F.countDistinct("h")).cast("long").alias("n_dups"),
        )
    )


# equality at small N
small = gen(1_000_000)
a = sorted(tuple(r) for r in dedup.exact_dedup_summary(
    small, ["src"], text="text", id_col="id").collect())
b = sorted(tuple(r) for r in two_level(small, ["src"]).collect())
c = sorted(tuple(r) for r in mixed_binary(small, ["src"]).collect())
assert a == b == c, f"MISMATCH\n{a}\n{b}\n{c}"
print(f"equality at 1M rows: OK {a[:1]}", flush=True)

big = gen(N)
forms = (
    ("current_mixed_hex", lambda: dedup.exact_dedup_summary(
        big, ["src"], text="text", id_col="id")),
    ("two_level_binary", lambda: two_level(big, ["src"])),
    ("two_level_hex", lambda: two_level(big, ["src"], binary=False)),
    ("mixed_binary", lambda: mixed_binary(big, ["src"])),
)
for rnd in range(REPS):
    for name, build in forms:
        t0 = time.perf_counter()
        res = build().collect()
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  rows={len(res)}", flush=True)
