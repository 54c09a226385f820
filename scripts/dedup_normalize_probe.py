"""Probe: exact_dedup_summary map side — skip the whitespace-collapse
regex when the text has no run of 2+ spaces.

normalize_text = regexp_replace(lower(trim(text)), ' +', ' ') runs a
Java regex + full string rebuild on EVERY row, but on text with no
double space the replacement is an identity (each single ' ' maps to
' '). Variant: guard with contains(s, '  ') — a cheap substring scan —
and only regex when a run exists. md5 input is value-identical for
every string, so all counts are unchanged.

Also attributes the family's map-side cost: raw md5 (no normalize) vs
current vs guarded.

Usage: python scripts/dedup_normalize_probe.py [n_rows] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("dedup-normalize-probe")
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

DEDUP_DOC = "(id * 2654435761) % 20000000"


def docs_df(n):
    return spark.range(n, numPartitions=64).selectExpr(
        "id",
        "id % 4 AS src",
        f"'lorem ipsum dolor ' || CAST(({DEDUP_DOC}) AS STRING) AS text",
    )


def norm_current(c):
    return F.regexp_replace(F.lower(F.trim(c)), " +", " ")


def norm_guarded(c):
    lt = F.lower(F.trim(c))
    return F.when(
        lt.contains("  "), F.regexp_replace(lt, " +", " ")
    ).otherwise(lt)


# equality on adversarial strings (runs, tabs, unicode, NULL, empties)
adv = spark.createDataFrame(
    [(s,) for s in [
        "", " ", "  ", "   x   y  ", "a b", "a  b", "a   b c  d",
        "\t a  b \t", "A  B", "Ünïcode  wörds", " lead", "trail ",
        "a  b", "x" * 50 + "  " + "y" * 50, None,
    ]],
    "text string",
)
bad = adv.select(
    norm_current(F.col("text")).alias("cur"),
    norm_guarded(F.col("text")).alias("new"),
).where(~F.col("cur").eqNullSafe(F.col("new"))).collect()
assert not bad, bad
print("normalize equality: OK", flush=True)


def summary_with(norm_fn, df):
    h = F.unhex(F.md5(norm_fn(F.col("text"))))
    return (
        df.select("src", h.alias("h"))
        .groupBy("src")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
            (F.count("*") - F.countDistinct("h")).cast("long").alias("n_dups"),
        )
    )


big = docs_df(N)
forms = (
    ("current", lambda: summary_with(norm_current, big)),
    ("guarded", lambda: summary_with(norm_guarded, big)),
    # ("raw_md5_no_norm", lambda: summary_with(lambda c: c, big)),  # attribution only
)
for rnd in range(REPS):
    for name, build in forms:
        t0 = time.perf_counter()
        res = build().collect()
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  rows={len(res)}", flush=True)
