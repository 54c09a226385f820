"""Probe: map-only gram construction for duplicate_span_extents.

The shipped form builds grams via posexplode + per-doc lead() windows —
one exchange + sort by doc_id per subtree build, and the census/probe
branches build the subtree TWICE (ReuseExchange can't deduplicate them,
see the operator docstring). Hypothesis (guide §2.4 — remove shuffles
outright): constructing the positional gram hashes map-side with
transform(sequence, i -> xxhash64(slice(toks, i, n))) + posexplode
removes BOTH window exchanges; the only remaining exchanges are the
census hash-aggregate, the (broadcastable) dup join, and one stitch
window over census-marked rows only.

The old measurement that rejected the slice form (13.2 s vs 4.8 s per
build) was md5(concat_ws(slice)) — string materialization + digest; this
probe hashes the slice ARRAY directly (no concat, no md5).

Usage: python scripts/span_slice_probe.py [n_docs] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SPAN_POOL, SPAN_N = 50_000, 8

from pyspark.sql import SparkSession, Window, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("span-slice-probe")
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


def span_text_sql(idv: str) -> str:
    uniq = " || ' ' || ".join(
        f"'u{j}_' || CAST(({idv}) * {2 * j + 3} AS STRING)" for j in range(8)
    )
    boil = " || ' ' || ".join(
        f"'b{j}_' || CAST((({idv}) % {SPAN_POOL}) * {j + 1} AS STRING)"
        for j in range(16)
    )
    return f"{uniq} || ' ' || {boil}"


def docs_df(n):
    return spark.range(n, numPartitions=64).selectExpr(
        "id AS doc_id", f"{span_text_sql('id')} AS text"
    )


def extents_slice(df, text="text", id_col="doc_id", n=SPAN_N, min_docs=2):
    toks = F.split(F.lower(F.trim(F.col(text))), " +")
    ntok = F.size(toks)
    idx = F.sequence(F.lit(1), ntok - (n - 1))
    grams_arr = F.transform(
        idx, lambda i: F.xxhash64(F.slice(toks, i.cast("int"), F.lit(n)))
    )
    guarded = F.when(ntok >= n, grams_arr).otherwise(
        F.array().cast("array<bigint>")
    )
    grams = df.select(
        F.col(id_col), F.posexplode(guarded).alias("__p0", "h")
    ).select(id_col, (F.col("__p0") + 1).alias("pos"), "h")
    dup = (
        grams.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    marked = grams.join(dup, "h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0))
        .otherwise(F.lit(1))
    )
    ext = marked.withColumn("brk", brk).withColumn(
        "eid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        ext.groupBy(id_col, "eid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_grams")
    )


def consume(out):
    return out.agg(
        F.count(F.lit(1)).alias("n_extents"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("cut_tokens"),
    ).collect()


# --- equality check at small N -------------------------------------------
small = docs_df(20_000)
a = sorted(
    tuple(r)
    for r in dedup.duplicate_span_extents(
        small, text="text", id_col="doc_id", n=SPAN_N, min_docs=2,
        gram_hash="xxhash64",
    ).collect()
)
b = sorted(tuple(r) for r in extents_slice(small).collect())
assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
print(f"equality at 20k docs: OK ({len(a)} extents)", flush=True)

# --- timing ---------------------------------------------------------------
docs = docs_df(N)
for name, build in (
    ("lead_window(current)", lambda: dedup.duplicate_span_extents(
        docs, text="text", id_col="doc_id", n=SPAN_N, min_docs=2,
        gram_hash="xxhash64")),
    ("slice_maponly", lambda: extents_slice(docs)),
):
    for rep in range(REPS):
        t0 = time.perf_counter()
        res = consume(build())
        dt = time.perf_counter() - t0
        print(f"{name} rep{rep}: {dt:.2f}s  {res}", flush=True)
