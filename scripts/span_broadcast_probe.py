"""A/B probe: duplicate_span_extents r12 form (lazy census, AQE-picked
join, stitch re-shuffle) vs a census-checkpoint + size-gated broadcast form.

ADOPTED in round 13: candidate() below is now the operator's own shape, so
`equal`/`time` compare the operator against itself post-adoption; the probe
is kept as the measurement transcript (before floor 12.54 s / after floor
8.90 s over 9 interleaved rounds, identical outputs every rep).

Candidate shape:
  1. build grams once for the census, aggregate, filter min_docs,
     localCheckpoint the census output (duplicated-gram-bounded), count it;
  2. if the count fits the broadcast cap, probe grams with a BROADCAST
     hash join on h — the streamed side keeps its Range partitioning AND
     its (doc_id, __pos0) sort order, so the stitch windows and the final
     (doc_id, eid) aggregate need NO exchange and NO sort;
  3. otherwise fall back to the plain join (the checkpoint still saves
     rebuilding the census grams).

Modes:
  python scripts/span_broadcast_probe.py equal   # small-shape equality, both branches
  python scripts/span_broadcast_probe.py plan    # candidate plan at bench shape
  python scripts/span_broadcast_probe.py time N  # N interleaved A/B rounds at bench shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F

import bench
from duckdb_ddsketch_spark.operators import dedup

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CAP = 4_000_000


def candidate(df, text="text", id_col="doc_id", n=8, min_docs=2, cap=CAP):
    toks = F.split(F.lower(F.trim(F.col(text))), " +")
    tok_rows = df.select(
        F.col(id_col), F.posexplode(toks).alias("__pos0", "__tok")
    )
    w_doc = Window.partitionBy(id_col).orderBy("__pos0")
    lead_toks = [F.col("__tok")] + [
        F.lead("__tok", j).over(w_doc) for j in range(1, n)
    ]
    h_expr = F.xxhash64(*lead_toks)
    grams = (
        tok_rows.withColumn("__last", F.lead("__tok", n - 1).over(w_doc))
        .withColumn("h", h_expr)
        .where(F.col("__last").isNotNull() if n > 1 else F.lit(True))
        .select(id_col, "__pos0", "h")
    )
    dup = (
        grams.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
        .localCheckpoint()
    )
    n_dup = dup.count()
    probe = F.broadcast(dup) if n_dup <= cap else dup
    marked = grams.join(probe, "h").select(id_col, "__pos0")
    w = Window.partitionBy(id_col).orderBy("__pos0")
    brk = (
        F.when(F.col("__pos0") - F.lag("__pos0").over(w) <= n, F.lit(0))
        .otherwise(F.lit(1))
    )
    ext = marked.withColumn("brk", brk).withColumn(
        "eid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        ext.groupBy(id_col, "eid")
        .agg(
            (F.min("__pos0") + 1).alias("span_start"),
            (F.max("__pos0") + F.lit(n)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_grams")
    )


def _session(name):
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(name)
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _bench_docs(spark):
    t = bench._span_text_sql("id").replace("VARCHAR", "STRING")
    return spark.range(bench.N_SPAN, numPartitions=64).selectExpr(
        "id AS doc_id", f"{t} AS text"
    )


def _small_docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),          # 10 toks, extent with 2
        (2, "a b c d e f g h i j"),          # exact dup of 1
        (3, "x a b c d e f g h y"),          # shifted overlap
        (4, "short doc"),                     # < n tokens
        (5, ""),                              # empty
        (6, None),                            # NULL text
        (7, "  a   b  c d e f g h  "),        # ragged whitespace
        (8, "q w e r t y u i a b c d e f g h"),  # extent mid-doc
        (9, "unique only tokens here nothing repeats at all ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def run_equal():
    spark = _session("span-bcast-equal")
    docs = _small_docs(spark)
    for n, md in ((8, 2), (3, 2), (1, 2), (3, 3)):
        cur = dedup.duplicate_span_extents(
            docs, text="text", id_col="doc_id", n=n, min_docs=md,
            gram_hash="xxhash64",
        )
        for cap in (CAP, 0):  # 0 forces the fallback branch
            cand = candidate(docs, n=n, min_docs=md, cap=cap)
            a = sorted(map(tuple, cur.collect()))
            b = sorted(map(tuple, cand.collect()))
            assert a == b, (n, md, cap, a[:5], b[:5])
            print(f"n={n} min_docs={md} cap={cap}: EQUAL ({len(a)} rows)")
    spark.stop()


def run_plan():
    spark = _session("span-bcast-plan")
    docs = _bench_docs(spark)
    out = candidate(docs).agg(
        F.count(F.lit(1)).alias("n_extents"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("cut_tokens"),
    )
    out.explain("formatted")
    spark.stop()


def run_time(rounds):
    spark = _session("span-bcast-time")
    sc = spark.sparkContext

    def cur():
        docs = _bench_docs(spark)
        return dedup.duplicate_span_extents(
            docs, text="text", id_col="doc_id", n=bench.SPAN_N, min_docs=2,
            gram_hash="xxhash64",
        ).agg(
            F.count(F.lit(1)).alias("n_extents"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("ct"),
        ).collect()

    def cand():
        docs = _bench_docs(spark)
        return candidate(docs).agg(
            F.count(F.lit(1)).alias("n_extents"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("ct"),
        ).collect()

    res = {"cur": [], "cand": []}
    vals = {}
    for r in range(rounds):
        for name, fn in (("cur", cur), ("cand", cand)):
            sc.setJobDescription(f"span {name} r{r}")
            t0 = time.time()
            v = fn()
            dt = time.time() - t0
            res[name].append(dt)
            vals[name] = [tuple(row) for row in v]
            print(f"round {r} {name}: {dt:.2f}s  {vals[name]}")
    assert vals["cur"] == vals["cand"], vals
    print(f"cur  min {min(res['cur']):.2f}  all {[f'{x:.2f}' for x in res['cur']]}")
    print(f"cand min {min(res['cand']):.2f}  all {[f'{x:.2f}' for x in res['cand']]}")
    spark.stop()


def run_cap(rounds):
    """Time the operator's broadcast branch vs the fallback branch at a
    census NEAR the 2M-row cap (pool 200k -> 9 x 200k = 1.8M duplicated
    hashes, 10 docs per pool), to place _SPAN_DUP_BROADCAST_MAX on
    measurement: if broadcast still wins at the boundary the cap is
    conservative-safe; if it loses, lower it."""
    from duckdb_ddsketch_spark.operators import dedup as dd

    bench.SPAN_POOL = 200_000  # read at call time by _span_text_sql
    spark = _session("span-cap-time")
    sc = spark.sparkContext

    def run_with_cap(cap):
        old = dd._SPAN_DUP_BROADCAST_MAX
        dd._SPAN_DUP_BROADCAST_MAX = cap
        try:
            docs = _bench_docs(spark)
            return dd.duplicate_span_extents(
                docs, text="text", id_col="doc_id", n=bench.SPAN_N,
                min_docs=2, gram_hash="xxhash64",
            ).agg(
                F.count(F.lit(1)).alias("n_extents"),
                F.sum(F.col("span_end") - F.col("span_start") + 1).alias("ct"),
            ).collect()
        finally:
            dd._SPAN_DUP_BROADCAST_MAX = old

    res = {"bcast": [], "fallback": []}
    vals = {}
    for r in range(rounds):
        for name, cap in (("bcast", 2_000_000), ("fallback", 0)):
            sc.setJobDescription(f"span cap {name} r{r}")
            t0 = time.time()
            v = run_with_cap(cap)
            dt = time.time() - t0
            res[name].append(dt)
            vals[name] = [tuple(row) for row in v]
            print(f"round {r} {name}: {dt:.2f}s  {vals[name]}")
    assert vals["bcast"] == vals["fallback"], vals
    for k in res:
        print(f"{k} min {min(res[k]):.2f}  all {[f'{x:.2f}' for x in res[k]]}")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "equal"
    if mode == "equal":
        run_equal()
    elif mode == "plan":
        run_plan()
    elif mode == "time":
        run_time(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif mode == "cap":
        run_cap(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
