#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The comparator is DuckDB executing the equivalent bin-math oracle SQL over
the same parquet (BASELINE.md); its timings are included as
``duckdb_oracle`` unless --no-compare is passed. The DuckDB section runs
BEFORE the Spark JVM is started so neither engine's numbers are skewed by
the other's threads/GC. ``native_sketch_rows_per_sec`` reports the native
path's marginal throughput at 60M generated rows — the scale-relevant
number (per-query times at sf0.1 are fixed-overhead-bound).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the scale-relevant pipelines (native path, the canonical
# blob-aggregation roll-up, the pandas ingest path) plus one query from each
# beyond-reference family (dedup, similarity) for breadth. These are STAGED
# registry names (duckdb_ddsketch_spark/plans/declared.py): the stable
# per-operator declarations, keyed identically across rounds even though the
# driver-facing 50-slot registry renumbers/merges them — so BENCH_r{N}
# timings stay comparable round over round.
HEADLINE = [
    "q01_price_quantiles_by_returnflag",
    "q11_agg_rollup_event_type",
    "q12_stats_agg_by_linestatus",
    "q13_native_daily_rollup",
    "q14_struct_merge_native",
    "q20_exact_dedup_summary",
    "q25_ann_bruteforce_topk",
    "q39_asof_join_click_error",
    "q43_heavy_hitters",
]

N_60M = 60_000_000


def _median3(fn) -> float:
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        reps.append(time.perf_counter() - t0)
    return round(sorted(reps)[1], 3)


def run_duckdb(result: dict) -> None:
    """DuckDB comparator on an otherwise-idle machine (no JVM yet)."""
    import duckdb

    from duckdb_ddsketch_spark.plans import declared

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = declared.STAGED_ORACLES
    ducks = {}
    for name in HEADLINE:
        if name in oracles:
            sql = oracles[name]
            con.execute(sql).fetchall()  # warm (parquet in page cache)
            ducks[name] = _median3(lambda: con.execute(sql).fetchall())
    result["duckdb_oracle"] = ducks

    # Same 60M-row workload in DuckDB (generation + binned quantile
    # aggregation, one query, all threads) — the apples-to-apples
    # scale-proxy comparison for the native path.
    import math as _math

    con.execute(f"SET threads={CPUS}")
    _gamma = 1.0 + 2.0 * 0.01 / 0.99
    _lg = repr(_math.log(_gamma))
    duck_60m = f"""
    WITH gen AS (
        SELECT CAST(range % 25 AS VARCHAR) AS grp,
               POWER(random() * 4 + 1, 3) * 10 AS v
        FROM range({N_60M})
    ),
    binned AS (
        SELECT grp, CAST(CEIL(LN(v) / {_lg}) AS INTEGER) AS bin,
               CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM gen GROUP BY 1, 2
    ),
    tot AS (SELECT grp, SUM(cnt) AS total FROM binned GROUP BY 1),
    cum AS (
        SELECT grp, bin, cnt,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned
    )
    SELECT t.grp,
           MIN(CASE WHEN c.cum > 0.5 * (t.total - 1) THEN c.bin END),
           MIN(CASE WHEN c.cum > 0.95 * (t.total - 1) THEN c.bin END),
           MIN(CASE WHEN c.cum > 0.99 * (t.total - 1) THEN c.bin END)
    FROM cum c JOIN tot t USING (grp) GROUP BY 1
    """
    con.execute(duck_60m).fetchall()
    t0 = time.perf_counter()
    con.execute(duck_60m).fetchall()
    result["duckdb_60m_sec"] = round(time.perf_counter() - t0, 3)
    con.close()


def main() -> None:
    result: dict = {}
    if "--no-compare" not in sys.argv:
        run_duckdb(result)

    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark.plans import declared

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ddsketch-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = declared.STAGED_QUERIES
    timings: dict[str, float] = {}
    # Warm-up pass: JVM JIT, parquet footers, Python UDF workers. Excluded
    # from timings — we measure steady-state throughput, which is what
    # extrapolates to long-running cluster workloads.
    for name in HEADLINE:
        queries[name](spark, SF_DIR).collect()

    for name in HEADLINE:
        fn = queries[name]
        timings[name] = _median3(lambda: fn(spark, SF_DIR).collect())

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    result.update(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf else SF_DIR,
        }
    )

    # Marginal throughput of the native sketch path at 100x the bench rows —
    # the number that extrapolates to cluster scale (per-query times above are
    # dominated by fixed scheduling overhead at this tiny SF). The plan is
    # REBUILT for the timed run: re-collecting one DataFrame would reuse its
    # materialized shuffle outputs and time only the final stage.
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import native

    def native_60m():
        gen = spark.range(N_60M, numPartitions=64).select(
            (F.col("id") % 25).cast("string").alias("grp"),
            (F.pow(F.rand(seed=42) * 4 + 1, 3) * 10).alias("v"),
        )
        return native.sketch_quantile_agg(gen, ["grp"], "v", 0.01, (0.5, 0.95, 0.99))

    native_60m().collect()
    t0 = time.perf_counter()
    native_60m().collect()
    dt = time.perf_counter() - t0
    result["native_sketch_rows_per_sec"] = int(N_60M / dt)
    result["native_sketch_60m_sec"] = round(dt, 3)

    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
