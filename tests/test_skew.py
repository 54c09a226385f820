"""Skew behavior of the native sketch path.

The binned aggregate is the skew story: a hot group key fans out across its
~O(100) log bins during partial aggregation, so the shuffled row count per
key is bounded by the bin count regardless of how many input rows hit the
key. These tests pin that property at the data level (results equal the
kernel; reduced cardinality is bins, not rows) under a 95%-hot-key
distribution.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark import DDSketch
from duckdb_ddsketch_spark.operators import native


@pytest.fixture(scope="module")
def skewed(spark):
    # 95% of 200k rows on one key, long tail on 50 others
    n = 200_000
    return spark.range(n, numPartitions=16).select(
        F.when(F.col("id") % 20 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.pow(F.rand(seed=7) * 3 + 1, 4)).alias("v"),
    )


def test_binned_rows_bounded_by_bins_not_rows(spark, skewed):
    binned = native.binned_counts(skewed, ["k"], "v", 0.01)
    per_key = {r.k: r.n for r in binned.groupBy("k").agg(F.count("*").alias("n")).collect()}
    # the hot key carries 190k rows but only ~|bins| shuffled rows
    assert per_key["hot"] < 600, per_key["hot"]
    total_rows = sum(per_key.values())
    assert total_rows < 20_000  # vs 200k input


def test_skewed_results_match_kernel(spark, skewed):
    got = {
        r.k: r
        for r in native.sketch_quantile_agg(skewed, ["k"], "v", 0.01, (0.5, 0.99)).collect()
    }
    sample = skewed.where(F.col("k") == "hot").select("v").collect()
    kernel = DDSketch(0.01).extend(r.v for r in sample)
    hot = got["hot"]
    assert hot["count"] == kernel.get_count()
    for q, col in ((0.5, "p50"), (0.99, "p99")):
        expected = kernel.quantile(q)
        assert abs(hot[col] - expected) <= abs(expected) * 1e-9


def test_salted_join_equals_plain_join_on_skewed_keys(spark):
    """salted_join must produce exactly the plain join's rows while
    splitting the hot key across salt partitions."""
    from duckdb_ddsketch_spark.operators.relational import salted_join

    # 90% of left rows share one key
    left = spark.range(0, 5000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE CONCAT('k', id % 97) END AS k",
        "id AS lval",
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k3", 2.0), ("k7", 3.0), ("absent", 9.9)],
        "k string, rval double",
    )
    got = sorted(
        (r.k, r.lval, r.rval) for r in salted_join(left, right, ["k"], salt=8).collect()
    )
    want = sorted((r.k, r.lval, r.rval) for r in left.join(right, ["k"]).collect())
    assert got == want
    # left-outer keeps unmatched left rows exactly once
    got_l = sorted(
        (r.k, r.lval, r.rval)
        for r in salted_join(left, right, ["k"], salt=8, how="left").collect()
    )
    want_l = sorted(
        (r.k, r.lval, r.rval) for r in left.join(right, ["k"], "left").collect()
    )
    assert got_l == want_l


def test_asof_join_hot_key(spark):
    """One key holding almost all rows must still produce exact as-of
    matches (running-last needs no per-key buffering)."""
    import datetime as dt

    from duckdb_ddsketch_spark.operators.relational import asof_join

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=i)) for i in range(3000)],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=i * 100), float(i)) for i in range(30)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(left, right, ["k"]).collect()
    assert len(out) == 3000
    for r in out:
        sec = int((r.ts - t0.replace(tzinfo=None)).total_seconds())
        assert r.v == float(sec // 100), (sec, r.v)
