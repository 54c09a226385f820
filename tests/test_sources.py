"""Sketch storage round-trip: the reference's canonical pattern of writing
hourly sketch tables and rolling them up (README.md:119-124, 191-198), as
partitioned parquet with pruning verified in the plan.
"""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark import DDSketch
from duckdb_ddsketch_spark.functions.aggregate import ddsketch_agg
from duckdb_ddsketch_spark.functions import scalar as fs
from duckdb_ddsketch_spark.operators import native
from duckdb_ddsketch_spark.plans import checks
from duckdb_ddsketch_spark.sources import load_table, write_sketch_table


def test_sketch_table_write_rollup_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    pre = native.sketch_struct_agg(ev, ["day", "event_type"], "value", 0.01).select(
        "day", "event_type", native.struct_to_wire("sketch").alias("sketch")
    )
    path = str(tmp_path / "daily_sketches")
    write_sketch_table(pre, path, partition_by=["day"])

    # binary sketch column round-trips parquet bit-exactly
    stored = spark.read.parquet(path)
    assert dict(stored.dtypes)["sketch"] == "binary"
    # partition-column type inference reads `day` back as DATE — normalize
    orig = {(str(r.day), r.event_type): bytes(r.sketch) for r in pre.collect()}
    back = {(str(r.day), r.event_type): bytes(r.sketch) for r in stored.collect()}
    assert orig == back

    # day-partition filter prunes at the source (partition pruning)
    some_day = next(iter(orig))[0]
    filtered = stored.where(F.col("day") == some_day)
    plan = checks.formatted_plan(filtered)
    assert "PartitionFilters" in plan and "day" in plan

    # roll the stored sketches up across days; equals direct sketching
    rolled = stored.groupBy("event_type").agg(ddsketch_agg("sketch").alias("s"))
    got = {
        r.event_type: r
        for r in rolled.select(
            "event_type",
            fs.ddsketch_count(F.col("s")).alias("c"),
            fs.ddsketch_quantile(F.col("s"), F.lit(0.95)).alias("p95"),
        ).collect()
    }
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    for et, vals in values.items():
        kernel = DDSketch(0.01).extend(vals)
        assert got[et].c == kernel.get_count()
        p95 = kernel.quantile(0.95)
        assert abs(got[et].p95 - p95) <= abs(p95) * 1e-9


def test_entry_contract(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles).issubset(set(qs))
    # every reference SQL function is exercised by at least one declared query
    assert len(qs) >= 30


def test_reference_surface_coverage():
    """SURVEY.md §2.1 inventory: each of the reference's 12 functions must be
    exercised by the declared queries (by name in the query sources)."""
    import inspect

    from duckdb_ddsketch_spark.plans import declared

    sources = "\n".join(
        inspect.getsource(fn) for fn in declared.QUERIES.values()
    )
    for fn_name in [
        "ddsketch_create",
        "ddsketch_add",
        "ddsketch_merge",
        "ddsketch_quantile",
        "ddsketch_count",
        "ddsketch_min",
        "ddsketch_max",
        "ddsketch_sum",
        "ddsketch_avg",
        "ddsketch_stats",
        "ddsketch_agg",
        "ddsketch_stats_full",  # = ddsketch_stats_agg finalizer
    ]:
        assert fn_name in sources, f"{fn_name} not exercised by any declared query"


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_read_write_source_blob_roundtrip(spark, fmt, tmp_path):
    from duckdb_ddsketch_spark.sources import read_source, write_source

    sk = DDSketch(0.01).extend([1.0, 2.5, 100.0, -3.0, 0.0])
    blob = sk.encode()
    df = spark.createDataFrame(
        [("a", blob, 1.5), ("b", None, -2.25)], "k string, sketch binary, v double"
    )
    path = str(tmp_path / f"t_{fmt}")
    write_source(df, path, format=fmt)
    schema = (
        "k string, sketch string, v double"
        if fmt in ("csv", "json")
        else "k string, sketch binary, v double"
    )
    back = read_source(spark, path, format=fmt, schema=schema, binary_cols=["sketch"])
    rows = {r["k"]: r for r in back.collect()}
    assert bytes(rows["a"]["sketch"]) == blob  # byte-exact through base64
    assert rows["b"]["sketch"] is None
    assert rows["a"]["v"] == 1.5 and rows["b"]["v"] == -2.25  # doubles exact
