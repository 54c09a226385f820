"""Source/sink helpers for the engine's tables.

The reference stores sketches as BLOB columns "in Parquet, database columns"
(README.md:203-220); Spark's ``BinaryType`` round-trips Parquet BYTE_ARRAY
natively, so no custom connector is needed — these helpers only normalize
schema quirks and centralize reads so filters/column pruning reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing nanosecond timestamps.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    long under ``spark.sql.legacy.parquet.nanosAsLong``; we re-cast it to a
    microsecond timestamp column of the same name so downstream
    ``date_trunc``/windows behave normally. DataFrames (lazy plans — no data)
    are memoized per session so repeated queries skip file re-listing.
    """
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integral `div`, NOT double division: nanos ~2^60 exceed double
        # mantissa range, so (ts/1000).cast(long) is off by ±1us for a
        # quarter of the rows vs DuckDB's exact ns->us truncation — harmless
        # for hour/day buckets, fatal for exact timestamp arithmetic
        # (as-of lags, session durations).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_sketch_table(df: DataFrame, path: str, partition_by=None, mode="overwrite"):
    """Persist a sketch-bearing DataFrame as Parquet (BLOB columns included).

    Partitioning by a low-cardinality time/key column keeps partition pruning
    effective for roll-up reads (README.md:119-124 storage pattern).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
