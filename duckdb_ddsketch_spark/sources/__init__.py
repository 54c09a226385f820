"""Source/sink helpers for the engine's tables.

The reference stores sketches as BLOB columns "in Parquet, database columns"
(README.md:203-220); Spark's ``BinaryType`` round-trips Parquet BYTE_ARRAY
natively, so no custom connector is needed — these helpers only normalize
schema quirks and centralize reads so filters/column pruning reach the scan.
"""

from __future__ import annotations

import os
import weakref

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


# keyed on the live session OBJECT (weakly): an id()-keyed dict would
# hand a NEW session a DataFrame bound to a STOPPED one whenever CPython
# reuses the address, and would pin dead sessions' plans forever
_TABLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize an events ``ts`` column to a microsecond TIMESTAMP (LTZ).

    The driver's synthetic data has shipped ``ts`` two ways across rounds:
    parquet TIMESTAMP(NANOS) — readable only as a long under
    ``spark.sql.legacy.parquet.nanosAsLong`` — and TIMESTAMP(MICROS,
    isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ. Both are
    mapped to the same session-UTC TIMESTAMP so downstream
    ``unix_micros``/``date_trunc``/windows behave identically.
    """
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integral `div`, NOT double division: nanos ~2^60 exceed double
        # mantissa range, so (ts/1000).cast(long) is off by ±1us for a
        # quarter of the rows vs DuckDB's exact ns->us truncation — harmless
        # for hour/day buckets, fatal for exact timestamp arithmetic
        # (as-of lags, session durations).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        # session timezone is pinned to UTC by every query prologue, so the
        # NTZ->LTZ cast preserves the stored wall-clock instant exactly
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing the ``ts`` timestamp encoding
    (see :func:`_normalize_ts`). DataFrames (lazy plans — no data) are
    memoized per session so repeated queries skip file re-listing."""
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_ts(df)
    per_session[key] = df
    return df


def load_stream(spark: SparkSession, sf_dir: str, name: str = "events") -> DataFrame:
    """Streaming read of one synthetic table with ``ts`` normalized exactly
    like :func:`load_table`.

    The file stream source needs an explicit schema, which is derived from a
    batch read of the same parquet — robust to either timestamp encoding the
    driver has shipped.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", f"{name}.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    if name == "events":
        stream = _normalize_ts(stream)
    return stream


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


# Formats whose on-disk representation carries BinaryType natively. CSV/JSON
# transport sketch blobs as base64 text (the reference's README.md:208-220
# shows the same hex/base64 convention for moving BLOBs through text SQL).
_BINARY_NATIVE_FORMATS = {"parquet", "orc"}


def write_source(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    partition_by=None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame in any built-in columnar/text format.

    For text formats (csv/json) every ``binary`` column is base64-encoded so
    sketch blobs survive the round-trip byte-exactly; :func:`read_source`
    reverses it. All formats split into one file per partition, so a
    1000-executor write parallelizes the same way parquet does.
    """
    fmt = format.lower()
    if fmt not in _BINARY_NATIVE_FORMATS:
        for name, dtype in df.dtypes:
            if dtype == "binary":
                df = df.withColumn(name, F.base64(F.col(name)))
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_source(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    binary_cols=(),
) -> DataFrame:
    """Read a :func:`write_source` output back.

    Pass an explicit ``schema`` (DDL string or StructType) for text formats —
    schema inference costs an extra full scan and can widen types. Columns
    named in ``binary_cols`` are base64-decoded back to ``binary`` (no-op
    list for parquet/orc, which carry binary natively).
    """
    fmt = format.lower()
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", "true")
    df = reader.load(path)
    dtypes = dict(df.dtypes)
    for c in binary_cols:
        # only text formats base64 blobs; parquet/orc already yield binary
        if dtypes.get(c) == "string":
            df = df.withColumn(c, F.unbase64(F.col(c)))
    return df


def zorder_expr(ranges, bits: int = 12) -> F.Column:
    """Z-order (Morton) key over min/max-normalized columns.

    ``ranges`` maps column name -> (min, max) (driver-known bounds, e.g.
    from a prior ``agg(min, max)`` pass). Each column is scaled to a
    ``bits``-bit integer and the bits are interleaved, so sorting by the
    result clusters rows that are close in EVERY dimension: parquet
    row-group/file min-max stats then prune scans filtered on ANY prefix
    subset of the columns, not just the leading sort key. Pure Catalyst
    arithmetic (one expression, whole-stage-codegen); ``len(ranges)*bits``
    must fit in a signed 64-bit key.
    """
    k = len(ranges)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a 63-bit z-key")
    top = (1 << bits) - 1
    terms = []
    for i, (col, (lo, hi)) in enumerate(ranges.items()):
        span = float(hi) - float(lo)
        if not span > 0:  # constant column — or NaN span from NaN bounds —
            continue  # contributes nothing to ordering ('<= 0' would let
            # span=NaN through: the scaled CAST then throws under ANSI)
        scaled = (
            # nanvl INSIDE the clamp: a NaN value would otherwise ride
            # GREATEST (NaN compares greatest) into LEAST and emerge as
            # 1.0 — silently keying every NaN row to the TOP bucket;
            # degenerate values belong with the bucket-0 edge instead
            f"CAST(LEAST(GREATEST(nanvl((CAST(`{col}` AS DOUBLE)"
            f" - {float(lo)!r}) / {span!r}, 0.0d), 0.0d), 1.0d)"
            f" * {top} AS BIGINT)"
        )
        for b in range(bits):
            terms.append(
                f"(shiftleft(shiftright({scaled}, {b}) & 1, {b * k + i}))"
            )
    if not terms:
        return F.lit(0).cast("long")
    # SQL-text assembly (not nested Column ops): one selectExpr-style parse,
    # the same py4j-round-trip lesson the native builders follow
    return F.expr(" + ".join(terms))


def zorder_write(
    df: DataFrame,
    path: str,
    cols,
    bits: int = 12,
    num_files: int = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``cols``.

    Two passes: a cheap exact min/max aggregate per ordering column, then a
    range-repartition + within-partition sort on the interleaved key before
    the write. The result is the lakehouse data-layout lever: every output
    file covers a small bounding box in the ordering-column space, so
    row-group pruning stays effective for filters on any of the columns at
    100 TB — where a plain sort only skips on its leading column. The
    z-key itself is dropped before writing.
    """
    cols = list(cols)
    aggs = []
    for c in cols:
        # NaN-safe bounds: Spark's max() returns NaN when ANY value is NaN
        # (NaN compares greatest), which would poison span for the whole
        # column; NaN rows themselves key to bucket 0 in zorder_expr
        cd = F.col(c).cast("double")
        nn = F.when(~F.isnan(cd), cd)
        aggs += [
            F.min(nn).alias(f"__lo_{c}"),
            F.max(nn).alias(f"__hi_{c}"),
        ]
    b = df.agg(*aggs).first()
    ranges = {c: (b[f"__lo_{c}"], b[f"__hi_{c}"]) for c in cols}
    dead = [c for c, (lo, hi) in ranges.items() if lo is None or hi is None]
    if dead:
        raise ValueError(
            f"zorder_write: ordering column(s) {dead} have no non-NULL "
            "values (empty input?) — cannot derive min/max ranges"
        )
    z = df.withColumn("__z", zorder_expr(ranges, bits))
    n = num_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    z = z.repartitionByRange(int(n), "__z").sortWithinPartitions("__z")
    z.drop("__z").write.mode(mode).parquet(path)


def compact_sketch_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    keys,
    sketch_col: str = "sketch",
    coarsen=None,
    partition_by=None,
    coalesce_output: bool = True,
) -> DataFrame:
    """Compact a fine-grained sketch store into a coarser one.

    The reference's storage pattern keeps hourly/daily sketch tables and
    rolls them up by re-aggregating blobs (README.md:119-124, 191-198);
    operationally that leaves behind many small files and fine partitions
    long after anyone queries them at that grain. This operator rewrites
    the store at a coarser grain without ever touching fact data:

    - ``coarsen`` maps new column name -> SQL expression over the input
      columns (e.g. ``{"week": "date_trunc('week', day)"}``); the new
      columns join ``keys`` as the output grouping.
    - Blob merge runs through ``merge_sketches_native`` — map-only decode,
      bin-exploded hash aggregate with map-side partial aggregation, one
      re-encode at the boundary — so the shuffle carries combined
      (group, sign, bin) counts, not blobs, and the merge is byte-exact
      with building the coarse sketch from raw values directly.
    - With ``coalesce_output`` (default) the result is hash-repartitioned
      on the partition columns before the partitioned write, so each output
      partition directory gets one file: the small-file problem does not
      propagate to the compacted store, and readers get partition pruning
      at the new grain. Disable it when single per-partition outputs would
      be too large to write from one task.

    Returns the compacted table re-read from ``out_path`` (lazy).
    """
    from ..functions.aggregate import merge_sketches_native

    coarsen = dict(coarsen or {})
    keys = list(keys)
    df = spark.read.parquet(path)
    for name, expr in coarsen.items():
        df = df.withColumn(name, F.expr(expr))
    group_cols = list(coarsen) + keys
    merged = merge_sketches_native(df, group_cols, sketch_col)
    part_cols = list(partition_by) if partition_by else list(coarsen)
    if part_cols and coalesce_output:
        merged = merged.repartition(*[F.col(c) for c in part_cols])
    write_sketch_table(merged, out_path, partition_by=part_cols or None)
    return spark.read.parquet(out_path)
