"""Declared query registry: Spark query + DuckDB oracle per operator.

Each entry exercises one function/operator from SURVEY.md §2 over the
driver's synthetic tables. Spark callables take ``(spark, sf_dir)``; oracle
SQL strings run in DuckDB against the same parquet (views pre-registered).
Column names and types are aligned on both sides (aggregates aliased
identically, approximate doubles cast to float) so the driver's
order-insensitive value hash matches.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import scalar as fs
from ..functions.aggregate import ddsketch_agg, sketch_values_agg
from ..operators import native
from ..sources import load_table
from . import oracle
from .oracle import qname, quantile_oracle_sql, rowwise_bin_value_sql

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def _declare(name: str, oracle_sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle_sql is not None:
            ORACLES[name] = oracle_sql
        return fn

    return deco


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _f32(*names):
    return [F.col(n).cast("float").alias(n) for n in names]


# ---------------------------------------------------------------------------
# q01 — flagship: native per-group quantiles (scan → hash agg → windows)
# ---------------------------------------------------------------------------

_Q01_QS = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


@_declare(
    "q01_price_quantiles_by_returnflag",
    quantile_oracle_sql(
        "lineitem",
        {"l_returnflag": "l_returnflag"},
        "l_extendedprice",
        quantiles=_Q01_QS,
    ),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    out = native.sketch_quantile_agg(
        li, ["l_returnflag"], "l_extendedprice", 0.01, _Q01_QS
    )
    return out.select(
        "l_returnflag",
        F.col("count"),
        *_f32("sum", "avg", "min", "max", *[f"p{qname(q)}" for q in _Q01_QS]),
    )


# ---------------------------------------------------------------------------
# q02 — ddsketch_create / ddsketch_empty (constructor semantics)
# ---------------------------------------------------------------------------


@_declare(
    "q02_create_empty",
    "SELECT CAST(0 AS BIGINT) AS count, CAST(17 AS INT) AS len",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    df = spark.range(1).select(F.lit(fs.ddsketch_create(0.01)).alias("sketch"))
    return df.select(
        fs.ddsketch_count(F.col("sketch")).alias("count"),
        F.length("sketch").cast("int").alias("len"),
    )


# ---------------------------------------------------------------------------
# q03 — ddsketch_add + ddsketch_quantile, per row (scalar pipeline)
# ---------------------------------------------------------------------------

_BIN_SQL, _VAL_SQL = rowwise_bin_value_sql("l_quantity")


@_declare(
    "q03_add_rowwise",
    f"""
    SELECT l_orderkey, l_linenumber, {_VAL_SQL} AS p50
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 0)
    empty = fs.ddsketch_create(0.01)
    sk = fs.ddsketch_add(F.lit(empty), F.col("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fs.ddsketch_quantile(sk, F.lit(0.5)).cast("float").alias("p50"),
    )


# ---------------------------------------------------------------------------
# q04 — ddsketch_merge (merged sketch == sketch of the value union)
# ---------------------------------------------------------------------------


@_declare(
    "q04_merge_two_sketches",
    quantile_oracle_sql(
        "lineitem",
        {},
        "l_quantity",
        quantiles=(0.5,),
        stats=("count", "min", "max"),
        where="l_returnflag IN ('A', 'R')",
    ),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").agg(
        sketch_values_agg(F.col("l_quantity")).alias("sa")
    )
    r = li.where(F.col("l_returnflag") == "R").agg(
        sketch_values_agg(F.col("l_quantity")).alias("sr")
    )
    merged = a.crossJoin(r).select(
        fs.ddsketch_merge(F.col("sa"), F.col("sr")).alias("m")
    )
    return merged.select(
        fs.ddsketch_count(F.col("m")).alias("count"),
        fs.ddsketch_min(F.col("m")).cast("float").alias("min"),
        fs.ddsketch_max(F.col("m")).cast("float").alias("max"),
        fs.ddsketch_quantile(F.col("m"), F.lit(0.5)).cast("float").alias("p50"),
    )


# ---------------------------------------------------------------------------
# q05..q09 — scalar extractors over grouped value sketches (orders table)
# ---------------------------------------------------------------------------


def _orders_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        sketch_values_agg(F.col("o_totalprice")).alias("s")
    )


def _orders_oracle(stats):
    return quantile_oracle_sql(
        "orders",
        {"o_orderpriority": "o_orderpriority"},
        "o_totalprice",
        stats=stats,
    )


@_declare("q05_count_by_priority", _orders_oracle(("count",)))
def q05(spark, sf_dir):
    _prep(spark)
    return _orders_sketch(spark, sf_dir).select(
        "o_orderpriority", fs.ddsketch_count(F.col("s")).alias("count")
    )


@_declare("q06_min_by_priority", _orders_oracle(("min",)))
def q06(spark, sf_dir):
    _prep(spark)
    return _orders_sketch(spark, sf_dir).select(
        "o_orderpriority", fs.ddsketch_min(F.col("s")).cast("float").alias("min")
    )


@_declare("q07_max_by_priority", _orders_oracle(("max",)))
def q07(spark, sf_dir):
    _prep(spark)
    return _orders_sketch(spark, sf_dir).select(
        "o_orderpriority", fs.ddsketch_max(F.col("s")).cast("float").alias("max")
    )


@_declare("q08_sum_by_priority", _orders_oracle(("sum",)))
def q08(spark, sf_dir):
    _prep(spark)
    return _orders_sketch(spark, sf_dir).select(
        "o_orderpriority", fs.ddsketch_sum(F.col("s")).cast("float").alias("sum")
    )


@_declare("q09_avg_by_priority", _orders_oracle(("avg",)))
def q09(spark, sf_dir):
    _prep(spark)
    return _orders_sketch(spark, sf_dir).select(
        "o_orderpriority", fs.ddsketch_avg(F.col("s")).cast("float").alias("avg")
    )


# ---------------------------------------------------------------------------
# q10 — ddsketch_stats struct (flattened)
# ---------------------------------------------------------------------------


@_declare(
    "q10_stats_by_event_type",
    quantile_oracle_sql(
        "events",
        {"event_type": "event_type"},
        "value",
        stats=("count", "sum", "min", "max", "avg"),
    ),
)
def q10(spark, sf_dir):
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(sketch_values_agg(F.col("value")).alias("s"))
    st = sk.select("event_type", fs.ddsketch_stats(F.col("s")).alias("st"))
    return st.select(
        "event_type",
        F.col("st.count").alias("count"),
        F.col("st.sum").cast("float").alias("sum"),
        F.col("st.min").cast("float").alias("min"),
        F.col("st.max").cast("float").alias("max"),
        F.col("st.avg").cast("float").alias("avg"),
    )


# ---------------------------------------------------------------------------
# q11 — ddsketch_agg roll-up over pre-serialized sketches (the reference's
# canonical workload: hourly sketches → daily/service roll-up)
# ---------------------------------------------------------------------------

_Q11_QS = (0.5, 0.95, 0.99)


@_declare(
    "q11_agg_rollup_event_type",
    quantile_oracle_sql(
        "events",
        {"event_type": "event_type"},
        "value",
        quantiles=_Q11_QS,
        stats=("count",),
    ),
)
def q11(spark, sf_dir):
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    # pre-serialized sketch table (FIXTURES.md `pre_sketches` pattern) built
    # on the native path — wire bytes only materialize at the boundary —
    # then the reference's canonical ddsketch_agg roll-up over the blobs.
    pre = native.sketch_struct_agg(ev, ["day", "event_type"], "value", 0.01).select(
        "day", "event_type", native.struct_to_wire("sketch").alias("sketch")
    )
    rolled = pre.groupBy("event_type").agg(ddsketch_agg("sketch").alias("s"))
    return rolled.select(
        "event_type",
        fs.ddsketch_count(F.col("s")).alias("count"),
        *[
            fs.ddsketch_quantile(F.col("s"), F.lit(q)).cast("float").alias(f"p{qname(q)}")
            for q in _Q11_QS
        ],
    )


# ---------------------------------------------------------------------------
# q12 — ddsketch_stats_agg (stats_full ∘ ddsketch_agg), flattened
# ---------------------------------------------------------------------------

_Q12_STATS = ("count", "sum", "avg", "min", "max")


@_declare(
    "q12_stats_agg_by_linestatus",
    quantile_oracle_sql(
        "lineitem",
        {"l_linestatus": "l_linestatus"},
        "l_discount",
        quantiles=(0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
        stats=_Q12_STATS,
    ),
)
def q12(spark, sf_dir):
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # two-level shape: pre-sketch per (group, sub-bucket) — bounded fan-in per
    # pandas batch — then merge the serialized sketches per group. Identical
    # final bins to direct ingest; this is the scalable ingest topology.
    pre = li.groupBy(
        "l_linestatus", (F.crc32(F.col("l_orderkey").cast("string")) % 64).alias("bkt")
    ).agg(sketch_values_agg(F.col("l_discount")).alias("sk"))
    agg = pre.groupBy("l_linestatus").agg(
        fs.ddsketch_stats_full(ddsketch_agg("sk")).alias("st")
    )
    return agg.select(
        "l_linestatus",
        F.col("st.count").alias("count"),
        F.col("st.sum").cast("float").alias("sum"),
        F.col("st.avg").cast("float").alias("avg"),
        F.col("st.min").cast("float").alias("min"),
        F.col("st.max").cast("float").alias("max"),
        F.col("st.p25").cast("float").alias("p25"),
        F.col("st.p50").cast("float").alias("p50"),
        F.col("st.p75").cast("float").alias("p75"),
        F.col("st.p90").cast("float").alias("p90"),
        F.col("st.p95").cast("float").alias("p95"),
        F.col("st.p99").cast("float").alias("p99"),
    )


# ---------------------------------------------------------------------------
# q13 — native day-level roll-up with many groups (scale-shaped)
# ---------------------------------------------------------------------------

_Q13_QS = (0.5, 0.9, 0.99)


@_declare(
    "q13_native_daily_rollup",
    quantile_oracle_sql(
        "events",
        {
            "day": "strftime(date_trunc('day', ts), '%Y-%m-%d')",
            "event_type": "event_type",
        },
        "value",
        quantiles=_Q13_QS,
        stats=("count", "avg"),
    ),
)
def q13(spark, sf_dir):
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    out = native.sketch_quantile_agg(ev, ["day", "event_type"], "value", 0.01, _Q13_QS)
    return out.select(
        "day",
        "event_type",
        "count",
        *_f32("avg", *[f"p{qname(q)}" for q in _Q13_QS]),
    )


# ---------------------------------------------------------------------------
# q14 — native struct working form: build, merge, extract (no wire hops)
# ---------------------------------------------------------------------------


@_declare(
    "q14_struct_merge_native",
    quantile_oracle_sql(
        "orders",
        {"o_orderstatus": "o_orderstatus"},
        "o_totalprice",
        quantiles=(0.5, 0.9),
        stats=("count",),
    ),
)
def q14(spark, sf_dir):
    _prep(spark)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate"))
    )
    per_month = native.sketch_struct_agg(
        orders, ["o_orderstatus", "month"], "o_totalprice", 0.01
    )
    merged = native.merge_struct_sketches(per_month, ["o_orderstatus"], "sketch")
    return merged.select(
        "o_orderstatus",
        native.struct_count(F.col("sketch")).alias("count"),
        native.struct_quantile("sketch", 0.5).cast("float").alias("p50"),
        native.struct_quantile("sketch", 0.9).cast("float").alias("p90"),
    )
