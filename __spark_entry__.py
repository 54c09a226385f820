"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Queries/oracles are declared in ``duckdb_ddsketch_spark.plans.declared``
(one entry per operator from SURVEY.md §2, plus the beyond-reference
training-data operators) and curated into exactly 50 driver-facing slots
in ``plans.composites`` (the driver grades at most 50 queries; COVERAGE.md
maps each slot to its member operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-returnflag DDSketch
    quantiles of l_extendedprice via the fully-native Catalyst path."""
    from duckdb_ddsketch_spark.plans import declared

    return declared.QUERIES["q01_price_quantiles_by_returnflag"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from duckdb_ddsketch_spark.plans import declared

    return dict(declared.QUERIES)


def oracle_sql() -> dict[str, str]:
    from duckdb_ddsketch_spark.plans import declared

    return dict(declared.ORACLES)
