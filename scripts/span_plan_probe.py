"""Plan-shape probe for duplicate_span_extents at the bench family shape.

Prints explain('formatted') for the span_extents_2m aggregate so the
duplicated-gram-subtree claim (census + probe branches each rebuild
scan + posexplode + per-doc window) can be checked against the actual
Exchange/Window node count, and records whether ReuseExchange fires.

Plan-only: nothing executes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

import bench
from duckdb_ddsketch_spark.operators import dedup

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("span-plan-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    t = bench._span_text_sql("id").replace("VARCHAR", "STRING")
    docs = spark.range(bench.N_SPAN, numPartitions=64).selectExpr(
        f"id AS doc_id", f"{t} AS text"
    )
    out = dedup.duplicate_span_extents(
        docs, text="text", id_col="doc_id", n=bench.SPAN_N, min_docs=2,
        gram_hash="xxhash64",
    ).agg(
        F.count(F.lit(1)).alias("n_extents"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("cut_tokens"),
    )
    out.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
