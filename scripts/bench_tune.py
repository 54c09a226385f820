"""Quick A/B of AQE coalesce settings on the slow headline queries."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
NAMES = [
    "q11_agg_rollup_event_type",
    "q12_stats_agg_by_linestatus",
    "q14_struct_merge_native",
    "q01_price_quantiles_by_returnflag",
]


def run(extra_conf):
    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark.plans import declared

    b = (
        SparkSession.builder.master("local[32]")
        .appName("bench-tune")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    queries = declared.STAGED_QUERIES
    for name in NAMES:
        queries[name](spark, SF_DIR).collect()
    out = {}
    for name in NAMES:
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).collect()
            reps.append(time.perf_counter() - t0)
        out[name] = round(sorted(reps)[1], 3)
    spark.stop()
    return out


if __name__ == "__main__":
    variant = sys.argv[1]
    confs = {
        "base": {},
        "coalesce": {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        },
        "coalesce_local": {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
            "spark.sql.adaptive.localShuffleReader.enabled": "true",
            "spark.scheduler.mode": "FIFO",
            "spark.locality.wait": "0",
        },
    }
    print(variant, run(confs[variant]))
