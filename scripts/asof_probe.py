"""Standalone probe for the 60M as-of family comparator (bench.py shape).

Usage: python scripts/asof_probe.py [driver_mem] [cpus]
Prints one JSON line with the timed run (after one warm-up).
"""

import json
import os
import sys
import time

DRIVER_MEM = sys.argv[1] if len(sys.argv) > 1 else "8g"
CPUS = int(
    sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
)

N_ASOF_L, N_ASOF_R = 54_000_000, 6_000_000


def main():
    from pyspark.sql import SparkSession, functions as F

    from duckdb_ddsketch_spark.operators import relational

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("asof-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n, expr_pairs, partitions=64):
        return spark.range(n, numPartitions=partitions).selectExpr(
            *[f"{e} AS {a}" for a, e in expr_pairs]
        )

    def asof():
        left = gen(N_ASOF_L, [("u", "id % 100000"), ("ts", "id * 7")])
        right = gen(N_ASOF_R, [("u", "id % 100000"), ("ts", "id * 71")])
        j = relational.asof_join(
            left, right, on=["u"], left_ts="ts", right_ts="ts", right_cols=[]
        )
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("ts_r").alias("matched"),
            F.sum(F.col("ts") - F.col("ts_r")).alias("lag_sum"),
        )

    rows = asof().collect()  # warm-up
    t0 = time.perf_counter()
    rows = asof().collect()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "asof_60m_sec": round(dt, 3),
                "driver_mem": DRIVER_MEM,
                "row": {k: rows[0][k] for k in ("n", "matched", "lag_sum")},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
