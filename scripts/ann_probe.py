"""Marginal-scaling probe for the ANN brute-force family (bench.py shape).

Times the identical brute_force_topk_blas workload at 1x and 4x the
comparator's corpus (2M -> 8M vectors, same 128 queries): if the design
claim holds (corpus never shuffles, local top-k is distributive, compute
is the Arrow+BLAS scan), wall time grows far slower than 4x at the 60M
scale point because fixed costs amortize.

Usage: python scripts/ann_probe.py [driver_mem] [cpus]
Prints one JSON line after a warm-up pass at the small size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_MEM = sys.argv[1] if len(sys.argv) > 1 else "8g"
CPUS = int(
    sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
)

import bench


def main():
    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ann-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0 + 0.5 AS DOUBLE)"
        for p in bench.ANN_PRIMES
    ) + ")"

    def run(n_corpus):
        corpus = spark.range(n_corpus, numPartitions=64).selectExpr(
            "id AS vec_id", f"{vec} AS embedding"
        )
        queries = spark.range(bench.N_ANN_Q).selectExpr(
            "id AS vec_id", f"{vec} AS embedding"
        )
        similarity.brute_force_topk_blas(
            corpus, queries, k=bench.ANN_K, max_query_rows=bench.N_ANN_Q
        ).collect()

    run(bench.N_ANN_CORPUS)  # warm-up
    out = {}
    for label, n in (("2m", bench.N_ANN_CORPUS), ("8m", 4 * bench.N_ANN_CORPUS)):
        t0 = time.perf_counter()
        run(n)
        out[f"ann_{label}_sec"] = round(time.perf_counter() - t0, 3)
    out["scaleup_4x_time_ratio"] = round(out["ann_8m_sec"] / out["ann_2m_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
