"""Marginal-scaling probe for semantic_dedup (the ann-probe pattern).

Runs the SemDeDup operator — deterministic k-means cells + within-cell
smaller-id dominance — on a synthetic corpus with 10% planted near-dups
at 1x and 4x (200k -> 800k vectors, 16 dims, k=64 cells). If the design
claim holds (assignment is map-only, pairs form only inside cells,
oversized cells sub-bucket), wall grows roughly linearly while the
dropped count tracks the planted-dup rate at both sizes.

The generator reuses the neardup probe's xxhash64 recipe (distinct
pseudo-random directions; a modular generator would alias ids).

Usage: python scripts/semantic_probe.py [driver_mem] [cpus]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_MEM = sys.argv[1] if len(sys.argv) > 1 else "16g"
CPUS = int(
    sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
)

N_1X = 200_000
DIMS = 16
K = 64
THRESHOLD = 0.9

_SIGNED_LONG_MAX = 9.223372036854776e18


def _vec_expr(perturb=None):
    comps = []
    for i in range(DIMS):
        c = (f"(CAST(xxhash64(CAST(base_id AS STRING), 'd{i}') AS DOUBLE)"
             f" / {_SIGNED_LONG_MAX} * 8.0)")
        if perturb is not None:
            amp = f"({perturb} * (CAST((base_id % 4) + 1 AS DOUBLE)))"
            c = (f"({c} + {amp} * (CAST(xxhash64(CAST(base_id AS STRING),"
                 f" 'n{i}') AS DOUBLE) / {_SIGNED_LONG_MAX}))")
        comps.append(f"CAST({c} AS DOUBLE)")
    return "array(" + ", ".join(comps) + ")"


def main():
    from pyspark.sql import SparkSession, functions as F

    from duckdb_ddsketch_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("semantic-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n):
        base = spark.range(n, numPartitions=64).selectExpr(
            "id AS vec_id", "id AS base_id"
        ).selectExpr("vec_id", _vec_expr() + " AS embedding")
        dups = spark.range(n, numPartitions=16).where("id % 10 = 0").selectExpr(
            f"id + {10 * n} AS vec_id", "id AS base_id"
        ).selectExpr("vec_id", _vec_expr(perturb=0.4) + " AS embedding")
        # materialize: the probe measures the OPERATOR, not generator
        # recompute under the k-means multi-pass (persist would too, but
        # localCheckpoint also truncates lineage like a real scanned table)
        return base.unionAll(dups).localCheckpoint()

    def run(n, subplanes=8):
        df = corpus(n)
        t0 = time.time()
        # a uniform synthetic corpus has no cluster structure, so every
        # k-means cell exceeds max_cell and the sign-LSH sub-bucketing —
        # the mechanism that keeps degenerate cells off O(n^2) — carries
        # the whole pairing load; subplanes is the log2(n) scaling knob
        # (subplanes=None exercises the round-6 auto law:
        # ceil(log2(max_cell_size / max_cell)) + 2)
        out = similarity.semantic_dedup(
            df, threshold=THRESHOLD, k=K, iters=2,
            max_cell=400, subplanes=subplanes,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(~F.col("is_kept"), 1).otherwise(0)).alias("dropped"),
        ).collect()[0]
        wall = round(time.time() - t0, 3)
        df.unpersist()
        return wall, int(agg["rows"]), int(agg["dropped"])

    run(N_1X // 4)  # warm-up
    w1, rows1, drop1 = run(N_1X)
    w4, rows4, drop4 = run(4 * N_1X)
    wa1, _, dropa1 = run(N_1X, subplanes=None)
    wa4, _, dropa4 = run(4 * N_1X, subplanes=None)

    print(json.dumps({
        "probe": "semantic_dedup",
        "k_cells": K, "dims": DIMS, "threshold": THRESHOLD,
        "n_1x": rows1, "wall_1x_sec": w1, "dropped_1x": drop1,
        "n_4x": rows4, "wall_4x_sec": w4, "dropped_4x": drop4,
        "wall_ratio": round(w4 / w1, 2),
        "dropped_rate_1x": round(drop1 / rows1, 4),
        "dropped_rate_4x": round(drop4 / rows4, 4),
        "wall_1x_auto_sec": wa1, "wall_4x_auto_sec": wa4,
        "wall_ratio_auto": round(wa4 / wa1, 2),
        "dropped_1x_auto": dropa1, "dropped_4x_auto": dropa4,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
