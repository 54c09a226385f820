"""Probe: k-means wall time vs embedding width — proves the codegen-cliff
fix (round-5 verdict item 2 / ADVICE clustering.py:60).

The flat-expansion distance SQL wins at small widths but emits ~4*k*dims
subexpressions; at realistic widths (k=64 x dims>=256) it would blow
Janino's 64KB generated-method limit and fall back to interpreted eval
(the measured 14 -> 267 s cliff shape). `_choose_method` now routes
assignment above `_EXPAND_TERM_BUDGET` through the Arrow+numpy BLAS
mapInArrow shape. This probe runs the SAME workload (k=64, 2 Lloyd
iterations + final assignment count) at dims=4 vs dims=256/768 and
reports wall time: PASS = wide dims scale ~linearly in per-element work
(no superlinear / interpreted cliff).

Run: PYTHONPATH=/root/repo python scripts/kmeans_dims_probe.py
Env: ROWS (default 2_000_000), K (default 64), DIMS (csv, default 4,256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from duckdb_ddsketch_spark.operators import clustering  # noqa: E402

ROWS = int(os.environ.get("ROWS", 2_000_000))
K = int(os.environ.get("K", 64))
DIMS = [int(x) for x in os.environ.get("DIMS", "4,256").split(",")]

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('CPUS', 32)}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

results = {}
for dims in DIMS:
    # deterministic integer-hash components, cheap to generate; the data
    # is PERSISTED before timing (the probe measures k-means, not the
    # generator — and feeding a derived array expression into the
    # expansion path is documented O(dims^2) under projection collapse)
    df = spark.range(ROWS).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, {d} - 1), d -> CAST("
            " pmod(id * 2654435761 + d * 40503, 1000) / 500.0 - 1.0"
            " AS FLOAT))".format(d=dims)
        ).alias("embedding"),
    ).persist()
    df.count()
    method = clustering._choose_method(K, dims, "auto")
    t0 = time.time()
    cents = clustering.kmeans_centroids(
        df, "embedding", "vec_id", k=K, iters=2
    )
    n = clustering.kmeans_assign(df, cents, "embedding").count()
    wall = time.time() - t0
    results[dims] = (method, wall, n)
    print(
        f"dims={dims:4d} k={K} rows={ROWS} method={method}"
        f" wall={wall:.1f}s assigned={n}",
        flush=True,
    )
    df.unpersist()

base_d = DIMS[0]
base = results[base_d][1]
for dims in DIMS[1:]:
    m, w, _ = results[dims]
    work = dims / base_d
    print(
        f"dims {base_d}->{dims}: {work:.0f}x per-element work,"
        f" {w / base:.1f}x wall ({m}) —"
        f" {'LINEAR-OK' if w / base <= work else 'SUPERLINEAR'}",
        flush=True,
    )
