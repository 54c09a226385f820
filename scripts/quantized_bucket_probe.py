"""Probe: quantized codes through the bucketed ANN paths (VERDICT r6 #4).

Compares the float and int8-quantized routes of ``lsh_topk`` and
``ivf_topk`` at 2M rows x 16 dims (the ann family shape, ~500 queries),
after the round-7 ``codes_col`` plumbing. What this demonstrates locally is
that the quantized route stays in the same wall-time class while scoring
with exact integer dots; the structural payoff — 2x smaller in-flight rows
(array<int> vs array<double>) through the bucket join/broadcast, 4x+
smaller at rest with Parquet bit-packing — only shows on a real cluster's
shuffle, which local[32] cannot exhibit.

Run: PYTHONPATH=/root/repo python scripts/quantized_bucket_probe.py
Writes one JSON line: {"lsh_float": s, "lsh_quant": s, ...}
"""
from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession, functions as F

N, DIMS, K = 2_000_000, 16, 10
Q_MOD = 4096  # ~488 queries
PLANES = 12
REPS = 2



def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_ddsketch_spark.operators import similarity as sim
    from bench import ANN_PRIMES as PRIMES

    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0 + 0.5 AS DOUBLE)"
        for p in PRIMES[:DIMS]
    ) + ")"

    def gen(where=None):
        df = spark.range(N, numPartitions=64).selectExpr(
            "id AS vec_id", f"{vec} AS embedding", "id % 64 AS label"
        )
        return df.where(where) if where is not None else df

    corpus = gen()
    queries = gen(F.col("vec_id") % Q_MOD == 0)
    scale = sim.quantize_calibration(queries, bits=8)  # same value dist as corpus
    qcorpus = sim.quantize_embeddings(corpus, scale, bits=8)
    qqueries = sim.quantize_embeddings(queries, scale, bits=8)

    runs: dict[str, list[float]] = {}

    def timed(name, fn):
        fn()  # warm
        runs[name] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            runs[name].append(round(time.perf_counter() - t0, 3))

    timed("lsh_float", lambda: sim.lsh_topk(
        corpus, queries, k=K, planes=PLANES, dims=DIMS).collect())
    timed("lsh_quant", lambda: sim.lsh_topk(
        qcorpus, qqueries, k=K, planes=PLANES, dims=DIMS,
        codes_col="qcodes").collect())
    timed("ivf_float", lambda: sim.ivf_topk(
        corpus, queries, k=K, nprobe=4).collect())
    timed("ivf_quant", lambda: sim.ivf_topk(
        qcorpus, qqueries, k=K, nprobe=4, codes_col="qcodes").collect())

    out = {name: min(times) for name, times in runs.items()}
    out["raw_runs_sec"] = runs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
