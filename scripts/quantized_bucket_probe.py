"""Probe: quantized codes through the bucketed ANN paths (VERDICT r6 #4).

Compares the float and int8-quantized routes of ``lsh_topk`` and
``ivf_topk`` at 2M rows x 16 dims (the ann family shape, ~500 queries),
after the round-7 ``codes_col`` plumbing. Both routes read STORED columns
from parquet — quantization is a storage-side transform; deriving codes
on the fly inside a Catalyst plan re-inlines the transform into every
hyperplane projection (the round-5 projection-collapse hazard, measured
here at 4x wall) — so the staged layout is the honest shape. The probe
also reports the at-rest byte cut (parquet size of codes vs floats),
which is the structural 100 TB payoff; in-flight rows are 2x smaller
(array<int> vs array<double>) through the bucket join/broadcast.

Run: PYTHONPATH=/root/repo python scripts/quantized_bucket_probe.py
Writes one JSON line: {"lsh_float": s, "lsh_quant": s, ...}
"""
from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession, functions as F

N, DIMS, K = 2_000_000, 16, 10
# PRIME modulus: the generator components are ((id*p) % 1024)/64 + 0.5, so
# a power-of-two stride would make every selected query the constant
# [0.5]*16 vector (id % 4096 == 0 -> id*p % 1024 == 0) — a degenerate
# query set AND, if calibrated on, a tiny scale that saturates the corpus
# codes into a handful of giant buckets (how round 7 briefly measured a
# phantom 4x quantized-LSH "regression")
Q_MOD = 4093  # ~489 varied queries
PLANES = 12
REPS = 2



import os
import shutil


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

    stage = os.path.join(os.environ.get("TMPDIR", "/tmp"), "qbucket_probe_stage")
    shutil.rmtree(stage, ignore_errors=True)
    fpath, qpath = os.path.join(stage, "float"), os.path.join(stage, "codes")
    raw = gen()
    scale = sim.quantize_calibration(raw, bits=8)  # corpus-side, as shipped
    raw.write.parquet(fpath)
    sim.quantize_embeddings(raw, scale, bits=8).select(
        "vec_id", "label", "qcodes"
    ).write.parquet(qpath)

    def du(path):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(path) for f in fs
        )

    corpus = spark.read.parquet(fpath)
    queries = corpus.where(F.col("vec_id") % Q_MOD == 0)
    qcorpus = spark.read.parquet(qpath)
    qqueries = qcorpus.where(F.col("vec_id") % Q_MOD == 0)

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
    out["bytes_float_parquet"] = du(fpath)
    out["bytes_codes_parquet"] = du(qpath)
    out["raw_runs_sec"] = runs
    shutil.rmtree(stage, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
