"""What does PCA 64 -> 8 reduction buy the bucketed ANN path at 1M rows?

A 100 TB vector pipeline reduces before indexing. This probe measures the
full pipeline trade on a low-intrinsic-rank corpus (rank 8 mixed into 64
observed dims + small noise — the shape real embedding spaces
approximate):

  route A: ivf_topk on the raw 64-dim float vectors
  route B: pca_components (sampled) -> pca_project to 8 dims ->
           ivf_topk on the reduced vectors (projection cost INCLUDED)

Both routes report wall time and recall@k against full-width brute-force
cosine ground truth on the probed queries. Run:

    PYTHONPATH=/root/repo python scripts/pca_reduction_probe.py

Findings land in SCALING.md (Similarity search section).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402

N = 1_000_000
D = 64
R = 8  # intrinsic rank
K = 10
CELLS = 64
N_Q = 100
LATENT_PRIMES = (13, 101, 977, 8191, 131, 337, 547, 761)


def main():
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
    from duckdb_ddsketch_spark.operators import decomposition as dec
    from duckdb_ddsketch_spark.operators import similarity as sim

    # rank-R corpus: latent_l = ((id*p_l) % 1024)/64 - 8; observed dim d
    # mixes latents with deterministic +/-1ish weights + a small
    # dim-dependent dither so no two dims are identical
    rng = np.random.default_rng(17)
    W = rng.choice([-1.0, -0.5, 0.5, 1.0], size=(D, R))
    lat = [f"(((id * {p}) % 1024) / 64.0 - 8.0)" for p in LATENT_PRIMES]
    dims = []
    for d in range(D):
        terms = " + ".join(
            f"({W[d, l]!r}) * {lat[l]}" for l in range(R)
        )
        dither = f"((id * {3 + 2 * d}) % 97) / 9700.0"
        dims.append(f"CAST({terms} + {dither} AS DOUBLE)")
    vec = "array(" + ", ".join(dims) + ")"

    def corpus():
        # cells must be GEOMETRIC for IVF to mean anything: bucket by the
        # dominant latent (a proxy for a coarse clustering); id % CELLS
        # would give nprobe/CELLS recall by construction
        return spark.range(N, numPartitions=32).selectExpr(
            "id AS vec_id", f"{vec} AS embedding",
            f"CAST(((id * {LATENT_PRIMES[0]}) % 1024) * {CELLS} / 1024"
            " AS INT) AS label",
        )

    def queries(df):
        return df.where(F.col("vec_id") % (N // N_Q) == 0)

    # ---- route A: raw 64-dim IVF --------------------------------------
    c = corpus()
    for run in range(2):
        t0 = time.perf_counter()
        outA = sim.ivf_topk(c, queries(c), k=K, nprobe=2).collect()
        tA = time.perf_counter() - t0
        print(f"route A (64-dim ivf) run{run}: {tA:.2f}s rows={len(outA)}",
              flush=True)

    # ---- route B: PCA-8 reduce -> store -> IVF (staged timings) -------
    # the real pipeline projects ONCE, stores reduced vectors, and runs
    # every downstream consumer on the stored column — so stats,
    # projection, and query are timed separately and the reduced corpus
    # is persisted like a stored table
    for run in range(2):
        cB = corpus()
        t0 = time.perf_counter()
        sample = cB.where(F.col("vec_id") % 200 == 0)  # 5k-row stats pass
        mean, comps, ev = dec.pca_components(sample, k=R, dims=D)
        t_stats = time.perf_counter() - t0
        red = dec.pca_project(cB, mean, comps).select(
            "vec_id", F.col("pc").alias("embedding"), "label"
        ).persist()
        t0 = time.perf_counter()
        red.count()
        t_proj = time.perf_counter() - t0
        t0 = time.perf_counter()
        outB = sim.ivf_topk(red, queries(red), k=K, nprobe=2).collect()
        t_q = time.perf_counter() - t0
        print(f"route B run{run}: stats={t_stats:.2f}s project+store="
              f"{t_proj:.2f}s ivf-query={t_q:.2f}s rows={len(outB)}",
              flush=True)
        red.unpersist()

    # ---- recall vs full-width exact ground truth (BLAS brute) ---------
    c = corpus()
    truth_rows = sim.brute_force_topk_blas(
        c, queries(c), k=K, max_query_rows=N_Q + 1
    ).collect()
    truth = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(out):
        hits = tot = 0
        for r in out:
            tot += 1
            hits += int(r.neighbor_id in truth[r.query_id])
        return hits / tot, tot

    rA, nA = recall(outA)
    rB, nB = recall(outB)
    print(f"recall@{K} vs exact full-width: A={rA:.3f} ({nA})  "
          f"B={rB:.3f} ({nB})")


if __name__ == "__main__":
    main()
