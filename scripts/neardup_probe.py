"""Scale evidence for embedding_neardup_lsh (the ANN-probe pattern).

Two measurements, one JSON line:

1. RECALL vs the exact baseline: a corpus of zero-centered deterministic
   vectors plus a planted 10% near-duplicate cohort (small additive
   perturbation, cos ~0.999).  Ground truth = cosine_near_pairs (the
   documented exact O(n^2) verifier) at two fixed thresholds; recall =
   |lsh-pairs ∩ exact-pairs| / |exact-pairs|.  Precision is 1.0 by
   construction (the LSH path ends in the same exact cosine filter), so
   recall is the only approximation axis.

2. WALL at 1x / 4x corpus: the bucketed operator at 200k -> 800k vectors
   with planes held fixed (16) and with planes scaled (+2, holding
   expected bucket occupancy constant).  Candidate-pair counts are the
   quadratic term (n^2 / 2^planes per table); holding occupancy constant
   is the documented knob that keeps the verify stage linear-ish.

Usage: python scripts/neardup_probe.py [driver_mem] [cpus]
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

N_RECALL_BASE = 2_000        # + 10% planted dups -> 2,200 rows, exact is cheap
RECALL_DIMS = 32
THRESHOLDS = (0.80, 0.90)    # planted dups sit ~0.999; random pairs center ~0
N_SCALE = 100_000
SCALE_DIMS = 32
SCALE_THRESHOLD = 0.90

_SIGNED_LONG_MAX = 9.223372036854776e18


def _vec_expr(dims, perturb=None):
    """Deterministic pseudo-random zero-centered vector via xxhash64.

    Component i ~ uniform[-8, 8), keyed on (base_id, i): every base_id
    gets a genuinely distinct direction (a modular-arithmetic generator
    would alias ids and flood the exact baseline with true duplicates).
    ``perturb`` adds an independently-hashed small offset so the row is a
    near-duplicate (cos ~0.9999) of its base, never an exact one.
    """
    comps = []
    for i in range(dims):
        c = (f"(CAST(xxhash64(CAST(base_id AS STRING), 'd{i}') AS DOUBLE)"
             f" / {_SIGNED_LONG_MAX} * 8.0)")
        if perturb is not None:
            # amplitude cycles 1..8 by id: planted pairs span cos ~0.99
            # down to ~0.7, so recall is measured across the threshold
            # boundary instead of only on trivially-identical pairs
            amp = f"({perturb} * (CAST((base_id % 8) + 1 AS DOUBLE)))"
            c = (f"({c} + {amp} * (CAST(xxhash64(CAST(base_id AS STRING),"
                 f" 'n{i}') AS DOUBLE) / {_SIGNED_LONG_MAX}))")
        comps.append(f"CAST({c} AS DOUBLE)")
    return "array(" + ", ".join(comps) + ")"


def main():
    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("neardup-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- recall vs exact ------------------------------------------------
    base = spark.range(N_RECALL_BASE).selectExpr(
        "id AS vec_id", "id AS base_id"
    ).selectExpr("vec_id", _vec_expr(RECALL_DIMS) + " AS embedding")
    dups = spark.range(N_RECALL_BASE).where("id % 10 = 0").selectExpr(
        f"id + {N_RECALL_BASE} AS vec_id", "id AS base_id"
    ).selectExpr(
        "vec_id", _vec_expr(RECALL_DIMS, perturb=1.0) + " AS embedding"
    )
    corpus = base.unionAll(dups).cache()
    n_rows = corpus.count()

    recall = {}
    for thr in THRESHOLDS:
        exact = {
            (r.id_a, r.id_b)
            for r in similarity.cosine_near_pairs(corpus, thr).collect()
        }
        entry = {"exact_pairs": len(exact)}
        for tables in (4, 8):  # OR-construction: recall must rise with tables
            lsh = {
                (r.id_a, r.id_b)
                for r in similarity.embedding_neardup_lsh(
                    corpus, thr, planes=8, tables=tables, dims=RECALL_DIMS
                ).collect()
            }
            assert lsh <= exact, "LSH emitted a pair the exact verifier rejects"
            entry[f"recall_t{tables}"] = (
                round(len(lsh) / len(exact), 4) if exact else None
            )
        recall[str(thr)] = entry
    corpus.unpersist()

    # ---- wall at 1x / 4x ------------------------------------------------
    def scale_corpus(n):
        base = spark.range(n, numPartitions=64).selectExpr(
            "id AS vec_id", "id AS base_id"
        ).selectExpr("vec_id", _vec_expr(SCALE_DIMS) + " AS embedding")
        # 10% planted near-dups: verify load scales with n (constant
        # near-dup density per doc), the realistic corpus shape
        dups = spark.range(n, numPartitions=16).where("id % 10 = 0").selectExpr(
            f"id + {10 * n} AS vec_id", "id AS base_id"
        ).selectExpr(
            "vec_id", _vec_expr(SCALE_DIMS, perturb=1.0) + " AS embedding"
        )
        return base.unionAll(dups)

    def run(n, planes):
        df = scale_corpus(n)
        t0 = time.time()
        cnt = similarity.embedding_neardup_lsh(
            df, SCALE_THRESHOLD, planes=planes, tables=2, dims=SCALE_DIMS
        ).count()
        return round(time.time() - t0, 3), cnt

    run(N_SCALE // 4, 16)  # warm-up: JIT + codegen on the same plan shape
    wall_1x, pairs_1x = run(N_SCALE, 16)
    wall_4x_fixed, pairs_4x_fixed = run(4 * N_SCALE, 16)
    # +2 planes = 4x buckets: expected occupancy (n / 2^planes) held constant
    wall_4x_scaled, pairs_4x_scaled = run(4 * N_SCALE, 18)
    # planes=None: the round-6 _auto_planes default must reproduce the
    # occupancy-held law by itself (16 at ~110k rows, 18 at ~440k — the
    # corpus carries +10% planted dups) at the cost of one count() job
    wall_1x_auto, pairs_1x_auto = run(N_SCALE, None)
    wall_4x_auto, pairs_4x_auto = run(4 * N_SCALE, None)

    print(json.dumps({
        "probe": "embedding_neardup_lsh",
        "recall_corpus_rows": n_rows,
        "recall": recall,
        "scale": {
            "n_1x": N_SCALE,
            "wall_1x_sec": wall_1x,
            "pairs_1x": pairs_1x,
            "wall_4x_fixed_planes_sec": wall_4x_fixed,
            "pairs_4x_fixed_planes": pairs_4x_fixed,
            "wall_4x_scaled_planes_sec": wall_4x_scaled,
            "pairs_4x_scaled_planes": pairs_4x_scaled,
            "ratio_fixed": round(wall_4x_fixed / wall_1x, 2),
            "ratio_scaled": round(wall_4x_scaled / wall_1x, 2),
            "wall_1x_auto_sec": wall_1x_auto,
            "pairs_1x_auto": pairs_1x_auto,
            "wall_4x_auto_sec": wall_4x_auto,
            "pairs_4x_auto": pairs_4x_auto,
            "ratio_auto": round(wall_4x_auto / wall_1x_auto, 2),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
