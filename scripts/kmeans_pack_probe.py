"""Probe: kmeans_15m_d64 cached-corpus representation (VERDICT r12 #4).

The fused BLAS route persists the projected (id, array<float> d=64)
corpus (~3.84 GB payload) and reads it once per Lloyd iteration plus
once for the summary pass. Variant: pack each vector into a 256-byte
float32 BinaryType cell (one extra mapInArrow pass before the cache)
and np.frombuffer it inside the iteration kernels — a denser columnar
cache (no per-element offsets/null word) traded against one more Arrow
boundary on the build.

Phases timed per variant, interleaved, fresh numbers each rep:
  build  — persist + materialize (count)
  iter   — one BLAS distance+argmin+quantized-sum pass over the cache
           (the _iterate_blas shape), twice
Centroid sums are asserted equal across representations.

Usage: python scripts/kmeans_pack_probe.py [n_rows] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("kmeans-pack-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.operators import clustering as cl

KM_WIDE_PRIMES = (
    13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71, 73,
    79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223,
    227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283,
    293, 307, 311, 313, 317, 331, 337, 347,
)
ND = len(KM_WIDE_PRIMES)
SCALE = cl._SCALE


def gen():
    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0D AS FLOAT)" for p in KM_WIDE_PRIMES
    ) + ")"
    return spark.range(N, numPartitions=64).selectExpr(
        "id AS vec_id", f"{vec} AS embedding"
    )


CENTS = [
    [float(((cid * p) % 1024) / 64.0) for p in KM_WIDE_PRIMES]
    for cid in range(8)
]


def iter_array(df):
    """_iterate_blas shape over the array<float> column."""
    import numpy as np

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(CENTS, dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        k = C.shape[0]
        n_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, ND), dtype=np.int64)
        for rb in batches:
            X, _ = cl._rb_vec_matrix(rb.column(0), ND)
            if X is None:
                continue
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            idx = np.argmin(d, axis=1)
            q = np.floor(X * SCALE).astype(np.int64)
            np.add.at(s_acc, idx, q)
            np.add.at(n_acc, idx, 1)
        yield pa.RecordBatch.from_pydict({
            "cid": pa.array(range(k), pa.int32()),
            "n": pa.array(n_acc, pa.int64()),
            "s": pa.array([r.tolist() for r in s_acc], pa.list_(pa.int64())),
        })

    part = df.select("embedding").mapInArrow(fn, "cid int, n long, s array<long>")
    rows = (
        part.select("cid", "n", F.posexplode("s").alias("d", "q"))
        .groupBy("cid")
        .agg(F.sum("n").alias("n"), F.sum("q").alias("sq"))
        .collect()
    )
    return sorted((r["cid"], r["n"], r["sq"]) for r in rows)


def pack(df):
    def fn(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            X, _ = cl._rb_vec_matrix(rb.column(0), ND)
            if X is None:
                continue
            b = X.astype(np.float32).tobytes()
            n = X.shape[0]
            arr = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(4 * ND), n, [None, pa.py_buffer(b)]
            )
            yield pa.RecordBatch.from_arrays(
                [arr.cast(pa.binary())], ["packed"]
            )

    return df.select("embedding").mapInArrow(fn, "packed binary")


def iter_packed(df):
    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(CENTS, dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        k = C.shape[0]
        n_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, ND), dtype=np.int64)
        for rb in batches:
            col = rb.column(0)
            buf = col.buffers()[2]
            n = len(col)
            X = np.frombuffer(buf, dtype=np.float32, count=n * ND).reshape(
                n, ND
            ).astype(np.float64)
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            idx = np.argmin(d, axis=1)
            q = np.floor(X * SCALE).astype(np.int64)
            np.add.at(s_acc, idx, q)
            np.add.at(n_acc, idx, 1)
        yield pa.RecordBatch.from_pydict({
            "cid": pa.array(range(k), pa.int32()),
            "n": pa.array(n_acc, pa.int64()),
            "s": pa.array([r.tolist() for r in s_acc], pa.list_(pa.int64())),
        })

    part = df.select("packed").mapInArrow(fn, "cid int, n long, s array<long>")
    rows = (
        part.select("cid", "n", F.posexplode("s").alias("d", "q"))
        .groupBy("cid")
        .agg(F.sum("n").alias("n"), F.sum("q").alias("sq"))
        .collect()
    )
    return sorted((r["cid"], r["n"], r["sq"]) for r in rows)


# equality of the aggregate sums across representations at small N
_N_SAVE = N
N = 200_000
a = iter_array(gen())
p = iter_packed(pack(gen()))
assert a == p, f"representation MISMATCH: {a[:2]} vs {p[:2]}"
print(f"sum equality at 200k rows: OK", flush=True)
N = _N_SAVE

for rnd in range(REPS):
    for name, mk, it in (
        ("array ", gen, iter_array),
        ("packed", lambda: pack(gen()), iter_packed),
    ):
        base = mk().persist()
        t0 = time.perf_counter()
        cnt = base.count()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        it(base)
        t_i1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        it(base)
        t_i2 = time.perf_counter() - t0
        base.unpersist(blocking=True)
        print(
            f"{name} rep{rnd}: build {t_build:.2f}s  iter1 {t_i1:.2f}s"
            f"  iter2 {t_i2:.2f}s  (n={cnt})",
            flush=True,
        )
