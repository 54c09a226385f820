"""Attribute the round-6 ann_brute regression (1.90 -> 2.69 s) fix by fix.

The round-6 BLAS correctness fixes (commits 14391b4/30b9b16) changed the
mapInPandas local-top-k in three ways: (a) a full-matrix NaN->-inf mask,
(b) widening the argpartition result to every row at/above the k-th score,
(c) a per-query Python loop doing a strided column scan + lexsort. The
verdict asked for the per-fix cost in isolation (VERDICT r6, "What's wrong
#3"). This probe times the score-kernel variants on the exact bench shape
(batch 10k x 128 dims, 128 queries, k=10) without Spark, so the deltas are
pure kernel cost:

  v5        round-5 kernel (argpartition only, nondeterministic ties)
  v6        round-6 kernel (mask + per-query widen/lexsort loop)
  v6_nomask v6 minus the NaN mask           -> isolates (a)
  v8        the landed vectorized kernel: in-place NaN fix, np.partition
            threshold (values only, no negation copy), one row-major
            nonzero + one lexsort over all (query, candidate) pairs, no
            per-query Python loop -> what similarity.py ships

Run: python scripts/ann_blas_cost_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np

B, NQ, DIMS, K = 10_000, 128, 128, 10
BATCHES = 20
REPS = 3


def make_batch(seed: int):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((B, DIMS))
    ids = np.arange(seed * B, (seed + 1) * B, dtype=np.int64)
    return ids, mat


def prep(q_mat, mat):
    q_norm = np.linalg.norm(q_mat, axis=1)
    norms = np.linalg.norm(mat, axis=1)
    denom = np.outer(norms, q_norm)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom > 0.0, (mat @ q_mat.T) / denom, -np.inf)
    return cos


def v5(ids, cos, q_ids):
    take = min(K + 1, cos.shape[0])
    top = np.argpartition(-cos, take - 1, axis=0)[:take]
    res = []
    for j, qid in enumerate(q_ids):
        for i in top[:, j]:
            if ids[i] != qid and np.isfinite(cos[i, j]):
                res.append((qid, ids[i], cos[i, j]))
    return res


def v6(ids, cos, q_ids, mask=True):
    cosm = np.where(np.isnan(cos), -np.inf, cos) if mask else cos
    take = min(K + 1, cosm.shape[0])
    part = np.argpartition(-cosm, take - 1, axis=0)[:take]
    res = []
    for j, qid in enumerate(q_ids):
        thresh = cosm[part[:, j], j].min()
        cand = np.nonzero(cosm[:, j] >= thresh)[0]
        order = np.lexsort((ids[cand], -cosm[cand, j]))
        for i in cand[order][:take]:
            if ids[i] != qid and np.isfinite(cosm[i, j]):
                res.append((qid, ids[i], cos[i, j]))
    return res


def v8(ids, cos, q_ids):
    cos = cos.copy()  # probe reuses cos across variants; the kernel owns its array
    np.nan_to_num(cos, copy=False, nan=-np.inf, neginf=-np.inf)
    n = cos.shape[0]
    take = min(K + 1, n)
    thresh = np.partition(cos, n - take, axis=0)[n - take]
    ri, qi = np.nonzero(cos >= thresh)
    order = np.lexsort((ids[ri], -cos[ri, qi], qi))
    qi, ri = qi[order], ri[order]
    starts = np.searchsorted(qi, np.arange(len(q_ids)))
    pos = np.arange(len(qi)) - starts[qi]
    sel = (pos < take) & (ids[ri] != q_ids[qi]) & np.isfinite(cos[ri, qi])
    qi, ri = qi[sel], ri[sel]
    return list(zip(q_ids[qi], ids[ri], cos[ri, qi]))


def main():
    rng = np.random.default_rng(0)
    q_mat = rng.standard_normal((NQ, DIMS))
    q_ids = np.arange(1_000_000, 1_000_000 + NQ, dtype=np.int64)

    batches = [make_batch(s) for s in range(BATCHES)]
    cosses = [(ids, prep(q_mat, mat)) for ids, mat in batches]

    # sanity: v6 and v7 must agree exactly (v5 is the nondeterministic one)
    for ids, cos in cosses[:3]:
        a = [(int(q), int(n), float(c)) for q, n, c in v6(ids, cos, q_ids)]
        b = [(int(q), int(n), float(c)) for q, n, c in v8(ids, cos, q_ids)]
        assert a == b, "v8 is not bit-identical to v6"

    out = {}
    for name, fn in [
        ("v5_round5", lambda i, c: v5(i, c, q_ids)),
        ("v6_round6", lambda i, c: v6(i, c, q_ids)),
        ("v6_nomask", lambda i, c: v6(i, c, q_ids, mask=False)),
        ("v8_vectorized", lambda i, c: v8(i, c, q_ids)),
    ]:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            for ids, cos in cosses:
                fn(ids, cos)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)

    # matmul+norms floor for context (the part no tie-break change touches)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for ids, mat in batches:
            prep(q_mat, mat)
        best = min(best, time.perf_counter() - t0)
    out["matmul_floor"] = round(best, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
