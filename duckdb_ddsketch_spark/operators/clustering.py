"""Deterministic Lloyd's k-means over embedding columns.

Training-data pipelines cluster corpus embeddings for diversity-aware
sampling, near-dup triage, and topic balancing. This is the beyond-reference
clustering operator (the reference engine has no vector ops at all); it is
built so the APPROXIMATE iterative algorithm is still bit-reproducible
cross-engine, which is what lets the driver's exact value-hash gate check it
against a pure-SQL DuckDB oracle:

* init: the k smallest ``id_col`` rows seed the centroids (rank 0..k-1) —
  no RNG anywhere.
* centroid updates sum per-dimension FIXED-POINT BIGINT quantities
  (``floor(x * 2^20)``) instead of doubles: integer addition is associative,
  so the update is independent of partitioning / aggregation order. The mean
  is reconstructed as ``sum / (n * 2^20)`` in one double division.
* distances fold per-row, left-to-right, in double — the same shape the
  cosine operators use (`similarity.dot`), which both engines evaluate
  sequentially.
* argmin ties break on the smaller cluster id via lexicographic
  ``array_min(struct(dist, cid))``.

Scale shape (100 TB): assignment is MAP-ONLY — centroids ship to every task
as a literal expression (k*dims doubles, ~few KB; the driver collects k*dims
rows between iterations, never the data). The update aggregates
``posexplode``d quantized components with map-side partial aggregation, so
each iteration's shuffle is bounded by ``partitions * k * dims`` rows of
BIGINTs regardless of input row count. The input is persisted across
iterations (it is scanned ``iters + 1`` times). Round 8: the width probe
and seed fetch share ONE scan (uniform-width fast path), and
``kmeans_summary``'s wide/BLAS route persists one projected base across
the iterations AND a partition-collapsed final pass
(:func:`_summary_partials_blas`) — the wide-family profile showed the
input scan, not the BLAS math, dominating every pass (4 full scans for
2 iterations; now 1 cache fill + cached reads).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import _rb_vec_matrix

__all__ = ["kmeans_centroids", "kmeans_assign", "kmeans_summary"]

# 2^20 fixed-point scale: float32 inputs in [-1, 1] keep ~6 fractional
# decimal digits, and 100T rows * 2^20 still fits in int64 per dimension.
_SCALE = 1048576.0

# k*dims envelope for the flat-expansion distance SQL. Measured (round 6,
# 2 Lloyd iters + assign, local[32]; SCALING.md "k-means width sweep"):
#
#   k*dims    expand      blas     winner
#   8x4=32    4.3s/10M    17.4s    expand (4x)   <- the 60M family shape
#   16x4=64   2.6s/10M    10.1s    expand (4x)
#   8x8=64    4.4s/10M    11.6s    expand (2.6x)
#   8x16=128  29.3s/10M   11.0s    blas   (2.7x) <- codegen cliff crossed
#   16x8=128  41.5s/10M    9.6s    blas   (4.3x)
#   64x4=256  33.1s/2M     3.1s    blas   (10x)
#   64x256    n/a (64KB)  22.4s/2M blas
#
# The cliff between 64 and 128 terms is whole-stage codegen bailing to
# interpreted evaluation as the generated distance method outgrows the
# JIT-friendly size — wall jumps 7-15x, exactly the regression the
# expansion exists to avoid. Above the budget, "auto" routes through the
# Arrow+numpy BLAS mapInArrow shape (distance matrix per batch; map-only,
# the corpus never shuffles), which is flat in k*dims until real FLOPs
# dominate (64x256 at 2M rows: 22 s). The bit-identical-at-any-width
# escape hatch is method="fold" (same left-to-right summation as the
# expansion, interpreted per element); the oracle-gated declared queries
# pin method="expand" because their data is gate-sized and their DuckDB
# oracles mirror that exact summation.
_EXPAND_TERM_BUDGET = 64


def _choose_method(k: int, dims: int, method: str = "auto") -> str:
    if method != "auto":
        if method not in ("expand", "fold", "blas"):
            raise ValueError(
                f"method must be auto|expand|fold|blas, got {method!r}"
            )
        return method
    return "expand" if k * dims <= _EXPAND_TERM_BUDGET else "blas"


def _dist_sql(vec_sql: str, cvals: Sequence[float]) -> str:
    """Squared-L2 from ``vec_sql`` (array<float>) to a literal centroid.

    Expanded element arithmetic, not an ``aggregate(zip_with(...))`` fold:
    higher-order functions are interpreted per element while the expanded
    sum whole-stage-codegens (3.1x on the 60M assignment pass). The
    ``+`` chain is left-associative, so summation order — and therefore
    every double — is identical to the fold's and to the DuckDB mirror's
    list_aggregate sum (pinned by the driver gate).

    Caveat (measured, SCALING.md "vector-arithmetic shape findings"):
    the expansion indexes ``vec_sql`` per element, and projection
    collapse inlines a DERIVED embedding expression into every index —
    feed k-means a stored/scanned column (or checkpoint the projection
    first) if the embedding is computed by an expensive expression.
    """
    terms = [
        f"(CAST({vec_sql}[{d}] AS DOUBLE) - {v!r}D)"
        f" * (CAST({vec_sql}[{d}] AS DOUBLE) - {v!r}D)"
        for d, v in enumerate(cvals)
    ]
    return "(" + " + ".join(terms) + ")"


def _dist_fold_sql(vec_sql: str, cvals: Sequence[float]) -> str:
    """Squared-L2 as an ``aggregate(zip_with(...))`` fold — bit-identical
    to :func:`_dist_sql` by construction (same left-to-right summation of
    the same doubles), but O(1) generated-code size at any width. Each
    lambda step is interpreted, so this is the exactness fallback above
    the codegen budget, not the fast path (see ``_EXPAND_TERM_BUDGET``).
    """
    lits = ", ".join(f"{v!r}D" for v in cvals)
    return (
        f"aggregate(zip_with({vec_sql}, array({lits}),"
        f" (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        f" CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )


def _assign_expr(
    vec_col: str,
    centroids: List[Tuple[int, List[float]]],
    method: str = "expand",
) -> str:
    """SQL text: cluster id of the nearest centroid (ties -> smaller id).

    The fast ``vec[d]`` indexing raises under ANSI mode on a short
    array. `kmeans_assign` filters NULL/wrong-width rows, which covers
    every self-contained plan — but Catalyst can push a downstream
    join's derived ``isnotnull(cluster_id)`` predicate below that filter
    and evaluate this expression on raw rows. Consumers that JOIN on the
    assignment over possibly-ragged data must materialize first
    (``localCheckpoint`` — what `semantic_dedup` does); guarding the
    expression itself was measured and rejected: an IF() wrapper forces
    interpreted evaluation (14 -> 267 s at 60M), per-element get() costs
    2x (14 -> 28 s).
    """
    dist = _dist_sql if method == "expand" else _dist_fold_sql
    entries = ", ".join(
        f"struct({dist(f'`{vec_col}`', cvals)} AS d, {cid} AS cid)"
        for cid, cvals in centroids
    )
    return f"array_min(array({entries})).cid"


def _assign_blas(
    df: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    vec_col: str,
) -> DataFrame:
    """Wide-dims assignment: Arrow-batched numpy distance matrix.

    Map-only like the SQL expansion — centroids are closed over and
    shipped to every task (k*dims doubles); each batch computes
    ``|x|^2 - 2 x·C^T + |c|^2`` and argmins (ties -> first = smallest
    cid; the centroid list is cid-sorted). Deterministic per
    machine/numpy build; distances differ from the SQL fold only in
    float summation order, so assignment can flip on exact-tie ulps —
    method="fold" is the bit-identical-at-any-width route.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    # cid-ascending order makes argmin's first-index tie-break match the
    # expand/fold paths' array_min(struct(d, cid)) smallest-cid rule
    centroids = sorted(centroids, key=lambda t: t[0])
    cids = np.asarray([cid for cid, _ in centroids], dtype=np.int32)
    cmat = [list(c) for _, c in centroids]
    schema = StructType(
        list(df.schema.fields)
        + [StructField("cluster_id", IntegerType(), True)]
    )
    vec_pos = df.columns.index(vec_col)
    nd = len(cmat[0])

    # mapInArrow, not mapInPandas: the zero-copy list-buffer reshape
    # skips the per-row Arrow->pandas object conversion for EVERY
    # pass-through column as well as the vectors (measured ~5.5 s/pass
    # at 15M x 64 — below even the bare generator scan's agg wall)
    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(cmat, dtype=np.float64)
        c2 = (C * C).sum(axis=1)

        def with_col(rb, arr):
            return pa.RecordBatch.from_arrays(
                list(rb.columns) + [arr],
                names=list(rb.schema.names) + ["cluster_id"],
            )

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                yield with_col(rb, pa.array([], pa.int32()))
                continue
            X, ok = _rb_vec_matrix(rb.column(vec_pos), nd)
            if X is None:
                yield with_col(rb, pa.array([None] * n, pa.int32()))
                continue
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            idx = cids[np.argmin(d, axis=1)]
            if ok is None:
                arr = pa.array(idx, pa.int32())
            else:
                out = [None] * n
                for j, i in enumerate(np.flatnonzero(ok)):
                    out[int(i)] = int(idx[j])
                arr = pa.array(out, pa.int32())
            yield with_col(rb, arr)

    return df.mapInArrow(fn, schema=schema)


def _iterate_blas(
    df: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    vec_col: str,
) -> List[Tuple[int, List[float]]]:
    """One Lloyd update through the BLAS shape: assignment and the
    quantized per-cluster sums accumulate INSIDE the partition iterator
    (one emitted row per (partition, cluster)), so the shuffle carries
    <= partitions * k rows of int64 arrays — the same bound as the SQL
    update path. Quantization is ``floor(x * 2^20)`` on the identical
    doubles, so given the same assignment the update is bit-identical
    to the SQL path (integer sums are order-independent). NaN components
    follow the SQL path's CAST exactly (NaN -> 0). Components that
    quantize AT the int64 saturation bound (±inf, or finite
    |x| > ~8.8e12 at 2^20 scale) raise :func:`_check_sat` instead of
    entering the accumulation — numpy int64 sums would wrap SILENTLY on
    such values where the SQL twin either saturates a lone value or
    raises ARITHMETIC_OVERFLOW on the sum; loud beats either silent
    outcome, and numpy's undefined-astype (silent INT64_MIN) never
    fires (:func:`_quantize_i64`).
    """
    import numpy as np

    # same smallest-cid tie-break as _assign_blas
    centroids = sorted(centroids, key=lambda t: t[0])
    cids = [cid for cid, _ in centroids]
    cmat = [list(c) for _, c in centroids]

    # mapInArrow + zero-copy list-buffer reshape (see _assign_blas):
    # the distance/quantize pass no longer pays the Arrow->pandas
    # object-array conversion per batch
    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(cmat, dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        k, nd = C.shape
        n_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, nd), dtype=np.int64)
        for rb in batches:
            X, _ = _rb_vec_matrix(rb.column(0), nd)
            if X is None:
                continue
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            idx = np.argmin(d, axis=1)
            q = _quantize_i64(X)
            _check_sat(q)
            np.add.at(s_acc, idx, q)
            np.add.at(n_acc, idx, 1)
        nz = np.flatnonzero(n_acc)
        if not len(nz):
            return
        yield pa.RecordBatch.from_pydict(
            {
                "cid": pa.array([int(cids[i]) for i in nz], pa.int32()),
                "n": pa.array([int(n_acc[i]) for i in nz], pa.int64()),
                "s": pa.array(
                    [s_acc[i].tolist() for i in nz], pa.list_(pa.int64())
                ),
            }
        )

    part = df.select(vec_col).mapInArrow(fn, "cid int, n long, s array<long>")
    # ncnt and dsum are two plan subtrees over `part` with different
    # shuffles — without a cache the expensive distance/quantize pass runs
    # TWICE per iteration; the cached rows are only partitions x k (int64
    # arrays), so persisting costs ~nothing and halves the dominant stage
    part = part.persist()
    ncnt = part.groupBy("cid").agg(F.sum("n").alias("n"))
    dsum = (
        part.select("cid", F.posexplode("s").alias("d", "q"))
        .groupBy("cid", "d")
        .agg(F.sum("q").alias("sq"))
    )
    try:
        rows = (
            dsum.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "sq"))).alias("e"))
            .join(ncnt, "cid")
            .collect()
        )
    finally:
        part.unpersist()
    return [
        (
            int(r["cid"]),
            [float(x["sq"]) / (float(r["n"]) * _SCALE) for x in r["e"]],
        )
        for r in sorted(rows, key=lambda r: r["cid"])
    ]


def _summary_partials_blas(
    df: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    vec_col: str,
    label_col: Optional[str],
) -> DataFrame:
    """kmeans_summary's final pass in the partition-collapsed BLAS shape:
    assignment + the per-cluster (n, q0, q1[, lsum]) sums accumulate
    inside the Arrow iterator, one emitted row per (partition, cluster)
    — the shuffle carries <= partitions * k tiny rows instead of the
    full corpus with an appended cluster_id (the assign-then-aggregate
    form writes every embedding back through the Arrow boundary just to
    immediately collapse it; at 15M x 64 that passthrough was the
    single largest stage of the wide family). Bit-identical to the
    assign+agg path: same _assign_blas distance/argmin tie-break, same
    _quantize_i64 == SQL-CAST quantization (order-independent integer
    sums), label sums exact int64 (the caller gates on integral label
    types), and SQL ``sum`` NULL semantics — a partition whose cluster
    received no non-NULL element-0 / element-1 / label contribution
    emits a NULL partial (:func:`_elem01_present`), so an all-NULL
    cluster reports NULL exactly like ``sum(try_element_at(...))``
    instead of a fabricated 0 (NULL partials then compose through the
    final ``sum`` for free)."""
    centroids = sorted(centroids, key=lambda t: t[0])
    cids = [cid for cid, _ in centroids]
    cmat = [list(c) for _, c in centroids]
    nd = len(cmat[0])
    cols = [vec_col] + ([label_col] if label_col is not None else [])
    schema = "cid int, n long, q0 long, q1 long" + (
        ", lsum long" if label_col is not None else ""
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        C = np.asarray(cmat, dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        k = C.shape[0]
        n_acc = np.zeros(k, dtype=np.int64)
        q_acc = np.zeros((k, 2), dtype=np.int64)
        nn_acc = np.zeros((k, 2), dtype=np.int64)
        l_acc = np.zeros(k, dtype=np.int64)
        nl_acc = np.zeros(k, dtype=np.int64)
        for rb in batches:
            X, ok = _rb_vec_matrix(rb.column(0), nd)
            if X is None:
                continue
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            idx = np.argmin(d, axis=1)
            # counts ride np.bincount (buffered C); only the exact value
            # sums need the unbuffered np.add.at scatter. Null-presence
            # counts piggyback on bc in the no-nulls fast path and
            # scatter only the (rare) missing rows otherwise.
            bc = np.bincount(idx, minlength=k)
            n_acc += bc
            q = _quantize_i64(X[:, :2])
            _check_sat(q)
            np.add.at(q_acc, idx, q)
            nn = _elem01_present(rb.column(0), ok)
            if nn is None:
                nn_acc[:, 0] += bc
                nn_acc[:, 1] += bc
            else:
                nn_acc[:, 0] += bc - np.bincount(
                    idx[nn[:, 0] == 0], minlength=k
                )
                nn_acc[:, 1] += bc - np.bincount(
                    idx[nn[:, 1] == 0], minlength=k
                )
            if label_col is not None:
                lab_col = rb.column(1)
                # NULL labels contribute 0 to the sum (sum()'s NULL skip)
                # but are tracked so an all-NULL cluster emits NULL
                lab = pc.fill_null(
                    pc.cast(lab_col, pa.int64()), 0
                ).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                lv = (
                    None
                    if lab_col.null_count == 0
                    else lab_col.is_valid().to_numpy(zero_copy_only=False)
                )
                if ok is not None:
                    lab = lab[ok]
                    if lv is not None:
                        lv = lv[ok]
                np.add.at(l_acc, idx, lab)
                if lv is None:
                    nl_acc += bc
                else:
                    nl_acc += bc - np.bincount(idx[~lv], minlength=k)
        nz = np.flatnonzero(n_acc)
        if not len(nz):
            return
        out = {
            "cid": pa.array([int(cids[i]) for i in nz], pa.int32()),
            "n": pa.array(n_acc[nz], pa.int64()),
            "q0": pa.array(
                [int(q_acc[i, 0]) if nn_acc[i, 0] else None for i in nz],
                pa.int64(),
            ),
            "q1": pa.array(
                [int(q_acc[i, 1]) if nn_acc[i, 1] else None for i in nz],
                pa.int64(),
            ),
        }
        if label_col is not None:
            out["lsum"] = pa.array(
                [int(l_acc[i]) if nl_acc[i] else None for i in nz],
                pa.int64(),
            )
        yield pa.RecordBatch.from_pydict(out)

    return df.select(*cols).mapInArrow(fn, schema)


def _elem01_present(col, keep):
    """Per-kept-row 0/1 flags for list elements 0 and 1 being non-NULL,
    or ``None`` when the batch has no element nulls at all (the
    overwhelmingly common case — callers then credit full counts without
    a scatter). This is the nullity that ``sum(try_element_at(...))``
    carries but the NaN-projected matrix loses (a NULL element and a NaN
    element both become NaN in :func:`_rb_vec_matrix`; only the NULL is
    skipped by SQL ``sum``, though both contribute 0 numerically — so
    the flags matter exactly when a cluster has NO non-NULL
    contribution).

    Validity is read from ``col.values`` with the ABSOLUTE ``offsets`` —
    ``col.flatten()`` compacts the slicing offset away and would
    misalign the lookup on sliced batches (empirically pinned in
    tests)."""
    import numpy as np

    vals = col.values
    if vals.null_count == 0:
        return None
    va = vals.is_valid().to_numpy(zero_copy_only=False)
    offs = np.asarray(col.offsets)[:-1]
    if keep is not None:
        offs = offs[keep]
    out = np.empty((len(offs), 2), dtype=np.int64)
    out[:, 0] = va[offs]
    out[:, 1] = va[offs + 1]
    return out


# nearest float64s strictly inside the int64 range — _quantize_i64's
# finite-overflow clamp bounds; Long.MAX/MIN (the inf saturations) lie
# outside them, so one check covers both saturation kinds
_SAT_HI = 9223372036854774784
_SAT_LO = -9223372036854774784


def _check_sat(q) -> None:
    """Refuse saturated quantized values before an int64 accumulation.

    A component with |x| >~ 8.8e12 (at 2^20 scale) quantizes at the
    int64 clamp bound; summing it with anything wraps numpy's int64
    accumulators SILENTLY. The SQL twin on the same data either
    saturates a LONE such value (Spark's ANSI CAST clamps ±inf to
    Long.MAX/MIN without error) or raises ARITHMETIC_OVERFLOW once the
    sum actually overflows — so the two SQL outcomes are
    input-dependent, while silent wraparound is never one of them.
    Loud beats either: raise with the remedy. Values below the bound
    cannot wrap realistic partitions (2^63 / 2^43 ≈ 10^6 rows of
    |x| = 8e6 per cluster per batch)."""
    if ((q >= _SAT_HI) | (q <= _SAT_LO)).any():
        raise ValueError(
            "embedding component quantizes at the int64 saturation bound"
            " (|x| >~ 8.8e12 at 2^20 scale); per-cluster integer sums"
            " would wrap numpy's accumulators silently (the SQL path"
            " raises ARITHMETIC_OVERFLOW when such values are summed)."
            " Clean or rescale the vector column first."
        )


def _quantize_i64(X):
    """``floor(x * 2^20)`` -> int64 with Spark CAST semantics: NaN -> 0,
    +/-inf -> Long.MAX/MIN; finite overflow clamps to the nearest
    representable float64 inside the int64 range (numpy's astype on
    out-of-range/non-finite floats is undefined -- INT64_MIN in
    practice -- which would silently corrupt the centroid sums)."""
    import numpy as np

    q = np.floor(X * _SCALE)
    i64 = np.iinfo(np.int64)
    # nearest float64s strictly inside [INT64_MIN, INT64_MAX]
    lo = float(np.nextafter(np.float64(i64.min), 0.0))
    hi = float(np.nextafter(np.float64(2**63), 0.0))
    out = np.clip(np.where(np.isnan(q), 0.0, q), lo, hi).astype(np.int64)
    out[np.isposinf(q)] = i64.max
    out[np.isneginf(q)] = i64.min
    return out


def _quantize_expr(vec_col: str) -> str:
    return (
        f"transform(`{vec_col}`,"
        f" x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE!r}D) AS BIGINT))"
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    iters: int = 2,
    method: str = "auto",
    tol: float = 0.0,
) -> List[Tuple[int, List[float]]]:
    """Run ``iters`` Lloyd iterations; return [(cluster_id, centroid)].

    Clusters that receive no points simply drop out (no respawn heuristic —
    deterministic and easy to mirror in SQL). Only ``k * dims`` scalars ever
    reach the driver.

    ``method``: "auto" (default) uses the codegen'd flat-expansion
    distances while ``k * dims <= _EXPAND_TERM_BUDGET`` and the
    Arrow+numpy BLAS shape above it (wide embeddings would blow Janino's
    64KB generated-method limit and fall back to interpreted eval);
    "expand" / "fold" / "blas" force a path — "fold" is bit-identical to
    "expand" at any width (same summation order, interpreted).

    ``tol``: convergence early-exit — iteration stops once the max L2
    centroid shift is <= tol (a cluster dropping out counts as
    structural change, never convergence). The default 0.0 exits only on
    a bit-exact fixed point, which is result-identical to running the
    remaining iterations (identical centroids => identical assignment
    => identical sums) and skips their full-corpus scans. ``iters``
    stays the hard upper bound — at 100 TB every saved iteration is a
    saved corpus scan, which is the whole cost of wide k-means
    (SCALING.md wide-family profile).
    """
    if method != "auto" and method not in ("expand", "fold", "blas"):
        # fail before the width-probe job, not after it
        raise ValueError(f"method must be auto|expand|fold|blas, got {method!r}")
    fdf, centroids = _probe_and_seeds(df, vec_col, id_col, k)
    if not centroids:
        return []
    m = _choose_method(k, len(centroids[0][1]), method)
    return _lloyd_persisted(fdf, centroids, iters, m, vec_col, tol)


def _lloyd_persisted(
    fdf: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    iters: int,
    m: str,
    vec_col: str,
    tol: float = 0.0,
) -> List[Tuple[int, List[float]]]:
    """:func:`_lloyd` with the shared iteration caching policy: persist
    the filtered frame only when more than one pass will read it."""
    persisted = iters > 1
    if persisted:
        fdf = fdf.persist()
    try:
        return _lloyd(fdf, centroids, iters, m, vec_col, tol)
    finally:
        if persisted:
            fdf.unpersist()


def _probe_and_seeds(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> Tuple[DataFrame, List[Tuple[int, List[float]]]]:
    """Width probe + seed centroids, ONE scan in the common case.

    Malformed-width rows (empty or ragged arrays) are excluded like
    NULLs: the expanded distance/update arithmetic indexes elements
    directly, and under ANSI mode ``vec[d]`` on a short array would fail
    the job for one bad row. The reference width is the MODAL width of
    the k smallest-id positive-width rows (ties -> smaller width):
    deterministic across partitionings/runs, and one ragged or atypical
    row among the probes cannot discard the whole corpus (a bare
    first() probe could — it is partition-order-dependent and anchored
    to one arbitrary row). Seeds are the quantized embeddings of the k
    smallest modal-width ids, rank = cluster id.

    When every probed row already has the modal width — every uniform
    corpus — the probe rows ARE the seeds, so the historical second
    seeds scan is skipped (probe + seeds were two of the four full
    input passes in the wide-family profile; the quantize projection
    runs on the k surviving rows only, after TakeOrdered). A mixed-width
    probe falls back to the dedicated seeds scan on the filtered frame,
    preserving the exact historical semantics.

    Returns ``(width_filtered_df, centroids)``; centroids ``[]`` when
    no positive-width row exists (or k < 1).
    """
    df = df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    seed_expr = F.expr(
        f"transform({_quantize_expr(vec_col)},"
        f" q -> CAST(q AS DOUBLE) / {_SCALE!r}D)"
    ).alias("c")
    # collision-free width alias: a vector/id column literally named "d"
    # would make the post-limit select ambiguous
    d_al = "d"
    while d_al in (vec_col, id_col):
        d_al += "_"
    probe = (
        df.where(F.size(F.col(vec_col)) > 0)
        .select(id_col, vec_col, F.size(F.col(vec_col)).alias(d_al))
        .orderBy(F.col(id_col).asc())
        .limit(max(k, 1))
        .select(d_al, seed_expr)
        .collect()
    )
    widths = [int(r[d_al]) for r in probe if r[d_al] is not None and r[d_al] > 0]
    if not widths:
        return df, []  # no row with a non-empty vector anywhere
    width = max(set(widths), key=lambda w: (widths.count(w), -w))
    fdf = df.where(F.size(F.col(vec_col)) == width)
    if k < 1:
        return fdf, []
    if all(w == width for w in widths):
        return fdf, [(i, list(r["c"])) for i, r in enumerate(probe)]
    seeds = (
        fdf.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(seed_expr)
        .collect()
    )
    return fdf, [(i, list(r["c"])) for i, r in enumerate(seeds)]


def _centroid_shift(
    prev: List[Tuple[int, List[float]]],
    cur: List[Tuple[int, List[float]]],
) -> float:
    """Max L2 shift between matching cluster ids; +inf when the id sets
    differ (a dropped/emptied cluster is structural change, not
    convergence). Pure driver arithmetic over k*dims scalars."""
    pd_, cd = dict(prev), dict(cur)
    if set(pd_) != set(cd):
        return float("inf")
    worst = 0.0
    for cid, pv in pd_.items():
        cv = cd[cid]
        worst = max(
            worst, sum((a - b) ** 2 for a, b in zip(pv, cv)) ** 0.5
        )
    return worst


def _lloyd(
    df: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    iters: int,
    m: str,
    vec_col: str,
    tol: float = 0.0,
) -> List[Tuple[int, List[float]]]:
    """``iters`` Lloyd updates over a pre-filtered (and ideally
    persisted) frame — the loop body shared by :func:`kmeans_centroids`
    and :func:`kmeans_summary`'s fused route. Exits early when the max
    centroid shift falls to ``tol`` or below (see kmeans_centroids) —
    each skipped iteration is a skipped full-corpus scan."""
    ndims = len(centroids[0][1])
    for _ in range(iters):
        prev = centroids
        if m == "blas":
            centroids = _iterate_blas(df, centroids, vec_col)
            if _centroid_shift(prev, centroids) <= tol:
                break
            continue
        # per-dim BIGINT sums as one wide aggregate: each element is
        # quantized straight from the source array (O(dims) per row —
        # a posexplode would shuffle rows x dims into the aggregate,
        # and indexing a transform()'d column re-derives the whole
        # array per dim under projection collapse, O(dims^2)).
        # Order-independent integer sums, partial-aggregated, k rows out.
        # plain [] indexing is safe HERE: this plan is self-contained
        # (no joins, so no derived predicates can reorder ahead of
        # the explicit size filter applied above)
        qd = [
            f"CAST(floor(CAST(`{vec_col}`[{d}] AS DOUBLE)"
            f" * {_SCALE!r}D) AS BIGINT)"
            for d in range(ndims)
        ]
        assigned = df.selectExpr(
            f"{_assign_expr(vec_col, centroids, m)} AS cid",
            *[f"{q} AS q{d}" for d, q in enumerate(qd)],
        )
        sums = (
            assigned.groupBy("cid")
            .agg(
                *[F.sum(f"q{d}").alias(f"s{d}") for d in range(ndims)],
                F.count("*").alias("n"),
            )
            .collect()
        )
        centroids = [
            (
                r["cid"],
                [
                    float(r[f"s{d}"]) / (float(r["n"]) * _SCALE)
                    for d in range(ndims)
                ],
            )
            for r in sorted(sums, key=lambda r: r["cid"])
        ]
        if _centroid_shift(prev, centroids) <= tol:
            break
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: List[Tuple[int, List[float]]],
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Map-only: input rows + ``cluster_id`` of the nearest centroid.

    An empty centroid list (k-means over an empty table) assigns nothing
    and returns an empty frame with the output schema — mirroring the
    SQL oracle's graceful zero rows instead of building a malformed
    ``array_min(array())`` expression. NULL and wrong-width embeddings
    are excluded (the distance arithmetic indexes elements directly —
    under ANSI one short array would otherwise fail the whole job)."""
    if not centroids:
        return df.where(F.lit(False)).selectExpr(
            "*", "CAST(NULL AS INT) AS cluster_id"
        )
    dims = len(centroids[0][1])
    valid = df.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dims)
    )
    m = _choose_method(len(centroids), dims, method)
    if m == "blas":
        return _assign_blas(valid, centroids, vec_col)
    return valid.selectExpr(
        "*", f"{_assign_expr(vec_col, centroids, m)} AS cluster_id"
    )


def kmeans_summary(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    iters: int = 2,
    label_col: Optional[str] = None,
    method: str = "auto",
    tol: float = 0.0,
) -> DataFrame:
    """Cluster -> (n_vecs, c0, c1[, mean_label]) after ``iters`` updates.

    The reported centroid components and mean label are pure functions of
    order-independent integer sums, so the output is exactly reproducible.
    ``tol`` is the convergence early-exit (see :func:`kmeans_centroids`):
    result-identical at the default 0.0, and a converged run skips the
    remaining iterations' full-corpus scans.
    """
    if method != "auto" and method not in ("expand", "fold", "blas"):
        raise ValueError(f"method must be auto|expand|fold|blas, got {method!r}")
    label_ok = label_col is None or dict(df.dtypes).get(label_col) in (
        "tinyint", "smallint", "int", "bigint",
    )
    need = [id_col, vec_col] + (
        [label_col] if label_col is not None and label_col not in (id_col, vec_col) else []
    )
    base = df.select(*need)
    fdf, centroids = _probe_and_seeds(base, vec_col, id_col, k)
    dims = len(centroids[0][1]) if centroids else 0
    part = None
    if (
        centroids
        and dims >= 2
        and label_ok
        and _choose_method(len(centroids), dims, method) == "blas"
    ):
        # Fused BLAS route: the iterations AND the final pass read ONE
        # persisted projected base (the summary's filter differs from the
        # iterations' only by the id-notnull clause, but both plans
        # contain the cached base subtree, so neither re-generates the
        # source — the wide-family profile showed the input scan, not the
        # BLAS math, dominating every pass). The final pass is the
        # partition-collapsed _summary_partials_blas: no full-corpus
        # Arrow passthrough of assign-then-agg. localCheckpoint
        # materializes the tiny partials (partitions x k rows) so the
        # cache can be dropped before the lazy result is consumed.
        base = base.persist()
        try:
            centroids = _lloyd(
                fdf, centroids, iters, _choose_method(k, dims, method),
                vec_col, tol,
            )
            # clusters can drop during Lloyd: re-choose on the FINAL
            # count exactly like kmeans_assign, so a shrunken problem
            # falls back to the bit-exact codegen'd assignment instead
            # of numpy distances (part stays None -> legacy finish)
            if centroids and _choose_method(
                len(centroids), dims, method
            ) == "blas":
                valid = base.where(
                    F.col(vec_col).isNotNull()
                    & (F.size(F.col(vec_col)) == dims)
                )
                part = _summary_partials_blas(
                    valid, centroids, vec_col, label_col
                ).localCheckpoint()
        finally:
            base.unpersist()
    elif centroids:
        centroids = _lloyd_persisted(
            fdf, centroids, iters, _choose_method(k, dims, method),
            vec_col, tol,
        )
    if part is not None:
        out = part.groupBy(F.col("cid").alias("cluster_id")).agg(
            F.sum("n").alias("n_vecs"),
            F.sum("q0").alias("_q0"),
            F.sum("q1").alias("_q1"),
            *(
                [F.sum("lsum").alias("_lsum")]
                if label_col is not None
                else []
            ),
        )
    else:
        assigned = kmeans_assign(df, centroids, vec_col, method)
        aggs = [
            F.count("*").alias("n_vecs"),
            F.sum(F.expr(f"try_element_at({_quantize_expr(vec_col)}, 1)")).alias("_q0"),
            F.sum(F.expr(f"try_element_at({_quantize_expr(vec_col)}, 2)")).alias("_q1"),
        ]
        if label_col is not None:
            aggs.append(F.sum(F.col(label_col).cast("long")).alias("_lsum"))
        out = assigned.groupBy("cluster_id").agg(*aggs)
    cols = [
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.col("n_vecs"),
        (
            F.col("_q0").cast("double")
            / (F.col("n_vecs").cast("double") * F.lit(_SCALE))
        ).cast("float").alias("c0"),
        (
            F.col("_q1").cast("double")
            / (F.col("n_vecs").cast("double") * F.lit(_SCALE))
        ).cast("float").alias("c1"),
    ]
    if label_col is not None:
        cols.append(
            (F.col("_lsum").cast("double") / F.col("n_vecs").cast("double"))
            .cast("float")
            .alias("mean_label")
        )
    return out.select(*cols)
