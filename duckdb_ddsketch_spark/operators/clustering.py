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
iterations (it is scanned ``iters + 1`` times).
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
    to the SQL path (integer sums are order-independent). Non-finite
    components follow the SQL path's saturating CAST: NaN -> 0 and
    +/-inf -> Long.MAX/MIN exactly; a *finite* component whose scaled
    value exceeds the int64 range (|x| > ~8.8e12 at 2^20 scale) clamps
    to the nearest float64 below the bound, within 1024 of the SQL
    saturation point -- deterministic either way, and numpy's
    undefined-astype (silent INT64_MIN) never fires.
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
            np.add.at(s_acc, idx, _quantize_i64(X))
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
    """
    if method != "auto" and method not in ("expand", "fold", "blas"):
        # fail before the width-probe job, not after it
        raise ValueError(f"method must be auto|expand|fold|blas, got {method!r}")
    df = df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    # Malformed-width rows (empty or ragged arrays) are excluded like
    # NULLs: the expanded distance/update arithmetic indexes elements
    # directly, and under ANSI mode `vec[d]` on a short array would fail
    # the job for one bad row. The reference width is the MODAL width of
    # the k smallest-id rows (ties -> smaller width): deterministic across
    # partitionings/runs, and one ragged or atypical row among the probes
    # cannot discard the whole corpus (a bare first() probe could — it is
    # partition-order-dependent and anchored to one arbitrary row).
    # probe only positive-width rows: if the k smallest ids all carried
    # empty arrays, an unfiltered probe would yield no widths, SKIP the
    # width filter, and let malformed rows reach the vec[d] arithmetic
    probe = (
        df.where(F.size(F.col(vec_col)) > 0)
        .select(F.col(id_col), F.size(F.col(vec_col)).alias("d"))
        .orderBy(F.col(id_col).asc())
        .limit(max(k, 1))
        .collect()
    )
    widths = [int(r["d"]) for r in probe if r["d"] is not None and r["d"] > 0]
    if not widths:
        return []  # no row with a non-empty vector anywhere — no clusters
    width = max(set(widths), key=lambda w: (widths.count(w), -w))
    df = df.where(F.size(F.col(vec_col)) == width)
    # Seed: quantized embeddings of the k smallest ids, rank = cluster id.
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(
            F.expr(
                f"transform({_quantize_expr(vec_col)},"
                f" q -> CAST(q AS DOUBLE) / {_SCALE!r}D)"
            ).alias("c")
        )
        .collect()
    )
    centroids = [(i, list(r["c"])) for i, r in enumerate(seeds)]
    if not centroids:
        return []

    persisted = iters > 1
    if persisted:
        df = df.persist()
    try:
        ndims = len(centroids[0][1])
        m = _choose_method(k, ndims, method)
        for _ in range(iters):
            if m == "blas":
                centroids = _iterate_blas(df, centroids, vec_col)
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
    finally:
        if persisted:
            df.unpersist()
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
) -> DataFrame:
    """Cluster -> (n_vecs, c0, c1[, mean_label]) after ``iters`` updates.

    The reported centroid components and mean label are pure functions of
    order-independent integer sums, so the output is exactly reproducible.
    """
    centroids = kmeans_centroids(df, vec_col, id_col, k, iters, method)
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
