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

__all__ = ["kmeans_centroids", "kmeans_assign", "kmeans_summary"]

# 2^20 fixed-point scale: float32 inputs in [-1, 1] keep ~6 fractional
# decimal digits, and 100T rows * 2^20 still fits in int64 per dimension.
_SCALE = 1048576.0


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


def _assign_expr(vec_col: str, centroids: List[Tuple[int, List[float]]]) -> str:
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
    entries = ", ".join(
        f"struct({_dist_sql(f'`{vec_col}`', cvals)} AS d, {cid} AS cid)"
        for cid, cvals in centroids
    )
    return f"array_min(array({entries})).cid"


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
) -> List[Tuple[int, List[float]]]:
    """Run ``iters`` Lloyd iterations; return [(cluster_id, centroid)].

    Clusters that receive no points simply drop out (no respawn heuristic —
    deterministic and easy to mirror in SQL). Only ``k * dims`` scalars ever
    reach the driver.
    """
    df = df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    # Malformed-width rows (empty or ragged arrays) are excluded like
    # NULLs: the expanded distance/update arithmetic indexes elements
    # directly, and under ANSI mode `vec[d]` on a short array would fail
    # the job for one bad row. The reference width is the MODAL width of
    # the k smallest-id rows (ties -> smaller width): deterministic across
    # partitionings/runs, and one ragged or atypical row among the probes
    # cannot discard the whole corpus (a bare first() probe could — it is
    # partition-order-dependent and anchored to one arbitrary row).
    probe = (
        df.select(F.col(id_col), F.size(F.col(vec_col)).alias("d"))
        .orderBy(F.col(id_col).asc())
        .limit(max(k, 1))
        .collect()
    )
    widths = [int(r["d"]) for r in probe if r["d"] is not None and r["d"] > 0]
    if widths:
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
        for _ in range(iters):
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
                f"{_assign_expr(vec_col, centroids)} AS cid",
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
    return df.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dims)
    ).selectExpr(
        "*", f"{_assign_expr(vec_col, centroids)} AS cluster_id"
    )


def kmeans_summary(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    iters: int = 2,
    label_col: Optional[str] = None,
) -> DataFrame:
    """Cluster -> (n_vecs, c0, c1[, mean_label]) after ``iters`` updates.

    The reported centroid components and mean label are pure functions of
    order-independent integer sums, so the output is exactly reproducible.
    """
    centroids = kmeans_centroids(df, vec_col, id_col, k, iters)
    assigned = kmeans_assign(df, centroids, vec_col)
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
