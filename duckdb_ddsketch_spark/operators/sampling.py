"""Deterministic sampling operators for training-data pipelines.

Random samples are useless at 100 TB if they change between runs (or
between engines): every operator here derives its decisions from md5 of a
stable key, so the same rows are picked on any cluster size, any partition
layout, and by any engine that can compute md5 — which is also what makes
the DuckDB oracles exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "hash_sample",
    "hash_threshold_hex",
    "stratified_hash_topn",
    "hash_shard",
    "pack_sequences",
    "pack_manifest",
    "materialize_sequences",
    "weighted_mixture",
    "priority_sample",
]

_HEX_DIGITS = 15  # 60 bits, compared as hex STRINGS (never cast to double:
# doubles are exact only to 2^53, so 60-bit values would round)


def hash_threshold_hex(fraction: float) -> str:
    """The 15-hex-digit threshold string for a sampling fraction: a row is
    kept when the first 15 hex chars of md5(seed|key) compare lexicographically
    below it. String comparison keeps the predicate engine-portable (no
    hex->int cast differences)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        # 16**15 formats as SIXTEEN chars ('1000…0'); compared against a
        # 15-char hash lexicographically that keeps only hashes starting
        # with '0' (~1/16 of rows) instead of all of them. 'g' sorts
        # above every hex digit, so every hash compares below it.
        return "g"
    return format(int(fraction * (16**_HEX_DIGITS)), "015x")


def hash_sample(
    df: DataFrame, fraction: float, key: str, seed: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key``.

    The predicate is a pure per-row expression — it pushes past projections,
    survives repartitioning, and never needs a shuffle or an RNG state. The
    same (seed, key) always lands on the same side, so downstream joins on
    sampled ids stay consistent across pipeline runs.
    """
    thr = hash_threshold_hex(fraction)
    h = F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col(key).cast("string"))), 1, _HEX_DIGITS)
    return df.where(h < F.lit(thr))


def stratified_hash_topn(
    df: DataFrame, strata: Sequence[str], n: int, key: str, seed: str = ""
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows inside each
    stratum by md5(seed|key) and keep the n smallest. One shuffle on the
    strata; ties are impossible for distinct keys (md5 collision-free in
    practice), so the pick is total-order stable."""
    strata = list(strata)
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(key).cast("string")))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def hash_shard(
    df: DataFrame, n_shards: int, key: str, seed: str = "", col: str = "shard_id"
) -> DataFrame:
    """Deterministic shard assignment: ``md5(seed|key)`` first 8 hex chars
    mod ``n_shards``, as an extra ``col`` column.

    This is the training-shard writer's partitioner: a pure per-row
    expression (map-only; at write time it feeds ``repartition(col)`` /
    ``partitionBy(col)``), uniform for any shard count, and reproducible
    across runs, cluster layouts, and engines — re-running the pipeline
    appends to the SAME shard a document landed in last time.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), F.col(key).cast("string"))), 1, 8
    )
    shard = F.conv(h, 16, 10).cast("bigint") % F.lit(n_shards)
    return df.withColumn(col, shard.cast("int"))


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    keys: Sequence[str] = (),
    order_col: str = "doc_id",
    col: str = "seq_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences.

    Greedy packing in a deterministic order: within each ``keys`` partition
    (typically the training shard), documents are laid out end-to-end in
    ``order_col`` order and ``seq_id = floor(tokens_before / budget)`` — the
    sequence a document's first token lands in. A document may straddle a
    boundary (the tokenizer-side writer splits it); the manifest
    (:func:`pack_manifest`) accounts for that exactly.

    Scale shape: one window pass per key partition (a single shuffle on
    ``keys``). Pick the shard count so one shard's documents fit an
    executor's sort budget — packing 100 TB globally through ONE window
    partition would serialize; per-shard windows parallelize perfectly and
    keep sequences reproducible shard-by-shard.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    keys = list(keys)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
        if keys
        else Window.partitionBy()
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    tok_type = dict(df.dtypes).get(token_col, "")
    if tok_type in ("tinyint", "smallint", "int", "bigint"):
        # Integral token counts take exact integer division (`DIV`):
        # FLOOR(cast-to-double / budget) silently drifts once a key's
        # cumulative token count passes 2^53 — real at 100 TB corpus
        # scale — and the double round-trip also measures ~7% slower on
        # the 15M-doc bench family. Non-integral token columns keep the
        # double floor (DIV requires integral operands under ANSI).
        tmp = "__pack_tokens_before"
        return (
            df.withColumn(tmp, before)
            .withColumn(col, F.expr(f"`{tmp}` DIV {int(budget)}"))
            .drop(tmp)
        )
    return df.withColumn(col, F.floor(before / F.lit(budget)).cast("long"))


def pack_manifest(
    df: DataFrame,
    token_col: str,
    budget: int,
    keys: Sequence[str] = (),
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-sequence packing manifest: how many documents start in each
    sequence and how many of the corpus' tokens it holds.

    ``token_sum`` counts tokens by the sequence a document STARTS in, so
    straddling documents attribute their whole length to their first
    sequence — every sequence except each key's last therefore reports
    ``token_sum >= budget`` only via its final straddler, and the totals
    reconcile exactly with the corpus token count.
    """
    keys = list(keys)
    packed = pack_sequences(df, token_col, budget, keys, order_col)
    return (
        packed.groupBy(*keys, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("token_sum"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )


def priority_sample(
    df: DataFrame,
    n: int,
    weight,
    id_col: str,
    strata: Sequence[str] = (),
    seed: str = "",
) -> DataFrame:
    """Exactly-n WEIGHTED sample without replacement (per stratum), the
    Efraimidis-Spirakis priority scheme with a deterministic hash in place
    of the RNG: each row draws u = md5-uniform(seed|id) in (0, 1) and
    competes on the exponential race key ln(u)/w — the n largest keys win,
    and P[row selected] rises with its weight exactly as E-S prescribes.
    ``weight`` is a Column of positive DOUBLE (rows with weight <= 0 or
    NULL never win).

    Deterministic (same seed|id -> same u), layout-invariant, and map-only
    up to the one per-stratum top-n shuffle — the same shape as
    :func:`stratified_hash_topn`, which is the w == const special case.
    Ranking keys are continuous doubles so cross-engine float drift can
    flip neighbors; use the pytest-pinned semantics (this operator is not
    oracle-gated for that reason — see test_operators).
    """
    strata = list(strata)
    # 52-bit md5 prefix: every value is exactly representable as a double,
    # so u = (h + 0.5) / 2^52 lies strictly inside (0, 1) with no rounding
    # to the endpoints (15 hex digits could round to u == 1.0, making
    # ln(u)/w == 0 an unconditional winner)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 52))
    w = weight.cast("double")
    # NaN guard: Spark's NaN compares GREATER than every number, so a NaN
    # weight (e.g. 0.0/0.0 upstream) passes `w > 0`, keys NaN, and NaN
    # sorts ABOVE everything in the descending window — one corrupt row
    # would win a slot in every stratum. NaN joins <= 0 / NULL as a loser.
    key = F.when((w > 0) & ~F.isnan(w), F.log(u) / w)  # NULL otherwise
    # (F.log(u) is always finite: u is strictly inside (0, 1) by the
    # 52-bit construction above, so key itself cannot be NaN)
    scored = df.withColumn("__k", key).where(F.col("__k").isNotNull())

    def topn(frame: DataFrame, parts: Sequence) -> DataFrame:
        rn = F.row_number().over(
            Window.partitionBy(*parts).orderBy(
                F.col("__k").desc(), F.col(id_col).asc()
            )
        )
        return frame.withColumn("__rn", rn).where(F.col("__rn") <= n).drop("__rn")

    if strata:
        return topn(scored, strata).drop("__k")
    # global sample: an unpartitioned row_number would funnel the corpus
    # through one task, so pre-select per hash bucket (each bucket's top-n
    # is a superset of its share of the global top-n), then geometrically
    # reduce the bucket count so every window task sorts <= 8*n rows —
    # a single final window over 64*n candidates would reintroduce the
    # one-task sort the bucketing exists to avoid
    buckets = 64
    cand = topn(
        scored.withColumn(
            "__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
        ),
        ["__b"],
    )
    while buckets > 1:
        buckets = max(buckets // 8, 1)
        cand = topn(
            cand.withColumn(
                "__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
            ),
            ["__b"],
        )
    return cand.drop("__b", "__k")


def materialize_sequences(
    df: DataFrame,
    text_col: str,
    token_col: str,
    budget: int,
    keys: Sequence[str] = (),
    order_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Emit the packed training rows: one row per (keys, seq_id) with the
    member documents' text concatenated in deterministic ``order_col``
    order — the final step after :func:`pack_sequences` assigns documents
    to fixed-budget sequences.

    The per-group ``collect_list`` is bounded by the token budget (a
    sequence holds ~``budget`` tokens of documents, never the corpus), and
    the (order, text) structs are ``array_sort``-ed after collection so the
    concatenation is reproducible regardless of aggregation order or input
    layout. One shuffle on (keys, seq_id).
    """
    keys = list(keys)
    packed = pack_sequences(df, token_col, budget, keys, order_col)
    member = F.struct(
        F.col(order_col).alias("o"), F.col(text_col).alias("t")
    )
    return (
        packed.groupBy(*keys, "seq_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(member)), lambda s: s["t"]
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("token_sum"),
        )
    )


def weighted_mixture(
    df: DataFrame,
    fraction,
    id_col: str,
    seed: str = "",
    keep_col: str | None = None,
) -> DataFrame:
    """Deterministic per-group mixture sampling — the training-data source
    re-weighting step (keep source s with probability w_s).

    ``fraction`` is a Column of DOUBLE in [0, 1] (typically derived from a
    weights table joined/broadcast in, or an expression over the group
    column). The keep decision hashes only ``id_col`` — md5 first 8 hex
    chars as an exact 32-bit integer against ``floor(fraction * 2^32)`` —
    so it is map-only, layout-invariant, reproducible across engines, and
    consistent for the same document across pipeline runs. Nested mixtures
    compose like ``hash_sample`` (same hash ⇒ a 0.2 pass is a subset of a
    0.4 pass for the same seed).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    keep = h < F.floor(fraction * F.lit(4294967296.0)).cast("bigint")
    if keep_col is None:
        return df.where(keep)
    return df.withColumn(keep_col, keep)
