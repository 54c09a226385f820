"""Bitmap activity indexes: per-user day-bitmasks for exact retention math.

The roaring-bitmap idea expressed relationally: one BIGINT word holds 63
days of a user's activity (``bit d = active on epoch+d``); longer ranges
shard into ``(word_idx, bits)`` rows. Masks build with ``bit_or`` — an
associative integer aggregate, so partial aggregation applies and the
result is partitioning-independent — and MERGE across stores/streams with
another ``bit_or``. Retention (active on day d AND day d+k) is then pure
per-row bit arithmetic on the index instead of a self-join of the raw event
log: at 100 TB the event scan happens once, and every retention offset /
window query afterwards runs on |users| tiny rows.

All operations are integer-only, so results are bit-reproducible
cross-engine (the DuckDB oracles replay the identical shift/AND math).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["activity_bitmap", "retention_report"]


def activity_bitmap(
    df: DataFrame,
    user_col: str,
    day_idx_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """(keys..., user, word_idx, bits): 63-day bitmask words per user.

    ``day_idx_col`` must be a non-negative integer day offset (e.g.
    ``datediff(day, epoch)``). One shuffle on (keys, user, word) with
    map-side partial ``bit_or``; duplicate events collapse for free.
    """
    keys = list(keys)
    word = F.expr(f"CAST(`{day_idx_col}` DIV 63 AS BIGINT)").alias("word_idx")
    # F.shiftleft only takes a literal shift; the SQL form shifts by a column
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(`{day_idx_col}` % 63 AS INT))"
    )
    return (
        df.where(F.col(user_col).isNotNull() & (F.col(day_idx_col) >= 0))
        .groupBy(*keys, F.col(user_col).alias("user"), word)
        .agg(F.bit_or(bit).alias("bits"))
    )


def retention_report(
    bitmaps: DataFrame,
    n_days: int,
    offsets: Sequence[int] = (7, 14),
) -> DataFrame:
    """Per-day active users + exact k-day retention from a single-word
    bitmap index (``n_days <= 63``; multi-word ranges first OR-fold their
    words down or query per-word slices).

    For each user the set bits expand only to that user's (day, matched)
    pairs — the explode is bounded by actual activity, not the day grid —
    and every count is an integer aggregate of bit tests.
    """
    if not (1 <= n_days <= 63):
        # n_days <= 0 would build sequence(0, negative) — DESCENDING in
        # Spark, so negative day indices reach shiftright, whose shift is
        # masked mod 64 on the JVM: garbage counts, not an error
        raise ValueError(
            f"retention_report covers single-word ranges (1 <= n_days <= 63),"
            f" got {n_days}"
        )
    offs = list(offsets)
    if any(o < 1 for o in offs):
        # offset 0 is degenerate (n_ret == n_active) and a NEGATIVE offset
        # would shift by a negative count, which the JVM masks mod 64 —
        # silent wraparound, never a sensible retention question
        raise ValueError(f"offsets must be >= 1, got {offs}")
    extra = [c for c in bitmaps.columns if c not in ("user", "word_idx", "bits")]
    if extra:
        raise ValueError(
            f"retention_report counts each 'user' row once; extra columns"
            f" {extra} indicate a keyed index whose per-key rows would"
            " double-count users — pre-merge first, e.g."
            " bitmaps.groupBy('user', 'word_idx').agg(bit_or('bits'))"
        )
    # only word 0 holds days 0..62 — a multi-word index's later words
    # would otherwise alias days >= 63 onto the report grid AND
    # double-count their users (one row per word)
    src = (
        bitmaps.where(F.col("word_idx") == 0)
        if "word_idx" in bitmaps.columns
        else bitmaps
    )
    # an offset past the horizon has no (d, d+o) pair inside it: its
    # column is exactly zero. Filtering for it anyway would hit
    # sequence(0, negative), which Spark generates DESCENDING — negative
    # day indices and mod-64-masked shifts, i.e. garbage counts.
    in_range = [o for o in offs if o <= n_days - 1]
    # ONE explode of each user's active days with the bitmap word kept
    # alongside; every retention offset is an inline bit test on that
    # word. The former shape exploded a separate filtered array per
    # offset and joined the per-offset aggregates back — one extra
    # array scan + explode + 62-row join per offset; this is one pass
    # regardless of len(offsets). The day_idx+o shift stays <= 62 + max
    # offset < 64 only when guarded, so the bound test comes FIRST (a
    # shift past 63 would wrap mod 64 on the JVM).
    ex = src.selectExpr(
        "bits",
        f"explode(filter(sequence(0, {n_days - 1}),"
        " d -> (shiftright(bits, CAST(d AS INT)) & 1) = 1)) AS day_idx",
    )
    ret_aggs = [
        F.sum(
            F.when(
                (F.col("day_idx") <= F.lit(n_days - 1 - o))
                & (
                    F.expr(
                        f"(shiftright(bits, CAST(day_idx + {o} AS INT)) & 1) = 1"
                    )
                ),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias(f"n_ret{o}")
        for o in in_range
    ]
    out = ex.groupBy("day_idx").agg(
        F.count("*").alias("n_active"), *ret_aggs
    )
    return out.select(
        F.col("day_idx").cast("int").alias("day_idx"),
        "n_active",
        *[
            F.col(f"n_ret{o}").cast("long").alias(f"n_ret{o}")
            if o in in_range
            else F.lit(0).cast("long").alias(f"n_ret{o}")
            for o in offs
        ],
    )
