"""Relational operators Spark lacks natively, built scale-first.

The reference delegates all relational work to DuckDB (SURVEY.md §2.3);
DuckDB ships ASOF JOIN and fast inequality (range) joins out of the box.
Spark has neither as a primitive, so this module supplies the two standard
distributed formulations plus gap-based sessionization:

* :func:`asof_join` — union-tag-window: one shuffle + one sort per side,
  no row explosion, skew-safe (running ``last`` needs no buffering).
* :func:`range_band_join` — bucketed band join: the build side lands in
  time buckets, the probe side explodes to the (at most 2) candidate
  buckets, and an equi-join + exact filter finishes. Turns an O(n^2)
  inequality join into an equi-join Catalyst can hash-partition.
* :func:`sessionize` — the classic lag/cumsum window pair.

All three are pure DataFrame/window compositions — no Python in the hot
path, so they hold at 100 TB with the usual key-partitioning caveats.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "asof_join",
    "sessionize",
    "range_band_join",
    "salted_join",
    "gapfill_locf",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row per key.

    ``backward``: latest right row with ``right_ts <= left_ts`` (inclusive,
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``); ``forward``:
    earliest right row with ``right_ts >= left_ts``. Left rows with no
    match keep NULLs (left-outer semantics). Right timestamp comes back as
    ``<right_ts><suffix>``; right payload columns keep their names unless
    they collide with a left column (then ``<name><suffix>``).

    Distributed shape: tag both inputs, union, then ONE window pass per
    key ordered by (ts, tag) carrying the running last (resp. first)
    right payload. One shuffle on the key, one sort — no join explosion;
    the running ``last`` is O(1) state per row, so hot keys cost a sort
    spill at worst, never a payload buffer.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    # the match timestamp is ALWAYS emitted (as right_ts + suffix) from the
    # payload struct's __rts slot; listing it in an explicit right_cols
    # would emit a second column under the same name -> every downstream
    # reference raises AMBIGUOUS_REFERENCE
    right_cols = [c for c in right_cols if c != right_ts]

    # tag orders equal timestamps so the right row at ts == left ts is
    # visible to the left row (inclusive match) in both directions.
    if direction == "backward":
        r_tag, l_tag = 0, 1
    else:
        r_tag, l_tag = 1, 0

    # only left columns NOT already at the union's top level ride in the
    # __left struct: keys and the timestamp are reconstructed from the
    # top-level columns after the window, so slim inputs (key + ts only)
    # shuffle zero redundant bytes — at 60M rows the struct duplication
    # would roughly double the exchange payload.
    l_extra = [c for c in left.columns if c not in on and c != left_ts]
    # with no right payload columns the only thing to carry through the
    # window is the matched right timestamp itself: a bare scalar column
    # instead of a 1-field struct — the struct wrapper is pure overhead in
    # the exchange and in the running-last state (~2x payload at 60M rows).
    bare = not right_cols
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(l_tag).alias("__tag"),
        *(
            [F.struct(*[F.col(c) for c in l_extra]).alias("__left")]
            if l_extra
            else []
        ),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(r_tag).alias("__tag"),
        F.col(right_ts).alias("__payload")
        if bare
        else F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__payload"),
    )
    l2 = l2.withColumn("__payload", F.lit(None).cast(r2.schema["__payload"].dataType))
    if l_extra:
        r2 = r2.withColumn(
            "__left", F.lit(None).cast(l2.schema["__left"].dataType)
        )
    unioned = l2.unionByName(r2)

    w = Window.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__tag").asc())
    if direction == "backward":
        matched = F.last("__payload", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        matched = F.first("__payload", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    out = unioned.withColumn("__m", matched).where(F.col("__tag") == l_tag)
    # key columns come from the TOP-LEVEL union columns, not the __left
    # struct: extracting them from the struct would hide the fact that the
    # output is still hash-partitioned on the keys, forcing downstream
    # groupBy(on)/join(on) to re-shuffle. The left timestamp likewise
    # reconstructs from __t (rows kept all have __tag == l_tag).
    cols = []
    for c in left.columns:
        if c in on:
            cols.append(F.col(f"`{c}`").alias(c))
        elif c == left_ts:
            # unionByName may have widened __t when the two timestamp
            # columns had different (union-coercible) types; restore the
            # left input's declared dtype so output schema is stable.
            cols.append(
                F.col("__t").cast(left.schema[left_ts].dataType).alias(c)
            )
        else:
            cols.append(F.col(f"__left.`{c}`").alias(c))
    cols.append(
        (F.col("__m") if bare else F.col("__m.__rts")).alias(
            f"{right_ts}{suffix}"
        )
    )
    for c in right_cols:
        out_name = f"{c}{suffix}" if c in left.columns else c
        cols.append(F.col(f"__m.`{c}`").alias(out_name))
    return out.select(*cols)


def sessionize(
    df: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    tiebreak: Optional[str] = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Gap-based sessionization: rows of one key belong to one session while
    consecutive gaps stay <= ``gap_seconds``; a strictly larger gap starts a
    new session. Adds ``session_col`` (0-based BIGINT per key).

    Shape: one shuffle on the key + one sort, then two streaming window
    functions (lag, running sum) — the batch analogue of the streaming
    session operator in ``streaming/`` and the standard scale form.
    ``tiebreak`` orders equal timestamps deterministically (recommended:
    a unique id column).
    """
    key = list(key)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*key).orderBy(*order)
    us = F.unix_micros(F.col(ts))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > int(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        (
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long"),
    )


def range_band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 300.0,
    on: Optional[Sequence[str]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Band join: pairs where ``right_ts`` lies in
    ``[left_ts + lower_seconds, left_ts + upper_seconds]`` (inclusive),
    optionally also matching equality keys ``on``.

    Scale shape: bucket width = band width, right rows land in one bucket,
    left rows explode to the 2 candidate buckets covering their band, then
    an equi-join on (keys, bucket) + the exact range filter. The naive
    inequality join is O(|L|x|R|) and un-partitionable; this form shuffles
    each side once by (keys, bucket) and joins only adjacent buckets.
    """
    on = list(on or [])
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    if hi_us < lo_us:
        raise ValueError("upper_seconds must be >= lower_seconds")
    width = max(hi_us - lo_us, 1)

    r_us = F.unix_micros(F.col(right_ts))
    l_us = F.unix_micros(F.col(left_ts))

    # integral DIV, not floor(double/double): micros near 2^50 divided as
    # doubles can round across a bucket edge and drop a boundary pair
    r2 = right.select(
        *on,
        F.expr(f"unix_micros(`{right_ts}`) div {width}").alias("__bkt"),
        r_us.alias("__rt"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in right.columns if c not in on and c != right_ts],
        ).alias("__payload"),
    )
    l2 = left.select(
        "*",
        l_us.alias("__lt"),
        F.explode(
            F.sequence(
                F.expr(f"(unix_micros(`{left_ts}`) + {lo_us}) div {width}"),
                F.expr(f"(unix_micros(`{left_ts}`) + {hi_us}) div {width}"),
            )
        ).alias("__bkt"),
    )
    joined = l2.join(r2, on + ["__bkt"]).where(
        (F.col("__rt") >= F.col("__lt") + lo_us)
        & (F.col("__rt") <= F.col("__lt") + hi_us)
    )
    cols = [F.col(f"`{c}`") for c in left.columns]
    cols.append(F.col("__payload.__rts").alias(f"{right_ts}{suffix}"))
    for c in right.columns:
        if c in on or c == right_ts:
            continue
        out_name = f"{c}{suffix}" if c in left.columns else c
        cols.append(F.col(f"__payload.`{c}`").alias(out_name))
    return joined.select(*cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key of the (big) left side over
    ``salt`` sub-partitions and replicate the right side's rows across them.

    The classic pre-AQE remedy for a shuffle join whose key histogram has a
    few giants (AQE's skew-join only splits sort-merge partitions after the
    fact; salting also fixes downstream per-key parallelism). Left rows get
    ``pmod(hash(all left columns), salt)`` — deterministic per row, uniform
    within a key; right rows explode x``salt``, so choose ``salt`` ~ the
    ratio of hottest-key size to average-partition size, and keep the right
    side the smaller input.
    """
    on = list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    lcols = [F.col(f"`{c}`") for c in left.columns]
    l2 = left.withColumn(
        "__salt", F.pmod(F.hash(*lcols), F.lit(salt)).cast("int")
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, on + ["__salt"], how).drop("__salt")


def gapfill_locf(
    df: DataFrame,
    key: Sequence[str],
    bucket: str,
    values: Sequence[str],
    fill_col_suffix: str = "_filled",
    gap_col: str = "gap_filled",
) -> DataFrame:
    """Gap-fill a regular integer bucket axis with last-observation-carried-
    forward interpolation (the hypertable ``time_bucket_gapfill`` + ``locf``
    shape; the reference delegates this to its host engine, SURVEY.md §2.3).

    ``df`` must hold at most one row per (key, bucket). Missing buckets
    between each key's min and max bucket are materialized with NULL
    measures, then every measure in ``values`` gains a ``<name>_filled``
    LOCF companion; ``gap_col`` is 1 on synthesized rows, 0 on observed
    ones.

    Distributed shape: per-key bounds are a partial-aggregated groupBy
    (tiny output: one row per key), the dense axis comes from
    ``explode(sequence(...))`` on that aggregate — so the synthesized grid
    never touches the fact scan — and one left join + one window pass on
    the key finishes. Two shuffles on the key; the LOCF ``last`` is O(1)
    running state, never a buffer, so hot keys only cost the sort.
    """
    key = list(key)
    values = list(values)
    bounds = df.groupBy(*key).agg(
        F.min(bucket).alias("__mn"), F.max(bucket).alias("__mx")
    )
    grid = bounds.select(
        *key, F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias(bucket)
    )
    joined = grid.join(df.withColumn("__obs", F.lit(1)), key + [bucket], "left")
    w = (
        Window.partitionBy(*key)
        .orderBy(F.col(bucket).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for v in values:
        out = out.withColumn(
            f"{v}{fill_col_suffix}", F.last(v, ignorenulls=True).over(w)
        )
    return out.withColumn(
        gap_col, F.when(F.col("__obs").isNull(), 1).otherwise(0)
    ).drop("__obs")
