"""Product/behavioral analytics over the event stream (beyond-reference).

The reference's host engine serves these via plain SQL (SURVEY.md §2.3);
at 100 TB the naive forms break on the self-join, so each operator here is
the standard distributed decomposition:

* :func:`cohort_retention` — classic "day-N retention matrix": users are
  cohorted by their first-activity bucket, every later active bucket
  increments that cohort's offset cell. Decomposed as distinct → min →
  self-equi-join on ``user``; all three stages hash-partition on the user
  key, so Catalyst reuses one exchange layout instead of shuffling facts
  twice.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["cohort_retention", "funnel"]


def cohort_retention(
    df: DataFrame,
    user: str,
    bucket: str,
    max_offset: Optional[int] = None,
) -> DataFrame:
    """Cohort retention counts: rows ``(cohort, offset, n_users)`` where
    ``cohort`` is the user's first ``bucket`` and ``offset`` counts buckets
    since it (offset 0 = the cohort's size). ``max_offset`` truncates the
    matrix width; the filter lands before the final aggregate, so truncation
    also shrinks the last shuffle.

    Scale shape: the fact scan collapses to distinct (user, bucket) pairs
    first — everything after runs on at most |users| x |buckets| rows, and
    the cohort join keys on ``user`` against a groupBy that is already
    partitioned by ``user``.
    """
    active = df.select(F.col(user).alias("__u"), F.col(bucket).alias("__b")).where(
        F.col(user).isNotNull() & F.col(bucket).isNotNull()
    ).distinct()
    first = active.groupBy("__u").agg(F.min("__b").alias("cohort"))
    joined = active.join(first, "__u").withColumn(
        "offset", (F.col("__b") - F.col("cohort")).cast("long")
    )
    if max_offset is not None:
        joined = joined.where(F.col("offset") <= max_offset)
    # plain count, not count_distinct: `active` is distinct (user,
    # bucket) and offset is a bijection of bucket given the user's fixed
    # cohort, so (cohort, offset, user) rows are already unique — a
    # distinct-aggregate would pay a second expansion phase for nothing
    return (
        joined.groupBy("cohort", "offset")
        .agg(F.count("__u").alias("n_users"))
    )


def funnel(
    df: DataFrame,
    user: str,
    ts: str,
    steps: Sequence,
    strict: bool = True,
) -> DataFrame:
    """Ordered-funnel timestamps: one row per user who completed step 1,
    with ``step_1 .. step_n`` = the earliest event time of each step that
    occurs AFTER the user's previous step time (strictly after when
    ``strict``). ``steps`` is a sequence of boolean Columns (e.g.
    ``F.col("event_type") == "view"``); later steps are NULL once the
    funnel stalls.

    Scale shape: step k is a filter + groupBy + join, ALL keyed on the
    user column — Catalyst reuses one hash-partitioning across the whole
    chain, so n steps cost n filtered scans but no extra fact shuffles.
    Per-step state is one timestamp per user (min), never an event buffer,
    so hot users are safe.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step predicate")
    t = F.col(ts)
    cur = (
        df.where(steps[0])
        .groupBy(F.col(user).alias("__u"))
        .agg(F.min(t).alias("step_1"))
    )
    for i, pred in enumerate(steps[1:], start=2):
        prev_cols = cur.columns  # __u, step_1 .. step_{i-1}
        ev = df.where(pred).select(F.col(user).alias("__u"), t.alias("__t"))
        gate = F.col("__t") > F.col(f"step_{i - 1}") if strict else (
            F.col("__t") >= F.col(f"step_{i - 1}")
        )
        hit = (
            ev.join(cur, "__u")
            .where(gate)
            .groupBy("__u")
            .agg(F.min("__t").alias(f"step_{i}"))
        )
        cur = cur.join(hit.select("__u", f"step_{i}"), "__u", "left").select(
            *prev_cols, f"step_{i}"
        )
    return cur.withColumnRenamed("__u", user)
