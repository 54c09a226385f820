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

__all__ = ["cohort_retention"]


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
    return (
        joined.groupBy("cohort", "offset")
        .agg(F.count_distinct("__u").alias("n_users"))
    )
