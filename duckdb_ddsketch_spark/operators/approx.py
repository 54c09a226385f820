"""Deterministic HyperLogLog distinct counting (beyond-reference sketch op).

The reference ships one sketch family (DDSketch, quantiles); a training-data
pipeline also needs cardinality sketches — "how many distinct users / URLs /
shingles per group" over 100 TB without a distinct shuffle of the raw keys.
Spark's ``approx_count_distinct`` is HLL++ but its register hash is
engine-private, so its output can't be cross-checked. This module builds
classic Flajolet HLL (the 2007 paper's estimator with linear-counting small-
range correction) from *engine-portable* primitives — md5, string math,
bigint shifts — so DuckDB computes the bit-identical estimate and the
driver's value-hash gate applies to an approximate operator.

Determinism notes (the parts that make the estimate reproducible):

* register = md5 hex of the value string; bucket from the first ``p/4`` hex
  chars, rank from the next 15 (60 bits). Same family as the minhash/
  simhash/sampling operators.
* rank ``rho`` uses ``length(bin(x))`` (exact integer bit-length), never
  ``log2`` (float, wrong at powers of two).
* the register sum folds ``2^-rho`` in FIXED POINT: ``shiftleft(1, 61-rho)``
  summed as DECIMAL (exact integer arithmetic — 2^p registers of up to
  2^60 overflow an int64) is order-independent, so Spark's nondeterministic
  partial aggregation order cannot wiggle the estimate the way a double sum
  would. DuckDB's BIGINT sum is already exact (it widens to HUGEINT).

Scale shape: groupBy (key, bucket) → max(rho) partial-aggregates map-side,
so the shuffle carries at most ``|keys| * 2^p`` rows regardless of input
size; the second groupBy collapses ``2^p`` rows per key. No Python in the
plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["hll_distinct", "hll_alpha"]

_HEX = "0123456789abcdef"


def hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (m >= 128 form)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _rho_expr(x: str) -> str:
    # x is uniform in [0, 2^60). rho = leading zeros within 60 bits + 1
    # = 61 - bit_length(x); bin() has no leading zeros so length(bin(x))
    # IS the bit length (bin(0) = '0' needs the special case).
    return f"CASE WHEN {x} = 0 THEN 61 ELSE 61 - length(bin({x})) END"


def hll_distinct(
    df: DataFrame,
    key: Sequence[str],
    col: str,
    p: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per key via deterministic HLL.

    ``p`` is the register-count exponent (m = 2^p registers, relative
    standard error ~= 1.04/sqrt(m)); must be a multiple of 4 so the bucket
    is a whole number of md5 hex chars. Returns one row per key with
    ``out_col`` (float32 estimate). NULL values are ignored (SQL DISTINCT
    convention).
    """
    if p % 4 != 0 or not (4 <= p <= 16):
        raise ValueError(f"p must be a multiple of 4 in [4, 16], got {p}")
    m = 1 << p
    nhex = p // 4
    alpha = hll_alpha(m)
    key = list(key)
    kcols = ", ".join(f"`{k}`" for k in key)

    # one SQL text end-to-end: hash → per-bucket max rank → estimator.
    # conv() returns STRING; cast explicitly (ANSI mode is on).
    rho = _rho_expr(f"CAST(conv(substring(__h, {nhex + 1}, 15), 16, 10) AS BIGINT)")
    sql = f"""
    WITH hashed AS (
        SELECT {kcols}, md5(CAST(`{col}` AS STRING)) AS __h
        FROM {{df}} WHERE `{col}` IS NOT NULL
    ),
    regs AS (
        SELECT {kcols},
               CAST(conv(substring(__h, 1, {nhex}), 16, 10) AS BIGINT) AS bucket,
               MAX({rho}) AS maxrho
        FROM hashed GROUP BY {kcols}, bucket
    ),
    folded AS (
        SELECT {kcols},
               COUNT(*) AS observed,
               SUM(CAST(shiftleft(CAST(1 AS BIGINT), 61 - CAST(maxrho AS INT))
                        AS DECIMAL(20, 0))) AS sum_fp
        FROM regs GROUP BY {kcols}
    )
    SELECT {kcols},
           CAST(CASE
               WHEN raw <= 2.5e0 * {m} AND zeros > 0
                   THEN {m} * LN({m} / CAST(zeros AS DOUBLE))
               ELSE raw
           END AS FLOAT) AS `{out_col}`
    FROM (
        SELECT {kcols}, zeros,
               {alpha!r}e0 * {m} * {m}.0
                   / (sum_fp / 2305843009213693952e0 + zeros) AS raw
        FROM (SELECT {kcols}, sum_fp, {m} - observed AS zeros FROM folded)
    )
    """
    return df.sparkSession.sql(sql, df=df)
