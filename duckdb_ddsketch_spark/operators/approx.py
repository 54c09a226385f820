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

__all__ = [
    "hll_distinct",
    "hll_registers",
    "hll_estimate",
    "hll_register_exprs",
    "hll_alpha",
    "bloom_build",
    "bloom_probe",
    "cm_build",
    "cm_estimate",
]

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


def _check_p(p: int) -> None:
    if p % 4 != 0 or not (4 <= p <= 16):
        raise ValueError(f"p must be a multiple of 4 in [4, 16], got {p}")


def hll_register_exprs(col: str, p: int) -> tuple:
    """(bucket_sql, rho_sql) over ``md5(CAST(col AS STRING)) AS __h``:
    bucket from the first p/4 hex chars, rank from the next 15 (60 bits).
    conv() returns STRING; cast explicitly (ANSI mode is on)."""
    _check_p(p)
    nhex = p // 4
    bucket = f"CAST(conv(substring(__h, 1, {nhex}), 16, 10) AS BIGINT)"
    rho = _rho_expr(
        f"CAST(conv(substring(__h, {nhex + 1}, 15), 16, 10) AS BIGINT)"
    )
    return bucket, rho


def hll_registers(df: DataFrame, key: Sequence[str], col: str, p: int = 8) -> DataFrame:
    """Per-key HLL register table ``(key..., bucket, maxrho)`` — the
    mergeable state: registers from disjoint inputs combine with a plain
    ``MAX`` groupBy, so they can be stored, unioned across days, or fed by
    a streaming aggregation (streaming/ uses exactly this)."""
    key = list(key)
    kcols = ", ".join(f"`{k}`" for k in key)
    kpre = f"{kcols}, " if key else ""
    bucket, rho = hll_register_exprs(col, p)
    sql = f"""
    SELECT {kpre}{bucket} AS bucket, MAX({rho}) AS maxrho
    FROM (
        SELECT {kpre}md5(CAST(`{col}` AS STRING)) AS __h
        FROM {{df}} WHERE `{col}` IS NOT NULL
    )
    GROUP BY {kpre}bucket
    """
    return df.sparkSession.sql(sql, df=df)


def hll_estimate(
    regs: DataFrame,
    key: Sequence[str],
    p: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Collapse a register table from :func:`hll_registers` (or a MAX-merge
    of several) into the float32 cardinality estimate per key."""
    _check_p(p)
    m = 1 << p
    alpha = hll_alpha(m)
    key = list(key)
    kcols = ", ".join(f"`{k}`" for k in key)
    kpre = f"{kcols}, " if key else ""
    sql = f"""
    WITH folded AS (
        SELECT {kpre}COUNT(*) AS observed,
               SUM(CAST(shiftleft(CAST(1 AS BIGINT), 61 - CAST(maxrho AS INT))
                        AS DECIMAL(20, 0))) AS sum_fp
        FROM {{regs}} {("GROUP BY " + kcols) if key else ""}
    )
    SELECT {kpre}CAST(CASE
               WHEN raw <= 2.5e0 * {m} AND zeros > 0
                   THEN {m} * LN({m} / CAST(zeros AS DOUBLE))
               ELSE raw
           END AS FLOAT) AS `{out_col}`
    FROM (
        SELECT {kpre}zeros,
               {alpha!r}e0 * {m} * {m}.0
                   / (sum_fp / 2305843009213693952e0 + zeros) AS raw
        FROM (SELECT {kpre}sum_fp, {m} - observed AS zeros FROM folded)
    )
    """
    return regs.sparkSession.sql(sql, regs=regs)


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
    convention). Composition of :func:`hll_registers` + :func:`hll_estimate`
    — still one 2-exchange plan after Catalyst fuses the SQL texts.
    """
    return hll_estimate(hll_registers(df, key, col, p), key, p, out_col)


# ---------------------------------------------------------------------------
# Bloom filter membership (deterministic, engine-portable)
# ---------------------------------------------------------------------------


def _md5_chunk_mod(i: int, mod: int) -> str:
    """Spark SQL expr: the i-th 8-hex-char (32-bit) chunk of __h, mod `mod`."""
    return (
        f"pmod(CAST(conv(substring(__h, {8 * i + 1}, 8), 16, 10) AS BIGINT),"
        f" {mod})"
    )


def bloom_build(
    df: DataFrame,
    key: Sequence[str],
    col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Per-key Bloom filter over ``col``: rows ``(key..., word, bits)`` with
    32-bit words (mask stays positive in an int64 on every engine, so the
    ``bit_or`` fold is sign-free and order-independent → deterministic).

    ``k`` <= 4: each hash is a disjoint 32-bit chunk of one md5, so k probes
    cost ONE hash evaluation. Build shuffle is capped at
    ``|keys| * m_bits/32`` rows no matter the input size — the classic
    "sketch the fact table down before it moves" shape.
    """
    if not (1 <= k <= 4):
        raise ValueError(f"k must be in [1, 4] (one md5 = four 32-bit chunks), got {k}")
    if m_bits < 32 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 32, got {m_bits}")
    key = list(key)
    kcols = ", ".join(f"`{c}`" for c in key)
    kpre = f"{kcols}, " if key else ""
    poss = ", ".join(_md5_chunk_mod(i, m_bits) for i in range(k))
    sql = f"""
    SELECT {kpre}CAST(pos DIV 32 AS INT) AS word,
           bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))) AS bits
    FROM (
        SELECT {kpre}explode(array({poss})) AS pos
        FROM (
            SELECT {kpre}md5(CAST(`{col}` AS STRING)) AS __h
            FROM {{df}} WHERE `{col}` IS NOT NULL
        )
    )
    GROUP BY {kpre}word
    """
    return df.sparkSession.sql(sql, df=df)


def bloom_probe(
    filters: DataFrame,
    probes: DataFrame,
    key: Sequence[str],
    col: str,
    m_bits: int = 4096,
    k: int = 4,
    out_col: str = "maybe_present",
) -> DataFrame:
    """Membership test of ``probes[col]`` against per-key filters built by
    :func:`bloom_build` (same ``m_bits``/``k``). Returns the probe rows plus
    ``out_col`` (1 = possibly present, 0 = definitely absent — Bloom
    semantics: no false negatives).

    Shape: probes explode to k (word, bit) lookups, equi-join the filter
    (a broadcast candidate: filters are <= m_bits/32 rows per key), then a
    min-fold per probe — no fact-table access at probe time.
    """
    key = list(key)
    kcols = ", ".join(f"`{c}`" for c in key)
    kpre = f"{kcols}, " if key else ""
    poss = ", ".join(_md5_chunk_mod(i, m_bits) for i in range(k))
    join_on = " AND ".join(
        [f"p.`{c}` = f.`{c}`" for c in key] + ["p.word = f.word"]
    )
    pk = ", ".join(f"p.`{c}`" for c in key)
    pkpre = f"{pk}, " if key else ""
    gb = ", ".join([f"p.`{c}`" for c in key] + [f"p.`{col}`"])
    sql = f"""
    SELECT {pkpre}p.`{col}`,
           CAST(min(CASE WHEN f.bits IS NOT NULL
                         AND (f.bits & shiftleft(CAST(1 AS BIGINT),
                                                 CAST(p.pos % 32 AS INT))) != 0
                    THEN 1 ELSE 0 END) AS INT) AS `{out_col}`
    FROM (
        SELECT {kpre}`{col}`, pos, CAST(pos DIV 32 AS INT) AS word
        FROM (
            SELECT {kpre}`{col}`, explode(array({poss})) AS pos
            FROM (
                SELECT {kpre}`{col}`, md5(CAST(`{col}` AS STRING)) AS __h
                FROM {{probes}} WHERE `{col}` IS NOT NULL
            )
        )
    ) p
    LEFT JOIN {{filters}} f ON {join_on}
    GROUP BY {gb}
    """
    return probes.sparkSession.sql(sql, probes=probes, filters=filters)


# ---------------------------------------------------------------------------
# Count-min frequency sketch (deterministic, engine-portable)
# ---------------------------------------------------------------------------


def cm_build(
    df: DataFrame,
    key: Sequence[str],
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of ``col`` frequencies per key: rows
    ``(key..., r, c, cnt)`` — depth ``depth`` (<= 4) hash rows, width
    ``width`` counters each. Counter updates are integer sums, so the
    sketch is exactly reproducible under any partitioning; estimates are
    upper bounds (overcount-only), off by at most ~2n/width w.h.p.

    Shuffle is capped at ``|keys| * depth * width`` rows.
    """
    if not (1 <= depth <= 4):
        raise ValueError(f"depth must be in [1, 4], got {depth}")
    if width < 2 or width & (width - 1):
        raise ValueError(f"width must be a power of two >= 2, got {width}")
    key = list(key)
    kcols = ", ".join(f"`{c}`" for c in key)
    kpre = f"{kcols}, " if key else ""
    rows = ", ".join(
        f"named_struct('r', {r}, 'c', {_md5_chunk_mod(r, width)})"
        for r in range(depth)
    )
    sql = f"""
    SELECT {kpre}rc.r AS r, rc.c AS c, COUNT(*) AS cnt
    FROM (
        SELECT {kpre}explode(array({rows})) AS rc
        FROM (
            SELECT {kpre}md5(CAST(`{col}` AS STRING)) AS __h
            FROM {{df}} WHERE `{col}` IS NOT NULL
        )
    )
    GROUP BY {kpre}rc.r, rc.c
    """
    return df.sparkSession.sql(sql, df=df)


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: Sequence[str],
    col: str,
    width: int = 1024,
    depth: int = 4,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` from a :func:`cm_build`
    sketch (same ``width``/``depth``): min over the depth counters, 0 when a
    counter row is absent. Returns probe rows plus ``out_col`` (BIGINT)."""
    key = list(key)
    kpre = ", ".join(f"`{c}`" for c in key)
    kpre = f"{kpre}, " if key else ""
    rows = ", ".join(
        f"named_struct('r', {r}, 'c', {_md5_chunk_mod(r, width)})"
        for r in range(depth)
    )
    join_on = " AND ".join(
        [f"p.`{c}` = s.`{c}`" for c in key] + ["p.r = s.r", "p.c = s.c"]
    )
    pk = "".join(f"p.`{c}`, " for c in key)
    gb = ", ".join([f"p.`{c}`" for c in key] + [f"p.`{col}`"])
    sql = f"""
    SELECT {pk}p.`{col}`, min(coalesce(s.cnt, CAST(0 AS BIGINT))) AS `{out_col}`
    FROM (
        SELECT {kpre}`{col}`, rc.r AS r, rc.c AS c
        FROM (
            SELECT {kpre}`{col}`, explode(array({rows})) AS rc
            FROM (
                SELECT {kpre}`{col}`, md5(CAST(`{col}` AS STRING)) AS __h
                FROM {{probes}} WHERE `{col}` IS NOT NULL
            )
        )
    ) p
    LEFT JOIN {{sketch}} s ON {join_on}
    GROUP BY {gb}
    """
    return probes.sparkSession.sql(sql, probes=probes, sketch=sketch)
