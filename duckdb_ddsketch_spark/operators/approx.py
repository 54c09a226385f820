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
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate_expr",
    "kmv_set_estimates",
]



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


# ---------------------------------------------------------------------------
# KMV / theta-style distinct sketch: the k smallest md5 hashes per group.
# Unlike HLL it supports INTERSECTION and DIFFERENCE estimates (set algebra
# over the retained hash samples), and "fewer than k distinct" groups are
# EXACT. Deterministic: min-of-hashes is order-independent by construction.
#
# Scale shape: the per-key k-smallest selection runs on the DISTINCT
# (key, hash) pairs — map-side partial distinct collapses duplicates before
# the shuffle, and the sketch itself (k 60-bit ints per key) is a first-class
# mergeable value: daily sketches union by re-ranking k smallest of the
# concatenation, never re-scanning raw data.
# ---------------------------------------------------------------------------

_KMV_SPACE = float(1 << 60)  # hashes are uniform in [0, 2^60)


def _kmv_k_smallest(
    hashes: DataFrame, keys: Sequence[str], k: int, salts: int = 64
) -> DataFrame:
    """(keys, __h distinct) -> (keys, kmv sorted array, n_kept).

    Two-level selection so no single task ever ranks a whole key's hash set:
    rank within (keys, __h % salts) keeping k — a distributed window over
    the salted shuffle — then rank the surviving ``salts * k`` rows per key.
    The final per-key window therefore sees a bounded, input-independent
    row count.
    """
    from pyspark.sql import Window

    keys = list(keys)
    pre = Window.partitionBy(*keys, F.pmod(F.col("__h"), F.lit(salts))).orderBy(
        F.col("__h").asc()
    )
    pruned = hashes.withColumn("__prn", F.row_number().over(pre)).where(
        F.col("__prn") <= k
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__h").asc())
    kept = pruned.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return kept.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv"),
        F.count("*").alias("n_kept"),
    )


def kmv_sketch(
    df: DataFrame, keys: Sequence[str], value: str, k: int = 256
) -> DataFrame:
    """Per-``keys`` KMV sketch: sorted array of the k smallest 60-bit md5
    hashes of distinct ``value``s, as column ``kmv`` (+ helper ``n_kept``)."""
    keys = list(keys)
    hashed = df.where(F.col(value).isNotNull()).selectExpr(
        *[f"`{c}`" for c in keys],
        "CAST(conv(substring(md5(CAST(`%s` AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) AS __h" % value,
    )
    return _kmv_k_smallest(hashed.distinct(), keys, k)


def kmv_merge(df: DataFrame, keys: Sequence[str], k: int = 256) -> DataFrame:
    """Union-merge KMV sketches across rows per ``keys``: explode, distinct,
    keep the k smallest again. Input column ``kmv``; same output shape."""
    keys = list(keys)
    exploded = df.select(*keys, F.explode("kmv").alias("__h")).distinct()
    return _kmv_k_smallest(exploded, keys, k)


def kmv_estimate_expr(kmv: str = "kmv", k: int = 256) -> str:
    """SQL text: distinct-count estimate from a KMV array.

    Fewer than k retained hashes means the group's distinct count IS the
    retained count (exact). Otherwise the classic estimator
    ``(k - 1) / U_(k)`` with ``U_(k)`` the k-th smallest hash as a fraction
    of the hash space. Float32-rounded like every approximate output."""
    kth = f"CAST(element_at(`{kmv}`, {k}) AS DOUBLE)"
    return (
        f"CAST(CASE WHEN size(`{kmv}`) < {k}"
        f" THEN CAST(size(`{kmv}`) AS DOUBLE)"
        f" ELSE {float(k - 1)!r}D * {_KMV_SPACE!r}D / {kth}"
        " END AS FLOAT)"
    )


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, keys: Sequence[str], k: int = 256
) -> DataFrame:
    """Join two per-``keys`` KMV sketch tables and estimate
    ``distinct_a``, ``distinct_b``, ``intersection`` and ``difference``
    (a minus b) — the set algebra HLL cannot do.

    Method: union the two hash sets, keep the k smallest; the fraction of
    those that appear in BOTH sketches estimates the Jaccard similarity, and
    ``est_intersection = jaccard * est_union`` (Beyer et al., the standard
    KMV set-operation estimator). All selections are mins over integers, so
    the estimate is reproducible anywhere md5 is.
    """
    keys = list(keys)
    aj = a.select(*keys, F.col("kmv").alias("kmv_a"))
    bj = b.select(*keys, F.col("kmv").alias("kmv_b"))
    j = aj.join(bj, keys) if keys else aj.crossJoin(bj)
    union_k = f"slice(array_sort(array_union(kmv_a, kmv_b)), 1, {k})"
    stage1 = j.selectExpr(
        *[f"`{c}`" for c in keys],
        f"{kmv_estimate_expr('kmv_a', k)} AS est_a",
        f"{kmv_estimate_expr('kmv_b', k)} AS est_b",
        "kmv_a",
        "kmv_b",
        f"{union_k} AS __u",
    )
    stage2 = stage1.selectExpr(
        *[f"`{c}`" for c in keys],
        "est_a",
        "est_b",
        f"{kmv_estimate_expr('__u', k)} AS est_union",
        # of the union's k smallest, how many live in BOTH input sets
        "CAST(size(array_intersect(array_intersect(__u, kmv_a), kmv_b))"
        " AS DOUBLE) / CAST(size(__u) AS DOUBLE) AS __jacc",
    )
    return stage2.selectExpr(
        *[f"`{c}`" for c in keys],
        "est_a",
        "est_b",
        "est_union",
        "CAST(CAST(__jacc AS DOUBLE) * CAST(est_union AS DOUBLE) AS FLOAT)"
        " AS est_intersection",
        "CAST(greatest(CAST(est_a AS DOUBLE) - CAST(__jacc AS DOUBLE)"
        " * CAST(est_union AS DOUBLE), 0D) AS FLOAT) AS est_diff_a",
    )
