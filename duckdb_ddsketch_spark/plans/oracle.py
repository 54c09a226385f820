"""DuckDB oracle SQL generator mirroring the native DDSketch pipeline.

The generated SQL computes, for a value column grouped by arbitrary
expressions, the same bin-math results as
:func:`duckdb_ddsketch_spark.operators.native.sketch_quantile_agg` (and
therefore as the blob path after a wire round-trip):

* ``bin = CEIL(LN(v)/log_gamma)`` per sign class (datadog_encoding.rs:750-753)
* ``value(bin) = POWER(gamma, bin) * mult`` with ``mult = 1 + (1-2/(1+gamma))``
  (datadog_encoding.rs:709-715)
* count exact; sum/min/max reconstructed from bins (:444-494)
* quantile: Go-exact ``rank = q*(count-1)``, strict ``cum > rank``, negative
  store reversed rank, zero bucket (:651-703)

Constants (gamma, log_gamma, mult) are precomputed in Python and embedded
with full ``repr`` precision so both engines evaluate identical arithmetic;
approximate outputs are cast to REAL/float on both sides.
"""

from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence

from ..sketch import DEFAULT_RELATIVE_ACCURACY

STAT_COLUMNS = ("count", "sum", "avg", "min", "max")


def qname(q: float) -> str:
    return f"{q * 100:g}".replace(".", "_")


def constants(alpha: float = DEFAULT_RELATIVE_ACCURACY) -> dict:
    gamma = 1.0 + 2.0 * alpha / (1.0 - alpha)
    return {
        "gamma": gamma,
        "log_gamma": math.log(gamma),
        "mult": 1.0 + (1.0 - 2.0 / (1.0 + gamma)),
    }


def quantile_oracle_sql(
    table: str,
    group_by: Mapping[str, str],
    value: str,
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
    quantiles: Sequence[float] = (),
    stats: Sequence[str] = STAT_COLUMNS,
    where: Optional[str] = None,
    weight: Optional[str] = None,
    quantile_cast: str = "REAL",
    binned_from: Optional[str] = None,
) -> str:
    """Build the oracle query.

    ``group_by`` maps output column name -> SQL expression (empty = global
    aggregate); ``value`` is a SQL expression for the sketched value;
    ``stats`` picks from count/sum/avg/min/max; quantile columns are named
    ``p<qname>``. ``weight`` (SQL expression) mirrors ``add_with_count``:
    rows with weight <= 0 are ignored, bin counts sum the weights.

    ``binned_from``: advanced — a SQL query yielding the already-binned
    relation ``(<group_by names>..., sign, bin, cnt)`` to use instead of
    binning ``table.value`` here (``table``/``value``/``where``/``weight``
    are then ignored). Lets callers mirror engine pipelines that transform
    the binned counts (e.g. trailing windows) before quantile selection;
    every downstream stat/quantile is bin-reconstructed, so the binned
    relation is all the oracle needs.
    """
    c = constants(alpha)
    g = repr(c["gamma"])
    lg = repr(c["log_gamma"])
    mult = repr(c["mult"])

    grp_names = list(group_by.keys())
    grp_select = "".join(f"{expr} AS {name}, " for name, expr in group_by.items())
    grp_list = ", ".join(grp_names)
    part = f"PARTITION BY {grp_list} " if grp_names else ""
    part_sign = f"PARTITION BY {grp_list}, sign" if grp_names else "PARTITION BY sign"
    # the finite-range guard mirrors the engine's skip-non-finite rule
    # (native.py _binned_sql): BETWEEN +-DBL_MAX excludes NULL, NaN, +-inf
    # the same way in both engines
    where_clause = (
        f"WHERE ({value}) IS NOT NULL AND ({value})"
        " BETWEEN -1.7976931348623157E308 AND 1.7976931348623157E308"
    )
    if weight is not None:
        where_clause += f" AND ({weight}) > 0"
    if where:
        where_clause += f" AND ({where})"
    w_expr = f"CAST(({weight}) AS DOUBLE)" if weight is not None else "1.0"

    def binval(bin_expr: str) -> str:
        return f"(POWER({g}, {bin_expr}) * {mult})"

    sel_cols = []
    for q in quantiles:
        qn = qname(q)
        rank = f"({q!r} * (t.total - 1))"
        sel_cols.append(
            f"MIN(CASE WHEN c.sign = 1 AND c.cum > {rank} - t.zeroc - t.negc"
            f" THEN c.bin END) AS psel_{qn}"
        )
        sel_cols.append(
            f"MIN(CASE WHEN c.sign = -1 AND c.cum > t.negc - 1 - {rank}"
            f" THEN c.bin END) AS nsel_{qn}"
        )
    sel_sql = ",\n        ".join(sel_cols) if sel_cols else "1 AS _dummy"

    out_cols = [f"t.{n} AS {n}" for n in grp_names]
    for s in stats:
        if s == "count":
            out_cols.append("CAST(t.total AS BIGINT) AS count")
        elif s == "sum":
            out_cols.append("CAST(t.sum_bins AS REAL) AS sum")
        elif s == "avg":
            out_cols.append("CAST(t.sum_bins / t.total AS REAL) AS avg")
        elif s == "min":
            out_cols.append(
                "CAST(LEAST("
                f"-{binval('t.max_neg_bin')}, "
                "CASE WHEN t.zeroc > 0 THEN 0.0 END, "
                f"{binval('t.min_pos_bin')}) AS REAL) AS min"
            )
        elif s == "max":
            out_cols.append(
                "CAST(GREATEST("
                f"{binval('t.max_pos_bin')}, "
                "CASE WHEN t.zeroc > 0 THEN 0.0 END, "
                f"-{binval('t.min_neg_bin')}) AS REAL) AS max"
            )
    for q in quantiles:
        qn = qname(q)
        rank = f"({q!r} * (t.total - 1))"
        nsel = f"COALESCE(s.nsel_{qn}, t.max_neg_bin)"
        psel = f"COALESCE(s.psel_{qn}, t.max_pos_bin)"
        out_cols.append(
            f"CAST(CASE WHEN {rank} < t.negc THEN -{binval(nsel)}"
            f" WHEN {rank} < t.negc + t.zeroc THEN 0.0"
            f" ELSE {binval(psel)} END AS {quantile_cast}) AS p{qn}"
        )
    out_sql = ",\n    ".join(out_cols)
    join_cond = (
        " AND ".join(f"t.{n} IS NOT DISTINCT FROM s.{n}" for n in grp_names)
        if grp_names
        else "1=1"
    )
    sel_grp = ("c." + ", c.".join(grp_names) + ", ") if grp_names else ""
    sel_grp_out = ", ".join(f"c.{n} AS {n}" for n in grp_names)
    sel_grp_out = sel_grp_out + ", " if sel_grp_out else ""
    tot_grp = f"GROUP BY {grp_list}" if grp_names else ""
    join_tot = (
        " AND ".join(f"c.{n} IS NOT DISTINCT FROM t.{n}" for n in grp_names)
        if grp_names
        else "1=1"
    )

    if binned_from is not None:
        vals_binned = f"binned AS (\n{binned_from}\n)"
    else:
        vals_binned = f"""vals AS (
    SELECT {grp_select}CAST(({value}) AS DOUBLE) AS v, {w_expr} AS w
    FROM {table}
    {where_clause}
),
binned AS (
    SELECT {grp_list + ', ' if grp_names else ''}
        CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sign,
        CASE WHEN v > 0 THEN CAST(CEIL(LN(v) / {lg}) AS INTEGER)
             WHEN v < 0 THEN CAST(CEIL(LN(-v) / {lg}) AS INTEGER) END AS bin,
        CAST(SUM(w) AS DOUBLE) AS cnt
    FROM vals
    GROUP BY {grp_list + ', ' if grp_names else ''}sign, bin
)"""
    return f"""
WITH {vals_binned},
tot AS (
    SELECT {grp_list + ', ' if grp_names else ''}
        SUM(cnt) AS total,
        SUM(CASE WHEN sign = -1 THEN cnt ELSE 0 END) AS negc,
        SUM(CASE WHEN sign = 0 THEN cnt ELSE 0 END) AS zeroc,
        SUM(CASE WHEN sign = 1 THEN {binval('bin')} * cnt
                 WHEN sign = -1 THEN -{binval('bin')} * cnt
                 ELSE 0 END) AS sum_bins,
        MAX(CASE WHEN sign = -1 THEN bin END) AS max_neg_bin,
        MIN(CASE WHEN sign = -1 THEN bin END) AS min_neg_bin,
        MAX(CASE WHEN sign = 1 THEN bin END) AS max_pos_bin,
        MIN(CASE WHEN sign = 1 THEN bin END) AS min_pos_bin
    FROM binned
    {tot_grp}
),
cum AS (
    SELECT {grp_list + ', ' if grp_names else ''}sign, bin, cnt,
        SUM(cnt) OVER ({part_sign} ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM binned
),
sel AS (
    SELECT {sel_grp_out}
        {sel_sql}
    FROM cum c JOIN tot t ON {join_tot}
    {('GROUP BY ' + sel_grp.rstrip(', ').replace('c.', 'c.')) if grp_names else ''}
)
SELECT
    {out_sql}
FROM tot t JOIN sel s ON {join_cond}
"""


def rowwise_bin_value_sql(value: str) -> tuple[str, str]:
    """(bin_sql, value_sql) for a strictly-positive per-row value — mirrors
    ``ddsketch_quantile(one_value_sketch(v), q)`` for any q in [0,1]."""
    c = constants()
    bin_sql = f"CAST(CEIL(LN({value}) / {c['log_gamma']!r}) AS INTEGER)"
    val_sql = f"CAST(POWER({c['gamma']!r}, {bin_sql}) * {c['mult']!r} AS REAL)"
    return bin_sql, val_sql
