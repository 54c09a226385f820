"""Driver-exact result comparison, shared by the local gates.

The round driver sorts columns by name, stringifies values, and hashes —
so comparison must be exact AND type-preserving: an int64 ``4833`` and a
float64 ``4833.0`` are equal under ``==`` but hash differently once
stringified (that exact divergence shipped a red driver row in round 3
when a DuckDB HUGEINT leaked out of an uncast ``SUM``). Both local gates
(tests/test_oracle_parity.py, scripts/local_gate.py) route through the
helpers here.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = [
    "BANNED_ORACLE_TYPES",
    "canon_cell",
    "dtype_kind",
    "normalize",
    "frame_mismatches",
]

# DuckDB widens these to python objects / float64 in pandas, which the
# driver's type-exact hash then flags against Spark's BIGINT/DOUBLE
# output. Every oracle must CAST its way into a closed set of surface
# types; the DESCRIBE sweep enforces it.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def canon_cell(v) -> str:
    """Canonical form: exact, type-preserving stringification."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        fv = float(v)
        return "NULL" if math.isnan(fv) else repr(fv)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def dtype_kind(series: pd.Series) -> str:
    k = series.dtype.kind
    return "i" if k == "u" else k


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + total row sort, like the driver's pre-hash pass."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def frame_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame, limit: int = 6):
    """Compare two already-normalized frames the driver's way.

    Returns (kind_mismatches, value_mismatches): per-column dtype-kind
    drift (int-vs-float etc.) and up to ``limit`` exact-value differences.
    Frames must already be row-count- and column-matched; this guard keeps
    the zip() below from silently truncating to the shorter frame.
    """
    if len(sdf) != len(odf) or list(sdf.columns) != list(odf.columns):
        raise ValueError(
            f"frames not aligned: {len(sdf)}x{list(sdf.columns)} vs "
            f"{len(odf)}x{list(odf.columns)} — compare counts/columns first"
        )
    kinds = [
        (col, str(sdf[col].dtype), str(odf[col].dtype))
        for col in sdf.columns
        if dtype_kind(sdf[col]) != dtype_kind(odf[col])
    ]
    values = []
    for col in sdf.columns:
        for i, (av, bv) in enumerate(zip(sdf[col], odf[col])):
            if canon_cell(av) != canon_cell(bv):
                values.append((col, i, av, bv))
                if len(values) >= limit:
                    return kinds, values
    return kinds, values
