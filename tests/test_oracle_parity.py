"""Driver-style correctness gate, run locally: every declared query must
match its DuckDB oracle on row count, column names, and sorted values.

This mimics what the round driver does at sf=0.01 (we default to sf0.001 for
speed; set SPARK_GRAFT_TESTDATA=/root/testdata/sf0.01 to reproduce the gate).
"""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def canon_cell(v) -> str:
    """Driver-style canonical form: exact, type-preserving stringification.

    The round driver hash-compares stringified values, so ``4833`` (BIGINT)
    and ``4833.0`` (a HUGEINT that pandas widened to float64) must NOT be
    considered equal here — that exact divergence shipped q40 red in round 3
    while the old 1e-6-tolerant comparison passed it locally.
    """
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


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = queries[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    odf = ddb.execute(oracles[name]).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s = normalize(sdf)
    o = normalize(odf)
    kind_mismatches = [
        (col, str(s[col].dtype), str(o[col].dtype))
        for col in s.columns
        if dtype_kind(s[col]) != dtype_kind(o[col])
    ]
    assert not kind_mismatches, (
        f"{name}: dtype-kind drift (spark vs oracle) — a HUGEINT/DECIMAL "
        f"oracle column or an uncast Spark aggregate: {kind_mismatches}"
    )
    mismatches = []
    for col in s.columns:
        for i, (av, bv) in enumerate(zip(s[col], o[col])):
            if canon_cell(av) != canon_cell(bv):
                mismatches.append((col, i, av, bv))
                if len(mismatches) > 5:
                    break
    assert not mismatches, f"{name}: {mismatches}"


# DuckDB widens these to python objects / float64 in pandas, which the
# driver's type-exact hash then flags against Spark's BIGINT/DOUBLE output.
# Every oracle must CAST its way into this closed set of surface types.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_output_types(ddb, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip("no oracle (rows-only check)")
    desc = ddb.execute(f"DESCRIBE {oracles[name]}").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in desc
        if any(ctype.upper().startswith(b) for b in BANNED_ORACLE_TYPES)
    ]
    assert not bad, f"{name}: oracle emits driver-hostile types {bad}; add CASTs"
