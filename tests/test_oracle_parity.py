"""Driver-style correctness gate, run locally: every declared query must
match its DuckDB oracle on row count, column names, and sorted values.

This mimics what the round driver does at sf=0.01 (we default to sf0.001 for
speed; set SPARK_GRAFT_TESTDATA=/root/testdata/sf0.01 to reproduce the gate).
"""

import math
import os

import duckdb
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


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        m = max(abs(a), abs(b))
        return m > 0 and abs(a - b) <= m * 1e-6
    return a == b


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
    mismatches = []
    for col in s.columns:
        for i, (av, bv) in enumerate(zip(s[col], o[col])):
            if not values_equal(av, bv):
                mismatches.append((col, i, av, bv))
                if len(mismatches) > 5:
                    break
    assert not mismatches, f"{name}: {mismatches}"
