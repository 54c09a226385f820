"""Driver-style correctness gate, run locally: every declared query must
match its DuckDB oracle on row count, column names, and sorted values.

This mimics what the round driver does at sf=0.01 (we default to sf0.001 for
speed; set SPARK_GRAFT_TESTDATA=/root/testdata/sf0.01 to reproduce the gate).
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from duckdb_ddsketch_spark.plans.parity import (
    BANNED_ORACLE_TYPES,
    frame_mismatches,
    normalize,
)

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
    kinds, values = frame_mismatches(normalize(sdf), normalize(odf))
    assert not kinds, (
        f"{name}: dtype-kind drift (spark vs oracle) — a HUGEINT/DECIMAL "
        f"oracle column or an uncast Spark aggregate: {kinds}"
    )
    assert not values, f"{name}: {values}"


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
