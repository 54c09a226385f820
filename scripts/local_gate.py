"""Local reproduction of the driver's correctness gate.

Runs every declared query on Spark and its DuckDB oracle at sf0.01 and
compares row count, column names, and EXACT sorted values (the driver
hashes values, so any difference — even 1 ulp — is a failure).

Usage: python scripts/local_gate.py [sf_dir] [only_query_prefix...]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from duckdb_ddsketch_spark.plans.parity import frame_mismatches, normalize

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]

from duckdb_ddsketch_spark.sources import TABLES  # one fixture list, shared with bench.py


def main() -> int:
    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark import register_ddsketch_functions

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("local-gate")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_ddsketch_functions(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sorted(queries)
    if ONLY:
        names = [n for n in names if any(n.startswith(p) for p in ONLY)]
    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name} (rows-only: {len(sdf)})")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            print(f"FAIL {name}: oracle error: {exc}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        kinds, bad = frame_mismatches(normalize(sdf), normalize(odf), limit=3)
        if kinds:
            failures.append((name, f"dtype kinds {kinds}"))
            print(f"FAIL {name}: dtype kinds {kinds}")
        elif bad:
            failures.append((name, f"values {bad}"))
            print(f"FAIL {name}: values {bad}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\n{len(names) - len(failures)}/{len(names)} exact-match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
