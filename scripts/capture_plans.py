"""Capture .explain('formatted') output for declared queries.

Usage: python scripts/capture_plans.py <outdir> <query_prefix> [...]

Writes <outdir>/<query>.txt for every declared query matching one of the
prefixes, using the sf0.1 data the bench sees.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = sys.argv[1]
PREFIXES = sys.argv[2:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

os.makedirs(OUTDIR, exist_ok=True)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("plan-capture")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod
from duckdb_ddsketch_spark.plans import declared

pool = dict(declared.STAGED_QUERIES)
pool.update(entry_mod.queries())

for name, fn in sorted(pool.items()):
    if PREFIXES and not any(name.startswith(p) for p in PREFIXES):
        continue
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    path = os.path.join(OUTDIR, f"{name}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)", flush=True)
