"""Capture q94_bm25_topk's FULL plan with localCheckpoint neutralized.

bm25_scores lazily checkpoints the per-(doc, term) candidate table, so
the final q94 plan shows the heavy corpus pass as `Scan ExistingRDD`.
For plan-diff evidence of changes INSIDE that pass, this script
monkeypatches DataFrame.localCheckpoint to identity (evidence capture
only — the operator itself is untouched) and writes the untruncated
explain('formatted') output.

Usage: python scripts/capture_bm25_heavypass_plan.py <outfile>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTFILE = sys.argv[1]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession
from pyspark.sql.classic.dataframe import DataFrame  # the concrete class

DataFrame.localCheckpoint = lambda self, eager=True: self  # evidence only

spark = (
    SparkSession.builder.master("local[8]")
    .appName("bm25-heavypass-plan")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.plans import declared

df = dict(declared.STAGED_QUERIES)["q94_bm25_topk"](spark, SF_DIR)
plan = df._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
)
with open(OUTFILE, "w") as f:
    f.write(plan)
print(f"wrote {OUTFILE} ({len(plan)} bytes)", flush=True)
