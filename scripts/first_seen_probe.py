"""Scale evidence for streaming_first_seen: state is bounded by the
watermark horizon (arrival rate x horizon), never by stream length.

Drives the same synthetic stream — 12 ten-minute micro-batches, each
introducing NEW_PER_STEP fresh keys plus re-sends of older keys — through
streaming_first_seen at two watermark horizons, then reads the state
operator's numRowsTotal from the query progress. If the design claim
holds, the short horizon's state plateaus near rate x horizon while the
long horizon's tracks total distinct keys; neither tracks total rows.

Usage: python scripts/first_seen_probe.py [cpus]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(
    sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_CPUS", "8")
)

STEPS = 12               # ten-minute steps -> 2 hours of event time
NEW_PER_STEP = 1_000     # fresh keys arriving per step
DUP_PER_STEP = 2_000     # re-sends of keys from earlier steps


def main():
    from pyspark.sql import SparkSession, functions as F

    from duckdb_ddsketch_spark.streaming import streaming_first_seen

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("first-seen-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.streaming.metricsEnabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="first_seen_probe_")
    results = {}
    try:
        src = os.path.join(work, "in")
        # one parquet file per step, written in event-time order; the file
        # source triggers one batch per file (ordered by mod time)
        for step in range(STEPS):
            new = spark.range(NEW_PER_STEP).selectExpr(
                f"id + {step} * {NEW_PER_STEP} AS doc_id", f"{step} AS step"
            )
            dup = spark.range(DUP_PER_STEP).selectExpr(
                # re-send keys first seen in steps [step-3, step)
                f"(id % {max(1, 3 * NEW_PER_STEP)})"
                f" + greatest(0, {step} - 3) * {NEW_PER_STEP} AS doc_id",
                f"{step} AS step",
            )
            batch = new.unionAll(dup).withColumn(
                "ts",
                F.expr(f"timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,{step}*10,0)"),
            ).select("ts", "doc_id")
            batch.coalesce(1).write.mode(
                "overwrite" if step == 0 else "append"
            ).parquet(src)
            time.sleep(1.05)  # file-source batch order follows mod time

        total_rows = STEPS * (NEW_PER_STEP + DUP_PER_STEP)
        total_distinct = STEPS * NEW_PER_STEP

        for label, horizon in (("30min", "30 minutes"), ("4h", "4 hours")):
            stream = (
                spark.readStream.schema("ts timestamp, doc_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = streaming_first_seen(
                stream, "ts", keys=["doc_id"], watermark=horizon
            )
            ck = os.path.join(work, f"ck_{label}")
            sink = os.path.join(work, f"out_{label}")
            q = (
                out.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .start()
            )
            q.processAllAvailable()
            state_rows = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress
                if p.get("stateOperators")
            ]
            q.stop()
            emitted = spark.read.parquet(sink).count()
            results[label] = {
                "state_rows_final": state_rows[-1] if state_rows else None,
                "state_rows_peak": max(state_rows) if state_rows else None,
                "emitted_rows": emitted,
            }

        print(json.dumps({
            "probe": "streaming_first_seen",
            "steps": STEPS,
            "rows_ingested": total_rows,
            "distinct_keys": total_distinct,
            "horizons": results,
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
