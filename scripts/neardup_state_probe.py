"""Scale evidence for streaming_neardup_bands: the near-dup gate's state
is bounded by DISTINCT band content inside the watermark horizon, never
by stream length — and near-duplicates barely add state (only their few
novel bands enter; an exact repeat adds nothing).

Drives a synthetic stream — STEPS ten-minute micro-batches, each with
NEW_PER_STEP novel docs, NEAR_PER_STEP one-word-edited variants of docs
from the previous three steps, and EXACT_PER_STEP verbatim resends —
through the band first-seen stage at two watermark horizons, then reads
the state operator's numRowsTotal from the query progress and compares
against the batch-computed distinct-band ground truth. If the design
claim holds: the short horizon's state plateaus near
bands x novel-content rate x horizon (+ the ~1 novel band each near-dup
contributes), the long horizon's tracks total distinct band values, and
neither tracks total band rows ingested.

Usage: python scripts/neardup_state_probe.py [cpus]
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

STEPS = 10
NEW_PER_STEP = 300
NEAR_PER_STEP = 600   # near-dups of docs first seen in steps [step-3, step)
EXACT_PER_STEP = 300  # verbatim resends from the same window
N_BANDS = 4


def _text_sql(base: str, variant: bool) -> str:
    """12-word deterministic text for doc ``base``; the variant swaps the
    last word (a one-word edit -> most MinHash bands still collide)."""
    words = (
        f"transform(sequence(1, 12), i ->"
        f" concat('w', CAST((({base}) * 31 + i * 7) % 50000 AS STRING),"
        f" '_', CAST(i AS STRING)))"
    )
    if variant:
        # replace word 12 with an edit marker unique to the variant row
        return (
            f"concat_ws(' ', slice({words}, 1, 11),"
            f" concat('edit', CAST({base} AS STRING)))"
        )
    return f"concat_ws(' ', {words})"


def main():
    from pyspark.sql import SparkSession, functions as F

    from duckdb_ddsketch_spark.operators.dedup import minhash_band_structs
    from duckdb_ddsketch_spark.streaming import streaming_neardup_bands

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("neardup-state-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.streaming.metricsEnabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="neardup_probe_")
    results = {}
    try:
        src = os.path.join(work, "in")
        for step in range(STEPS):
            new = spark.range(NEW_PER_STEP).selectExpr(
                f"id + {step} * {NEW_PER_STEP} AS doc_id",
                f"{_text_sql(f'id + {step} * {NEW_PER_STEP}', False)} AS text",
            )
            base3 = f"(id % {3 * NEW_PER_STEP}) + greatest(0, {step} - 3) * {NEW_PER_STEP}"
            near = spark.range(NEAR_PER_STEP).selectExpr(
                f"-(id + {step} * {NEAR_PER_STEP}) - 1 AS doc_id",
                f"{_text_sql(base3, True)} AS text",
            )
            exact = spark.range(EXACT_PER_STEP).selectExpr(
                f"-(id + {STEPS * NEAR_PER_STEP} + {step} * {EXACT_PER_STEP}) - 1000000 AS doc_id",
                f"{_text_sql(base3, False)} AS text",
            )
            batch = new.unionAll(near).unionAll(exact).withColumn(
                "ts",
                F.expr(
                    "timestamp'2024-03-01 00:00:00'"
                    f" + make_interval(0,0,0,0,0,{step}*10,0)"
                ),
            ).select("ts", "doc_id", "text")
            batch.coalesce(1).write.mode(
                "overwrite" if step == 0 else "append"
            ).parquet(src)
            time.sleep(1.05)  # file-source batch order follows mod time

        rows_per_step = NEW_PER_STEP + NEAR_PER_STEP + EXACT_PER_STEP
        total_rows = STEPS * rows_per_step

        # batch ground truth: distinct band values over the whole stream
        all_docs = spark.read.parquet(src)
        distinct_bands_total = (
            all_docs.select(
                F.explode(minhash_band_structs(F.col("text"))).alias("b")
            )
            .select("b.band_id", "b.band_hash")
            .distinct()
            .count()
        )

        for label, horizon in (("30min", "30 minutes"), ("4h", "4 hours")):
            stream = (
                spark.readStream.schema("ts timestamp, doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = streaming_neardup_bands(
                stream, "ts", text="text", id_col="doc_id",
                num_hashes=16, bands=N_BANDS, watermark=horizon,
            ).select("ts", "doc_id", "band_id", "band_hash")
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
            emitted = spark.read.parquet(sink)
            results[label] = {
                "state_rows_final": state_rows[-1] if state_rows else None,
                "state_rows_peak": max(state_rows) if state_rows else None,
                "emitted_band_rows": emitted.count(),
                # novel docs = all bands emitted; near-dups emit only their
                # edit-word bands; exact repeats emit nothing
                "docs_all_bands_new": emitted.groupBy("doc_id")
                .count()
                .where(F.col("count") == N_BANDS)
                .count(),
            }

        print(json.dumps({
            "probe": "streaming_neardup_bands",
            "steps": STEPS,
            "rows_ingested": total_rows,
            "band_rows_ingested": total_rows * N_BANDS,
            "distinct_band_values_total": distinct_bands_total,
            "horizons": results,
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
