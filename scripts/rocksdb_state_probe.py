"""Scale evidence for ``scalable_state_conf()``: the RocksDB state-store
provider holds streaming state on local disk with bounded executor
memory; the default HDFS-backed (on-heap) provider's memory grows with
state rows and falls over at high key cardinality.

Drives the SAME 60M-row windowed-binned-counts workload as the official
``streaming_windows`` bench family (16 staged parquet files, 4-file
micro-batches, availableNow) under both providers, at the family's key
cardinality (25) and at 10x (250 keys -> ~10x state rows per batch).
Each config runs in its OWN subprocess on the bench session's 8 GB heap:
an executor OOM (the on-heap provider's expected failure mode at 10x) is
an isolated, REPORTED outcome — ``{"oom": true}`` — not a probe crash.

Metrics from the final query progress:

- HDFS provider: ``memoryUsedBytes`` IS executor heap — it grows with
  state rows and is the 100 TB OOM risk the RocksDB provider removes.
- RocksDB provider: ``memoryUsedBytes`` reports the bounded block-cache/
  memtable working set; ``rocksdbSstFileSize`` is the on-disk state.

Results are recorded in SCALING.md ("Streaming" section). Usage::

    python scripts/rocksdb_state_probe.py [cpus]          # orchestrate
    python scripts/rocksdb_state_probe.py --one SRC PROV  # internal

Prints one JSON line.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def _run_once(spark, src, batch_files, glob_filter=None):
    """One availableNow pass of the bench family's streaming aggregate;
    returns (wall_s, final state-operator progress dict)."""
    from duckdb_ddsketch_spark import streaming as st

    ckpt = tempfile.mkdtemp(prefix="rocksdb_probe_ckpt_")
    try:
        reader = spark.readStream.schema(
            "ts TIMESTAMP, key INT, value DOUBLE"
        ).option("maxFilesPerTrigger", batch_files)
        if glob_filter:
            reader = reader.option("pathGlobFilter", glob_filter)
        stream = reader.parquet(src)
        binned = st.windowed_binned_counts(
            stream, "ts", ["key"], "value", window="1 hour"
        )
        t0 = time.time()
        q = (
            binned.writeStream.outputMode("append")
            .foreachBatch(lambda df, _bid: df.count())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        ops = [
            p["stateOperators"][0]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
        rows_peak = max((o.get("numRowsTotal", 0) for o in ops), default=None)
        mem_peak = max((o.get("memoryUsedBytes", 0) for o in ops), default=None)
        return wall, (ops[-1] if ops else {}), rows_peak, mem_peak
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def _one(src, provider_label):
    import bench
    from pyspark.sql import SparkSession

    from duckdb_ddsketch_spark.streaming import scalable_state_conf

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rocksdb-state-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    confs = (
        scalable_state_conf()
        if provider_label == "rocksdb"
        else {"spark.sql.streaming.stateStore.providerClass": HDFS_PROVIDER}
    )
    for k, v in confs.items():
        spark.conf.set(k, v)
    # steady-state policy (same as the bench family): a one-file pass
    # absorbs the streaming machinery's one-time JIT
    _run_once(spark, src, bench.STREAM_BATCH_FILES, glob_filter="part-00.parquet")
    wall, op, rows_peak, mem_peak = _run_once(
        spark, src, bench.STREAM_BATCH_FILES
    )
    custom = op.get("customMetrics", {})
    print(
        json.dumps(
            {
                "wall_s": round(wall, 2),
                "state_rows_final": op.get("numRowsTotal"),
                "state_rows_peak": rows_peak,
                "memory_used_peak_mb": round((mem_peak or 0) / 1e6, 1),
                "rocksdb_sst_mb": round(
                    custom.get("rocksdbSstFileSize", 0) / 1e6, 1
                ),
                "rocksdb_total_mem_mb": round(
                    custom.get("rocksdbTotalMemoryUsage", 0) / 1e6, 1
                ),
            }
        )
    )


def main():
    import bench

    # stage the official family source (25 keys) plus a 10x-cardinality
    # variant (250 keys) through the same generator — bench's source path
    # encodes the key count, so the two stagings cannot collide
    bench._ensure_stream_src()
    src_1x = bench.STREAM_SRC
    keys_1x = bench.STREAM_KEYS
    bench.STREAM_KEYS = keys_1x * 10
    bench.STREAM_SRC = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"ddsketch_bench_stream_v2_{bench.N_60M}_{bench.STREAM_KEYS}k_"
        f"{bench.STREAM_HOURS}h_{bench.STREAM_FILES}f",
    )
    bench._ensure_stream_src()
    src_10x = bench.STREAM_SRC

    def _text(v) -> str:
        if v is None:
            return ""
        return v.decode(errors="replace") if isinstance(v, bytes) else v

    results = {}
    for label, src in (("keys_25", src_1x), ("keys_250", src_10x)):
        for prov in ("hdfs", "rocksdb"):
            # own session (= own process group): on timeout the GC-
            # thrashing local-mode JVM is a GRANDCHILD — killing only the
            # python child would leave an 8 GB heap wedged in the
            # background, contaminating the next config's measurement
            child = subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    src,
                    prov,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                start_new_session=True,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(CPUS)},
            )
            try:
                stdout, stderr = child.communicate(timeout=900)
            except subprocess.TimeoutExpired as te:
                # heap exhaustion often presents as a GC-thrash hang, not
                # a fast OOM exit — a timed-out config is a REPORTED
                # outcome too, and the remaining configs still run
                import signal

                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                child.wait()
                tail = _text(te.stderr) + _text(te.stdout)
                results[f"{label}_{prov}"] = {
                    "timeout": True,
                    "failed": True,
                    "oom": "OutOfMemoryError" in tail,
                }
                continue
            proc = subprocess.CompletedProcess(
                child.args, child.returncode, stdout, stderr
            )
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.startswith("{")
                ),
                None,
            )
            if proc.returncode != 0 or line is None:
                oom = "OutOfMemoryError" in (proc.stderr + proc.stdout)
                results[f"{label}_{prov}"] = {
                    "oom": oom,
                    "failed": True,
                }
            else:
                results[f"{label}_{prov}"] = json.loads(line)
    print(json.dumps({"probe": "rocksdb_state", "cpus": CPUS, **results}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _one(sys.argv[2], sys.argv[3])
    else:
        if len(sys.argv) > 1:
            CPUS = int(sys.argv[1])
        main()
