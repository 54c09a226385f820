"""Checkpoint-recovery posture: a stateful streaming query STOPPED and
RESTARTED from the same checkpoint must resume offsets (already-processed
files are not re-emitted) and recover operator state (duplicates that
arrived before the restart still gate arrivals after it).

This is the worst case a long-running ingest front-end actually hits at
cluster scale — executors die, the driver restarts, and exactly-once
emission must hold across the query-lifetime boundary. Every other
streaming test exercises a single query lifetime; these two rebuild the
WHOLE plan from scratch (fresh readStream, fresh operator call) against
the prior checkpoint, which is exactly what a restarted job does.
"""

import time as _time

from pyspark.sql import functions as F


def _drain(stream_df, ckpt, mode="append"):
    """One availableNow query lifetime: start, drain all currently
    available files, terminate. Returns the rows emitted DURING THIS
    LIFETIME only."""
    results = []

    def sink(batch_df, _id):
        results.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return results


def _first_seen_restart_scenario(spark, tmp_path):
    """Shared body: dropDuplicatesWithinWatermark state recovery — a
    duplicate whose original arrived BEFORE the restart is still dropped
    AFTER it, and pre-restart files are not reprocessed (no re-emission
    of docs 1/2)."""
    from duckdb_ddsketch_spark.streaming import streaming_first_seen

    src = str(tmp_path / "restart_in")
    ckpt = str(tmp_path / "ck_restart")
    schema = "ts timestamp, doc_id long, text string"

    def write_file(mode, rows):
        df = spark.createDataFrame(
            rows, "ts_str string, doc_id long, text string"
        ).select(F.to_timestamp("ts_str").alias("ts"), "doc_id", "text")
        df.coalesce(1).write.mode(mode).parquet(src)

    def lifetime():
        # rebuilt from scratch each call — a restarted job's plan
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_first_seen(stream, "ts", text="text", watermark="1 hour")
        return _drain(out, ckpt)

    write_file(
        "overwrite",
        [
            ("2024-03-01 10:00:00", 1, "alpha doc"),
            ("2024-03-01 10:00:10", 2, "beta doc"),
        ],
    )
    first = lifetime()
    assert sorted(r.doc_id for r in first) == [1, 2]

    _time.sleep(1.1)  # file-source ordering is by modification time
    write_file(
        "append",
        [
            # normalized-text duplicate of doc 1, across the restart;
            # event time inside the recovered watermark horizon
            ("2024-03-01 10:00:30", 3, "ALPHA   DOC"),
            ("2024-03-01 10:00:40", 4, "gamma doc"),
        ],
    )
    second = lifetime()
    # offsets recovered (1/2 absent) AND digest state recovered (3 dropped)
    assert sorted(r.doc_id for r in second) == [4]


def test_streaming_first_seen_state_survives_restart(spark, tmp_path):
    _first_seen_restart_scenario(spark, tmp_path)


def test_streaming_first_seen_restart_under_rocksdb(spark, tmp_path):
    """Same recovery scenario through the RocksDB state store — the
    documented production posture (scalable_state_conf). Restart recovery
    there reloads state from RocksDB snapshots + changelog, a different
    code path from the default heap provider's delta files."""
    from duckdb_ddsketch_spark.streaming import scalable_state_conf

    saved = {}
    for k, v in scalable_state_conf().items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        _first_seen_restart_scenario(spark, tmp_path)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_neardup_state_survives_restart(spark, tmp_path):
    """The near-dup gate composes TWO state stores (first-seen band state
    + windowed per-doc count); both must recover. Lifetime 1 ingests the
    originals and emits NOTHING (their window never closes). Lifetime 2 —
    a fresh plan on the same checkpoint — ingests an exact repeat and a
    novel doc into the SAME window, then a watermark-advancing sentinel:
    the recovered band state drops the repeat wholesale, and the
    recovered window counts emit the lifetime-1 originals correctly."""
    from duckdb_ddsketch_spark.streaming import streaming_neardup_lsh

    src = str(tmp_path / "neardup_restart_in")
    ckpt = str(tmp_path / "ck_neardup_restart")
    schema = "doc_id bigint, text string, ts timestamp"

    def write_file(mode, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, ts_str string"
        ).select("doc_id", "text", F.to_timestamp("ts_str").alias("ts")) \
            .coalesce(1).write.mode(mode).parquet(src)

    def lifetime():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_neardup_lsh(
            stream, "ts", text="text", id_col="doc_id",
            num_hashes=16, bands=4, watermark="10 minutes", window="1 hour",
        )
        return _drain(out, ckpt)

    t_a = "the quick brown fox jumps over the lazy dog again and again today"
    t_b = "completely different text about spark structured streaming state stores"
    write_file(
        "overwrite",
        [
            (1, t_a, "2024-03-01 10:00:00"),
            (2, t_b, "2024-03-01 10:00:10"),
        ],
    )
    first = lifetime()
    assert first == []  # the [10:00, 11:00) window has not closed

    _time.sleep(1.1)
    write_file(
        "append",
        [
            # exact repeat of doc 2 across the restart, same window, and
            # ahead of the recovered watermark (09:50)
            (4, t_b, "2024-03-01 10:05:00"),
            (5, "yet another entirely unrelated document concerning parquet",
             "2024-03-01 10:05:10"),
        ],
    )
    _time.sleep(1.1)
    # watermark-advancing sentinel closes [10:00, 11:00); its own window
    # never closes and nothing is asserted about it
    write_file(
        "append",
        [(99, "sentinel text far in the future", "2024-03-02 09:00:00")],
    )
    second = lifetime()
    got = {r.doc_id: (r.n_new_bands, r.is_novel) for r in second}

    # recovered window-count state: the lifetime-1 originals emit here
    assert got[1] == (4, True)
    assert got[2] == (4, True)
    assert got[5] == (4, True)
    # recovered band state: the cross-restart exact repeat is dropped
    assert 4 not in got
    assert 99 not in got
