"""Structured Streaming sketch windows: run real micro-batch streams from a
file source and verify against batch-built kernel sketches over the same rows.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark import DDSketch
from duckdb_ddsketch_spark.streaming import (
    finalize_window_sketches,
    sessionized_sketches,
    streaming_quantiles,
    windowed_binned_counts,
)

SCHEMA = "ts timestamp, service string, value double"


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    """Deterministic event rows as parquet for a file-source stream."""
    path = str(tmp_path_factory.mktemp("stream_in"))
    rows = []
    for i in range(2000):
        minute = i % 120  # two hours of data
        rows.append(
            (
                f"2024-03-01 {minute // 60:02d}:{minute % 60:02d}:30",
                f"svc{i % 3}",
                float((i * 37) % 500) + 0.5,
            )
        )
    df = spark.createDataFrame(rows, "ts_str string, service string, value double")
    df = df.select(F.to_timestamp("ts_str").alias("ts"), "service", "value")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _expected_by_window(spark, stream_input):
    batch = spark.read.parquet(stream_input)
    expected = {}
    for r in batch.withColumn("ws", F.date_trunc("hour", F.col("ts"))).collect():
        expected.setdefault((r.ws, r.service), []).append(r.value)
    return expected


def _collect_stream(stream_df, ckpt, transform=None, mode="append"):
    results = []

    def sink(batch_df, _id):
        out = transform(batch_df) if transform is not None else batch_df
        results.extend(out.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return results


def test_windowed_binned_plus_finalize_matches_kernel(spark, stream_input, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    binned = windowed_binned_counts(
        stream, "ts", ["service"], "value", window="1 hour", watermark="0 seconds"
    )
    results = _collect_stream(
        binned,
        str(tmp_path / "ck1"),
        transform=lambda b: finalize_window_sketches(b, ["service"]),
    )
    assert results
    expected = _expected_by_window(spark, stream_input)
    got = {(r.window_start, r.service): r.sketch for r in results}
    for key, blob in got.items():
        kernel = DDSketch(0.01).extend_array(np.array(expected[key]))
        s = DDSketch.decode(bytes(blob))
        assert s.count == kernel.count, key
        assert s.positive_bins == kernel.positive_bins, key
        assert s.zero_count == kernel.zero_count, key


def test_streaming_quantiles_from_binned_sink(spark, stream_input, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    binned = windowed_binned_counts(
        stream, "ts", ["service"], "value", window="1 hour", watermark="0 seconds"
    )
    results = _collect_stream(binned, str(tmp_path / "ck2"))
    assert results
    sink_df = spark.createDataFrame(
        results,
        "window_start timestamp, window_end timestamp, service string,"
        " sign int, bin int, cnt double",
    )
    rows = streaming_quantiles(sink_df, ["service"], quantiles=(0.5, 0.95)).collect()
    assert rows
    expected = _expected_by_window(spark, stream_input)
    for r in rows:
        key = (r.window_start, r.service)
        kernel = DDSketch(0.01).extend(expected[key])
        assert r["count"] == kernel.get_count(), key
        assert abs(r.p50 - kernel.quantile(0.5)) <= abs(kernel.quantile(0.5)) * 1e-9
        assert abs(r.p95 - kernel.quantile(0.95)) <= abs(kernel.quantile(0.95)) * 1e-9


def test_sessionized_sketches_state(spark, stream_input, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    sess = sessionized_sketches(stream, "service", "value")
    results = _collect_stream(sess, str(tmp_path / "ck3"), mode="update")
    assert results
    # last emitted row per key carries the full accumulated sketch
    final = {}
    for r in results:
        final[r.key] = r  # foreachBatch order: later batches overwrite
    batch = spark.read.parquet(stream_input)
    expected = {}
    for r in batch.collect():
        expected.setdefault(r.service, []).append(r.value)
    for key, row in final.items():
        kernel = DDSketch(0.01).extend_array(np.array(expected[key]))
        s = DDSketch.decode(bytes(row.sketch))
        assert s.count == kernel.count, key
        assert s.positive_bins == kernel.positive_bins, key


def test_sliding_windows_match_batch(spark, stream_input, tmp_path):
    """1-hour windows sliding every 30 minutes: every event lands in two
    windows; each emitted window's sketch must equal batch-sketching the
    rows whose ts falls inside it."""
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    binned = windowed_binned_counts(
        stream,
        "ts",
        ["service"],
        "value",
        window="1 hour",
        slide="30 minutes",
        watermark="0 seconds",
    )
    results = _collect_stream(
        binned,
        str(tmp_path / "ck_slide"),
        transform=lambda b: finalize_window_sketches(b, ["service"]),
        mode="update",
    )
    assert results
    batch = spark.read.parquet(stream_input).collect()
    got = {}
    for r in results:  # update mode: last emission per window wins
        got[(r.window_start, r.window_end, r.service)] = r.sketch
    # windows per event = 2 (1h window, 30min slide)
    starts = {ws for ws, _, _ in got}
    assert len(starts) >= 3
    for (ws, we, svc), blob in got.items():
        vals = [r.value for r in batch if r.service == svc and ws <= r.ts < we]
        kernel = DDSketch(0.01).extend(vals)
        s = DDSketch.decode(bytes(blob))
        assert s.count == kernel.count, (ws, we, svc)
        assert s.positive_bins == kernel.positive_bins, (ws, we, svc)


def test_sessionized_gap_stats_multibatch(spark, tmp_path):
    """Cross-micro-batch session state: two time-ordered files replayed one
    per batch must reproduce batch sessionization exactly (including a
    session that spans the batch boundary)."""
    import datetime as dt

    from duckdb_ddsketch_spark.operators.relational import sessionize
    from duckdb_ddsketch_spark.streaming import sessionized_gap_stats

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(k, minutes, eid):
        return (eid, k, t0 + dt.timedelta(minutes=minutes))

    early = [ev(1, 0, 1), ev(1, 10, 2), ev(2, 0, 3)]
    late = [ev(1, 20, 4), ev(1, 120, 5), ev(2, 200, 6), ev(3, 0, 7)]
    clean = early + late
    # r8 review: a NULL timestamp reached pandas as NaN (nullable long ->
    # float64) and int(NaN) KILLED the streaming query; malformed rows
    # must drop, not fail the job (and must not perturb the clean stats)
    late = late + [(8, 1, None), (9, None, t0)]
    schema = "event_id long, user_id long, ts timestamp"
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(early, schema).coalesce(1).write.mode("overwrite").parquet(src)
    import time as _time

    _time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    sess = sessionized_gap_stats(stream, "user_id", "ts", gap_seconds=1800, tiebreak="event_id")
    state = {}
    n_batches = []

    def sink(batch_df, bid):
        rows = batch_df.collect()
        if rows:
            n_batches.append(bid)
        for r in rows:
            state[r.key] = (r.n_sessions, r.n_events, r.max_session_events, r.total_dur_us)

    q = (
        sess.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(n_batches) >= 2, "expected one micro-batch per file"

    batch_df = spark.createDataFrame(clean, schema)
    s = sessionize(batch_df, ["user_id"], "ts", 1800, tiebreak="event_id")
    per = s.groupBy("user_id", "session_idx").agg(
        F.expr("count(*) AS n_events"),
        F.expr("max(unix_micros(ts)) - min(unix_micros(ts)) AS dur_us"),
    )
    expect = {
        r.user_id: (r.ns, r.ne, r.me, r.td)
        for r in per.groupBy("user_id")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS ns"),
            F.expr("CAST(sum(n_events) AS BIGINT) AS ne"),
            F.expr("CAST(max(n_events) AS BIGINT) AS me"),
            F.expr("CAST(sum(dur_us) AS BIGINT) AS td"),
        )
        .collect()
    }
    assert state == expect
    # user 1: events at 0/10/20 min are one session (gaps <= 30), 120 min is
    # a second; the 0-10-20 session SPANS the two files/batches
    assert state[1] == (2, 4, 3, 20 * 60 * 1_000_000)


def test_windowed_hll_registers_match_batch(spark, stream_input, tmp_path):
    """Streaming per-hour HLL registers, folded to estimates in the batch
    sink, must equal running batch hll_distinct over the same rows."""
    from duckdb_ddsketch_spark.operators.approx import hll_distinct, hll_estimate
    from duckdb_ddsketch_spark.streaming import windowed_hll_registers

    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    regs = windowed_hll_registers(
        stream, "ts", ["service"], "value", p=8,
        window="1 hour", watermark="0 seconds",
    )
    results = _collect_stream(
        regs,
        str(tmp_path / "ck_hll"),
        transform=lambda b: hll_estimate(
            b, ["window_start", "window_end", "service"], p=8
        ),
        mode="update",
    )
    assert results
    got = {}
    for r in results:  # update mode: last emission per group wins
        got[(r.window_start, r.service)] = r.approx_distinct
    batch = (
        spark.read.parquet(stream_input)
        .withColumn("ws", F.date_trunc("hour", F.col("ts")))
    )
    expected = {
        (r.ws, r.service): r.approx_distinct
        for r in hll_distinct(batch, ["ws", "service"], "value", p=8).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        # identical register math -> bit-identical estimates
        assert got[k] == expected[k], k


def test_windowed_value_counts_match_batch(spark, stream_input, tmp_path):
    """Streaming per-hour value counters must equal batch groupBy counts."""
    from duckdb_ddsketch_spark.streaming import windowed_value_counts

    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    counts = windowed_value_counts(
        stream, "ts", ["service"], "value",
        window="1 hour", watermark="0 seconds",
    )
    results = _collect_stream(counts, str(tmp_path / "ck_vc"), mode="update")
    assert results
    got = {}
    for r in results:  # update mode: last emission per counter wins
        got[(r.window_start, r.service, r.value)] = r.cnt
    batch = spark.read.parquet(stream_input).withColumn(
        "ws", F.date_trunc("hour", F.col("ts"))
    )
    expected = {
        (r.ws, r.service, r.value): r.cnt
        for r in batch.where(F.col("value").isNotNull())
        .groupBy("ws", "service", "value")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == expected


def test_rocksdb_state_store_matches_default(spark, stream_input, tmp_path):
    """scalable_state_conf(): the RocksDB provider changes where state lives,
    never the results — the windowed aggregate under RocksDB equals the
    batch kernel exactly."""
    from duckdb_ddsketch_spark.streaming import scalable_state_conf

    conf = scalable_state_conf()
    saved = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
        binned = windowed_binned_counts(
            stream, "ts", ["service"], "value",
            window="1 hour", watermark="0 seconds",
        )
        results = _collect_stream(
            binned,
            str(tmp_path / "ck_rocks"),
            transform=lambda b: finalize_window_sketches(b, ["service"]),
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert results
    expected = _expected_by_window(spark, stream_input)
    for r in results:
        kernel = DDSketch(0.01).extend_array(
            np.array(expected[(r.window_start, r.service)])
        )
        s = DDSketch.decode(bytes(r.sketch))
        assert s.count == kernel.count
        assert s.positive_bins == kernel.positive_bins


def test_streaming_first_seen_dedup_cross_batch(spark, tmp_path):
    """First-occurrence dedup across micro-batches: duplicates inside the
    watermark horizon are dropped whether they arrive in the same batch or
    a later one; normalized-text duplicates collapse like batch
    exact_dedup."""
    from duckdb_ddsketch_spark.streaming import streaming_first_seen

    import time as _time

    src = str(tmp_path / "dedup_in")
    schema = "ts timestamp, doc_id long, text string"

    def write_file(mode, rows):
        df = spark.createDataFrame(
            rows, "ts_str string, doc_id long, text string"
        ).select(F.to_timestamp("ts_str").alias("ts"), "doc_id", "text")
        df.coalesce(1).write.mode(mode).parquet(src)

    # batch 0: A, B, and an in-batch near-duplicate of A (case/space drift)
    write_file(
        "overwrite",
        [
            ("2024-03-01 10:00:00", 1, "Alpha  doc"),
            ("2024-03-01 10:00:10", 2, "beta doc"),
            ("2024-03-01 10:00:20", 3, "alpha doc"),
        ],
    )
    _time.sleep(1.1)  # file-source ordering is by modification time
    # batch 1: cross-batch duplicate of B plus a new doc C
    write_file(
        "append",
        [
            ("2024-03-01 10:01:00", 4, "BETA   DOC"),
            ("2024-03-01 10:01:10", 5, "gamma doc"),
        ],
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_first_seen(
        stream, "ts", text="text", watermark="1 hour"
    )
    results = _collect_stream(out, str(tmp_path / "ck_dedup"))

    # one row per distinct normalized text, first occurrence wins
    emitted_ids = sorted(r.doc_id for r in results)
    assert emitted_ids == [1, 2, 5]
    # the internal digest column does not leak into the output
    assert sorted(results[0].asDict()) == ["doc_id", "text", "ts"]

    # key-based variant: same machinery keyed on doc_id, no digest
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out2 = streaming_first_seen(stream2, "ts", keys=["doc_id"], watermark="1 hour")
    results2 = _collect_stream(out2, str(tmp_path / "ck_dedup2"))
    assert sorted(r.doc_id for r in results2) == [1, 2, 3, 4, 5]


def test_streaming_append_to_partitioned_store_rollup(spark, stream_input, tmp_path):
    """The production pipeline end to end: append-mode streaming windows ->
    finalize inside foreachBatch -> day-partitioned sketch store on disk ->
    blob rollup from the store equals direct batch sketching. Watermark 0
    closes each hourly window as soon as a later one appears; the final
    (never-closed) windows are the documented append-mode remainder, so the
    comparison covers exactly the windows the stream emitted."""
    from duckdb_ddsketch_spark.functions import scalar as fs
    from duckdb_ddsketch_spark.functions.aggregate import merge_sketches_native
    from duckdb_ddsketch_spark.sources import write_sketch_table

    store = str(tmp_path / "stream_store")
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    binned = windowed_binned_counts(
        stream, "ts", ["service"], "value", window="1 hour", watermark="0 seconds"
    )

    def to_store(batch_df, _id):
        closed = finalize_window_sketches(batch_df, ["service"]).withColumn(
            "day", F.date_format(F.col("window_start"), "yyyy-MM-dd")
        )
        write_sketch_table(closed, store, partition_by=["day"], mode="append")

    q = (
        binned.writeStream.foreachBatch(to_store)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_store"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    stored = spark.read.parquet(store)
    emitted = {
        (r.window_start, r.service) for r in stored.select(
            "window_start", "service"
        ).collect()
    }
    assert emitted, "no windows were closed by the stream"

    # roll the stored blobs up per service on the native merge path and
    # compare against direct kernel sketching of the same emitted windows
    rolled = merge_sketches_native(stored, ["service"], "sketch")
    got = {
        r.service: (r.c, r.p95)
        for r in rolled.select(
            "service",
            fs.ddsketch_count(F.col("sketch")).alias("c"),
            fs.ddsketch_quantile(F.col("sketch"), F.lit(0.95)).alias("p95"),
        ).collect()
    }
    expected = _expected_by_window(spark, stream_input)
    per_service = {}
    for (ws, svc), vals in expected.items():
        if (ws, svc) in emitted:
            per_service.setdefault(svc, []).extend(vals)
    for svc, vals in per_service.items():
        kernel = DDSketch(0.01).extend(vals)
        assert got[svc][0] == kernel.get_count(), svc
        p95 = kernel.quantile(0.95)
        assert abs(got[svc][1] - p95) <= abs(p95) * 1e-9, svc


def test_scalable_state_conf_composes_with_all_stateful_operators(
    spark, stream_input, tmp_path
):
    """VERDICT r6 #5: RocksDB is the documented posture for stateful
    streaming at scale (the on-heap provider sits on the OOM edge at 10x
    key cardinality — SCALING.md state-store probe), so every stateful
    operator must run unchanged under ``scalable_state_conf()`` and
    produce exactly the default-provider results: the provider moves
    where state lives, never semantics. windowed_binned_counts is pinned
    the same way by test_rocksdb_state_store_matches_default."""
    import time as _time

    from duckdb_ddsketch_spark.streaming import (
        scalable_state_conf,
        sessionized_gap_stats,
        streaming_first_seen,
        streaming_gram,
        windowed_hll_registers,
        windowed_value_counts,
    )

    # gap-stats needs per-key time-ordered replay: its own 2-file source,
    # one file per micro-batch (file-source ordering is by mtime)
    gap_src = str(tmp_path / "gap_src")
    gschema = "event_id long, user_id long, ts timestamp"
    rows1 = [(1, 1, "2024-01-01 00:00:00"), (2, 1, "2024-01-01 00:10:00"),
             (3, 2, "2024-01-01 00:00:00")]
    rows2 = [(4, 1, "2024-01-01 00:20:00"), (5, 1, "2024-01-01 02:00:00"),
             (6, 2, "2024-01-01 03:20:00"), (7, 3, "2024-01-01 00:00:00")]
    for mode, rows in (("overwrite", rows1), ("append", rows2)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_str string"
        ).select(
            "event_id", "user_id", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.mode(mode).parquet(gap_src)
        _time.sleep(1.1)

    def mk_stream():
        return spark.readStream.schema(SCHEMA).parquet(stream_input)

    def mk_gap_stream():
        return (
            spark.readStream.schema(gschema)
            .option("maxFilesPerTrigger", "1")
            .parquet(gap_src)
        )

    ops = {
        "sessionized_sketches": (
            lambda: sessionized_sketches(mk_stream(), "service", "value"),
            "update",
        ),
        "sessionized_gap_stats": (
            lambda: sessionized_gap_stats(
                mk_gap_stream(), "user_id", "ts",
                gap_seconds=1800, tiebreak="event_id",
            ),
            "update",
        ),
        "windowed_hll_registers": (
            lambda: windowed_hll_registers(
                mk_stream(), "ts", ["service"], "value",
                window="1 hour", watermark="0 seconds",
            ),
            "update",
        ),
        "windowed_value_counts": (
            lambda: windowed_value_counts(
                mk_stream(), "ts", ["service"], "value",
                window="1 hour", watermark="0 seconds",
            ),
            "update",
        ),
        "streaming_first_seen": (
            lambda: streaming_first_seen(
                mk_stream(), "ts", keys=["service"], watermark="1 hour"
            ),
            "append",
        ),
        "streaming_gram": (
            lambda: streaming_gram(
                mk_stream().select(
                    F.array(
                        F.col("value"), F.col("value") * 2
                    ).alias("embedding")
                ),
                dims=2,
            ),
            "update",
        ),
    }

    def run_all(tag):
        out = {}
        for name, (build, mode) in ops.items():
            rows = _collect_stream(
                build(), str(tmp_path / f"ck_{tag}_{name}"), mode=mode
            )
            out[name] = sorted(str(r) for r in rows)
        return out

    base = run_all("default")
    assert all(base.values()), {k: len(v) for k, v in base.items()}

    conf = scalable_state_conf()
    saved = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        rocks = run_all("rocks")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert rocks == base


def test_streaming_gram_matches_batch(spark, tmp_path):
    """The running Gram monitor's drained state must equal the batch
    gram_matrix over the same rows — exact in integer mode, and the
    augmented float mode must reproduce mean/covariance."""
    import numpy as np

    from duckdb_ddsketch_spark.operators import decomposition as dec
    from duckdb_ddsketch_spark.streaming import streaming_gram

    rng = np.random.default_rng(5)
    d = 4
    src = str(tmp_path / "gram_src")
    # three files -> three micro-batches (maxFilesPerTrigger=1)
    all_rows = []
    for b in range(3):
        rows = [
            (int(b * 100 + i),
             [int(x) for x in rng.integers(-127, 128, size=d)])
            for i in range(50)
        ]
        all_rows += rows
        spark.createDataFrame(
            rows, "vec_id long, qcodes array<int>"
        ).write.mode("append" if b else "overwrite").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, qcodes array<int>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    g = streaming_gram(stream, "qcodes", dims=d, integer=True)
    results = _collect_stream(g, str(tmp_path / "ck_gram"), mode="update")
    got = {}
    for r in results:  # update mode: last emission per cell wins
        got[(r.i, r.j)] = r.g
    batch_df = spark.createDataFrame(all_rows, "vec_id long, qcodes array<int>")
    expected = {
        (r.i, r.j): r.g
        for r in dec.gram_matrix(batch_df, "qcodes", dims=d, integer=True).collect()
    }
    assert got == expected and len(got) == d * d

    # augmented float mode: derive mean + covariance from the drained state
    fl = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in all_rows],
        "vec_id long, embedding array<double>",
    )
    fl.write.mode("overwrite").parquet(src + "_f")
    stream_f = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "_f")
    )
    ga = streaming_gram(stream_f, "embedding", dims=d, augment=True)
    res = _collect_stream(ga, str(tmp_path / "ck_gram_f"), mode="update")
    G = np.zeros((d + 1, d + 1))
    for r in res:
        G[r.i, r.j] = r.g
    n = G[d, d]
    mean = G[d, :d] / n
    cov = (G[:d, :d] - n * np.outer(mean, mean)) / (n - 1)
    X = np.array([v for _, v in all_rows], dtype=np.float64)
    assert n == len(all_rows)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(X, rowvar=False, ddof=1), rtol=1e-9)


def test_streaming_gram_validation(spark, tmp_path):
    from duckdb_ddsketch_spark.streaming import streaming_gram

    stream = (
        spark.readStream.schema("vec_id long, qcodes array<int>")
        .parquet(str(tmp_path))
    )
    with pytest.raises(ValueError, match="dims > 0"):
        streaming_gram(stream, "qcodes")
    with pytest.raises(ValueError, match="integer=False"):
        streaming_gram(stream, "qcodes", dims=4, integer=True, augment=True)


def test_percentile_lookup_stream_static_matches_batch(spark, tmp_path):
    """percentile_lookup is a stream-static join: scoring a live stream
    against a prebuilt percentile_bins calibration must yield exactly
    the batch ranks for the same rows (calibrate once, score forever)."""
    from duckdb_ddsketch_spark.operators import native

    calib_rows = [
        ("a", float(v)) for v in (1, 2, 2, 5, 50, -3, 0)
    ] + [("b", float(v)) for v in (10, 10, 20, -1)]
    calib = spark.createDataFrame(calib_rows, "grp string, v double")
    bins = native.percentile_bins(calib, "v", ["grp"], alpha=0.02)

    src = str(tmp_path / "pct_src")
    score_rows = [
        (0, "a", 2.0), (1, "a", 50.0), (2, "a", -3.0), (3, "a", 0.0),
        (4, "b", 10.0), (5, "b", 999.0),  # bin absent -> NULL rank
        (6, "b", None),
    ]
    spark.createDataFrame(
        score_rows, "i long, grp string, v double"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("i long, grp string, v double").parquet(src)
    ranked = native.percentile_lookup(stream, bins, "v", ["grp"], alpha=0.02)
    got = {
        r.i: r.pct_rank
        for r in _collect_stream(ranked, str(tmp_path / "ck_pct"))
    }

    batch = spark.createDataFrame(score_rows, "i long, grp string, v double")
    expected = {
        r.i: r.pct_rank
        for r in native.percentile_lookup(
            batch, bins, "v", ["grp"], alpha=0.02
        ).collect()
    }
    assert got == expected and len(got) == len(score_rows)
    assert got[1] == 1.0          # group max ranks 1.0
    assert got[5] is None         # unseen bin -> NULL
    assert got[6] is None         # NULL value -> NULL


def test_streaming_neardup_lsh_gate(spark, tmp_path):
    """Streaming MinHash-band near-dup gate, deterministic by construction
    (every collision is CROSS-batch, so first-seen band state has a unique
    arrival order): novel docs pass with all bands new; a near-dup of an
    earlier doc is flagged is_novel=false with n_new_bands < bands; an
    exact repeat loses every band and produces no output row at all."""
    import time as _time

    from duckdb_ddsketch_spark.streaming import streaming_neardup_lsh

    src = str(tmp_path / "neardup_in")
    schema = "doc_id bigint, text string, ts timestamp"

    def write_file(mode, rows):
        spark.createDataFrame(rows, "doc_id long, text string, ts_str string") \
            .select("doc_id", "text", F.to_timestamp("ts_str").alias("ts")) \
            .coalesce(1).write.mode(mode).parquet(src)

    t_a = "the quick brown fox jumps over the lazy dog again and again today"
    t_b = "completely different text about spark structured streaming state stores"
    # batch 0: two originals (no shared shingles)
    write_file("overwrite", [
        (1, t_a, "2024-03-01 10:00:00"),
        (2, t_b, "2024-03-01 10:00:10"),
    ])
    _time.sleep(1.1)  # file-source ordering is by modification time
    # batch 1 (later window): near-dup of doc 1, exact repeat of doc 2,
    # and a genuinely novel doc
    write_file("append", [
        (3, t_a.replace("today", "tonight"), "2024-03-01 12:00:00"),
        (4, t_b, "2024-03-01 12:00:10"),
        (5, "yet another entirely unrelated document concerning parquet and arrow",
         "2024-03-01 12:00:20"),
    ])
    _time.sleep(1.1)
    # batch 2: watermark-advancing sentinel (its own window never closes;
    # nothing is asserted about it)
    write_file("append", [(99, "sentinel text far in the future", "2024-03-02 09:00:00")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_neardup_lsh(
        stream, "ts", text="text", id_col="doc_id",
        num_hashes=16, bands=4, watermark="10 minutes", window="1 hour",
    )
    rows = _collect_stream(out, str(tmp_path / "ck_neardup"))
    got = {r.doc_id: (r.n_new_bands, r.is_novel) for r in rows}

    assert got[1] == (4, True)
    assert got[2] == (4, True)
    assert got[5] == (4, True)
    # near-dup: at least one band collides with doc 1, not all of them
    assert got[3][1] is False and 0 < got[3][0] < 4
    # exact repeat: every band already seen -> dropped wholesale
    assert 4 not in got
    assert 99 not in got  # sentinel window never closed
    assert sorted(rows[0].asDict()) == [
        "doc_id", "is_novel", "n_new_bands", "window_end", "window_start",
    ]


def test_streaming_neardup_shingleless_always_novel(spark, tmp_path):
    """Shingle-less docs (NULL text / fewer than ngram tokens) carry no
    MinHash information and must NEVER be gated — the batch pipeline
    (minhash_signatures_df) never emits them, so batch LSH never calls
    them candidates. They bypass the band state with per-arrival sentinel
    bands: every degenerate doc comes out is_novel=true, including a
    later one arriving after an earlier degenerate doc (before the fix
    they all shared md5('') bands and the second was dropped wholesale),
    and they spend no band state that could gate a REAL doc."""
    import time as _time

    from duckdb_ddsketch_spark.streaming import streaming_neardup_lsh

    src = str(tmp_path / "neardup_empty_in")
    schema = "doc_id bigint, text string, ts timestamp"

    def write_file(mode, rows):
        spark.createDataFrame(rows, "doc_id long, text string, ts_str string") \
            .select("doc_id", "text", F.to_timestamp("ts_str").alias("ts")) \
            .coalesce(1).write.mode(mode).parquet(src)

    # batch 0: a NULL-text doc, a one-token doc (< ngram=2), and a real doc
    write_file("overwrite", [
        (1, None, "2024-03-01 10:00:00"),
        (2, "solitary", "2024-03-01 10:00:10"),
        (3, "a genuinely real document with plenty of shingled tokens inside",
         "2024-03-01 10:00:20"),
    ])
    _time.sleep(1.1)
    # batch 1 (later window): MORE degenerate docs — one NULL, one empty
    # string, one single-token — all must still be novel. Docs 4 and 5
    # arrive REPEATEDLY within the window (4 twice at different times, 5
    # as an identical-ts retry): each arrival emits `bands` sentinel
    # rows, so a plain count(*) would read 2*bands for the (window, id)
    # group and flip the always-novel contract to FALSE with an
    # out-of-domain band count (round-12 advisor fix: sentinel rows are
    # excluded from the count and a pure-sentinel group reads bands)
    write_file("append", [
        (4, None, "2024-03-01 12:00:00"),
        (4, None, "2024-03-01 12:00:30"),
        (5, "", "2024-03-01 12:00:10"),
        (5, "", "2024-03-01 12:00:10"),
        (6, "word", "2024-03-01 12:00:20"),
    ])
    _time.sleep(1.1)
    # batch 2: watermark-advancing sentinel
    write_file("append", [(99, "sentinel text far in the future", "2024-03-02 09:00:00")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_neardup_lsh(
        stream, "ts", text="text", id_col="doc_id",
        num_hashes=16, bands=4, watermark="10 minutes", window="1 hour",
    )
    rows = _collect_stream(out, str(tmp_path / "ck_neardup_empty"))
    got = {r.doc_id: (r.n_new_bands, r.is_novel) for r in rows}

    # every degenerate doc passes through as novel, across both batches
    for doc in (1, 2, 4, 5, 6):
        assert got[doc] == (4, True), (doc, got.get(doc))
    assert got[3] == (4, True)
    assert 99 not in got  # sentinel window never closed


def test_streaming_neardup_bands_validation(spark, tmp_path):
    from duckdb_ddsketch_spark.streaming import streaming_neardup_bands

    src = str(tmp_path / "neardup_val")
    spark.createDataFrame(
        [(1, "a b c", "2024-03-01 10:00:00")],
        "doc_id long, text string, ts_str string",
    ).select("doc_id", "text", F.to_timestamp("ts_str").alias("ts")) \
        .write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, text string, ts timestamp"
    ).parquet(src)
    with pytest.raises(ValueError, match="must divide"):
        streaming_neardup_bands(stream, "ts", num_hashes=16, bands=5)
