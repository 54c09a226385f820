"""bench.py machinery smoke test at tiny N.

A broken bench.py costs a whole round of BENCH numbers (the driver runs it
unattended), so every family — Spark side and DuckDB mirror — must at
least execute end-to-end. Constants are patched down so the entire sweep
runs in ~a minute; timings are discarded.
"""

import importlib
import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def bench_small(tmp_path_factory):
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    saved = {
        k: getattr(bench, k)
        for k in (
            "N_60M",
            "N_ASOF_L",
            "N_ASOF_R",
            "N_MINHASH",
            "MINHASH_D",
            "N_BITMAP_USERS",
            "N_ANN_CORPUS",
            "N_ANN_Q",
            "N_KM_WIDE",
            "N_GRAM",
            "N_TEXT",
            "N_TEXT_D",
            "N_PACK",
            "SESS_USERS",
            "FUNNEL_USERS",
            "STREAM_SRC",
            "N_SPAN",
            "SPAN_POOL",
        )
    }
    bench.N_60M = 50_000
    bench.N_ASOF_L, bench.N_ASOF_R = 45_000, 5_000
    bench.N_MINHASH = 4_000
    bench.MINHASH_D = 3_600
    bench.N_BITMAP_USERS = 5_000
    bench.N_ANN_CORPUS, bench.N_ANN_Q = 5_000, 8
    bench.N_KM_WIDE = 10_000
    bench.N_GRAM = 10_000
    bench.N_TEXT, bench.N_TEXT_D = 20_000, 500
    bench.N_PACK = 20_000
    bench.SESS_USERS = 1_000
    bench.FUNNEL_USERS = 1_999  # coprime with 5 event types, like the real value
    bench.STREAM_SRC = str(tmp_path_factory.mktemp("bench_stream"))
    bench.N_SPAN, bench.SPAN_POOL = 10_000, 50  # ~200 docs/block, like real
    yield bench
    for k, v in saved.items():
        setattr(bench, k, v)


def test_family_names_continuity_r5(bench_small):
    """Round-over-round comparability pin (round-5 verdict item 8):
    every family key from the official BENCH_r05 run must keep its name —
    a rename would silently break cross-round BENCH_r{N} comparisons and
    the refresh_docs.py doc tables. Adding NEW families is fine."""
    assert len(bench_small.R5_FAMILY_NAMES) == 14
    # the DuckDB mirror registry must also cover every r5 family
    assert bench_small.R5_FAMILY_NAMES <= set(bench_small._duckdb_family_sqls())


def test_all_spark_families_execute(spark, bench_small):
    result = {}
    bench_small.run_spark_families(spark, result)
    fam = result["spark_families_60m_sec"]
    # superset-of-r5 is the continuity contract; exact equality with the
    # current registry catches accidental drops of newer families too
    assert bench_small.R5_FAMILY_NAMES <= set(fam)
    assert set(fam) == bench_small.R5_FAMILY_NAMES | {
        "ann_quantized_2m_x128",  # round 6
        "kmeans_15m_d64",  # round 7: wide-dims BLAS-routed k-means
        "gram_2m_x64",  # round 7: PCA Gram stats pass, exact int codes
        "pctrank_60m",  # round 7: percentile-rank score normalization
        "qnorm_60m",  # round 8: quantile normalization (CDF inversion)
        "span_extents_2m",  # round 9: substring-level dedup extents
        "bm25_15m",  # round 9: BM25 retrieval scoring over the text corpus
        "ann_pq_2m_x128",  # round 10: PQ/ADC compressed-domain ANN
        "vocab_tok_15m",  # round 11: greedy vocab tokenization, bulk kernel
    }
    assert all(t >= 0 for t in fam.values())


def test_all_duckdb_family_mirrors_execute(bench_small):
    bench_small._ensure_stream_src()
    con = duckdb.connect()
    try:
        for name, sql in bench_small._duckdb_family_sqls().items():
            if callable(sql):
                sql(con)
            else:
                con.execute(sql).fetchall()
    finally:
        con.close()


def test_headline_oracles_resolve(bench_small):
    from duckdb_ddsketch_spark.plans import declared

    for name in bench_small.HEADLINE:
        assert name in declared.STAGED_QUERIES
        assert name in declared.STAGED_ORACLES


def test_sessionize_and_pack_mirrors_agree(spark, bench_small):
    """The two window-family mirrors must compute the SAME summary values
    as the Spark operators at small N — a mirror that merely executes can
    still silently measure a different workload (the round-4 strlen/length
    lesson)."""
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import relational, sampling

    b = bench_small
    con = duckdb.connect()
    try:
        mirrors = b._duckdb_family_sqls()

        # sessionize
        df = spark.range(b.N_60M).selectExpr(
            "id",
            f"id % {b.SESS_USERS} AS user",
            f"timestamp_seconds({b.SESS_TS}) AS ts",
        )
        sess = relational.sessionize(
            df, ["user"], ts="ts", gap_seconds=b.SESS_GAP_S, tiebreak="id"
        )
        srow = (
            sess.groupBy("user")
            .agg((F.max("session_idx") + 1).alias("ns"))
            .agg(F.count(F.lit(1)), F.sum("ns"))
            .collect()[0]
        )
        drow = con.execute(mirrors["sessionize_60m"]).fetchall()[0]
        assert (int(srow[0]), int(srow[1])) == (int(drow[0]), int(drow[1]))

        # pack manifest
        docs = spark.range(b.N_PACK).selectExpr(
            "id AS doc_id",
            f"id % {b.PACK_SHARDS} AS shard",
            f"{b.PACK_TOK.replace('id', 'doc_id')} AS tokens",
        )
        man = sampling.pack_manifest(
            docs, "tokens", b.PACK_BUDGET, keys=["shard"], order_col="doc_id"
        )
        srow = man.agg(
            F.count(F.lit(1)), F.sum("n_docs"), F.sum("token_sum"),
            F.max("token_sum"),
        ).collect()[0]
        drow = con.execute(mirrors["pack_manifest_15m"]).fetchall()[0]
        assert tuple(int(x) for x in srow) == tuple(int(x) for x in drow)

        # funnel
        from duckdb_ddsketch_spark.operators import analytics

        ev = spark.range(b.N_60M).selectExpr(
            f"id % {b.FUNNEL_USERS} AS user",
            f"{b.FUNNEL_TS} AS ts",
            f"{b.FUNNEL_ET} AS e",
        )
        cur = analytics.funnel(
            ev, "user", "ts",
            [F.col("e") == 0, F.col("e") == 1, F.col("e") == 2],
        )
        srow = cur.agg(
            F.count(F.lit(1)), F.count("step_2"), F.count("step_3"),
            F.sum("step_3"),
        ).collect()[0]
        drow = con.execute(mirrors["funnel_60m"]).fetchall()[0]
        norm = lambda row: tuple(int(x) if x is not None else 0 for x in row)
        assert norm(srow) == norm(drow)

        # quantized ANN: the full top-k row set is exact integers on both
        # engines — compare it verbatim, no tolerance
        from duckdb_ddsketch_spark.operators import similarity

        vec = "array(" + ", ".join(
            f"CAST(((id * {p}) % 1024) / 64.0 + 0.5 AS DOUBLE)"
            for p in b.ANN_PRIMES
        ) + ")"
        corpus = spark.range(b.N_ANN_CORPUS).selectExpr(
            "id AS vec_id", f"{vec} AS embedding"
        )
        qs = spark.range(b.N_ANN_Q).selectExpr(
            "id AS vec_id", f"{vec} AS embedding"
        )
        scale = similarity.quantize_calibration(corpus, bits=8)
        qc = similarity.quantize_embeddings(corpus, scale, bits=8)
        qq = similarity.quantize_embeddings(qs, scale, bits=8)
        srows = sorted(
            (r.query_id, r.neighbor_id, r.qdot)
            for r in similarity.quantized_topk_blas(
                qc, qq, k=b.ANN_K, max_query_rows=b.N_ANN_Q
            ).collect()
        )
        drows = sorted(
            (int(a), int(c_), int(d))
            for a, c_, d in con.execute(
                mirrors["ann_quantized_2m_x128"]
            ).fetchall()
        )
        assert srows == drows and len(srows) == b.N_ANN_Q * b.ANN_K
    finally:
        con.close()


def test_raw_run_spread_recorded(bench_small):
    """Round-6 verdict item 2: best-of point estimates alone make ±5-10%
    shared-runner noise indistinguishable from regression — every timed
    point must also record its raw repetition times under a stable
    `<side>:<name>` key for the `raw_runs_sec` JSON section."""
    bench_small._RAW_RUNS.clear()
    calls = []
    assert bench_small._best3(lambda: calls.append(1), key="spark:qx") >= 0
    assert len(calls) == 3
    assert len(bench_small._RAW_RUNS["spark:qx"]) == 3
    # multi-pass scheduler: a cheap in-band family (ref < pass-3 cutoff)
    # gets 3 spread reps, ALL recorded, min quoted
    result: dict = {}
    fams = bench_small._run_family_passes(
        [("hll_distinct", lambda: None, None)], "spark", result
    )
    assert len(bench_small._RAW_RUNS["spark_fam:hll_distinct"]) == 3
    assert fams["hll_distinct"] == min(
        bench_small._RAW_RUNS["spark_fam:hll_distinct"]
    )
    # a 0-second run sits far inside the band -> no load-suspect notes
    assert result.get("family_band_notes", []) == []
    # key-less timing (warm-ups, one-shots) records nothing
    bench_small._timed(lambda: None)
    assert set(bench_small._RAW_RUNS) == {"spark:qx", "spark_fam:hll_distinct"}
    bench_small._RAW_RUNS.clear()


def test_family_passes_protocol(bench_small):
    """Round-9 protocol (VERDICT r8 items 1/3): spread reps with rotated
    order, deterministic band-based pass membership, setup-before-first-rep,
    and the band-retry note for load-suspect cells."""
    b = bench_small
    b._RAW_RUNS.clear()
    seq = []

    def mk(name):
        return lambda: seq.append(name)

    setup_calls = []
    entries = [
        ("hll_distinct", mk("hll_distinct"), None),             # ref 5.77
        ("streaming_windows", mk("streaming_windows"),
         lambda: setup_calls.append("sw")),                      # ref 6.23
        ("kmeans_15m_d64", mk("kmeans_15m_d64"), None),          # ref 32.5
    ]
    result: dict = {}
    fams = b._run_family_passes(entries, "spark", result)
    # setup ran exactly once, despite 3 timed reps of the family
    assert setup_calls == ["sw"]
    # pass 1 canonical order; pass 2 reversed (all refs < 60); pass 3
    # rotated, cheap families only (wide k-means ref 32.5 >= 15 cutoff)
    assert seq == [
        "hll_distinct", "streaming_windows", "kmeans_15m_d64",   # pass 1
        "kmeans_15m_d64", "streaming_windows", "hll_distinct",   # pass 2 rev
        "streaming_windows", "hll_distinct",                     # pass 3 rot
    ]
    assert set(fams) == {n for n, _, _ in entries}
    assert result.get("family_band_notes", []) == []
    # band retry: monkey-make a family whose reps all exceed band*tol —
    # simulate with a fake band on a synthetic family via FRESH_BANDS
    b.FRESH_BANDS["__fake_fam__"] = {"spark": -1.0}  # any time > limit
    try:
        calls = []
        result2: dict = {}
        b._run_family_passes(
            [("__fake_fam__", lambda: calls.append(1), None)], "spark", result2
        )
        notes = result2["family_band_notes"]
        assert len(notes) == 1 and notes[0]["family"] == "__fake_fam__"
        assert notes[0]["status"] == "load_suspect"
        # runs_sec in the note carries every rep (3 passes + the retry)
        assert len(notes[0]["runs_sec"]) == len(calls) == 4
    finally:
        del b.FRESH_BANDS["__fake_fam__"]
    b._RAW_RUNS.clear()


def test_emit_final_line_is_compact_summary(bench_small, capsys, tmp_path, monkeypatch):
    """Round-7 verdict item 1: the driver parses the LAST stdout line with a
    bounded tail capture, so the final line must be the compact summary
    (no raw_runs_sec — that key made the r7 record unparseable); raw runs
    travel on an earlier line and in a sidecar file."""
    import json as _json

    monkeypatch.setattr(bench_small, "__file__", str(tmp_path / "bench.py"))
    bench_small._RAW_RUNS.clear()
    bench_small._RAW_RUNS["spark:qx"] = [0.5, 0.4]
    result = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "raw_runs_sec": {"stale": []},
        # round 9: the verbose protocol evidence must leave the final line
        "family_band_notes": [
            {"family": "f1", "engine": "duckdb", "band_ref_sec": 1.0,
             "runs_sec": [3.0, 1.1], "status": "cleared_by_retry"},
            {"family": "f2", "engine": "spark", "band_ref_sec": 1.0,
             "runs_sec": [3.0, 3.1], "status": "load_suspect"},
        ],
        "duckdb_oracle": {"q01": 0.1, "q02": 0.25},
    }
    bench_small._emit(result)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    raw_line, summary_line = (_json.loads(ln) for ln in lines)
    assert raw_line["raw_runs_sec"] == {"spark:qx": [0.5, 0.4]}
    # full notes + per-query oracle dict ride the raw line / sidecar
    assert [n["family"] for n in raw_line["family_band_notes"]] == ["f1", "f2"]
    assert raw_line["duckdb_oracle"] == {"q01": 0.1, "q02": 0.25}
    assert "raw_runs_sec" not in summary_line
    assert "family_band_notes" not in summary_line
    assert "duckdb_oracle" not in summary_line
    # ...while the final line keeps the quoted forms: total + suspects only
    assert summary_line["duckdb_oracle_total"] == 0.35
    assert summary_line["load_suspect"] == ["f2"]
    assert summary_line["metric"] == "headline_queries_total"
    sidecar = _json.loads((tmp_path / "bench_raw_runs.json").read_text())
    assert sidecar == raw_line
    bench_small._RAW_RUNS.clear()


def test_emit_final_line_fits_capture_budget(bench_small, capsys, tmp_path, monkeypatch):
    """Round-9: the driver's tail capture held ~2000 chars across rounds
    and the r8 19-family line was 1887 B — one family from truncation.
    A realistic 20-family record (both engines, headline, native, oracle
    total, a couple of suspects) must emit a final line under the budget,
    or the next family addition silently loses the round's record."""
    import json as _json

    monkeypatch.setattr(bench_small, "__file__", str(tmp_path / "bench.py"))
    bench_small._RAW_RUNS.clear()
    fams = list(bench_small.FAMILY_PASS1_ORDER)
    assert len(fams) == 23
    result = {
        "duckdb_oracle": {f"q{i:02d}_some_headline_query_name": 0.123 for i in range(9)},
        "duckdb_60m_sec": 24.567,
        "duckdb_families_60m_sec": {f: 123.456 for f in fams},
        "metric": "headline_queries_total",
        "value": 5.018,
        "unit": "sec",
        "queries": {f"q{i:02d}_some_headline_query_name": 0.891 for i in range(9)},
        "sf": 0.1,
        "native_sketch_rows_per_sec": 43821234,
        "native_sketch_60m_sec": 1.369,
        "spark_families_60m_sec": {f: 51.871 for f in fams},
        "family_band_notes": [
            {"family": fams[0], "engine": "duckdb", "band_ref_sec": 59.1,
             "runs_sec": [124.7, 70.9], "status": "cleared_by_retry"},
            {"family": fams[1], "engine": "spark", "band_ref_sec": 3.4,
             "runs_sec": [7.7, 8.2, 6.7, 6.7], "status": "load_suspect"},
            {"family": fams[2], "engine": "spark", "band_ref_sec": 2.4,
             "runs_sec": [6.1, 6.0, 5.9, 5.8], "status": "load_suspect"},
        ],
    }
    bench_small._emit(result)
    final = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(final) <= bench_small.FINAL_LINE_BUDGET, len(final)
    assert _json.loads(final)["load_suspect"] == [fams[1], fams[2]]
    bench_small._RAW_RUNS.clear()


def test_gram_mirror_agrees(spark, bench_small):
    """The gram family's DuckDB flat-aggregate mirror must produce the
    SAME 4096 exact integers as the Spark gram_matrix route at small N
    (different output shapes: 4096 one-row columns vs 4096 rows)."""
    from duckdb_ddsketch_spark.operators import decomposition as dec

    b = bench_small
    con = duckdb.connect()
    try:
        drow = b._duckdb_family_sqls()["gram_2m_x64"](con)[0]
        codes = "array(" + ", ".join(
            f"CAST((id * {3 + 7 * d}) % 255 - 127 AS INT)"
            for d in range(b.GRAM_D)
        ) + ")"
        df = spark.range(b.N_GRAM).selectExpr("id AS vec_id", f"{codes} AS qcodes")
        g = {
            (r.i, r.j): r.g
            for r in dec.gram_matrix(df, "qcodes", dims=b.GRAM_D, integer=True).collect()
        }
        assert len(g) == b.GRAM_D * b.GRAM_D
        for idx, (i, j) in enumerate(
            (i, j) for i in range(b.GRAM_D) for j in range(b.GRAM_D)
        ):
            assert g[(i, j)] == drow[idx], (i, j)
    finally:
        con.close()


def test_pctrank_mirror_agrees(spark, bench_small):
    """The pctrank mirror must compute the SAME (n_ranked, mean_pct) as
    the Spark operator at small N (the round-4 silently-different-
    workload lesson); mean is a float reduction, compared to 1e-9 rel."""
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import native

    b = bench_small
    con = duckdb.connect()
    try:
        df = spark.range(b.N_60M).selectExpr(
            "id % 25 AS grp", f"{b.PCT_V} / 32.0D AS v"
        )
        srow = (
            native.percentile_rank(df, "v", ["grp"])
            .agg(
                F.count("pct_rank").alias("n_ranked"),
                F.avg("pct_rank").alias("mean_pct"),
            )
            .collect()[0]
        )
        drow = con.execute(
            b._duckdb_family_sqls()["pctrank_60m"]
        ).fetchall()[0]
        assert int(srow[0]) == int(drow[0]) == b.N_60M
        assert abs(srow[1] - drow[1]) <= 1e-9 * abs(drow[1])
    finally:
        con.close()


def test_qnorm_mirror_agrees(spark, bench_small):
    """The qnorm mirror must compute the SAME (n_mapped, mean_qn) as the
    Spark operator at small N. Per-row qn values are bit-identical
    cross-engine (q92's value-hash gate pins them); the MEAN is a float
    reduction whose summation order differs, so 1e-9 rel like pctrank."""
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import native

    b = bench_small
    con = duckdb.connect()
    try:
        df = spark.range(b.N_60M).selectExpr(
            "id % 25 AS grp", f"{b.PCT_V} / 32.0D AS v"
        )
        srow = (
            native.quantile_normalize(df, "v", ["grp"])
            .agg(
                F.count("qnorm").alias("n_mapped"),
                F.avg("qnorm").alias("mean_qn"),
            )
            .collect()[0]
        )
        drow = con.execute(b._duckdb_family_sqls()["qnorm_60m"]).fetchall()[0]
        # every generated v is finite and the self-reference covers every
        # (sign, bin), so all N rows map
        assert int(srow[0]) == int(drow[0]) == b.N_60M
        assert abs(srow[1] - drow[1]) <= 1e-9 * abs(drow[1])
    finally:
        con.close()


def test_span_extents_mirror_agrees(spark, bench_small):
    """Round-9 family: the DuckDB span-extents mirror must produce the
    SAME (n_extents, cut_tokens) as the Spark operator at small N —
    integer outputs, so equality is exact. Also pins the generator's
    intended shape: one 16-token boilerplate extent per doc."""
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import dedup

    b = bench_small
    t = b._span_text_sql("id").replace("VARCHAR", "STRING")
    docs = spark.range(b.N_SPAN, numPartitions=8).selectExpr(
        "id AS doc_id", f"{t} AS text"
    )
    srow = (
        dedup.duplicate_span_extents(
            docs, text="text", id_col="doc_id", n=b.SPAN_N, min_docs=2
        )
        .agg(
            F.count(F.lit(1)).alias("n_extents"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
                "cut_tokens"
            ),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    try:
        drow = con.execute(
            b._duckdb_family_sqls()["span_extents_2m"]
        ).fetchall()[0]
    finally:
        con.close()
    assert (int(srow[0]), int(srow[1])) == (int(drow[0]), int(drow[1]))
    # generator shape: every doc's 16-token boilerplate tail repeats
    # across ~N/POOL docs -> exactly one extent per doc, 16 tokens wide
    assert int(srow[0]) == b.N_SPAN
    assert int(srow[1]) == 16 * b.N_SPAN


def test_bm25_mirror_agrees(spark, bench_small):
    """Round-9 family: the DuckDB BM25 mirror must return the SAME
    (query_id, doc_id, bm25, n_terms, rank) top-10 rows as
    text.bm25_scores at small N — fixed-point scores and a doc-id
    tie-break make the comparison exact."""
    from duckdb_ddsketch_spark.operators import text as text_ops

    b = bench_small
    t = (
        b._minhash_text_sql(f"id % {b.N_TEXT_D}")
        .replace("//", "div")
        .replace("VARCHAR", "STRING")
    )
    docs = spark.range(b.N_TEXT, numPartitions=8).selectExpr(
        "id AS doc_id", f"{t} AS text"
    )
    qdf = spark.createDataFrame(
        b.BM25_QUERIES, "query_id int, query_text string"
    )
    srows = sorted(
        (r.query_id, r.doc_id, round(float(r.bm25), 6), r.n_terms, r.rank)
        for r in text_ops.bm25_scores(docs, qdf, k=10).collect()
    )
    con = duckdb.connect()
    try:
        drows = sorted(
            (int(q), int(d), round(float(s), 6), int(nt), int(rk))
            for q, d, s, nt, rk in con.execute(
                b._duckdb_family_sqls()["bm25_15m"]
            ).fetchall()
        )
    finally:
        con.close()
    assert srows == drows and len(srows) == 10 * len(b.BM25_QUERIES)


def test_family_band_retry_can_clear(bench_small):
    """A family whose in-run reps all exceed the band but whose
    end-of-session retry lands back inside it must be noted
    cleared_by_retry — and the quoted min must include the retry."""
    b = bench_small
    b._RAW_RUNS.clear()
    state = {"n": 0}

    def thunk():
        import time as _t

        state["n"] += 1
        if state["n"] <= 3:  # the three scheduled passes: slow (load)
            _t.sleep(0.5)
        # retry: instant (episode passed)

    b.FRESH_BANDS["__fake2__"] = {"spark": 0.05}  # limit = 0.05*1.6+0.3 = 0.38
    try:
        result: dict = {}
        fams = b._run_family_passes([("__fake2__", thunk, None)], "spark", result)
        notes = result["family_band_notes"]
        assert len(notes) == 1 and notes[0]["status"] == "cleared_by_retry"
        assert state["n"] == 4  # 3 passes + 1 retry
        assert fams["__fake2__"] < 0.38  # min includes the cleared retry
    finally:
        del b.FRESH_BANDS["__fake2__"]
    b._RAW_RUNS.clear()


def test_vocab_tok_mirror_agrees(spark, bench_small):
    """The round-11 vocab_tok_15m family: the Spark Arrow bulk kernel and
    the DuckDB distinct-word recursive-CTE mirror must compute identical
    (word_sum, tok_sum, unk_sum) totals at small N — same greedy rule,
    same default vocab, integer-exact."""
    from pyspark.sql import functions as F

    from duckdb_ddsketch_spark.operators import text as text_ops

    b = bench_small
    con = duckdb.connect()
    try:
        t = (
            b._minhash_text_sql(f"id % {b.N_TEXT_D}")
            .replace("//", "div")
            .replace("VARCHAR", "STRING")
        )
        docs = spark.range(b.N_TEXT, numPartitions=8).selectExpr(
            "id AS doc_id", f"{t} AS text"
        )
        srow = (
            text_ops.vocab_token_stats(docs, form="bulk")
            .agg(F.sum("n_words"), F.sum("n_bpe_tokens"), F.sum("n_unk"))
            .collect()[0]
        )
        drow = con.execute(
            b._duckdb_family_sqls()["vocab_tok_15m"]
        ).fetchall()[0]
        assert tuple(int(x) for x in srow) == tuple(int(x) for x in drow)
        assert int(srow[0]) > 0 and int(srow[1]) > int(srow[0])
    finally:
        con.close()


def test_heal_substitutes_in_band_attribution_cells(bench_small, monkeypatch):
    """Round 11 self-healing: a load_suspect family gets one fresh-process
    attribution pair; an in-band fresh cell is substituted into the
    official record and the note becomes substituted_by_attribution; a
    still-over-band fresh cell keeps the flag; a crashed subprocess keeps
    the flag with an attribution_error; >_HEAL_MAX_FAMILIES skips with a
    session-load note. Subprocess mocked — the real pair is exercised by
    running bench.py with SPARK_GRAFT_BENCH_ONLY."""
    import json as _json
    import subprocess as _sp

    b = bench_small

    def fake_run(cmd, capture_output, text, timeout, env):
        fam = env["SPARK_GRAFT_BENCH_ONLY"]
        assert env["SPARK_GRAFT_NO_HEAL"] == "1"

        class P:
            returncode = 0
            stdout = (
                _json.dumps({"partial": "duckdb_done"})
                + "\n"
                + _json.dumps(
                    {
                        "metric": "bench_only_families",
                        "spark_families_60m_sec": {fam: 1.0},
                        "duckdb_families_60m_sec": {fam: 50.0},
                    }
                )
            )

        if fam == "__crash__":
            raise _sp.TimeoutExpired(cmd, timeout)
        return P()

    monkeypatch.setattr(_sp, "run", fake_run)
    b._RAW_RUNS.clear()
    b.FRESH_BANDS["__h1__"] = {"spark": 0.9, "duckdb": 100.0}
    b.FRESH_BANDS["__h2__"] = {"spark": 0.1}
    b.FRESH_BANDS["__crash__"] = {"spark": 0.9}
    b.FRESH_BANDS["__hd__"] = {"spark": 0.9, "duckdb": 40.0}
    try:
        result = {
            "spark_families_60m_sec": {"__h1__": 9.9, "__h2__": 9.9,
                                       "__crash__": 9.9, "__hd__": 0.8},
            "duckdb_families_60m_sec": {"__h1__": 999.0, "__hd__": 777.0},
            "family_band_notes": [
                {"family": "__h1__", "engine": "spark", "band_ref_sec": 0.9,
                 "runs_sec": [9.9], "status": "load_suspect"},
                {"family": "__h2__", "engine": "spark", "band_ref_sec": 0.1,
                 "runs_sec": [9.9], "status": "load_suspect"},
                {"family": "__crash__", "engine": "spark", "band_ref_sec": 0.9,
                 "runs_sec": [9.9], "status": "load_suspect"},
                # a DUCKDB-engine flag: the r11 in-situ validation only ever
                # exercised spark-cell substitutions (VERDICT r11 nit d)
                {"family": "__hd__", "engine": "duckdb", "band_ref_sec": 40.0,
                 "runs_sec": [777.0], "status": "load_suspect"},
            ],
        }
        b._heal_load_suspects(result)
        by_fam = {n["family"]: n for n in result["family_band_notes"]}
        # __h1__: fresh 1.0 <= 0.9*1.6+0.3 -> substituted, cell healed,
        # and the UNFLAGGED duckdb cell still takes the fresh min
        assert by_fam["__h1__"]["status"] == "substituted_by_attribution"
        assert by_fam["__h1__"]["attribution_sec"] == 1.0
        assert result["spark_families_60m_sec"]["__h1__"] == 1.0
        assert result["duckdb_families_60m_sec"]["__h1__"] == 50.0
        # __h2__: fresh 1.0 > 0.1*1.6+0.3 = 0.46 -> two processes agree,
        # flag stands WITH BOTH VALUES readable in the note (the
        # in-session reps and the appended fresh attribution rep)
        assert by_fam["__h2__"]["status"] == "load_suspect"
        assert by_fam["__h2__"]["attribution_sec"] == 1.0
        assert by_fam["__h2__"]["runs_sec"] == [9.9, 1.0]
        assert result["spark_families_60m_sec"]["__h2__"] == 1.0
        # __crash__: subprocess died -> flag stands with an error note
        assert by_fam["__crash__"]["status"] == "load_suspect"
        assert "TimeoutExpired" in by_fam["__crash__"]["attribution_error"]
        assert "attribution_sec" not in by_fam["__crash__"]
        # __hd__: the DUCKDB-engine substitution path — fresh 50.0 is
        # inside 40*1.6+0.3, so the duckdb cell heals in-record while the
        # unflagged spark cell keeps its (better) in-session min
        assert by_fam["__hd__"]["status"] == "substituted_by_attribution"
        assert by_fam["__hd__"]["attribution_sec"] == 50.0
        assert result["duckdb_families_60m_sec"]["__hd__"] == 50.0
        assert result["spark_families_60m_sec"]["__hd__"] == 0.8
        # attribution reps land in the sidecar raw runs for both engines
        assert 1.0 in b._RAW_RUNS["spark_fam:__h1__"]
        assert 50.0 in b._RAW_RUNS["duckdb_fam:__hd__"]

        # > _HEAL_MAX_FAMILIES flagged -> session-wide load, no reruns
        many = {
            "family_band_notes": [
                {"family": f"__m{i}__", "engine": "spark", "band_ref_sec": 1,
                 "runs_sec": [9.9], "status": "load_suspect"}
                for i in range(b._HEAL_MAX_FAMILIES + 1)
            ],
        }
        b._heal_load_suspects(many)
        assert "session-wide load" in many["heal_note"]
        assert all(n["status"] == "load_suspect" for n in many["family_band_notes"])
    finally:
        for k in ("__h1__", "__h2__", "__crash__"):
            del b.FRESH_BANDS[k]
        b._RAW_RUNS.clear()


def test_partial_snapshot_lines(bench_small, capsys, monkeypatch):
    """Round 13 (VERDICT r12 item 1): every completed section/family rep
    prints a {"partial": ...} snapshot so an external wall-clock kill
    leaves the newest complete record as the last stdout line. Snapshots
    must apply _emit's compaction (band notes dropped, oracle totalled,
    family cells at 2dp) so a killed run's last line stays inside the
    driver's tail-capture window, and attribution subprocesses must not
    print them (their stdout is reverse-scanned for the families record)."""
    import json as _json

    b = bench_small
    result = {
        "metric": "headline_queries_total",
        "value": 1.5,
        "duckdb_oracle": {"q01": 0.1, "q02": 0.25},
        "spark_families_60m_sec": {"hll_distinct": 5.678},
        "family_band_notes": [{"family": "f", "engine": "spark",
                               "band_ref_sec": 1.0, "runs_sec": [9.9],
                               "status": "load_suspect"}],
    }
    b._partial(result, "spark_done")
    snap = _json.loads(capsys.readouterr().out.strip())
    assert snap["partial"] == "spark_done"
    assert "family_band_notes" not in snap
    assert "duckdb_oracle" not in snap
    assert snap["duckdb_oracle_total"] == 0.35
    assert snap["spark_families_60m_sec"] == {"hll_distinct": 5.68}
    assert snap["metric"] == "headline_queries_total"
    # result itself is untouched (the final _emit still sees everything)
    assert "duckdb_oracle" in result and "family_band_notes" in result
    # attribution subprocesses stay snapshot-free
    monkeypatch.setattr(b, "_ONLY", {"hll_distinct"})
    b._partial(result, "spark_done")
    assert capsys.readouterr().out == ""
    # the family-passes progress hook feeds snapshots after every rep
    monkeypatch.setattr(b, "_ONLY", set())
    seen = []
    b._run_family_passes(
        [("hll_distinct", lambda: None, None)], "spark", {},
        on_progress=lambda cells: seen.append(dict(cells)),
    )
    assert len(seen) == 3  # pass 1 + pass 2 + pass 3 for a cheap family
    assert all("hll_distinct" in s for s in seen)
    b._RAW_RUNS.clear()


def test_budget_skips_optional_work(bench_small, monkeypatch):
    """Round 13 (VERDICT r12 item 2): once the session deadline passes,
    pass-2/3 spread reps, band retries and heal pairs are SKIPPED rather
    than run — pass-1 cells always exist, skipped retries leave an honest
    load_suspect + retry_skipped_over_budget note, and heal marks its
    skip in attribution_error. A timeout can then never erase the record."""
    b = bench_small
    b._RAW_RUNS.clear()
    monkeypatch.setattr(b, "_DEADLINE_SEC", -1.0)  # deadline already passed
    calls = []
    b.FRESH_BANDS["__b1__"] = {"spark": -1.0}  # any time exceeds the band
    try:
        result: dict = {}
        fams = b._run_family_passes(
            [("hll_distinct", lambda: calls.append("h"), None),
             ("__b1__", lambda: calls.append("b"), None)],
            "spark", result,
        )
        # exactly one pass-1 rep each: no pass-2/3, no retry
        assert calls == ["h", "b"]
        assert set(fams) == {"hll_distinct", "__b1__"}
        assert result["passes_truncated_over_budget"] == ["spark"]
        (note,) = result["family_band_notes"]
        assert note["family"] == "__b1__"
        assert note["status"] == "load_suspect"
        assert note["retry_skipped_over_budget"] is True
        assert len(note["runs_sec"]) == 1
        # heal skips the pair and says so, keeping the flag
        import subprocess as _sp

        def boom(*a, **k):  # pragma: no cover - must not be reached
            raise AssertionError("heal ran a subprocess past the deadline")

        monkeypatch.setattr(_sp, "run", boom)
        b._heal_load_suspects(result)
        (note,) = result["family_band_notes"]
        assert note["status"] == "load_suspect"
        assert "deadline" in note["attribution_error"]
    finally:
        del b.FRESH_BANDS["__b1__"]
        b._RAW_RUNS.clear()


def test_pq_mirror_agrees(spark, bench_small):
    """Round-10 family: the DuckDB PQ/ADC mirror must return the SAME
    (query_id, neighbor_id, adc, rank) top-k rows as the Spark
    pq_encode_blas -> pq_adc_topk_blas pipeline at small N — the mirror
    walks the identical fold-order arithmetic, so adc doubles are
    bit-exact (no rounding in the comparison)."""
    from duckdb_ddsketch_spark.operators import similarity

    b = bench_small
    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0D + 0.5D AS DOUBLE)"
        for p in b.ANN_PRIMES
    ) + ")"
    corpus = spark.range(b.N_ANN_CORPUS, numPartitions=8).selectExpr(
        "id AS vec_id", f"{vec} AS embedding"
    )
    queries = spark.range(b.N_ANN_Q, numPartitions=2).selectExpr(
        "id AS vec_id", f"{vec} AS embedding"
    )
    coded = similarity.pq_encode_blas(corpus, b.PQ_CB)
    srows = sorted(
        (r.query_id, r.neighbor_id, float(r.adc), r.rank)
        for r in similarity.pq_adc_topk_blas(
            coded, queries, b.PQ_CB, k=b.ANN_K, max_query_rows=b.N_ANN_Q
        ).collect()
    )
    con = duckdb.connect()
    try:
        drows = sorted(
            (int(q), int(d), float(s), int(rk))
            for q, d, s, rk in con.execute(
                b._duckdb_family_sqls()["ann_pq_2m_x128"]
            ).fetchall()
        )
    finally:
        con.close()
    assert srows == drows and len(srows) == b.ANN_K * b.N_ANN_Q
