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
            "N_TEXT",
            "N_TEXT_D",
            "STREAM_SRC",
        )
    }
    bench.N_60M = 50_000
    bench.N_ASOF_L, bench.N_ASOF_R = 45_000, 5_000
    bench.N_MINHASH = 4_000
    bench.MINHASH_D = 3_600
    bench.N_BITMAP_USERS = 5_000
    bench.N_ANN_CORPUS, bench.N_ANN_Q = 5_000, 8
    bench.N_TEXT, bench.N_TEXT_D = 20_000, 500
    bench.STREAM_SRC = str(tmp_path_factory.mktemp("bench_stream"))
    yield bench
    for k, v in saved.items():
        setattr(bench, k, v)


def test_all_spark_families_execute(spark, bench_small):
    result = {}
    bench_small.run_spark_families(spark, result)
    fam = result["spark_families_60m_sec"]
    assert set(fam) == {
        "hll_distinct",
        "asof_join",
        "heavy_hitters",
        "exact_dedup",
        "minhash_lsh_600k",
        "bitmap_retention",
        "ann_brute_2m_x128",
        "text_metrics_15m",
        "kmeans_60m",
        "streaming_windows",
        "streaming_windows_full_recompute",
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
