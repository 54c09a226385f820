"""Registry-wide physical-plan quality sweep.

Every staged batch query's executed plan is checked against the two
scale-killer operators:

- ``CartesianProduct`` — forbidden everywhere: an unconditioned cross of
  two shuffled sides never survives a 100x scale-up.
- ``ArrowAggregatePython`` (grouped-agg pandas UDAF — Spark gives it no
  partial aggregation, so every input row shuffles to its group's
  reducer) — allowed ONLY in the reference-surface-coverage queries whose
  inputs are bounded by construction; the scale path for the same
  semantics is the native merge (q11/q13/q14/q35/q52), pinned separately
  in test_plans.py.
- ``BroadcastNestedLoopJoin`` — allowed only where the broadcast side is
  a bounded query/sketch/vocabulary table; a new unlisted occurrence
  means a non-equi join crept onto two large sides.

A new query that trips a marker must either fix its plan or justify an
allowlist entry here.
"""

import pytest

# raw-UDAF surface queries: inputs are literals (q02), two sketch rows
# (q04/q15), 16 pre-bucketed sketches per group (q17), a mapInPandas
# pre-merged partial per partition x group (q12) — bounded — or, for
# q10 only, the raw value scan: q10 deliberately keeps one driver row on
# the value-UDAF surface (`sketch_values_agg`), the documented slow path
# whose scale twin is the native binned aggregate (q01/q13)
ALLOWED_PANDAS_AGG = {
    "q02_codec_golden_bytes",
    "q04_merge_two_sketches",
    "q10_stats_by_event_type",
    "q12_stats_agg_by_linestatus",
    "q15_nested_column_merge",
    "q17_sql_surface_cte",
}

# broadcast-bounded non-equi joins: ANN query/centroid tables, bloom
# words, idf vocab, 1-row sketch-set algebra
ALLOWED_BNLJ = {
    "q04_merge_two_sketches",
    "q15_nested_column_merge",
    "q24_embedding_near_pairs",
    "q28_ann_ivf_topk",
    "q44_tfidf_top_terms",
    "q66_bloom_membership",
    "q72_hll_audience_overlap",
    "q78_kmv_set_algebra",
}

# bodies that EXECUTE a stream (or drive an iterative loop that depends
# on streaming staging) when called — planned via their own tests instead
STREAMING = {
    "q34_streaming_hourly_windows",
    "q48_streaming_sessions",
    "q51_streaming_sliding_windows",
    "q56_stream_stream_range_join",
    "q71_streaming_distinct_windows",
    "q79_streaming_heavy_hitters",
    "q86_streaming_first_seen",
}


def _batch_names():
    from duckdb_ddsketch_spark.plans import declared

    return sorted(set(declared.STAGED_QUERIES) - STREAMING)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    from duckdb_ddsketch_spark.plans import declared

    out = {}
    for name in _batch_names():
        df = declared.STAGED_QUERIES[name](spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"CartesianProduct in: {bad}"


def test_pandas_agg_only_in_surface_queries(plans):
    hits = {n for n, p in plans.items() if "ArrowAggregatePython" in p
            or "AggregateInPandas" in p}
    assert hits <= ALLOWED_PANDAS_AGG, (
        f"no-partial-agg pandas aggregate crept into: "
        f"{sorted(hits - ALLOWED_PANDAS_AGG)}"
    )


def test_bnlj_only_where_broadcast_bounded(plans):
    hits = {n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p}
    assert hits <= ALLOWED_BNLJ, (
        f"nested-loop join on unlisted queries: {sorted(hits - ALLOWED_BNLJ)}"
    )
