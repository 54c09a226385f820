"""Physical-plan regression tests: pin the properties the 100 TB design
depends on (pruning, pushdown, shuffle counts, partial agg, no row-at-a-time
Python). A refactor that silently adds a shuffle or widens a scan fails here.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark.operators import dedup, native, similarity
from duckdb_ddsketch_spark.plans import checks
from duckdb_ddsketch_spark.sources import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_native_quantile_plan(spark, lineitem):
    q = native.sketch_quantile_agg(
        lineitem, ["l_returnflag"], "l_extendedprice", 0.01, (0.5, 0.95)
    )
    # scan reads exactly the two needed columns, null filter pushed down
    checks.assert_scan_pruned(q, "lineitem", {"l_returnflag", "l_extendedprice"})
    assert "IsNotNull" in checks.pushed_filters(q, "lineitem")
    # two shuffles total: binned aggregate + key clustering (windows and the
    # final aggregate must reuse the second)
    assert checks.exchange_count(q) == 2
    assert checks.has_partial_aggregation(q)
    # fully native: no Python at all
    assert checks.python_eval_nodes(q) == []


def test_filter_pushdown_through_native_path(spark, lineitem):
    q = native.sketch_quantile_agg(
        lineitem.where(F.col("l_shipdate") >= "1995-01-01"),
        ["l_returnflag"],
        "l_extendedprice",
        0.01,
        (0.5,),
    )
    pushed = checks.pushed_filters(q, "lineitem")
    assert "l_shipdate" in pushed  # user filter reached the parquet scan


def test_struct_agg_plan(spark, lineitem):
    q = native.sketch_struct_agg(lineitem, ["l_returnflag"], "l_quantity", 0.01)
    checks.assert_scan_pruned(q, "lineitem", {"l_returnflag", "l_quantity"})
    assert checks.exchange_count(q) == 2
    assert checks.python_eval_nodes(q) == []


def test_struct_merge_plan_no_join(spark, lineitem):
    per = native.sketch_struct_agg(
        lineitem, ["l_returnflag", "l_linestatus"], "l_quantity", 0.01
    )
    merged = native.merge_struct_sketches(per, ["l_returnflag"], "sketch")
    plan = checks.formatted_plan(merged)
    assert "Join" not in plan  # fused: scalars ride the exploded bins
    assert checks.python_eval_nodes(merged) == []


def test_no_row_at_a_time_python_anywhere(spark, lineitem):
    """Blob-path pandas UDFs must be Arrow-vectorized, never BatchEvalPython."""
    from duckdb_ddsketch_spark.functions import scalar as fs
    from duckdb_ddsketch_spark.functions.aggregate import ddsketch_agg

    pre = lineitem.limit(100).select(
        "l_returnflag", fs.ddsketch_prepare(F.col("l_quantity")).alias("sk")
    )
    agg = pre.groupBy("l_returnflag").agg(ddsketch_agg("sk").alias("s")).select(
        fs.ddsketch_quantile(F.col("s"), F.lit(0.5)).alias("p50")
    )
    nodes = checks.python_eval_nodes(agg)
    assert nodes and "BatchEvalPython" not in nodes


def test_minhash_signatures_partial_agg(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures_df(docs)
    assert checks.has_partial_aggregation(sig)
    assert checks.exchange_count(sig) == 1  # one shuffle: per-doc signatures
    assert checks.python_eval_nodes(sig) == []


def test_topk_broadcasts_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=3)
    assert checks.broadcast_exchange_count(q) >= 1  # corpus never shuffles
    assert checks.python_eval_nodes(q) == []
