"""End-to-end training-data pipeline: the operators composed the way a real
corpus-preparation job would run them —

    exact dedup → near-dup clustering → keep canonical docs →
    quality filter → per-source token-count DDSketch stats

with each stage's effect verified against hand-computed ground truth.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark import DDSketch
from duckdb_ddsketch_spark.operators import dedup, native, text


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        # near-dup family (cluster canonical = 1): 1 original, 2 exact, 3 near
        (1, "s1", base),
        (2, "s1", base),
        (3, "s2", base.replace("jumps", "leaps")),
        # normalized dup of 1 (caught by exact dedup)
        (4, "s2", base.upper()),
        # distinct, good quality
        (5, "s1", "completely different content about spark engines and data systems here"),
        # distinct, low quality (too short + no diversity)
        (6, "s2", "spam spam spam"),
        # distinct, good
        (7, "s1", "a totally separate document with its own unique words in it today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_full_pipeline(spark, corpus):
    # stage 1: exact dedup on normalized text
    exact = dedup.exact_dedup(corpus).where(F.col("is_canonical"))
    ids1 = {r.doc_id for r in exact.select("doc_id").collect()}
    assert ids1 == {1, 3, 5, 6, 7}  # 2 (exact) and 4 (normalized) dropped

    # stage 2: near-dup clustering on the survivors; keep cluster minimum
    pairs = dedup.jaccard_pairs(exact, threshold=0.5)
    clusters = dedup.duplicate_clusters(pairs)
    drop = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    survivors = exact.join(drop, "doc_id", "left_anti")
    ids2 = {r.doc_id for r in survivors.select("doc_id").collect()}
    assert ids2 == {1, 5, 6, 7}  # 3 clustered under 1

    # stage 3: quality filter
    scored = survivors.withColumn("q", text.quality_score(F.col("text")))
    kept = scored.where(F.col("q") >= 0.6)
    ids3 = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 6 not in ids3 and {1, 5, 7} <= ids3

    # stage 4: per-source token-count sketch stats on the final corpus
    with_counts = kept.select(
        "source", F.size(text.tokens(F.col("text"))).cast("double").alias("n_tokens")
    )
    stats = {
        r.source: r
        for r in native.sketch_quantile_agg(
            with_counts, ["source"], "n_tokens", 0.01, (0.5,)
        ).collect()
    }
    truth = {}
    for r in with_counts.collect():
        truth.setdefault(r.source, []).append(r.n_tokens)
    for src, vals in truth.items():
        kernel = DDSketch(0.01).extend(vals)
        assert stats[src]["count"] == kernel.get_count()
        assert abs(stats[src]["p50"] - kernel.quantile(0.5)) <= kernel.quantile(0.5) * 1e-9
