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


def test_vector_reduction_pipeline(spark):
    """The 100 TB vector-indexing pre-path composed end-to-end:

        PCA (64 -> 8 dims) -> int8 quantization -> exact quantized top-k

    Recall of the reduced+quantized route is checked against full-width
    brute force: the synthetic corpus puts ~all variance in 8 of 64
    dims, so PCA-8 must preserve neighborhoods near-perfectly.
    """
    import numpy as np

    from duckdb_ddsketch_spark.operators import decomposition as dec
    from duckdb_ddsketch_spark.operators import similarity as sim

    rng = np.random.default_rng(42)
    n, d, d_eff = 300, 64, 8
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    X = rng.normal(size=(n, d_eff)) @ np.diag([8, 7, 6, 5, 4, 3, 2.5, 2.0])
    X = X @ basis[:d_eff] + rng.normal(scale=0.01, size=(n, d))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(4)

    mean, comps, ev = dec.pca_components(df, k=d_eff, dims=d)
    # the planted spectrum is recovered: 8 dominant directions, then noise
    assert ev[d_eff - 1] > 1.0
    red = dec.pca_project(df, mean, comps).select(
        "vec_id", F.col("pc").alias("embedding")
    )
    scale = sim.quantize_calibration(red, bits=8)
    qc = sim.quantize_embeddings(red, scale, bits=8)

    queries = qc.where(F.col("vec_id") % 29 == 0)
    got = sim.quantized_topk(qc, queries, k=5)

    # ground truth: full-width dot ranking in the CENTERED space —
    # pca_project centers before projecting, and quantized_topk ranks by
    # dot product, so that is the metric the reduced route approximates
    # (projection onto the top-8 of a rank-8 corpus preserves centered
    # dots almost exactly; int8 adds bounded rounding)
    Y = X - X.mean(axis=0)
    dots = Y @ Y.T
    np.fill_diagonal(dots, -np.inf)
    ref = {q: set(np.argsort(-dots[q])[:5].tolist()) for q in range(0, n, 29)}

    hits = tot = 0
    for r in got.collect():
        tot += 1
        hits += int(r.neighbor_id in ref[r.query_id])
    assert tot == len(ref) * 5
    # 64->8 PCA + int8 keeps >= 90% recall on a rank-8 corpus
    assert hits / tot >= 0.9, hits / tot
