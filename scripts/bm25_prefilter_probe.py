"""Probe: bm25_scores heavy pass — prune tokens BEFORE the explode.

The current heavy pass explodes every corpus token (120M rows at the
bench shape) and prunes with a broadcast semi-join on the ~9 distinct
query terms (~1.4% hit rate: most exploded rows are materialized only
to be discarded). Variant: collect the model-sized distinct term set
(the operator already treats the query side as broadcastable by
contract) and prune INSIDE the token array — filter(tokens, t ->
t IN (literals)) — so the explode materializes only hits (guide §2.3
"project before the exchange" applied to the generate operator).

The IN-list is a per-token linear scan (every native probe container
is — round-11 lesson), so the form is only sane for small term sets;
the probe also measures a 128-term set to find the cliff.

Output equality is asserted at 200k docs (plus edge rows).

Usage: python scripts/bm25_prefilter_probe.py [n_docs] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_TEXT_D = 1_000_000

from pyspark.sql import SparkSession, Window, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("bm25-prefilter-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.operators import text as text_ops
from duckdb_ddsketch_spark.operators.text import tokens

BM25_QUERIES = [
    (1, "a7 b13 c55"),
    (2, "d9 e30 f8"),
    (3, "g2 h1 a100"),
]


def minhash_text_sql(d: str) -> str:
    parts = []
    for tag, mod, div in (
        ("a", 101, 1), ("b", 97, 101), ("c", 89, 3), ("d", 83, 7),
        ("e", 79, 11), ("f", 73, 13), ("g", 71, 17), ("h", 67, 19),
    ):
        parts.append(f"'{tag}' || CAST((({d}) div {div}) % {mod} AS STRING)")
    return " || ' ' || ".join(parts)


def docs_df(n):
    t = minhash_text_sql(f"id % {N_TEXT_D}")
    return spark.range(n, numPartitions=64).selectExpr(
        "id AS doc_id", f"{t} AS text"
    )


def bm25_prefilter(df, queries, text="text", id_col="doc_id",
                   query_id="query_id", query_text="query_text",
                   k1=1.5, b=0.75, k=10):
    tok_n = F.coalesce(
        F.regexp_count(F.trim(F.col(text)), F.lit("[^ ]+")), F.lit(0)
    )
    qterms = (
        queries.select(
            F.col(query_id).alias("__q"),
            F.explode(tokens(F.lower(F.col(query_text)))).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    uterms = qterms.select("term").distinct()
    term_list = sorted(r[0] for r in uterms.collect())
    tok_arr = tokens(F.lower(F.col(text)))
    if term_list:
        tok_arr = F.filter(tok_arr, lambda t: t.isin(term_list))
    else:
        tok_arr = F.array().cast("array<string>")
    hits = df.select(
        F.col(id_col).alias("__doc"),
        tok_n.alias("dl"),
        F.explode(tok_arr).alias("term"),
    )
    per_doc_term = (
        hits.groupBy("__doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .localCheckpoint(eager=False)
    )
    dfreq = per_doc_term.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    cand = per_doc_term.join(F.broadcast(dfreq), "term")
    stats = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs"),
        F.sum(tok_n).alias("total_tokens"),
    )
    matched = cand.join(F.broadcast(qterms), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    fixed = F.floor(contrib * 65536.0 + 0.5).cast("long")
    scored = (
        matched.select(F.col("__q"), F.col("__doc"), fixed.alias("__c"))
        .groupBy("__q", "__doc")
        .agg(F.sum("__c").alias("__s"), F.count(F.lit(1)).alias("n_terms"))
        .withColumn("bm25", (F.col("__s") / 65536.0).cast("float"))
    )
    w = Window.partitionBy("__q").orderBy(F.col("bm25").desc(), F.col("__doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_id),
            F.col("__doc").alias(id_col),
            "bm25",
            F.col("n_terms").cast("long").alias("n_terms"),
            "rank",
        )
    )


qdf = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")

edge = spark.createDataFrame(
    [(10_000_001, ""), (10_000_002, None), (10_000_003, "   "),
     (10_000_004, "a7 a7 a7"), (10_000_005, "a7 b13 c55 d9 e30 f8 g2 h1")],
    "doc_id long, text string",
)
small = docs_df(200_000).unionByName(edge)
a = sorted(tuple(r) for r in text_ops.bm25_scores(small, qdf, k=10).collect())
b = sorted(tuple(r) for r in bm25_prefilter(small, qdf, k=10).collect())
assert a == b, f"MISMATCH: {a[:3]} vs {b[:3]}"
print(f"equality at 200k docs: OK ({len(a)} rows)", flush=True)

# a 128-term query set (mostly missers) to find the IN-list cliff
WIDE_QUERIES = [
    (i + 1, " ".join(f"a{j}" for j in range(i * 16, i * 16 + 16)))
    for i in range(8)
]
qdf_wide = spark.createDataFrame(WIDE_QUERIES, "query_id int, query_text string")

big = docs_df(N)
forms = (
    ("current_9t", lambda: text_ops.bm25_scores(big, qdf, k=10)),
    ("prefilter_9t", lambda: bm25_prefilter(big, qdf, k=10)),
    ("current_128t", lambda: text_ops.bm25_scores(big, qdf_wide, k=10)),
    ("prefilter_128t", lambda: bm25_prefilter(big, qdf_wide, k=10)),
)
for rnd in range(REPS):
    for name, build in forms:
        t0 = time.perf_counter()
        res = build().collect()
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  rows={len(res)}", flush=True)
