"""Probe: full bm25_scores family with regexp_count token counting.

Times the current operator vs a variant where BOTH the corpus-stats scan
and the per-token dl carried through the heavy explode pass count tokens
via regexp_count(trim(text), '[^ ]+') instead of
size(filter(split(...), != '')) — no array materialization just to count
(guide §1.2 per-task work). Output equality is asserted at 200k docs.

Usage: python scripts/bm25_full_probe.py [n_docs] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_TEXT_D = 1_000_000

from pyspark.sql import SparkSession, Window, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .appName("bm25-full-probe")
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
    (1, "a1 b2 c3"), (2, "d4 e5"), (3, "f6 g7 h8"), (4, "a9 b10"),
    (5, "c11 d12 e13"), (6, "f14"), (7, "g15 h16 a17"), (8, "b18 c19"),
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


def bm25_new(df, queries, text="text", id_col="doc_id", query_id="query_id",
             query_text="query_text", k1=1.5, b=0.75, k=10):
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
    toks = df.select(
        F.col(id_col).alias("__doc"),
        tok_n.alias("dl"),
        F.explode(tokens(F.lower(F.col(text)))).alias("term"),
    ).where(F.col("term") != "")
    hits = toks.join(F.broadcast(uterms), "term")
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

# equality at 200k docs (plus the empty/null edge rows)
edge = spark.createDataFrame(
    [(10_000_001, ""), (10_000_002, None), (10_000_003, "   "),
     (10_000_004, "a1 a1 a1")],
    "doc_id long, text string",
)
small = docs_df(200_000).unionByName(edge)
a = sorted(tuple(r) for r in text_ops.bm25_scores(small, qdf, k=10).collect())
b = sorted(tuple(r) for r in bm25_new(small, qdf, k=10).collect())
assert a == b, f"MISMATCH: {a[:3]} vs {b[:3]}"
print(f"equality at 200k docs: OK ({len(a)} rows)", flush=True)

big = docs_df(N)
forms = (
    ("bm25_current", lambda: text_ops.bm25_scores(big, qdf, k=10)),
    ("bm25_regexpcount", lambda: bm25_new(big, qdf, k=10)),
)
for rnd in range(REPS):
    for name, build in forms:
        t0 = time.perf_counter()
        res = build().collect()
        dt = time.perf_counter() - t0
        print(f"{name} rep{rnd}: {dt:.2f}s  rows={len(res)}", flush=True)
