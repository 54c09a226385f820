"""Phase breakdown of the kmeans_15m_d64 bench family (r12 adjudication;
results in SCALING.md §Round-12).

Mirrors bench.py's generator and session config — at the HISTORICAL 8g
heap, kept deliberately: 8g demonstrates the eviction-boundary behavior
that motivated bench.py's move to 16g (run scripts/kmeans_heap_probe.py
with 8g vs 16g for the paired contrast). Times each phase of
kmeans_summary's fused BLAS route in one process:
  gen_scan   — generation + a trivial agg (the irreducible input cost)
  probe      — _probe_and_seeds (TakeOrdered k rows)
  iter1      — first _iterate_blas pass (includes cache materialization)
  iter2      — second pass (cached read)
  summary    — _summary_partials_blas + final agg
  total_api  — a fresh end-to-end kmeans_summary call (the family cell)
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

CPUS = "32"
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("km-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from duckdb_ddsketch_spark.operators import clustering as cl

KM_WIDE_PRIMES = (
    13, 17, 19, 23, 29, 31, 37, 41,
    43, 47, 53, 59, 61, 67, 71, 73,
    79, 83, 89, 97, 101, 103, 107, 109,
    113, 127, 131, 137, 139, 149, 151, 157,
    163, 167, 173, 179, 181, 191, 193, 197,
    199, 211, 223, 227, 229, 233, 239, 241,
    251, 257, 263, 269, 271, 277, 281, 283,
    293, 307, 311, 313, 317, 331, 337, 347,
)
N = 15_000_000
K = 8

def gen():
    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0D AS FLOAT)" for p in KM_WIDE_PRIMES
    ) + ")"
    return spark.range(N, numPartitions=64).selectExpr(
        "id AS vec_id", f"{vec} AS embedding"
    )

t = {}

def clock(name, fn):
    t0 = time.perf_counter()
    r = fn()
    t[name] = round(time.perf_counter() - t0, 2)
    print(f"{name}: {t[name]} s", flush=True)
    return r

# warm-up (JIT, arrow workers) — small
cl.kmeans_summary(gen().limit(200_000), "embedding", "vec_id", k=K, iters=2).collect()

# 1. irreducible generation cost
clock("gen_scan", lambda: gen().agg(F.sum(F.element_at("embedding", 1))).collect())

# 2. phase-by-phase (replicating the fused route body)
df = gen()
base = df.select("vec_id", "embedding")
fdf, seeds = clock("probe", lambda: cl._probe_and_seeds(base, "embedding", "vec_id", K))
base_p = base.persist()
c1 = clock("iter1_with_cache_build", lambda: cl._iterate_blas(base_p.where(
    F.col("embedding").isNotNull() & (F.size("embedding") == 64)), seeds, "embedding"))
c2 = clock("iter2_cached", lambda: cl._iterate_blas(base_p.where(
    F.col("embedding").isNotNull() & (F.size("embedding") == 64)), c1, "embedding"))
valid = base_p.where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
part = clock("summary_partials", lambda: cl._summary_partials_blas(
    valid, c2, "embedding", None).localCheckpoint())
base_p.unpersist()

# 3. the family cell, end to end, fresh plan
clock("total_api", lambda: cl.kmeans_summary(
    gen(), "embedding", "vec_id", k=K, iters=2).collect())
# 4. iters=1 variant for the marginal per-iteration cost
clock("total_api_iters1", lambda: cl.kmeans_summary(
    gen(), "embedding", "vec_id", k=K, iters=1).collect())

print("BREAKDOWN", t)
spark.stop()
