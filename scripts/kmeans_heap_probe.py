"""kmeans_15m_d64 family cell at a configurable heap: attribution probe.
If the constant collapses at 16g, the 8g cell is single-box cache
thrash (storage pool ~4.8G vs 3.8G corpus), which scales out with
executors — same adjudication shape as exact_dedup round 11."""
import sys, time

sys.path.insert(0, "/root/repo")
heap = sys.argv[1] if len(sys.argv) > 1 else "8g"
from pyspark.sql import SparkSession, functions as F

CPUS = "32"
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("km-heap-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.driver.memory", heap)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from duckdb_ddsketch_spark.operators import clustering as cl

PRIMES = (
    13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71, 73,
    79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223,
    227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283,
    293, 307, 311, 313, 317, 331, 337, 347,
)

def gen():
    vec = "array(" + ", ".join(
        f"CAST(((id * {p}) % 1024) / 64.0D AS FLOAT)" for p in PRIMES
    ) + ")"
    return spark.range(15_000_000, numPartitions=64).selectExpr(
        "id AS vec_id", f"{vec} AS embedding"
    )

# warm-up
cl.kmeans_summary(gen().limit(200_000), "embedding", "vec_id", k=8, iters=2).collect()
for rep in range(2):
    t0 = time.perf_counter()
    rows = cl.kmeans_summary(gen(), "embedding", "vec_id", k=8, iters=2).collect()
    print(f"heap={heap} rep{rep}: {time.perf_counter()-t0:.2f} s n={len(rows)}", flush=True)
spark.stop()
