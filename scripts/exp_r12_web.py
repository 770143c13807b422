"""r12 experiment: web_suite single-projection regex reuse vs the
current two-branch form (interleaved same-session A/B). The candidate
shares ONE parts projection behind a repartition("host") exchange that
both the url branch and the host rollup reuse (ReuseExchange), halving
the regex forest at the cost of one full-row shuffle.

Usage: python scripts/exp_r12_web.py [sf_dir] [rounds]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as e
from duckdb_geography_spark.llm import web as W
from duckdb_geography_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(cpus="32", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def web_suite_shared(spark, sf_dir):
    docs = e._t(spark, sf_dir, "documents").select("doc_id", "source")
    u = docs.withColumn("url", e._url_synth_col())
    parts = u.select(
        "doc_id",
        "url",
        W.url_host("url").alias("host"),
        W.registered_domain(W.url_host("url")).alias("domain"),
        W.url_path("url").alias("path"),
        W.normalize_url("url").alias("norm"),
    ).repartition("host")
    up = parts.select(
        F.lit("url").alias("part"),
        "doc_id",
        "url",
        "host",
        "domain",
        "path",
        "norm",
        F.lit(-1).cast("long").alias("n_docs"),
        F.lit(-1).cast("long").alias("n_paths"),
    )
    hp = (
        parts.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("path").alias("n_paths"),
        )
        .select(
            F.lit("host").alias("part"),
            F.lit(-1).cast("long").alias("doc_id"),
            F.lit("").alias("url"),
            "host",
            F.lit("").alias("domain"),
            F.lit("").alias("path"),
            F.lit("").alias("norm"),
            F.col("n_docs").cast("long"),
            F.col("n_paths").cast("long"),
        )
    )
    return up.unionByName(hp).orderBy("part", "doc_id", "host")


qs = e.queries()

# identity first
A = qs["web_suite"](spark, SF_DIR)
B = web_suite_shared(spark, SF_DIR)
ca, cb = A.count(), B.count()
cols = A.columns
onlyA = A.join(B, cols, "left_anti").count()
onlyB = B.join(A, cols, "left_anti").count()
print(f"# identity: A={ca} B={cb} onlyA={onlyA} onlyB={onlyB}")
assert ca == cb and onlyA == 0 and onlyB == 0, "IDENTITY FAILED"

# executed-plan reuse evidence for B
B2 = web_suite_shared(spark, SF_DIR)
B2.collect()
plan = B2._jdf.queryExecution().executedPlan().toString()
print(
    f"# B executed: reused={plan.count('ReusedExchange')} "
    f"scans={plan.count('Scan parquet')} final={'isFinalPlan=true' in plan}"
)

variants = {
    "A_two_branch": lambda: qs["web_suite"](spark, SF_DIR)
    .write.format("noop")
    .mode("overwrite")
    .save(),
    "B_shared_repart": lambda: web_suite_shared(spark, SF_DIR)
    .write.format("noop")
    .mode("overwrite")
    .save(),
}
results = {k: [] for k in variants}
for r in range(ROUNDS):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"exp_web {name} r{r}")
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        results[name].append(round(dt, 3))
        print(f"# round {r} {name}: {dt:.3f}s", flush=True)

print("# RESULTS (discard round 0):")
for name, ts in results.items():
    steady = ts[1:] or ts
    print(f"#   {name}: {ts} -> min-after-warm {min(steady):.3f}s")
spark.stop()
