"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headliners cover each engine layer: the covering spatial join, pure-
Column cell ops, a geography-UDF pipeline, TPC-H-ish analytics, and
the LLM operators (minhash LSH, simhash, cosine top-k, text stats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from duckdb_geography_spark.session import get_spark

    spark = get_spark(cpus=CPUS, shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    bench_queries = [
        "pip_covering_join",
        "cell_bitops",
        "cellfromlonlat",
        "cell_containment_join",
        "tpch_pricing_summary",
        "tpch_top_orders",
        "events_hourly",
        "wkt_roundtrip",
        "rect_measures",
        "haversine_pairs",
        "dedup_exact",
        "text_stats",
        "doc_quality",
        "doc_prep",
        "doc_chunks",
        "sessionize_batch",
        "langid",
        "minhash_lsh_candidates",
        "simhash_signatures",
        "embedding_topk",
        "lsh_topk",
        "ivf_topk",
        "repetition_signals",
        "decontaminate",
        "semdedup",
        "boilerplate_frac",
        "sequence_packing",
        "unigram_nll",
        "asof_join",
        "interval_join",
        "topk_per_group",
        "rolling_stats",
        "url_ops",
        "host_stats",
        "pq_topk",
        "incremental_dedup",
        "stratified_sample",
        "grouped_quantiles",
        "dedup_lines",
        "bigram_nll",
        "char_entropy",
        "funnel",
        "bm25_retrieval",
        "dup_spans",
        "dsir_weights",
        "hll_distinct",
        "cms_counts",
        "int8_topk",
        "bloom_prefilter",
        "zorder_layout",
        "token_budget_sample",
        "token_budget_global",
        "jl_topk",
        "knn_join",
        "kmeans_clusters",
        "embedding_knn_join",
    ]
    only = [q for q in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if q]
    if only:
        unknown = set(only) - set(bench_queries)
        if unknown:
            raise SystemExit(f"unknown bench queries: {sorted(unknown)}")
        bench_queries = [q for q in bench_queries if q in only]
    # warm up the JVM AND the Python UDF workers once (not timed):
    # every task slot imports the package + numpy/pandas on first use,
    # which would otherwise be billed to the first UDF query
    from duckdb_geography_spark.functions import cells as C

    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    ncpu = int(CPUS) if str(CPUS).isdigit() else os.cpu_count()
    spark.range(0, ncpu * 4, 1, ncpu * 4).select(
        C.s2_cellfromlonlat(F.lit(1.0), F.lit(2.0)).alias("c")
    ).count()
    # the geography stack (WKT decode, coverer, predicates) imports
    # geo/ops/overlay/coverer into every Python worker on first use —
    # warm that too, so the first geography query isn't billed ~0.3s
    # of module imports per worker slot
    from duckdb_geography_spark.functions.bounds import s2_covering
    from duckdb_geography_spark.functions.io import s2_geogfromtext
    from duckdb_geography_spark.functions.predicates import s2_intersects

    tiny = spark.range(0, ncpu * 4, 1, ncpu * 4).select(
        s2_geogfromtext(
            F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        ).alias("g")
    )
    tiny.select(
        F.size(s2_covering("g")).alias("n"), s2_intersects("g", "g").alias("i")
    ).count()
    # warm the Arrow createDataFrame path (local pandas -> LocalRelation)
    import pandas as _pd

    spark.createDataFrame(_pd.DataFrame({"a": [1, 2], "b": [3, 4]})).count()
    # warm the OS page cache for every input table (untimed): a cold
    # first read of the sf0.1 parquet otherwise bills ~10s of disk I/O
    # to whichever queries happen to touch each table first
    import glob as _glob

    def _warm(path):
        if os.path.isdir(path):  # Spark-written dataset directory
            for sub in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
                _warm(sub)
            return
        with open(path, "rb") as fh:
            while fh.read(1 << 24):
                pass

    for p in sorted(_glob.glob(f"{SF_DIR}/*.parquet")):
        _warm(p)

    # three passes per query, report the min: steady-state throughput,
    # insulated from one-off JIT/compaction/noisy-neighbor blips
    # (observed run-to-run spread on this box is +-30%, so two passes
    # still let a blip through). SPARK_GRAFT_PASSES=1 for long
    # large-sf scaling runs where wall-clock matters more than jitter.
    passes = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
    timings = {}
    spreads = {}
    total = 0.0
    for name in bench_queries:
        best, worst, rows = float("inf"), 0.0, 0
        for _ in range(passes):
            t0 = time.perf_counter()
            rows = qs[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            worst = max(worst, dt)
        timings[name] = round(best, 3)
        # max/min ratio across passes: the variance guard (VERDICT r6
        # item 7). A whole-suite reading that moves >1.5x vs the prior
        # round with per-query spreads near 1.0 is a loaded box, not a
        # regression — the spread is recorded so the round record can
        # tell the two apart.
        spreads[name] = round(worst / best, 2) if best > 0 else 1.0
        total += best
        print(
            f"# {name}: {best:.3f}s ({rows} rows, spread x{spreads[name]:.2f})",
            file=sys.stderr,
        )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
