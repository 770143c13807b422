"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The final stdout line is kept COMPACT by contract: the driver records
only a bounded tail of stdout, and round 7's line (57 queries + a
per-query spread map, ~4 KB) outgrew that window, leaving the official
record unparseable (VERDICT r7 item 1). format_bench_record() now
guarantees the stdout line stays under MAX_STDOUT_LINE chars — the
per-query spread map (and, if the suite ever grows far enough, the
timings map itself) moves to a sidecar JSON file written next to this
script and echoed on stderr. A unit test (tests/test_bench_record.py)
pins the length contract so future gate growth can't silently break
the driver record again.

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

#: hard cap for the final stdout JSON line. The driver keeps a ~2000
#: char tail; 1500 leaves headroom for prefix noise on the same stream.
MAX_STDOUT_LINE = 1500

#: the gates whose OUTPUT is quadratic in input rows by construction
#: (all-pairs emission under a fixed threshold). At sf >= 1 their wall
#: is dominated by qualifying-pair volume, not engine work — r10's
#: sf10 total was 70% one gate's output writing — so every record also
#: carries value_excl_quadratic for round-over-round comparability
#: (VERDICT r10 item 3). The set matches __spark_entry__._bounded_gates.
QUADRATIC_OUTPUT_QUERIES = frozenset(
    {
        "haversine_pairs",
        "minhash_lsh_candidates",
        "ngram_jaccard_pairs",
        "embedding_sim_pairs",
        "dedup_clusters",
        "semdedup",
        "corpus_curation",
    }
)


def load_snapshot():
    """Box-load metadata stamped into every bench record (VERDICT r10
    item 4): without it, a quiet-vs-loaded comparison is folklore.
    1/5/15-minute load averages, uptime, and the raw /proc/stat cpu
    jiffies — the start/end jiffy delta yields the steal%/idle% over
    the run, which is the evidence that separates 'noisy co-tenant VM'
    from 'real regression' (a quiet-at-idle box can still lose 30% to
    hypervisor steal once all 32 cores are demanded)."""
    try:
        la = os.getloadavg()
    except OSError:  # platform without getloadavg
        la = (-1.0, -1.0, -1.0)
    up = -1.0
    jiffies = None
    try:
        with open("/proc/uptime") as fh:
            up = float(fh.read().split()[0])
        with open("/proc/stat") as fh:
            # user nice system idle iowait irq softirq steal
            jiffies = [int(x) for x in fh.readline().split()[1:9]]
    except (OSError, ValueError, IndexError):
        pass
    return {
        "loadavg": [round(x, 2) for x in la],
        "uptime_sec": round(up, 1),
        "cpu_jiffies": jiffies,
    }


def cpu_mix_over_run(start, end):
    """Percent user/idle/steal across the run from the two snapshots."""
    a, b = start.get("cpu_jiffies"), end.get("cpu_jiffies")
    if not a or not b:
        return None
    d = [y - x for x, y in zip(a, b)]
    total = sum(d) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return {n: round(100.0 * v / total, 2) for n, v in zip(names, d)}


def format_bench_record(timings, spreads, sf, total, load=None):
    """Build (stdout_line, sidecar_record) for a finished run.

    The stdout line always carries metric/value/unit/sf and — only if
    it still fits under MAX_STDOUT_LINE — the per-query timings map.
    The sidecar record always carries everything (timings + spread +
    the start/end load snapshots).
    """
    excl = round(
        sum(t for q, t in timings.items() if q not in QUADRATIC_OUTPUT_QUERIES), 3
    )
    sidecar = {
        "metric": "headline_suite_total",
        "value": round(total, 3),
        "value_excl_quadratic": excl,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "sf": sf,
    }
    if load is not None:
        sidecar["load"] = load
    line_full = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": round(total, 3),
            "value_excl_quadratic": excl,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    if len(line_full) <= MAX_STDOUT_LINE:
        return line_full, sidecar
    line_compact = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": round(total, 3),
            "value_excl_quadratic": excl,
            "unit": "sec",
            "queries_in_sidecar": len(timings),
            "sf": sf,
        },
        separators=(",", ":"),
    )
    return line_compact, sidecar


def bench_queries():
    """The headline suite, in run order. Module-level so the stdout
    length test can size the real list."""
    return [
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
        "simhash_suite",
        "embedding_topk",
        "lsh_topk",
        "ivf_suite",
        "repetition_signals",
        "decontaminate",
        "semdedup",
        "boilerplate_frac",
        "sequence_packing",
        "ngram_nll",
        "asof_join",
        "interval_join",
        "topk_per_group",
        "rolling_stats",
        "web_suite",
        "snapshot_diff",
        "pq_topk",
        "incremental_dedup",
        "stratified_sample",
        "grouped_quantiles",
        "dedup_lines",
        "linear_score",
        "funnel",
        "bm25_retrieval",
        "dup_spans",
        "dsir_weights",
        "hll_distinct",
        "cms_counts",
        "int8_topk",
        "bloom_prefilter",
        "zorder_layout",
        "token_budget_gate",
        "jl_topk",
        "knn_join",
        "kmeans_clusters",
        "embedding_knn_join",
        "rrf_hybrid",
        "vocab_drift",
    ]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from duckdb_geography_spark.session import get_spark

    spark = get_spark(cpus=CPUS, shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    run_queries = bench_queries()
    only = [q for q in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if q]
    if only:
        unknown = set(only) - set(run_queries)
        if unknown:
            raise SystemExit(f"unknown bench queries: {sorted(unknown)}")
        run_queries = [q for q in run_queries if q in only]
    # warm up the JVM AND the Python UDF workers once (not timed):
    # every task slot imports the package + numpy/pandas on first use,
    # which would otherwise be billed to the first UDF query
    from duckdb_geography_spark.functions import cells as C

    # subset replicas (.scale/sf100 carries only the tables its scan
    # gates read) may not have nation — warm the JVM read path with
    # whichever table is smallest among those present
    import glob as _glob

    _tables = sorted(_glob.glob(f"{SF_DIR}/*.parquet"), key=os.path.getsize)
    if not _tables:
        raise SystemExit(f"no parquet tables under {SF_DIR}")
    spark.read.parquet(_tables[0]).count()
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
    load_start = load_snapshot()
    timings = {}
    spreads = {}
    total = 0.0
    for name in run_queries:
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

    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag
    load_end = load_snapshot()
    load = {
        "start": load_start,
        "end": load_end,
        "cpu_mix_pct": cpu_mix_over_run(load_start, load_end),
        "passes": passes,
    }
    line, sidecar = format_bench_record(timings, spreads, sf, total, load=load)
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_SIDECAR_sf{sf_tag}.json"
    )
    try:
        with open(sidecar_path, "w") as fh:
            json.dump(sidecar, fh, indent=1)
        print(f"# full per-query record: {sidecar_path}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: stderr still has it all
        print(f"# sidecar write failed ({exc}); full record on stderr", file=sys.stderr)
    print(f"# sidecar: {json.dumps(sidecar, separators=(',', ':'))}", file=sys.stderr)
    assert len(line) <= MAX_STDOUT_LINE, len(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
