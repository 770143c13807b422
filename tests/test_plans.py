"""Plan-shape invariants for every driver query.

These are the properties that decide whether a query survives a 100x
scale-up, checked mechanically off `.explain` output:

- no CartesianProduct / BroadcastNestedLoopJoin anywhere (every join
  must hash on a key);
- parquet scans stay pruned: a query must not read columns it does not
  use (ReadSchema), and key filters must reach the scan
  (PushedFilters);
- the hot cell/text paths stay JVM-side (no Python eval stage where
  the implementation promises pure Columns).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def frames(spark, entry):
    return {name: fn(spark, SF_DIR) for name, fn in entry.queries().items()}


@pytest.fixture(scope="module")
def plans(frames):
    return {
        name: df._jdf.queryExecution().executedPlan().toString()
        for name, df in frames.items()
    }


def test_no_complex_types_in_gate_output(frames):
    """No gate may return a top-level array/map/struct column: the
    driver's correctness canonicalizer sorts the pandas result by all
    columns and cannot factorize/hash list cells (this erred
    label_centroids in the round-8 record even though the values were
    correct). Gates with vector-shaped results must posexplode to
    scalar rows instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {
        name: [f.name for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        for name, df in frames.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert offenders == {}


def test_no_hof_exprs_in_scan_filters(plans):
    """No interpreted higher-order-function expression may appear in a
    FileScan's pushed DataFilters. Catalyst rewrites inferred
    constraints (join-key isnotnull, generate size>0) in terms of the
    UNDERLYING expression and pushes them into the scan — for a HOF
    like a simhash signature or a k x dim argmax-dot that means
    re-evaluating the whole expression per row per scan, on top of the
    projection that computes it for real. This cost simhash_pairs 17x
    (round 8) before the lineage cut; the invariant pins the fix for
    every gate."""
    offenders = {}
    for name, p in plans.items():
        for line in p.splitlines():
            if "FileScan" in line and (
                "aggregate(" in line or "zip_with(" in line
            ):
                offenders.setdefault(name, []).append(line.strip()[:90])
    assert offenders == {}


def test_no_cartesian_shapes_anywhere(plans):
    offenders = {
        name: [k for k in ("CartesianProduct", "BroadcastNestedLoopJoin") if k in p]
        for name, p in plans.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert offenders == {}


#: queries promised to be pure Column expressions (COVERAGE.md): a
#: Python eval stage appearing here means a UDF crept into a hot path
_PURE_JVM = [
    "cell_bitops",
    "text_stats",
    "langid",
    "rolling_fingerprint",
    "simhash_suite",
    "minhash_lsh_candidates",
    "dedup_exact",
    "haversine_pairs",
    "tpch_pricing_summary",
    "tpch_top_orders",
    "events_hourly",
    "bm25_retrieval",
    "tfidf_vectors",
    "dup_spans",
    "dsir_weights",
    "jl_project",
    "jl_topk",
    "token_budget_gate",
    # round-8 additions: CDC, linear classifier, drift, web suite are
    # pure Column plans end to end
    "snapshot_diff",
    "linear_score",
    "vocab_drift",
    "web_suite",
]

#: queries promised to run their vector math as Arrow-batched numpy
#: kernels (similarity.py): ArrowEvalPython stages are expected, but
#: row-at-a-time BatchEvalPython anywhere is a regression
_ARROW_VECTORIZED = [
    "embedding_topk",
    "lsh_topk",
    "ivf_suite",
    # round 11: the int8 quantize+dot moved from interpreted HOF
    # Columns (27k rows/s) to one Arrow struct kernel (8x at sf10)
    "int8_topk",
]


@pytest.mark.parametrize("name", _PURE_JVM)
def test_hot_paths_stay_jvm_side(plans, name):
    p = plans[name]
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, name


@pytest.mark.parametrize("name", _ARROW_VECTORIZED)
def test_vector_paths_are_arrow_not_rowwise(plans, name):
    p = plans[name]
    assert "ArrowEvalPython" in p, name
    assert "BatchEvalPython" not in p, name


def test_rrf_fuse_plan_is_pure_jvm_over_checkpointed_legs(plans):
    """Since round 9 hybrid_rrf_topk materializes its two legs as
    concurrent jobs (the Arrow-vectorized cosine runs inside the dense
    leg's own job — covered by embedding_topk above); the FUSED plan
    the gate returns must read the two checkpointed n_each-row frames
    with no Python eval stage of any kind."""
    p = plans["rrf_hybrid"]
    assert "ExistingRDD" in p or "LogicalRDD" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_column_pruning_reaches_scan(plans):
    # dedup_exact touches only (doc_id, text): the documents scan must
    # not read the other columns
    p = plans["dedup_exact"]
    for line in p.splitlines():
        if "ReadSchema" in line and "documents" in p:
            assert "lang_hint" not in line and "quality" not in line


def test_filter_pushdown_reaches_scan(spark, entry):
    # the lsh/ivf queries filter vec_id != 0 on the embeddings scan.
    # Other test modules may have cached this parquet (cache lookup is
    # by logical plan, which swaps the FileScan for InMemoryTableScan
    # and hides PushedFilters) — drop caches so we see the real scan.
    spark.catalog.clearCache()
    df = entry.queries()["ivf_suite"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in p
    assert "vec_id" in p.split("PushedFilters:")[1].split("]")[0]


def test_broadcast_joins_where_dims_are_small(plans):
    # the covering joins broadcast the 25-row dimension side
    for name in ("pip_covering_join", "cell_containment_join"):
        assert "BroadcastHashJoin" in plans[name], name


def test_topk_is_takeordered_not_global_sort(plans):
    # top-k queries must plan a TakeOrderedAndProject, not a full sort
    for name in ("embedding_topk", "lsh_topk", "ivf_suite", "tpch_top_orders", "jl_topk"):
        assert "TakeOrderedAndProject" in plans[name], name


def test_snap_cast_distance_is_join_free(plans):
    """The round-6 snap-cast gate is pure map-side per row (parse +
    cast + chord) — any join appearing means the recipe regressed to
    pairing through a shuffle."""
    p = plans["snap_cast_distance"]
    assert "Join" not in p


def test_bounds_agg_ships_boxes_not_blobs(spark):
    """VERDICT r6 item 3: a corpus-wide bounds aggregate must not move
    the geography column through the shuffle. The Column form projects
    the 4-double box below the exchange (ArrowEvalPython under the
    Exchange, blob pruned from the shuffle projection); the DataFrame
    form pre-reduces per partition (MapInPandas) and shuffles only
    partitions x groups tiny rows into the final combine."""
    from pyspark.sql import functions as F

    from duckdb_geography_spark.functions.bounds import (
        bounds_box_agg_df,
        s2_bounds_box_agg,
    )
    from duckdb_geography_spark.functions.io import s2_geogfromtext

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        s2_geogfromtext(
            F.concat(
                F.lit("POINT ("),
                (F.col("id") % 60).cast("double"),
                F.lit(" "),
                (F.col("id") % 40).cast("double"),
                F.lit(")"),
            )
        ).alias("g"),
    )

    p1 = (
        df.groupBy("k")
        .agg(s2_bounds_box_agg("g").alias("box"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ex = p1[p1.index("Exchange hashpartitioning") :]
    below = ex[ex.index("Project") : ex.index("ArrowEvalPython")]
    assert " g#" not in below, f"geography blob crosses the exchange:\n{below}"

    p2 = (
        bounds_box_agg_df(df, "g", ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exi = p2.index("Exchange")
    # the per-partition Update (MapInPandas) runs BELOW the exchange;
    # the shuffle projection is key + 4 doubles, no geography column
    assert "MapInPandas" in p2[exi:], p2
    shuffled = p2[exi:].splitlines()[1]
    assert " g#" not in shuffled, f"blob in shuffle projection: {shuffled}"
