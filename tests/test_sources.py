"""Sources/sinks: TSV geography ingestion + cell-partitioned parquet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import duckdb_geography_spark.functions as G
from duckdb_geography_spark import sources as S
from duckdb_geography_spark import synth
from duckdb_geography_spark.functions import cells as C


def test_tsv_roundtrip(spark, tmp_path):
    tsv = tmp_path / "cities.tsv"
    tsv.write_text(
        "name\tpopulation\tgeog\n"
        "Vancouver\t603502\tPOINT (-123.12359 49.2753624)\n"
        "Toronto\t3934421\tPOINT (-79.4219667 43.7019257)\n"
    )
    df = S.read_tsv_geography(spark, str(tsv))
    rows = df.select("name", G.s2_format("geog", 6).alias("t")).collect()
    got = {(r.name, r.t) for r in rows}
    assert ("Vancouver", "POINT (-123.12359 49.275362)") in got


def test_partitioned_sink_prunes(spark, tmp_path):
    path = str(tmp_path / "cust_cells")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey",
        C.s2_cellfromlonlat(synth.cust_lon(), synth.cust_lat()).alias("cell"),
    )
    S.write_partitioned_by_cell(cust, path, level=2)
    # directories keyed by token
    parts = [d for d in os.listdir(path) if d.startswith("partition_cell=")]
    assert len(parts) > 4
    token = parts[0].split("=", 1)[1]
    pruned = S.read_cell_partition(spark, path, token)
    n = pruned.count()
    assert 0 < n < cust.count()
    # the filter must be a partition filter (pruned at plan time)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(partition_cell" in plan
    # every row is inside the partition's cell
    back = pruned.withColumn(
        "ok",
        C.s2_cell_contains(C.s2_cell_from_token(F.lit(token)), F.col("cell")),
    )
    assert back.where(~F.col("ok")).count() == 0


def test_bucketed_join_skips_exchange(spark, tmp_path):
    from duckdb_geography_spark import sources as S

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 2000).select(
            F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("x")
        )
        items = spark.range(0, 6000).select(
            (F.col("id") % 2000).alias("o_orderkey"), F.col("id").alias("li")
        )
        S.write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8, ["o_orderkey"])
        S.write_bucketed(items, "t_items_b", ["o_orderkey"], 8, ["o_orderkey"])
        a = S.read_bucketed(spark, "t_orders_b")
        b = S.read_bucketed(spark, "t_items_b")
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed sides: the join runs with no shuffle at all
        assert "Exchange" not in plan, plan
        assert joined.count() == 6000
        # the same join on plain parquet shuffles both sides
        plain = orders.join(items, "o_orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_ivf_partitioned_topk_prunes_and_matches(spark, tmp_path):
    from duckdb_geography_spark import sources as S
    from duckdb_geography_spark.llm import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    base = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf")
    S.write_ivf_partitioned(base, path, n_centroids=8)
    # the write trained + persisted centroids next to the layout
    cents = S.load_ivf_centroids(spark, path)
    assert cents is not None and cents.shape == (8, 64)
    pruned = S.ivf_topk_pruned(spark, path, q, k=5, n_centroids=8, n_probe=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the probe filter must prune DIRECTORIES (partition filter), not
    # rows (pushed filter): reading n_probe/n_centroids of the bytes
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1].split("]")[0], plan
    # same trained quantizer on the raw table -> identical results
    raw = similarity.ivf_topk(base, q, k=5, n_centroids=8, n_probe=3, centroids=cents)
    assert [(r.vec_id, r.score) for r in pruned.collect()] == [
        (r.vec_id, r.score) for r in raw.collect()
    ]


def test_ivf_untrained_layout_still_works(spark, tmp_path):
    from duckdb_geography_spark import sources as S
    from duckdb_geography_spark.llm import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    base = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf_seeded")
    S.write_ivf_partitioned(base, path, n_centroids=8, train=False)
    pruned = S.ivf_topk_pruned(spark, path, q, k=5, n_centroids=8, n_probe=3)
    raw = similarity.ivf_topk(base, q, k=5, n_centroids=8, n_probe=3)
    assert [(r.vec_id, r.score) for r in pruned.collect()] == [
        (r.vec_id, r.score) for r in raw.collect()
    ]
