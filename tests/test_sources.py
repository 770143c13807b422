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


def _py_interleave(vals, bits):
    acc = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            acc |= ((v >> b) & 1) << (b * n + i)
    return acc


def test_zorder_value_matches_reference_interleave(spark):
    from duckdb_geography_spark import sources as S

    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 100, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", S.zorder_value(["a", "b"], bits=16).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_interleave([r["a"], r["b"]], 16), (r["a"], r["b"])
    # stays JVM-side: no Python eval node in the plan
    plan = df.select(S.zorder_value(["a", "b"]).alias("z"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # 3-column form
    df3 = spark.createDataFrame([(3, 5, 7)], "a long, b long, c long")
    (r3,) = df3.select(S.zorder_value(["a", "b", "c"], bits=8).alias("z")).collect()
    assert r3["z"] == _py_interleave([3, 5, 7], 8)
    import pytest

    with pytest.raises(ValueError, match="<= 62"):
        S.zorder_value(["a", "b", "c"], bits=21)
    with pytest.raises(ValueError, match=">= 2"):
        S.zorder_value(["a"])


def test_quantize_dim_bins_and_clamps(spark):
    from duckdb_geography_spark import sources as S

    df = spark.createDataFrame(
        [(-200.0,), (-180.0,), (0.0,), (179.99,), (400.0,)], "lon double"
    )
    got = [r["q"] for r in df.select(S.quantize_dim("lon", -180.0, 180.0, bits=8).alias("q")).collect()]
    assert got[0] == 0          # clamped low
    assert got[1] == 0
    assert got[2] == 128        # midpoint
    assert got[4] == 255        # clamped high
    assert all(0 <= q <= 255 for q in got)


def test_write_zordered_tightens_rowgroup_stats(spark, tmp_path):
    import pyarrow.parquet as pq

    from duckdb_geography_spark import sources as S

    # two independent dims; random-ish order in the input
    rows = [((i * 7919) % 1024, (i * 104729) % 1024, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long, rid long")
    zpath = str(tmp_path / "zordered")
    plain = str(tmp_path / "plain")
    S.write_zordered(df, zpath, ["x", "y"], bits=10, num_files=8)
    df.repartition(8).write.parquet(plain)

    def file_spans(path, col):
        import glob

        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(g).column(
                    [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                ).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(
                    [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                ).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return spans

    # z-ordered files are tight on BOTH dims; hash-partitioned files
    # each span ~the full domain
    for col in ("x", "y"):
        z_avg = sum(file_spans(zpath, col)) / 8
        p_avg = sum(file_spans(plain, col)) / 8
        assert z_avg < p_avg * 0.7, (col, z_avg, p_avg)
    # round trip preserves rows
    back = spark.read.parquet(zpath)
    assert back.count() == 4096
    assert {r["rid"] for r in back.select("rid").collect()} == set(range(4096))
