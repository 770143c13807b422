"""Spark Column cell ops vs the numpy core and reference goldens."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from duckdb_geography_spark.functions import cells as C
from duckdb_geography_spark.s2 import cellmath as cm


def _cells_df(spark, n=500, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    lev = rng.integers(0, 31, n)
    leaf = cm.lonlat_to_cellid(lon, lat)
    ids = cm.to_signed(cm.parent(leaf, lev))
    pdf = pd.DataFrame({"id": ids, "lon": lon, "lat": lat, "lev": lev.astype("int32")})
    return pdf, spark.createDataFrame(pdf)


def test_level_parent_child_range_match_numpy(spark):
    pdf, df = _cells_df(spark)
    got = (
        df.select(
            "id",
            C.s2_cell_level("id").alias("level"),
            C.s2_cell_parent("id", F.lit(0)).alias("p0"),
            C.s2_cell_child("id", F.lit(2)).alias("c2"),
            C.s2_cell_range_min("id").alias("rmin"),
            C.s2_cell_range_max("id").alias("rmax"),
            C.s2_cell_token("id").alias("tok"),
            C.s2_cell_from_token(C.s2_cell_token("id")).alias("rt"),
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ids_u = cm.to_unsigned(got["id"].to_numpy())
    assert (got["level"].to_numpy() == cm.level(ids_u)).all()
    assert (cm.to_unsigned(got["p0"].to_numpy()) == cm.parent(ids_u, np.zeros(len(got)))).all()
    assert (cm.to_unsigned(got["c2"].to_numpy()) == cm.child(ids_u, np.full(len(got), 2))).all()
    assert (cm.to_unsigned(got["rmin"].to_numpy()) == cm.range_min(ids_u)).all()
    assert (cm.to_unsigned(got["rmax"].to_numpy()) == cm.range_max(ids_u)).all()
    assert (got["tok"].to_numpy() == cm.token_encode(ids_u)).all()
    assert (got["rt"].to_numpy() == got["id"].to_numpy()).all()


def test_goldens_spark(spark):
    df = spark.range(1)
    row = df.select(
        C.s2_cellfromlonlat(F.lit(-64.0), F.lit(45.0)).alias("cell"),
        C.s2_cellfromlonlat(F.lit(float("nan")), F.lit(float("nan"))).alias("bad"),
    ).collect()[0]
    assert format(np.int64(row.cell).view(np.uint64) if False else row.cell & 0xFFFFFFFFFFFFFFFF, "016x") == "4b59a0cd83b5de49"
    assert row.bad == -1  # sentinel bit pattern

    row = df.select(
        C.s2_cell_token(F.lit(row.cell)).alias("tok"),
        C.s2_cell_from_token(F.lit("4b59a0cd83b5de49")).alias("cell"),
        C.s2_cell_from_token(F.lit("foofy")).alias("invalid"),
        C.s2_cell_from_token(F.lit("be3")).alias("short"),
        C.s2_cell_level(F.lit(row.cell)).alias("lev"),
        C.s2_cell_level(F.lit(-1)).alias("lev_sentinel"),
        C.s2_cell_debug_string(F.lit(row.cell)).alias("dbg"),
    ).collect()[0]
    assert row.tok == "4b59a0cd83b5de49"
    assert row.invalid == 0
    assert np.int64(row.short).view(np.uint64) == np.uint64(0xBE30000000000000)
    assert row.lev == 30 and row.lev_sentinel == -1
    assert row.dbg == "2/112230310012123001312232330210"


def test_contains_intersects_cross_face(spark):
    pdf, df = _cells_df(spark, n=300, seed=11)
    other = _cells_df(spark, n=300, seed=12)[0]
    pdf2 = pdf.copy()
    pdf2["id2"] = other["id"].to_numpy()
    df2 = spark.createDataFrame(pdf2)
    got = df2.select(
        "id",
        "id2",
        C.s2_cell_contains("id", "id2").alias("c"),
        C.s2_cell_intersects("id", "id2").alias("i"),
    ).toPandas()
    a = cm.to_unsigned(got["id"].to_numpy())
    b = cm.to_unsigned(got["id2"].to_numpy())
    assert (got["c"].to_numpy() == cm.contains(a, b)).all()
    assert (got["i"].to_numpy() == cm.intersects(a, b)).all()
    # self-containment across faces 4/5 (negative longs)
    got2 = df.select(C.s2_cell_contains("id", "id").alias("c")).toPandas()
    assert got2["c"].all()


def test_cell_center_and_neighbors(spark):
    pdf, df = _cells_df(spark, n=200, seed=13)
    got = df.select(
        "id",
        C.s2_cell_center_lon("id").alias("clon"),
        C.s2_cell_center_lat("id").alias("clat"),
        C.s2_cell_edge_neighbor("id", F.lit(0)).alias("n0"),
        C.s2_cell_edge_neighbor("id", F.lit(-1)).alias("nbad"),
    ).toPandas()
    ids_u = cm.to_unsigned(got["id"].to_numpy())
    lon, lat = cm.cellid_to_lonlat(ids_u)
    assert np.allclose(got["clon"].to_numpy(), lon, equal_nan=True)
    assert np.allclose(got["clat"].to_numpy(), lat, equal_nan=True)
    assert (cm.to_unsigned(got["n0"].to_numpy()) == cm.edge_neighbors(ids_u)[0]).all()
    assert (got["nbad"].to_numpy() == -1).all()
    # neighbor golden: ('2/').s2_cell_edge_neighbor(0) == '1/'
    face2 = cm.to_signed(np.array([cm.debug_string_decode(["2/"])[0]]))[0]
    row = spark.range(1).select(
        C.s2_cell_debug_string(C.s2_cell_edge_neighbor(F.lit(int(face2)), F.lit(0))).alias("n")
    ).collect()[0]
    assert row.n == "1/"


def test_cell_ops_stay_jvm_side(spark):
    """Hot-path ops must not appear as Python UDFs in the plan."""
    _, df = _cells_df(spark, n=10)
    plan = (
        df.select(
            C.s2_cell_level("id"),
            C.s2_cell_parent("id", 5),
            C.s2_cell_range_min("id"),
            C.s2_cell_range_max("id"),
            C.s2_cell_token("id"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gate_selectexpr_matches_column_helpers(spark):
    """The cell_bitops / cellfromlonlat driver gates build their bit
    math as selectExpr SQL strings (driver-build cost); this pins the
    strings to the public Column helpers they stand in for, so a
    regression in functions/cells.py cannot hide behind the gates'
    inlined SQL (review finding r3)."""
    import __spark_entry__ as e
    from duckdb_geography_spark import synth
    from duckdb_geography_spark.functions import cells as C

    sql_rows = e._q_cell_bitops(spark, "/root/testdata/sf0.001").collect()

    cust = e._t(spark, "/root/testdata/sf0.001", "customer").select("c_custkey")
    col_df = (
        cust.select("c_custkey", synth.key_cell("c_custkey").alias("cell"))
        .select("*", C.s2_cell_parent("cell", 5).alias("parent5"))
        .select(
            "c_custkey",
            "cell",
            C.s2_cell_level("cell").alias("level"),
            "parent5",
            C.s2_cell_range_min("parent5").alias("rmin5"),
            C.s2_cell_range_max("parent5").alias("rmax5"),
            C.s2_cell_token("cell").alias("token"),
            C.s2_cell_contains("parent5", F.col("cell")).alias("parent_contains"),
        )
        .withColumn("token_rt", C.s2_cell_from_token("token"))
        .withColumn("child0", C.s2_cell_child("parent5", 0))
        .withColumn("child3", C.s2_cell_child("parent5", 3))
        .withColumn("inter_pc", C.s2_cell_intersects("parent5", F.col("cell")))
        .withColumn("inter_cc", C.s2_cell_intersects("child0", F.col("child3")))
        .orderBy("c_custkey")
    )
    col_rows = col_df.select(*sql_rows[0].asDict().keys()).collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in col_rows]

    # cellfromlonlat gate: token10 string math vs the Column helpers
    sql_rows = e._q_cellfromlonlat(spark, "/root/testdata/sf0.001").collect()
    cust = e._t(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", synth.cust_lon().alias("lon"), synth.cust_lat().alias("lat")
    )
    leaf = C.s2_cellfromlonlat("lon", "lat")
    col_rows = (
        cust.select("c_custkey", leaf.alias("cell"))
        .select(
            "c_custkey",
            "cell",
            C.s2_cell_token(C.s2_cell_parent("cell", 10)).alias("token10"),
        )
        .orderBy("c_custkey")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in col_rows]


def test_with_cellfromlonlat_pure_jvm(spark):
    """The lateral-alias expression tier must be bit-exact vs the Arrow
    kernel (random + face corners + poles + antimeridian), honor the
    NULL/NaN sentinel contract, and carry no Python stage."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    lons = np.concatenate(
        [rng.uniform(-180, 180, 2000),
         [-180, 180, 0, 45, -45, 135, -135, 179.999999, -179.999999, -64]]
    )
    lats = np.concatenate(
        [rng.uniform(-90, 90, 2000),
         [90, -90, 0, 35.26438968275465, -35.26438968275465, 45, -45,
          89.9999999, -89.9999999, 45]]
    )
    df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
    out = C.with_cellfromlonlat(df, "lon", "lat", "ce").withColumn(
        "cu", C.s2_cellfromlonlat("lon", "lat")
    )
    assert out.where(F.col("ce") != F.col("cu")).count() == 0
    plan = (
        C.with_cellfromlonlat(df, "lon", "lat", "ce")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # no Arrow/Batch python stages
    nd = spark.sql(
        "SELECT CAST('NaN' AS DOUBLE) AS lon, 1.0D AS lat "
        "UNION ALL SELECT CAST(NULL AS DOUBLE), 1.0D "
        "UNION ALL SELECT 1.0D, CAST('NaN' AS DOUBLE)"
    )
    assert [r.c for r in C.with_cellfromlonlat(nd, "lon", "lat", "c").collect()] == [-1, -1, -1]
