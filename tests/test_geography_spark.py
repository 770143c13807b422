"""Port of the reference's sqllogictest goldens to the Spark surface
(accessors.test, functions_io.test, binary_index_ops.test, bounds.test,
cell_ops.test — see BASELINE.md for the pinned values)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import duckdb_geography_spark.functions as G


def geo_df(spark, **wkts):
    """One-row DataFrame with each kwarg parsed as a geography column."""
    names = list(wkts)
    df = spark.createDataFrame([tuple(wkts[n] for n in names)], names)
    return df.select(*[G.s2_geogfromtext(F.col(n)).alias(n) for n in names])


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


class TestIO:
    def test_wkt_roundtrip_format6(self, spark):
        df = geo_df(spark, g="POINT (-64 45)")
        assert one(df.select(G.s2_format("g", 6).alias("t"))).t == "POINT (-64 45)"

    def test_novalidate_roundtrip(self, spark):
        df = spark.createDataFrame([("LINESTRING (0 0, 0 0, 1 1)",)], ["w"])
        out = one(
            df.select(G.s2_format(G.s2_geogfromtext_novalidate("w"), 6).alias("t"))
        )
        assert out.t == "LINESTRING (0 0, 0 0, 1 1)"

    def test_validate_raises(self, spark):
        df = spark.createDataFrame([("LINESTRING (0 0, 0 0, 1 1)",)], ["w"])
        with pytest.raises(Exception, match="identical"):
            df.select(G.s2_geogfromtext("w").alias("g")).collect()

    def test_wkb_parse_golden(self, spark):
        wkb = bytes.fromhex("01010000000000000000003e400000000000002440")
        df = spark.createDataFrame([(bytearray(wkb),)], "b binary")
        out = one(df.select(G.s2_format(G.s2_geogfromwkb("b"), 6).alias("t")))
        assert out.t == "POINT (30 10)"

    def test_wkb_roundtrip(self, spark):
        df = geo_df(spark, g="POINT (-64 45)")
        out = one(
            df.select(G.s2_format(G.s2_geogfromwkb(G.s2_aswkb("g")), 6).alias("t"))
        )
        assert out.t == "POINT (-64 45)"

    def test_prepare(self, spark):
        df = geo_df(spark, small="POINT (30 10)", big="LINESTRING (0 0, 1 1, 2 2, 3 3, 4 4)")
        out = one(
            df.select(
                G.s2_format(G.s2_prepare("small"), 6).alias("s"),
                G.s2_astext(G.s2_prepare("big")).alias("b"),
            )
        )
        assert out.s == "POINT (30 10)"
        assert out.b.startswith("<S2ShapeIndex") and out.b.endswith("b>")


class TestAccessors:
    def test_goldens(self, spark):
        df = geo_df(
            spark,
            pe="POINT EMPTY",
            p="POINT (0 1)",
            l2="LINESTRING (0 1, 2 3)",
            tri="POLYGON ((0 0, 0 1, 1 0, 0 0))",
            pt64="POINT (-64 45)",
            gc="GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 0, 1 1))",
            gce="GEOMETRYCOLLECTION EMPTY",
        )
        r = one(
            df.select(
                G.s2_isempty("pe").alias("e1"),
                G.s2_isempty("p").alias("e2"),
                G.s2_area("pe").alias("a0"),
                G.s2_area("p").alias("a1"),
                G.s2_area("l2").alias("a2"),
                F.round(G.s2_area("tri")).alias("a3"),
                F.round(G.s2_perimeter("tri")).alias("per"),
                F.round(G.s2_length("l2")).alias("len"),
                G.s2_length("tri").alias("len0"),
                G.s2_x("pe").alias("xe"),
                G.s2_x("l2").alias("xl"),
                F.round(G.s2_x("pt64")).alias("x"),
                F.round(G.s2_y("pt64")).alias("y"),
                G.s2_dimension("pt64").alias("d0"),
                G.s2_dimension("l2").alias("d1"),
                G.s2_dimension("tri").alias("d2"),
                G.s2_dimension("gce").alias("dm1"),
                G.s2_dimension("gc").alias("dgc"),
                G.s2_num_points("pt64").alias("n1"),
                G.s2_num_points("l2").alias("n2"),
                G.s2_num_points("gce").alias("n0"),
            )
        )
        assert r.e1 is True and r.e2 is False
        assert r.a0 == 0 and r.a1 == 0 and r.a2 == 0
        assert r.a3 == 6182489131
        assert r.per == 379640
        assert r.len == 314403 and r.len0 == 0
        assert math.isnan(r.xe) and math.isnan(r.xl)
        assert r.x == -64 and r.y == 45
        assert (r.d0, r.d1, r.d2, r.dm1, r.dgc) == (0, 1, 2, -1, 1)
        assert (r.n1, r.n2, r.n0) == (1, 2, 0)

    def test_validity(self, spark):
        df = spark.createDataFrame(
            [("LINESTRING (0 0, 1 1)",), ("LINESTRING (0 0, 0 0, 1 1)",)], ["w"]
        )
        got = df.select(
            G.s2_is_valid(G.s2_geogfromtext_novalidate("w")).alias("v"),
            G.s2_is_valid_reason(G.s2_geogfromtext_novalidate("w")).alias("r"),
        ).collect()
        assert [g.v for g in got] == [True, False]
        assert got[0].r == "" and got[1].r == "Vertices 0 and 1 are identical"


class TestPredicates:
    def test_mayintersect(self, spark):
        df = geo_df(spark, a="POINT (-64 45)", b="POINT (-64 46)", e="POINT EMPTY")
        r = one(
            df.select(
                G.s2_mayintersect("a", "a").alias("t"),
                G.s2_mayintersect("a", "b").alias("f"),
                G.s2_mayintersect("a", "e").alias("fe"),
                G.s2_mayintersect("e", "b").alias("fe2"),
            )
        )
        assert (r.t, r.f, r.fe, r.fe2) == (True, False, False, False)

    def test_point_polygon(self, spark):
        df = geo_df(
            spark,
            sq="POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            pin="POINT (5 5)",
            pout="POINT (15 5)",
        )
        r = one(
            df.select(
                G.s2_intersects("sq", "pin").alias("i"),
                G.s2_intersects("sq", "pout").alias("o"),
                G.s2_contains("sq", "pin").alias("c"),
                G.s2_contains("pin", "sq").alias("cr"),
                G.s2_equals("sq", "sq").alias("eq"),
            )
        )
        assert (r.i, r.o, r.c, r.cr, r.eq) == (True, False, True, False, True)

    def test_overlay_quirks(self, spark):
        df = geo_df(spark, a="POINT (-64 45)", b="POINT (-64 46)", e="POINT EMPTY")
        r = one(
            df.select(
                G.s2_format(G.s2_intersection("a", "b"), 6).alias("disjoint"),
                G.s2_format(G.s2_intersection("a", "e"), 6).alias("rhs_empty"),
                G.s2_format(G.s2_intersection("e", "a"), 6).alias("lhs_empty"),
                G.s2_format(G.s2_intersection("a", "a"), 6).alias("same"),
                G.s2_format(G.s2_difference("a", "b"), 6).alias("d_disjoint"),
                G.s2_format(G.s2_difference("e", "a"), 6).alias("d_lhs_empty"),
                G.s2_format(G.s2_difference("a", "a"), 6).alias("d_same"),
                G.s2_format(G.s2_union("a", "e"), 6).alias("u_rhs_empty"),
                G.s2_format(G.s2_union("a", "b"), 6).alias("u_two"),
            )
        )
        assert r.disjoint == "GEOMETRYCOLLECTION EMPTY"
        assert r.rhs_empty == "POINT (-64 45)"
        assert r.lhs_empty == "POINT (-64 45)"
        assert r.same == "POINT (-64 45)"
        assert r.d_disjoint == "POINT (-64 45)"
        assert r.d_lhs_empty == "GEOMETRYCOLLECTION EMPTY"
        assert r.d_same == "GEOMETRYCOLLECTION EMPTY"
        assert r.u_rhs_empty == "POINT (-64 45)"
        assert r.u_two == "MULTIPOINT ((-64 45), (-64 46))"

    def test_distance_goldens(self, spark):
        df = geo_df(
            spark,
            van="POINT (-123.12359 49.2753624)",
            tor="POINT (-79.4219667 43.7019257)",
            e="POINT EMPTY",
        )
        r = one(
            df.select(
                G.s2_distance("van", "tor").alias("d"),
                G.s2_distance("e", "tor").alias("de"),
                G.s2_max_distance("tor", "e").alias("me"),
                G.s2_dwithin("van", "tor", 3000000).alias("w3"),
                G.s2_dwithin("van", "tor", 4000000).alias("w4"),
                G.s2_dwithin("e", "tor", float("inf")).alias("we"),
            )
        )
        assert r.d == 3354018.3461295413
        assert r.de == float("inf") and r.me == float("inf")
        assert (r.w3, r.w4, r.we) == (False, True, False)


class TestBounds:
    def test_bounds_box(self, spark):
        df = geo_df(spark, e="POINT EMPTY", mp="MULTIPOINT (0 1, 2 3)")
        r = one(df.select(G.s2_bounds_box("e").alias("be"), G.s2_bounds_box("mp").alias("bm")))
        assert (r.be.xmin, r.be.ymin, r.be.xmax, r.be.ymax) == (
            180.0,
            57.29577951308232,
            -180.0,
            0.0,
        )
        assert (r.bm.xmin, r.bm.ymin, r.bm.xmax, r.bm.ymax) == (
            0.0,
            1.0,
            1.9999999999999996,
            3.0000000000000004,
        )

    def test_cell_center_covering(self, spark):
        df = spark.range(1)
        cell = G.s2_cellfromlonlat(F.lit(-64.0), F.lit(45.0))
        geog = G.s2_cell_center_to_geography(cell)
        r = one(
            df.select(
                G.s2_covering(geog).alias("cov"),
                G.s2_covering_fixed_level(geog, 5).alias("cov5"),
                G.s2_bounds_box(geog).alias("bb"),
            )
        )
        assert len(r.cov) == 1
        tok = one(df.select(G.s2_cell_token(F.lit(r.cov[0])).alias("t"))).t
        assert tok == "4b59a0cd83b5de49"
        dbg5 = one(df.select(G.s2_cell_debug_string(F.lit(r.cov5[0])).alias("d"))).d
        assert dbg5 == "2/11223"
        # golden: bounds.test:19-22 {xmin: -63.99999997805, ymin: 45.0000000116166, ...}
        assert round(r.bb.xmin, 11) == -63.99999997805
        assert round(r.bb.ymin, 10) == 45.0000000116
        assert r.bb.xmin == r.bb.xmax and r.bb.ymin == r.bb.ymax

    def test_box_ops(self, spark):
        df = spark.range(1)
        r = one(
            df.select(
                G.s2_box(5.989, 47.302, 15.017, 54.983).alias("b"),
                G.s2_box_union(
                    G.s2_box(0, 1, 2, 3), G.s2_box(4, 5, 6, 7)
                ).alias("u1"),
                G.s2_box_union(
                    G.s2_box(179, 1, 180, 3), G.s2_box(-180, 5, -179, 7)
                ).alias("u2"),
                G.s2_box_intersects(
                    G.s2_box(0, 1, 2, 3), G.s2_box(1, 2, 3, 4)
                ).alias("i1"),
                G.s2_box_intersects(
                    G.s2_box(0, 1, 2, 3), G.s2_box(4, 5, 6, 7)
                ).alias("i2"),
                G.s2_box_intersects(
                    G.s2_box(179, -19, -179, -16), G.s2_box(-180, -20, -179.5, -15)
                ).alias("i3"),
            )
        )
        assert (r.b.xmin, r.b.ymin, r.b.xmax, r.b.ymax) == (5.989, 47.302, 15.017, 54.983)
        assert (r.u1.xmin, r.u1.ymin, r.u1.xmax, r.u1.ymax) == (0.0, 1.0, 6.0, 7.0) or (
            r.u1.xmax == 6.000000000000001
        )
        assert (r.u2.xmin, r.u2.ymin, r.u2.xmax, r.u2.ymax) == (179.0, 1.0, -179.0, 7.0)
        assert (r.i1, r.i2, r.i3) == (True, False, True)

    def test_box_wkb_roundtrip(self, spark):
        df = spark.range(1)
        box = G.s2_box(5.9887, 47.3025, 15.017, 54.9831)
        r = one(df.select(G.s2_format(G.s2_geogfromwkb(G.s2_box_wkb(box)), 4).alias("t")))
        assert r.t == (
            "POLYGON ((5.9887 47.3025, 15.017 47.3025, 15.017 54.9831, 5.9887 54.9831, 5.9887 47.3025))"
        )
        fiji_box = G.s2_box(177.285, -18.288, -179.7933, -16.0209)
        r2 = one(df.select(G.s2_format(G.s2_geogfromwkb(G.s2_box_wkb(fiji_box)), 4).alias("t")))
        assert r2.t.startswith("MULTIPOLYGON (((177.285 -18.288, 180 -18.288")


class TestCasts:
    def test_cell_center_casts(self, spark):
        df = spark.range(1)
        cell = G.s2_cellfromlonlat(F.lit(-64.0), F.lit(45.0))
        r = one(
            df.select(
                G.s2_format(G.s2_cell_center_to_geography(cell), 6).alias("fmt"),
                G.s2_geography_to_cell_center(
                    G.s2_cell_center_to_geography(cell)
                ).alias("back"),
                G.s2_format(G.s2_cell_center_to_geography(F.lit(-1)), 6).alias("bad"),
            )
        )
        assert r.fmt == "POINT (-64 45)"
        back_dbg = one(df.select(G.s2_cell_debug_string(F.lit(r.back)).alias("d"))).d
        assert back_dbg == "2/112230310012123001312232330210"
        assert r.bad == "POINT EMPTY"

    def test_cell_to_geography_golden(self, spark):
        df = spark.range(1)
        cell = G.s2_cell_from_debug_string(F.lit("2/1122303"))
        r = one(df.select(G.s2_format(G.s2_cell_to_geography(cell), 6).alias("t")))
        assert r.t == (
            "POLYGON ((-63.470273 44.898834, -64.286611 45.098989, "
            "-64.779066 44.581998, -63.973842 44.388923, -63.470273 44.898834))"
        )

    def test_cell_union_golden(self, spark):
        df = spark.range(1)
        cell = G.s2_cell_from_debug_string(F.lit("2/0"))
        r = one(
            df.select(
                G.s2_format(
                    G.s2_cell_union_to_geography(G.s2_cell_to_cell_union(cell)), 6
                ).alias("t"),
                G.s2_cell_to_cell_union(F.lit(-1)).alias("invalid"),
            )
        )
        assert r.t == "POLYGON ((45 35.26439, 90 45, 0 90, 0 45, 45 35.26439))"
        assert r.invalid == []

    def test_cell_union_normalize_sorts(self, spark):
        df = spark.range(1)
        c0 = G.s2_cell_from_debug_string(F.lit("0/"))
        c1 = G.s2_cell_from_debug_string(F.lit("1/"))
        r = one(
            df.select(
                G.s2_cell_union_normalize(F.array(c1, c0)).alias("u"),
            )
        )
        dbg = [
            one(spark.range(1).select(G.s2_cell_debug_string(F.lit(v)).alias("d"))).d
            for v in r.u
        ]
        assert dbg == ["0/", "1/"]

    def test_wkb_cell_contracts(self, spark):
        df = geo_df(
            spark,
            pt="POINT (-64 45)",
            gc="GEOMETRYCOLLECTION (POINT (-64 45))",
            gce="GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
            line="LINESTRING (-64 45, 0 0)",
            mp="MULTIPOINT (-64 45, 0 0)",
        )
        r = one(
            df.select(
                G.s2_cell_debug_string(G.s2_cellfromwkb(G.s2_aswkb("pt"))).alias("a"),
                G.s2_cell_debug_string(G.s2_cellfromwkb(G.s2_aswkb("gc"))).alias("b"),
                G.s2_cell_debug_string(G.s2_cellfromwkb(G.s2_aswkb("gce"))).alias("c"),
                G.s2_cell_debug_string(
                    G.s2_arbitrarycellfromwkb(G.s2_aswkb("line"))
                ).alias("d"),
            )
        )
        assert r.a == "2/112230310012123001312232330210"
        assert r.b == "2/112230310012123001312232330210"
        assert r.c == "Invalid: ffffffffffffffff"
        assert r.d == "2/112230310012123001312232330210"
        with pytest.raises(Exception, match="more than one point"):
            df.select(G.s2_cellfromwkb(G.s2_aswkb("mp")).alias("x")).collect()
        with pytest.raises(Exception, match="non-point"):
            df.select(G.s2_cellfromwkb(G.s2_aswkb("line")).alias("x")).collect()


class TestData:
    def test_sample_data(self, spark):
        from duckdb_geography_spark.functions import data as D

        cities = D.s2_data_cities(spark)
        countries = D.s2_data_countries(spark)
        assert cities.count() == 243
        assert countries.count() == 177
        deps = D.s2_dependencies(spark)
        assert deps.count() == 5
        # city-in-own-cell self-check analogue (cell_ops.test:302-305)
        checked = cities.select(
            G.s2_intersects(
                G.s2_cell_center_to_geography(
                    G.s2_cellfromlonlat(G.s2_x("geog"), G.s2_y("geog"))
                ),
                F.col("geog"),
            ).alias("ok")
        )
        agg = checked.agg(F.sum(F.col("ok").cast("int")).alias("n")).collect()[0]
        assert agg.n == 243

    def test_lookup_distance_golden(self, spark):
        from duckdb_geography_spark.functions import data as D

        df = spark.createDataFrame(
            [(bytearray(D.s2_data_city("Vancouver")), bytearray(D.s2_data_city("Toronto")))],
            "van binary, tor binary",
        )
        assert one(df.select(G.s2_distance("van", "tor").alias("d"))).d == 3354018.3461295413
        with pytest.raises(KeyError):
            D.s2_data_city("Nowhereville")


class TestAgg:
    def test_bounds_box_agg_column(self, spark):
        from duckdb_geography_spark.functions.bounds import s2_bounds_box_agg

        df = geo_df(spark, g="MULTIPOINT (0 1, 2 3)")
        r = one(df.agg(s2_bounds_box_agg("g").alias("box")))
        assert (r.box.xmin, r.box.ymin, r.box.xmax, r.box.ymax) == (
            0.0,
            1.0,
            1.9999999999999996,
            3.0000000000000004,
        )
        # grouped variant partial-aggregates per group
        df2 = spark.createDataFrame(
            [(1, "POINT (0 1)"), (1, "MULTIPOINT (2 3, 4 5)"), (2, "POINT (10 -10)")],
            ["k", "w"],
        ).select("k", G.s2_geogfromtext("w").alias("g"))
        rows = df2.groupBy("k").agg(s2_bounds_box_agg("g").alias("box")).orderBy("k").collect()
        assert round(rows[0].box.xmax, 6) == 4.0 and round(rows[1].box.ymin, 6) == -10.0

    def test_bounds_box_agg_df(self, spark):
        from duckdb_geography_spark.functions.bounds import bounds_box_agg_df

        df = geo_df(spark, g="MULTIPOINT (0 1, 2 3)")
        r = one(bounds_box_agg_df(df, "g"))
        assert (r.xmin, r.ymin, r.xmax, r.ymax) == (
            0.0,
            1.0,
            1.9999999999999996,
            3.0000000000000004,
        )

    def test_bounds_box_agg_empty(self, spark):
        df = geo_df(spark, g="POINT EMPTY")
        from duckdb_geography_spark.functions.bounds import bounds_box_agg_df

        r = one(bounds_box_agg_df(df, "g"))
        assert (r.xmin, r.ymin, r.xmax, r.ymax) == (180.0, 57.29577951308232, -180.0, 0.0)


def test_null_rows_flow_through_casts_and_accessors(spark):
    """NULL geography/WKB rows must yield NULL, not crash the task
    (int64 pandas Series cannot hold None) or coerce to a value
    (isempty used to map NULL -> true)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, StructField, StructType

    from duckdb_geography_spark.functions.accessors import s2_isempty
    from duckdb_geography_spark.functions.casts import (
        s2_arbitrarycellfromwkb,
        s2_cellfromwkb,
        s2_geography_to_cell_center,
    )
    from duckdb_geography_spark.functions.io import s2_aswkb, s2_geogfromtext

    schema = StructType([StructField("b", BinaryType())])
    df = spark.createDataFrame([(None,)], schema).withColumn(
        "g", s2_geogfromtext(F.lit("POINT (1 2)"))
    )
    row = df.select(
        s2_geography_to_cell_center(F.lit(None).cast("binary")).alias("cc"),
        s2_cellfromwkb("b").alias("cw"),
        s2_arbitrarycellfromwkb("b").alias("ca"),
        s2_isempty(F.lit(None).cast("binary")).alias("e"),
        s2_isempty("g").alias("e2"),
        s2_cellfromwkb(s2_aswkb("g")).alias("cw2"),
    ).collect()[0]
    assert row.cc is None and row.cw is None and row.ca is None
    assert row.e is None and row.e2 is False
    assert row.cw2 is not None
