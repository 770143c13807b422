"""GeoCol fluent chaining — the reference's dot-chain style
(cell_ops.test:95-97: ``s2_aswkb(...).s2_cellfromwkb()``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_geography_spark.fluent import GeoCol, geo
from duckdb_geography_spark.functions.io import s2_geogfromtext

LEAF = "2/112230310012123001312232330210"


def test_reference_chain(spark):
    # cell_ops.test:95-97 verbatim semantics:
    # s2_aswkb('POINT (-64 45)'::GEOGRAPHY).s2_cellfromwkb() -> LEAF
    out = spark.range(1).select(
        geo(s2_geogfromtext(F.lit("POINT (-64 45)")))
        .s2_aswkb()
        .s2_cellfromwkb()
        .s2_cell_debug_string()
        .alias("dbg")
    )
    assert out.collect()[0].dbg == LEAF


def test_chain_with_args_and_geocol_operand(spark):
    a = geo(s2_geogfromtext(F.lit("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
    b = geo(s2_geogfromtext(F.lit("POINT (5 5)")))
    out = spark.range(1).select(
        a.s2_contains(b).alias("c"),
        a.s2_format(6).alias("wkt"),
        b.s2_x().alias("x"),
    )
    row = out.collect()[0]
    assert row.c is True
    assert row.wkt.startswith("POLYGON ((0 0, 10 0")
    assert round(row.x) == 5


def test_column_fallthrough_ends_chain(spark):
    g = geo(s2_geogfromtext(F.lit("POINT (-64 45)")))
    aliased = g.s2_astext().alias("t")
    assert isinstance(aliased, Column)
    assert spark.range(1).select(aliased).collect()[0].t.startswith("POINT")
    # .col is the explicit exit
    assert isinstance(g.col, Column)


def test_cell_chain_from_name(spark):
    df = spark.range(3).select(
        (F.col("id") + 1).alias("k"),
        F.lit(-64.0).alias("lon"),
        F.lit(45.0).alias("lat"),
    )
    out = df.select(
        "k",
        geo(GeoCol("lon").s2_cellfromlonlat("lat").col)
        .s2_cell_parent(5)
        .s2_cell_token()
        .alias("tok5"),
    )
    rows = out.collect()
    assert len({r.tok5 for r in rows}) == 1
    assert rows[0].tok5 == "4b5c"


def test_unknown_s2_name_raises():
    import pytest

    with pytest.raises(AttributeError, match="no s2 function"):
        geo(F.lit(1)).s2_no_such_thing()


def test_operator_forwarding(spark):
    """Python special-method lookup bypasses __getattr__, so GeoCol
    forwards operators explicitly: comparisons/arithmetic on a GeoCol
    must yield real Columns, not TypeError or identity-bool."""
    from pyspark.sql import Column, functions as F
    from duckdb_geography_spark.fluent import geo
    from duckdb_geography_spark.functions.io import s2_geogfromtext

    df = spark.range(1).select(
        s2_geogfromtext(F.lit("POINT (-64 45)")).alias("g")
    )
    gx = geo(F.col("g")).s2_x()
    assert isinstance(gx > -70, Column)
    assert isinstance(gx + 1.0, Column)
    assert isinstance(gx == gx, Column)  # not Python identity False
    # and the predicate actually filters
    assert df.where(geo(F.col("g")).s2_x() > -70).count() == 1
    assert df.where(geo(F.col("g")).s2_x() > -60).count() == 0
    # chained arithmetic mixing GeoCol and literals
    got = df.select(((geo(F.col("g")).s2_x() * 2) / 2).alias("x")).collect()[0]["x"]
    assert abs(got - (-64.0)) < 1e-6  # leaf-cell snap ~2 cm


def test_cell_coercion_chains(spark):
    """geo() chaining over BARE CELL (long) and CELL_UNION
    (array<long>) columns works like the SQL surface: the wrapped
    geography UDFs coerce implicitly (VERDICT r5 item 8)."""
    from duckdb_geography_spark.fluent import geo
    from duckdb_geography_spark.functions.cells import (
        s2_cell_parent,
        s2_cellfromlonlat,
    )

    df = spark.range(1).select(
        s2_cell_parent(s2_cellfromlonlat(F.lit(2.3), F.lit(48.8)), 4).alias("c")
    )
    r = df.select(
        geo("c").s2_area().alias("a"),
        geo("c").s2_perimeter().alias("p"),
        geo("c").s2_dimension().alias("d"),
        geo("c").s2_astext().alias("t"),
        geo(F.array(F.col("c"))).s2_area().alias("ua"),
        geo("c").s2_intersects(geo("c")).alias("ii"),
        geo("c").s2_covering_fixed_level(6).alias("cov"),
    ).head()
    assert r.a > 0 and r.p > 0 and r.d == 2 and r.ii is True
    assert r.t.startswith("POLYGON")
    assert r.ua == r.a  # single-cell union == the cell polygon
    assert len(r.cov) >= 1


def test_snap_to_cell_center_chain(spark):
    """The round-6 cast (s2_snap_to_cell_center) chains like any other
    geography->geography function, including into the asymmetric
    both-cast distance."""
    from duckdb_geography_spark.fluent import geo
    from duckdb_geography_spark.functions.io import s2_geogfromtext

    df = spark.range(1).select(
        s2_geogfromtext(F.lit("POINT (-123.12359 49.2753624)")).alias("v"),
        s2_geogfromtext(F.lit("POINT (-79.4219667 43.7019257)")).alias("t"),
    )
    r = df.select(
        geo("v").s2_snap_to_cell_center().s2_astext().alias("wkt"),
        geo("v")
        .s2_snap_to_cell_center()
        .s2_distance(geo("t").s2_snap_to_cell_center())
        .alias("d_cast"),
        geo("v").s2_distance(geo("t")).alias("d_plain"),
    ).head()
    assert r.wkt.startswith("POINT (-123.123590")
    assert r.d_cast == 3354018.3501422736  # reference both-cast golden
    assert r.d_plain == 3354018.3461295413
