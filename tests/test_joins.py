"""Spatial join recipes vs the naive nested-loop ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import duckdb_geography_spark.functions as G
from duckdb_geography_spark import joins as J
from duckdb_geography_spark.functions import data as D


@pytest.fixture(scope="module")
def sample(spark):
    cities = D.s2_data_cities(spark).cache()
    countries = D.s2_data_countries(spark).cache()
    naive = (
        countries.crossJoin(
            cities.select(F.col("name").alias("city"), F.col("geog").alias("cgeog"))
        )
        .where(G.s2_intersects("geog", "cgeog"))
        .select("name", "city")
    )
    truth = {(r.name, r.city) for r in naive.collect()}
    return cities, countries, truth


def test_covering_join_matches_naive(spark, sample):
    cities, countries, truth = sample
    got = J.covering_join(
        countries,
        cities.select(F.col("name").alias("city"), F.col("geog").alias("geog")),
        predicate="intersects",
        level=7,
        left_key="name",
        right_key="city",
    ).select("name", "city")
    assert {(r.name, r.city) for r in got.collect()} == truth


def test_covering_join_broadcast(spark, sample):
    cities, countries, truth = sample
    got = J.covering_join(
        cities.select(F.col("name").alias("city"), "geog"),
        countries,
        predicate="intersects",
        level=7,
        left_key="city",
        right_key="name",
        broadcast_right=True,
    ).select("name", "city")
    assert {(r.name, r.city) for r in got.collect()} == truth


def test_cell_containment_join(spark, sample):
    cities, countries, truth = sample
    pts = cities.select(
        F.col("name").alias("city"),
        J.C.s2_cellfromlonlat(G.s2_x("geog"), G.s2_y("geog")).alias("cell"),
    )
    got = J.cell_containment_join(
        pts, countries.select("name", "geog"), level=7, broadcast_regions=True
    ).select("name", "city")
    got_set = {(r.name, r.city) for r in got.collect()}
    # cell-center containment can differ from raw-point containment only
    # within ~2cm of a border; with our synthetic data they must agree
    assert got_set == truth


def test_point_side_is_pure_column(spark, sample, tmp_path):
    cities, countries, _ = sample
    pts = cities.select(
        F.col("name").alias("city"),
        J.C.s2_cellfromlonlat(G.s2_x("geog"), G.s2_y("geog")).alias("cell"),
    )
    # materialize both sides so lineage UDFs (WKT parse) drop out
    pts = spark.createDataFrame(pts.toPandas())
    cdir = str(tmp_path / "countries")
    countries.select("name", "geog").write.mode("overwrite").parquet(cdir)
    regions = spark.read.parquet(cdir)
    joined = J.cell_containment_join(pts, regions, level=7, refine=False)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the points side must not contain a Python eval; the single
    # ArrowEvalPython allowed is the region-side covering UDF
    assert plan.count("ArrowEvalPython") <= 1


def test_distance_join(spark, sample):
    cities, _, _ = sample
    left = cities.select(F.col("name").alias("a"), "geog").limit(40)
    right = cities.select(F.col("name").alias("b"), F.col("geog").alias("geog2")).limit(40)
    naive = (
        left.crossJoin(right)
        .where(G.s2_dwithin("geog", "geog2", 2_000_000))
        .select("a", "b")
    )
    truth = {(r.a, r.b) for r in naive.collect()}
    got = J.distance_join(
        left,
        right.withColumnRenamed("geog2", "geog"),
        meters=2_000_000,
        left_key="a",
        right_key="b",
    ).select("a", "b")
    assert {(r.a, r.b) for r in got.collect()} == truth


def test_level_for_radius():
    assert J.level_for_radius_meters(2_000_000) <= 4
    assert J.level_for_radius_meters(100) >= 13
    assert J.level_for_radius_meters(0) == 30
