"""SQL surface parity: the reference's flagship queries as spark.sql."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from duckdb_geography_spark.functions.register import (
        register_sample_data,
        register_sql_functions,
    )

    register_sql_functions(spark)
    register_sample_data(spark)


def test_smoke(spark):
    assert spark.sql("SELECT s2() AS s").collect()[0].s == "s2"


def test_readme_flagship_join(spark):
    """README.md:14-19 — the reference's front-page query, verbatim
    semantics on the SQL surface."""
    out = spark.sql(
        """
        SELECT countries.name, cities.name AS city, s2_astext(cities.geog) AS wkt
        FROM s2_data_countries AS countries
        INNER JOIN s2_data_cities AS cities
        ON s2_intersects(countries.geog, cities.geog)
        """
    )
    rows = out.collect()
    pairs = {(r.name, r.city) for r in rows}
    assert ("Canada", "Toronto") in pairs
    assert ("Germany", "Berlin") in pairs
    assert ("Canada", "Chicago") not in pairs


def test_cell_pipeline_sql(spark):
    row = spark.sql(
        """
        SELECT s2_cell_token(s2_cellfromlonlat(-64.0d, 45.0d)) AS tok,
               s2_cell_level(s2_cellfromlonlat(-64.0d, 45.0d)) AS lev,
               s2_cell_debug_string(s2_cell_parent(s2_cellfromlonlat(-64.0d, 45.0d), 5)) AS p5
        """
    ).collect()[0]
    assert row.tok == "4b59a0cd83b5de49"
    assert row.lev == 30
    assert row.p5 == "2/11223"


def test_geography_pipeline_sql(spark):
    row = spark.sql(
        """
        SELECT s2_astext(s2_geogfromtext('POINT (30 10)')) AS t,
               round(s2_distance(s2_geogfromtext('POINT (-123.12359 49.2753624)'),
                                 s2_geogfromtext('POINT (-79.4219667 43.7019257)'))) AS d,
               s2_dimension(s2_geogfromtext('LINESTRING (0 0, 1 1)')) AS dim
        """
    ).collect()[0]
    assert row.d == 3354018
    assert row.dim == 1


def test_dependencies_view(spark):
    deps = {r.dependency for r in spark.sql("SELECT * FROM s2_dependencies").collect()}
    assert "pyspark" in deps and "duckdb_geography_spark" in deps


def test_unnest_covering_sql(spark):
    """docs/function-reference.md:668-672 analogue: UNNEST(s2_covering)."""
    out = spark.sql(
        """
        SELECT name, explode(s2_covering(geog)) AS cell
        FROM s2_data_countries WHERE name = 'Fiji'
        """
    )
    rows = out.collect()
    assert 1 <= len(rows) <= 8


def test_cell_selfcheck_sums(spark):
    """cell_ops.test:302-311 sanity goldens: every city's leaf cell
    polygon intersects the city point (sum = 243), and every country
    intersects its arbitrary covering cell (sum = 177) — end-to-end
    through cellfromlonlat / arbitrarycellfromwkb / cell->geography /
    s2_intersects on the sample tables."""
    # Spark rejects Python UDFs directly inside aggregate arguments
    # (AGGREGATE_FUNCTION_WITH_NONDETERMINISTIC_EXPRESSION) — project
    # the flag in a subquery first
    n = spark.sql(
        """
        SELECT sum(v) AS n FROM (
          SELECT CAST(s2_intersects(
            s2_cell_to_geography(s2_cellfromlonlat(s2_x(geog), s2_y(geog))),
            geog) AS INT) AS v
          FROM s2_data_cities)
        """
    ).collect()[0].n
    assert n == 243
    m = spark.sql(
        """
        SELECT sum(v) AS n FROM (
          SELECT CAST(s2_intersects(
            s2_cell_to_geography(s2_arbitrarycellfromwkb(s2_aswkb(geog))),
            geog) AS INT) AS v
          FROM s2_data_countries)
        """
    ).collect()[0].n
    assert m == 177


def test_sql_cell_ops_are_pure_jvm(spark):
    """Spark 4 SQL scalar functions: the spark.sql surface's cell bit
    ops must plan with NO Python stage (they were pandas UDFs before —
    the round-2 verdict's 'SQL users silently get the slower path')."""
    p = (
        spark.sql(
            "SELECT s2_cell_token(s2_cell_range_min(s2_cell_parent(id, 5))), "
            "s2_cell_contains(s2_cell_parent(id, 4), id), s2_cell_level(id) "
            "FROM range(100)"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in p, p


def test_sql_bounds_agg_boxes_scale_path(spark):
    """Round 7: the SQL surface exposes the shuffle-light bounds
    aggregate as s2_bounds_box_agg_boxes(s2_bounds_box_arr(g)) — same
    result as the blob-input s2_bounds_box_agg, but the per-row box
    projection runs below the exchange."""
    spark.sql(
        "SELECT s2_geogfromtext(CONCAT('POINT (', CAST(id AS STRING), ' ', "
        "CAST(id % 30 AS STRING), ')')) AS g, id % 2 AS k FROM range(40)"
    ).createOrReplaceTempView("pts7")
    a = spark.sql(
        "SELECT k, s2_bounds_box_agg(g) AS b FROM pts7 GROUP BY k ORDER BY k"
    ).collect()
    b = spark.sql(
        "SELECT k, s2_bounds_box_agg_boxes(s2_bounds_box_arr(g)) AS b "
        "FROM pts7 GROUP BY k ORDER BY k"
    ).collect()
    assert [r.b for r in a] == [r.b for r in b]
