"""Auto-rewrite of naive spatial joins (rewrite.py): the rewritten
plan must be cartesian-free and row-for-row equal to the naive one,
across the DataFrame and spark.sql surfaces."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from duckdb_geography_spark import joins as J
from duckdb_geography_spark import rewrite as RW
from duckdb_geography_spark.functions import predicates as G
from duckdb_geography_spark.functions.data import (
    s2_data_cities,
    s2_data_countries,
)


@pytest.fixture(scope="module")
def sides(spark):
    cities = (
        s2_data_cities(spark)
        .select(F.col("name").alias("city"), F.col("geog").alias("cgeog"))
        .limit(60)
        .cache()
    )
    countries = (
        s2_data_countries(spark)
        .select(F.col("name").alias("country"), F.col("geog").alias("ngeog"))
        .limit(40)
        .cache()
    )
    cities.count(), countries.count()
    return cities, countries


def _pairs(df):
    return {(r["country"], r["city"]) for r in df.collect()}


class TestRewrite:
    def test_intersects_rewrite_matches_naive(self, spark, sides):
        cities, countries = sides
        naive = cities.join(countries, G.s2_intersects("cgeog", "ngeog")).select(
            "country", "city"
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            rw = RW.rewrite_spatial_joins(naive)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert rw.columns == ["country", "city"]
        assert _pairs(rw) == _pairs(naive)
        assert any(issubclass(x.category, J.SpatialJoinLintWarning) for x in w)

    def test_swapped_arguments_still_equal(self, spark, sides):
        cities, countries = sides
        naive = cities.join(countries, G.s2_intersects("ngeog", "cgeog")).select(
            "country", "city"
        )
        rw = RW.rewrite_spatial_joins(naive, warn=False)
        assert _pairs(rw) == _pairs(naive)

    def test_contains_rewrite(self, spark, sides):
        cities, countries = sides
        naive = countries.join(cities, G.s2_contains("ngeog", "cgeog")).select(
            "country", "city"
        )
        rw = RW.rewrite_spatial_joins(naive, warn=False)
        assert _pairs(rw) == _pairs(naive)

    def test_contains_wrong_order_raises(self, spark, sides):
        cities, countries = sides
        # contains(right.col, left.col): direction can't be expressed
        # by swapping sides — must refuse, not silently flip semantics
        naive = cities.join(countries, G.s2_contains("ngeog", "cgeog"))
        with pytest.raises(RW.RewriteUnsupported, match="argument order"):
            RW.rewrite_spatial_joins(naive, warn=False)

    def test_dwithin_literal_rewrite(self, spark, sides):
        cities, countries = sides
        naive = cities.join(
            countries, G.s2_dwithin("cgeog", "ngeog", 100_000.0)
        ).select("country", "city")
        rw = RW.rewrite_spatial_joins(naive, warn=False)
        assert _pairs(rw) == _pairs(naive)

    def test_sql_surface(self, spark, sides):
        from duckdb_geography_spark.functions.register import (
            register_sql_functions,
        )

        cities, countries = sides
        register_sql_functions(spark)
        cities.createOrReplaceTempView("rw_cities")
        countries.createOrReplaceTempView("rw_countries")
        q = (
            "SELECT country, city FROM rw_cities JOIN rw_countries "
            "ON s2_intersects(cgeog, ngeog)"
        )
        naive = spark.sql(q)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rw = RW.sql(spark, q)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert _pairs(rw) == _pairs(naive)

    def test_dwithin_sql_surface(self, spark, sides):
        # the SQL-registered s2_dwithin resolves to the _dwithin_udf
        # plan name — detection must catch that spelling too
        from duckdb_geography_spark.functions.register import (
            register_sql_functions,
        )

        cities, countries = sides
        register_sql_functions(spark)
        cities.createOrReplaceTempView("rw_cities")
        countries.createOrReplaceTempView("rw_countries")
        q = (
            "SELECT country, city FROM rw_cities JOIN rw_countries "
            "ON s2_dwithin(cgeog, ngeog, 100000.0)"
        )
        naive = spark.sql(q)
        assert len(J.lint_spatial_joins(naive, warn=False)) == 1
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rw = RW.sql(spark, q)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert _pairs(rw) == _pairs(naive)

    def test_noop_without_naive_join(self, spark, sides):
        cities, _ = sides
        assert RW.rewrite_spatial_joins(cities) is cities
        # recipe plans are untouched too
        rw = RW.rewrite_spatial_joins(
            J.covering_join(
                cities.withColumnRenamed("cgeog", "geog"),
                sides[1].withColumnRenamed("ngeog", "geog"),
                left_key="city",
                right_key="country",
            )
        )
        assert J.lint_spatial_joins(rw, warn=False) == []

    def test_nested_naive_joins_both_rewritten(self, spark, sides):
        cities, countries = sides
        # (cities ⋈ countries) ⋈ cities2 — two naive predicate joins
        cities2 = cities.select(
            F.col("city").alias("city2"), F.col("cgeog").alias("c2geog")
        )
        inner = cities.join(countries, G.s2_intersects("cgeog", "ngeog"))
        outer = inner.join(cities2, G.s2_intersects("c2geog", "ngeog")).select(
            "country", "city", "city2"
        )
        rw = RW.rewrite_spatial_joins(outer, warn=False)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        want = {(r["country"], r["city"], r["city2"]) for r in outer.collect()}
        got = {(r["country"], r["city"], r["city2"]) for r in rw.collect()}
        assert got == want

    def test_aggregate_above_join_rewrites(self, spark, sides):
        # round-5: operators ABOVE the naive join no longer refuse —
        # the join subtree is replaced in place (exprId-remap Project)
        # and the Aggregate reattaches verbatim
        cities, countries = sides
        naive = cities.join(countries, G.s2_intersects("cgeog", "ngeog"))
        deep = naive.groupBy("country").count()
        rw = RW.rewrite_spatial_joins(deep, warn=False)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        want = {(r["country"], r["count"]) for r in deep.collect()}
        got = {(r["country"], r["count"]) for r in rw.collect()}
        assert got == want and len(got) > 0

    def test_filter_and_aggregate_above_join_rewrite(self, spark, sides):
        # the first thing a real user writes: README join + WHERE +
        # GROUP BY (reference README.md:14-19 composes freely)
        cities, countries = sides
        naive = cities.join(countries, G.s2_intersects("cgeog", "ngeog"))
        deep = (
            naive.where(F.col("city") != "__nobody__")
            .groupBy("country")
            .count()
            .orderBy("country")
        )
        rw = RW.rewrite_spatial_joins(deep, warn=False)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert [tuple(r) for r in rw.collect()] == [tuple(r) for r in deep.collect()]

    def test_mixed_condition_single_side_equality_rewrites(self, spark, sides):
        # ON s2_intersects(...) AND b.col = 'literal' — the equality is
        # a pushed-down filter, NOT a join key; the covering recipe
        # must drive and the equality must survive as a residual
        cities, countries = sides
        naive = cities.join(
            countries,
            G.s2_intersects("cgeog", "ngeog")
            & (F.col("country") != "__nobody__"),
        )
        rw = RW.rewrite_spatial_joins(naive, warn=False)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        want = {(r["city"], r["country"]) for r in naive.collect()}
        got = {(r["city"], r["country"]) for r in rw.collect()}
        assert got == want and len(got) > 0

    def test_equals_join_rewrites(self, spark, sides):
        cities, _ = sides
        dup = cities.select(
            F.col("city").alias("city2"), F.col("cgeog").alias("g2")
        )
        naive = cities.join(dup, G.s2_equals("cgeog", "g2")).select(
            "city", "city2"
        )
        rw = RW.rewrite_spatial_joins(naive, warn=False)
        plan = rw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        got = {(r["city"], r["city2"]) for r in rw.collect()}
        want = {(r["city"], r["city2"]) for r in naive.collect()}
        assert got == want and len(got) >= cities.count()

    def test_outer_join_type_refused(self, spark, sides):
        # an outer naive join must NOT silently become an inner
        # covering join (the row set would change)
        cities, countries = sides
        naive = cities.join(
            countries, G.s2_intersects("cgeog", "ngeog"), "left"
        )
        with pytest.raises(RW.RewriteUnsupported, match="only INNER"):
            RW.rewrite_spatial_joins(naive, warn=False)

    def test_mayintersect_refused_not_rewritten(self, spark, sides):
        # fixed-level covering overlap is a DIFFERENT approximation
        # than the adaptive mayintersect test — refuse, don't alter
        cities, countries = sides
        naive = cities.join(countries, G.s2_mayintersect("cgeog", "ngeog"))
        with pytest.raises(RW.RewriteUnsupported, match="mayintersect"):
            RW.rewrite_spatial_joins(naive, warn=False)

    def test_broadcast_hinted_join_left_alone(self, spark, sides):
        # the explicit-broadcast NL recipe is intentional: the rewriter
        # must not second-guess it (same exemption as the lint)
        cities, countries = sides
        bc = cities.join(
            F.broadcast(countries), G.s2_intersects("cgeog", "ngeog")
        )
        assert RW.rewrite_spatial_joins(bc, warn=False) is bc
