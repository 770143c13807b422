"""Wholesale port of the reference sqllogictest corpus
(test/sql/geography/*.test, 8 files) replayed through the SQL surface
(``spark.sql``), one test per golden, in file order, each citing its
reference file:line.

Syntax translation rules (DuckDB -> Spark SQL):
- ``'...'::GEOGRAPHY``            -> ``s2_geogfromtext('...')``
- ``'f/digits'::S2_CELL``         -> ``s2_cell_from_debug_string('f/digits')``
- ``cell::VARCHAR`` (debug form)  -> ``s2_cell_debug_string(cell)``
- ``geog::S2_CELL_CENTER``        -> ``s2_geography_to_cell_center(geog)``
  (when the result is used as a GEOGRAPHY again:
  ``s2_snap_to_cell_center(geog)``, which keeps cast provenance)
- ``cell::GEOGRAPHY``             -> ``s2_cell_to_geography(cell)`` /
                                     ``s2_cell_center_to_geography(cell)``
- ``x.f(y)`` dot chain            -> ``f(x, y)``
- ``[..]::S2_CELL_UNION``         -> ``s2_cell_union_normalize(array(..))``

Documented deviations (each marked DEVIATION in its test):
- ``<S2ShapeIndex N b>``: N is the encoded size, which is
  engine-specific — asserted by pattern, not value.
- ``s2_dependencies()``: our dependencies are the Python stack, not
  abseil/s2geometry — cardinality + determinism asserted.
(Closed in round 6: the sample tables now bundle the reference's
public Natural Earth TSVs verbatim, so every dataset-wide golden —
bounds_box_agg over all 243/177 rows, the Germany/Fiji box
exporters, France box_intersects, the data.test TSV cross-join —
pins the reference's exact decimals below.)
(Closed in round 6: the both-sides ``::S2_CELL_CENTER`` distance
goldens — the reference's asymmetric snap-vs-raw evaluation,
root-caused in tests/test_cellmath.py::TestSnappedDistanceGoldens —
are now reproduced exactly via ``s2_snap_to_cell_center``, the
geography-level form of the cast; its pinned values appear in
test_distance / test_max_distance below.)
"""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from duckdb_geography_spark.functions.register import (
        register_sample_data,
        register_sql_functions,
    )

    register_sql_functions(spark)
    register_sample_data(spark)


@pytest.fixture(scope="module")
def q(spark):
    def run(sql: str):
        rows = spark.sql(sql).collect()
        assert len(rows) == 1 and len(rows[0]) == 1
        return rows[0][0]

    return run


GEOG = "s2_geogfromtext('{}')"
CELL = "s2_cell_from_debug_string('{}')"


# ---------------------------------------------------------------------------
# functions_io.test
# ---------------------------------------------------------------------------


class TestFunctionsIO:
    def test_wkt_roundtrip_cast(self, q):
        # functions_io.test:9-12
        assert q("SELECT s2_format(s2_geogfromtext('POINT (-64 45)'), 6)") == "POINT (-64 45)"

    def test_wkt_roundtrip_fn(self, q):
        # functions_io.test:14-17
        assert q("SELECT s2_format(s2_geogfromtext('POINT (-64 45)'), 6)") == "POINT (-64 45)"

    def test_novalidate_roundtrip(self, q):
        # functions_io.test:19-22
        assert (
            q("SELECT s2_format(s2_geogfromtext_novalidate('LINESTRING (0 0, 0 0, 1 1)'), 6)")
            == "LINESTRING (0 0, 0 0, 1 1)"
        )

    def test_wkb_parse_literal(self, q):
        # functions_io.test:24-28 (the same ISO WKB bytes, hex literal)
        assert (
            q("SELECT s2_format(s2_geogfromwkb(X'01010000000000000000003e400000000000002440'), 6)")
            == "POINT (30 10)"
        )

    def test_wkb_roundtrip(self, q):
        # functions_io.test:30-34
        assert (
            q("SELECT s2_format(s2_geogfromwkb(s2_aswkb(s2_geogfromtext('POINT (-64 45)'))), 6)")
            == "POINT (-64 45)"
        )

    def test_wkb_novalidate(self, q):
        # functions_io.test:36-40
        assert (
            q(
                "SELECT s2_format(s2_geogfromwkb_novalidate(s2_aswkb("
                "s2_geogfromtext_novalidate('LINESTRING (0 0, 0 0, 1 1)'))), 6)"
            )
            == "LINESTRING (0 0, 0 0, 1 1)"
        )

    def test_prepare_small_passthrough(self, q):
        # functions_io.test:42-46
        assert q("SELECT s2_format(s2_prepare(s2_geogfromtext('POINT (30 10)')), 6)") == "POINT (30 10)"

    def test_prepare_indexes_big(self, q):
        # functions_io.test:48-52; DEVIATION: N is the engine-specific
        # encoded size (the reference prints 128 for ITS encoding)
        import re

        out = q("SELECT s2_astext(s2_prepare(s2_geogfromtext('LINESTRING (0 0, 1 1, 2 2, 3 3, 4 4)')))")
        assert re.fullmatch(r"<S2ShapeIndex \d+ b>", out)


# ---------------------------------------------------------------------------
# extension.test
# ---------------------------------------------------------------------------


class TestExtension:
    def test_dependencies(self, spark):
        # extension.test:14-21; DEVIATION: our dependency set is the
        # Python stack, not abseil/geoarrow/nanoarrow/openssl/s2geometry
        rows = spark.sql(
            "SELECT dependency FROM s2_dependencies ORDER BY dependency"
        ).collect()
        assert [r.dependency for r in rows] == sorted(
            ["duckdb_geography_spark", "pyspark", "pyarrow", "numpy", "pandas"]
        )


# ---------------------------------------------------------------------------
# accessors.test
# ---------------------------------------------------------------------------


class TestAccessors:
    def test_isempty(self, q):
        # accessors.test:9-17
        assert q(f"SELECT s2_isempty({GEOG.format('POINT EMPTY')})") is True
        assert q(f"SELECT s2_isempty({GEOG.format('POINT (0 1)')})") is False

    def test_is_valid(self, q):
        # accessors.test:19-28
        assert q("SELECT s2_is_valid(s2_geogfromtext_novalidate('LINESTRING (0 0, 1 1)'))") is True
        assert q("SELECT s2_is_valid(s2_geogfromtext_novalidate('LINESTRING (0 0, 0 0, 1 1)'))") is False

    def test_is_valid_reason(self, q):
        # accessors.test:30-38
        assert q("SELECT s2_is_valid_reason(s2_geogfromtext_novalidate('LINESTRING (0 0, 1 1)')) = ''") is True
        assert (
            q("SELECT s2_is_valid_reason(s2_geogfromtext_novalidate('LINESTRING (0 0, 0 0, 1 1)'))")
            == "Vertices 0 and 1 are identical"
        )

    def test_area(self, q):
        # accessors.test:40-58
        assert q(f"SELECT s2_area({GEOG.format('POINT EMPTY')})") == 0
        assert q(f"SELECT s2_area({GEOG.format('POINT (0 1)')})") == 0
        assert q(f"SELECT s2_area({GEOG.format('LINESTRING (0 1, 2 3)')})") == 0
        assert q(f"SELECT round(s2_area({GEOG.format('POLYGON ((0 0, 0 1, 1 0, 0 0))')}))") == 6182489131

    def test_perimeter(self, q):
        # accessors.test:60-78
        assert q(f"SELECT s2_perimeter({GEOG.format('POINT EMPTY')})") == 0
        assert q(f"SELECT s2_perimeter({GEOG.format('POINT (0 1)')})") == 0
        assert q(f"SELECT s2_perimeter({GEOG.format('LINESTRING (0 1, 2 3)')})") == 0
        assert q(f"SELECT round(s2_perimeter({GEOG.format('POLYGON ((0 0, 0 1, 1 0, 0 0))')}))") == 379640

    def test_length(self, q):
        # accessors.test:80-98
        assert q(f"SELECT s2_length({GEOG.format('POINT EMPTY')})") == 0
        assert q(f"SELECT s2_length({GEOG.format('POINT (0 1)')})") == 0
        assert q(f"SELECT s2_length({GEOG.format('POLYGON ((0 0, 0 1, 1 0, 0 0))')})") == 0
        assert q(f"SELECT round(s2_length({GEOG.format('LINESTRING (0 1, 2 3)')}))") == 314403

    def test_x_y(self, q):
        # accessors.test:100-118
        assert math.isnan(q(f"SELECT s2_x({GEOG.format('POINT EMPTY')})"))
        assert math.isnan(q(f"SELECT s2_x({GEOG.format('LINESTRING (0 1, 1 2)')})"))
        assert q(f"SELECT round(s2_x({GEOG.format('POINT (-64 45)')}))") == -64
        assert q(f"SELECT round(s2_y({GEOG.format('POINT (-64 45)')}))") == 45

    def test_x_y_snapped(self, q):
        # accessors.test:120-128 (::S2_CELL_CENTER round-trips the snap)
        cc = f"s2_cell_center_to_geography(s2_geography_to_cell_center({GEOG.format('POINT (-64 45)')}))"
        assert q(f"SELECT round(s2_x({cc}))") == -64
        assert q(f"SELECT round(s2_y({cc}))") == 45

    def test_dimension(self, q):
        # accessors.test:130-158
        assert q("SELECT s2_dimension(s2_cell_center_to_geography(s2_cellfromlonlat(-64, 45)))") == 0
        assert q(f"SELECT s2_dimension({GEOG.format('POINT (-64 45)')})") == 0
        assert q(f"SELECT s2_dimension({GEOG.format('LINESTRING (0 0, 1 1)')})") == 1
        assert q("SELECT s2_dimension(s2_data_country('Canada'))") == 2
        assert q(f"SELECT s2_dimension({GEOG.format('GEOMETRYCOLLECTION EMPTY')})") == -1
        assert (
            q(f"SELECT s2_dimension({GEOG.format('GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 0, 1 1))')})")
            == 1
        )

    def test_num_points(self, q):
        # accessors.test:160-183
        assert q("SELECT s2_num_points(s2_cell_center_to_geography(s2_cellfromlonlat(-64, 45)))") == 1
        assert q(f"SELECT s2_num_points({GEOG.format('POINT (-64 45)')})") == 1
        assert q(f"SELECT s2_num_points({GEOG.format('LINESTRING (0 0, 1 1)')})") == 2
        assert q(f"SELECT s2_num_points({GEOG.format('GEOMETRYCOLLECTION EMPTY')})") == 0


# ---------------------------------------------------------------------------
# cell_ops.test
# ---------------------------------------------------------------------------

LEAF = "2/112230310012123001312232330210"


class TestCellOps:
    def test_cell_center_casts(self, q):
        # cell_ops.test:9-22 (S2_CELL <-> S2_CELL_CENTER are the same
        # 64-bit value; debug string is the VARCHAR form)
        assert q(f"SELECT s2_cell_debug_string({CELL.format(LEAF)})") == LEAF

    def test_point_to_cell_center(self, q):
        # cell_ops.test:24-27
        assert (
            q(f"SELECT s2_cell_debug_string(s2_geography_to_cell_center({GEOG.format('POINT (-64 45)')}))")
            == LEAF
        )

    def test_cell_to_union(self, q):
        # cell_ops.test:29-37
        assert q(f"SELECT s2_cell_to_cell_union({CELL.format('2/')})") == [
            q(f"SELECT {CELL.format('2/')}")
        ]
        assert q(f"SELECT s2_cell_to_cell_union({CELL.format('invalid')})") == []

    def test_cell_center_to_geography(self, q):
        # cell_ops.test:39-43
        assert (
            q(f"SELECT s2_format(s2_cell_center_to_geography({CELL.format(LEAF)}), 6)")
            == "POINT (-64 45)"
        )

    def test_invalid_center_to_geography(self, q):
        # cell_ops.test:45-48
        assert (
            q("SELECT s2_astext(s2_cell_center_to_geography(s2_cell_from_debug_string('not valid')))")
            == "POINT EMPTY"
        )

    def test_linestring_to_cell_center_errors(self, spark):
        # cell_ops.test:55-58
        with pytest.raises(Exception, match="not empty nor a single point"):
            spark.sql(
                f"SELECT s2_geography_to_cell_center({GEOG.format('LINESTRING (-64 45, 0 0)')})"
            ).collect()

    def test_cell_union_to_geography(self, q):
        # cell_ops.test:60-63
        assert (
            q(f"SELECT s2_format(s2_cell_union_to_geography(s2_cell_to_cell_union({CELL.format('2/0')})), 6)")
            == "POLYGON ((45 35.26439, 90 45, 0 90, 0 45, 45 35.26439))"
        )

    def test_union_normalize_sorts(self, q):
        # cell_ops.test:74-82 (storage cast sorts on the way in)
        got = q(
            f"SELECT s2_cell_union_normalize(array({CELL.format('1/')}, {CELL.format('0/')}))"
        )
        want = [q(f"SELECT {CELL.format('0/')}"), q(f"SELECT {CELL.format('1/')}")]
        assert got == want

    def test_cellfromlonlat(self, q):
        # cell_ops.test:85-93
        assert q("SELECT s2_cell_debug_string(s2_cellfromlonlat(-64, 45))") == LEAF
        assert (
            q("SELECT s2_cell_debug_string(s2_cellfromlonlat(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE)))")
            == "Invalid: ffffffffffffffff"
        )

    def test_cellfromwkb_point(self, q):
        # cell_ops.test:95-108
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cellfromwkb(s2_aswkb({GEOG.format('POINT (-64 45)')})))")
            == LEAF
        )
        assert (
            q(
                "SELECT s2_cell_debug_string(s2_cellfromwkb(s2_aswkb("
                f"{GEOG.format('GEOMETRYCOLLECTION(POINT (-64 45))')})))"
            )
            == LEAF
        )
        assert (
            q(
                "SELECT s2_cell_debug_string(s2_cellfromwkb(s2_aswkb("
                f"{GEOG.format('GEOMETRYCOLLECTION(POLYGON EMPTY, POINT (-64 45))')})))"
            )
            == LEAF
        )

    def test_cellfromwkb_empties(self, q):
        # cell_ops.test:110-132
        for wkt in (
            "POINT EMPTY",
            "LINESTRING EMPTY",
            "POLYGON EMPTY",
            "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
        ):
            assert (
                q(f"SELECT s2_cell_debug_string(s2_cellfromwkb(s2_aswkb({GEOG.format(wkt)})))")
                == "Invalid: ffffffffffffffff"
            )

    def test_cellfromwkb_errors(self, spark):
        # cell_ops.test:134-142
        with pytest.raises(Exception, match="more than one point"):
            spark.sql(
                f"SELECT s2_cellfromwkb(s2_aswkb({GEOG.format('MULTIPOINT (-64 45, 0 0)')}))"
            ).collect()
        with pytest.raises(Exception, match="non-point input"):
            spark.sql(
                f"SELECT s2_cellfromwkb(s2_aswkb({GEOG.format('LINESTRING (-64 45, 0 0)')}))"
            ).collect()

    def test_arbitrarycellfromwkb(self, q):
        # cell_ops.test:144-166
        for wkt in (
            "LINESTRING (-64 45, 0 0)",
            "POLYGON ((-64 45, 0 0, 0 1, 0 2))",
            "GEOMETRYCOLLECTION(POLYGON EMPTY, LINESTRING (-64 45, 0 0))",
        ):
            assert (
                q(f"SELECT s2_cell_debug_string(s2_arbitrarycellfromwkb(s2_aswkb({GEOG.format(wkt)})))")
                == LEAF
            )
        assert (
            q(
                "SELECT s2_cell_debug_string(s2_arbitrarycellfromwkb(s2_aswkb("
                f"{GEOG.format('GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)')})))"
            )
            == "Invalid: ffffffffffffffff"
        )

    def test_cell_to_geography_polygon(self, q):
        # cell_ops.test:168-171
        assert q(
            f"SELECT s2_format(s2_cell_to_geography({CELL.format('2/1122303')}), 6)"
        ) == (
            "POLYGON ((-63.470273 44.898834, -64.286611 45.098989, "
            "-64.779066 44.581998, -63.973842 44.388923, -63.470273 44.898834))"
        )

    def test_cell_token(self, q):
        # cell_ops.test:173-181
        assert q(f"SELECT s2_cell_token({CELL.format(LEAF)})") == "4b59a0cd83b5de49"
        assert q("SELECT s2_cell_debug_string(s2_cell_from_token('4b59a0cd83b5de49'))") == LEAF

    def test_bad_token(self, q):
        # cell_ops.test:183-187
        assert (
            q("SELECT s2_cell_debug_string(s2_cell_from_token('foofy'))")
            == "Invalid: 0000000000000000"
        )

    def test_cell_level(self, q):
        # cell_ops.test:189-198
        assert q(f"SELECT s2_cell_level({CELL.format(LEAF)})") == 30
        assert q("SELECT s2_cell_level(s2_cell_from_debug_string('not valid'))") == -1

    def test_parent_child_neighbor(self, q):
        # cell_ops.test:200-228
        assert q(f"SELECT s2_cell_debug_string(s2_cell_parent({CELL.format(LEAF)}, 0))") == "2/"
        assert q(f"SELECT s2_cell_debug_string(s2_cell_parent({CELL.format(LEAF)}, -30))") == "2/"
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cell_parent({CELL.format('2/')}, 1))")
            == "Invalid: ffffffffffffffff"
        )
        assert q(f"SELECT s2_cell_debug_string(s2_cell_child({CELL.format('2/')}, 0))") == "2/0"
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cell_child({CELL.format('2/')}, -1))")
            == "Invalid: ffffffffffffffff"
        )
        assert q(f"SELECT s2_cell_debug_string(s2_cell_edge_neighbor({CELL.format('2/')}, 0))") == "1/"
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cell_edge_neighbor({CELL.format('2/')}, -1))")
            == "Invalid: ffffffffffffffff"
        )

    def test_range_min_max(self, q):
        # cell_ops.test:230-252
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cell_range_min({CELL.format('2/')}))")
            == "2/000000000000000000000000000000"
        )
        assert (
            q(f"SELECT s2_cell_debug_string(s2_cell_range_max({CELL.format('2/')}))")
            == "2/333333333333333333333333333333"
        )
        for fn in ("s2_cell_range_min", "s2_cell_range_max"):
            assert (
                q(f"SELECT s2_cell_debug_string({fn}(s2_cell_from_debug_string('foofy')))")
                == "Invalid: ffffffffffffffff"
            )

    def test_cell_predicates(self, q):
        # cell_ops.test:254-300
        c = CELL.format
        assert q(f"SELECT s2_cell_contains({c('2/')}, {c('2/0')})") is True
        assert q(f"SELECT s2_cell_contains({c('2/0')}, {c('2/')})") is False
        assert q(f"SELECT s2_cell_contains({c('invalid')}, {c('2/')})") is False
        assert q(f"SELECT s2_cell_contains({c('2/')}, {c('invalid')})") is False
        assert q(f"SELECT s2_cell_intersects({c('2/')}, {c('2/0')})") is True
        assert q(f"SELECT s2_cell_intersects({c('2/0')}, {c('2/')})") is True
        assert q(f"SELECT s2_cell_intersects({c('2/')}, {c('3/')})") is False
        assert q(f"SELECT s2_cell_intersects({c('invalid')}, {c('2/')})") is False
        assert q(f"SELECT s2_cell_intersects({c('2/')}, {c('invalid')})") is False

    # cell_ops.test:302-316 (sample-data sanity sums over 243 cities /
    # 177 countries) are ported at
    # tests/test_sql_surface.py::test_cell_selfcheck_sums


# ---------------------------------------------------------------------------
# bounds.test
# ---------------------------------------------------------------------------


class TestBounds:
    @staticmethod
    def _covering_debug(spark, expr, fixed=None):
        fn = (
            f"s2_covering({expr})"
            if fixed is None
            else f"s2_covering_fixed_level({expr}, {fixed})"
        )
        rows = spark.sql(
            f"SELECT s2_cell_debug_string(c) AS d FROM "
            f"(SELECT explode({fn}) AS c FROM (SELECT 1))"
        ).collect()
        return [r.d for r in rows]

    def test_fiji_covering(self, spark):
        # bounds.test:9-12 — the pinned Fiji golden, via the SQL surface
        assert self._covering_debug(spark, "s2_data_country('Fiji')") == [
            "3/13002011",
            "3/1300232",
            "3/130030",
            "3/130031",
            "3/130033",
            "3/130100",
            "3/2032333",
            "3/20330000000",
        ]

    def test_fiji_fixed_level(self, spark):
        # bounds.test:14-17
        assert self._covering_debug(spark, "s2_data_country('Fiji')", fixed=5) == [
            "3/13002",
            "3/13003",
            "3/13010",
            "3/20323",
            "3/20330",
        ]

    def test_cell_center_covering(self, spark):
        # bounds.test:19-28
        cc = f"s2_cell_center_to_geography(s2_geography_to_cell_center({GEOG.format('POINT (-64 45)')}))"
        assert self._covering_debug(spark, cc) == [LEAF]
        assert self._covering_debug(spark, cc, fixed=5) == ["2/11223"]

    def test_fixed_level_must_be_constant(self, spark):
        # bounds.test:30-33
        with pytest.raises(Exception, match="must be a constant"):
            spark.sql(
                "SELECT s2_covering_fixed_level(s2_data_country('Fiji'), l) "
                "FROM (SELECT explode(array(1, 2)) AS l)"
            ).collect()

    def test_bounds_box_empty(self, q):
        # bounds.test:35-40 (S2's empty-rect sentinel)
        b = q(f"SELECT s2_bounds_box({GEOG.format('POINT EMPTY')})")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (180.0, 57.29577951308232, -180.0, 0.0)

    def test_bounds_box_cell_center(self, q):
        # bounds.test:42-46 — the reference's sqllogictest prints 15
        # significant digits (45.0000000116166); compare at that print
        # precision, not full-double repr
        b = q("SELECT s2_bounds_box(s2_cell_center_to_geography(s2_cellfromlonlat(-64, 45)))")
        assert b.xmin == pytest.approx(-63.99999997805, abs=1e-11)
        assert b.ymin == pytest.approx(45.0000000116166, abs=1e-11)
        assert b.xmax == pytest.approx(-63.99999997805, abs=1e-11)
        assert b.ymax == pytest.approx(45.0000000116166, abs=1e-11)

    def test_bounds_box_multipoint(self, q):
        # bounds.test:48-52
        b = q(f"SELECT s2_bounds_box({GEOG.format('MULTIPOINT (0 1, 2 3)')})")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (
            0.0,
            1.0,
            1.9999999999999996,
            3.0000000000000004,
        )

    def test_bounds_box_agg_goldens(self, spark):
        # bounds.test:54-70 (the agg must agree with the scalar on
        # single-row groups); the SQL agg returns the
        # [xmin, ymin, xmax, ymax] array form (GROUPED_AGG UDFs can't
        # return structs — see register.py)
        for geog in (
            GEOG.format("POINT EMPTY"),
            "s2_cell_center_to_geography(s2_cellfromlonlat(-64, 45))",
            GEOG.format("MULTIPOINT (0 1, 2 3)"),
        ):
            a = spark.sql(f"SELECT s2_bounds_box_agg(g) FROM (SELECT {geog} AS g)").collect()[0][0]
            s = spark.sql(f"SELECT s2_bounds_box({geog})").collect()[0][0]
            assert tuple(a) == tuple(s)

    def test_bounds_box_agg_cities(self, spark):
        # bounds.test:74-77 — the reference's exact decimals (real
        # Natural Earth data since round 6; the lng interval wraps the
        # antimeridian, and ymin carries the xyz-roundtrip tail)
        arr = spark.sql(
            "SELECT s2_bounds_box_agg(geog) AS b FROM s2_data_cities"
        ).collect()[0][0]
        assert list(arr) == [-123.12359, -41.29998789999999, -171.738642, 64.1500236]

    def test_bounds_box_agg_countries(self, spark):
        # bounds.test:79-82 — Antarctica makes the lng interval full;
        # ymax is Greenland's north vertex + RectBounder's 2-eps-radian
        # latitude expansion
        arr = spark.sql(
            "SELECT s2_bounds_box_agg(geog) AS b FROM s2_data_countries"
        ).collect()[0][0]
        assert list(arr) == [-180.0, -90.0, 180.0, 83.64513000000002]

    def test_box_exporters_germany(self, spark, q):
        # bounds.test:83-91 — real dense boundary, reference decimals
        b = q("SELECT s2_bounds_box(s2_data_country('Germany'))")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (
            5.988658,
            47.30248799999997,
            15.016996000000002,
            54.983104000000026,
        )
        # the WKB export round-trips through the geography codec
        wkt = q(
            "SELECT s2_format(s2_geogfromwkb(s2_box_wkb("
            "s2_bounds_box(s2_data_country('Germany')))), 4)"
        )
        assert wkt == (
            "POLYGON ((5.9887 47.3025, 15.017 47.3025, 15.017 54.9831, "
            "5.9887 54.9831, 5.9887 47.3025))"
        )

    def test_box_exporters_fiji(self, q):
        # bounds.test:93-96 — the antimeridian MULTIPOLYGON split
        wkt = q(
            "SELECT s2_format(s2_geogfromwkb(s2_box_wkb("
            "s2_bounds_box(s2_data_country('Fiji')))), 4)"
        )
        assert wkt.startswith("MULTIPOLYGON (((177.285 -18.288, 180 -18.288, 180 ")
        assert "((-180 -18.288, -179.7933 -18.288" in wkt

    def test_box_struct(self, q):
        # bounds.test:98-101 — the reference's exact decimals
        b = q("SELECT s2_box_struct(s2_bounds_box(s2_data_country('Germany')))")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (
            5.988658,
            47.30248799999997,
            15.016996000000002,
            54.983104000000026,
        )

    def test_box_constructor(self, q):
        # bounds.test:103-107
        b = q("SELECT s2_box(5.989, 47.302, 15.017, 54.983)")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (5.989, 47.302, 15.017, 54.983)

    def test_box_intersects(self, q):
        # bounds.test:109-117 — real France since round 6
        assert (
            q(
                "SELECT s2_box_intersects(s2_bounds_box(s2_data_country('Germany')), "
                "s2_bounds_box(s2_data_country('France')))"
            )
            is True
        )
        assert (
            q(
                "SELECT s2_box_intersects(s2_bounds_box(s2_data_country('Germany')), "
                "s2_bounds_box(s2_data_country('Canada')))"
            )
            is False
        )

    def test_box_union(self, q):
        # bounds.test:119-127; DEVIATION: the reference's 6.000000000000001
        # is a degree->radian->degree roundtrip artifact of S2's interval
        # math — our degree-domain arithmetic returns exactly 6.0
        b = q("SELECT s2_box_union(s2_box(0, 1, 2, 3), s2_box(4, 5, 6, 7))")
        assert (b.xmin, b.ymin, b.ymax) == (0.0, 1.0, 7.0)
        assert b.xmax == pytest.approx(6.0, abs=1e-12)
        b = q("SELECT s2_box_union(s2_box(179, 1, 180, 3), s2_box(-180, 5, -179, 7))")
        assert (b.xmin, b.ymin, b.xmax, b.ymax) == (179.0, 1.0, -179.0, 7.0)


# ---------------------------------------------------------------------------
# binary_index_ops.test
# ---------------------------------------------------------------------------


class TestBinaryIndexOps:
    def test_mayintersect(self, q):
        # binary_index_ops.test:9-31
        g = GEOG.format
        assert q(f"SELECT s2_mayintersect({g('POINT (-64 45)')}, {g('POINT (-64 45)')})") is True
        assert q(f"SELECT s2_mayintersect({g('POINT (-64 45)')}, {g('POINT (-64 46)')})") is False
        assert q(f"SELECT s2_mayintersect({g('POINT (-64 45)')}, {g('POINT EMPTY')})") is False
        assert q(f"SELECT s2_mayintersect({g('POINT EMPTY')}, {g('POINT (-64 46)')})") is False

    def test_intersects_cities(self, q):
        # binary_index_ops.test:33-52
        assert q("SELECT s2_intersects(s2_data_city('Vancouver'), s2_data_country('Canada'))") is True
        assert q("SELECT s2_mayintersect(s2_data_city('Chicago'), s2_data_country('Canada'))") is True
        assert q("SELECT s2_intersects(s2_data_city('Chicago'), s2_data_country('Canada'))") is False

    def test_contains_order(self, q):
        # binary_index_ops.test:54-64
        assert q("SELECT s2_contains(s2_data_city('Toronto'), s2_data_country('Canada'))") is False
        assert q("SELECT s2_contains(s2_data_country('Canada'), s2_data_city('Toronto'))") is True

    def test_equals(self, q):
        # binary_index_ops.test:66-70
        assert q("SELECT s2_equals(s2_data_country('Canada'), s2_data_country('Canada'))") is True

    def test_intersection(self, q):
        # binary_index_ops.test:72-94
        g = GEOG.format
        assert (
            q(f"SELECT s2_astext(s2_intersection({g('POINT (-64 45)')}, {g('POINT (-64 46)')}))")
            == "GEOMETRYCOLLECTION EMPTY"
        )
        assert (
            q(f"SELECT s2_format(s2_intersection({g('POINT (-64 45)')}, {g('POINT EMPTY')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_format(s2_intersection({g('POINT EMPTY')}, {g('POINT (-64 45)')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_format(s2_intersection({g('POINT (-64 45)')}, {g('POINT (-64 45)')}), 6)")
            == "POINT (-64 45)"
        )

    def test_difference(self, q):
        # binary_index_ops.test:96-118
        g = GEOG.format
        assert (
            q(f"SELECT s2_format(s2_difference({g('POINT (-64 45)')}, {g('POINT (-64 46)')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_format(s2_difference({g('POINT (-64 45)')}, {g('POINT EMPTY')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_astext(s2_difference({g('POINT EMPTY')}, {g('POINT (-64 45)')}))")
            == "GEOMETRYCOLLECTION EMPTY"
        )
        assert (
            q(f"SELECT s2_astext(s2_difference({g('POINT (-64 45)')}, {g('POINT (-64 45)')}))")
            == "GEOMETRYCOLLECTION EMPTY"
        )

    def test_union(self, q):
        # binary_index_ops.test:120-136
        g = GEOG.format
        assert (
            q(f"SELECT s2_format(s2_union({g('POINT (-64 45)')}, {g('POINT EMPTY')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_format(s2_union({g('POINT EMPTY')}, {g('POINT (-64 45)')}), 6)")
            == "POINT (-64 45)"
        )
        assert (
            q(f"SELECT s2_format(s2_union({g('POINT (-64 45)')}, {g('POINT (-64 46)')}), 6)")
            == "MULTIPOINT ((-64 45), (-64 46))"
        )

    def test_dwithin(self, q):
        # binary_index_ops.test:138-166
        assert q("SELECT s2_dwithin(s2_data_city('Vancouver'), s2_data_city('Toronto'), 3000000)") is False
        assert q("SELECT s2_dwithin(s2_data_city('Vancouver'), s2_data_city('Toronto'), 4000000)") is True
        cc = "s2_cell_center_to_geography(s2_geography_to_cell_center({}))"
        v = cc.format("s2_data_city('Vancouver')")
        t = cc.format("s2_data_city('Toronto')")
        assert q(f"SELECT s2_dwithin({v}, {t}, 3000000)") is False
        assert q(f"SELECT s2_dwithin({v}, {t}, 4000000)") is True
        g = GEOG.format
        assert (
            q(f"SELECT s2_dwithin({g('POINT EMPTY')}, s2_data_city('Toronto'), CAST('inf' AS DOUBLE))")
            is False
        )
        assert (
            q(f"SELECT s2_dwithin(s2_data_city('Toronto'), {g('POINT EMPTY')}, CAST('inf' AS DOUBLE))")
            is False
        )

    def test_distance(self, q):
        # binary_index_ops.test:168-190; DEVIATION on the both-snapped
        # row: the reference's 3354018.3501422736 is an asymmetric
        # snap(lhs)-vs-raw(rhs) evaluation (root-caused in
        # tests/test_cellmath.py), reproduced since round 6 by the
        # geography-level cast s2_snap_to_cell_center (the reference's
        # ::S2_CELL_CENTER used as a GEOGRAPHY)
        assert (
            q("SELECT s2_distance(s2_data_city('Vancouver'), s2_data_city('Toronto'))")
            == 3354018.3461295413
        )
        cc = "s2_snap_to_cell_center({})"
        v = cc.format("s2_data_city('Vancouver')")
        t = cc.format("s2_data_city('Toronto')")
        assert q(f"SELECT s2_distance({v}, {t})") == 3354018.3501422736
        # the bare-long cast chain cannot carry pre-snap provenance and
        # stays symmetric (same value as the plain golden)
        ccl = "s2_cell_center_to_geography(s2_geography_to_cell_center({}))"
        vl = ccl.format("s2_data_city('Vancouver')")
        tl = ccl.format("s2_data_city('Toronto')")
        assert q(f"SELECT s2_distance({vl}, {tl})") == 3354018.3461295413
        g = GEOG.format
        assert math.isinf(q(f"SELECT s2_distance({g('POINT EMPTY')}, s2_data_city('Toronto'))"))
        assert math.isinf(q(f"SELECT s2_distance(s2_data_city('Toronto'), {g('POINT EMPTY')})"))

    def test_max_distance(self, q):
        # binary_index_ops.test:192-214
        cc = "s2_snap_to_cell_center({})"
        v = cc.format("s2_data_city('Vancouver')")
        t = cc.format("s2_data_city('Toronto')")
        assert (
            q(f"SELECT s2_max_distance({v}, s2_data_city('Toronto'))") == 3354018.3461295413
        )
        # both-snapped max_distance: the reference's asymmetric golden
        # (same decomposition as test_distance)
        assert q(f"SELECT s2_max_distance({v}, {t})") == 3354018.3501422736
        g = GEOG.format
        assert math.isinf(q(f"SELECT s2_max_distance({g('POINT EMPTY')}, s2_data_city('Toronto'))"))
        assert math.isinf(q(f"SELECT s2_max_distance(s2_data_city('Toronto'), {g('POINT EMPTY')})"))

    def test_max_distance_exceeds_distance(self, q):
        # binary_index_ops.test:216-221
        assert (
            q(
                "SELECT s2_max_distance(s2_data_city('Vancouver'), s2_data_country('Fiji')) > "
                "s2_distance(s2_data_city('Vancouver'), s2_data_country('Fiji'))"
            )
            is True
        )


# ---------------------------------------------------------------------------
# data.test
# ---------------------------------------------------------------------------


class TestData:
    def test_unknown_city_errors(self, spark):
        # data.test:8-11
        with pytest.raises(Exception, match="No entry for item 'Halifax'"):
            spark.sql("SELECT s2_data_city('Halifax')").collect()

    def test_vancouver(self, q):
        # data.test:13-16
        assert q("SELECT s2_format(s2_data_city('Vancouver'), 6)") == "POINT (-123.12359 49.275362)"

    def test_cities_tsv_matches_table(self, spark, tmp_path):
        # data.test:18-30 — since round 6 the package bundles the SAME
        # Natural Earth TSV the reference ships; materialize it to disk
        # and check TSV ingestion reproduces the sample table row-for-row
        from duckdb_geography_spark.functions.data import _cities_pdf
        from duckdb_geography_spark.sources import read_tsv_geography

        pdf = _cities_pdf().rename(columns={"geog_wkt": "geog"})
        path = str(tmp_path / "cities.tsv")
        pdf.to_csv(path, sep="\t", index=False)
        df = read_tsv_geography(spark, path, wkt_col="geog")
        df.createOrReplaceTempView("cities_tsv")
        assert spark.sql("SELECT count(*) FROM cities_tsv").collect()[0][0] == 243
        n = spark.sql(
            "SELECT sum(CAST(s2_format(cities_tsv.geog, 9) = s2_format(cities.geog, 9) AS INT)) "
            "FROM cities_tsv INNER JOIN s2_data_cities AS cities ON cities_tsv.name = cities.name"
        ).collect()[0][0]
        assert n == 243

    def test_countries_tsv_matches_table(self, spark, tmp_path):
        # data.test:32-44
        from duckdb_geography_spark.functions.data import _countries_pdf
        from duckdb_geography_spark.sources import read_tsv_geography

        pdf = _countries_pdf().rename(columns={"geog_wkt": "geog"})
        path = str(tmp_path / "countries.tsv")
        pdf.to_csv(path, sep="\t", index=False)
        df = read_tsv_geography(spark, path, wkt_col="geog")
        df.createOrReplaceTempView("countries_tsv")
        assert spark.sql("SELECT count(*) FROM countries_tsv").collect()[0][0] == 177
        n = spark.sql(
            "SELECT sum(CAST(s2_format(countries_tsv.geog, 9) = s2_format(countries.geog, 9) AS INT)) "
            "FROM countries_tsv INNER JOIN s2_data_countries AS countries "
            "ON countries_tsv.name = countries.name"
        ).collect()[0][0]
        assert n == 177


# ---------------------------------------------------------------------------
# geoarrow.test
# ---------------------------------------------------------------------------


class TestGeoArrow:
    def test_register_extensions(self):
        # geoarrow.test:6-9
        from duckdb_geography_spark.geoarrow import s2_register_geoarrow_extensions

        assert s2_register_geoarrow_extensions() is True
