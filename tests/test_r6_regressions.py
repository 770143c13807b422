"""Round-6 regression tests: the ADVICE r5 fixes (bm25 constants —
see test_retrieval.py, rewrite pass-cap loudness, bounded cell-union
cache, zorder schema) and the VERDICT r5 hygiene items (geoarrow
driver-collect guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# rewrite: 10-pass cap must not silently ship a naive join (ADVICE r5)
# ---------------------------------------------------------------------------


class TestRewritePassCap:
    def test_cap_exhaustion_raises_not_silent(self, spark, monkeypatch):
        from duckdb_geography_spark import rewrite as RW
        from duckdb_geography_spark.functions.register import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        spark.createDataFrame(
            [(1, bytes(0))], "id long, geog binary"
        ).createOrReplaceTempView("r6_rw_a")
        naive = spark.sql(
            """
            SELECT a.id FROM r6_rw_a a JOIN r6_rw_a b
            ON s2_intersects(a.geog, b.geog)
            """
        )
        # Simulate a rewrite that never converges: each pass returns the
        # plan unchanged, so after 10 passes a naive join remains and the
        # guard must raise instead of returning a cartesian plan.
        monkeypatch.setattr(
            RW,
            "_rewrite_one",
            lambda spark, analyzed, join, anc, drv, res, lvl, warn: analyzed,
        )
        with pytest.raises(RW.RewriteUnsupported, match="10 rewrite"):
            RW.rewrite_spatial_joins(naive, warn=False)


# ---------------------------------------------------------------------------
# cell-union cache: big unions compute but do not cache (ADVICE r5)
# ---------------------------------------------------------------------------


class TestCellUnionCacheBound:
    def test_union_cache_is_byte_budgeted_and_memoizing(self):
        import numpy as np

        from duckdb_geography_spark.functions import casts as C
        from duckdb_geography_spark.s2 import cellmath as cm

        def leaf(lon, lat):
            return int(
                cm.lonlat_to_cellid(np.array([lon]), np.array([lat]))
                .view(np.int64)[0]
            )

        C._cell_union_geog_bytes.cache_clear()
        small = tuple(leaf(float(i), 10.0) for i in range(2))
        big = tuple(
            leaf(float(i % 179), float(i % 79)) for i in range(65)
        )
        a = C._cell_union_geog_bytes(small)
        b = C._cell_union_geog_bytes(big)
        assert a and b
        # BOTH sizes memoize (no count cliff), bounded by a byte budget
        assert C._cell_union_geog_bytes(small) == a
        assert C._cell_union_geog_bytes(big) == b
        assert C._cell_union_geog_bytes.hits == 2
        assert C._cell_union_geog_bytes.misses == 2
        assert C._cell_union_geog_bytes.total <= C._cell_union_geog_bytes.budget

    def test_byte_budget_evicts_by_value_size(self):
        from duckdb_geography_spark.functions.geoudfs import ByteBudgetLRU

        cache = ByteBudgetLRU(
            100, lambda v: len(v), lambda k: b"x" * (40 * k), charge_value=True
        )
        cache(1)  # 40 bytes
        cache(2)  # 80 -> evicts key 1 (total would be 120 > 100)
        assert len(cache) == 1
        cache(3)  # oversized? 120 > budget: computed, not cached
        assert len(cache) <= 2
        assert cache(1) == b"x" * 40  # still correct after eviction


# ---------------------------------------------------------------------------
# write_zordered: output schema equals input schema (ADVICE r5)
# ---------------------------------------------------------------------------


class TestZorderSchema:
    def test_written_schema_has_no_internal_z(self, spark, tmp_path):
        from duckdb_geography_spark import sources as S

        df = spark.createDataFrame(
            [(i % 7, i % 11, i) for i in range(100)], "x long, y long, rid long"
        )
        path = str(tmp_path / "z6")
        S.write_zordered(df, path, ["x", "y"], bits=8, num_files=2)
        back = spark.read.parquet(path)
        assert sorted(back.columns) == ["rid", "x", "y"]
        assert back.count() == 100


# ---------------------------------------------------------------------------
# double-snap distance golden (VERDICT r5 item 4)
# ---------------------------------------------------------------------------


class TestSnapCastDistance:
    """The reference's both-::S2_CELL_CENTER distance goldens
    (binary_index_ops.test:174-178, 201-205) are an asymmetric
    snap(lhs)-vs-raw(rhs) evaluation — reproduced only when BOTH args
    carry the cast tag from s2_snap_to_cell_center."""

    @pytest.fixture(scope="class")
    def q(self, spark):
        from duckdb_geography_spark.functions.register import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        return lambda s: spark.sql(s).head()[0]

    def test_four_goldens(self, q):
        cc = "s2_snap_to_cell_center({})"
        v = cc.format("s2_data_city('Vancouver')")
        t = cc.format("s2_data_city('Toronto')")
        # direct (parse-produced) stays symmetric
        assert (
            q("SELECT s2_distance(s2_data_city('Vancouver'), s2_data_city('Toronto'))")
            == 3354018.3461295413
        )
        # both-cast: the reference's asymmetric goldens, min and max
        assert q(f"SELECT s2_distance({v}, {t})") == 3354018.3501422736
        assert q(f"SELECT s2_max_distance({v}, {t})") == 3354018.3501422736
        # one-cast: symmetric again
        assert (
            q(f"SELECT s2_max_distance({v}, s2_data_city('Toronto'))")
            == 3354018.3461295413
        )

    def test_cast_value_reads_snapped_everywhere_else(self, q):
        cc = "s2_snap_to_cell_center(s2_data_city('Vancouver'))"
        assert q(f"SELECT s2_astext({cc})") == q(
            "SELECT s2_astext(s2_data_city('Vancouver'))"
        )
        assert q(f"SELECT s2_x({cc})") == q(
            "SELECT s2_x(s2_data_city('Vancouver'))"
        )

    def test_raw_point_roundtrips_codec(self):
        from duckdb_geography_spark.geo.geography import Geography

        g = Geography.point(-79.4219667, 43.7019257)
        back = Geography.decode(g.encode())
        assert back.raw_point is not None
        assert tuple(back.raw_point) == (-79.4219667, 43.7019257)
        assert not back.cast_tag
        # cell-center constructed from a bare id stays 12 bytes (no raw)
        from duckdb_geography_spark.geo.geography import KIND_CELL_CENTER

        bare = Geography.cell_center(back.cell_id)
        assert len(bare.encode()) == 12

    def test_non_point_snap_errors(self, q):
        with pytest.raises(Exception, match="single point"):
            q("SELECT s2_astext(s2_snap_to_cell_center(s2_data_country('Fiji')))")

    def test_empty_snap_is_empty_point(self, q):
        e = "s2_snap_to_cell_center(s2_geogfromtext('POINT EMPTY'))"
        assert q(f"SELECT s2_astext({e})") == "POINT EMPTY"
        assert q(f"SELECT s2_distance({e}, {e})") == float("inf")

    def test_cast_value_bounds_are_snapped_like_long_chain(self, q):
        # The raw-bounds path is for PARSE-produced values only: the
        # reference's ::S2_CELL_CENTER stores just the cell id, so a
        # cast value's rect is the snapped center — identical to the
        # bare-long chain (code-review r6 finding).
        snap = "s2_bounds_box(s2_snap_to_cell_center(s2_data_city('Vancouver')))"
        chain = (
            "s2_bounds_box(s2_cell_center_to_geography("
            "s2_geography_to_cell_center(s2_data_city('Vancouver'))))"
        )
        a, b = q(f"SELECT {snap}"), q(f"SELECT {chain}")
        assert tuple(a) == tuple(b)
        # and it is NOT the raw-coordinate rect the plain city reports
        raw = q("SELECT s2_bounds_box(s2_data_city('Vancouver'))")
        assert raw.xmin == -123.12359 and a.xmin != raw.xmin

    def test_write_geoparquet_max_rows_passthrough(self, spark, tmp_path):
        import pytest

        from duckdb_geography_spark import geoarrow as GA
        from duckdb_geography_spark.functions.data import s2_data_cities

        cities = s2_data_cities(spark)
        with pytest.raises(ValueError, match="max_rows"):
            GA.write_geoparquet(cities, str(tmp_path / "a.parquet"), max_rows=5)
        GA.write_geoparquet(cities, str(tmp_path / "b.parquet"), max_rows=None)
        assert GA.read_geoparquet(spark, str(tmp_path / "b.parquet")).count() == 243


# ---------------------------------------------------------------------------
# to_geoarrow_table: driver-collect guard (VERDICT r5 item 6)
# ---------------------------------------------------------------------------


class TestGeoArrowGuard:
    def test_max_rows_cap_raises(self, spark):
        from duckdb_geography_spark import geoarrow as GA
        from duckdb_geography_spark.functions.data import s2_data_cities

        cities = s2_data_cities(spark)
        with pytest.raises(ValueError, match="max_rows"):
            GA.to_geoarrow_table(cities, geog_col="geog", max_rows=5)
        # opt-out and a big-enough cap both still export
        assert GA.to_geoarrow_table(cities, geog_col="geog").num_rows > 5
        assert (
            GA.to_geoarrow_table(
                cities, geog_col="geog", max_rows=None
            ).num_rows
            > 5
        )
