"""SQL-surface registration: ``spark.sql("SELECT s2_...")`` parity.

The reference installs every function into DuckDB's catalog
(src/function_builder.cpp:6-43); Spark's equivalent is
``spark.udf.register``. DataFrame users should prefer the Column
helpers (pure-JVM fast paths); the SQL surface routes everything
through Arrow-batched pandas UDFs for uniformity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
)

from ..s2 import cellmath as cm


def _np_udf(ret, fn):
    @F.pandas_udf(ret)
    def _udf(*cols: pd.Series) -> pd.Series:
        return fn(*cols)

    return _udf


def register_sql_functions(spark: SparkSession) -> None:
    """Register the s2_* surface for SQL queries (idempotent)."""
    from . import accessors as A
    from . import casts as X
    from . import cells as C
    from . import io as IO
    from . import predicates as P
    from .bounds import _bounds_box_udf, _box_union_udf, _box_wkb_udf, _covering_udf

    r = spark.udf.register

    # cell ops (numpy-backed SQL twins of the pure-Column fast paths)
    def u(s):
        return cm.to_unsigned(s.to_numpy(np.int64, na_value=-1))

    r("s2_cellfromlonlat", C._cellfromlonlat_udf)
    # bit-op cell functions as SQL SCALAR FUNCTIONS (Spark 4's
    # CREATE FUNCTION ... RETURN expr): the SQL surface gets the same
    # pure-JVM expressions the Column helpers compile to — previously
    # these were pandas UDFs and a spark.sql user silently paid the
    # Python-worker tax on the hottest ops. Semantics mirror
    # functions/cells.py exactly (validity guards, -1 sentinels,
    # NULL -> false/NULL contracts); the ported reference corpus
    # (tests/test_sqllogic_corpus.py) exercises them.
    valid = (
        "(c IS NOT NULL AND shiftrightunsigned(c, 61) < 6 "
        "AND ((c & -c) & 1537228672809129301L) != 0)"
    )
    lev_of = "CAST(30 - (bit_count((c & -c) - 1) div 2) AS INT)"
    parent_tgt = "greatest(0, least(30, IF(lev < 0, s2_cell_level(c) + lev, lev)))"
    parent_lsb = f"shiftleft(CAST(1 AS BIGINT), CAST(2 * (30 - {parent_tgt}) AS INT))"
    for ddl in (
        f"CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_is_valid(c BIGINT) "
        f"RETURNS BOOLEAN COMMENT 'Return true for a structurally valid S2_CELL id.' RETURN {valid}",
        f"CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_level(c BIGINT) "
        f"RETURNS INT COMMENT 'Extract the level (0-30, inclusive) from an S2_CELL; -1 for invalid cells.' RETURN IF({valid}, {lev_of}, -1)",
        f"CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_parent(c BIGINT, lev INT) "
        f"RETURNS BIGINT COMMENT 'Compute a parent S2_CELL (negative lev = relative to the current level).' RETURN IF(NOT s2_cell_is_valid(c) OR {parent_tgt} > s2_cell_level(c), "
        f"CAST(-1 AS BIGINT), "
        f"(c & ~({parent_lsb} + {parent_lsb} - 1)) | {parent_lsb})",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_child(c BIGINT, k INT) "
        "RETURNS BIGINT COMMENT 'Compute child k (0-3) of an S2_CELL; -1 for leaves/invalid.' RETURN IF(NOT s2_cell_is_valid(c) OR k < 0 OR k > 3 OR (c & -c) = 1, "
        "CAST(-1 AS BIGINT), "
        "c - (c & -c) + shiftright(c & -c, 2) + 2 * shiftright(c & -c, 2) * CAST(k AS BIGINT))",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_range_min(c BIGINT) "
        "RETURNS BIGINT COMMENT 'Minimum leaf cell value contained within an S2_CELL.' RETURN IF(s2_cell_is_valid(c), c - ((c & -c) - 1), CAST(-1 AS BIGINT))",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_range_max(c BIGINT) "
        "RETURNS BIGINT COMMENT 'Maximum leaf cell value contained within an S2_CELL.' RETURN IF(s2_cell_is_valid(c), c + ((c & -c) - 1), CAST(-1 AS BIGINT))",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_contains(a BIGINT, b BIGINT) "
        "RETURNS BOOLEAN COMMENT 'Return true if cell a contains cell b.' RETURN s2_cell_is_valid(a) AND s2_cell_is_valid(b) "
        "AND a - ((a & -a) - 1) <= b AND b <= a + ((a & -a) - 1)",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_intersects(a BIGINT, b BIGINT) "
        "RETURNS BOOLEAN COMMENT 'Return true if a contains b or b contains a.' RETURN s2_cell_contains(a, b) OR s2_cell_contains(b, a)",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_token(c BIGINT) "
        "RETURNS STRING COMMENT 'Serialize an S2_CELL as a compact hexadecimal token (X for 0).' RETURN CASE WHEN c = 0 THEN 'X' "
        "ELSE regexp_replace(lpad(lower(hex(c)), 16, '0'), '0+$', '') END",
        "CREATE OR REPLACE TEMPORARY FUNCTION s2_cell_from_token(t STRING) "
        "RETURNS BIGINT COMMENT 'Parse a hexadecimal token as an S2_CELL (0 for malformed tokens).' RETURN IF(lower(t) RLIKE '^[0-9a-f]{1,16}$', "
        "CAST(CASE WHEN CAST(conv(rpad(lower(t), 16, '0'), 16, 10) AS DECIMAL(20,0)) "
        "          > CAST('9223372036854775807' AS DECIMAL(20,0)) "
        "THEN CAST(conv(rpad(lower(t), 16, '0'), 16, 10) AS DECIMAL(20,0)) "
        "     - CAST('18446744073709551616' AS DECIMAL(21,0)) "
        "ELSE CAST(conv(rpad(lower(t), 16, '0'), 16, 10) AS DECIMAL(20,0)) END AS BIGINT), "
        "CAST(0 AS BIGINT))",
    ):
        spark.sql(ddl)
    r("s2_cell_debug_string", C._cell_debug_string_udf)
    r("s2_cell_from_debug_string", C._cell_from_debug_string_udf)
    r("s2_cell_edge_neighbor", C._cell_edge_neighbor_udf)
    r("s2_cell_center_lon", C._cell_center_lon_udf)
    r("s2_cell_center_lat", C._cell_center_lat_udf)

    # io
    @F.pandas_udf(StringType())
    def _format_sql_udf(s: pd.Series, prec: pd.Series) -> pd.Series:
        from . import geoudfs as GU

        s = GU.coerce_geog(s)
        out = []
        for b, p in zip(s, prec):
            if b is None or p is None:
                out.append(None)
            else:
                out.append(GU.decode_cached(bytes(b)).to_wkt(int(p)))
        return pd.Series(out, dtype=object)

    r("s2_format", _format_sql_udf)
    r("s2_geogfromtext", IO._geogfromtext_udf)
    r("s2_geogfromtext_novalidate", IO._geogfromtext_novalidate_udf)
    r("s2_astext", IO._astext_udf)
    r("s2_geogfromwkb", IO._geogfromwkb_udf)
    r("s2_geogfromwkb_novalidate", IO._geogfromwkb_novalidate_udf)
    r("s2_aswkb", IO._aswkb_udf)
    r("s2_prepare", IO._prepare_udf)

    # accessors
    r("s2_isempty", A._isempty_udf)
    r("s2_is_valid", A._is_valid_udf)
    r("s2_is_valid_reason", A._is_valid_reason_udf)
    r("s2_area", A._area_udf)
    r("s2_perimeter", A._perimeter_udf)
    r("s2_length", A._length_udf)
    r("s2_x", A._x_udf)
    r("s2_y", A._y_udf)
    r("s2_dimension", A._dimension_udf)
    r("s2_num_points", A._num_points_udf)

    # predicates / overlays / distances
    r("s2_mayintersect", P._mayintersect_udf)
    r("s2_intersects", P._intersects_udf)
    r("s2_contains", P._contains_udf)
    r("s2_equals", P._equals_udf)
    r("s2_intersection", P._intersection_udf)
    r("s2_difference", P._difference_udf)
    r("s2_union", P._union_udf)
    r("s2_distance", P._distance_udf)
    r("s2_max_distance", P._max_distance_udf)
    r("s2_dwithin", P._dwithin_udf)

    # bounds & casts
    r("s2_covering", _covering_udf)
    r("s2_bounds_box", _bounds_box_udf)
    r("s2_box_union", _box_union_udf)
    r("s2_box_wkb", _box_wkb_udf)
    r("s2_cell_center_to_geography", X._cell_center_to_geography_udf)
    r("s2_geography_to_cell_center", X._geography_to_cell_center_udf)
    r("s2_snap_to_cell_center", X._snap_to_cell_center_udf)
    r("s2_cell_to_geography", X._cell_to_geography_udf)
    r("s2_cell_union_to_geography", X._cell_union_to_geography_udf)
    r("s2_cell_union_normalize", X._cell_union_normalize_udf)
    r("s2_cellfromwkb", X._cellfromwkb_udf)
    r("s2_arbitrarycellfromwkb", X._arbitrarycellfromwkb_udf)
    r("s2_cell_vertex", X._cell_vertex_udf)
    def _cell_to_union_batch(s: pd.Series) -> pd.Series:
        valid = cm.is_valid(u(s))  # one vectorized pass per batch
        vals = s.to_numpy()
        return pd.Series(
            [
                None if v is None else ([int(v)] if ok else [])
                for v, ok in zip(vals, valid)
            ],
            dtype=object,
        )

    r("s2_cell_to_cell_union", _np_udf(ArrayType(LongType()), _cell_to_union_batch))

    # bounds aggregate: GROUPED_AGG UDFs can't return structs, so the
    # SQL surface exposes the [xmin, ymin, xmax, ymax] array form; wrap
    # with named_struct(...) for the struct shape (see bounds.py).
    # s2_bounds_box_agg takes the geography blob (syntax compat — SQL
    # can't compose a scalar projection into an aggregate call, so this
    # form ships blobs through the exchange); the scale path is
    # s2_bounds_box_agg_boxes(s2_bounds_box_arr(g)), whose per-row
    # 4-double projection runs below the shuffle like the Python API.
    from .bounds import _bounds_box_agg_arr, _bounds_box_agg_boxes, _bounds_box_udf

    r("s2_bounds_box_agg", _bounds_box_agg_arr)
    r("s2_bounds_box_agg_boxes", _bounds_box_agg_boxes)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _bounds_box_arr_sql(s: pd.Series) -> pd.Series:
        from ..geo import ops as _ops
        from . import geoudfs as GU

        s = GU.coerce_geog(s)
        return pd.Series(
            [
                None if b is None else list(_ops.bounds_rect(GU.decode_cached(bytes(b))))
                for b in s
            ],
            dtype=object,
        )

    r("s2_bounds_box_arr", _bounds_box_arr_sql)

    # covering at a fixed level: the reference requires a constant level
    # (src/s2_bounds.cpp:90-99); the SQL surface receives it as a column,
    # so enforce constancy per batch with the reference's error message
    from ..s2.coverer import covering_of_encoded

    @F.pandas_udf(ArrayType(LongType()))
    def _covering_fixed_sql_udf(s: pd.Series, lev: pd.Series) -> pd.Series:
        from . import geoudfs as GU

        s = GU.coerce_geog(s)
        levels = lev.dropna().unique()
        if len(levels) > 1:
            raise ValueError("s2_covering_fixed_level(): level must be a constant")
        out = []
        for b, l in zip(s, lev):
            # NULL level arrives as NaN through the Arrow float path,
            # not None — NULL-in/NULL-out, don't crash the task
            if b is None or l is None or pd.isna(l):
                out.append(None)
                continue
            cells = covering_of_encoded(bytes(b), fixed_level=int(l))
            out.append([int(v) for v in cells.view(np.int64)])
        return pd.Series(out, dtype=object)

    r("s2_covering_fixed_level", _covering_fixed_sql_udf)

    # scalar sample-data lookups (src/s2_data.cpp:143-190; errors on
    # unknown names like the reference)
    from .data import s2_data_city as _city
    from .data import s2_data_country as _country

    @F.pandas_udf("binary")
    def _data_city_udf(s: pd.Series) -> pd.Series:
        return pd.Series([None if n is None else _city(str(n)) for n in s], dtype=object)

    @F.pandas_udf("binary")
    def _data_country_udf(s: pd.Series) -> pd.Series:
        return pd.Series([None if n is None else _country(str(n)) for n in s], dtype=object)

    r("s2_data_city", _data_city_udf)
    r("s2_data_country", _data_country_udf)

    # box constructor / intersects / struct are pure expressions on the
    # DataFrame surface; SQL gets thin equivalents so the reference
    # corpus replays 1:1 (src/s2_bounds.cpp:494-603)
    @F.pandas_udf("struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    def _box_sql_udf(w: pd.Series, s: pd.Series, e: pd.Series, n: pd.Series) -> pd.DataFrame:
        # literals arrive as DECIMAL from the SQL parser — go through
        # float() (nearest-double of the decimal text), not numpy's
        # Decimal path
        def dbl(col):
            return [None if v is None else float(v) for v in col]

        return pd.DataFrame(
            {"xmin": dbl(w), "ymin": dbl(s), "xmax": dbl(e), "ymax": dbl(n)},
            dtype="float64",
        )

    r("s2_box", _box_sql_udf)

    @F.pandas_udf(BooleanType())
    def _box_intersects_sql_udf(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        def lng_overlap(alo, ahi, blo, bhi):
            def contains(lo, hi, p):
                return (lo <= p <= hi) if lo <= hi else (p >= lo or p <= hi)

            return (
                contains(alo, ahi, blo)
                or contains(alo, ahi, bhi)
                or contains(blo, bhi, alo)
                or contains(blo, bhi, ahi)
            )

        out = []
        for x, y in zip(a.itertuples(index=False), b.itertuples(index=False)):
            if any(pd.isna(v) for v in (x.ymin, x.ymax, y.ymin, y.ymax, x.xmin, x.xmax, y.xmin, y.xmax)):
                out.append(None)  # NULL box -> NULL, like the Column path
                continue
            # empty-rect guard (ymin > ymax, e.g. the EMPTY_RECT
            # sentinel): same validity conjunct as the Column
            # s2_box_intersects (bounds.py) — empties intersect nothing
            lat = (
                x.ymin <= y.ymax
                and y.ymin <= x.ymax
                and x.ymin <= x.ymax
                and y.ymin <= y.ymax
            )
            out.append(bool(lat and lng_overlap(x.xmin, x.xmax, y.xmin, y.xmax)))
        return pd.Series(out, dtype=object)

    r("s2_box_intersects", _box_intersects_sql_udf)

    @F.pandas_udf("struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    def _box_struct_sql_udf(b: pd.DataFrame) -> pd.DataFrame:
        return b  # boxes already travel as plain structs

    r("s2_box_struct", _box_struct_sql_udf)

    # smoke (reference: src/geography_extension.cpp:18-27)
    spark.udf.register("s2", lambda: "s2", StringType())


def register_sample_data(spark: SparkSession) -> None:
    """Create temp views for the sample table functions
    (s2_data_cities / s2_data_countries / s2_dependencies)."""
    from .data import s2_data_cities, s2_data_countries, s2_dependencies

    s2_data_cities(spark).createOrReplaceTempView("s2_data_cities")
    s2_data_countries(spark).createOrReplaceTempView("s2_data_countries")
    s2_dependencies(spark).createOrReplaceTempView("s2_dependencies")
