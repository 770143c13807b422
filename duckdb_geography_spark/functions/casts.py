"""Cast-graph equivalents (reference: src/s2_cell_ops.cpp:1019-1067).

Spark has no user cast registry, so each DuckDB cast becomes an
explicit helper (SURVEY.md S2.3). Cell ids are LongType; GEOGRAPHY is
our tagged binary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, LongType

from ..geo.geography import (
    KIND_MULTIPOLYGON,
    KIND_POINT,
    KIND_POLYGON,
    Geography,
    from_wkb,
)
from ..s2 import cellmath as cm
from ..s2.coverer import normalize_cell_union
from . import geoudfs as U

__all__ = [
    "s2_cell_center_to_geography",
    "s2_geography_to_cell_center",
    "s2_snap_to_cell_center",
    "s2_cell_to_geography",
    "s2_cell_union_to_geography",
    "s2_cell_union_normalize",
    "s2_cell_to_cell_union",
    "s2_cellfromwkb",
    "s2_arbitrarycellfromwkb",
    "s2_cell_vertex",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


@F.pandas_udf(BinaryType())
def _cell_center_to_geography_udf(s: pd.Series) -> pd.Series:
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        cid = np.uint64(np.int64(v))
        if cm.is_valid(np.array([cid]))[0]:
            out.append(Geography.cell_center(cid).encode())
        else:
            out.append(Geography(KIND_POINT).encode())  # POINT EMPTY
    return pd.Series(out, dtype=object)


def s2_cell_center_to_geography(cell) -> Column:
    """S2_CELL_CENTER -> snapped point GEOGRAPHY; invalid -> POINT EMPTY
    (src/s2_cell_ops.cpp:514-551)."""
    return _cell_center_to_geography_udf(_c(cell))


def _require_single_point(g):
    """The reference's GEOGRAPHY->S2_CELL_CENTER input contract
    (src/s2_cell_ops.cpp:20-68): non-empty, exactly one point — shared
    by the long cast and the geography-level snap cast so the two
    surfaces cannot drift. Returns the point's lon/lat."""
    p = g.single_point()
    if p is None or g.all_lines() or g.all_polygons():
        raise ValueError(
            "Can't convert geography that is not empty nor a single point to S2_CELL_CENTER"
        )
    return p


@F.pandas_udf(LongType())
def _geography_to_cell_center_udf(s: pd.Series) -> pd.Series:
    out = []
    for b in s:
        if b is None:
            out.append(None)
            continue
        g = U.decode_cached(bytes(b))
        if g.is_empty():
            out.append(-1)  # sentinel bit pattern
            continue
        p = _require_single_point(g)
        cid = cm.lonlat_to_cellid([p[0]], [p[1]])[0]
        out.append(int(cm.to_signed(np.array([cid]))[0]))
    # object dtype: int64 cannot carry the Nones NULL inputs produce
    return pd.Series(out, dtype=object)


def s2_geography_to_cell_center(geog) -> Column:
    """GEOGRAPHY -> S2_CELL_CENTER (lossy <=2 cm); errors on non-point
    input (src/s2_cell_ops.cpp:20-68)."""
    return _geography_to_cell_center_udf(_c(geog))


@F.pandas_udf(BinaryType())
def _snap_to_cell_center_udf(s: pd.Series) -> pd.Series:
    from ..geo.geography import KIND_CELL_CENTER

    out = []
    for b in s:
        if b is None:
            out.append(None)
            continue
        g = U.decode_cached(bytes(b))
        if g.is_empty():
            out.append(Geography(KIND_POINT).encode())
            continue
        if g.kind == KIND_CELL_CENTER:
            cid = np.uint64(g.cell_id)
            raw = g.raw_point
        else:
            p = _require_single_point(g)
            cid = cm.lonlat_to_cellid([p[0]], [p[1]])[0]
            raw = np.array(p, dtype=np.float64)
        snapped = Geography.cell_center(cid)
        snapped.raw_point = raw
        snapped.cast_tag = True
        out.append(snapped.encode())
    return pd.Series(out, dtype=object)


def s2_snap_to_cell_center(geog) -> Column:
    """The reference's ``geog::S2_CELL_CENTER`` used as a GEOGRAPHY —
    the round trip GEOGRAPHY -> S2_CELL_CENTER -> GEOGRAPHY as ONE
    geography-to-geography op (src/s2_cell_ops.cpp:20-68 then
    514-551, cast cost 1 then 0).

    Unlike chaining :func:`s2_geography_to_cell_center` (a bare
    LongType, which cannot carry provenance) into
    :func:`s2_cell_center_to_geography`, this keeps the value's
    pre-snap coordinates and marks it cast-produced (flags bit1), so
    ``s2_distance`` / ``s2_max_distance`` between two such values
    reproduce the reference's published both-cast goldens exactly
    (3354018.3501422736, test/sql/geography/binary_index_ops.test:
    174-178, 201-205 — an asymmetric snap(lhs)-vs-raw(rhs)
    evaluation, root-caused in tests/test_cellmath.py). NOTE this
    makes the both-cast distance deliberately NON-COMMUTATIVE —
    swapping the operands gives the reference's swap value
    (3354018.3417240526), exactly as its goldens imply. Every other
    consumer sees the snapped center, identical to the long-cast
    chain. Errors on non-point input with the reference's message;
    empty -> POINT EMPTY."""
    return _snap_to_cell_center_udf(_c(geog))


def _cell_polygon(cid: np.uint64) -> Geography:
    lons, lats = cm.cell_vertex_lonlat(np.array([cid] * 4, dtype=np.uint64), np.arange(4))
    ring = np.stack([lons, lats], axis=1)
    g = Geography(KIND_POLYGON, polygons=[[ring]])
    # a cell's perfect covering is the cell itself — memoizing it lets
    # encode() skip the adaptive region coverer (~200ms/value), the
    # dominant cost of CELL->GEOGRAPHY at scale
    g._cov = np.array([cid], dtype=np.uint64)
    return g


@F.pandas_udf(BinaryType())
def _cell_to_geography_udf(s: pd.Series) -> pd.Series:
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        out.append(_cell_geog_bytes(int(np.int64(v))))
    return pd.Series(out, dtype=object)


def s2_cell_to_geography(cell) -> Column:
    """S2_CELL -> 4-vertex spherical polygon (src/s2_cell_ops.cpp:553-576)."""
    return _cell_to_geography_udf(_c(cell))


from functools import lru_cache


@lru_cache(maxsize=16384)
def _cell_geog_bytes(i: int) -> bytes:
    """Encoded CELL->GEOGRAPHY polygon for a signed cell id — the
    kernel of s2_cell_to_geography AND the implicit coercion path
    (geoudfs.coerce_geog), id-memoized per worker (cell polygons are
    deterministic and ~100 B, so repeated ids — broadcast sides,
    shared covering cells — decode once)."""
    cid = np.uint64(np.int64(i))
    if not cm.is_valid(np.array([cid]))[0]:
        return Geography(KIND_POLYGON).encode()
    return _cell_polygon(cid).encode()


#: byte-budget LRU for union->border results: keyed by the id tuple,
#: charged by the ENCODED RESULT size (the key says nothing about how
#: big the dissolved border is), so a broadcast join probing one huge
#: union millions of times stays memoized while total worker memory
#: stays bounded — the same discipline ByteBudgetLRU brought to the
#: decode caches (ADVICE r5), without the r6 interim count cliff at
#: 64 cells that left large unions entirely uncached.
_cell_union_geog_bytes = U.ByteBudgetLRU(
    32 * (1 << 20),
    lambda v: len(v) + 512,
    lambda ids: _cell_union_geog_bytes_impl(ids),
    charge_value=True,
)


def _cell_union_geog_bytes_impl(ids: tuple) -> bytes:
    """The normalized union IS its own perfect covering, so encode()
    skips the adaptive coverer whenever it fits the embedded-covering
    slot."""
    cells = normalize_cell_union(np.array(ids, dtype=np.int64).view(np.uint64))
    if len(cells) == 0:
        return Geography(KIND_POLYGON).encode()
    if len(cells) == 1:
        return _cell_geog_bytes(int(cells.view(np.int64)[0]))
    from ..geo.cell_border import cell_union_border_lonlat

    polys = cell_union_border_lonlat(cells)
    kind = KIND_POLYGON if len(polys) == 1 else KIND_MULTIPOLYGON
    g = Geography(kind, polygons=polys)
    if len(cells) <= 8:
        g._cov = np.asarray(cells, dtype=np.uint64)
    return g.encode()


@F.pandas_udf(BinaryType())
def _cell_union_to_geography_udf(s: pd.Series) -> pd.Series:
    out = []
    for arr in s:
        if arr is None:
            out.append(None)
            continue
        out.append(_cell_union_geog_bytes(tuple(int(v) for v in arr)))
    return pd.Series(out, dtype=object)


def s2_cell_union_to_geography(cells) -> Column:
    """S2_CELL_UNION -> the dissolved border polygon of the union,
    like the reference's InitToCellUnionBorder
    (src/s2_cell_ops.cpp:134-169): interior cell edges cancel, edges
    are split at finer neighbors' corners (T-junctions), and the
    remaining boundary is stitched into CCW shells and CW holes
    (geo/cell_border.py)."""
    return _cell_union_to_geography_udf(_c(cells))


@F.pandas_udf(ArrayType(LongType()))
def _cell_union_normalize_udf(s: pd.Series) -> pd.Series:
    out = []
    for arr in s:
        if arr is None:
            out.append(None)
            continue
        cells = normalize_cell_union(np.array(arr, dtype=np.int64).view(np.uint64))
        out.append([int(v) for v in cells.view(np.int64)])
    return pd.Series(out, dtype=object)


def s2_cell_union_normalize(cells) -> Column:
    """Sort (unsigned), dedupe, merge sibling groups
    (src/s2_cell_ops.cpp:95-132)."""
    return _cell_union_normalize_udf(_c(cells))


def s2_cell_to_cell_union(cell) -> Column:
    """S2_CELL -> singleton union; invalid -> empty array — a pure
    column expression (src/s2_cell_ops.cpp:70-92)."""
    from .cells import s2_cell_is_valid

    c = _c(cell)
    return F.when(s2_cell_is_valid(c), F.array(c)).otherwise(
        F.array().cast(ArrayType(LongType()))
    )


def _wkb_to_cell(b: bytes, arbitrary: bool) -> int:
    g = from_wkb(b, validate=False)
    if g.is_empty():
        return -1  # sentinel bit pattern
    if arbitrary:
        p = g.first_point()
        if p is None:
            return -1
    else:
        if g.all_lines() or g.all_polygons():
            raise ValueError("Can't parse WKB with non-point input to S2_CELL_CENTER")
        pts = g.all_points()
        if len(pts) != 1:
            raise ValueError("Can't parse WKB with more than one point to S2_CELL_CENTER")
        p = pts[0]
    cid = cm.lonlat_to_cellid([p[0]], [p[1]])[0]
    return int(cm.to_signed(np.array([cid]))[0])


@F.pandas_udf(LongType())
def _cellfromwkb_udf(s: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _wkb_to_cell(bytes(b), False) for b in s], dtype=object
    )


@F.pandas_udf(LongType())
def _arbitrarycellfromwkb_udf(s: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _wkb_to_cell(bytes(b), True) for b in s], dtype=object
    )


def s2_cellfromwkb(wkb) -> Column:
    """WKB point -> cell center; errors on non-point input, sentinel on
    empties (src/s2_cell_ops.cpp:174-285; cell_ops.test:92-161)."""
    return _cellfromwkb_udf(_c(wkb))


def s2_arbitrarycellfromwkb(wkb) -> Column:
    """First coordinate of any WKB -> cell center (partition/sort keys;
    src/s2_cell_ops.cpp:207-308)."""
    return _arbitrarycellfromwkb_udf(_c(wkb))


@F.pandas_udf(BinaryType())
def _cell_vertex_udf(s: pd.Series, k: pd.Series) -> pd.Series:
    out = []
    for v, kk in zip(s, k):
        if v is None or kk is None:
            out.append(None)
            continue
        cid = np.uint64(np.int64(v))
        if not cm.is_valid(np.array([cid]))[0] or not (0 <= kk <= 3):
            out.append(Geography(KIND_POINT).encode())
            continue
        lon, lat = cm.cell_vertex_lonlat(np.array([cid]), np.array([int(kk)]))
        out.append(Geography(KIND_POINT, points=np.array([[lon[0], lat[0]]])).encode())
    return pd.Series(out, dtype=object)


def s2_cell_vertex(cell, vertex_id) -> Column:
    """k-th cell corner as a point GEOGRAPHY (src/s2_cell_ops.cpp:578-627)."""
    k = _c(vertex_id) if isinstance(vertex_id, (Column, str)) else F.lit(int(vertex_id))
    return _cell_vertex_udf(_c(cell), k.cast("long"))
