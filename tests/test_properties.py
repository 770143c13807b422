"""Property-based invariants (hypothesis) over the pure cell/geometry
kernels — beyond the reference's test strategy (SURVEY §5: the
reference ships no randomized tests). Pure numpy, no SparkSession.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_geography_spark.geo.ops import _LngInterval
from duckdb_geography_spark.s2 import cellmath as cm

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
levels = st.integers(min_value=0, max_value=30)


def _cell(lon, lat, level):
    leaf = cm.lonlat_to_cellid(np.array([lon]), np.array([lat]))
    return cm.parent(leaf, level)[0]


class TestCellInvariants:
    @given(lons, lats)
    @settings(max_examples=200, deadline=None)
    def test_snap_distance_bounded(self, lon, lat):
        """Leaf snap moves a point by less than a leaf-cell diagonal
        (~{sqrt2 * 0.85 / 2^30} rad ~ 9e-10 rad ~ 6 mm)."""
        leaf = cm.lonlat_to_cellid(np.array([lon]), np.array([lat]))
        x, y, z = cm.cellid_to_center_xyz(leaf)
        lonr, latr = math.radians(lon), math.radians(lat)
        p = np.array([
            math.cos(latr) * math.cos(lonr),
            math.cos(latr) * math.sin(lonr),
            math.sin(latr),
        ])
        chord = np.linalg.norm(p - np.array([x[0], y[0], z[0]]))
        assert chord < 2e-9

    @given(lons, lats, levels)
    @settings(max_examples=200, deadline=None)
    def test_parent_child_inverse(self, lon, lat, level):
        c = _cell(lon, lat, level)
        ids = np.array([c], dtype=np.uint64)
        assert int(cm.level(ids)[0]) == level
        if level < 30:
            for k in range(4):
                kid = cm.child(ids, np.array([k]))[0]
                assert int(cm.parent(np.array([kid], dtype=np.uint64), level)[0]) == int(c)
                assert bool(cm.contains(ids, np.array([kid], dtype=np.uint64))[0])

    @given(lons, lats, levels)
    @settings(max_examples=200, deadline=None)
    def test_range_brackets_descendants(self, lon, lat, level):
        leaf = cm.lonlat_to_cellid(np.array([lon]), np.array([lat]))
        c = cm.parent(leaf, level)
        assert int(cm.range_min(c)[0]) <= int(leaf[0]) <= int(cm.range_max(c)[0])

    @given(lons, lats, levels)
    @settings(max_examples=200, deadline=None)
    def test_token_roundtrip(self, lon, lat, level):
        c = np.array([_cell(lon, lat, level)], dtype=np.uint64)
        tok = cm.token_encode(c)
        back = cm.token_decode(np.array(tok, dtype=object))
        assert int(back[0]) == int(c[0])
        assert 1 <= len(tok[0]) <= 16 and not tok[0].endswith("0")

    @given(lons, lats, levels)
    @settings(max_examples=200, deadline=None)
    def test_debug_string_roundtrip(self, lon, lat, level):
        c = np.array([_cell(lon, lat, level)], dtype=np.uint64)
        dbg = cm.debug_string(c)
        back = cm.debug_string_decode(np.array(dbg, dtype=object))
        assert int(back[0]) == int(c[0])
        face, _, digits = dbg[0].partition("/")
        assert 0 <= int(face) <= 5 and len(digits) == level

    @given(lons, lats, st.integers(min_value=0, max_value=29))
    @settings(max_examples=150, deadline=None)
    def test_edge_neighbors_symmetric(self, lon, lat, level):
        """Adjacency is symmetric even across cube-face boundaries:
        c appears among each of its edge neighbors' edge neighbors."""
        c = _cell(lon, lat, level)
        nbrs = cm.edge_neighbors(np.array([c], dtype=np.uint64))[:, 0]
        assert len(set(int(v) for v in nbrs)) == 4
        for n in nbrs:
            assert int(cm.level(np.array([n], dtype=np.uint64))[0]) == level
            back = cm.edge_neighbors(np.array([n], dtype=np.uint64))[:, 0]
            assert int(c) in {int(v) for v in back}

    @given(lons, lats, levels, st.integers(min_value=0, max_value=3))
    @settings(max_examples=150, deadline=None)
    def test_vertex_on_cell_boundary(self, lon, lat, level, k):
        """Each vertex of the level-L cell bounds the cell's closed
        region: nudged toward the cell center (in xyz — lon/lat
        interpolation breaks at the antimeridian and poles), the point
        has the cell as its level-L ancestor."""
        c = _cell(lon, lat, level)
        ids = np.array([c], dtype=np.uint64)
        vlon, vlat = cm.cell_vertex_lonlat(ids, np.array([k]))
        vr_lon, vr_lat = math.radians(vlon[0]), math.radians(vlat[0])
        v = np.array([
            math.cos(vr_lat) * math.cos(vr_lon),
            math.cos(vr_lat) * math.sin(vr_lon),
            math.sin(vr_lat),
        ])
        cx, cy, cz = cm.cellid_to_center_xyz(ids)
        ctr = np.array([cx[0], cy[0], cz[0]])
        p = 0.9 * v + 0.1 * ctr
        p /= np.linalg.norm(p)
        # classify p via the xyz path directly: a degree round-trip
        # cannot represent points within ~1.5e-8 rad of a pole (the z
        # component rounds to 1.0 and latitude collapses to 90°), which
        # a deep-level nudge near a pole-touching vertex legitimately
        # produces — found by hypothesis at (lon=0, lat=~90, level=24)
        face, u, uv = cm.xyz_to_face_uv(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )
        s, t = cm.uv_to_st(u), cm.uv_to_st(uv)
        i = np.clip(np.floor(s * cm.MAX_SIZE), 0, cm.MAX_SIZE - 1).astype(np.uint64)
        j = np.clip(np.floor(t * cm.MAX_SIZE), 0, cm.MAX_SIZE - 1).astype(np.uint64)
        leaf = cm.from_face_ij(face, i, j)
        inner = cm.parent(np.asarray(leaf, dtype=np.uint64), np.array([level]))[0]
        assert int(inner) == int(c)


class TestLngIntervalInvariants:
    """Intervals are generated through the production constructor
    (from_point_pair normalizes -180 -> 180, picks the <=180° span);
    raw lo/hi construction with -180 is outside the class contract."""

    spans = st.tuples(lons, lons)

    @given(spans, spans)
    @settings(max_examples=300, deadline=None)
    def test_union_contains_both(self, s1, s2):
        a = _LngInterval.from_point_pair(*s1)
        b = _LngInterval.from_point_pair(*s2)
        u = a.union(b)
        assert u.contains_interval(a), (s1, s2, (u.lo, u.hi))
        assert u.contains_interval(b), (s1, s2, (u.lo, u.hi))

    @given(spans, spans)
    @settings(max_examples=300, deadline=None)
    def test_union_endpoint_membership(self, s1, s2):
        a = _LngInterval.from_point_pair(*s1)
        b = _LngInterval.from_point_pair(*s2)
        u = a.union(b)
        for p in (*s1, *s2):
            assert u.contains(p)

    @given(spans)
    @settings(max_examples=200, deadline=None)
    def test_contains_interval_reflexive(self, s):
        a = _LngInterval.from_point_pair(*s)
        assert a.contains_interval(a)


class TestCodecRoundtrips:
    """WKT / WKB / binary-codec round-trips on randomized geometries."""

    coords = st.tuples(
        st.floats(min_value=-179.0, max_value=179.0, allow_nan=False),
        st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
    )

    @staticmethod
    def _ring(center, radius_deg, n, rng_seed):
        import numpy as _np

        cx, cy = center
        rng = _np.random.default_rng(rng_seed)
        angles = _np.sort(rng.uniform(0, 2 * _np.pi, n))
        radii = rng.uniform(0.3 * radius_deg, radius_deg, n)
        xs = cx + radii * _np.cos(angles)
        ys = _np.clip(cy + radii * _np.sin(angles), -89.9, 89.9)
        return list(zip(xs, ys))

    @given(coords, st.integers(min_value=4, max_value=12), st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=80, deadline=None)
    def test_polygon_wkb_roundtrip(self, center, n, seed):
        from duckdb_geography_spark.geo.geography import from_wkb, from_wkt, to_wkb
        from duckdb_geography_spark.geo import ops

        ring = self._ring(center, 2.0, n, seed)
        wkt = "POLYGON ((" + ", ".join(f"{x:.9f} {y:.9f}" for x, y in ring + ring[:1]) + "))"
        g = from_wkt(wkt, validate=False)
        g2 = from_wkb(to_wkb(g), validate=False)
        # vertex-exact round trip (polygons are not snapped)
        flat = lambda gg: [  # noqa: E731
            (float(p[0]), float(p[1]))
            for rings in gg.polygons
            for r in rings
            for p in r
        ]
        assert flat(g) == flat(g2)
        # encode/decode (our binary codec) preserves measures exactly
        from duckdb_geography_spark.geo.geography import Geography

        g3 = Geography.decode(g.encode())
        assert ops.area(g3) == ops.area(g)

    @given(st.lists(coords, min_size=2, max_size=8, unique=True))
    @settings(max_examples=80, deadline=None)
    def test_linestring_wkt_roundtrip(self, pts):
        from duckdb_geography_spark.geo.geography import from_wkt

        wkt = "LINESTRING (" + ", ".join(f"{x:.9f} {y:.9f}" for x, y in pts) + ")"
        g = from_wkt(wkt, validate=False)
        g2 = from_wkt(g.to_wkt(), validate=False)
        a = [tuple(map(float, p)) for line in g.lines for p in line]
        b = [tuple(map(float, p)) for line in g2.lines for p in line]
        assert a == b

    @given(coords)
    @settings(max_examples=100, deadline=None)
    def test_point_snap_idempotent(self, pt):
        """Single points snap to leaf centers at encode; decoding and
        re-encoding must be a fixed point (no drift)."""
        from duckdb_geography_spark.geo.geography import Geography, from_wkt

        g = from_wkt(f"POINT ({pt[0]:.9f} {pt[1]:.9f})")
        enc1 = g.encode()
        dec1 = Geography.decode(enc1)
        enc2 = dec1.encode()
        assert enc1 == enc2


class TestRawPointRetention:
    """Round 6: the snapped point encoding carries the pre-snap
    coordinates; the codec must round-trip them exactly, stay
    decode-compatible with the legacy 12-byte form, and never let the
    raw payload leak into the geometry surface (WKT stays snapped)."""

    @given(st.tuples(lons, lats))
    @settings(max_examples=150, deadline=None)
    def test_raw_roundtrip_exact(self, pt):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt

        g = from_wkt(f"POINT ({pt[0]!r} {pt[1]!r})")
        dec = Geography.decode(g.encode())
        assert dec.raw_point is not None
        assert (dec.raw_point[0], dec.raw_point[1]) == (pt[0], pt[1])
        assert dec.cast_tag is False
        # WKT output is the SNAPPED center, not the raw payload: the
        # latitude moves by at most the ~1 cm leaf snap (longitude
        # degrees inflate by 1/cos(lat) near the poles, so only lat is
        # a stable proximity check)
        snapped = dec.single_point()
        assert abs(snapped[1] - pt[1]) < 1e-6

    @given(st.tuples(lons, lats))
    @settings(max_examples=50, deadline=None)
    def test_legacy_12_byte_blob_still_decodes(self, pt):
        import numpy as np

        from duckdb_geography_spark.geo.geography import Geography
        from duckdb_geography_spark.s2 import cellmath as cm

        cid = cm.lonlat_to_cellid(np.array([pt[0]]), np.array([pt[1]]))[0]
        legacy = Geography.cell_center(cid).encode()  # no raw -> 12 bytes
        assert len(legacy) == 12
        dec = Geography.decode(legacy)
        assert dec.raw_point is None and dec.cast_tag is False
        assert np.uint64(dec.cell_id) == cid

    @given(st.tuples(lons, lats))
    @settings(max_examples=50, deadline=None)
    def test_cast_tag_survives_codec(self, pt):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt

        g = Geography.decode(from_wkt(f"POINT ({pt[0]!r} {pt[1]!r})").encode())
        g.cast_tag = True
        dec = Geography.decode(g.encode())
        assert dec.cast_tag is True
        assert dec.raw_point is not None


class TestDecoderRobustness:
    """Corrupt blobs must raise, never decode silently (round 6: a
    garbage buffer with the empty bit set used to slip past kind
    validation)."""

    def test_garbage_kind_raises_even_with_empty_flag(self):
        from duckdb_geography_spark.geo.geography import (
            Geography,
            GeographyError,
        )

        import pytest

        with pytest.raises(GeographyError, match="unknown geography kind"):
            Geography.decode(b"\xff" * 40)
        with pytest.raises(GeographyError, match="unknown geography kind"):
            Geography.decode(b"\x63\x01\x00\x00" + b"\x00" * 24)

    def test_truncated_raw_payload_is_legacy_compatible(self):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt

        full = from_wkt("POINT (10 20)").encode()
        dec = Geography.decode(full[:20])  # header + cell id + half raw
        assert dec.raw_point is None  # partial tail ignored, not misread
        assert dec.cell_id == Geography.decode(full).cell_id
