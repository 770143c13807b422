"""General polygon overlays: area conservation + membership sampling
oracles, plus the reference's docs example pair."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_geography_spark.geo import geodesy as gd
from duckdb_geography_spark.geo import ops
from duckdb_geography_spark.geo.geography import from_wkt

SQ_A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ_B = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"


def _member(g, lon, lat):
    x = gd.lonlat_deg_to_xyz(np.array([[lon, lat]]))[0]
    parts = ops._Parts(g)
    return parts.poly_contains(x)


class TestGeneralOverlay:
    def test_docs_pair_intersection(self):
        """The overlay pair from docs/function-reference.md:1513-1516."""
        a, b = from_wkt(SQ_A), from_wkt(SQ_B)
        inter = ops.intersection(a, b)
        assert inter.all_polygons()
        # quarter-ish of A (spherical, not planar, so approximate)
        frac = ops.area(inter) / ops.area(a)
        assert 0.2 < frac < 0.3

    def test_area_conservation(self):
        a, b = from_wkt(SQ_A), from_wkt(SQ_B)
        ia = ops.area(ops.intersection(a, b))
        da = ops.area(ops.difference(a, b))
        ua = ops.area(ops.union(a, b))
        assert ia + da == pytest.approx(ops.area(a), rel=1e-9)
        assert ua == pytest.approx(ops.area(a) + ops.area(b) - ia, rel=1e-9)

    def test_membership_sampling(self):
        a, b = from_wkt(SQ_A), from_wkt(SQ_B)
        inter = ops.intersection(a, b)
        diff = ops.difference(a, b)
        union = ops.union(a, b)
        rng = np.random.default_rng(11)
        for lon, lat in zip(rng.uniform(-3, 18, 120), rng.uniform(-3, 18, 120)):
            in_a, in_b = _member(a, lon, lat), _member(b, lon, lat)
            assert _member(inter, lon, lat) == (in_a and in_b)
            assert _member(diff, lon, lat) == (in_a and not in_b)
            assert _member(union, lon, lat) == (in_a or in_b)

    def test_multi_piece_intersection(self):
        """A tall rect crossing a U-ish subject twice -> 2 pieces."""
        subj = from_wkt(
            "POLYGON ((0 0, 30 0, 30 4, 4 4, 4 16, 30 16, 30 20, 0 20, 0 0))"
        )
        clip = from_wkt("POLYGON ((8 -2, 12 -2, 12 22, 8 22, 8 -2))")
        inter = ops.intersection(subj, clip)
        assert len(inter.all_polygons()) == 2

    def test_shared_edge_degenerate_line(self):
        """CLOSED polygon model: two polygons sharing only a boundary
        edge intersect in that edge, emitted to the polyline layer
        (global_options.hpp:11-14; S2BooleanOperation degeneracies)."""
        a = from_wkt(SQ_A)
        touching = from_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
        inter = ops.intersection(a, touching)
        assert not inter.all_polygons()
        lines = inter.all_lines()
        assert len(lines) == 1
        lons = sorted(set(round(v, 6) for v in lines[0][:, 0]))
        assert lons == [10.0]
        # union across the shared edge dissolves it
        u = ops.union(a, touching)
        assert ops.area(u) == pytest.approx(ops.area(a) + ops.area(touching), rel=1e-9)

    def test_corner_touch_degenerate_point(self):
        a = from_wkt(SQ_A)
        corner = from_wkt("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
        inter = ops.intersection(a, corner)
        assert not inter.all_polygons() and not inter.all_lines()
        pts = inter.all_points()
        assert len(pts) == 1
        assert tuple(np.round(pts[0], 6)) == (10.0, 10.0)
        # union keeps two simple rings, not a pinched figure-eight
        u = ops.union(a, corner)
        polys = u.all_polygons()
        assert len(polys) == 2

    def test_holes(self):
        holed = from_wkt(
            "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 5 15, 15 15, 15 5, 5 5))"
        )
        inside_hole = from_wkt("POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))")
        assert ops.intersection(holed, inside_hole).is_empty()
        straddle = from_wkt("POLYGON ((-2 8, 7 8, 7 12, -2 12, -2 8))")
        inter = ops.intersection(holed, straddle)
        diff = ops.difference(holed, straddle)
        assert ops.area(inter) + ops.area(diff) == pytest.approx(
            ops.area(holed), rel=1e-9
        )
        # difference that carves a hole: subtract a block from the middle
        mid = from_wkt("POLYGON ((7 -2, 13 -2, 13 22, 7 22, 7 -2))")
        d2 = ops.difference(holed, mid)
        assert ops.area(d2) == pytest.approx(ops.area(holed) - ops.area(
            ops.intersection(holed, mid)), rel=1e-9)

    def test_difference_carves_hole(self):
        a = from_wkt("POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0))")
        b = from_wkt("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
        d = ops.difference(a, b)
        polys = d.all_polygons()
        assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole
        assert ops.area(d) == pytest.approx(ops.area(a) - ops.area(b), rel=1e-9)
        # membership: inside the carved hole is no longer in the result
        assert ops.intersects(from_wkt("POINT (15 15.2)"), b)
        assert not ops.contains(d, from_wkt("POINT (15 15.2)"))
        assert ops.contains(d, from_wkt("POINT (5 5)"))

    def test_polygon_line_overlays(self):
        a = from_wkt(SQ_A)
        l = from_wkt("LINESTRING (-5 5, 15 5)")
        inter = ops.intersection(a, l)
        assert not inter.all_polygons()
        (seg,) = inter.all_lines()
        assert np.round(seg[0][0], 6) == 0.0 and np.round(seg[-1][0], 6) == 10.0
        diff = ops.difference(l, a)
        assert len(diff.all_lines()) == 2
        u = ops.union(a, l)
        assert len(u.all_polygons()) == 1 and len(u.all_lines()) == 2

    def test_line_line_overlays(self):
        l1 = from_wkt("LINESTRING (0 0, 10 10)")
        l2 = from_wkt("LINESTRING (0 10, 10 0)")
        cross = ops.intersection(l1, l2)
        pts = cross.all_points()
        assert len(pts) == 1 and abs(pts[0][0] - 5.0) < 1e-9
        same = ops.intersection(l1, from_wkt("LINESTRING (0 0, 10 10)"))
        (seg,) = same.all_lines()
        assert len(seg) >= 2

    @settings(max_examples=25, deadline=None)
    @given(
        dx=st.floats(min_value=2.3, max_value=8.7),
        dy=st.floats(min_value=2.3, max_value=8.7),
    )
    def test_property_shifted_squares(self, dx, dy):
        a = from_wkt(SQ_A)
        b = from_wkt(
            f"POLYGON (({dx} {dy}, {dx + 10} {dy}, {dx + 10} {dy + 10}, {dx} {dy + 10}, {dx} {dy}))"
        )
        ia = ops.area(ops.intersection(a, b))
        da = ops.area(ops.difference(a, b))
        assert ia + da == pytest.approx(ops.area(a), rel=1e-8)


class TestSnapConsistency:
    """Single POINTs are leaf-cell-snapped at encode; MULTIPOINT vertices
    are stored raw. Predicates must treat the ~1e-9 rad snap displacement
    as equality or the same coordinate compares unequal to itself
    depending on its container (advisor round-1 finding)."""

    def test_point_in_multipoint_after_roundtrip(self):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt
        from duckdb_geography_spark.geo import ops

        p = "10.123456789 45.987654321"
        mp = from_wkt(f"MULTIPOINT ({p}, 11 46)")
        pt = Geography.decode(from_wkt(f"POINT ({p})").encode())
        assert ops.intersects(mp, pt)
        assert ops.intersects(pt, mp)
        assert ops.contains(mp, pt)

    def test_point_equals_itself_after_roundtrip(self):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt
        from duckdb_geography_spark.geo import ops

        raw = from_wkt("POINT (10.123456789 45.987654321)")
        snapped = Geography.decode(raw.encode())
        assert ops.equals(raw, snapped)
        assert ops.equals(snapped, raw)

    def test_distinct_points_stay_unequal(self):
        from duckdb_geography_spark.geo.geography import from_wkt
        from duckdb_geography_spark.geo import ops

        a = from_wkt("POINT (10 45)")
        b = from_wkt("POINT (10.001 45)")  # ~80 m apart
        assert not ops.intersects(a, b)
        assert not ops.equals(a, b)


class TestAntipodeContainment:
    """The winding number at the antipode of a ring's interior is the
    opposite sign of the interior winding; containment must compare
    against the ring's orientation, not test != 0 (caught by the
    predicate_gate driver oracle in round 2)."""

    def test_antipodal_point_is_outside(self):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt
        from duckdb_geography_spark.geo import ops

        rect = from_wkt("POLYGON ((-180 30, -125 30, -125 55, -180 55, -180 30))")
        inside = Geography.decode(from_wkt("POINT (-150 40)").encode())
        antipode = Geography.decode(from_wkt("POINT (30 -40)").encode())
        assert ops.intersects(inside, rect)
        assert not ops.intersects(antipode, rect)
        assert not ops.contains(rect, antipode)

    def test_cw_ring_same_semantics(self):
        from duckdb_geography_spark.geo.geography import Geography, from_wkt
        from duckdb_geography_spark.geo import ops

        cw = from_wkt("POLYGON ((-180 30, -180 55, -125 55, -125 30, -180 30))")
        inside = Geography.decode(from_wkt("POINT (-150 40)").encode())
        antipode = Geography.decode(from_wkt("POINT (30 -40)").encode())
        assert ops.intersects(inside, cw)
        assert not ops.intersects(antipode, cw)

    def test_covering_excludes_antipode(self):
        import numpy as np
        from duckdb_geography_spark.geo.geography import from_wkt
        from duckdb_geography_spark.s2 import cellmath as cm
        from duckdb_geography_spark.s2.coverer import covering_of_geography

        rect = from_wkt("POLYGON ((-180 30, -125 30, -125 55, -180 55, -180 30))")
        cov = covering_of_geography(rect, fixed_level=4)
        anti = cm.lonlat_to_cellid(np.array([30.0]), np.array([-40.0]))
        lo, hi = cm.range_min(cov), cm.range_max(cov)
        assert not ((lo <= anti[0]) & (anti[0] <= hi)).any()


class TestReviewRegressions:
    """Repros from the round-2 geometry review."""

    def test_max_distance_lines_no_crash(self):
        from duckdb_geography_spark.geo import ops
        from duckdb_geography_spark.geo.geography import from_wkt

        d = ops.max_distance(
            from_wkt("LINESTRING (0 0, 10 0)"), from_wkt("LINESTRING (20 0, 30 0)")
        )
        assert 2_000_000 < d < 4_000_000  # ~30 deg of equator

    def test_max_distance_interior_antipodal(self):
        import math

        from duckdb_geography_spark.geo import ops
        from duckdb_geography_spark.geo.geography import from_wkt

        # (0,0) on A and (180,0) on B are antipodal interior points:
        # the true max is pi*R, unreachable by a vertex sweep
        d = ops.max_distance(
            from_wkt("LINESTRING (0 -10, 0 10)"),
            from_wkt("LINESTRING (175 -10, -175 10)"),
        )
        assert abs(d - math.pi * ops.R) < 1.0

    def test_contains_respects_holes(self):
        from duckdb_geography_spark.geo import ops
        from duckdb_geography_spark.geo.geography import from_wkt

        a = from_wkt(
            "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (8 8, 12 8, 12 12, 8 12, 8 8))"
        )
        b = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
        assert not ops.contains(a, b)  # b spans a's hole
        assert not ops.equals(a, b)
        inner = from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
        assert ops.contains(a, inner)  # away from the hole: still true

    def test_intersection_point_not_duplicated(self):
        from duckdb_geography_spark.geo import ops
        from duckdb_geography_spark.geo.geography import from_wkt

        g = ops.intersection(
            from_wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (30 30, 31 31))"),
            from_wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (40 40, 41 41))"),
        )
        assert g.to_wkt(0).count("1") == 2  # POINT (1 1), not MULTIPOINT ((1 1), (1 1))

    def test_bounds_rect_edge_interior_included(self):
        from duckdb_geography_spark.geo import ops
        from duckdb_geography_spark.geo.geography import from_wkt

        # the equator edge from -160 to -20 passes through lon -90
        xmin, ymin, xmax, ymax = ops.bounds_rect(
            from_wkt("LINESTRING (0 0, 100 0, -160 0, -20 0)")
        )
        covers = (
            (xmin <= -90.0 <= xmax)
            if xmin <= xmax
            else (-90.0 >= xmin or -90.0 <= xmax)
        )
        assert covers, (xmin, xmax)

    def test_covering_excludes_hole_interior(self):
        import numpy as np

        from duckdb_geography_spark.geo.geography import from_wkt
        from duckdb_geography_spark.s2 import cellmath as cm
        from duckdb_geography_spark.s2.coverer import _GeogRegion

        holed = from_wkt(
            "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), (10 10, 30 10, 30 30, 10 30, 10 10))"
        )
        region = _GeogRegion(holed)
        hole_center = cm.parent(cm.lonlat_to_cellid(np.array([20.0]), np.array([20.0])), np.array([8]))
        assert not region.contains_cell_batch(hole_center)[0]
        assert not region.may_intersect_batch(hole_center)[0]

    def test_token_decode_rejects_nonhex(self):
        import numpy as np

        from duckdb_geography_spark.s2 import cellmath as cm

        got = cm.token_decode(["+abc", " 89c", "-1", "89c259", "0x1"])
        assert list(got[:3]) == [0, 0, 0]
        assert got[3] != 0 and got[4] == 0


class TestRandomizedOverlaySweep:
    """200 seeded random polygon pairs (convex + every-3rd with a
    hole): inclusion-exclusion area identities, idempotence, and an
    independent Girard angle-sum closed form for the convex areas —
    the randomized analogue of the curated rect/poly overlay gates."""

    R = 6_371_010.0

    @staticmethod
    def _convex_wkt(rng, lon0, lat0, rmin=1.0, rmax=6.0):
        k = int(rng.integers(4, 9))
        # evenly spaced angles with bounded jitter: keeps the order
        # strict, the spacing non-degenerate, AND the center inside
        # the ring (all vertices on a circle -> convex; angle gaps
        # < pi -> star-shaped about the center). An earlier fully
        # random draw could put all k angles in one half-plane,
        # producing rings that do NOT contain (lon0, lat0) — which
        # silently made the hole-variant polygons invalid
        # (hole outside shell).
        base = np.linspace(0.0, 2.0 * np.pi, k, endpoint=False)
        th = base + rng.uniform(-0.35, 0.35, k) * (2.0 * np.pi / k)
        r = rng.uniform(rmin, rmax)
        lats = lat0 + r * np.sin(th)
        lons = lon0 + r * np.cos(th) / np.cos(np.radians(lat0))
        pts = ", ".join(f"{lon:.10f} {lat:.10f}" for lon, lat in zip(lons, lats))
        first = f"{lons[0]:.10f} {lats[0]:.10f}"
        ring = f"({pts}, {first})"
        return ring, float(r)

    @classmethod
    def _girard_area(cls, ring_wkt):
        """Independent closed form: spherical excess by Girard's
        angle sum over the ring's unit vectors (no shared code with
        ops.area, which integrates ring_area)."""
        body = ring_wkt.strip()[1:-1]
        pairs = [p.split() for p in body.split(",")[:-1]]
        ll = np.array([[float(a), float(b)] for a, b in pairs])
        v = gd.lonlat_deg_to_xyz(ll)
        n = len(v)
        angles = 0.0
        for i in range(n):
            p, q, s = v[(i - 1) % n], v[i], v[(i + 1) % n]
            # tangent-plane projections of the two edge directions at q
            t1 = p - q * np.dot(p, q)
            t2 = s - q * np.dot(s, q)
            t1 /= np.linalg.norm(t1)
            t2 /= np.linalg.norm(t2)
            angles += np.arccos(np.clip(np.dot(t1, t2), -1.0, 1.0))
        excess = angles - (n - 2) * np.pi
        return abs(excess) * cls.R * cls.R

    def test_inclusion_exclusion_200_pairs(self):
        rng = np.random.default_rng(20260814)
        n_overlapping = 0
        for i in range(200):
            lon0 = float(rng.uniform(-150, 150))
            lat0 = float(rng.uniform(-55, 55))
            ring_a, ra = self._convex_wkt(rng, lon0, lat0)
            if i % 3 == 0:
                hole, _ = self._convex_wkt(
                    rng, lon0, lat0, rmin=0.05, rmax=0.25
                )
                wa = f"POLYGON ({ring_a}, {hole})"
            else:
                hole = None
                wa = f"POLYGON ({ring_a})"
            # B's center within ~1 radius of A's -> overlap is common
            lon1 = lon0 + float(rng.uniform(-ra, ra))
            lat1 = float(np.clip(lat0 + rng.uniform(-ra, ra), -58, 58))
            ring_b, _ = self._convex_wkt(rng, lon1, lat1)
            wb = f"POLYGON ({ring_b})"

            a, b = from_wkt(wa), from_wkt(wb)
            aA, aB = ops.area(a), ops.area(b)
            ia = ops.area(ops.intersection(a, b))
            da = ops.area(ops.difference(a, b))
            ua = ops.area(ops.union(a, b))
            tol = max(aA, aB) * 1e-9
            assert abs(ia + da - aA) < tol, (i, wa, wb)
            assert abs(ua - (aA + aB - ia)) < tol, (i, wa, wb)
            if ia > 0:
                n_overlapping += 1

            # independent Girard closed form (convex outer ring; with
            # a hole, subtract the hole's own excess)
            want = self._girard_area(ring_a)
            if hole is not None:
                want -= self._girard_area(hole)
            assert aA == pytest.approx(want, rel=1e-6), (i, wa)

            if i % 5 == 0:  # idempotence spot checks
                assert ops.area(ops.intersection(a, a)) == pytest.approx(
                    aA, rel=1e-9
                )
                assert ops.area(ops.union(a, a)) == pytest.approx(aA, rel=1e-9)
                assert ops.area(ops.difference(a, a)) < tol
        # the sweep must actually exercise the overlay paths
        assert n_overlapping > 60, n_overlapping
