"""Round-7 regression tests (VERDICT r6 items).

1. The blocked broadcast distance kernels (geodesy.points_segments_min_angle,
   segments_segments_min_angle, segments_cross_any) must agree exactly with
   the per-pair scalar kernels they replaced — distance goldens depend on
   bit-identical chord math (VERDICT r6 item 4).
2. The lazy 16-byte codec tail must round-trip: decode -> re-encode is
   byte-identical without ever materializing raw_point, and materializing
   yields the original pre-snap coordinates (VERDICT r6 item 2).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_geography_spark.geo import geodesy as gd
from duckdb_geography_spark.geo import ops
from duckdb_geography_spark.geo.geography import Geography, from_wkt


def _rand_units(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestBlockedKernelsMatchScalar:
    def test_points_segments_min_angle(self):
        rng = np.random.default_rng(7)
        pts = _rand_units(rng, 23)
        e0 = _rand_units(rng, 17)
        e1 = _rand_units(rng, 17)
        want = min(
            float(gd.point_segment_distance(pts[i][None, :], e0[j], e1[j])[0])
            for i in range(len(pts))
            for j in range(len(e0))
        )
        got = gd.points_segments_min_angle(pts, e0, e1)
        assert got == want
        # tiny block size exercises the blocking loop
        assert gd.points_segments_min_angle(pts, e0, e1, block=5) == want

    def test_segments_segments_min_angle(self):
        rng = np.random.default_rng(11)
        # keep both sets inside a small cap so no pair crosses (the
        # kernel's documented precondition)
        base = np.array([1.0, 0.0, 0.0])

        def near(n, off):
            v = base + 0.01 * rng.normal(size=(n, 3)) + off
            return v / np.linalg.norm(v, axis=1, keepdims=True)

        a0, a1 = near(12, 0.0), near(12, 0.0)
        b0, b1 = near(9, 0.05), near(9, 0.05)
        assert not gd.segments_cross_any(a0, a1, b0, b1)
        want = min(
            gd.segment_segment_min_distance(a0[i], a1[i], b0[j], b1[j])
            for i in range(len(a0))
            for j in range(len(b0))
        )
        got = gd.segments_segments_min_angle(a0, a1, b0, b1)
        assert got == want
        assert gd.segments_segments_min_angle(a0, a1, b0, b1, block=7) == want

    def test_segments_cross_any_detects_crossing(self):
        # two arcs that definitely cross near (1,0,0)
        a0 = np.array([[0.99, -0.1, 0.0]])
        a1 = np.array([[0.99, 0.1, 0.0]])
        b0 = np.array([[0.99, 0.0, -0.1]])
        b1 = np.array([[0.99, 0.0, 0.1]])
        a0 /= np.linalg.norm(a0)
        a1 /= np.linalg.norm(a1)
        b0 /= np.linalg.norm(b0)
        b1 /= np.linalg.norm(b1)
        assert gd.segments_cross_any(a0, a1, b0, b1)
        assert not gd.segments_cross_any(a0, a1, -b0, -b1)

    def test_polygon_pair_distance_unchanged(self):
        """Two fixed polygons: the vectorized path must produce the
        exact value the scalar per-pair fold produced (these are the
        same floating-point operations in a different order of min())."""
        g1 = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        g2 = from_wkt("POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))")
        a, b = ops.parts_of(g1), ops.parts_of(g2)
        ea, eb = a.edge_arrays(), b.edge_arrays()
        scalar = min(
            gd.segment_segment_min_distance(ea[0][i], ea[1][i], eb[0][j], eb[1][j])
            for i in range(len(ea[0]))
            for j in range(len(eb[0]))
        )
        assert ops._parts_min_angle(a, b) == scalar
        # and the public meters value is stable
        assert ops.distance(g1, g2) == pytest.approx(scalar * ops.R, rel=0, abs=0)


class TestLazyCodecTail:
    def test_roundtrip_without_materializing(self):
        blob = from_wkt("POINT (13.4 52.5)").encode()
        assert len(blob) == 28
        g = Geography.decode(blob)
        assert g._raw_point is None  # not materialized by decode
        assert g.encode() == blob  # re-encode straight from the tail
        assert g._raw_point is None  # encode didn't materialize either

    def test_materializes_original_coords(self):
        blob = from_wkt("POINT (13.4 52.5)").encode()
        g = Geography.decode(blob)
        assert np.allclose(g.raw_point, [13.4, 52.5])
        assert g.encode() == blob  # still byte-identical after access

    def test_setter_clears_tail(self):
        g = Geography.decode(from_wkt("POINT (1 2)").encode())
        g.raw_point = np.array([3.0, 4.0])
        assert np.allclose(g.raw_point, [3.0, 4.0])
        enc = g.encode()
        assert np.allclose(
            np.frombuffer(enc[12:28], dtype=np.float64), [3.0, 4.0]
        )


def test_restored_prepared_parts_have_edge_arrays():
    """The serialized-prepared restore path builds _Parts slot-by-slot
    (geography.py) and must include the r7 edge-array cache; intersects
    on a restored index exercises it (caught by the r7 oracle sweep)."""
    from duckdb_geography_spark.geo.geography import KIND_PREPARED

    g = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    prep = Geography(KIND_PREPARED, geoms=[g])
    blob = prep.encode()
    restored = Geography.decode(blob)
    inner = restored.geoms[0]
    assert inner._parts is not None  # index restored, not recomputed
    other = from_wkt("POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))")
    # exercises _parts_intersect -> edge_arrays on the restored parts
    assert not ops.intersects(inner, other)
    assert ops.distance(inner, other) > 0


def test_cap_covering_batch_equals_descent():
    """The row-batched point-cap covering (s2/coverer.py::
    cap_coverings_fixed_level, the distance_join right-side kernel)
    must be cell-for-cell identical to the generic per-row face
    descent across levels, radii, and positions including cube
    corners, face edges, and poles."""
    from duckdb_geography_spark.s2 import coverer as cov

    rng = np.random.default_rng(42)
    pts = list(zip(rng.random(25) * 360 - 180, rng.random(25) * 170 - 85)) + [
        (0, 0),
        (180, 0),
        (0, 90),
        (0, -90),
        (45, 35.264389682754654),  # cube corner
        (-135, -35.264389682754654),
        (179.999, 0.001),  # face edge
        (0.001, 89.999),
        (44.999, 35.2),
    ]
    for level in (1, 3, 6, 10):
        avg_edge = 0.85 / 2**level
        for mult in (0.05, 1.0, 2.5):
            rad = avg_edge * mult
            fast = cov.cap_coverings_fixed_level(np.array(pts), level, rad)
            for i, (lon, lat) in enumerate(pts):
                region = cov._GeogRegion(Geography.point(lon, lat), rad)
                want = {int(c) for c in cov._fixed_level_covering(region, level)}
                assert {int(c) for c in fast[i]} == want, (level, mult, (lon, lat))


def test_cap_covering_coarse_levels_wide_radii():
    """Connectivity stress for the slack-widened flood fill (ADVICE r7
    #4): levels 0-2 have the largest same-level circumradius variation
    (where a rejected ring could in principle isolate an accepted cell
    from the seed), and wide buffers maximize the acceptance rim.
    Every covering must still equal the per-row descent exactly."""
    from duckdb_geography_spark.s2 import coverer as cov

    rng = np.random.default_rng(7)
    pts = list(zip(rng.random(12) * 360 - 180, rng.random(12) * 170 - 85)) + [
        (45, 35.264389682754654),
        (0, 90),
        (-90, 0),
    ]
    for level in (0, 1, 2):
        avg_edge = 0.85 / 2**level
        for mult in (0.3, 0.9, 1.4, 3.0):
            rad = avg_edge * mult
            fast = cov.cap_coverings_fixed_level(np.array(pts), level, rad)
            for i, (lon, lat) in enumerate(pts):
                region = cov._GeogRegion(Geography.point(lon, lat), rad)
                want = {int(c) for c in cov._fixed_level_covering(region, level)}
                assert {int(c) for c in fast[i]} == want, (level, mult, (lon, lat))
