"""Round-3 regression tests for the ADVICE.md findings.

1. _LngInterval.union: both-endpoints-contained must distinguish
   "other ⊆ self" from "the two jointly wrap the circle"
   (S1Interval::Union semantics).
2. _GeogRegion: a polygon whose shell is degenerate (<3 vertices) must
   drop its holes, not attach them to the PREVIOUS polygon's shell.
3. _decode_prepared_index: every scalar read must be bounds-checked
   against the declared payload end, and trailing bytes rejected.

Pure-Python unit tests — no SparkSession needed.
"""

import struct

import numpy as np
import pytest

from duckdb_geography_spark.geo import ops
from duckdb_geography_spark.geo.geography import (
    KIND_PREPARED,
    Geography,
    from_wkt,
)
from duckdb_geography_spark.geo.ops import _LngInterval
from duckdb_geography_spark.s2.coverer import _GeogRegion


class TestLngIntervalUnion:
    def test_joint_wrap_returns_full(self):
        # ADVICE repro: self=[-170,170], other=(160,-160) wraps through
        # 180; both endpoints of other lie in self, but other ⊄ self.
        a = _LngInterval(-170.0, 170.0)
        b = _LngInterval(160.0, -160.0)
        assert a.union(b).is_full()
        assert b.union(a).is_full()

    def test_true_subset_returns_self(self):
        a = _LngInterval(-170.0, 170.0)
        c = _LngInterval(10.0, 20.0)
        u = a.union(c)
        assert (u.lo, u.hi) == (-170.0, 170.0)

    def test_inverted_contains_inverted(self):
        d = _LngInterval(170.0, -170.0)  # wraps, 20° long
        e = _LngInterval(175.0, -175.0)  # wraps, 10° long, inside d
        u = d.union(e)
        assert (u.lo, u.hi) == (170.0, -170.0)

    def test_bounds_rect_wrapping_polyline(self):
        # Edges: [-170,0]∪[0,170]∪(170,-170): the last edge crosses the
        # antimeridian, so the union covers the whole circle.
        g = from_wkt("LINESTRING (-170 0, 0 0, 170 0, -170 0)")
        xmin, _, xmax, _ = ops.bounds_rect(g)
        assert (xmin, xmax) == (-180.0, 180.0)


class TestCovererDegenerateShellHoles:
    def test_skipped_shell_drops_its_holes(self):
        # Polygon 1: solid 10x10 square. Polygon 2: degenerate shell
        # (2 distinct vertices) with a "hole" that overlaps polygon 1's
        # interior. The hole must NOT be subtracted from polygon 1.
        g = from_wkt(
            "MULTIPOLYGON ("
            "((0 0, 10 0, 10 10, 0 10, 0 0)), "
            "((20 20, 21 20, 20 20), (4 4, 4 6, 6 6, 6 4, 4 4))"
            ")",
            validate=False,
        )
        region = _GeogRegion(g)
        assert len(region.rings_xyz) == 1
        assert region.shell_holes == [[]]
        from duckdb_geography_spark.geo import geodesy as gd

        pt = gd.lonlat_deg_to_xyz(np.array([[5.0, 5.0]]))
        assert bool(region._points_in_region(pt)[0])


class TestPreparedIndexBounds:
    @pytest.fixture(scope="class")
    def prepared_enc(self):
        holed = from_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
        )
        return Geography(KIND_PREPARED, geoms=[holed]).encode()

    @staticmethod
    def _split(enc):
        # layout: <BBH>(kind,flags,ncov) + ncov*8 covering + innerlen(4)
        # + inner + idxlen(4) + idxpayload
        _, _, ncov = struct.unpack_from("<BBH", enc, 0)
        off = 4 + 8 * ncov
        (innerlen,) = struct.unpack_from("<I", enc, off)
        head_end = off + 4 + innerlen
        (idxlen,) = struct.unpack_from("<I", enc, head_end)
        payload = enc[head_end + 4 :]
        assert len(payload) == idxlen
        return enc[:head_end], idxlen, payload

    def test_valid_roundtrip_still_restores(self, prepared_enc):
        dec = Geography.decode(prepared_enc)
        assert dec.geoms[0]._parts is not None

    def test_trailing_garbage_rejected(self, prepared_enc):
        head, idxlen, payload = self._split(prepared_enc)
        tampered = head + struct.pack("<I", idxlen + 4) + payload + b"\x00" * 4
        dec = Geography.decode(tampered)
        assert dec.geoms[0]._parts is None  # rejected, computed lazily
        assert ops.contains(dec, from_wkt("POINT (2 2)"))

    def test_short_declared_length_rejected(self, prepared_enc):
        # Declared end cuts mid-structure while the buffer continues
        # (simulates adjacent column bytes after the payload): scalar
        # reads must not silently cross the declared end.
        head, idxlen, payload = self._split(prepared_enc)
        tampered = head + struct.pack("<I", idxlen - 4) + payload
        dec = Geography.decode(tampered)
        assert dec.geoms[0]._parts is None
        assert ops.contains(dec, from_wkt("POINT (2 2)"))
        assert not ops.contains(dec, from_wkt("POINT (5 5)"))

    def test_truncated_payload_rejected(self, prepared_enc):
        head, idxlen, payload = self._split(prepared_enc)
        cut = len(payload) // 2
        tampered = head + struct.pack("<I", cut) + payload[:cut]
        dec = Geography.decode(tampered)
        assert dec.geoms[0]._parts is None
