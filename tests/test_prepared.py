"""Prepared-geography serialization (reference parity:
src/s2_functions_io.cpp:321-386 serializes an S2ShapeIndexGeography;
we serialize the numpy probe index)."""

import numpy as np
import pytest

from duckdb_geography_spark.geo import ops
from duckdb_geography_spark.geo.geography import (
    KIND_PREPARED,
    Geography,
    from_wkt,
)


@pytest.fixture(scope="module")
def holed():
    return from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    )


class TestPreparedIndex:
    def test_roundtrip_restores_index(self, holed):
        enc = Geography(KIND_PREPARED, geoms=[holed]).encode()
        dec = Geography.decode(enc)
        assert dec.kind == KIND_PREPARED
        inner = dec.geoms[0]
        assert inner._parts is not None  # restored, not recomputed
        # index content sanity: one polygon, two rings, a valid cap
        parts = ops.parts_of(dec)
        assert len(parts.polygons) == 1 and len(parts.polygons[0]) == 2
        assert parts._caps[0] is not None

    def test_prepared_semantics_match(self, holed):
        enc = Geography(KIND_PREPARED, geoms=[holed]).encode()
        dec = Geography.decode(enc)
        assert ops.contains(dec, from_wkt("POINT (2 2)"))
        assert not ops.contains(dec, from_wkt("POINT (5 5)"))  # in the hole
        assert ops.intersects(dec, from_wkt("POINT (0 0)"))  # CLOSED boundary
        assert ops.area(dec) == pytest.approx(ops.area(holed), rel=1e-12)

    def test_legacy_payload_without_index_decodes(self, holed):
        # a PREPARED payload truncated to the pre-index layout
        # (tag + inner length + inner bytes) must still decode
        import struct

        inner = holed.encode(with_covering=True)
        legacy = bytes([9, 0, 0, 0]) + struct.pack("<I", len(inner)) + inner
        dec = Geography.decode(legacy)
        assert dec.kind == KIND_PREPARED
        assert dec.geoms[0]._parts is None  # nothing to restore
        assert ops.contains(dec, from_wkt("POINT (2 2)"))  # computed lazily

    def test_cap_prefilter_correctness(self):
        # points far outside the cap vs a dense ring: cap reject must
        # agree with the full winding test
        verts = ", ".join(
            f"{20 + 10 * np.cos(t):.6f} {10 * np.sin(t):.6f}"
            for t in np.linspace(0, 2 * np.pi, 100, endpoint=False)
        )
        big = from_wkt(f"POLYGON (({verts}, 30.000000 0.000000))")
        rng = np.random.RandomState(7)
        import duckdb_geography_spark.geo.geodesy as gd

        ring = gd.lonlat_deg_to_xyz(big.polygons[0][0])
        for lon, lat in zip(rng.uniform(-60, 80, 60), rng.uniform(-50, 50, 60)):
            p = from_wkt(f"POINT ({lon:.5f} {lat:.5f})")
            # oracle: direct winding membership, no cap involved
            x = gd.lonlat_deg_to_xyz(np.array([[lon, lat]]))[0]
            want = gd.ring_contains_point(ring, x)
            assert ops.contains(big, p) == want
