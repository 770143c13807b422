"""Dissolved cell-union border (reference: InitToCellUnionBorder,
src/s2_cell_ops.cpp:134-169)."""

import numpy as np
import pytest

from duckdb_geography_spark.functions.casts import _cell_polygon
from duckdb_geography_spark.geo import ops
from duckdb_geography_spark.geo.cell_border import cell_union_border_lonlat
from duckdb_geography_spark.geo.geography import (
    KIND_MULTIPOLYGON,
    KIND_POLYGON,
    Geography,
)
from duckdb_geography_spark.s2 import cellmath as cm


def _geog(polys):
    kind = KIND_POLYGON if len(polys) == 1 else KIND_MULTIPOLYGON
    return Geography(kind, polygons=polys)


def _cell_area(cid):
    return ops.area(_cell_polygon(np.uint64(cid)))


@pytest.fixture(scope="module")
def c5():
    base = cm.lonlat_to_cellid(np.array([10.0]), np.array([20.0]))
    return cm.parent(base, np.array([5]))[0]


class TestCellUnionBorder:
    def test_adjacent_pair_dissolves(self, c5):
        nbrs = cm.edge_neighbors(np.array([c5], dtype=np.uint64))
        right = nbrs[1][0]
        cells = np.array([c5, right], dtype=np.uint64)
        polys = cell_union_border_lonlat(cells)
        assert len(polys) == 1 and len(polys[0]) == 1  # one shell, no holes
        g = _geog(polys)
        total = _cell_area(c5) + _cell_area(right)
        assert ops.area(g) == pytest.approx(total, rel=1e-9)
        # dissolved: perimeter is the outline, not two quads
        quads = _geog(
            [_cell_polygon(np.uint64(c)).polygons[0] for c in cells]
        )
        shared = ops.perimeter(quads) - ops.perimeter(g)
        assert shared > 0

    def test_ring_produces_hole(self, c5):
        base = cm.lonlat_to_cellid(np.array([10.0]), np.array([20.0]))
        center = cm.parent(base, np.array([6]))[0]
        nb = cm.edge_neighbors(np.array([center], dtype=np.uint64))
        cells = [nb[k][0] for k in range(4)]
        nb_r = cm.edge_neighbors(np.array([nb[1][0]], dtype=np.uint64))
        nb_l = cm.edge_neighbors(np.array([nb[3][0]], dtype=np.uint64))
        cells += [nb_r[2][0], nb_r[0][0], nb_l[2][0], nb_l[0][0]]
        cells = np.array(sorted(set(int(c) for c in cells)), dtype=np.uint64)
        assert len(cells) == 8
        polys = cell_union_border_lonlat(cells)
        assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole
        g = _geog(polys)
        total = sum(_cell_area(c) for c in cells)
        assert ops.area(g) == pytest.approx(total, rel=1e-9)
        # the missing center is NOT contained
        x, y, z = cm.cellid_to_center_xyz(np.array([center], dtype=np.uint64))
        lon, lat = cm.xyz_to_lonlat(x, y, z)
        from duckdb_geography_spark.geo.geography import from_wkt

        assert not ops.contains(g, from_wkt(f"POINT ({lon[0]} {lat[0]})"))

    def test_mixed_level_t_junction(self, c5):
        base = cm.lonlat_to_cellid(np.array([10.0]), np.array([20.0]))
        center = cm.parent(base, np.array([6]))[0]
        nb = cm.edge_neighbors(np.array([center], dtype=np.uint64))
        for k in range(4):
            coarse = cm.parent(np.array([nb[k][0]], dtype=np.uint64), np.array([5]))[0]
            if int(coarse) != int(c5):
                cells = np.array([center, coarse], dtype=np.uint64)
                polys = cell_union_border_lonlat(cells)
                assert len(polys) == 1
                g = _geog(polys)
                total = _cell_area(center) + _cell_area(coarse)
                assert ops.area(g) == pytest.approx(total, rel=1e-9)
                return
        pytest.fail("no coarser adjacent cell found")

    def test_cross_face_dissolve(self):
        e = cm.lonlat_to_cellid(np.array([44.999]), np.array([0.0]))
        c7 = cm.parent(e, np.array([7]))[0]
        n7 = cm.edge_neighbors(np.array([c7], dtype=np.uint64))
        face0 = (int(c7) >> 61) & 7
        other = [n7[k][0] for k in range(4) if ((int(n7[k][0]) >> 61) & 7) != face0]
        assert other, "expected a neighbor on an adjacent face"
        cells = np.array([c7, other[0]], dtype=np.uint64)
        polys = cell_union_border_lonlat(cells)
        assert len(polys) == 1  # face boundary edge dissolved
        g = _geog(polys)
        total = _cell_area(c7) + _cell_area(other[0])
        assert ops.area(g) == pytest.approx(total, rel=1e-9)

    def test_disjoint_cells_stay_separate(self, c5):
        far = cm.parent(
            cm.lonlat_to_cellid(np.array([100.0]), np.array([-30.0])), np.array([5])
        )[0]
        cells = np.array([c5, far], dtype=np.uint64)
        polys = cell_union_border_lonlat(cells)
        assert len(polys) == 2
