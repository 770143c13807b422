"""Dissolved border of an S2 cell union.

The reference casts S2_CELL_UNION -> GEOGRAPHY through
``S2Polygon::InitToCellUnionBorder`` (src/s2_cell_ops.cpp:134-169),
which outlines the union region instead of emitting one quad per
cell. This module reproduces that: every cell contributes its four
CCW boundary edges, edges are split at the corner vertices of finer
neighbors (T-junctions between levels, including across cube-face
boundaries — matching is by snapped xyz, which face-local coordinates
share), and interior edges cancel in opposite-direction pairs. What
remains is the border, stitched into CCW shells and CW holes by the
overlay machinery.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..s2 import cellmath as cm
from . import geodesy as gd
from .overlay import _Snap, _assemble, _split_pinched, _stitch

_EPS = 1e-12


def cell_union_border_rings(cells_u: np.ndarray) -> List[List[np.ndarray]]:
    """Polygons (ring lists: CCW shell first, CW holes) of the border
    of a normalized cell union, as xyz rings."""
    cells = np.asarray(cells_u, dtype=np.uint64)
    n = len(cells)
    if n == 0:
        return []
    # 4 CCW corners per cell
    corners = np.empty((n, 4, 3))
    for k in range(4):
        lon, lat = cm.cell_vertex_lonlat(cells, np.full(n, k))
        corners[:, k, :] = gd.lonlat_deg_to_xyz(np.stack([lon, lat], axis=1))
    snap = _Snap()
    pool = np.array([snap.canon(corners[i, k]) for i in range(n) for k in range(4)])
    edges = []
    for i in range(n):
        for k in range(4):
            a = snap.canon(corners[i, k])
            b = snap.canon(corners[i, (k + 1) % 4])
            seg = float(gd.angle(a[None], b[None])[0])
            if seg < 1e-14:
                continue
            # split at pool vertices lying strictly inside this edge
            d = gd.point_segment_distance(pool, a, b)
            on = pool[d < _EPS]
            if len(on) > 2:
                ts = gd.angle(on, np.broadcast_to(a, on.shape)) / seg
                order = np.argsort(ts)
                pts = [a]
                for idx in order:
                    t = float(ts[idx])
                    if t < 1e-9 or t > 1 - 1e-9:
                        continue
                    p = snap.canon(on[idx])
                    if float(np.linalg.norm(p - pts[-1])) > _EPS:
                        pts.append(p)
                pts.append(b)
            else:
                pts = [a, b]
            for j in range(len(pts) - 1):
                if float(np.linalg.norm(pts[j] - pts[j + 1])) > _EPS:
                    edges.append((pts[j], pts[j + 1]))
    rings = _stitch(list(edges))
    rings = [r for r in rings if len(r) >= 3]
    if not rings:
        return []
    return _assemble(rings)


def cell_union_border_lonlat(cells_u: np.ndarray) -> List[List[np.ndarray]]:
    """Same as :func:`cell_union_border_rings`, in lon/lat degrees."""
    return [
        [gd.xyz_to_lonlat_deg(r) for r in rings]
        for rings in cell_union_border_rings(cells_u)
    ]
