"""Cell coverings of geographies (S2RegionCoverer-style).

Produces normalized S2 cell unions that are guaranteed supersets of a
geography's extent (no false negatives for may-intersect tests) with
at most ``max_cells`` cells — the same contract the reference gets
from S2RegionCoverer (reference: src/s2_bounds.cpp:19-144, default
max 8 cells).

The refinement strategy is a deterministic greedy subdivision rather
than a line-for-line S2RegionCoverer port, so coverings are valid but
not always cell-identical to the reference's (exact-match goldens for
s2_covering are tracked as a known gap; join correctness only needs
the superset property).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..geo import geodesy as gd
from . import cellmath as cm

U64 = np.uint64
_FACE_CELLS = [U64((f << 61) | (1 << 60)) for f in range(6)]


def normalize_cell_union(cells) -> np.ndarray:
    """Sort (unsigned), drop invalid/contained cells, merge complete
    sibling groups — S2CellUnion::Normalize semantics
    (reference cast: src/s2_cell_ops.cpp:95-132)."""
    arr = np.asarray(cells, dtype=np.uint64)
    arr = arr[cm.is_valid(arr)]
    if arr.size == 0:
        return arr
    arr = np.unique(arr)  # unsigned sort + dedupe
    # drop cells contained in a predecessor
    out: List[np.uint64] = []
    for c in arr.tolist():
        c = U64(c)
        if out and cm.contains(np.array([out[-1]]), np.array([c]))[0]:
            continue
        out.append(c)
        # merge complete sibling groups bottom-up
        while len(out) >= 4:
            last4 = np.array(out[-4:], dtype=np.uint64)
            lev = cm.level(last4)
            if lev[0] <= 0 or not (lev == lev[0]).all():
                break
            parents = cm.parent(last4, np.full(4, lev[0] - 1))
            if not (parents == parents[0]).all():
                break
            # all four children present?
            kids = {int(cm.child(np.array([parents[0]]), np.array([k]))[0]) for k in range(4)}
            if {int(v) for v in last4} != kids:
                break
            out = out[:-4] + [parents[0]]
    return np.array(out, dtype=np.uint64)


class _GeogRegion:
    """May-intersect oracle for (cell, geography) with no false negatives."""

    def __init__(self, geog, buffer_radians: float = 0.0):
        self.buffer = buffer_radians
        pts = geog.all_points()
        self.vertex_lonlat = [pts] if len(pts) else []
        self.edges = []  # (a_xyz (m,3), b_xyz (m,3)) per chain
        self.rings_xyz = []  # shell rings for corner-in-polygon tests
        for line in geog.all_lines():
            self.vertex_lonlat.append(line)
            if len(line) >= 2:
                xyz = gd.lonlat_deg_to_xyz(line)
                self.edges.append((xyz[:-1], xyz[1:]))
        for rings in geog.all_polygons():
            for ri, r in enumerate(rings):
                if len(r) < 3:
                    continue
                self.vertex_lonlat.append(r)
                xyz = gd.lonlat_deg_to_xyz(r)
                self.edges.append((xyz, np.roll(xyz, -1, axis=0)))
                if ri == 0:
                    self.rings_xyz.append(xyz)
        if self.vertex_lonlat:
            allv = np.concatenate(self.vertex_lonlat)
            self.vertex_cells = cm.lonlat_to_cellid(allv[:, 0], allv[:, 1])
            self.vertex_xyz = gd.lonlat_deg_to_xyz(allv)
        else:
            self.vertex_cells = np.empty(0, dtype=np.uint64)
            self.vertex_xyz = np.empty((0, 3))

    def may_intersect(self, cell: np.uint64) -> bool:
        carr = np.array([cell], dtype=np.uint64)
        # 1. any geometry vertex inside the cell (exact, integer compare)
        if self.vertex_cells.size and bool(
            np.any(
                (cm.range_min(carr)[0] <= self.vertex_cells)
                & (self.vertex_cells <= cm.range_max(carr)[0])
            )
        ):
            return True
        corners = self._corners(cell)
        if self.buffer > 0.0:
            return self._within_buffer(cell, corners)
        # 2. any cell corner inside a polygon shell
        for ring in self.rings_xyz:
            for k in range(4):
                if gd.ring_contains_point(ring, corners[k], closed=False):
                    return True
        # 3. any cell edge crosses any geometry edge
        c0 = corners
        c1 = np.roll(corners, -1, axis=0)
        for a, b in self.edges:
            for k in range(4):
                if np.any(
                    gd.segments_cross(
                        np.broadcast_to(c0[k], a.shape),
                        np.broadcast_to(c1[k], a.shape),
                        a,
                        b,
                    )
                ):
                    return True
        return False

    def _corners(self, cell) -> np.ndarray:
        lon, lat = cm.cell_vertex_lonlat(
            np.array([cell] * 4, dtype=np.uint64), np.arange(4)
        )
        return gd.lonlat_deg_to_xyz(np.stack([lon, lat], axis=1))

    def _within_buffer(self, cell, corners) -> bool:
        """Conservative: cell center inside a polygon, or min geodesic
        distance from the center to the boundary minus the cell's
        circumradius within the buffer."""
        if not self.vertex_xyz.size:
            return False
        center_lon, center_lat = cm.cellid_to_lonlat(np.array([cell], dtype=np.uint64))
        center = gd.lonlat_deg_to_xyz(np.stack([center_lon, center_lat], axis=1))[0]
        for ring in self.rings_xyz:
            if gd.ring_contains_point(ring, center, closed=False):
                return True
        circum = float(np.max(gd.angle(np.broadcast_to(center, corners.shape), corners)))
        dmin = np.inf
        for a, b in self.edges or [(self.vertex_xyz, self.vertex_xyz)]:
            for i in range(len(a)):
                dmin = min(dmin, float(gd.point_segment_distance(center[None, :], a[i], b[i])[0]))
            if dmin <= self.buffer + circum:
                return True
        if not self.edges:
            dmin = float(np.min(gd.angle(np.broadcast_to(center, self.vertex_xyz.shape), self.vertex_xyz)))
        return dmin <= self.buffer + circum


def covering_of_geography(
    geog,
    max_cells: int = 8,
    fixed_level: Optional[int] = None,
    buffer_radians: float = 0.0,
) -> np.ndarray:
    """Cell covering of a geography (uint64 array, normalized unless
    ``fixed_level``). Cell-center fast path returns the id itself /
    its ancestor, matching the reference (src/s2_bounds.cpp:121-129,
    bounds.test:19-27)."""
    from ..geo.geography import KIND_CELL_CENTER

    if geog.is_empty():
        return np.empty(0, dtype=np.uint64)
    if geog.kind == KIND_CELL_CENTER and buffer_radians == 0.0:
        cid = np.array([geog.cell_id], dtype=np.uint64)
        if fixed_level is not None:
            return cm.parent(cid, np.array([fixed_level]))
        return cid
    pts = geog.all_points()
    only_points = (
        not geog.all_lines() and not geog.all_polygons() and len(pts) > 0 and buffer_radians == 0.0
    )
    if only_points:
        leaves = cm.lonlat_to_cellid(pts[:, 0], pts[:, 1])
        if fixed_level is not None:
            return np.unique(cm.parent(leaves, np.full(len(leaves), fixed_level)))
        cells = normalize_cell_union(leaves)
        lev = 30
        while len(cells) > max_cells and lev > 0:
            lev -= 1
            cells = normalize_cell_union(cm.parent(cells, np.full(len(cells), lev)))
        return cells

    region = _GeogRegion(geog, buffer_radians)
    if fixed_level is not None:
        return _fixed_level_covering(region, fixed_level)
    return _adaptive_covering(region, max_cells)


def _fixed_level_covering(region: _GeogRegion, level: int, cap: int = 4096) -> np.ndarray:
    """BFS descent keeping only intersecting cells; if the covering
    would exceed ``cap`` cells the remaining cells stay coarser (cap
    guards runaway coverings of continent-scale regions at deep
    levels; coarser cells keep the no-false-negative property)."""
    frontier = [c for c in _FACE_CELLS if region.may_intersect(c)]
    for _lev in range(0, level):
        nxt: List[np.uint64] = []
        overflow = False
        for c in frontier:
            if int(cm.level(np.array([c]))[0]) >= level:
                nxt.append(c)
                continue
            kids = [
                U64(cm.child(np.array([c]), np.array([k]))[0])
                for k in range(4)
            ]
            nxt.extend(k for k in kids if region.may_intersect(k))
            if len(nxt) > cap:
                overflow = True
                break
        if overflow:
            break
        frontier = nxt
    arr = np.array(sorted(int(c) for c in frontier), dtype=np.uint64)
    return arr


def _adaptive_covering(region: _GeogRegion, max_cells: int) -> np.ndarray:
    cells = [c for c in _FACE_CELLS if region.may_intersect(c)]
    # Greedy: repeatedly split the largest cell while the result still
    # fits in max_cells.
    while True:
        levels = cm.level(np.array(cells, dtype=np.uint64))
        order = np.argsort(levels, kind="stable")
        split_done = False
        for idx in order:
            c = cells[idx]
            if levels[idx] >= 30:
                continue
            kids = [U64(cm.child(np.array([c]), np.array([k]))[0]) for k in range(4)]
            kids = [k for k in kids if region.may_intersect(k)]
            if len(cells) - 1 + len(kids) <= max_cells and kids:
                cells = [x for i, x in enumerate(cells) if i != idx] + kids
                split_done = True
                break
        if not split_done:
            break
    return normalize_cell_union(np.array(cells, dtype=np.uint64))
