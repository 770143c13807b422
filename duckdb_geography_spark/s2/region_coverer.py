"""Faithful port of the S2RegionCoverer algorithm (default options).

Reproduces s2geometry's covering construction — initial candidates
from the region's cap bound + vertex neighbors, the priority-queue
subdivision with (level, num_children, num_terminals) priorities, and
terminal detection via region containment — so that ``s2_covering``
output can match the reference's golden cell lists
(test/sql/geography/bounds.test:8-16).

Region interface (duck-typed): ``may_intersect_batch(cells)``,
``contains_cell_batch(cells)``, ``cap_bound() -> (center_xyz,
radius_radians)``. ``_GeogRegion`` in s2/coverer.py provides the
first; this module adds the rest.
"""

from __future__ import annotations

import heapq
import math
from typing import List, Optional

import numpy as np

from ..geo import geodesy as gd
from . import cellmath as cm

U64 = np.uint64
MAX_LEVEL = 30
#: kMinWidth.deriv for the quadratic projection (s2metrics)
K_MIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0


def min_width_level_for_value(value: float) -> int:
    """S2::kMinWidth.GetLevelForMinValue: max level whose min cell
    width is still >= value."""
    if value <= 0:
        return MAX_LEVEL
    level = int(math.floor(math.log2(K_MIN_WIDTH_DERIV / value)))
    return max(0, min(MAX_LEVEL, level))


def vertex_neighbors(cell: np.uint64, level: int) -> List[np.uint64]:
    """S2CellId::AppendVertexNeighbors: the <=4 cells at ``level``
    (coarser than this cell) touching this cell's closest vertex."""
    arr = np.array([cell], dtype=np.uint64)
    face, i, j, _ = cm.to_face_ij_orientation(arr)
    face_i, i_i, j_i = int(face[0]), int(i[0]), int(j[0])
    halfsize = 1 << (MAX_LEVEL - level - 1)
    size = halfsize * 2
    if i_i & halfsize:
        ioffset, isame = size, (i_i + size) < cm.MAX_SIZE
    else:
        ioffset, isame = -size, (i_i - size) >= 0
    if j_i & halfsize:
        joffset, jsame = size, (j_i + size) < cm.MAX_SIZE
    else:
        joffset, jsame = -size, (j_i - size) >= 0
    out = [U64(cm.parent(arr, np.array([level]))[0])]
    out.append(_from_ij_same_parent(face_i, i_i + ioffset, j_i, isame, level))
    out.append(_from_ij_same_parent(face_i, i_i, j_i + joffset, jsame, level))
    if isame or jsame:
        out.append(
            _from_ij_same_parent(face_i, i_i + ioffset, j_i + joffset, isame and jsame, level)
        )
    return out


def _from_ij_same_parent(face: int, i: int, j: int, same_face: bool, level: int) -> np.uint64:
    if same_face:
        leaf = cm.from_face_ij(
            np.array([face], dtype=np.uint64),
            np.array([i], dtype=np.uint64),
            np.array([j], dtype=np.uint64),
        )
    else:
        leaf = cm._from_face_ij_wrap(
            np.array([face]), np.array([i]), np.array([j])
        )
    return U64(cm.parent(leaf, np.array([level]))[0])


class _Candidate:
    __slots__ = ("cell", "level", "is_terminal", "children")

    def __init__(self, cell, level, is_terminal):
        self.cell = cell
        self.level = level
        self.is_terminal = is_terminal
        self.children: List["_Candidate"] = []


class RegionCoverer:
    """Default-options S2RegionCoverer (max_cells configurable,
    min_level 0, max_level 30, level_mod 1, non-interior)."""

    MAX_CHILDREN_SHIFT = 2  # level_mod 1 -> 4 children

    def __init__(self, region, max_cells: int = 8):
        self.region = region
        self.max_cells = max_cells
        self.result: List[np.uint64] = []
        self.pq: List = []
        self._seq = 0

    # -- region tests -----------------------------------------------------
    def _may_intersect(self, cell) -> bool:
        return bool(self.region.may_intersect_batch(np.array([cell], dtype=np.uint64))[0])

    def _contains(self, cell) -> bool:
        return bool(self.region.contains_cell_batch(np.array([cell], dtype=np.uint64))[0])

    # -- algorithm --------------------------------------------------------
    def _new_candidate(self, cell) -> Optional[_Candidate]:
        if not self._may_intersect(cell):
            return None
        lev = int(cm.level(np.array([cell], dtype=np.uint64))[0])
        is_terminal = lev == MAX_LEVEL or self._contains(cell)
        return _Candidate(U64(cell), lev, is_terminal)

    def _expand_children(self, candidate: _Candidate) -> int:
        """Probe all 4 children in single batched region calls."""
        kids = cm.child(
            np.repeat(np.array([candidate.cell], dtype=np.uint64), 4), np.arange(4)
        )
        may = self.region.may_intersect_batch(kids)
        kids = kids[may]
        if not len(kids):
            return 0
        child_level = candidate.level + 1
        if child_level == MAX_LEVEL:
            term = np.ones(len(kids), dtype=bool)
        else:
            term = self.region.contains_cell_batch(kids)
        num_terminals = 0
        for k, t in zip(kids, term):
            candidate.children.append(_Candidate(U64(k), child_level, bool(t)))
            if t:
                num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate: Optional[_Candidate]):
        if candidate is None:
            return
        if candidate.is_terminal:
            self.result.append(candidate.cell)
            return
        num_terminals = self._expand_children(candidate)
        lev = candidate.level
        if not candidate.children:
            return
        if num_terminals == 4:
            candidate.is_terminal = True
            self._add_candidate(candidate)
            return
        shift = self.MAX_CHILDREN_SHIFT
        # S2 maximizes -(((level<<2)+children<<2)+terminals); with a
        # min-heap that is the non-negated key: shallow cells with few
        # children pop first
        priority = (((lev << shift) + len(candidate.children)) << shift) + num_terminals
        self._seq += 1
        heapq.heappush(self.pq, (priority, self._seq, candidate))

    def _initial_candidates(self):
        if self.max_cells >= 4:
            center, radius = self.region.cap_bound()
            level = min(min_width_level_for_value(2.0 * radius), MAX_LEVEL - 1)
            if level > 0:
                leaf = self._leaf_from_xyz(center)
                for cell in dict.fromkeys(vertex_neighbors(leaf, level)):
                    self._add_candidate(self._new_candidate(cell))
                return
        for f in range(6):
            self._add_candidate(self._new_candidate(U64((f << 61) | (1 << 60))))

    @staticmethod
    def _leaf_from_xyz(p: np.ndarray) -> np.uint64:
        face, u, v = cm.xyz_to_face_uv(p[0:1], p[1:2], p[2:3])
        s, t = cm.uv_to_st(u), cm.uv_to_st(v)
        i = np.clip(np.floor(s * cm.MAX_SIZE), 0, cm.MAX_SIZE - 1).astype(np.uint64)
        j = np.clip(np.floor(t * cm.MAX_SIZE), 0, cm.MAX_SIZE - 1).astype(np.uint64)
        return U64(cm.from_face_ij(face.astype(np.uint64), i, j)[0])

    def covering(self) -> np.ndarray:
        self.result = []
        self.pq = []
        self._initial_candidates()
        while self.pq:
            _, _, candidate = heapq.heappop(self.pq)
            # expand when a single child makes it free, or when the
            # children still fit in the budget (s2region_coverer.cc
            # main-loop condition)
            if (
                len(candidate.children) == 1
                or len(self.result) + len(self.pq) + len(candidate.children) <= self.max_cells
            ):
                for child in candidate.children:
                    self._add_candidate(child)
            else:
                candidate.is_terminal = True
                self.result.append(candidate.cell)
        from .coverer import normalize_cell_union

        return normalize_cell_union(np.array(self.result, dtype=np.uint64))
