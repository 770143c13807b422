"""General polygon overlays on the sphere (Greiner-Hormann).

Fills the S2BooleanOperation role for polygon x polygon
intersection / union / difference with transversal boundary
crossings. Shares the CLOSED-model conventions of geo/ops.py.

Scope (v1): shells without holes; degenerate overlaps (shared edges,
crossings through vertices) raise ``OverlayError`` and callers fall
back to the structured cases in ops.py. Rings are (n,3) unit-vector
arrays, CCW orientation, implicit closing edge.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import geodesy as gd


class OverlayError(NotImplementedError):
    pass


class _Node:
    __slots__ = ("pt", "next", "prev", "neighbor", "is_inter", "entry", "visited")

    def __init__(self, pt, is_inter=False):
        self.pt = pt
        self.next: Optional[_Node] = None
        self.prev: Optional[_Node] = None
        self.neighbor: Optional[_Node] = None
        self.is_inter = is_inter
        self.entry = False
        self.visited = False


def _edge_intersection(a0, a1, b0, b1):
    """Proper-crossing point of two geodesic segments, or None.

    Raises OverlayError on degenerate configurations (touching at
    endpoints, collinear overlaps)."""
    d1 = float(np.dot(np.cross(a0, a1), b0))
    d2 = float(np.dot(np.cross(a0, a1), b1))
    d3 = float(np.dot(np.cross(b0, b1), a0))
    d4 = float(np.dot(np.cross(b0, b1), a1))
    eps = 1e-15
    if abs(d1) < eps or abs(d2) < eps or abs(d3) < eps or abs(d4) < eps:
        # endpoint touch / vertex-on-edge: ambiguous for GH tracing
        if (d1 * d2 < 0) or (d3 * d4 < 0) or max(map(abs, (d1, d2, d3, d4))) < eps:
            raise OverlayError("degenerate polygon overlay (boundary touch)")
        return None
    if d1 * d2 > 0 or d3 * d4 > 0:
        return None
    n = np.cross(np.cross(a0, a1), np.cross(b0, b1))
    norm = np.linalg.norm(n)
    if norm < 1e-18:
        raise OverlayError("degenerate polygon overlay (collinear edges)")
    p = n / norm
    # pick the candidate on both arcs
    for cand in (p, -p):
        if (
            gd.point_segment_distance(cand, a0, a1) < 1e-12
            and gd.point_segment_distance(cand, b0, b1) < 1e-12
        ):
            return cand
    return None


def _build_list(ring: np.ndarray) -> List[_Node]:
    nodes = [_Node(ring[i]) for i in range(len(ring))]
    for i, nd in enumerate(nodes):
        nd.next = nodes[(i + 1) % len(nodes)]
        nd.prev = nodes[i - 1]
    return nodes


def _insert_between(start: _Node, end: _Node, node: _Node, frac: float, order: dict):
    """Insert an intersection node after ``start`` keeping fractional
    order of multiple intersections on one edge."""
    cur = start
    while cur.next is not end and order.get(id(cur.next), -1.0) <= frac:
        cur = cur.next
    node.next = cur.next
    node.prev = cur
    cur.next.prev = node
    cur.next = node
    order[id(node)] = frac


def _ring_contains(ring: np.ndarray, x: np.ndarray) -> bool:
    return gd.winding_number(x, ring) == gd.ring_orientation(ring)


def _clip_rings(subject: np.ndarray, clip: np.ndarray, op: str) -> List[np.ndarray]:
    """Greiner-Hormann for two CCW shells; returns result rings (xyz)."""
    s_nodes = _build_list(subject)
    c_nodes = _build_list(clip)
    s_order: dict = {}
    c_order: dict = {}
    inters = []
    for i in range(len(subject)):
        a0, a1 = subject[i], subject[(i + 1) % len(subject)]
        for j in range(len(clip)):
            b0, b1 = clip[j], clip[(j + 1) % len(clip)]
            p = _edge_intersection(a0, a1, b0, b1)
            if p is None:
                continue
            sn = _Node(p, True)
            cn = _Node(p.copy(), True)
            sn.neighbor = cn
            cn.neighbor = sn
            fa = float(gd.angle(a0[None], p[None])[0] / max(gd.angle(a0[None], a1[None])[0], 1e-300))
            fb = float(gd.angle(b0[None], p[None])[0] / max(gd.angle(b0[None], b1[None])[0], 1e-300))
            _insert_between(s_nodes[i], s_nodes[(i + 1) % len(subject)], sn, fa, s_order)
            _insert_between(c_nodes[j], c_nodes[(j + 1) % len(clip)], cn, fb, c_order)
            inters.append(sn)

    if not inters:
        s_in_c = _ring_contains(clip, subject[0])
        c_in_s = _ring_contains(subject, clip[0])
        if op == "intersection":
            if s_in_c:
                return [subject]
            if c_in_s:
                return [clip]
            return []
        if op == "union":
            if s_in_c:
                return [clip]
            if c_in_s:
                return [subject]
            return [subject, clip]  # disjoint -> keep both
        if op == "difference":
            if s_in_c:
                return []
            if c_in_s:
                raise OverlayError("difference creating a hole is not supported yet")
            return [subject]

    # entry/exit flags: a node is an "entry" when the segment after
    # it lies inside the other polygon. The op selects a flag
    # inversion (classic GH): intersection as-is, union inverts both
    # chains, difference inverts the subject chain.
    for nodes, other in ((s_nodes, clip), (c_nodes, subject)):
        nd = nodes[0]
        while True:
            if nd.is_inter:
                mid = nd.pt + nd.next.pt
                nrm = np.linalg.norm(mid)
                if nrm < 1e-12:
                    raise OverlayError("antipodal midpoint in overlay")
                nd.entry = _ring_contains(other, mid / nrm)
            nd = nd.next
            if nd is nodes[0]:
                break
    if op == "union":
        for nd in inters:
            nd.entry = not nd.entry
            nd.neighbor.entry = not nd.neighbor.entry
    elif op == "difference":
        for nd in inters:  # invert subject side only
            nd.entry = not nd.entry

    results: List[np.ndarray] = []
    limit = 8 * (len(subject) + len(clip) + len(inters)) + 32
    for start in inters:
        if start.visited:
            continue
        ring_pts = [start.pt]
        cur = start
        guard = 0
        while True:
            guard += 1
            if guard > limit:
                raise OverlayError("overlay tracing failed to close a ring")
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            step = (lambda n: n.next) if cur.entry else (lambda n: n.prev)
            nd = step(cur)
            while not nd.is_inter:
                ring_pts.append(nd.pt)
                nd = step(nd)
            if nd is start or nd.neighbor is start:
                break
            ring_pts.append(nd.pt)
            cur = nd.neighbor
        if len(ring_pts) >= 3:
            results.append(np.array(ring_pts))
    return results


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    keep = [0]
    for i in range(1, len(ring)):
        if gd.angle(ring[i][None], ring[keep[-1]][None])[0] > 1e-14:
            keep.append(i)
    if len(keep) > 1 and gd.angle(ring[keep[-1]][None], ring[keep[0]][None])[0] <= 1e-14:
        keep.pop()
    return ring[keep]


def overlay_shells(
    subject_shells: List[np.ndarray], clip_shells: List[np.ndarray], op: str
) -> List[np.ndarray]:
    """Overlay of two shell sets (no holes). Returns result shells."""
    if op == "intersection":
        out = []
        for s in subject_shells:
            for c in clip_shells:
                out.extend(_clip_rings(s, c, "intersection"))
        return [_dedupe_ring(r) for r in out if len(_dedupe_ring(r)) >= 3]
    if op == "difference":
        current = list(subject_shells)
        for c in clip_shells:
            nxt: List[np.ndarray] = []
            for s in current:
                nxt.extend(_clip_rings(s, c, "difference"))
            current = nxt
        return [_dedupe_ring(r) for r in current if len(_dedupe_ring(r)) >= 3]
    if op == "union":
        shells = list(subject_shells)
        for c in clip_shells:
            merged = False
            out: List[np.ndarray] = []
            cur = c
            for s in shells:
                try:
                    res = _clip_rings(s, cur, "union")
                except OverlayError:
                    raise
                if len(res) == 2 and res[0] is s and res[1] is cur:
                    out.append(s)  # disjoint
                elif len(res) == 1:
                    cur = res[0]  # merged (or one contains the other)
                    merged = True
                else:
                    # union produced several rings (shouldn't for shells)
                    out.extend(res[:-1])
                    cur = res[-1]
                    merged = True
            out.append(cur)
            shells = out
        return [_dedupe_ring(r) for r in shells if len(_dedupe_ring(r)) >= 3]
    raise ValueError(f"unknown overlay op {op!r}")
