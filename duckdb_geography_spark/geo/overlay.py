"""General overlays on the sphere via edge classification.

Fills the S2BooleanOperation role (reference:
src/s2_binary_index_ops.cpp:328-448) for intersection / union /
difference over polygons WITH holes, polylines, and their mixes,
including the degenerate configurations Greiner-Hormann cannot trace
(shared boundary edges, crossings through vertices, T-junctions).

Algorithm (the classic overlay-by-classification used by planar and
spherical boolean engines alike):

1. split every boundary edge of A at its intersections with B's
   boundary (proper crossings, endpoint-on-edge, collinear overlap
   endpoints), and vice versa, snapping split points to shared
   canonical vertices;
2. classify each sub-edge by its arc midpoint as strictly inside /
   strictly outside the other region, or on its boundary (and, when
   on-boundary, whether the two boundaries run in the same
   direction);
3. select directed sub-edges per operation (interior always on the
   left): intersection keeps A-inside-B + B-inside-A + shared
   same-direction once; union keeps A-outside-B + B-outside-A +
   shared same-direction once; difference keeps A-outside-B +
   reversed B-inside-A + shared opposite-direction once;
4. stitch the selected edges into closed rings, resolving multi-way
   vertices by the first-counterclockwise-turn rule, then assemble
   rings into polygons (CCW shells, CW holes matched by containment).

Rings are (n,3) unit-vector arrays with an implicit closing edge.
All tolerances are radians on the unit sphere (1e-12 rad ~ 6 um).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import geodesy as gd

EPS = 1e-12  # point coincidence / on-edge tolerance (radians)
_KEY_SCALE = 1e12


class OverlayError(NotImplementedError):
    pass


# ---------------------------------------------------------------------------
# vertex snapping
# ---------------------------------------------------------------------------


class _Snap:
    """Canonicalizes nearly-equal points to one representative so that
    split points, ring vertices, and T-junctions share exact keys."""

    def __init__(self):
        self._by_key: Dict[Tuple[int, int, int], np.ndarray] = {}

    def canon(self, p: np.ndarray) -> np.ndarray:
        scaled = p * _KEY_SCALE
        base = np.round(scaled)
        # probe the full 27-neighborhood of the rounding cell (each axis
        # shifted independently) so two points within EPS straddling a
        # cell boundary in ANY single axis still unify — a uniform
        # shift of all three axes would miss e.g. an x-boundary
        # straddle with y and z mid-cell
        for dx in (0.0, -0.5, 0.5):
            for dy in (0.0, -0.5, 0.5):
                for dz in (0.0, -0.5, 0.5):
                    k = (
                        int(round(scaled[0] + dx)),
                        int(round(scaled[1] + dy)),
                        int(round(scaled[2] + dz)),
                    )
                    q = self._by_key.get(k)
                    if q is not None and float(np.linalg.norm(q - p)) < 4 * EPS:
                        return q
        k = tuple(int(v) for v in base)
        self._by_key[k] = p
        return p

    @staticmethod
    def key(p: np.ndarray) -> Tuple[int, int, int]:
        return tuple(int(v) for v in np.round(p * _KEY_SCALE))


# ---------------------------------------------------------------------------
# region wrapper (polygon set with holes)
# ---------------------------------------------------------------------------


def _oriented(ring: np.ndarray, ccw: bool) -> np.ndarray:
    sa = gd.ring_signed_area(ring)
    if (sa >= 0) != ccw:
        return ring[::-1].copy()
    return ring


class _Region:
    """A multipolygon as oriented rings: shells CCW, holes CW, so the
    interior is always on the LEFT of every directed boundary edge."""

    def __init__(self, polys: Sequence[Sequence[np.ndarray]]):
        self.polys: List[List[np.ndarray]] = []
        for rings in polys:
            rs = [r for r in rings if len(r) >= 3]
            if not rs:
                continue
            out = [_oriented(rs[0], True)]
            out.extend(_oriented(h, False) for h in rs[1:])
            self.polys.append(out)

    def rings(self) -> List[np.ndarray]:
        return [r for rings in self.polys for r in rings]

    def contains(self, x: np.ndarray) -> bool:
        """Strict interior test (caller has excluded boundary)."""
        for rings in self.polys:
            shell = rings[0]
            if gd.winding_number(x, shell) == 1:  # shells are CCW
                if all(gd.winding_number(x, h) == 0 for h in rings[1:]):
                    return True
        return False


# ---------------------------------------------------------------------------
# edge splitting
# ---------------------------------------------------------------------------


def _tangent(at: np.ndarray, toward: np.ndarray) -> Optional[np.ndarray]:
    t = toward - float(np.dot(toward, at)) * at
    n = float(np.linalg.norm(t))
    if n < 1e-15:
        return None
    return t / n


def _arc_param(a0: np.ndarray, a1: np.ndarray, p: np.ndarray) -> float:
    denom = float(gd.angle(a0[None], a1[None])[0])
    if denom < 1e-300:
        return 0.0
    return float(gd.angle(a0[None], p[None])[0]) / denom


def _edge_splits(a0, a1, b0, b1, snap: _Snap) -> Tuple[List[float], List[float]]:
    """Split params of edge a and edge b against each other.

    Handles: proper crossings, endpoint-of-one-on-the-other
    (T-junctions and shared vertices), and collinear overlaps (each
    edge is split at the other's endpoints)."""
    ta: List[float] = []
    tb: List[float] = []
    na = np.cross(a0, a1)
    nb = np.cross(b0, b1)
    nna = float(np.linalg.norm(na))
    nnb = float(np.linalg.norm(nb))
    if nna < 1e-15 or nnb < 1e-15:
        return ta, tb  # degenerate (zero-length) edge
    na /= nna
    nb /= nnb
    # endpoint-on-other-edge (covers shared vertices, T-junctions, and
    # the endpoints of collinear overlaps)
    for p in (b0, b1):
        if float(gd.point_segment_distance(p[None], a0, a1)[0]) < EPS:
            ta.append(_arc_param(a0, a1, snap.canon(p)))
    for p in (a0, a1):
        if float(gd.point_segment_distance(p[None], b0, b1)[0]) < EPS:
            tb.append(_arc_param(b0, b1, snap.canon(p)))
    cross_n = np.cross(na, nb)
    if float(np.linalg.norm(cross_n)) < 1e-9:
        return ta, tb  # (anti)parallel great circles: no proper crossing
    # proper crossing candidate: +-(na x nb)
    p = cross_n / float(np.linalg.norm(cross_n))
    for cand in (p, -p):
        if (
            float(gd.point_segment_distance(cand[None], a0, a1)[0]) < EPS
            and float(gd.point_segment_distance(cand[None], b0, b1)[0]) < EPS
        ):
            c = snap.canon(cand)
            ta.append(_arc_param(a0, a1, c))
            tb.append(_arc_param(b0, b1, c))
            break
    return ta, tb


class _SubEdge:
    __slots__ = ("p0", "p1", "side", "cls", "same_dir")

    def __init__(self, p0: np.ndarray, p1: np.ndarray, side: int):
        self.p0 = p0
        self.p1 = p1
        self.side = side  # 0 = from A, 1 = from B
        self.cls = ""  # "in" | "out" | "bnd"
        self.same_dir = True


def _split_ring_edges(
    rings: List[np.ndarray], other_rings: List[np.ndarray], side: int, snap: _Snap
) -> List[_SubEdge]:
    """Split every directed edge of ``rings`` at its intersections with
    ``other_rings`` and return the sub-edges (endpoints snapped)."""
    out: List[_SubEdge] = []
    other_edges = []
    for orr in other_rings:
        nxt = np.roll(orr, -1, axis=0)
        other_edges.extend((orr[i], nxt[i]) for i in range(len(orr)))
    for ring in rings:
        nxt = np.roll(ring, -1, axis=0)
        for i in range(len(ring)):
            a0 = snap.canon(ring[i])
            a1 = snap.canon(nxt[i])
            params: List[float] = []
            for b0, b1 in other_edges:
                ta, _ = _edge_splits(a0, a1, b0, b1, snap)
                params.extend(ta)
            params = sorted(t for t in params if 1e-9 < t < 1 - 1e-9)
            pts = [a0]
            total = float(gd.angle(a0[None], a1[None])[0])
            if total < 1e-14:
                continue
            prev_t = -1.0
            for t in params:
                if t - prev_t < 1e-9:
                    continue
                prev_t = t
                # interpolate along the great-circle arc
                axis = np.cross(a0, a1)
                axis /= float(np.linalg.norm(axis))
                ang = t * total
                c, s = np.cos(ang), np.sin(ang)
                p = a0 * c + np.cross(axis, a0) * s
                pts.append(snap.canon(p / float(np.linalg.norm(p))))
            pts.append(a1)
            for j in range(len(pts) - 1):
                if float(np.linalg.norm(pts[j] - pts[j + 1])) > EPS:
                    out.append(_SubEdge(pts[j], pts[j + 1], side))
    return out


def _classify(edges: List[_SubEdge], other: _Region, other_rings: List[np.ndarray]):
    other_edge_list = []
    for orr in other_rings:
        nxt = np.roll(orr, -1, axis=0)
        other_edge_list.extend((orr[i], nxt[i]) for i in range(len(orr)))
    for e in edges:
        mid = e.p0 + e.p1
        n = float(np.linalg.norm(mid))
        if n < 1e-12:
            raise OverlayError("antipodal sub-edge in overlay")
        mid /= n
        on = None
        for b0, b1 in other_edge_list:
            if float(gd.point_segment_distance(mid[None], b0, b1)[0]) < EPS:
                on = (b0, b1)
                break
        if on is not None:
            e.cls = "bnd"
            tm = _tangent(mid, e.p1)
            tb = _tangent(mid, on[1])
            if tb is None:  # midpoint lands on the other edge's endpoint
                tb = _tangent(mid, on[0])
                tb = -tb if tb is not None else None
            e.same_dir = bool(tm is not None and tb is not None and float(np.dot(tm, tb)) > 0)
        elif other.contains(mid):
            e.cls = "in"
        else:
            e.cls = "out"


# ---------------------------------------------------------------------------
# stitching
# ---------------------------------------------------------------------------


def _stitch(edges: List[Tuple[np.ndarray, np.ndarray]]) -> List[np.ndarray]:
    """Assemble directed edges (interior on the left) into closed
    rings. Multi-way vertices take the first outgoing edge
    counterclockwise from the reversed incoming direction, which keeps
    the traced face maximal on the left."""
    # drop exact opposite-duplicate pairs (degenerate sliver edges):
    # an edge and its reverse bound a zero-area region
    by_pair: Dict[Tuple, List[int]] = {}
    for idx, (p0, p1) in enumerate(edges):
        k = (_Snap.key(p0), _Snap.key(p1))
        rk = (k[1], k[0])
        if rk in by_pair and by_pair[rk]:
            partner = by_pair[rk].pop()
            edges[partner] = None  # type: ignore[call-overload]
            edges[idx] = None  # type: ignore[call-overload]
            continue
        by_pair.setdefault(k, []).append(idx)
    live = [e for e in edges if e is not None]
    # dedupe exact duplicates (e.g. shared boundary selected from both sides)
    seen = set()
    uniq: List[Tuple[np.ndarray, np.ndarray]] = []
    for p0, p1 in live:
        k = (_Snap.key(p0), _Snap.key(p1))
        if k in seen:
            continue
        seen.add(k)
        uniq.append((p0, p1))
    out_map: Dict[Tuple[int, int, int], List[int]] = {}
    for i, (p0, _) in enumerate(uniq):
        out_map.setdefault(_Snap.key(p0), []).append(i)
    used = [False] * len(uniq)
    rings: List[np.ndarray] = []
    for start in range(len(uniq)):
        if used[start]:
            continue
        path = [uniq[start][0]]
        cur = start
        used[start] = True
        guard = 0
        while True:
            guard += 1
            if guard > len(uniq) + 4:
                raise OverlayError("overlay stitching failed to close a ring")
            p0, p1 = uniq[cur]
            k1 = _Snap.key(p1)
            if k1 == _Snap.key(path[0]):
                break  # closed
            path.append(p1)
            cands = [i for i in out_map.get(k1, []) if not used[i]]
            if not cands:
                raise OverlayError("overlay stitching hit a dead end")
            if len(cands) == 1:
                nxt = cands[0]
            else:
                rev = _tangent(p1, p0)
                best, best_ang = None, None
                for i in cands:
                    o = _tangent(p1, uniq[i][1])
                    if o is None or rev is None:
                        continue
                    ang = float(
                        np.arctan2(np.dot(np.cross(rev, o), p1), np.dot(rev, o))
                    )
                    if ang <= 1e-12:
                        ang += 2.0 * np.pi
                    if best_ang is None or ang < best_ang:
                        best, best_ang = i, ang
                if best is None:
                    raise OverlayError("overlay stitching: no resolvable turn")
                nxt = best
            used[nxt] = True
            cur = nxt
        if len(path) >= 3:
            rings.extend(_split_pinched(path))
    return rings


def _split_pinched(path: List[np.ndarray]) -> List[np.ndarray]:
    """A traced cycle that revisits a vertex (two regions touching at a
    point) splits into simple rings there — S2's polygon layer emits
    separate loops, not pinched figure-eights."""
    seen: Dict[Tuple[int, int, int], int] = {}
    i = 0
    path = list(path)
    while i < len(path):
        k = _Snap.key(path[i])
        if k in seen:
            j = seen[k]
            sub = path[j:i]
            rest = path[:j] + path[i:]
            out = []
            if len(sub) >= 3:
                out.extend(_split_pinched(sub))
            if len(rest) >= 3:
                out.extend(_split_pinched(rest))
            return out
        seen[k] = i
        i += 1
    return [np.array(path)] if len(path) >= 3 else []


def _assemble(rings: List[np.ndarray]) -> List[List[np.ndarray]]:
    """Group CCW shells with their CW holes by containment."""
    shells: List[Tuple[np.ndarray, float]] = []
    holes: List[np.ndarray] = []
    for r in rings:
        sa = gd.ring_signed_area(r)
        if sa >= 0:
            shells.append((r, sa))
        else:
            holes.append(r)
    polys: List[List[np.ndarray]] = [[s] for s, _ in shells]
    for h in holes:
        # representative interior point of the hole: just right of the
        # first edge midpoint (the hole is CW, so its inside — which is
        # shell interior — lies left; the hole's own cavity lies right).
        # For matching we need a point of the cavity: use winding of the
        # hole's first vertex pushed slightly into the cavity. Simpler
        # and robust here: match by any hole vertex being inside the
        # shell (holes never touch different shells in valid input).
        placed = False
        order = sorted(range(len(shells)), key=lambda i: shells[i][1])
        for i in order:
            shell = shells[i][0]
            v = h[0]
            if gd.winding_number(v, shell) == 1 or _ring_touches(v, shell):
                polys[i].append(h)
                placed = True
                break
        if not placed:
            # a hole with no shell: the operation carved a cavity out of
            # the full sphere — not representable; reject loudly
            raise OverlayError("overlay produced a hole without a shell")
    return polys


def _ring_touches(v: np.ndarray, ring: np.ndarray) -> bool:
    nxt = np.roll(ring, -1, axis=0)
    for i in range(len(ring)):
        if float(gd.point_segment_distance(v[None], ring[i], nxt[i])[0]) < EPS:
            return True
    return False


# ---------------------------------------------------------------------------
# polygon x polygon
# ---------------------------------------------------------------------------


def overlay_polygons(
    polys_a: Sequence[Sequence[np.ndarray]],
    polys_b: Sequence[Sequence[np.ndarray]],
    op: str,
) -> List[List[np.ndarray]]:
    """Boolean overlay of two multipolygons (rings as (n,3) xyz);
    polygon output only. See overlay_polygons_full."""
    return overlay_polygons_full(polys_a, polys_b, op)[0]


def overlay_polygons_full(
    polys_a: Sequence[Sequence[np.ndarray]],
    polys_b: Sequence[Sequence[np.ndarray]],
    op: str,
) -> Tuple[List[List[np.ndarray]], List[np.ndarray], List[np.ndarray]]:
    """Boolean overlay of two multipolygons (rings as (n,3) xyz).

    Returns (polygons, degenerate_lines, degenerate_points). Polygons
    are ring lists (shell first, CCW; holes CW). With the reference's
    CLOSED polygon model (global_options.hpp:11-14), an intersection
    that collapses to shared boundary is still part of the result:
    S2BooleanOperation routes those lower-dimensional degeneracies to
    the polyline/point layers, and so do we — shared opposite-interior
    edges come back as lines, isolated boundary touch points as
    points."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown overlay op {op!r}")
    ra = _Region(polys_a)
    rb = _Region(polys_b)
    if not ra.polys or not rb.polys:
        if op == "intersection":
            return [], [], []
        if op == "union":
            return ra.polys + rb.polys, [], []
        return ra.polys, [], []  # difference
    snap = _Snap()
    rings_a = ra.rings()
    rings_b = rb.rings()
    ea = _split_ring_edges(rings_a, rings_b, 0, snap)
    eb = _split_ring_edges(rings_b, rings_a, 1, snap)
    _classify(ea, rb, rings_b)
    _classify(eb, ra, rings_a)
    selected: List[Tuple[np.ndarray, np.ndarray]] = []
    if op == "intersection":
        selected += [(e.p0, e.p1) for e in ea if e.cls == "in"]
        selected += [(e.p0, e.p1) for e in eb if e.cls == "in"]
        selected += [(e.p0, e.p1) for e in ea if e.cls == "bnd" and e.same_dir]
    elif op == "union":
        selected += [(e.p0, e.p1) for e in ea if e.cls == "out"]
        selected += [(e.p0, e.p1) for e in eb if e.cls == "out"]
        selected += [(e.p0, e.p1) for e in ea if e.cls == "bnd" and e.same_dir]
    else:  # difference
        selected += [(e.p0, e.p1) for e in ea if e.cls == "out"]
        selected += [(e.p1, e.p0) for e in eb if e.cls == "in"]
        selected += [(e.p0, e.p1) for e in ea if e.cls == "bnd" and not e.same_dir]
    rings = _stitch(selected)
    rings = [r for r in (_dedupe_ring(x) for x in rings) if len(r) >= 3]
    rings = [r for r in rings if abs(gd.ring_signed_area(r)) > 1e-24]
    polys = _assemble(rings) if rings else []
    if op != "intersection":
        return polys, [], []

    # ---- CLOSED-model degeneracies (intersection only) ----
    # shared edges with interiors on opposite sides: in both closed
    # sets but bounding no common area -> degenerate polylines
    deg_edges = [(e.p0, e.p1) for e in ea if e.cls == "bnd" and not e.same_dir]
    deg_lines = _chain_edges(deg_edges)
    # isolated boundary touch points: snapped vertices present on both
    # boundaries that ended up on no emitted ring or line
    keys_a = {k for e in ea for k in (_Snap.key(e.p0), _Snap.key(e.p1))}
    pts_by_key = {}
    for e in eb:
        for p in (e.p0, e.p1):
            k = _Snap.key(p)
            if k in keys_a:
                pts_by_key.setdefault(k, p)
    covered = set()
    for rings_ in polys:
        for r in rings_:
            covered.update(_Snap.key(v) for v in r)
    for l in deg_lines:
        covered.update(_Snap.key(v) for v in l)
    deg_pts = []
    for k, p in pts_by_key.items():
        if k in covered:
            continue
        # drop touch points interior to (or mid-edge of) the 2D result
        if any(
            gd.winding_number(p, rr[0]) == 1 or _ring_touches(p, rr[0])
            for rr in polys
        ):
            continue
        deg_pts.append(p)
    return polys, deg_lines, deg_pts


def _chain_edges(edges: List[Tuple[np.ndarray, np.ndarray]]) -> List[np.ndarray]:
    """Chain directed sub-edges into maximal polylines (for degenerate
    shared-boundary output). Orientation is normalized so the chain
    direction is deterministic."""
    if not edges:
        return []
    # undirected dedupe
    seen = set()
    uniq = []
    for p0, p1 in edges:
        k = frozenset((_Snap.key(p0), _Snap.key(p1)))
        if k in seen:
            continue
        seen.add(k)
        uniq.append((p0, p1))
    adj: Dict[Tuple[int, int, int], List[int]] = {}
    for i, (p0, p1) in enumerate(uniq):
        adj.setdefault(_Snap.key(p0), []).append(i)
        adj.setdefault(_Snap.key(p1), []).append(i)
    used = [False] * len(uniq)
    lines = []
    for s in range(len(uniq)):
        if used[s]:
            continue
        used[s] = True
        chain = [uniq[s][0], uniq[s][1]]
        # extend forward then backward
        for end in (1, 0):
            while True:
                k = _Snap.key(chain[-1] if end else chain[0])
                nxts = [i for i in adj.get(k, []) if not used[i]]
                if not nxts:
                    break
                i = nxts[0]
                used[i] = True
                p0, p1 = uniq[i]
                tip = chain[-1] if end else chain[0]
                other = p1 if _Snap.key(p0) == _Snap.key(tip) else p0
                if end:
                    chain.append(other)
                else:
                    chain.insert(0, other)
        lines.append(np.array(chain))
    return lines


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    keep = [0]
    for i in range(1, len(ring)):
        if float(np.linalg.norm(ring[i] - ring[keep[-1]])) > EPS:
            keep.append(i)
    if len(keep) > 1 and float(np.linalg.norm(ring[keep[-1]] - ring[keep[0]])) <= EPS:
        keep.pop()
    return ring[keep]


# ---------------------------------------------------------------------------
# polyline x polygon / polyline x polyline
# ---------------------------------------------------------------------------


def clip_polyline_to_region(
    line: np.ndarray,
    polys: Sequence[Sequence[np.ndarray]],
    keep: str,
) -> List[np.ndarray]:
    """Clip one polyline against a polygon region.

    ``keep='inside'`` keeps portions inside or on the boundary (CLOSED
    model); ``keep='outside'`` keeps strictly-outside portions. Returns
    maximal polyline runs (each (n,3))."""
    region = _Region(polys)
    rings = region.rings()
    if len(line) < 2:
        return []
    snap = _Snap()
    sub = _split_ring_edges([_open_as_ring(line)], rings, 0, snap)
    # _split_ring_edges closes the ring; drop the synthetic closing edge
    sub = _drop_closing_edges(sub, line, snap)
    _classify(sub, region, rings)
    want = ("in", "bnd") if keep == "inside" else ("out",)
    runs: List[np.ndarray] = []
    cur: List[np.ndarray] = []
    for e in sub:
        if e.cls in want:
            if cur and float(np.linalg.norm(cur[-1] - e.p0)) > EPS:
                if len(cur) >= 2:
                    runs.append(np.array(cur))
                cur = []
            if not cur:
                cur.append(e.p0)
            cur.append(e.p1)
        else:
            if len(cur) >= 2:
                runs.append(np.array(cur))
            cur = []
    if len(cur) >= 2:
        runs.append(np.array(cur))
    return runs


def _open_as_ring(line: np.ndarray) -> np.ndarray:
    return line


def _drop_closing_edges(sub: List[_SubEdge], line: np.ndarray, snap: _Snap) -> List[_SubEdge]:
    """_split_ring_edges treats input as a closed ring; remove the
    sub-edges that came from the synthetic last->first edge."""
    first = snap.canon(line[0])
    last = snap.canon(line[-1])
    if float(np.linalg.norm(first - last)) < EPS:
        return sub  # genuinely closed
    out: List[_SubEdge] = []
    closing = False
    # sub-edges are emitted in order; the closing edge's pieces are the
    # trailing ones whose chain starts at `last` and ends at `first`
    n = len(sub)
    cut = n
    acc = []
    for i in range(n - 1, -1, -1):
        acc.append(sub[i])
        if float(np.linalg.norm(sub[i].p0 - last)) < EPS:
            # candidate closing chain from `last` ... to `first`
            if float(np.linalg.norm(acc[0].p1 - first)) < EPS:
                cut = i
            break
    return sub[:cut]


def polyline_overlay(
    lines_a: Sequence[np.ndarray], lines_b: Sequence[np.ndarray], op: str
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Line x line overlay. Returns (lines, points).

    intersection: collinear overlapping runs as lines, proper
    crossings as points. union: A plus the parts of B not coincident
    with A. difference: parts of A not coincident with B."""
    snap = _Snap()
    # split each against the other
    def _subs(lines, other_lines):
        other_rings = [l for l in other_lines if len(l) >= 2]
        out = []
        for l in lines:
            if len(l) < 2:
                continue
            se = _split_ring_edges([l], other_rings, 0, snap)
            se = _drop_closing_edges(se, l, snap)
            out.append(se)
        return out

    subs_a = _subs(lines_a, lines_b)
    subs_b = _subs(lines_b, lines_a)

    def _on_other(e: _SubEdge, other_lines) -> bool:
        mid = e.p0 + e.p1
        n = float(np.linalg.norm(mid))
        if n < 1e-12:
            return False
        mid /= n
        for l in other_lines:
            for i in range(len(l) - 1):
                if float(gd.point_segment_distance(mid[None], l[i], l[i + 1])[0]) < EPS:
                    return True
        return False

    lines_out: List[np.ndarray] = []
    pts_out: List[np.ndarray] = []
    if op == "intersection":
        for se in subs_a:
            cur: List[np.ndarray] = []
            for e in se:
                if _on_other(e, lines_b):
                    if cur and float(np.linalg.norm(cur[-1] - e.p0)) > EPS:
                        if len(cur) >= 2:
                            lines_out.append(np.array(cur))
                        cur = []
                    if not cur:
                        cur.append(e.p0)
                    cur.append(e.p1)
                else:
                    if len(cur) >= 2:
                        lines_out.append(np.array(cur))
                    cur = []
            if len(cur) >= 2:
                lines_out.append(np.array(cur))
        # proper crossing points: endpoints of A sub-edges that lie on B
        # but whose adjacent sub-edges are not collinear with B
        covered = lines_out
        for se in subs_a:
            for e in se:
                for p in (e.p0, e.p1):
                    if _pt_on_lines(p, lines_b) and not _pt_on_lines(p, covered):
                        pts_out.append(p)
        # dedupe points
        seen = set()
        uniq_pts = []
        for p in pts_out:
            k = _Snap.key(p)
            if k not in seen:
                seen.add(k)
                uniq_pts.append(p)
        pts_out = uniq_pts
    elif op == "difference":
        for se in subs_a:
            cur = []
            for e in se:
                if not _on_other(e, lines_b):
                    if cur and float(np.linalg.norm(cur[-1] - e.p0)) > EPS:
                        if len(cur) >= 2:
                            lines_out.append(np.array(cur))
                        cur = []
                    if not cur:
                        cur.append(e.p0)
                    cur.append(e.p1)
                else:
                    if len(cur) >= 2:
                        lines_out.append(np.array(cur))
                    cur = []
            if len(cur) >= 2:
                lines_out.append(np.array(cur))
    elif op == "union":
        lines_out.extend(l for l in lines_a if len(l) >= 2)
        for se in subs_b:
            cur = []
            for e in se:
                if not _on_other(e, lines_a):
                    if cur and float(np.linalg.norm(cur[-1] - e.p0)) > EPS:
                        if len(cur) >= 2:
                            lines_out.append(np.array(cur))
                        cur = []
                    if not cur:
                        cur.append(e.p0)
                    cur.append(e.p1)
                else:
                    if len(cur) >= 2:
                        lines_out.append(np.array(cur))
                    cur = []
            if len(cur) >= 2:
                lines_out.append(np.array(cur))
    else:
        raise ValueError(f"unknown overlay op {op!r}")
    return lines_out, pts_out


def _pt_on_lines(p: np.ndarray, lines) -> bool:
    for l in lines:
        for i in range(len(l) - 1):
            if float(gd.point_segment_distance(p[None], l[i], l[i + 1])[0]) < EPS:
                return True
    return False
