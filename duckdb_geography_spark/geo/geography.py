"""Geography value model: WKT/WKB parse & write, tagged binary codec.

The on-column representation is a self-describing tagged binary value
(our own layout, NOT the reference's C++ encoding) with the same three
ingredients the reference's serde carries (SURVEY.md S1.3;
reference: src/include/s2_geography_serde.hpp):

    byte 0      kind (see KIND_* constants)
    byte 1      flags (bit0 = empty)
    bytes 2-3   covering cell count, uint16 LE
    8*n         covering cell ids, uint64 LE
    rest        kind-specific payload (counts + float64 lon/lat pairs)

Like the reference (COMPACT coding hint), a single non-empty POINT is
snapped to its leaf S2 cell center and stored as just the tag +
covering (the cell id) — this reproduces the reference's golden
distances bit-for-bit (e.g. Vancouver-Toronto 3354018.3461295413 m,
test/sql/geography/binary_index_ops.test:169-172, which is the
distance between *leaf-snapped* centers).

Round 6: the snapped single-point encoding additionally retains the
RAW parsed lon/lat (16 bytes after the cell id — decode ignores it
everywhere except the cast-tagged distance path below), and flags
bit1 (FLAG_CAST) marks a value produced by the S2_CELL_CENTER cast
surface (functions/casts.py::s2_snap_to_cell_center). When BOTH
arguments of s2_distance / s2_max_distance carry FLAG_CAST, the
engine reproduces the reference's asymmetric snap(lhs)-vs-raw(rhs)
evaluation and returns its golden 3354018.3501422736
(test/sql/geography/binary_index_ops.test:174-178, 201-205;
root-caused empirically in tests/test_cellmath.py — the two
reference goldens are mutually inconsistent under its current
source, so the asymmetric form is emulated only on the exact cast
shape that publishes it; every other path stays symmetric and
idempotent).
"""

from __future__ import annotations

import math
import re
import struct
from typing import List, Optional

import numpy as np

from ..s2 import cellmath as cm
from . import geodesy as gd

KIND_POINT = 1
KIND_LINESTRING = 2
KIND_POLYGON = 3
KIND_MULTIPOINT = 4
KIND_MULTILINESTRING = 5
KIND_MULTIPOLYGON = 6
KIND_COLLECTION = 7
KIND_CELL_CENTER = 8
KIND_PREPARED = 9

FLAG_EMPTY = 1
# flags bit1 on a CELL_CENTER blob: produced by the S2_CELL_CENTER cast
# surface (s2_snap_to_cell_center) — the shape whose both-sides distance
# goldens the reference publishes asymmetrically.
FLAG_CAST = 2

_KIND_NAMES = {
    KIND_POINT: "POINT",
    KIND_LINESTRING: "LINESTRING",
    KIND_POLYGON: "POLYGON",
    KIND_MULTIPOINT: "MULTIPOINT",
    KIND_MULTILINESTRING: "MULTILINESTRING",
    KIND_MULTIPOLYGON: "MULTIPOLYGON",
    KIND_COLLECTION: "GEOMETRYCOLLECTION",
    KIND_CELL_CENTER: "POINT",
    KIND_PREPARED: "PREPARED",
}


class GeographyError(ValueError):
    pass


class Geography:
    """Decoded geography value. Coordinates are (n,2) lon/lat degrees."""

    __slots__ = ("kind", "points", "lines", "polygons", "geoms", "cell_id", "prepared_size", "_cov", "_parts", "_raw_point", "_raw_tail", "cast_tag")

    def __init__(self, kind, points=None, lines=None, polygons=None, geoms=None,
                 cell_id=None, prepared_size=None):
        self.kind = kind
        self.points = points if points is not None else np.empty((0, 2))
        self.lines: List[np.ndarray] = lines or []
        self.polygons: List[List[np.ndarray]] = polygons or []
        self.geoms: List[Geography] = geoms or []
        self.cell_id = cell_id
        self.prepared_size = prepared_size
        self._cov = None  # memoized default covering
        self._parts = None  # memoized prepared index (geo/ops.parts_of)
        # CELL_CENTER provenance: the pre-snap lon/lat (retained through
        # the codec; consulted ONLY by the both-FLAG_CAST distance path)
        # and the S2_CELL_CENTER-cast marker (flags bit1).
        self._raw_point: Optional[np.ndarray] = None
        self._raw_tail: Optional[bytes] = None  # undecoded 16-byte codec tail
        self.cast_tag: bool = False

    @property
    def raw_point(self) -> Optional[np.ndarray]:
        # Lazy: decode stores the raw 16-byte tail and only this
        # accessor materializes the ndarray. Only the both-FLAG_CAST
        # distance path (geo/ops.py) and the point-rect bounds path
        # ever read it, so the common decode (predicates, coverings,
        # joins) never pays the ~1us np.array construction.
        if self._raw_point is None and self._raw_tail is not None:
            self._raw_point = np.frombuffer(self._raw_tail, dtype=np.float64).copy()
        return self._raw_point

    @raw_point.setter
    def raw_point(self, value) -> None:
        self._raw_point = value
        self._raw_tail = None

    # -- constructors -----------------------------------------------------
    @staticmethod
    def point(lon: float, lat: float) -> "Geography":
        return Geography(KIND_POINT, points=np.array([[lon, lat]], dtype=np.float64))

    @staticmethod
    def cell_center(cell_id: int) -> "Geography":
        return Geography(KIND_CELL_CENTER, cell_id=np.uint64(cell_id))

    @staticmethod
    def empty(kind=KIND_COLLECTION) -> "Geography":
        return Geography(kind)

    # -- basic properties -------------------------------------------------
    def is_empty(self) -> bool:
        k = self.kind
        if k == KIND_CELL_CENTER:
            return not bool(cm.is_valid(np.array([self.cell_id], dtype=np.uint64))[0])
        if k in (KIND_POINT, KIND_MULTIPOINT):
            return len(self.points) == 0
        if k in (KIND_LINESTRING, KIND_MULTILINESTRING):
            return all(len(l) == 0 for l in self.lines)
        if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
            return all(all(len(r) == 0 for r in p) for p in self.polygons)
        if k == KIND_COLLECTION:
            return all(g.is_empty() for g in self.geoms)
        if k == KIND_PREPARED:
            return self.geoms[0].is_empty()
        return True

    def dimension(self) -> int:
        """Max dimension of elements; -1 for an empty collection
        (reference: src/s2_accessors.cpp:411-472)."""
        k = self.kind
        if k in (KIND_POINT, KIND_MULTIPOINT, KIND_CELL_CENTER):
            return 0
        if k in (KIND_LINESTRING, KIND_MULTILINESTRING):
            return 1
        if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
            return 2
        if k == KIND_PREPARED:
            return self.geoms[0].dimension()
        dims = [g.dimension() for g in self.geoms]
        return max(dims) if dims else -1

    def num_points(self) -> int:
        k = self.kind
        if k == KIND_CELL_CENTER:
            return 0 if self.is_empty() else 1
        if k in (KIND_POINT, KIND_MULTIPOINT):
            return len(self.points)
        if k in (KIND_LINESTRING, KIND_MULTILINESTRING):
            return sum(len(l) for l in self.lines)
        if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
            # closing vertex counts like the WKT text shows it
            return sum(len(r) + 1 for p in self.polygons for r in p if len(r))
        if k == KIND_PREPARED:
            return self.geoms[0].num_points()
        return sum(g.num_points() for g in self.geoms)

    # -- coordinate access ------------------------------------------------
    def single_point(self) -> Optional[np.ndarray]:
        """lon/lat of the single point, or None (empty/multi raises for >1)."""
        if self.kind == KIND_CELL_CENTER:
            if self.is_empty():
                return None
            lon, lat = cm.cellid_to_lonlat(np.array([self.cell_id], dtype=np.uint64))
            return np.array([lon[0], lat[0]])
        pts = self.all_points()
        if len(pts) == 1:
            return pts[0]
        return None

    def all_points(self) -> np.ndarray:
        """All point-dimension coordinates as (n,2)."""
        k = self.kind
        if k == KIND_CELL_CENTER:
            if self.is_empty():
                return np.empty((0, 2))
            lon, lat = cm.cellid_to_lonlat(np.array([self.cell_id], dtype=np.uint64))
            return np.stack([lon, lat], axis=1)
        if k in (KIND_POINT, KIND_MULTIPOINT):
            return self.points
        if k == KIND_COLLECTION:
            parts = [g.all_points() for g in self.geoms]
            return np.concatenate(parts) if parts else np.empty((0, 2))
        if k == KIND_PREPARED:
            return self.geoms[0].all_points()
        return np.empty((0, 2))

    def points_xyz(self) -> np.ndarray:
        """Unit vectors of point components. Cell centers convert via
        exact center si/ti (no lon/lat roundtrip), preserving the
        reference's bit-exact snapped distances."""
        k = self.kind
        if k == KIND_CELL_CENTER:
            if self.is_empty():
                return np.empty((0, 3))
            x, y, z = cm.cellid_to_center_xyz(np.array([self.cell_id], dtype=np.uint64))
            return np.stack([x, y, z], axis=1)
        if k == KIND_COLLECTION:
            parts = [g.points_xyz() for g in self.geoms]
            parts = [p for p in parts if len(p)]
            return np.concatenate(parts) if parts else np.empty((0, 3))
        if k == KIND_PREPARED:
            return self.geoms[0].points_xyz()
        pts = self.all_points()
        return gd.lonlat_deg_to_xyz(pts) if len(pts) else np.empty((0, 3))

    def all_lines(self) -> List[np.ndarray]:
        k = self.kind
        if k in (KIND_LINESTRING, KIND_MULTILINESTRING):
            return [l for l in self.lines if len(l)]
        if k == KIND_COLLECTION:
            return [l for g in self.geoms for l in g.all_lines()]
        if k == KIND_PREPARED:
            return self.geoms[0].all_lines()
        return []

    def all_polygons(self) -> List[List[np.ndarray]]:
        k = self.kind
        if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
            return [p for p in self.polygons if p and len(p[0])]
        if k == KIND_COLLECTION:
            return [p for g in self.geoms for p in g.all_polygons()]
        if k == KIND_PREPARED:
            return self.geoms[0].all_polygons()
        return []

    def first_point(self) -> Optional[np.ndarray]:
        """First coordinate of any element (for s2_arbitrarycellfromwkb)."""
        k = self.kind
        pts = self.all_points()
        if len(pts):
            return pts[0]
        for l in self.all_lines():
            if len(l):
                return l[0]
        for p in self.all_polygons():
            if p and len(p[0]):
                return p[0][0]
        return None

    # -- encoding ---------------------------------------------------------
    def encode(self, with_covering: bool = True, max_cells: int = 8) -> bytes:
        from ..s2.coverer import covering_of_geography

        kind = self.kind
        # compact single point -> cell center (like the reference's
        # COMPACT hint, src/s2_cell_ops.cpp:521-550 reads this form)
        if kind == KIND_POINT and len(self.points) == 1:
            cid = cm.lonlat_to_cellid(self.points[:, 0], self.points[:, 1])[0]
            g = Geography.cell_center(cid)
            # retain the pre-snap coordinates (16 extra bytes; decode
            # ignores them outside the both-FLAG_CAST distance path)
            g.raw_point = np.array(self.points[0], dtype=np.float64)
            g.cast_tag = self.cast_tag
            return g.encode()
        if kind == KIND_CELL_CENTER:
            empty = self.is_empty()
            if empty:
                return struct.pack("<BBH", KIND_POINT, FLAG_EMPTY, 0)
            flags = FLAG_CAST if self.cast_tag else 0
            head = struct.pack("<BBH", KIND_CELL_CENTER, flags, 1) + struct.pack("<Q", int(self.cell_id))
            if self._raw_tail is not None:
                head += self._raw_tail  # re-encode the undecoded tail verbatim
            elif self._raw_point is not None:
                head += struct.pack("<dd", float(self._raw_point[0]), float(self._raw_point[1]))
            return head
        empty = self.is_empty()
        flags = FLAG_EMPTY if empty else 0
        cov = b""
        ncov = 0
        if with_covering and not empty:
            cells = covering_of_geography(self, max_cells=max_cells)
            ncov = len(cells)
            cov = np.asarray(cells, dtype=np.uint64).tobytes()
        head = struct.pack("<BBH", kind, flags, ncov) + cov
        body = self._encode_body()
        return head + body

    def _encode_body(self) -> bytes:
        k = self.kind
        out = []
        if k in (KIND_POINT, KIND_MULTIPOINT):
            out.append(struct.pack("<I", len(self.points)))
            out.append(np.ascontiguousarray(self.points, dtype=np.float64).tobytes())
        elif k in (KIND_LINESTRING, KIND_MULTILINESTRING):
            out.append(struct.pack("<I", len(self.lines)))
            for l in self.lines:
                out.append(struct.pack("<I", len(l)))
                out.append(np.ascontiguousarray(l, dtype=np.float64).tobytes())
        elif k in (KIND_POLYGON, KIND_MULTIPOLYGON):
            out.append(struct.pack("<I", len(self.polygons)))
            for rings in self.polygons:
                out.append(struct.pack("<I", len(rings)))
                for r in rings:
                    out.append(struct.pack("<I", len(r)))
                    out.append(np.ascontiguousarray(r, dtype=np.float64).tobytes())
        elif k == KIND_COLLECTION:
            out.append(struct.pack("<I", len(self.geoms)))
            for g in self.geoms:
                enc = g.encode(with_covering=False)
                out.append(struct.pack("<I", len(enc)))
                out.append(enc)
        elif k == KIND_PREPARED:
            enc = self.geoms[0].encode(with_covering=True)
            out.append(struct.pack("<I", len(enc)))
            out.append(enc)
            # serialized prepared index (the reference serializes an
            # S2ShapeIndexGeography here, src/s2_functions_io.cpp:
            # 365-385): ship the precomputed unit-vector shapes, ring
            # orientations and bounding caps so decode restores the
            # probe-ready index without recomputation
            out.append(_encode_prepared_index(self.geoms[0]))
        return b"".join(out)

    @staticmethod
    def decode(buf: bytes) -> "Geography":
        kind, flags, ncov = struct.unpack_from("<BBH", buf, 0)
        if not (KIND_POINT <= kind <= KIND_PREPARED):
            # validate BEFORE the empty-flag short circuit: a garbage
            # buffer with bit0 of byte 1 set must not decode silently
            raise GeographyError(f"unknown geography kind {kind}")
        off = 4 + 8 * ncov
        if kind == KIND_CELL_CENTER:
            if flags & FLAG_EMPTY or ncov == 0:
                return Geography(KIND_POINT)
            (cid,) = struct.unpack_from("<Q", buf, 4)
            g = Geography.cell_center(cid)
            if len(buf) >= 28:  # trailing pre-snap lon/lat (parsed lazily)
                g._raw_tail = bytes(buf[12:28])
            g.cast_tag = bool(flags & FLAG_CAST)
            return g
        if flags & FLAG_EMPTY:
            g = Geography(kind)
            return g
        g = Geography._decode_body(kind, buf, off)
        if ncov:
            # the embedded covering rides with the value — restore it so
            # predicates never recompute it (SURVEY.md S4.2 #2)
            g._cov = np.frombuffer(buf, dtype="<u8", count=ncov, offset=4).astype(np.uint64)
        return g

    @staticmethod
    def _decode_body(kind: int, buf: bytes, off: int) -> "Geography":
        def read_u32():
            nonlocal off
            (v,) = struct.unpack_from("<I", buf, off)
            off += 4
            return v

        def read_coords(n):
            nonlocal off
            arr = np.frombuffer(buf, dtype=np.float64, count=2 * n, offset=off).reshape(n, 2)
            off += 16 * n
            return arr

        if kind in (KIND_POINT, KIND_MULTIPOINT):
            n = read_u32()
            return Geography(kind, points=read_coords(n))
        if kind in (KIND_LINESTRING, KIND_MULTILINESTRING):
            nlines = read_u32()
            lines = [read_coords(read_u32()) for _ in range(nlines)]
            return Geography(kind, lines=lines)
        if kind in (KIND_POLYGON, KIND_MULTIPOLYGON):
            npolys = read_u32()
            polys = []
            for _ in range(npolys):
                nrings = read_u32()
                polys.append([read_coords(read_u32()) for _ in range(nrings)])
            return Geography(kind, polygons=polys)
        if kind == KIND_COLLECTION:
            n = read_u32()
            geoms = []
            for _ in range(n):
                ln = read_u32()
                geoms.append(Geography.decode(buf[off : off + ln]))
                off += ln
            return Geography(KIND_COLLECTION, geoms=geoms)
        if kind == KIND_PREPARED:
            ln = read_u32()
            inner = Geography.decode(buf[off : off + ln])
            off += ln
            _decode_prepared_index(inner, buf, off)
            return Geography(KIND_PREPARED, geoms=[inner], prepared_size=ln)
        raise GeographyError(f"unknown geography kind {kind}")

    # -- text output ------------------------------------------------------
    def to_wkt(self, precision: Optional[int] = None) -> str:
        """WKT text. ``precision=None`` = lossless shortest round-trip
        (s2_astext); an int = fixed decimals with trailing zeros
        stripped (s2_format, matching the reference's goldens, e.g.
        test/sql/geography/functions_io.test:9-12)."""
        if self.kind == KIND_PREPARED:
            return f"<S2ShapeIndex {self.prepared_size or len(self.geoms[0].encode())} b>"
        return _wkt_write(self, precision)

    def __repr__(self):
        try:
            return f"Geography<{self.to_wkt(6)}>"
        except Exception:
            return f"Geography<kind={self.kind}>"


# ---------------------------------------------------------------------------
# WKT writing
# ---------------------------------------------------------------------------


def _fmt_num(v: float, precision: Optional[int]) -> str:
    if precision is None:
        s = repr(float(v))
        if s.endswith(".0"):
            s = s[:-2]
        return s
    s = f"{v:.{precision}f}"
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    if s in ("-0", ""):
        s = "0"
    return s


def _fmt_coords(arr: np.ndarray, precision) -> str:
    return ", ".join(f"{_fmt_num(p[0], precision)} {_fmt_num(p[1], precision)}" for p in arr)


def _wkt_write(g: Geography, precision) -> str:
    k = g.kind
    if k == KIND_CELL_CENTER:
        if g.is_empty():
            return "POINT EMPTY"
        p = g.single_point()
        return f"POINT ({_fmt_num(p[0], precision)} {_fmt_num(p[1], precision)})"
    if k == KIND_POINT:
        if len(g.points) == 0:
            return "POINT EMPTY"
        return f"POINT ({_fmt_coords(g.points, precision)})"
    if k == KIND_MULTIPOINT:
        if len(g.points) == 0:
            return "MULTIPOINT EMPTY"
        inner = ", ".join(
            f"({_fmt_num(p[0], precision)} {_fmt_num(p[1], precision)})" for p in g.points
        )
        return f"MULTIPOINT ({inner})"
    if k == KIND_LINESTRING:
        if not g.lines or len(g.lines[0]) == 0:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_fmt_coords(g.lines[0], precision)})"
    if k == KIND_MULTILINESTRING:
        lines = [l for l in g.lines if len(l)]
        if not lines:
            return "MULTILINESTRING EMPTY"
        inner = ", ".join(f"({_fmt_coords(l, precision)})" for l in lines)
        return f"MULTILINESTRING ({inner})"
    if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
        polys = [p for p in g.polygons if p and len(p[0])]
        if not polys:
            return f"{_KIND_NAMES[k]} EMPTY"

        def ring_txt(r):
            closed = np.vstack([r, r[:1]]) if len(r) and not np.array_equal(r[0], r[-1]) else r
            return f"({_fmt_coords(closed, precision)})"

        if k == KIND_POLYGON:
            return f"POLYGON ({', '.join(ring_txt(r) for r in polys[0])})"
        inner = ", ".join(f"({', '.join(ring_txt(r) for r in p)})" for p in polys)
        return f"MULTIPOLYGON ({inner})"
    if k == KIND_COLLECTION:
        if not g.geoms:
            return "GEOMETRYCOLLECTION EMPTY"
        inner = ", ".join(_wkt_write(x, precision) for x in g.geoms)
        return f"GEOMETRYCOLLECTION ({inner})"
    raise GeographyError(f"cannot write kind {k}")


# ---------------------------------------------------------------------------
# WKT parsing
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _WktParser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def next(self):
        m = _TOKEN_RE.match(self.text, self.pos)
        if not m:
            return None
        self.pos = m.end()
        return m.group(1)

    def peek(self):
        m = _TOKEN_RE.match(self.text, self.pos)
        return m.group(1) if m else None

    def expect(self, tok):
        t = self.next()
        if t != tok:
            raise GeographyError(f"WKT parse error: expected {tok!r} got {t!r} in {self.text!r}")

    def parse(self) -> Geography:
        g = self.parse_geometry()
        trailing = self.next()
        if trailing is not None:
            raise GeographyError(f"WKT parse error: trailing {trailing!r}")
        return g

    def parse_geometry(self) -> Geography:
        t = self.next()
        if t is None:
            raise GeographyError("WKT parse error: empty input")
        typ = t.upper()
        if typ == "POINT":
            coords = self.coords_or_empty(single=True)
            return Geography(KIND_POINT, points=coords)
        if typ == "MULTIPOINT":
            coords = self.multipoint_coords()
            return Geography(KIND_MULTIPOINT, points=coords)
        if typ == "LINESTRING":
            coords = self.coords_or_empty()
            return Geography(KIND_LINESTRING, lines=[coords] if len(coords) else [])
        if typ == "MULTILINESTRING":
            if self.is_empty_token():
                return Geography(KIND_MULTILINESTRING)
            self.expect("(")
            lines = []
            while True:
                lines.append(self.coord_list())
                t = self.next()
                if t == ")":
                    break
                if t != ",":
                    raise GeographyError(f"WKT parse error near {t!r}")
            return Geography(KIND_MULTILINESTRING, lines=lines)
        if typ == "POLYGON":
            if self.is_empty_token():
                return Geography(KIND_POLYGON)
            return Geography(KIND_POLYGON, polygons=[self.rings()])
        if typ == "MULTIPOLYGON":
            if self.is_empty_token():
                return Geography(KIND_MULTIPOLYGON)
            self.expect("(")
            polys = []
            while True:
                polys.append(self.rings())
                t = self.next()
                if t == ")":
                    break
                if t != ",":
                    raise GeographyError(f"WKT parse error near {t!r}")
            return Geography(KIND_MULTIPOLYGON, polygons=polys)
        if typ == "GEOMETRYCOLLECTION":
            if self.is_empty_token():
                return Geography(KIND_COLLECTION)
            self.expect("(")
            geoms = []
            while True:
                geoms.append(self.parse_geometry())
                t = self.next()
                if t == ")":
                    break
                if t != ",":
                    raise GeographyError(f"WKT parse error near {t!r}")
            return Geography(KIND_COLLECTION, geoms=geoms)
        raise GeographyError(f"WKT parse error: unknown type {t!r}")

    def rings(self) -> List[np.ndarray]:
        self.expect("(")
        rings = []
        while True:
            rings.append(self.coord_list())
            t = self.next()
            if t == ")":
                break
            if t != ",":
                raise GeographyError(f"WKT parse error near {t!r}")
        return rings

    def is_empty_token(self) -> bool:
        if self.peek() and self.peek().upper() == "EMPTY":
            self.next()
            return True
        return False

    def coords_or_empty(self, single=False) -> np.ndarray:
        if self.is_empty_token():
            return np.empty((0, 2))
        arr = self.coord_list()
        if single and len(arr) != 1:
            raise GeographyError("WKT parse error: POINT takes one coordinate")
        return arr

    def coord_list(self) -> np.ndarray:
        self.expect("(")
        pts = []
        while True:
            pts.append(self.coord())
            t = self.next()
            if t == ")":
                break
            if t != ",":
                raise GeographyError(f"WKT parse error near {t!r}")
        return np.array(pts, dtype=np.float64)

    def coord(self):
        x = self.num()
        y = self.num()
        if self.peek() not in (",", ")", None):
            raise GeographyError("WKT parse error: only 2D coordinates supported")
        return (x, y)

    def num(self) -> float:
        t = self.next()
        try:
            return float(t)
        except (TypeError, ValueError):
            raise GeographyError(f"WKT parse error: expected number, got {t!r}") from None

    def multipoint_coords(self) -> np.ndarray:
        if self.is_empty_token():
            return np.empty((0, 2))
        self.expect("(")
        pts = []
        while True:
            if self.peek() == "(":  # nested style: ((0 1), (2 3))
                self.expect("(")
                pts.append(self.coord())
                self.expect(")")
            else:
                pts.append(self.coord())
            t = self.next()
            if t == ")":
                break
            if t != ",":
                raise GeographyError(f"WKT parse error near {t!r}")
        return np.array(pts, dtype=np.float64)


#: v2: struct+float64 framing (v1 was pickle — removed: pickle.loads on
#: column bytes is an arbitrary-code-execution vector)
_PREPARED_INDEX_VERSION = 2


def _encode_prepared_index(inner: "Geography") -> bytes:
    """Serialize the prepared probe index of ``inner``: unit-vector
    points/lines/rings, per-ring orientations, per-shell bounding
    caps. Mirrors the reference's serialized S2ShapeIndex role
    (src/s2_functions_io.cpp:365-385) in numpy terms."""
    from . import ops as _ops

    parts = _ops.parts_of(inner)

    def arr(a) -> bytes:
        a = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 3)
        return struct.pack("<I", a.shape[0]) + a.tobytes()

    out = [struct.pack("<I", _PREPARED_INDEX_VERSION)]
    out.append(arr(parts.points if len(parts.points) else np.empty((0, 3))))
    out.append(struct.pack("<I", len(parts.lines)))
    for l in parts.lines:
        out.append(arr(l))
    out.append(struct.pack("<I", len(parts.polygons)))
    for rings, orients, cap in zip(parts.polygons, parts._orients, parts._caps):
        out.append(struct.pack("<I", len(rings)))
        for r, o in zip(rings, orients):
            out.append(arr(r))
            out.append(struct.pack("<i", int(o)))
        if cap is None:
            out.append(struct.pack("<B", 0))
        else:
            cx, cr = cap
            out.append(
                struct.pack("<B", 1)
                + np.ascontiguousarray(cx, dtype=np.float64).tobytes()
                + struct.pack("<d", float(cr))
            )
    payload = b"".join(out)
    return struct.pack("<I", len(payload)) + payload


def _decode_prepared_index(inner: "Geography", buf: bytes, off: int) -> None:
    """Restore the serialized probe index onto ``inner`` (no-op for
    unknown versions or malformed payloads). The format is plain
    struct + float64 arrays — deliberately NOT pickle, which would
    execute attacker-controlled callables from untrusted column bytes.
    """
    if off + 4 > len(buf):
        return
    (ln,) = struct.unpack_from("<I", buf, off)
    off += 4
    if ln == 0 or off + ln > len(buf):
        return
    from . import ops as _ops

    end = off + ln
    try:
        (ver,) = struct.unpack_from("<I", buf, off)
        if ver != _PREPARED_INDEX_VERSION:
            return
        pos = off + 4

        def scalar(fmt: str, size: int):
            # Every read — scalar or array — must stay inside the declared
            # payload [off, end); a crafted length prefix must not let us
            # silently consume adjacent column bytes as index data.
            nonlocal pos
            if pos + size > end:
                raise ValueError("truncated prepared index")
            v = struct.unpack_from(fmt, buf, pos)[0]
            pos += size
            return v

        def arr():
            nonlocal pos
            n = scalar("<I", 4)
            nbytes = n * 24
            if pos + nbytes > end:
                raise ValueError("truncated prepared index")
            a = np.frombuffer(buf, dtype="<f8", count=n * 3, offset=pos).reshape(n, 3)
            pos += nbytes
            return a.copy()

        points = arr()
        nlines = scalar("<I", 4)
        lines = [arr() for _ in range(nlines)]
        npolys = scalar("<I", 4)
        polygons, orients, caps = [], [], []
        for _ in range(npolys):
            nrings = scalar("<I", 4)
            rings, ros = [], []
            for _ in range(nrings):
                rings.append(arr())
                ros.append(scalar("<i", 4))
            has_cap = scalar("<B", 1)
            if has_cap:
                if pos + 24 > end:
                    raise ValueError("truncated prepared index")
                cx = np.frombuffer(buf, dtype="<f8", count=3, offset=pos).copy()
                pos += 24
                cr = scalar("<d", 8)
                caps.append((cx, cr))
            else:
                caps.append(None)
            polygons.append(rings)
            orients.append(ros)
        if pos != end:
            # Trailing garbage means the payload wasn't what the length
            # prefix claimed — reject rather than build a wrong index.
            raise ValueError("prepared index length mismatch")
    except Exception:
        return
    parts = _ops._Parts.__new__(_ops._Parts)
    parts.g = inner
    parts.points = points
    parts.lines = lines
    parts.polygons = polygons
    parts._orients = orients
    parts._caps = caps
    parts._edge_arrs = False  # lazily built by edge_arrays()
    inner._parts = parts


def from_wkt(text: str, validate: bool = True) -> Geography:
    """Parse WKT to a Geography (reference: s2_geogfromtext,
    src/s2_functions_io.cpp:22-101). Ring closing vertices are dropped
    internally; validation mirrors the reference's S2 error messages
    where tests pin them."""
    g = _WktParser(text.strip()).parse()
    g = _normalize_rings(g)
    if validate:
        err = validation_error(g)
        if err:
            raise GeographyError(err)
    return g


def _normalize_rings(g: Geography) -> Geography:
    if g.kind in (KIND_POLYGON, KIND_MULTIPOLYGON):
        for rings in g.polygons:
            for i, r in enumerate(rings):
                if len(r) >= 2 and np.array_equal(r[0], r[-1]):
                    rings[i] = r[:-1]
    elif g.kind == KIND_COLLECTION:
        for sub in g.geoms:
            _normalize_rings(sub)
    return g


def validation_error(g: Geography) -> Optional[str]:
    """S2-style validation; returns message or None.

    Pin: duplicate adjacent polyline vertices produce
    'Vertices %d and %d are identical' (accessors.test:33-40).
    """
    k = g.kind
    if k in (KIND_LINESTRING, KIND_MULTILINESTRING):
        for l in g.lines:
            for i in range(len(l) - 1):
                if l[i][0] == l[i + 1][0] and l[i][1] == l[i + 1][1]:
                    return f"Vertices {i} and {i + 1} are identical"
    if k in (KIND_POLYGON, KIND_MULTIPOLYGON):
        for rings in g.polygons:
            for r in rings:
                if len(r) and len(r) < 3:
                    return "Loop with fewer than 3 vertices"
                for i in range(len(r)):
                    j = (i + 1) % len(r)
                    if r[i][0] == r[j][0] and r[i][1] == r[j][1]:
                        return f"Vertices {i} and {j} are identical"
            # hole nesting: every hole must sit inside its shell
            # (s2geometry's polygon validation rejects bad nesting;
            # message wording here is ours — the reference defers to
            # s2's FindValidationError). Cheap test: one representative
            # hole vertex via ring_contains_point, which compares the
            # winding number against the ring ORIENTATION — a bare
            # `winding != 0` would misclassify the antipodal mirror
            # region (see geodesy.ring_orientation). Only runs for
            # polygons that actually have holes.
            if len(rings) > 1 and len(rings[0]) >= 3:
                shell = gd.lonlat_deg_to_xyz(rings[0])
                for hi, hole in enumerate(rings[1:], start=1):
                    if len(hole) < 3:
                        continue
                    v = gd.lonlat_deg_to_xyz(hole[:1])[0]
                    # the extra 1e-12 edge-distance band keeps hole
                    # vertices that sit ON the shell boundary within
                    # floating-point noise valid (winding_number is
                    # unstable that close to the arc)
                    if not gd.ring_contains_point(shell, v) and (
                        gd.min_distance_point_to_ring_edges(v, shell) > 1e-12
                    ):
                        return f"Hole {hi} is not contained in its shell"
    if k == KIND_COLLECTION:
        for sub in g.geoms:
            err = validation_error(sub)
            if err:
                return err
    return None


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_COLLECTION = 7

_KIND_TO_WKB = {
    KIND_POINT: _WKB_POINT,
    KIND_CELL_CENTER: _WKB_POINT,
    KIND_LINESTRING: _WKB_LINESTRING,
    KIND_POLYGON: _WKB_POLYGON,
    KIND_MULTIPOINT: _WKB_MULTIPOINT,
    KIND_MULTILINESTRING: _WKB_MULTILINESTRING,
    KIND_MULTIPOLYGON: _WKB_MULTIPOLYGON,
    KIND_COLLECTION: _WKB_COLLECTION,
}


def to_wkb(g: Geography) -> bytes:
    """Little-endian ISO WKB (2D). POINT EMPTY -> NaN coords (standard)."""
    k = g.kind
    if k == KIND_PREPARED:
        return to_wkb(g.geoms[0])
    out = [struct.pack("<BI", 1, _KIND_TO_WKB[k])]
    if k in (KIND_POINT, KIND_CELL_CENTER):
        p = g.single_point()
        if p is None:
            out.append(struct.pack("<dd", math.nan, math.nan))
        else:
            out.append(struct.pack("<dd", p[0], p[1]))
    elif k == KIND_MULTIPOINT:
        out.append(struct.pack("<I", len(g.points)))
        for p in g.points:
            out.append(struct.pack("<BIdd", 1, _WKB_POINT, p[0], p[1]))
    elif k == KIND_LINESTRING:
        line = g.lines[0] if g.lines else np.empty((0, 2))
        out.append(struct.pack("<I", len(line)))
        out.append(np.ascontiguousarray(line, dtype="<f8").tobytes())
    elif k == KIND_MULTILINESTRING:
        out.append(struct.pack("<I", len(g.lines)))
        for l in g.lines:
            out.append(struct.pack("<BII", 1, _WKB_LINESTRING, len(l)))
            out.append(np.ascontiguousarray(l, dtype="<f8").tobytes())
    elif k in (KIND_POLYGON, KIND_MULTIPOLYGON):

        def poly_bytes(rings):
            chunks = [struct.pack("<I", len(rings))]
            for r in rings:
                closed = np.vstack([r, r[:1]]) if len(r) else r
                chunks.append(struct.pack("<I", len(closed)))
                chunks.append(np.ascontiguousarray(closed, dtype="<f8").tobytes())
            return b"".join(chunks)

        if k == KIND_POLYGON:
            out.append(poly_bytes(g.polygons[0] if g.polygons else []))
        else:
            out.append(struct.pack("<I", len(g.polygons)))
            for rings in g.polygons:
                out.append(struct.pack("<BI", 1, _WKB_POLYGON))
                out.append(poly_bytes(rings))
    elif k == KIND_COLLECTION:
        out.append(struct.pack("<I", len(g.geoms)))
        for sub in g.geoms:
            out.append(to_wkb(sub))
    return b"".join(out)


def from_wkb(buf: bytes, validate: bool = True) -> Geography:
    """Parse (E)WKB: both byte orders, EWKB SRID/Z/M flags tolerated
    (Z/M rejected like the reference's visitor,
    src/s2_cell_ops.cpp:310-461)."""
    g, _ = _parse_wkb(buf, 0)
    g = _normalize_rings(g)
    if validate:
        err = validation_error(g)
        if err:
            raise GeographyError(err)
    return g


def _parse_wkb(buf: bytes, off: int):
    (order,) = struct.unpack_from("<B", buf, off)
    off += 1
    e = "<" if order == 1 else ">"
    (raw_type,) = struct.unpack_from(e + "I", buf, off)
    off += 4
    if raw_type & 0x20000000:  # EWKB SRID flag
        off += 4
    if raw_type & 0x80000000 or raw_type & 0x40000000:  # EWKB Z / M flags
        raise GeographyError("Z/M coordinates are not supported")
    base = raw_type & 0x1FFFFFFF
    if base >= 1000:  # ISO Z (1xxx) / M (2xxx) / ZM (3xxx)
        raise GeographyError("Z/M coordinates are not supported")
    typ = base

    def read_u32():
        nonlocal off
        (v,) = struct.unpack_from(e + "I", buf, off)
        off += 4
        return v

    def read_pts(n):
        nonlocal off
        arr = np.frombuffer(buf, dtype=e + "f8", count=2 * n, offset=off).reshape(n, 2).astype(np.float64)
        off += 16 * n
        return arr

    if typ == _WKB_POINT:
        pts = read_pts(1)
        if np.isnan(pts).all():
            return Geography(KIND_POINT), off
        return Geography(KIND_POINT, points=pts), off
    if typ == _WKB_LINESTRING:
        n = read_u32()
        return Geography(KIND_LINESTRING, lines=[read_pts(n)] if n else []), off
    if typ == _WKB_POLYGON:
        nrings = read_u32()
        rings = [read_pts(read_u32()) for _ in range(nrings)]
        return Geography(KIND_POLYGON, polygons=[rings] if rings else []), off
    if typ == _WKB_MULTIPOINT:
        n = read_u32()
        pts = []
        for _ in range(n):
            sub, off = _parse_wkb(buf, off)
            if len(sub.points):
                pts.append(sub.points[0])
        return Geography(KIND_MULTIPOINT, points=np.array(pts) if pts else np.empty((0, 2))), off
    if typ == _WKB_MULTILINESTRING:
        n = read_u32()
        lines = []
        for _ in range(n):
            sub, off = _parse_wkb(buf, off)
            lines.extend(sub.lines)
        return Geography(KIND_MULTILINESTRING, lines=lines), off
    if typ == _WKB_MULTIPOLYGON:
        n = read_u32()
        polys = []
        for _ in range(n):
            sub, off = _parse_wkb(buf, off)
            polys.extend(sub.polygons)
        return Geography(KIND_MULTIPOLYGON, polygons=polys), off
    if typ == _WKB_COLLECTION:
        n = read_u32()
        geoms = []
        for _ in range(n):
            sub, off = _parse_wkb(buf, off)
            geoms.append(sub)
        return Geography(KIND_COLLECTION, geoms=geoms), off
    raise GeographyError(f"unsupported WKB type {raw_type}")
