"""Deterministic geo-augmentation of the driver's synthetic tables
(FIXTURES.md S7) with *paired* Spark-Column and DuckDB-SQL
definitions.

Every derivation here exists twice — as a Spark Column expression and
as a SQL fragment — with bit-identical double semantics, so the
driver's DuckDB oracle can verify geography queries end-to-end. Keep
the two in sync; tests assert equality row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# multipliers are arbitrary odd constants; integer modular arithmetic
# is exact in both engines, and x/1000.0 rounds identically (IEEE754)

# -- continuous lon/lat points per customer/supplier ----------------------


def cust_lon(col="c_custkey") -> Column:
    return (F.col(col) * 2654435761 % 360000) / 1000.0 - 180.0


def cust_lat(col="c_custkey") -> Column:
    return (F.col(col) * 40503 % 180000) / 1000.0 - 90.0


CUST_LON_SQL = "(c_custkey * 2654435761 % 360000) / 1000.0 - 180.0"
CUST_LAT_SQL = "(c_custkey * 40503 % 180000) / 1000.0 - 90.0"


def supp_lon(col="s_suppkey") -> Column:
    return (F.col(col) * 1327217885 % 360000) / 1000.0 - 180.0


def supp_lat(col="s_suppkey") -> Column:
    return (F.col(col) * 20261 % 180000) / 1000.0 - 90.0


SUPP_LON_SQL = "(s_suppkey * 1327217885 % 360000) / 1000.0 - 180.0"
SUPP_LAT_SQL = "(s_suppkey * 20261 % 180000) / 1000.0 - 90.0"

# -- integer lon/lat (snap-proof: cell-center snapping moves a point by
#    <2e-7 degrees, so 6-decimal formatting always recovers the integer)


def cust_ilon(col="c_custkey") -> Column:
    # range [-179, 179]: +-180 is excluded because a snapped cell
    # center can land on either side of the antimeridian
    return (F.col(col) * 7 % 359 - 179).cast("int")


def cust_ilat(col="c_custkey") -> Column:
    return (F.col(col) * 11 % 160 - 80).cast("int")


CUST_ILON_SQL = "CAST(c_custkey * 7 % 359 - 179 AS INTEGER)"
CUST_ILAT_SQL = "CAST(c_custkey * 11 % 160 - 80 AS INTEGER)"

# -- nation rectangles: a 6x5 grid of 55-deg x 25-deg boxes ---------------


def nation_box(col="n_nationkey"):
    """(xmin, ymin, xmax, ymax) Columns for a nation's rectangle."""
    xmin = (F.col(col) % 6) * 60.0 - 180.0
    ymin = F.floor(F.col(col) / 6) * 30.0 - 60.0
    return xmin, ymin, xmin + 55.0, ymin + 25.0


NATION_XMIN_SQL = "(n_nationkey % 6) * 60.0 - 180.0"
NATION_YMIN_SQL = "floor(n_nationkey / 6) * 30.0 - 60.0"
NATION_XMAX_SQL = f"({NATION_XMIN_SQL}) + 55.0"
NATION_YMAX_SQL = f"({NATION_YMIN_SQL}) + 25.0"


def nation_wkt(col="n_nationkey") -> Column:
    """Rectangle polygon WKT per nation (integer-valued corners)."""
    xmin, ymin, xmax, ymax = nation_box(col)
    return F.format_string(
        "POLYGON ((%.0f %.0f, %.0f %.0f, %.0f %.0f, %.0f %.0f, %.0f %.0f))",
        xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin,
    )


# -- synthetic-but-valid cell ids from integer keys (pure arithmetic, so
#    the oracle can build the identical 64-bit pattern in SQL HUGEINT)


def key_cell(col) -> Column:
    """A valid leaf cell id derived from an integer key: face = key%6,
    position = key*2654435761 mod 2^60. Wraps to signed like Spark
    longs do natively."""
    face = F.col(col) % 6
    pos = (F.col(col) * 2654435761) % F.lit(1 << 60)
    return F.call_function("shiftleft", face.cast("long"), F.lit(61)) + pos * 2 + 1


def key_cell_sql_expr(key_expr: str) -> str:
    """key_cell as a single scalar SQL expression (no subquery)."""
    h = (
        f"(CAST(({key_expr}) % 6 AS HUGEINT) * 2305843009213693952"
        f" + (CAST(({key_expr}) AS HUGEINT) * 2654435761 % 1152921504606846976) * 2 + 1)"
    )
    return (
        f"CAST(CASE WHEN {h} >= CAST(9223372036854775808 AS HUGEINT) "
        f"THEN {h} - CAST(18446744073709551616 AS HUGEINT) ELSE {h} END AS BIGINT)"
    )


def out_replace_token(text: str, name: str, new: str) -> str:
    """Whole-word CTE rename (avoids e.g. 'st' matching inside 'cast')."""
    import re

    return re.sub(rf"\b{name}\b", new, text)


# -- SQL twins of the pure-Column cell bit ops (for oracle queries) -------

def _uns(e: str) -> str:
    """signed BIGINT expr -> unsigned HUGEINT."""
    return f"(CAST({e} AS HUGEINT) + CASE WHEN {e} < 0 THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END)"


def _sgn(e: str) -> str:
    """unsigned HUGEINT expr -> signed BIGINT."""
    return (
        f"CAST(CASE WHEN {e} >= CAST(9223372036854775808 AS HUGEINT) "
        f"THEN {e} - CAST(18446744073709551616 AS HUGEINT) ELSE {e} END AS BIGINT)"
    )


def cell_lsb_sql(cell: str) -> str:
    return f"({cell} & -{cell})"


def cell_level_sql(cell: str) -> str:
    """level = 30 - bit_count(lsb-1)/2 (valid ids assumed)."""
    return f"(30 - bit_count({cell_lsb_sql(cell)} - 1) // 2)"


def cell_parent_sql(cell: str, level: int) -> str:
    new_lsb = 1 << (2 * (30 - level))
    mask = ~(2 * new_lsb - 1) & 0xFFFFFFFFFFFFFFFF
    smask = mask - (1 << 64) if mask >= (1 << 63) else mask
    return f"(({cell} & CAST({smask} AS BIGINT)) | {new_lsb})"


def cell_range_min_sql(cell: str) -> str:
    return f"({cell} - ({cell_lsb_sql(cell)} - 1))"


def cell_range_max_sql(cell: str) -> str:
    return f"({cell} + ({cell_lsb_sql(cell)} - 1))"


def cell_child_sql(cell: str, k: int) -> str:
    """k-th child of a NON-LEAF cell (lsb positive, so // 4 == >> 2);
    mirrors cells.py::s2_cell_child's center arithmetic."""
    old = cell_lsb_sql(cell)
    return f"({cell} - {old} + ({old} // 4) + 2 * ({old} // 4) * {k})"


def cell_intersects_sql(a: str, b: str) -> str:
    """Range-overlap intersects for SAME-FACE cells (signed compares
    are safe when both operands share the face/high bit — true for
    the nested/sibling cases the oracle exercises)."""
    return (
        f"({cell_range_min_sql(a)} <= {cell_range_max_sql(b)} "
        f"AND {cell_range_min_sql(b)} <= {cell_range_max_sql(a)})"
    )


def cellfromlonlat_cte(points_sql: str, suffix: str = "") -> str:
    """DuckDB CTE chain computing the S2 leaf cell id for rows of
    ``(k, lon, lat)`` produced by ``points_sql`` — an *independent*
    SQL implementation of the S2 quadratic projection + Hilbert
    traversal, used as the oracle for s2_cellfromlonlat.

    Returns SQL defining a relation ``cellids(k, cell)`` (signed
    BIGINT cell). Embed as: ``WITH <this> SELECT ... FROM cellids``.
    """
    from .s2.cellmath import IJ_TO_POS, POS_TO_ORIENT

    lut_rows = ",".join(
        "({},{},{},{})".format(
            o, ij, int(IJ_TO_POS[o][ij]), o ^ int(POS_TO_ORIENT[int(IJ_TO_POS[o][ij])])
        )
        for o in range(4)
        for ij in range(4)
    )
    out = f"""
  pts AS ({points_sql}),
  xyz AS (
    SELECT k,
      cos(radians(lat))*cos(radians(lon)) AS x,
      cos(radians(lat))*sin(radians(lon)) AS y,
      sin(radians(lat)) AS z
    FROM pts),
  fc AS (
    SELECT k, x, y, z,
      CASE WHEN abs(z) >= abs(x) AND abs(z) >= abs(y) THEN CASE WHEN z < 0 THEN 5 ELSE 2 END
           WHEN abs(y) >= abs(x) THEN CASE WHEN y < 0 THEN 4 ELSE 1 END
           ELSE CASE WHEN x < 0 THEN 3 ELSE 0 END END AS f
    FROM xyz),
  uv AS (
    SELECT k, f,
      CASE f WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
             WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
      CASE f WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
             WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
    FROM fc),
  st AS (
    SELECT k, f,
      CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END AS s,
      CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END AS t
    FROM uv) ,
  lut(o, ij, d, no) AS (VALUES {lut_rows}),
  hil AS (
    SELECT k, f,
      CAST(least(1073741823, greatest(0, floor(s*1073741824))) AS BIGINT) AS i,
      CAST(least(1073741823, greatest(0, floor(t*1073741824))) AS BIGINT) AS j,
      29 AS lev, CAST(0 AS BIGINT) AS pos, f % 2 AS o
    FROM st
    UNION ALL
    SELECT h.k, h.f, h.i, h.j, h.lev - 1, h.pos*4 + l.d, l.no
    FROM hil h JOIN lut l
      ON l.o = h.o AND l.ij = ((h.i >> h.lev) & 1)*2 + ((h.j >> h.lev) & 1)
    WHERE h.lev >= 0),
  cellids AS (
    SELECT k, {_sgn("(CAST(f AS HUGEINT) * 2305843009213693952 + CAST(pos AS HUGEINT)*2 + 1)")} AS cell
    FROM hil WHERE lev = -1)
"""
    if suffix:
        for name in ("pts", "xyz", "fc", "uv", "st", "lut", "hil", "cellids"):
            out = out_replace_token(out, name, name + suffix)
    return out


def cellcenter_xyz_cte(cells_sql: str, suffix: str = "") -> str:
    """Inverse of :func:`cellfromlonlat_cte`: DuckDB CTE chain turning
    LEAF cell ids (rows ``(k, cell)`` from ``cells_sql``) into
    normalized center unit vectors — relation ``centers(k, x, y, z)``.

    Reconstructs (face, i, j) by walking the 30 Hilbert digits with
    the pos->ij lookup table, then center st = (2i+1)/2^31 (leaf
    delta), st->uv quadratic, face frame to xyz.
    """
    from .s2.cellmath import POS_TO_IJ, POS_TO_ORIENT

    lut_rows = ",".join(
        "({},{},{},{},{})".format(
            o,
            d,
            int(POS_TO_IJ[o][d]) >> 1,
            int(POS_TO_IJ[o][d]) & 1,
            o ^ int(POS_TO_ORIENT[d]),  # orientation updates by the POS digit
        )
        for o in range(4)
        for d in range(4)
    )
    u = _uns("cell")
    out = f"""
  cells_in AS ({cells_sql}),
  cface AS (
    SELECT k, cell,
      CAST({u} // CAST(2305843009213693952 AS HUGEINT) AS BIGINT) AS f,
      CAST(({u} % CAST(2305843009213693952 AS HUGEINT)) // 2 AS BIGINT) AS pos
    FROM cells_in),
  ilut(o, d, ib, jb, no) AS (VALUES {lut_rows}),
  walk AS (
    SELECT k, f, pos, 29 AS lev,
      CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j, f % 2 AS o
    FROM cface
    UNION ALL
    SELECT w.k, w.f, w.pos, w.lev - 1,
      w.i * 2 + l.ib, w.j * 2 + l.jb, l.no
    FROM walk w JOIN ilut l
      ON l.o = w.o AND l.d = ((w.pos >> (2 * w.lev)) & 3)
    WHERE w.lev >= 0),
  cij AS (SELECT k, f, i, j FROM walk WHERE lev = -1),
  cst AS (
    SELECT k, f,
      (2 * i + 1) / 2147483648.0 AS s,
      (2 * j + 1) / 2147483648.0 AS t
    FROM cij),
  cuv AS (
    SELECT k, f,
      CASE WHEN s >= 0.5 THEN (1.0/3.0) * (4*s*s - 1) ELSE (1.0/3.0) * (1 - 4*(1-s)*(1-s)) END AS u,
      CASE WHEN t >= 0.5 THEN (1.0/3.0) * (4*t*t - 1) ELSE (1.0/3.0) * (1 - 4*(1-t)*(1-t)) END AS v
    FROM cst),
  craw AS (
    SELECT k,
      CASE f WHEN 0 THEN 1.0 WHEN 1 THEN -u WHEN 2 THEN -u WHEN 3 THEN -1.0 WHEN 4 THEN v ELSE v END AS rx,
      CASE f WHEN 0 THEN u WHEN 1 THEN 1.0 WHEN 2 THEN -v WHEN 3 THEN -v WHEN 4 THEN -1.0 ELSE u END AS ry,
      CASE f WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0 WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0 END AS rz
    FROM cuv),
  centers AS (
    SELECT k, rx / nrm AS x, ry / nrm AS y, rz / nrm AS z
    FROM (SELECT k, rx, ry, rz, sqrt(rx*rx + ry*ry + rz*rz) AS nrm FROM craw))
"""
    if suffix:
        for name in ("cells_in", "cface", "ilut", "walk", "cij", "cst", "cuv", "craw", "centers"):
            out = out_replace_token(out, name, name + suffix)
    return out


def cell_token_sql(cell: str) -> str:
    """hex token with trailing zeros stripped ('X' for 0)."""
    u = _uns(cell)
    return (
        f"CASE WHEN {cell} = 0 THEN 'X' ELSE "
        f"regexp_replace(lpad(lower(hex({u})), 16, '0'), '0+$', '') END"
    )


def cellfromfij_cte(fij_sql: str, suffix: str = "") -> str:
    """Forward Hilbert traversal from LEAF ``(k, f, i, j)`` rows
    produced by ``fij_sql`` — relation ``cellids(k, cell)`` (signed
    BIGINT). The ij-space twin of :func:`cellfromlonlat_cte` used by
    oracles that construct cells geometrically (edge neighbors,
    ij-offset probes) rather than from lon/lat."""
    from .s2.cellmath import IJ_TO_POS, POS_TO_ORIENT

    lut_rows = ",".join(
        "({},{},{},{})".format(
            o, ij, int(IJ_TO_POS[o][ij]), o ^ int(POS_TO_ORIENT[int(IJ_TO_POS[o][ij])])
        )
        for o in range(4)
        for ij in range(4)
    )
    out = f"""
  fij AS ({fij_sql}),
  lut(o, ij, d, no) AS (VALUES {lut_rows}),
  hil AS (
    SELECT k, f, i, j, 29 AS lev, CAST(0 AS BIGINT) AS pos, f % 2 AS o
    FROM fij
    UNION ALL
    SELECT h.k, h.f, h.i, h.j, h.lev - 1, h.pos*4 + l.d, l.no
    FROM hil h JOIN lut l
      ON l.o = h.o AND l.ij = ((h.i >> h.lev) & 1)*2 + ((h.j >> h.lev) & 1)
    WHERE h.lev >= 0),
  cellids AS (
    SELECT k, {_sgn("(CAST(f AS HUGEINT) * 2305843009213693952 + CAST(pos AS HUGEINT)*2 + 1)")} AS cell
    FROM hil WHERE lev = -1)
"""
    if suffix:
        for name in ("fij", "lut", "hil", "cellids"):
            out = out_replace_token(out, name, name + suffix)
    return out


def cellij_cte(cells_sql: str, suffix: str = "") -> str:
    """Inverse Hilbert walk: LEAF cell ids (rows ``(k, cell)``) ->
    relation ``cij(k, f, i, j)`` of leaf ij coordinates. The shared
    front half of :func:`cellcenter_xyz_cte`, exposed for oracles
    that need the ij square itself (vertices, neighbors, levels)."""
    from .s2.cellmath import POS_TO_IJ, POS_TO_ORIENT

    lut_rows = ",".join(
        "({},{},{},{},{})".format(
            o,
            d,
            int(POS_TO_IJ[o][d]) >> 1,
            int(POS_TO_IJ[o][d]) & 1,
            o ^ int(POS_TO_ORIENT[d]),
        )
        for o in range(4)
        for d in range(4)
    )
    u = _uns("cell")
    out = f"""
  cells_in AS ({cells_sql}),
  cface AS (
    SELECT k, cell,
      CAST({u} // CAST(2305843009213693952 AS HUGEINT) AS BIGINT) AS f,
      CAST(({u} % CAST(2305843009213693952 AS HUGEINT)) // 2 AS BIGINT) AS pos
    FROM cells_in),
  ilut(o, d, ib, jb, no) AS (VALUES {lut_rows}),
  walk AS (
    SELECT k, f, pos, 29 AS lev,
      CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j, f % 2 AS o
    FROM cface
    UNION ALL
    SELECT w.k, w.f, w.pos, w.lev - 1,
      w.i * 2 + l.ib, w.j * 2 + l.jb, l.no
    FROM walk w JOIN ilut l
      ON l.o = w.o AND l.d = ((w.pos >> (2 * w.lev)) & 3)
    WHERE w.lev >= 0),
  cij AS (SELECT k, f, i, j FROM walk WHERE lev = -1)
"""
    if suffix:
        for name in ("cells_in", "cface", "ilut", "walk", "cij"):
            out = out_replace_token(out, name, name + suffix)
    return out


#: st->uv quadratic projection as a SQL lambda over an st expression
def _st_to_uv_sql(s: str) -> str:
    return (
        f"(CASE WHEN {s} >= 0.5 THEN (1.0/3.0) * (4*({s})*({s}) - 1) "
        f"ELSE (1.0/3.0) * (1 - 4*(1-({s}))*(1-({s}))) END)"
    )


def _face_xyz_sql(f: str, u: str, v: str):
    """(rx, ry, rz) face-frame expressions for face ``f`` and uv."""
    rx = f"CASE {f} WHEN 0 THEN 1.0 WHEN 1 THEN -({u}) WHEN 2 THEN -({u}) WHEN 3 THEN -1.0 WHEN 4 THEN ({v}) ELSE ({v}) END"
    ry = f"CASE {f} WHEN 0 THEN ({u}) WHEN 1 THEN 1.0 WHEN 2 THEN -({v}) WHEN 3 THEN -({v}) WHEN 4 THEN -1.0 ELSE ({u}) END"
    rz = f"CASE {f} WHEN 0 THEN ({v}) WHEN 1 THEN ({v}) WHEN 2 THEN 1.0 WHEN 3 THEN -({u}) WHEN 4 THEN -({u}) ELSE -1.0 END"
    return rx, ry, rz


def cellcorners_cte(cij_sql: str, level: int, suffix: str = "") -> str:
    """From LEAF ij rows ``(k, f, i, j)`` (e.g. the ``cij`` relation of
    :func:`cellij_cte`): the 4 corner unit vectors of the level-
    ``level`` ancestor cell, CCW from (u_lo, v_lo) — the same ordering
    as ``cellmath.cell_vertex_lonlat``. Relation ``corners(k, x0, y0,
    z0, ..., x3, y3, z3)`` (normalized)."""
    size = 1 << (30 - level)
    cols = []
    for vid in range(4):
        iexpr = "ilo" if vid in (0, 3) else "ihi"
        jexpr = "jlo" if vid < 2 else "jhi"
        u = _st_to_uv_sql(f"({iexpr} / 1073741824.0)")
        v = _st_to_uv_sql(f"({jexpr} / 1073741824.0)")
        rx, ry, rz = _face_xyz_sql("f", u, v)
        cols.append(f"({rx}) AS rx{vid}, ({ry}) AS ry{vid}, ({rz}) AS rz{vid}")
    raw_cols = ",\n      ".join(cols)
    norm_cols = ",\n      ".join(
        f"rx{v} / sqrt(rx{v}*rx{v} + ry{v}*ry{v} + rz{v}*rz{v}) AS x{v}, "
        f"ry{v} / sqrt(rx{v}*rx{v} + ry{v}*ry{v} + rz{v}*rz{v}) AS y{v}, "
        f"rz{v} / sqrt(rx{v}*rx{v} + ry{v}*ry{v} + rz{v}*rz{v}) AS z{v}"
        for v in range(4)
    )
    out = f"""
  csq AS (
    SELECT k, f,
      i - (i % {size}) AS ilo, i - (i % {size}) + {size} AS ihi,
      j - (j % {size}) AS jlo, j - (j % {size}) + {size} AS jhi
    FROM ({cij_sql})),
  crawq AS (
    SELECT k, f,
      {raw_cols}
    FROM csq),
  corners AS (
    SELECT k,
      {norm_cols}
    FROM crawq)
"""
    if suffix:
        for name in ("csq", "crawq", "corners"):
            out = out_replace_token(out, name, name + suffix)
    return out


def quad_excess_area_sql(rel: str = "corners", radius: float = 6371010.0) -> str:
    """Spherical-excess area (m^2) of the 4-corner quad in ``rel``
    (wide x0..z3 columns), split into triangles (0,1,2) + (0,2,3) with
    the 2*atan2 per-triangle excess — the same formula the wkb_codec
    oracle uses, so both engines share the float math."""

    def tri(a, b, c):
        return (
            f"2*atan2("
            f"x{a}*(y{b}*z{c} - z{b}*y{c}) - y{a}*(x{b}*z{c} - z{b}*x{c}) + z{a}*(x{b}*y{c} - y{b}*x{c}), "
            f"1 + (x{a}*x{b}+y{a}*y{b}+z{a}*z{b}) + (x{b}*x{c}+y{b}*y{c}+z{b}*z{c}) + (x{c}*x{a}+y{c}*y{a}+z{c}*z{a}))"
        )

    return f"abs({tri(0, 1, 2)} + {tri(0, 2, 3)}) * {radius!r} * {radius!r}"


def cell_debug_string_sql(cell: str, level: int) -> str:
    """'face/digits' debug string of a level-``level`` cell id —
    digit_k = (id >> (2*(30-k)+1)) & 3 for k=1..level (string twin of
    cellmath.debug_string)."""
    u = _uns(cell)
    parts = [f"CAST(CAST({u} // CAST(2305843009213693952 AS HUGEINT) AS BIGINT) AS VARCHAR)", "'/'"]
    for k in range(1, level + 1):
        shift = 2 * (30 - k) + 1
        parts.append(
            f"CAST(CAST(({u} // CAST({1 << shift} AS HUGEINT)) % 4 AS BIGINT) AS VARCHAR)"
        )
    return " || ".join(parts)
