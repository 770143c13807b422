"""S2 cell operators as native Spark Column expressions.

Hot-path cell ops are **pure JVM bit arithmetic** (no Python UDF at
all), so they stay inside WholeStageCodegen and scale to 100 TB:
``s2_cell_level/parent/child/range_min/range_max/contains/intersects/
token/from_token`` are all plain Column expressions.

Only the trigonometric conversions (lon/lat <-> cell) and the string
debug forms drop to Arrow-batched pandas UDFs backed by the numpy
cell math in :mod:`duckdb_geography_spark.s2.cellmath`.

Reference contracts: /root/reference/src/s2_cell_ops.cpp (see each
function's docstring for exact lines) and
test/sql/geography/cell_ops.test goldens.

Cell ids are Spark ``LongType`` carrying the same 64 bits as the
unsigned S2 id (SURVEY.md S1.1). All bit manipulation below is
two's-complement safe; range comparisons are safe in *signed* order
because an S2 cell's leaf range never crosses the int64 sign boundary
(the sign flips exactly between face 3 and face 4, and ranges never
span faces).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from ..s2 import cellmath as cm

__all__ = [
    "s2_cellfromlonlat",
    "with_cellfromlonlat",
    "s2_cell_center_lon",
    "s2_cell_center_lat",
    "s2_cell_level",
    "s2_cell_is_valid",
    "s2_cell_parent",
    "s2_cell_child",
    "s2_cell_range_min",
    "s2_cell_range_max",
    "s2_cell_contains",
    "s2_cell_intersects",
    "s2_cell_token",
    "s2_cell_from_token",
    "s2_cell_debug_string",
    "s2_cell_from_debug_string",
    "s2_cell_edge_neighbor",
    "SENTINEL_LONG",
]

#: 0xFFFFFFFFFFFFFFFF as the signed bit pattern Spark stores
SENTINEL_LONG = -1


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sentinel() -> Column:
    return F.lit(SENTINEL_LONG).cast(LongType())


def _lsb(c: Column) -> Column:
    return c.bitwiseAND(-c)


def s2_cell_is_valid(cell) -> Column:
    """True if the id is a valid S2 cell (face < 6, lsb in position).

    Pure bit expression (no UDF). Reference behavior:
    src/s2_cell_ops.cpp validity checks via ``S2CellId::is_valid``.
    """
    c = _c(cell)
    face_ok = F.shiftrightunsigned(c, 61) < F.lit(6)
    lsb_ok = _lsb(c).bitwiseAND(F.lit(0x1555555555555555)) != F.lit(0)
    return face_ok & lsb_ok & c.isNotNull()


def s2_cell_level(cell) -> Column:
    """Cell level 0-30; -1 for invalid ids (src/s2_cell_ops.cpp:732-760).

    level = 30 - trailing_zeros(id)/2, computed exactly with
    ``bit_count(lsb - 1)`` — stays integer, stays in codegen.
    """
    c = _c(cell)
    lev = F.lit(30) - F.bit_count(_lsb(c) - F.lit(1)) / F.lit(2)
    return F.when(s2_cell_is_valid(c), lev.cast("int")).otherwise(F.lit(-1))


def s2_cell_parent(cell, level) -> Column:
    """Parent at ``level`` (negative = relative), sentinel when above the
    cell's level (src/s2_cell_ops.cpp:876-902; cell_ops.test:199-212)."""
    c = _c(cell)
    lev = _c(level) if isinstance(level, (Column, str)) else F.lit(int(level))
    cur = s2_cell_level(c)
    target = F.when(lev < 0, cur + lev).otherwise(lev)
    target = F.greatest(F.lit(0), F.least(F.lit(30), target))
    new_lsb = F.call_function(
        "shiftleft", F.lit(1).cast(LongType()), (F.lit(2) * (F.lit(30) - target)).cast("int")
    )
    out = c.bitwiseAND(F.bitwise_not(new_lsb + new_lsb - F.lit(1))).bitwiseOR(new_lsb)
    bad = (~s2_cell_is_valid(c)) | (target > cur)
    return F.when(bad, _sentinel()).otherwise(out)


def s2_cell_child(cell, index) -> Column:
    """k-th child (0-3); sentinel for leaves / out-of-range index
    (src/s2_cell_ops.cpp:847-874; cell_ops.test:218-226)."""
    c = _c(cell)
    k = _c(index) if isinstance(index, (Column, str)) else F.lit(int(index))
    old = _lsb(c)
    new = F.shiftright(old, 2)  # old is positive for valid non-leaf cells
    out = c - old + new + (new + new) * k.cast(LongType())
    bad = (~s2_cell_is_valid(c)) | (k < 0) | (k > 3) | (old == F.lit(1))
    return F.when(bad, _sentinel()).otherwise(out)


def s2_cell_range_min(cell) -> Column:
    """Minimum leaf cell contained in the cell — the range-join key
    (src/s2_cell_ops.cpp:934-1004)."""
    c = _c(cell)
    out = c - (_lsb(c) - F.lit(1))
    return F.when(s2_cell_is_valid(c), out).otherwise(_sentinel())


def s2_cell_range_max(cell) -> Column:
    """Maximum leaf cell contained in the cell (src/s2_cell_ops.cpp:934-1004)."""
    c = _c(cell)
    out = c + (_lsb(c) - F.lit(1))
    return F.when(s2_cell_is_valid(c), out).otherwise(_sentinel())


def s2_cell_contains(cell1, cell2) -> Column:
    """cell1 range-contains cell2; false on any invalid input
    (src/s2_cell_ops.cpp:805-833)."""
    a, b = _c(cell1), _c(cell2)
    ok = s2_cell_is_valid(a) & s2_cell_is_valid(b)
    return ok & (s2_cell_range_min(a) <= b) & (b <= s2_cell_range_max(a))


def s2_cell_intersects(cell1, cell2) -> Column:
    """Range-overlap of two cells — containment either way, false for
    mere edge neighbors (src/s2_cell_ops.cpp:772-803)."""
    return s2_cell_contains(cell1, cell2) | s2_cell_contains(cell2, cell1)


def s2_cell_token(cell) -> Column:
    """Compact hex token; 'X' for id 0 (src/s2_cell_ops.cpp:651-678).

    Pure string expression: unsigned hex, zero-padded to 16, trailing
    zeros stripped.
    """
    c = _c(cell)
    full = F.lower(F.lpad(F.hex(c), 16, "0"))
    tok = F.regexp_replace(full, "0+$", "")
    return F.when(c == 0, F.lit("X")).otherwise(tok)


def s2_cell_from_token(token) -> Column:
    """Hex token -> cell id; malformed tokens -> id 0 (no error)
    (src/s2_cell_ops.cpp:701-730; cell_ops.test:181-185)."""
    t = F.lower(_c(token))
    valid = t.rlike("^[0-9a-f]{1,16}$")
    padded = F.rpad(t, 16, "0")
    # conv() yields an unsigned decimal string; route through
    # decimal(20,0) and wrap values >= 2^63 back to the signed domain.
    dec = F.conv(padded, 16, 10).cast("decimal(20,0)")
    wrapped = F.when(
        dec > F.lit(9223372036854775807).cast("decimal(20,0)"),
        (dec - F.lit("18446744073709551616").cast("decimal(21,0)")).cast(LongType()),
    ).otherwise(dec.cast(LongType()))
    return F.when(valid, wrapped).otherwise(F.lit(0).cast(LongType()))


# ---------------------------------------------------------------------------
# pandas-UDF-backed conversions (Arrow batched, numpy vectorized)
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def _cellfromlonlat_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    ids = cm.lonlat_to_cellid(lon.to_numpy(np.float64, na_value=np.nan),
                              lat.to_numpy(np.float64, na_value=np.nan))
    return pd.Series(cm.to_signed(ids))


# deterministic in fact, but marked otherwise so Catalyst doesn't
# split a pushed-down join-key null guard into a second full
# evaluation of the UDF over the fact table (observed 2x Python cost
# in covering joins)
_cellfromlonlat_udf = _cellfromlonlat_udf.asNondeterministic()


@F.pandas_udf(DoubleType())
def _cell_center_lon_udf(cell: pd.Series) -> pd.Series:
    from . import geoudfs as U

    lon, _ = cm.cellid_to_lonlat(cm.to_unsigned(cell.to_numpy(np.int64, na_value=-1)))
    return U.float_series(lon)


@F.pandas_udf(DoubleType())
def _cell_center_lat_udf(cell: pd.Series) -> pd.Series:
    from . import geoudfs as U

    _, lat = cm.cellid_to_lonlat(cm.to_unsigned(cell.to_numpy(np.int64, na_value=-1)))
    return U.float_series(lat)


@F.pandas_udf(StringType())
def _cell_debug_string_udf(cell: pd.Series) -> pd.Series:
    out = cm.debug_string(cm.to_unsigned(cell.to_numpy(np.int64, na_value=-1)))
    return pd.Series(out)


@F.pandas_udf(LongType())
def _cell_from_debug_string_udf(s: pd.Series) -> pd.Series:
    out = cm.debug_string_decode(s.to_numpy(dtype=object))
    return pd.Series(cm.to_signed(out))


@F.pandas_udf(LongType())
def _cell_edge_neighbor_udf(cell: pd.Series, index: pd.Series) -> pd.Series:
    ids = cm.to_unsigned(cell.to_numpy(np.int64, na_value=-1))
    k = index.to_numpy(np.int64, na_value=-1)
    nbrs = cm.edge_neighbors(ids)  # shape (4, n)
    n = ids.shape[0]
    out = np.full(n, cm.SENTINEL, dtype=np.uint64)
    ok = (k >= 0) & (k <= 3) & cm.is_valid(ids)
    idx = np.clip(k, 0, 3)
    out[ok] = nbrs[idx[ok], np.arange(n)[ok]]
    return pd.Series(cm.to_signed(out))


def s2_cellfromlonlat(lon, lat) -> Column:
    """lon/lat degrees -> leaf cell id (S2_CELL_CENTER semantics).

    NaN -> sentinel. Reference: src/s2_cell_ops.cpp:463-512;
    golden (-64, 45) -> ``4b59a0cd83b5de49``.

    DIVERGENCE from the reference on *implicit* coercion: the
    reference types this result S2_CELL_CENTER, whose cost-0 cast
    into geography functions yields the snapped POINT; this engine
    carries cells and cell centers in one LongType, so a bare long
    fed to ``s2_area``/``s2_astext``/``s2_dimension`` coerces with
    S2_CELL (leaf-polygon) semantics instead. For the reference's
    point behavior, cast explicitly with
    ``s2_cell_center_to_geography(cell)``.
    """
    return _cellfromlonlat_udf(_c(lon).cast(DoubleType()), _c(lat).cast(DoubleType()))


def with_cellfromlonlat(df, lon_col: str, lat_col: str, out_col: str = "cell"):
    """``s2_cellfromlonlat`` as a PURE JVM expression chain — no Python
    stage anywhere: the S2 quadratic projection plus a 5-step Hilbert
    walk over 6-level lookup tables, chained through lateral column
    aliases (Spark >= 3.4). Bit-exact vs the Arrow kernel
    (pytest-asserted over random + adversarial points, including the
    NULL/NaN -> sentinel contract).

    WHEN TO USE WHICH TIER (measured, local[8], 2M rows):
    - ``s2_cellfromlonlat`` (Arrow numpy kernel): ~0.33s — the raw
      throughput winner and the hot-path default.
    - this helper: ~2.2s under default whole-stage fusion — the fused
      method exceeds the JVM's ~8K-bytecode JIT limit, so the stage
      runs partly interpreted (with ``spark.sql.codegen.wholeStage=
      false`` the same plan runs ~0.6s via per-operator projection
      codegen). Its value is OPERATIONAL: zero Python workers, no
      Arrow transfer, works on executors with no Python environment,
      and composes with other pure-JVM expressions in one stage.

    Takes and returns a DataFrame (lateral aliases only exist inside a
    SELECT, so this can't be a Column helper); intermediates are
    dropped."""
    from ..s2.cellmath import IJ_TO_POS, POS_TO_ORIENT

    lut_d = [int(IJ_TO_POS[o][ij]) for o in range(4) for ij in range(4)]
    lut_o = [o ^ int(POS_TO_ORIENT[int(IJ_TO_POS[o][ij])]) for o in range(4) for ij in range(4)]
    P = "__cf"  # intermediate-name prefix
    steps = [
        f"radians(CAST(`{lon_col}` AS DOUBLE)) AS {P}_ln",
        f"radians(CAST(`{lat_col}` AS DOUBLE)) AS {P}_lt",
        f"cos({P}_lt)*cos({P}_ln) AS {P}_x",
        f"cos({P}_lt)*sin({P}_ln) AS {P}_y",
        f"sin({P}_lt) AS {P}_z",
        # face selection (largest |component|, cellmath.xyz_to_face order)
        f"CASE WHEN abs({P}_z) >= abs({P}_x) AND abs({P}_z) >= abs({P}_y) "
        f"THEN IF({P}_z < 0, 5, 2) "
        f"WHEN abs({P}_y) >= abs({P}_x) THEN IF({P}_y < 0, 4, 1) "
        f"ELSE IF({P}_x < 0, 3, 0) END AS {P}_f",
        f"CASE {P}_f WHEN 0 THEN {P}_y/{P}_x WHEN 1 THEN -{P}_x/{P}_y WHEN 2 THEN -{P}_x/{P}_z "
        f"WHEN 3 THEN {P}_z/{P}_x WHEN 4 THEN {P}_z/{P}_y ELSE -{P}_y/{P}_z END AS {P}_u",
        f"CASE {P}_f WHEN 0 THEN {P}_z/{P}_x WHEN 1 THEN {P}_z/{P}_y WHEN 2 THEN -{P}_y/{P}_z "
        f"WHEN 3 THEN {P}_y/{P}_x WHEN 4 THEN -{P}_x/{P}_y ELSE -{P}_x/{P}_z END AS {P}_v",
        # quadratic st
        f"IF({P}_u >= 0, 0.5*sqrt(1+3*{P}_u), 1-0.5*sqrt(1-3*{P}_u)) AS {P}_s",
        f"IF({P}_v >= 0, 0.5*sqrt(1+3*{P}_v), 1-0.5*sqrt(1-3*{P}_v)) AS {P}_t",
        f"CAST(least(1073741823.0, greatest(0.0, floor({P}_s * 1073741824.0))) AS BIGINT) AS {P}_i",
        f"CAST(least(1073741823.0, greatest(0.0, floor({P}_t * 1073741824.0))) AS BIGINT) AS {P}_j",
        # fused per-step state S = pos*4 + orientation: one new column
        # per step keeps the projection under codegen's 100-field cap,
        # and 4-bit lookup tables (the standard S2 acceleration) cut
        # the chain to 8 steps — 30 individual 2-bit steps generated
        # more code than Janino JIT-compiles comfortably
        f"CAST({P}_f % 2 AS BIGINT) AS {P}_s0",
    ]

    def walk(o, ibits, jbits, nbits):
        pos = 0
        for k in range(nbits - 1, -1, -1):
            ij2 = ((ibits >> k) & 1) * 2 + ((jbits >> k) & 1)
            pos = pos * 4 + lut_d[o * 4 + ij2]
            o = lut_o[o * 4 + ij2]
        return pos, o

    # 6-level lookup: table6[o*4096 + i6*64 + j6] = pos12*4 + o_next.
    # 5 steps cover all 30 levels; fewer steps matter because the whole
    # fused pipeline must stay under the JVM's ~8K-bytecode JIT limit —
    # a 30-step (or even 8-step) chain generates a method the JIT
    # refuses, and the stage silently runs interpreted ~10x slower.
    table6 = [0] * (4 * 4096)
    for o in range(4):
        for i6 in range(64):
            for j6 in range(64):
                pos12, o2 = walk(o, i6, j6, 6)
                table6[o * 4096 + i6 * 64 + j6] = pos12 * 4 + o2
    t6 = "array(" + ",".join(str(v) for v in table6) + ")"
    for k in range(5):  # 5 x 6 levels: leaf bits 29..0
        lev = 24 - 6 * k
        steps.append(
            f"({P}_s{k} div 4) * 16384 + element_at({t6}, "
            f"CAST(({P}_s{k} % 4) * 4096 + (shiftright({P}_i, {lev}) & 63) * 64 + "
            f"(shiftright({P}_j, {lev}) & 63) + 1 AS INT)) AS {P}_s{k + 1}"
        )
    # NULL must be guarded alongside NaN: greatest/least SKIP nulls, so
    # a NULL coordinate would otherwise quietly clamp to i=j=0 and
    # produce cell id 1 instead of the sentinel the UDF returns
    steps.append(
        f"IF(`{lon_col}` IS NULL OR `{lat_col}` IS NULL "
        f"OR isnan(CAST(`{lon_col}` AS DOUBLE)) OR isnan(CAST(`{lat_col}` AS DOUBLE)), "
        f"CAST(-1 AS BIGINT), "
        f"shiftleft(CAST({P}_f AS BIGINT), 61) + ({P}_s5 div 4) * 2 + 1) AS `{out_col}`"
    )
    # the analyzer resolves ~one lateral-alias layer per iteration and
    # caps at 100: feed the chain in slices (the optimizer re-collapses
    # adjacent Projects, so execution still runs as one codegen stage)
    out = df
    chunk = 12
    for lo in range(0, len(steps), chunk):
        out = out.selectExpr("*", *steps[lo : lo + chunk])
    return out.drop(*[c for c in out.columns if c.startswith(P + "_")])


def s2_cell_center_lon(cell) -> Column:
    """Longitude of a cell's center point (NaN for invalid ids)."""
    return _cell_center_lon_udf(_c(cell))


def s2_cell_center_lat(cell) -> Column:
    """Latitude of a cell's center point (NaN for invalid ids)."""
    return _cell_center_lat_udf(_c(cell))


def s2_cell_debug_string(cell) -> Column:
    """'face/positions' form, e.g. '5/3301' (src/s2_cell_ops.cpp:630-678)."""
    return _cell_debug_string_udf(_c(cell))


def s2_cell_from_debug_string(s) -> Column:
    """Inverse of :func:`s2_cell_debug_string`; malformed -> sentinel."""
    return _cell_from_debug_string_udf(_c(s))


def s2_cell_edge_neighbor(cell, index) -> Column:
    """Edge neighbor 0-3 (down/right/up/left); sentinel out of range
    (src/s2_cell_ops.cpp:904-932; cell_ops.test:230-238)."""
    k = _c(index) if isinstance(index, (Column, str)) else F.lit(int(index))
    return _cell_edge_neighbor_udf(_c(cell), k.cast("long"))
