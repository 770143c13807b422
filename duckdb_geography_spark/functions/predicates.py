"""Binary predicates, distances, overlays
(reference: src/s2_binary_index_ops.cpp).

Every binary op runs the reference's two machinery pieces
(SURVEY.md S2.5): a covering pre-filter straight off the encoded
prefix (no geometry decode for definite misses) and cached decoded
parts for repeated operands (broadcast-join friendly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, DoubleType

from ..geo import ops
from ..s2 import cellmath as cm
from . import geoudfs as U

__all__ = [
    "s2_mayintersect",
    "s2_intersects",
    "s2_contains",
    "s2_equals",
    "s2_intersection",
    "s2_difference",
    "s2_union",
    "s2_dwithin",
    "s2_distance",
    "s2_max_distance",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _batch_overlap(s1: pd.Series, s2: pd.Series):
    """Vectorized covering-overlap over a whole Arrow batch.

    Returns (null_mask, overlap) bool arrays. The per-row fallback
    costs ~8 small-numpy calls per pair; here the tag prefixes are
    parsed once per UNIQUE blob (broadcast join sides repeat the same
    geography thousands of times per batch) and the interval-overlap
    test runs as one padded (n, k1, k2) comparison for the batch.
    Empty geographies get empty coverings -> overlap False, matching
    the reference's definite-false early-out
    (src/s2_binary_index_ops.cpp:287-312).
    """
    s1, s2 = U.coerce_geog(s1), U.coerce_geog(s2)
    n = len(s1)
    null_mask = np.zeros(n, dtype=bool)
    # a non-empty geography encoded WITHOUT a covering can't be pruned:
    # missing covering means "might intersect", not "disjoint"
    # (CoveringMayIntersect, src/s2_binary_index_ops.cpp:450-461)
    force = np.zeros(n, dtype=bool)
    either_empty = np.zeros(n, dtype=bool)
    memo: dict = {}
    covs1: list = [None] * n
    covs2: list = [None] * n
    for i in range(n):
        b1, b2 = s1.iat[i], s2.iat[i]
        if b1 is None or b2 is None:
            null_mask[i] = True
            continue
        for b, covs in ((bytes(b1), covs1), (bytes(b2), covs2)):
            entry = memo.get(b)
            if entry is None:
                is_empty = bool(b[1] & 1)
                cov = np.empty(0, dtype=np.uint64) if is_empty else U.tag_covering(b)
                entry = (cov, is_empty)
                memo[b] = entry
            cov, is_empty = entry
            covs[i] = cov
            if is_empty:
                either_empty[i] = True
            elif not len(cov):
                force[i] = True
    lens1 = np.array([0 if c is None else len(c) for c in covs1], dtype=np.int64)
    lens2 = np.array([0 if c is None else len(c) for c in covs2], dtype=np.int64)
    k1, k2 = int(lens1.max(initial=0)), int(lens2.max(initial=0))
    overlap = force & ~either_empty & ~null_mask
    if k1 == 0 or k2 == 0:
        return null_mask, overlap

    def pad(covs, lens, k):
        # sentinel lo=max, hi=0 never overlaps anything
        lo = np.full((n, k), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        hi = np.zeros((n, k), dtype=np.uint64)
        cat = np.concatenate([c for c in covs if c is not None and len(c)] or [np.empty(0, dtype=np.uint64)])
        if len(cat):
            rows = np.repeat(np.arange(n), lens)
            cols = np.concatenate([np.arange(m) for m in lens if m])
            lo[rows, cols] = cm.range_min(cat)
            hi[rows, cols] = cm.range_max(cat)
        return lo, hi

    lo1, hi1 = pad(covs1, lens1, k1)
    lo2, hi2 = pad(covs2, lens2, k2)
    overlap |= np.any(
        (lo1[:, :, None] <= hi2[:, None, :]) & (lo2[:, None, :] <= hi1[:, :, None]),
        axis=(1, 2),
    )
    overlap &= ~either_empty & ~null_mask
    return null_mask, overlap


def _binary_bool_udf(exact_fn, name):
    def _udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        s1, s2 = U.coerce_geog(s1), U.coerce_geog(s2)
        null_mask, overlap = _batch_overlap(s1, s2)
        out = np.full(len(s1), False, dtype=object)
        out[null_mask] = None
        # only covering-overlapping pairs need the exact geometry test
        for i in np.flatnonzero(~null_mask & overlap):
            out[i] = exact_fn(
                U.decode_cached(bytes(s1.iat[i])), U.decode_cached(bytes(s2.iat[i]))
            )
        return pd.Series(out, dtype=object)

    # the UDF's plan-visible name: `s2_intersects(geog#1, geog#2)` in
    # EXPLAIN output instead of an anonymous `_udf(...)` — this is
    # what joins.lint_spatial_joins keys on, and what a user debugging
    # a slow plan needs to see
    _udf.__name__ = name
    return F.pandas_udf(_udf, BooleanType())


@F.pandas_udf(BooleanType())
def _mayintersect_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    null_mask, overlap = _batch_overlap(s1, s2)
    out = overlap.astype(object)
    out[null_mask] = None
    return pd.Series(out, dtype=object)


_intersects_udf = _binary_bool_udf(ops.intersects, "s2_intersects")
_contains_udf = _binary_bool_udf(ops.contains, "s2_contains")
_equals_udf = _binary_bool_udf(ops.equals, "s2_equals")


def s2_mayintersect(geog1, geog2) -> Column:
    """Covering-overlap test straight off the binary prefix — never
    decodes geometry (src/s2_binary_index_ops.cpp:54-83)."""
    return _mayintersect_udf(_c(geog1), _c(geog2))


def s2_intersects(geog1, geog2) -> Column:
    """Exact intersection (CLOSED models), covering-prefiltered
    (src/s2_binary_index_ops.cpp:85-106)."""
    return _intersects_udf(_c(geog1), _c(geog2))


def s2_contains(geog1, geog2) -> Column:
    """geog1 contains geog2 (src/s2_binary_index_ops.cpp:108-131)."""
    return _contains_udf(_c(geog1), _c(geog2))


def s2_equals(geog1, geog2) -> Column:
    """Geometric equality (src/s2_binary_index_ops.cpp:133-155)."""
    return _equals_udf(_c(geog1), _c(geog2))


def _overlay_udf(fn, name):
    def _udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        s1, s2 = U.coerce_geog(s1), U.coerce_geog(s2)
        out = []
        for b1, b2 in zip(s1, s2):
            if b1 is None or b2 is None:
                out.append(None)
                continue
            g = fn(U.decode_cached(bytes(b1)), U.decode_cached(bytes(b2)))
            out.append(g.encode())
        return pd.Series(out, dtype=object)

    _udf.__name__ = name  # plan-visible name, see _binary_bool_udf
    return F.pandas_udf(_udf, BinaryType())


_intersection_udf = _overlay_udf(ops.intersection, "s2_intersection")
_difference_udf = _overlay_udf(ops.difference, "s2_difference")
_union_udf = _overlay_udf(ops.union, "s2_union")


def s2_intersection(geog1, geog2) -> Column:
    """Overlay A^B with the reference's empty-arg quirk (empty side ->
    returns the other side; src/s2_binary_index_ops.cpp:328-368)."""
    return _intersection_udf(_c(geog1), _c(geog2))


def s2_difference(geog1, geog2) -> Column:
    """Overlay A\\B (src/s2_binary_index_ops.cpp:370-411)."""
    return _difference_udf(_c(geog1), _c(geog2))


def s2_union(geog1, geog2) -> Column:
    """Binary overlay AvB (src/s2_binary_index_ops.cpp:413-448)."""
    return _union_udf(_c(geog1), _c(geog2))


def _batch_distance(s1: pd.Series, s2: pd.Series, slow_fn=None) -> np.ndarray:
    """Distances for the batch: one vectorized chord computation for
    every both-cell-center pair (the common shape after
    s2_cellfromlonlat snapping — the reference's S1ChordAngle fast
    path, src/s2_binary_index_ops.cpp:633-640), per-row shape-index
    math only for the rest. Returns (values, null_mask)."""
    from ..geo import geodesy as gd
    from ..geo.geography import KIND_CELL_CENTER

    s1, s2 = U.coerce_geog(s1), U.coerce_geog(s2)
    n = len(s1)
    out = np.full(n, np.nan, dtype=np.float64)
    nulls = np.zeros(n, dtype=bool)
    ids1 = np.zeros(n, dtype=np.uint64)
    ids2 = np.zeros(n, dtype=np.uint64)
    fast = np.zeros(n, dtype=bool)
    slow: list = []
    for i in range(n):
        b1, b2 = s1.iat[i], s2.iat[i]
        if b1 is None or b2 is None:
            nulls[i] = True
            continue
        b1, b2 = bytes(b1), bytes(b2)
        if (b1[1] & 1) or (b2[1] & 1):
            out[i] = np.inf
            continue
        if (
            b1[0] == KIND_CELL_CENTER
            and b2[0] == KIND_CELL_CENTER
            and b1[2:4] == b"\x01\x00"  # ncov (uint16 LE) == 1
            and b2[2:4] == b"\x01\x00"
            # both-FLAG_CAST pairs take the decoded path: the reference
            # publishes an asymmetric snap-vs-raw golden for that exact
            # shape (geo/ops.py::_cast_pair_chord)
            and not ((b1[1] & 2) and (b2[1] & 2))
        ):
            ids1[i] = int.from_bytes(b1[4:12], "little")
            ids2[i] = int.from_bytes(b2[4:12], "little")
            fast[i] = True
        else:
            slow.append((i, b1, b2))
    if fast.any():
        idx = np.flatnonzero(fast)
        x1 = np.stack(cm.cellid_to_center_xyz(ids1[idx]), axis=1)
        x2 = np.stack(cm.cellid_to_center_xyz(ids2[idx]), axis=1)
        out[idx] = gd.angle(x1, x2) * gd.EARTH_RADIUS_METERS
    slow_fn = slow_fn or ops.distance
    for i, b1, b2 in slow:
        out[i] = slow_fn(U.decode_cached(b1), U.decode_cached(b2))
    return out, nulls


@F.pandas_udf(DoubleType())
def _distance_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    vals, nulls = _batch_distance(s1, s2)
    return U.float_series(
        [None if isnull else float(v) for v, isnull in zip(vals, nulls)]
    )


@F.pandas_udf(DoubleType())
def _max_distance_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    # for two snapped single points max == min == the chord distance,
    # so the vectorized cell-center fast path applies unchanged
    vals, nulls = _batch_distance(s1, s2, slow_fn=ops.max_distance)
    return U.float_series(
        [None if isnull else float(v) for v, isnull in zip(vals, nulls)]
    )


def s2_distance(geog1, geog2) -> Column:
    """Min geodesic distance in meters; empty -> inf
    (src/s2_binary_index_ops.cpp:546-569)."""
    return _distance_udf(_c(geog1), _c(geog2))


def s2_max_distance(geog1, geog2) -> Column:
    """Max geodesic distance in meters (src/s2_binary_index_ops.cpp:571-592)."""
    return _max_distance_udf(_c(geog1), _c(geog2))


@F.pandas_udf(BooleanType())
def _dwithin_udf(s1: pd.Series, s2: pd.Series, dist: pd.Series) -> pd.Series:
    # reuse the batched distance: cell-center pairs vectorize, and the
    # slow path's distance(g1, g2) <= d equals ops.dwithin's contract
    # (both are exact chord comparisons; empties give inf <= d False
    # because _batch_distance returns inf for empty operands)
    vals, nulls = _batch_distance(s1, s2)
    out = np.empty(len(s1), dtype=object)
    for i, (v, isnull) in enumerate(zip(vals, nulls)):
        d = dist.iat[i]
        if isnull or d is None or (d != d):
            out[i] = None
        elif v == np.inf:
            # only empty operands produce inf; the reference returns
            # false for empties even at distance=inf
            # (binary_index_ops.test:156-163)
            out[i] = False
        else:
            out[i] = bool(v <= float(d))
    return pd.Series(out, dtype=object)


def s2_dwithin(geog1, geog2, distance) -> Column:
    """distance(g1, g2) <= meters; empties -> false
    (src/s2_binary_index_ops.cpp:464-543)."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    return _dwithin_udf(_c(geog1), _c(geog2), d.cast(DoubleType()))
