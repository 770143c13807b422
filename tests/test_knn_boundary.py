"""Generative path-boundary invariant for joins.knn_join (VERDICT r9
item 8): the broadcast all-pairs fast path and the radius-doubling
exact path must be ROW-IDENTICAL on the same inputs, exercised right
at the ``allpairs_right_max`` threshold (probe count == max selects
broadcast; count == max+1 selects radius), with NULL right keys,
duplicate keys, exact distance ties, NULL geographies and EMPTY
geographies mixed in — the invariant the r9 hand-written tests pin
pointwise, made generative.

Beyond-reference operator (the reference engine has no kNN join);
the path-equivalence contract is this repo's own
(joins.py:840-865 documents the tier/tie/NULL semantics shared by
both paths).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_geography_spark import joins as J
from duckdb_geography_spark.functions import cells as CE
from duckdb_geography_spark.functions.casts import s2_cell_center_to_geography
from duckdb_geography_spark.functions.io import s2_geogfromtext

# a coarse lon grid at one latitude makes exact-distance ties common
# (left at 11.0 is equidistant from right rows at 10.0 and 12.0)
_GRID = [10.0, 11.0, 12.0, 13.0]
_LAT = 45.0

# kind: how the row's geography is materialized
_PT, _EMPTY, _NULLGEOG = "pt", "empty", "nullgeog"

_right_row = st.tuples(
    st.one_of(st.none(), st.sampled_from(list("vwxyz"))),  # key (dups + NULLs)
    st.sampled_from([_PT, _PT, _PT, _EMPTY, _NULLGEOG]),
    st.sampled_from(_GRID),
)
_left_kind = st.sampled_from([_PT, _PT, _PT, _EMPTY, _NULLGEOG])


@st.composite
def _scenarios(draw):
    rights = draw(st.lists(_right_row, min_size=1, max_size=6))
    # keep >= 1 real point on the right so the radius loop terminates
    # in a few rounds (the all-empty case is pinned deterministically
    # in test_all_empty_right_side below)
    if not any(kind == _PT for _, kind, _ in rights):
        rights[0] = (rights[0][0], _PT, rights[0][2])
    n_left = draw(st.integers(min_value=1, max_value=3))
    lefts = [
        (f"L{i}", draw(_left_kind), draw(st.sampled_from(_GRID)))
        for i in range(n_left)
    ]
    k = draw(st.integers(min_value=1, max_value=3))
    return rights, lefts, k


def _frame(spark, rows, key_name):
    df = spark.createDataFrame(
        rows, f"{key_name} string, kind string, lon double"
    )
    pt = s2_cell_center_to_geography(
        CE.s2_cellfromlonlat(F.col("lon"), F.lit(_LAT))
    )
    geog = (
        F.when(F.col("kind") == _PT, pt)
        .when(F.col("kind") == _EMPTY, s2_geogfromtext(F.lit("POINT EMPTY")))
        .otherwise(F.lit(None).cast("binary"))
    )
    return df.select(key_name, geog.alias("geog"))


def _rowkey(r):
    return (
        r.a,
        r.knn_rank,
        r.b,
        None if r.knn_distance is None else round(r.knn_distance, 6),
    )


class TestKnnPathBoundary:
    @given(_scenarios())
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_paths_agree_at_threshold(self, spark, scenario):
        rights, lefts, k = scenario
        right = _frame(spark, rights, "b")
        left = _frame(spark, lefts, "a")
        n_r = len(rights)
        # threshold == n_r: the limit(max+1) probe counts n_r <= max
        # -> broadcast all-pairs path
        fast = J.knn_join(
            left, right, k=k, left_key="a", right_key="b",
            allpairs_right_max=n_r,
        )
        # threshold == n_r - 1: probe counts n_r > max -> radius path
        # (0 disables the fast path outright — same selection)
        slow = J.knn_join(
            left, right, k=k, left_key="a", right_key="b",
            allpairs_right_max=n_r - 1, initial_meters=150_000.0,
        )
        assert fast.columns == slow.columns
        got_fast = sorted(map(_rowkey, fast.collect()))
        got_slow = sorted(map(_rowkey, slow.collect()))
        assert got_fast == got_slow, (rights, lefts, k)
        # structural invariants shared by both paths: NULL/EMPTY left
        # geographies emit nothing; live left keys emit at most
        # min(k, live right rows) ranks, contiguous from 1
        live_right = sum(1 for _, kind, _ in rights if kind == _PT)
        live_left = {a for a, kind, _ in lefts if kind == _PT}
        by_left = {}
        for a, rank, _, _ in got_fast:
            by_left.setdefault(a, []).append(rank)
        assert set(by_left) == (live_left if live_right else set())
        for ranks in by_left.values():
            assert sorted(ranks) == list(range(1, min(k, live_right) + 1))

    def test_all_empty_right_side(self, spark):
        """Every right geography NULL or EMPTY: no candidate pairs can
        exist, so both paths return an empty frame with the full
        schema (the radius path must terminate at its full-sphere
        round rather than loop)."""
        rights = [(None, _EMPTY, 10.0), ("x", _NULLGEOG, 11.0)]
        lefts = [("L0", _PT, 10.0)]
        right = _frame(spark, rights, "b")
        left = _frame(spark, lefts, "a")
        fast = J.knn_join(
            left, right, k=2, left_key="a", right_key="b",
            allpairs_right_max=2,
        )
        slow = J.knn_join(
            left, right, k=2, left_key="a", right_key="b",
            allpairs_right_max=0, initial_meters=1_000_000.0,
        )
        assert fast.count() == 0 and slow.count() == 0
        assert "knn_rank" in fast.columns and "knn_rank" in slow.columns
