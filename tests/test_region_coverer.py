"""Faithful S2RegionCoverer port vs the reference's covering goldens
(test/sql/geography/bounds.test:8-16; Fiji geometry from the
reference's public countries fixture)."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_geography_spark.geo.geography import from_wkt
from duckdb_geography_spark.s2 import cellmath as cm
from duckdb_geography_spark.s2.coverer import covering_of_geography

FIJI = (
    "MULTIPOLYGON (((178.3736 -17.33992, 178.12557 -17.50481, 177.67087 -17.38114, "
    "177.28504 -17.72465, 177.38146 -18.16432, 177.93266 -18.28799, 178.55271 -18.15059, "
    "178.71806 -17.62846, 178.3736 -17.33992)), ((-179.917369 -16.501783, "
    "-179.79332 -16.020882, 180 -16.067133, 179.413509 -16.379054, 179.096609 -16.433984, "
    "178.596839 -16.63915, 178.725059 -17.012042, 179.364143 -16.801354, 180 -16.555217, "
    "-179.917369 -16.501783)))"
)


def dbg(cells):
    return list(cm.debug_string(cells))


def test_fiji_adaptive_covering_golden():
    got = dbg(covering_of_geography(from_wkt(FIJI), max_cells=8))
    assert got == [
        "3/13002011",
        "3/1300232",
        "3/130030",
        "3/130031",
        "3/130033",
        "3/130100",
        "3/2032333",
        "3/20330000000",
    ]


def test_fiji_fixed_level_golden():
    got = dbg(covering_of_geography(from_wkt(FIJI), fixed_level=5))
    assert got == ["3/13002", "3/13003", "3/13010", "3/20323", "3/20330"]


def test_covering_is_superset():
    """Every polygon vertex must fall inside some covering cell."""
    g = from_wkt(FIJI)
    cov = covering_of_geography(g, max_cells=8)
    lo, hi = cm.range_min(cov), cm.range_max(cov)
    for rings in g.all_polygons():
        for r in rings:
            leaves = cm.lonlat_to_cellid(r[:, 0], r[:, 1])
            inside = ((lo[None, :] <= leaves[:, None]) & (leaves[:, None] <= hi[None, :])).any(
                axis=1
            )
            assert inside.all()


@pytest.mark.parametrize("max_cells", [1, 4, 12, 64])
def test_covering_budgets(max_cells):
    cov = covering_of_geography(from_wkt(FIJI), max_cells=max_cells)
    assert 1 <= len(cov) <= max(max_cells, 4)
    assert cm.is_valid(cov).all()


def test_multipoint_coarsening_keeps_all_points():
    """Regression: after normalize merges a sibling group 2+ levels up,
    the next coarsening pass must clamp the parent target per cell —
    parent(cell, lev) with lev above the cell's level is the sentinel,
    which normalize would silently discard, dropping whole clusters
    from the covering (false negatives in covering-based predicates)."""
    rng = np.random.default_rng(7)
    pts = np.stack(
        [10.0 + rng.uniform(0, 0.5, 268), 45.0 + rng.uniform(0, 0.5, 268)], axis=1
    )
    wkt = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    g = from_wkt(wkt)
    cov = covering_of_geography(g, max_cells=8)
    assert 1 <= len(cov) <= 8
    leaves = cm.lonlat_to_cellid(pts[:, 0], pts[:, 1])
    lo, hi = cm.range_min(cov), cm.range_max(cov)
    covered = ((lo[None, :] <= leaves[:, None]) & (leaves[:, None] <= hi[None, :])).any(axis=1)
    assert covered.all(), f"{(~covered).sum()} points dropped from covering"


def test_fixed_level_overflow_raises():
    """A covering that cannot fit under the cap at the requested level
    must raise (silently keeping coarser cells would lose equi-join
    candidates in joins.py: a coarse cell never equals a level-L key)."""
    from duckdb_geography_spark.s2.coverer import CoveringOverflowError

    quarter = from_wkt("POLYGON ((0 -45, 90 -45, 90 45, 0 45, 0 -45))")
    with pytest.raises(CoveringOverflowError) as ei:
        covering_of_geography(quarter, fixed_level=8)
    assert ei.value.suggested_level < 8
    # and the suggested level indeed fits
    cov = covering_of_geography(quarter, fixed_level=ei.value.suggested_level)
    assert 0 < len(cov) <= 16384
    assert set(cm.level(cov).tolist()) == {ei.value.suggested_level}


def test_fiji_measures_goldens():
    """BASELINE.md anchors (docs/function-reference.md:79-85,406-412):
    s2_perimeter(Fiji) matches the reference bit-for-bit; s2_area
    differs only in the last ~1.7e-15 relative (summation order of the
    spherical-excess fan vs S2's GetArea), so it is pinned at the mm²
    level (golden 19353593807.95006, engine ...807.950027)."""
    from duckdb_geography_spark.geo import ops

    g = from_wkt(FIJI)
    assert ops.perimeter(g) == 865355.9056990512
    assert abs(ops.area(g) - 19353593807.95006) < 1e-4
