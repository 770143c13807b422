"""asof_join / interval_join: randomized cross-checks against pandas
merge_asof and DuckDB's native ASOF/IEJoin, plus the plan-shape
guarantees (no join node in asof, no cartesian in interval_join)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from duckdb_geography_spark.temporal import asof_join, interval_join


def _mk_frames(seed: int, n_left=400, n_right=300, n_keys=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_left), unit="s"),
            "lval": rng.integers(0, 1000, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "rts": base + pd.to_timedelta(rng.integers(0, 10**6, n_right), unit="s"),
            "rval": rng.integers(0, 1000, n_right),
        }
    )
    # dedup right per (k, rts) so the winner is well-defined
    right = right.sort_values(["k", "rts", "rval"]).drop_duplicates(
        ["k", "rts"], keep="last"
    )
    # force some exact-tie timestamps across sides
    right.iloc[0, right.columns.get_loc("rts")] = left["ts"].iloc[0]
    return left, right


def _pandas_asof(left, right, direction, allow_exact, tolerance=None):
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    return out


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas(spark, direction, allow_exact):
    left, right = _mk_frames(seed=42)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="ts",
        right_time="rts",
        direction=direction,
        allow_exact_matches=allow_exact,
    ).toPandas()
    want = _pandas_asof(left, right, direction, allow_exact)
    assert _norm(got).equals(_norm(want)), f"{direction}/{allow_exact}"


def test_asof_tolerance_and_inner(spark):
    left, right = _mk_frames(seed=7)
    tol = 50_000.0
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="ts",
        right_time="rts",
        tolerance_seconds=tol,
    ).toPandas()
    want = _pandas_asof(left, right, "backward", True, tolerance=tol)
    assert _norm(got).equals(_norm(want))
    inner = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="ts",
        right_time="rts",
        tolerance_seconds=tol,
        how="inner",
    ).toPandas()
    assert len(inner) == int(want["rts"].notna().sum())
    assert inner["rts"].notna().all()


def test_asof_matches_duckdb_asof_join(spark):
    left, right = _mk_frames(seed=3)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="ts",
        right_time="rts",
    ).toPandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql(
        """
        SELECT l.k, l.ts, l.lval, r.rts, r.rval
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.rts
        """
    ).df()
    assert _norm(got).equals(_norm(want))


def test_asof_same_time_name_and_shared_key_collision(spark):
    left, right = _mk_frames(seed=9)
    right2 = right.rename(columns={"rts": "ts"})
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right2),
        on="k",
        left_time="ts",
    ).toPandas()
    assert "ts_right" in got.columns
    want = _pandas_asof(left, right, "backward", True).rename(
        columns={"rts": "ts_right"}
    )
    assert _norm(got).equals(_norm(want))
    with pytest.raises(ValueError, match="overlapping"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(left),
            on="k",
            left_time="ts",
        )


def test_asof_plan_has_no_join_node(spark):
    left, right = _mk_frames(seed=1)
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="ts",
        right_time="rts",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window only
    assert plan.count("Exchange") <= 2  # one hash exchange (+AQE read)


def _mk_intervals(seed: int, n_pts=500, n_iv=120, n_keys=5):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_pts),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_pts), unit="s"),
            "pval": rng.integers(0, 100, n_pts),
        }
    )
    s = rng.integers(0, 10**6, n_iv)
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_iv),
            "iv_id": np.arange(n_iv),
            "start": base + pd.to_timedelta(s, unit="s"),
            "end": base + pd.to_timedelta(s + rng.integers(0, 20000, n_iv), unit="s"),
        }
    )
    return pts, iv


@pytest.mark.parametrize("keyed", [True, False])
def test_interval_join_matches_duckdb(spark, keyed):
    pts, iv = _mk_intervals(seed=11)
    iv_in = iv if keyed else iv.rename(columns={"k": "k_iv"})
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv_in),
        on="k" if keyed else None,
        bin_seconds=7200,
    ).toPandas()
    con = duckdb.connect()
    con.register("p", pts)
    con.register("iv", iv)
    key_pred = "AND p.k = iv.k" if keyed else ""
    cols = (
        "p.k, p.ts, p.pval, iv.iv_id, iv.start, iv.\"end\""
        if keyed
        else 'p.k, p.ts, p.pval, iv.k AS k_iv, iv.iv_id, iv.start, iv."end"'
    )
    want = con.sql(
        f"""
        SELECT {cols} FROM p JOIN iv
          ON p.ts BETWEEN iv.start AND iv."end" {key_pred}
        """
    ).df()
    assert _norm(got).equals(_norm(want))


def test_interval_join_left_and_guard(spark):
    pts, iv = _mk_intervals(seed=13)
    out = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        on="k",
        bin_seconds=7200,
        how="left",
    ).toPandas()
    inner = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        on="k",
        bin_seconds=7200,
    ).toPandas()
    # every point appears; matched rows equal the inner join
    assert set(pts["ts"].astype(str)) <= set(out["ts"].astype(str))
    assert len(out[out["iv_id"].notna()]) == len(inner)
    # runaway guard fires for an interval spanning too many bins
    with pytest.raises(Exception, match="max_bins"):
        interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            on="k",
            bin_seconds=60,
            max_bins=3,
        ).count()


def test_interval_join_plan_no_cartesian(spark):
    pts, iv = _mk_intervals(seed=17)
    for how in ("inner", "left"):
        df = interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            on="k",
            bin_seconds=7200,
            how=how,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_asof_null_times_never_match(spark):
    """NULL right-times must not masquerade as the earliest match, and
    NULL left-times must match nothing (both directions)."""
    import pandas as pd

    left = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": [pd.Timestamp("2024-01-05"), pd.NaT],
            "lval": [10, 20],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "rts": [pd.NaT, pd.Timestamp("2024-01-07")],
            "rval": [111, 222],
        }
    )
    for direction, want in (("backward", None), ("forward", 222)):
        out = {
            r["lval"]: r
            for r in asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="k",
                left_time="ts",
                right_time="rts",
                direction=direction,
            ).collect()
        }
        # real left row: backward has no predecessor (the NULL-time
        # right row must NOT stand in); forward matches the real row
        assert out[10]["rval"] == want, direction
        # NULL-time left row: never matches
        assert out[20]["rval"] is None, direction


def test_asof_integer_time_axis(spark):
    """The time axis is any orderable type — sequence numbers work;
    tolerance (micros-based) is the only timestamp-bound feature."""
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")], "k int, ts long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10, "R10"), (1, 15, "R15"), (2, 99, "R99")],
        "k int, rts long, rv string",
    )
    out = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_time="ts", right_time="rts"
        ).collect()
    }
    assert out == {"L1": "R10", "L2": "R15", "L3": None}
