"""Temporal joins a training-data / event-analytics pipeline needs at
scale: as-of joins (latest-reading-before-event) and point-in-interval
range joins. Spark has neither as a built-in logical operator; both are
expressed here as compositions of DataFrame ops whose physical plans
stay scale-safe — the shapes a 1000-executor cluster wants:

- :func:`asof_join` is the union + ordered-window formulation: ONE
  shuffle on the join key, NO join node at all. The sort-merge-join
  alternative (`l JOIN r ON l.k = r.k AND l.t >= r.t` + argmax) first
  materializes every (left, earlier-right) pair — quadratic per key —
  while the window walk is linear in rows and never widens the data.
- :func:`interval_join` is the classic binned range join: intervals
  explode to the fixed-width time bins they span, points compute their
  single containing bin, and the pair space collapses to an EQUI-join
  on (key, bin) plus an exact between refine. A point lives in exactly
  one bin, so no post-join dedup pass is needed. DuckDB runs the same
  query with its IEJoin; naive Spark SQL would fall into a
  BroadcastNestedLoopJoin — the one shape that cannot scale.

Oracle twins: DuckDB ``ASOF JOIN`` / ``BETWEEN`` range join replay the
exact semantics (driver gates ``asof_join`` / ``interval_join``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def _micros(col) -> Column:
    """Epoch micros of a timestamp column; tolerates TIMESTAMP_NTZ
    (parquet nanos-era files surface as NTZ) by casting through the
    session timezone — pin ``spark.sql.session.timeZone`` for
    deterministic results on NTZ inputs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str = "ts",
    right_time: Optional[str] = None,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: Optional[float] = None,
    how: str = "left",
) -> DataFrame:
    """For every left row, attach the single right row with the
    greatest right-time <= left-time (``direction="backward"``; the
    least >= for ``"forward"``), per join key — pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, distributed.

    Output: every left column, plus the right time column and every
    non-key right payload column — NULL where unmatched
    (``how="left"``) or row dropped (``how="inner"``). If the right
    time column's name equals ``left_time`` it is emitted as
    ``"<name>_right"``. Payload column names must be disjoint; rename
    before calling.

    Ties on the right side: among right rows sharing the winning
    (key, time), which one wins is unspecified — pass a deduplicated
    right side (e.g. argmax over a sequence column) for deterministic
    output; the driver gate does exactly that.

    ``tolerance_seconds`` voids matches farther than the given span
    from the left time, mirroring pandas' ``tolerance``.

    100 TB shape: ONE hash exchange on the key columns, one
    within-partition sort, zero join nodes (plan-asserted in
    tests/test_temporal.py). Per-key time order is intrinsic to the
    semantics, so a pathological single hot key serializes into one
    task — pre-split such keys upstream if the timeline itself is
    partitionable.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    reserved = {"__t", "__side", "__r", "__m"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(f"reserved column names in input: {sorted(reserved)}")
    left_payload = [c for c in left.columns if c not in keys]
    right_payload = [c for c in right.columns if c not in keys and c != rt]
    rt_out = f"{rt}_right" if rt in left.columns else rt
    clash = (set(right_payload) | {rt_out}) & set(left_payload)
    if clash:
        raise ValueError(f"overlapping output columns: {sorted(clash)}")

    # ``__t`` is the shared sort axis; ``__side`` breaks time ties so a
    # right row at the exact left time is visible iff exact matches are
    # allowed (window frames are inclusive of the current row, so
    # visibility == sorting before the left row).
    right_first = 0 if allow_exact_matches else 2
    # NULL-time rows can never be an as-of match: a NULL right time
    # would sort FIRST under the ascending window order and become the
    # "latest" match for left rows with no real predecessor
    right = right.where(F.col(rt).isNotNull())
    r_tagged = right.select(
        *keys,
        F.col(rt).alias("__t"),
        F.lit(right_first).alias("__side"),
        F.struct(
            F.col(rt).alias(rt_out),
            *[F.col(c) for c in right_payload],
        ).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *left_payload,
    )
    tagged = r_tagged.unionByName(l_tagged)

    asc = direction == "backward"
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc() if asc else F.col("__t").desc(), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last(struct, ignorenulls): the whole right payload rides in one
    # struct so a NULL inside a matched right row can never splice
    # values from two different right rows
    matched = tagged.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    # a NULL left time matches nothing either (under forward's
    # descending order it would otherwise sort last and see every row)
    matched = matched.withColumn(
        "__m", F.when(F.col("__t").isNotNull(), F.col("__m"))
    )
    if tolerance_seconds is not None:
        span = F.abs(_micros("__t") - _micros(f"__m.{rt_out}"))
        matched = matched.withColumn(
            "__m",
            F.when(span <= F.lit(int(round(tolerance_seconds * 1_000_000))), F.col("__m")),
        )
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())
    return matched.select(
        *keys,
        *left_payload,
        F.col(f"__m.{rt_out}").alias(rt_out),
        *[F.col(f"__m.{c}").alias(c) for c in right_payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_time: str = "ts",
    start: str = "start",
    end: str = "end",
    on: str | Sequence[str] | None = None,
    bin_seconds: int = 3600,
    max_bins: int = 4096,
    how: str = "inner",
) -> DataFrame:
    """Join every point to every interval containing it
    (``start <= t <= end``, closed on both ends), optionally also
    equi-keyed on ``on``. Output: all point columns + all interval
    columns (names must be disjoint apart from the keys). Degenerate
    intervals with ``start > end`` match nothing.

    Implementation is the binned range join: each interval explodes to
    the ``bin_seconds``-wide epoch bins it overlaps, each point
    computes its ONE containing bin, and the join is a plain equi-join
    on (keys..., bin) followed by the exact between refine — no
    cartesian shape anywhere (plan-asserted). Each (point, interval)
    pair meets in exactly one bin (the point's), so the result needs
    no dedup.

    Pick ``bin_seconds`` near the typical interval length: the
    interval side is replicated once per spanned bin (cost ~
    len/bin_seconds per row), while a too-coarse bin widens the refine
    input. ``max_bins`` is the runaway guard — an interval spanning
    more bins fails the query loudly (raise_error) instead of
    silently exploding a task.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(f"overlapping columns: {sorted(clash)}")
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError("reserved column name in input: __bin")
    bw = int(bin_seconds) * 1_000_000
    sbin = (_micros(start) / bw).cast("long")
    ebin = (_micros(end) / bw).cast("long")
    n_bins = ebin - sbin + 1
    guarded = F.when(
        n_bins > max_bins,
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans "),
                n_bins.cast("string"),
                F.lit(f" bins > max_bins={max_bins}; raise bin_seconds"),
            )
        ).cast("long"),
    ).otherwise(n_bins)
    iv = intervals.where(F.col(start) <= F.col(end)).withColumn(
        "__bin", F.explode(F.sequence(sbin, sbin - 1 + guarded))
    )
    pt = points.withColumn("__bin", (_micros(point_time) / bw).cast("long"))
    refine = (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    if how == "inner":
        return pt.join(iv, keys + ["__bin"]).where(refine).drop("__bin")
    # left: keep every point; interval columns NULL where uncontained.
    # The refine must ride in the join condition (a post-filter would
    # drop unmatched-left rows instead of nulling them).
    condition = pt["__bin"] == iv["__bin"]
    for k in keys:
        condition = condition & (pt[k] == iv[k])
    condition = condition & refine
    out = pt.join(iv, condition, "left")
    for c in [iv["__bin"]] + [iv[k] for k in keys]:
        out = out.drop(c)
    return out.drop("__bin")
