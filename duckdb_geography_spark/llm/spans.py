"""Duplicate-substring span detection — the exact-substring layer of
training-data dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" removes every repeated span >= 50
tokens; document-level MinHash misses partial overlap, which is most
web duplication). This module finds, for every document, the maximal
word spans whose ``k``-word windows also occur elsewhere in the
corpus — the spans that paper's suffix-array pass would cut.

Algorithm (the distributed reformulation of the suffix-array scan):

1. every ``k``-word sliding window of every document becomes a row
   ``(key, pos, h)`` with ``h = md5(window)`` — the same row count a
   word explode produces, shuffled on the 128-bit hash;
2. a window is *duplicated* if its hash occurs >= 2 times corpus-wide
   (an aggregate + semi-join — NOT distinct-doc count, so within-doc
   repetition is caught exactly as the suffix array catches it);
3. per document, overlapping/adjacent duplicated windows merge into
   maximal spans by the gaps-and-islands pattern: a new island starts
   where ``pos - lag(pos) > k``; each island covers words
   ``[min(pos), max(pos) + k)``.

100 TB shape: one explode (windows), one map-side-combinable count on
a uniform 128-bit key, one semi-join back, and one window function
partitioned by document (each document's windows are a few thousand
rows — no skew beyond document length, no all-pairs stage, no Python
anywhere). This is the published scalable alternative to monolithic
suffix arrays, and every step has an exact DuckDB twin (md5 +
lag/sum-over windows), so the gates replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "window_positions",
    "duplicated_windows",
    "duplicate_spans",
    "duplication_stats",
    "remove_duplicate_spans",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _words(text) -> Column:
    return F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda x: x != "")


def window_positions(
    df: DataFrame, k: int, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """``(key, pos, h)`` — every ``k``-word sliding window, 0-based
    word position, ``h = md5`` of the space-rejoined window. Documents
    shorter than ``k`` words contribute nothing. Pure Column:
    sequence + slice + posexplode."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = _words(text_col)
    # sequence(0, n-k) DESCENDS when n < k (and slice would see start
    # 0) — documents shorter than k words must yield an empty array
    wins = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + F.lit(1), k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(_c(key_col).alias("__key"), wins.alias("__wins"))
        .where(F.size("__wins") > 0)
        .select("__key", F.posexplode("__wins").alias("pos", "h"))
        .select(F.col("__key").alias(key_col), "pos", "h")
    )


def duplicated_windows(
    df: DataFrame, k: int, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """The subset of :func:`window_positions` whose window text occurs
    at least twice in the corpus (anywhere — a second document OR a
    second position of the same document). Count-on-hash + semi-join;
    the 128-bit md5 key is uniform, so the shuffle has no skew."""
    pos = window_positions(df, k, text_col=text_col, key_col=key_col)
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("h")
    )
    return pos.join(dup, "h", "left_semi").select(key_col, "pos", "h")


def _merge_islands(
    positions: DataFrame, k: int, key_col: str
) -> DataFrame:
    """Gaps-and-islands merge of ``(key, pos)`` window positions into
    half-open maximal spans ``(key, span_start, span_end, n_windows)``."""
    byo = Window.partitionBy(key_col).orderBy("pos")
    islands = (
        positions.select(key_col, "pos")
        .withColumn(
            "__new",
            (F.col("pos") - F.lag("pos", 1).over(byo) > k).cast("int"),
        )
        .withColumn(
            "__island", F.sum(F.coalesce(F.col("__new"), F.lit(0))).over(byo)
        )
    )
    return (
        islands.groupBy(key_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(key_col, "span_start", "span_end", "n_windows")
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    keep_first: bool = True,
) -> DataFrame:
    """The cleaning transform: cut every duplicated span out of the
    corpus, returning ``df`` with ``text_col`` rewritten (words
    re-joined by single spaces — tokenization here is whitespace-based
    throughout, so downstream stats are unaffected by the collapse).

    With ``keep_first=True`` (the Lee et al. policy) the corpus-wide
    FIRST occurrence of each duplicated window — minimum ``(key, pos)``
    over the window's hash — survives; only the excess occurrences are
    cut, so no content is lost from the corpus, only repeats. With
    ``keep_first=False`` every occurrence is removed (the aggressive
    variant for boilerplate known to be worthless). Granularity is the
    ``k``-word window: a surviving first occurrence whose span overlaps
    an excess one keeps its words (word-level union of kept positions).

    Scale shape: adds ONE min-aggregate on the window hash to the
    :func:`duplicate_spans` plan (owner election — min of a (key,pos)
    struct, map-side combinable), then a per-document array filter;
    still no all-pairs stage and no Python.
    """
    pos = window_positions(df, k, text_col=text_col, key_col=key_col)
    if keep_first:
        owners = (
            pos.groupBy("h")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(F.struct(_c(key_col), F.col("pos"))).alias("__o"),
            )
            .where(F.col("__n") >= 2)
            .select(
                "h",
                F.col("__o").getField(key_col).alias("__okey"),
                F.col("__o").getField("pos").alias("__opos"),
            )
        )
        excess = pos.join(owners, "h").where(
            ~((_c(key_col) == F.col("__okey")) & (F.col("pos") == F.col("__opos")))
        )
    else:
        dup = (
            pos.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= 2)
            .select("h")
        )
        excess = pos.join(dup, "h", "left_semi")
    spans = _merge_islands(excess, k, key_col)
    per_doc = spans.groupBy(key_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    out = df.join(per_doc, key_col, "left")
    words = _words(text_col)
    sp = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    kept = F.filter(
        words,
        lambda x, i: ~F.exists(
            sp, lambda s: (i >= s.getField("span_start")) & (i < s.getField("span_end"))
        ),
    )
    cleaned = F.when(_c(text_col).isNotNull(), F.concat_ws(" ", kept))
    return out.withColumn(text_col, cleaned).drop("__spans")


def duplicate_spans(
    df: DataFrame, k: int, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Maximal duplicated spans ``(key, span_start, span_end, n_windows)``
    — half-open word ranges ``[span_start, span_end)`` produced by
    merging overlapping or touching duplicated ``k``-windows
    (gaps-and-islands: a window at ``pos`` covers ``[pos, pos+k)``, so
    a gap strictly greater than ``k`` between consecutive duplicated
    positions splits the span). ``n_windows`` is the number of
    duplicated windows merged into the span.

    The only window function is partitioned by document key — state is
    bounded by single-document length, never corpus size.
    """
    dups = duplicated_windows(df, k, text_col=text_col, key_col=key_col)
    return _merge_islands(dups, k, key_col)


def duplication_stats(
    df: DataFrame, k: int, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplication summary over ALL documents:
    ``(key, n_words, n_spans, dup_words, dup_frac)`` where
    ``dup_words`` counts words covered by at least one duplicated
    span (spans are disjoint after merging, so it is the exact union
    size) and ``dup_frac = dup_words / n_words`` rounded to 6 dp.
    Documents with no duplicated span report zeros — the direct input
    for a "drop if more than X% duplicated" curation filter."""
    spans = duplicate_spans(df, k, text_col=text_col, key_col=key_col)
    per_doc = spans.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_words"),
    )
    base = df.select(
        _c(key_col).alias(key_col), F.size(_words(text_col)).alias("n_words")
    )
    return base.join(per_doc, key_col, "left").select(
        key_col,
        "n_words",
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.coalesce(F.col("dup_words"), F.lit(0)).alias("dup_words"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.coalesce(F.col("dup_words"), F.lit(0)) / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )
