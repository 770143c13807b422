"""Repetition / boilerplate signals for training-data curation.

Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", table A1)
operate on word n-grams at two granularities:

- **within-document**: the fraction of a document's characters covered
  by its most frequent word n-gram (``top_ngram_stats``) and by all
  duplicated word n-grams (``dup_ngram_stats``). High values mark
  degenerate, looping, or boilerplate-heavy text.
- **across-corpus**: word n-grams that recur in many *documents*
  (``boilerplate_ngrams``) — navigation chrome, license headers,
  templated text — and each document's fraction of such n-grams
  (``boilerplate_frac``).

100 TB shape: every operator here is explode -> hash-aggregate ->
equi-join on the document key — map-side combinable shuffles on
uniformly distributed keys, no all-pairs stage, no Python in any
per-row path (pure Column expressions end to end). The n-gram
explosion is width * n rows per document, the same working set every
production quality-filter pipeline (Gopher, Dolma, RedPajama-v2)
shuffles at this stage.

Determinism: ties for the most frequent n-gram are broken by the
lexicographically greatest gram (``max(struct(count, gram))``), so
results are stable across partitionings and replayable by the
DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "top_ngram_stats",
    "dup_ngram_stats",
    "repetition_signals",
    "boilerplate_ngrams",
    "boilerplate_frac",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def word_ngrams(text, n: int) -> Column:
    """Array of space-joined word ``n``-grams of ``text`` (sliding
    window over whitespace-split words), pure Column. A document with
    fewer than ``n`` words yields an empty array; NULL text yields
    NULL (callers explode, so both vanish)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # split(trim(''), '\s+') is [''] (one empty word), which would give
    # n=1 a phantom '' gram on empty/whitespace-only text — filter it
    w = F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + F.lit(1), n)),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.when(_c(text).isNotNull(), F.array().cast("array<string>"))
    )


def top_ngram_stats(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document most-frequent word ``n``-gram and the fraction of
    the document's characters its (sliding-window) occurrences cover —
    Gopher's ``top_n_gram_char_frac`` signal, capped at 1.0 because
    overlapping occurrences can double-count characters.

    Returns ``(key, top_gram, top_count, top_ngram_char_frac)``; a
    document with no ``n``-gram (too short / NULL text) keeps a NULL
    gram, zero count, 0.0 fraction. Two map-side-combinable shuffles
    on (key, gram) then key — no skew risk beyond the document key
    itself."""
    base = df.select(
        _c(key_col).alias("__key"),
        F.length(F.coalesce(_c(text_col), F.lit(""))).alias("__nc"),
        word_ngrams(text_col, n).alias("__gs"),
    )
    counts = (
        base.select("__key", "__nc", F.explode("__gs").alias("__g"))
        .groupBy("__key", "__nc", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    top = counts.groupBy("__key", "__nc").agg(
        F.max(F.struct(F.col("__cnt"), F.col("__g"))).alias("__top")
    )
    # left join back so gram-less documents keep a row
    keys = base.select("__key", "__nc").distinct()
    return keys.join(top, ["__key", "__nc"], "left").select(
        F.col("__key").alias(key_col),
        F.col("__top.__g").alias("top_gram"),
        F.coalesce(F.col("__top.__cnt"), F.lit(0)).alias("top_count"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("__top.__cnt"), F.lit(0))
                * F.length(F.coalesce(F.col("__top.__g"), F.lit("")))
                / F.greatest(F.col("__nc"), F.lit(1)),
            ),
            6,
        ).alias("top_ngram_char_frac"),
    )


def dup_ngram_stats(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document fraction of characters inside *duplicated* word
    ``n``-grams — Gopher's ``dup_n_gram_char_frac`` family. For every
    distinct gram occurring ``c >= 2`` times we charge ``c * len(gram)``
    characters (the standard sliding-window approximation, which
    over-counts overlaps, hence the 1.0 cap).

    Returns ``(key, dup_ngram_count, dup_ngram_char_frac)``. One
    (key, gram) hash-aggregate then one key aggregate, both map-side
    combinable."""
    base = df.select(
        _c(key_col).alias("__key"),
        F.length(F.coalesce(_c(text_col), F.lit(""))).alias("__nc"),
        word_ngrams(text_col, n).alias("__gs"),
    )
    counts = (
        base.select("__key", "__nc", F.explode("__gs").alias("__g"))
        .groupBy("__key", "__nc", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    dup = counts.where(F.col("__cnt") >= 2).groupBy("__key", "__nc").agg(
        F.count(F.lit(1)).alias("__ndup"),
        F.sum(F.col("__cnt") * F.length("__g")).alias("__dupchars"),
    )
    keys = base.select("__key", "__nc").distinct()
    return keys.join(dup, ["__key", "__nc"], "left").select(
        F.col("__key").alias(key_col),
        F.coalesce(F.col("__ndup"), F.lit(0)).alias("dup_ngram_count"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("__dupchars"), F.lit(0))
                / F.greatest(F.col("__nc"), F.lit(1)),
            ),
            6,
        ).alias("dup_ngram_char_frac"),
    )


def repetition_signals(
    df: DataFrame,
    top_n: int = 2,
    dup_n: int = 5,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """:func:`top_ngram_stats` (``top_n``-grams) and
    :func:`dup_ngram_stats` (``dup_n``-grams) in one frame — the two
    headline Gopher repetition signals, ready to feed a quality-filter
    predicate.

    When ``top_n == dup_n`` the whole thing is ONE n-gram explode, one
    (key, gram) count, and one key aggregate producing all four
    signals — half the explode work and a third of the shuffles of the
    two-call form (which remains for distinct n's, where the gram sets
    genuinely differ)."""
    if top_n != dup_n:
        t = top_ngram_stats(df, n=top_n, text_col=text_col, key_col=key_col)
        d = dup_ngram_stats(df, n=dup_n, text_col=text_col, key_col=key_col)
        return t.join(d, key_col)
    n = top_n
    base = df.select(
        _c(key_col).alias("__key"),
        F.length(F.coalesce(_c(text_col), F.lit(""))).alias("__nc"),
        word_ngrams(text_col, n).alias("__gs"),
    )
    counts = (
        base.select("__key", "__nc", F.explode("__gs").alias("__g"))
        .groupBy("__key", "__nc", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    agg = counts.groupBy("__key", "__nc").agg(
        F.max(F.struct(F.col("__cnt"), F.col("__g"))).alias("__top"),
        F.count(F.when(F.col("__cnt") >= 2, F.lit(1))).alias("__ndup"),
        F.sum(
            F.when(F.col("__cnt") >= 2, F.col("__cnt") * F.length("__g"))
        ).alias("__dupchars"),
    )
    keys = base.select("__key", "__nc").distinct()
    return keys.join(agg, ["__key", "__nc"], "left").select(
        F.col("__key").alias(key_col),
        F.col("__top.__g").alias("top_gram"),
        F.coalesce(F.col("__top.__cnt"), F.lit(0)).alias("top_count"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("__top.__cnt"), F.lit(0))
                * F.length(F.coalesce(F.col("__top.__g"), F.lit("")))
                / F.greatest(F.col("__nc"), F.lit(1)),
            ),
            6,
        ).alias("top_ngram_char_frac"),
        F.coalesce(F.col("__ndup"), F.lit(0)).alias("dup_ngram_count"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("__dupchars"), F.lit(0))
                / F.greatest(F.col("__nc"), F.lit(1)),
            ),
            6,
        ).alias("dup_ngram_char_frac"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 6,
    min_df: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate detector: word ``n``-grams whose
    *document frequency* (number of distinct documents containing
    them) is ``>= min_df``. Returns ``(gram, doc_freq)``.

    Shape: explode -> per-doc distinct (dropDuplicates on the
    (key, gram) hash) -> gram count. Both shuffles key on the gram or
    (key, gram) — uniformly distributed; at corpus scale the
    per-doc-distinct step is exactly the inverted-index build every
    boilerplate / contamination pipeline pays once."""
    per_doc = (
        df.select(_c(key_col).alias("__key"), F.explode(word_ngrams(text_col, n)).alias("gram"))
        .dropDuplicates(["__key", "gram"])
    )
    return per_doc.groupBy("gram").agg(F.count(F.lit(1)).alias("doc_freq")).where(
        F.col("doc_freq") >= min_df
    )


def boilerplate_frac(
    df: DataFrame,
    n: int = 6,
    min_df: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
    grams: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document fraction of its distinct word ``n``-grams that are
    corpus boilerplate (document frequency ``>= min_df``, per
    :func:`boilerplate_ngrams` — pass ``grams`` to reuse a
    pre-computed table, e.g. one persisted from a previous corpus
    snapshot).

    Returns ``(key, n_grams, n_boiler, boilerplate_frac)``; documents
    too short for any gram get ``(0, 0, 0.0)``. The hit join is a
    gram-keyed equi-join against the (already df-filtered, much
    smaller) boilerplate table — broadcastable when min_df prunes
    hard, AQE decides."""
    # build the per-doc distinct-gram table ONCE: it feeds the hit
    # join, the totals aggregate, and — when no precomputed grams
    # table is passed — the boilerplate table itself (bit-identical to
    # boilerplate_ngrams: same explode, same dropDuplicates, same
    # count). Sharing ONE expression tree lets runtime ReuseExchange
    # dedup the explode + per-doc-distinct shuffle across all three
    # consumers. Do NOT localCheckpoint here: measured at sf1, the
    # checkpoint materialization of the corpus-sized gram table ran
    # 4-7x SLOWER than the reused exchange (r11, guide §1: a fresh
    # "ideal" plan is often slower because of a gotcha).
    per_doc = (
        df.select(_c(key_col).alias("__key"), F.explode(word_ngrams(text_col, n)).alias("gram"))
        .dropDuplicates(["__key", "gram"])
    )
    if grams is None:
        grams = (
            per_doc.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .where(F.col("doc_freq") >= min_df)
        )
    hits = (
        per_doc.join(grams.select("gram"), "gram")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__nboiler"))
    )
    totals = per_doc.groupBy("__key").agg(F.count(F.lit(1)).alias("__ngrams"))
    keys = df.select(_c(key_col).alias("__key")).distinct()
    return (
        keys.join(totals, "__key", "left")
        .join(hits, "__key", "left")
        .select(
            F.col("__key").alias(key_col),
            F.coalesce(F.col("__ngrams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("__nboiler"), F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce(F.col("__nboiler"), F.lit(0))
                / F.greatest(F.coalesce(F.col("__ngrams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("boilerplate_frac"),
        )
    )
