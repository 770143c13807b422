"""Linear text classification scoring — the fasttext-style
bag-of-words quality/topic filter a curation pipeline runs over every
document (score = bias + sum over tokens of tf(word) * weight(word)),
with the weights trained offline and applied at corpus scale.

100 TB shape: the vocabulary is a broadcast table (a trained filter
has 10^4-10^6 terms — dimension-table-sized), term frequencies are one
map-side-combinable hash aggregate over the tokenized corpus, and the
dot product is the broadcast join + one per-document sum; attaching
zero-match documents is an equi-join on the corpus primary key. No
Python in any per-row path, nothing driver-side except the weight
literals.

Determinism (the integer-micro discipline of :mod:`.retrieval` /
:mod:`.lm`): weights are quantized ONCE driver-side to micro-units
(``round(w * 1e6)`` longs), so every per-term contribution
``tf * w_micro`` and the per-document sum are exact integers — order-
free and bit-replayable by the DuckDB oracle.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import term_frequencies

__all__ = ["linear_text_score", "linear_text_filter"]


def _weights_micro(weights: Mapping[str, float]) -> list:
    if not weights:
        raise ValueError("linear_text_score: weights must be non-empty")
    return [(w, int(round(float(v) * 1e6))) for w, v in sorted(weights.items())]


def linear_text_score(
    df: DataFrame,
    weights: Mapping[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Score EVERY document with a sparse linear model over whitespace
    tokens: ``(key, n_matched, score_micro)`` where ``score_micro =
    round(bias*1e6) + sum tf(word) * round(weight*1e6)`` — exact
    integers on both engines. Documents matching no vocabulary term
    (including NULL/empty text) carry the bias alone with
    ``n_matched = 0``; the corpus key must be unique.

    Plan: tokenize -> tf hash aggregate (substring-containment scan
    prefilter like :func:`~.retrieval.bm25_scores` when the vocabulary
    is small enough to inline, i.e. always for hand-sized filters;
    larger vocabularies skip the prefilter and stream every document
    through the explode) -> broadcast join on the vocabulary -> one
    per-document sum -> primary-key equi-join back to the corpus.
    """
    wm = _weights_micro(weights)
    bias_micro = int(round(float(bias) * 1e6))
    spark = df.sparkSession
    vocab = spark.createDataFrame(wm, "word string, w_micro long")

    src = df
    if len(wm) <= 64:
        # substring containment is a superset of token membership: the
        # explode only runs on documents that can possibly match; the
        # zero-match join below still scores the skipped ones
        contains_any = F.col(text_col).contains(wm[0][0])
        for w, _ in wm[1:]:
            contains_any = contains_any | F.col(text_col).contains(w)
        src = df.where(F.col(text_col).isNotNull() & contains_any)
    tf = term_frequencies(src, text_col=text_col, key_col=key_col)
    scored = (
        tf.join(F.broadcast(vocab), "word")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("__dot"),
        )
    )
    return df.select(key_col).join(scored, key_col, "left").select(
        key_col,
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        (F.coalesce("__dot", F.lit(0)) + F.lit(bias_micro))
        .cast("long")
        .alias("score_micro"),
    )


def linear_text_filter(
    df: DataFrame,
    weights: Mapping[str, float],
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep the documents the linear model scores at or above
    ``threshold`` (compared in exact micro-units) — the curation
    keep/drop step. Returns the original columns plus ``score_micro``."""
    s = linear_text_score(
        df, weights, bias=bias, text_col=text_col, key_col=key_col
    )
    thr = int(round(float(threshold) * 1e6))
    keep = s.where(F.col("score_micro") >= thr).select(key_col, "score_micro")
    return df.join(keep, key_col)
