"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
— score every raw document by how much more likely its hashed n-gram
features are under a TARGET distribution (a quality corpus: wiki,
books, a benchmark's domain) than under the RAW pool, then keep the
top-weighted slice. This is the published, production-standard
recipe for targeted pretraining-data selection; it needs only two
bag-of-hashed-n-gram models, so it runs as pure aggregates at any
scale.

Feature map (paper §3): each document's word n-grams (orders 1..n,
default unigrams+bigrams) hash into ``buckets`` integer buckets; a
document is its bucket-count vector. Importance weight:

``log w(doc) = sum_f c_doc(f) * [ln p_target(f) - ln p_raw(f)]``

with add-1 smoothing over the bucket space. In integer micronats
(``round(ln(k)*1e6)`` over integer arguments only — the same exact
cross-engine discipline as :mod:`.lm`):

``w_micro = sum_f c_doc(f) * [lnm(ct_f + 1) - lnm(cr_f + 1)]
            + n_feats * [lnm(Nr + B) - lnm(Nt + B)]``

so weights are exact longs, order-independent, DuckDB-replayable.

100 TB shape: a model is ONE map-side-combinable aggregate producing
at most ``buckets`` rows (a broadcast dimension); scoring is the doc
feature aggregate + two broadcast joins + one per-document sum. No
all-pairs, no Python per-row, no driver data path. The md5 bucket
hash (:func:`..dedup._token_hash` trick) keeps the whole pipeline
under the SQL oracle; pass ``hash_fn='xxhash64'`` for the faster
JVM-intrinsic variant when oracle replay is not needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _token_hash
from .repetition import word_ngrams

__all__ = [
    "hashed_feature_counts",
    "dsir_weights",
    "dsir_topk",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ln_micro(col: Column) -> Column:
    return F.round(F.log(col.cast("double")) * 1e6).cast("long")


def _feature_buckets(
    text, orders: Sequence[int], buckets: int, hash_fn: str
) -> Column:
    """Array of bucket ids for every n-gram occurrence of ``text``
    across the given orders (with multiplicity — DSIR counts
    occurrences, not distinct features)."""
    parts = [
        F.transform(
            F.coalesce(word_ngrams(text, n), F.array().cast("array<string>")),
            lambda g: F.pmod(_token_hash(g, 31, hash_fn), F.lit(buckets)),
        )
        for n in orders
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def hashed_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    orders: Sequence[int] = (1, 2),
    buckets: int = 10_000,
    hash_fn: str = "md5",
) -> DataFrame:
    """The trained bag-of-hashed-n-grams model: ``(bucket, c)`` over
    the whole corpus — at most ``buckets`` rows, the broadcastable
    artifact to persist beside a corpus snapshot. One explode + one
    map-side-combinable count."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    return (
        df.select(
            F.explode(
                _feature_buckets(_c(text_col), orders, buckets, hash_fn)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    df: DataFrame,
    target_counts: DataFrame,
    raw_counts: Optional[DataFrame] = None,
    text_col: str = "text",
    key_col: str = "doc_id",
    orders: Sequence[int] = (1, 2),
    buckets: int = 10_000,
    hash_fn: str = "md5",
    features: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document importance weight ``(key, n_feats, w_micro)`` of
    ``df`` (the raw pool) toward ``target_counts`` (a model from
    :func:`hashed_feature_counts` trained on the TARGET corpus —
    which must use the same ``orders``/``buckets``/``hash_fn``).
    ``raw_counts`` defaults to training on ``df`` itself. Documents
    with no features (shorter than every order) get ``w_micro = 0``.

    Higher ``w_micro`` = more target-like. The weight is an exact
    integer micronat log-ratio (see module docstring), so ranking and
    thresholding are deterministic under any partitioning.

    ``features`` (r11 optimization): a pre-exploded ``(key_col,
    bucket)`` frame — one row per n-gram occurrence, exactly what
    ``df.select(key, explode(_feature_buckets(text, ...)))`` yields.
    Callers that also train models over slices of the same corpus
    materialize the exploded frame once and pass it here, so the
    n-gram hashing is not re-paid per consumer.
    """
    if raw_counts is None:
        raw_counts = hashed_feature_counts(
            df, text_col=text_col, orders=orders, buckets=buckets, hash_fn=hash_fn
        )
    # corpus constants: Nt, Nr (total feature mass of each model).
    # coalesce: an empty model still yields a joinable __k = 0 row.
    consts = (
        target_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("__Nt"))
        .join(
            raw_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("__Nr")).select(
                F.shiftrightunsigned(F.col("__Nr"), 63).cast("int").alias("__j"),
                "__Nr",
            ),
            F.shiftrightunsigned(F.col("__Nt"), 63).cast("int") == F.col("__j"),
        )
        .select(
            F.shiftrightunsigned(F.col("__Nt"), 63).cast("int").alias("__k"),
            (_ln_micro(F.col("__Nr") + buckets) - _ln_micro(F.col("__Nt") + buckets)).alias(
                "__const_micro"
            ),
        )
    )
    t_model = target_counts.select(
        F.col("bucket"), _ln_micro(F.col("c") + 1).alias("__lnt")
    )
    r_model = raw_counts.select(
        F.col("bucket"), _ln_micro(F.col("c") + 1).alias("__lnr")
    )
    if features is not None:
        feats_src = features.select(_c(key_col).alias("__key"), "bucket")
    else:
        feats_src = df.select(
            _c(key_col).alias("__key"),
            F.explode(
                _feature_buckets(_c(text_col), orders, buckets, hash_fn)
            ).alias("bucket"),
        )
    doc_feats = feats_src.groupBy("__key", "bucket").agg(
        F.count(F.lit(1)).alias("__cd")
    )
    per_doc = (
        doc_feats.join(F.broadcast(t_model), "bucket", "left")
        .join(F.broadcast(r_model), "bucket", "left")
        .groupBy("__key")
        .agg(
            F.sum("__cd").alias("__n_feats"),
            F.sum(
                F.col("__cd")
                * (
                    F.coalesce(F.col("__lnt"), F.lit(0))
                    - F.coalesce(F.col("__lnr"), F.lit(0))
                )
            ).alias("__s"),
        )
    )
    scored = (
        per_doc.withColumn(
            "__k", F.shiftrightunsigned(F.col("__n_feats"), 63).cast("int")
        )
        .join(F.broadcast(consts), "__k")
        .select(
            "__key",
            F.col("__n_feats"),
            (F.col("__s") + F.col("__n_feats") * F.col("__const_micro")).alias(
                "__w"
            ),
        )
    )
    keys = df.select(_c(key_col).alias("__key")).distinct()
    return keys.join(scored, "__key", "left").select(
        F.col("__key").alias(key_col),
        F.coalesce(F.col("__n_feats"), F.lit(0)).alias("n_feats"),
        F.coalesce(F.col("__w"), F.lit(0)).alias("w_micro"),
    )


def dsir_topk(
    df: DataFrame,
    target_counts: DataFrame,
    k: int,
    raw_counts: Optional[DataFrame] = None,
    text_col: str = "text",
    key_col: str = "doc_id",
    orders: Sequence[int] = (1, 2),
    buckets: int = 10_000,
    hash_fn: str = "md5",
) -> DataFrame:
    """The selected slice: top-``k`` most target-like documents by
    ``w_micro`` (ties by ascending key — total order, deterministic
    cut). Plans as ``TakeOrderedAndProject``. The paper resamples
    with Gumbel noise; the deterministic top-k is the replayable
    variant (add noise upstream as a column if sampling is wanted)."""
    w = dsir_weights(
        df,
        target_counts,
        raw_counts=raw_counts,
        text_col=text_col,
        key_col=key_col,
        orders=orders,
        buckets=buckets,
        hash_fn=hash_fn,
    )
    return w.orderBy(F.col("w_micro").desc(), F.col(key_col)).limit(k)
