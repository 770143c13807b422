"""Corpus-trained unigram language-model scoring — the perplexity
quality signal every production curation pipeline runs (CCNet/
RefinedWeb/Dolma use KenLM n-gram perplexity; the unigram LM is its
exactly-SQL-replayable core: out-of-domain or degenerate text scores
high negative log likelihood against the corpus itself).

100 TB shape: training IS one word-count aggregation (map-side
combinable, uniformly-hashed keys); scoring is an equi-join of the
corpus's (word, count) table — a vocabulary-sized dimension that AQE
broadcasts — followed by a per-document aggregate. No Python
anywhere; the log math is JVM expressions.

Determinism: per-word NLL routes through integer micronats
(``round(ln(..) * 1e6)`` over INTEGER log arguments), so the
per-document sum is exact and order-independent — the same
integer-cents trick the TPC-H oracle queries use — and add-alpha
smoothing keeps every ln argument an integer (parity of
``round(ln(k)*1e6)`` between the JVM and DuckDB is pytest-asserted
over the whole count domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unigram_counts",
    "unigram_nll",
    "bigram_counts",
    "bigram_nll",
    "ngram_counts",
    "ngram_nll",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _words(text) -> Column:
    return F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda x: x != "")


def _tok(df: DataFrame, text_col: str, tokens_col: str | None) -> Column:
    """The token-array expression: split ``text_col`` by default, or —
    when ``tokens_col`` names a pre-split array column — reuse it
    verbatim. Callers scoring SEVERAL models over one corpus (uni +
    bi + trigram) tokenize once, materialize, and pass ``tokens_col``
    so the regex split is not re-paid per model per consumer (r11:
    the 3-model gate re-tokenized the corpus ~6x; guide §2.4/§3.3 —
    share the common subtree instead of recomputing it)."""
    if tokens_col is not None:
        return _c(tokens_col)
    return _words(text_col)


def unigram_counts(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """The trained model: corpus word counts ``(word, c)``. One
    explode + one map-side-combinable count. Persist this next to the
    corpus snapshot to score other datasets against it."""
    return (
        df.select(F.explode(_tok(df, text_col, tokens_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    counts: DataFrame | None = None,
    alpha: int = 1,
    exact_micro: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean unigram negative log likelihood (nats/word)
    under the corpus unigram LM with add-``alpha`` smoothing:
    ``nll(w) = ln(N + alpha*V) - ln(c_w + alpha)`` where N = corpus
    token count, V = vocabulary size. Pass ``counts`` (from
    :func:`unigram_counts`, possibly of a DIFFERENT corpus) to score
    against a fixed model; default trains on ``df`` itself.

    ``alpha`` must be a positive integer so every ln argument stays
    integral (exact cross-engine log parity). Returns
    ``(key, n_words, nll)`` with nll in nats/word rounded to 6dp;
    word-less documents score 0.0. ``exact_micro=True`` appends
    ``s_micro`` — the raw integer micronat sum, exact at ANY corpus
    size (the rounded ``nll`` divides two exact integers in doubles,
    so a row can land on a 6dp rounding boundary where independent
    engines disagree by one ulp; the integer column cannot).
    """
    if alpha < 1 or int(alpha) != alpha:
        raise ValueError("alpha must be a positive integer")
    if counts is None:
        counts = unigram_counts(
            df, text_col=text_col, key_col=key_col, tokens_col=tokens_col
        )
    # ln over integer arguments only; micronat rounding makes the
    # per-word value an exact long, so the doc sum is order-free:
    # sum_w (lnA - ln(c_w + a)) == n*lnA - sum(seen ln) - n_unseen*ln(a)
    # exactly, in integer micronats. The corpus-wide constants
    # (ln(N + aV), ln(alpha)) live in a single-row frame attached AFTER
    # the per-doc aggregate (one probe row per document, not per word)
    # via a broadcast HASH join: the key is derived from a data
    # attribute (`__N >>> 63`, always 0 for a non-negative count, and
    # not subject to any arithmetic-simplification rule — `__N * 0`
    # WAS folded) precisely so Catalyst cannot constant-fold the
    # condition away and demote the join to a BroadcastNestedLoopJoin —
    # the no-cartesian plan gate stays unconditional.
    # coalesce: an EMPTY counts model must still produce a joinable
    # __k = 0 row (sum over zero rows is NULL, and a NULL key would
    # silently drop every document from the inner join below —
    # n_words would read 0 instead of the true counts)
    totals = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("__N"),
        F.count(F.lit(1)).alias("__V"),
    ).select(
        F.shiftrightunsigned(F.col("__N"), 63).cast("int").alias("__k"),
        F.round(F.log((F.col("__N") + alpha * F.col("__V")).cast("double")) * 1e6)
        .cast("long")
        .alias("__lna_micro"),
        # unseen words (scoring a different corpus than the model's)
        # get the full smoothed mass: c = 0 -> ln(N + aV) - ln(a)
        F.round(F.log(F.lit(float(alpha))) * 1e6).cast("long").alias("__lnalpha_micro"),
    )
    model = counts.select(
        "word",
        F.round(F.log((F.col("c") + alpha).cast("double")) * 1e6)
        .cast("long")
        .alias("__lnc_micro"),
    )
    words = df.select(
        _c(key_col).alias("__key"),
        F.explode(_tok(df, text_col, tokens_col)).alias("word"),
    )
    per_doc = (
        words.join(model, "word", "left")
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.coalesce(F.col("__lnc_micro"), F.lit(0))).alias("__s_seen"),
            F.sum(F.col("__lnc_micro").isNull().cast("long")).alias("__n_unseen"),
        )
    )
    scored = (
        per_doc.withColumn("__k", F.shiftrightunsigned(F.col("__n"), 63).cast("int"))
        .join(F.broadcast(totals), "__k")
        .select(
            "__key",
            "__n",
            (
                F.col("__n") * F.col("__lna_micro")
                - F.col("__s_seen")
                - F.col("__n_unseen") * F.col("__lnalpha_micro")
            ).alias("__sum_micro"),
        )
    )
    keys = df.select(_c(key_col).alias("__key")).distinct()
    cols = [
        F.col("__key").alias(key_col),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_words"),
        F.round(
            F.coalesce(
                F.col("__sum_micro") / F.col("__n") / F.lit(1e6), F.lit(0.0)
            ),
            6,
        ).alias("nll"),
    ]
    if exact_micro:
        cols.append(
            F.coalesce(F.col("__sum_micro"), F.lit(0))
            .cast("long")
            .alias("s_micro")
        )
    return keys.join(scored, "__key", "left").select(*cols)


def _transitions(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n: int = 2,
    tokens_col: str | None = None,
) -> DataFrame:
    """(key, prev, cur) word transitions within each document, where
    ``prev`` is the space-joined (n-1)-word context — an array-lambda
    pairing (no window, no self-join): documents with fewer than ``n``
    words contribute nothing. For n=2 ``prev`` is the single previous
    word."""
    if n < 2:
        raise ValueError("n must be >= 2 (use unigram_nll for n=1)")
    words = df.select(
        _c(key_col).alias("__key"), _tok(df, text_col, tokens_col).alias("__w")
    )
    pairs = F.expr(
        f"transform(slice(__w, 1, greatest(size(__w) - {n - 1}, 0)), "
        f"(x, i) -> struct(concat_ws(' ', slice(__w, i + 1, {n - 1})) AS prev, "
        f"element_at(__w, i + {n}) AS cur))"
    )
    return words.select("__key", F.explode(pairs).alias("__t")).select(
        "__key", F.col("__t.prev").alias("prev"), F.col("__t.cur").alias("cur")
    )


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """The trained n-gram model: corpus transition counts
    ``(prev, cur, c)`` with ``prev`` the (n-1)-word context — one
    explode + one map-side-combinable count (the same ingest-time
    shape as :func:`unigram_counts`)."""
    return (
        _transitions(df, text_col, key_col, n, tokens_col=tokens_col)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_counts(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """:func:`ngram_counts` at n=2."""
    return ngram_counts(df, 2, text_col=text_col, key_col=key_col)


def ngram_nll(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
    counts: DataFrame | None = None,
    alpha: int = 1,
    exact_micro: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean n-gram negative log likelihood (nats per
    transition) under an add-``alpha`` n-gram LM with an (n-1)-word
    context — the CCNet/KenLM perplexity-filter shape, with the same
    integer-micronat determinism as :func:`unigram_nll`:

    ``nll(cur | prev) = ln(c(prev, ·) + alpha*V) - ln(c(prev, cur) + alpha)``

    where ``c(prev, ·)`` sums the model's transitions out of ``prev``
    and V is the model's distinct-``cur`` vocabulary. Unseen contexts
    cost ``ln(alpha*V) - ln(alpha)``. Pass ``counts`` (from
    :func:`bigram_counts`, possibly of a different corpus) to score
    against a fixed model; default trains on ``df`` itself. Returns
    ``(key, n_trans, nll)``; documents with fewer than ``n`` words
    have zero transitions and score 0.0.

    100 TB shape: transitions explode once; the model attach is two
    LEFT equi-joins (bigram table on (prev, cur), context table on
    prev — both uniformly hashed, AQE-broadcastable); the corpus
    constants ride the usual single-row non-foldable-key broadcast
    hash join AFTER the per-doc aggregate. Zero Python anywhere.
    """
    if alpha < 1 or int(alpha) != alpha:
        raise ValueError("alpha must be a positive integer")
    if counts is None:
        counts = ngram_counts(
            df, n, text_col=text_col, key_col=key_col, tokens_col=tokens_col
        )
    ctx = counts.groupBy("prev").agg(F.sum("c").alias("__cprev"))
    totals = counts.agg(
        F.coalesce(F.count_distinct("cur"), F.lit(0)).alias("__V"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("__N"),
    ).select(
        F.shiftrightunsigned(F.col("__N"), 63).cast("int").alias("__k"),
        # unseen-context mass ln(alpha*V); ln of the integer argument
        # keeps cross-engine parity. An EMPTY model has V = 0 -> ln(0)
        # is NULL -> nll coalesces to 0.0 while n_trans stays true.
        F.round(F.log((F.lit(alpha) * F.col("__V")).cast("double")) * 1e6)
        .cast("long")
        .alias("__lnav_micro"),
        F.round(F.log(F.lit(float(alpha))) * 1e6).cast("long").alias("__lnalpha_micro"),
        F.col("__V"),
    )
    model = counts.select(
        "prev",
        "cur",
        F.round(F.log((F.col("c") + alpha).cast("double")) * 1e6)
        .cast("long")
        .alias("__lnc_micro"),
    )
    trans = _transitions(df, text_col, key_col, n, tokens_col=tokens_col)
    # ln(c(prev,·) + alpha*V) needs V per transition row; V is a corpus
    # constant, so attach it to the TRANSITIONS via the non-foldable
    # constant key before aggregating (one extra broadcast hash join on
    # the per-transition frame — unavoidable, the ln argument mixes a
    # per-row count with the corpus constant).
    trans_k = (
        trans.join(model, ["prev", "cur"], "left")
        .join(ctx, ["prev"], "left")
        .withColumn("__k", F.shiftrightunsigned(F.coalesce(F.col("__cprev"), F.lit(0)), 63).cast("int"))
        .join(F.broadcast(totals.select("__k", "__V")), "__k")
        .withColumn(
            "__lnprev_micro",
            F.round(
                F.log((F.coalesce(F.col("__cprev"), F.lit(0)) + alpha * F.col("__V")).cast("double"))
                * 1e6
            ).cast("long"),
        )
    )
    per_doc = trans_k.groupBy("__key").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__lnprev_micro")).alias("__s_prev"),
        F.sum(F.coalesce(F.col("__lnc_micro"), F.lit(0))).alias("__s_c"),
        F.sum(F.col("__lnc_micro").isNull().cast("long")).alias("__n_c_unseen"),
    )
    scored = (
        per_doc.withColumn("__k", F.shiftrightunsigned(F.col("__n"), 63).cast("int"))
        .join(F.broadcast(totals.select("__k", "__lnalpha_micro")), "__k")
        .select(
            "__key",
            "__n",
            (
                F.col("__s_prev")
                - F.col("__s_c")
                - F.col("__n_c_unseen") * F.col("__lnalpha_micro")
            ).alias("__sum_micro"),
        )
    )
    keys = df.select(_c(key_col).alias("__key")).distinct()
    cols = [
        F.col("__key").alias(key_col),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_trans"),
        F.round(
            F.coalesce(F.col("__sum_micro") / F.col("__n") / F.lit(1e6), F.lit(0.0)),
            6,
        ).alias("nll"),
    ]
    if exact_micro:
        cols.append(
            F.coalesce(F.col("__sum_micro"), F.lit(0))
            .cast("long")
            .alias("s_micro")
        )
    return keys.join(scored, "__key", "left").select(*cols)


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    counts: DataFrame | None = None,
    alpha: int = 1,
    exact_micro: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """:func:`ngram_nll` at n=2 (single-word context)."""
    return ngram_nll(
        df, 2, text_col=text_col, key_col=key_col, counts=counts, alpha=alpha,
        exact_micro=exact_micro, tokens_col=tokens_col,
    )
