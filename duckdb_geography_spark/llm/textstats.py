"""Text-analysis operators for training-data pipelines.

All hot-path functions are **pure Spark Column expressions** (JVM,
codegen, no Python) so they hold up on 100 TB of documents, and each
is written so a DuckDB oracle can express the identical semantics
(the driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "char_count",
    "word_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "mean_word_length",
    "duplicate_word_ratio",
    "digit_ratio",
    "uppercase_ratio",
    "quality_filter",
    "langid",
    "fingerprint_md5",
    "rolling_fingerprint",
    "char_entropy",
    "char_entropy_stats",
    "STOPWORDS",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: small per-language stopword lists for the n-gram/stopword language
#: heuristic — deterministic and SQL-expressible on purpose
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}


def char_count(text) -> Column:
    """Character count (F.length; named for symmetry with the other
    per-document stats)."""
    return F.length(_c(text))


def _words(text) -> Column:
    # split on whitespace runs; empty string -> no tokens
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def token_count(text) -> Column:
    """Whitespace token count (empty -> 0)."""
    return F.size(_words(text))


def word_count(text) -> Column:
    """BPE-ish word-piece count: runs of letters/digits or single
    punctuation marks — a cheap token-count proxy for budget planning."""
    return F.size(F.regexp_extract_all(_c(text), F.lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), 0))


def punct_ratio(text) -> Column:
    """Punctuation chars / total chars (0 for empty docs).

    Uses an explicit character class so Java and RE2 regex agree.
    """
    t = _c(text)
    n = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, "[.,!?;:'\"()\\[\\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def _stopword_hits(text, lang: str) -> Column:
    words = F.transform(_words(text), lambda w: F.lower(w))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def stopword_ratio(text, lang: str = "en") -> Column:
    """Stopword tokens / all tokens (0 for empty docs)."""
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _stopword_hits(text, lang).cast("double") / n.cast("double")
    )


def quality_score(text) -> Column:
    """Deterministic document-quality heuristic in [0, 1]:
    length band + moderate punctuation + stopword presence.

    The exact weights are arbitrary but stable — they form part of the
    oracle contract, not a learned model.
    """
    n = char_count(text).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    p = punct_ratio(text)
    punct_score = F.when(p > 0.3, F.lit(0.0)).otherwise(F.lit(1.0) - p / F.lit(0.3))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * punct_score + F.lit(0.3) * sw_score, 6
    )


def mean_word_length(text) -> Column:
    """Mean whitespace-token length (0 for empty docs) — the Gopher
    2.0..12.0 band is the classic gibberish/code filter."""
    toks = _words(text)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def duplicate_word_ratio(text) -> Column:
    """1 - distinct/total over lowercased whitespace tokens (0 for
    empty docs): high values mean boilerplate/repetition — the cheap
    within-document repetition signal."""
    toks = F.transform(_words(text), lambda w: F.lower(w))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )


def digit_ratio(text) -> Column:
    """Digit chars / total chars (0 for empty docs)."""
    t = _c(text)
    n = F.length(t)
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        digits.cast("double") / n.cast("double")
    )


def uppercase_ratio(text) -> Column:
    """ASCII-uppercase chars / total chars (0 for empty docs)."""
    t = _c(text)
    n = F.length(t)
    ups = n - F.length(F.regexp_replace(t, "[A-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        ups.cast("double") / n.cast("double")
    )


def quality_filter(
    text,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_duplicate_ratio: float = 0.6,
    max_digit_ratio: float = 0.3,
) -> Column:
    """C4/Gopher-style keep/drop decision as one boolean Column —
    token-count band, mean-word-length band, repetition and digit
    caps. Entirely JVM-side: at 100 TB this is a predicate that
    pushes into the scan stage, not a UDF pass."""
    n = token_count(text)
    mwl = mean_word_length(text)
    return (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (duplicate_word_ratio(text) <= max_duplicate_ratio)
        & (digit_ratio(text) <= max_digit_ratio)
    )


def langid(text) -> Column:
    """Stopword-vote language id over {en, de, fr, es}; 'und' when no
    votes. Ties break in fixed key order — same rule the oracle SQL
    implements."""
    hits = {lang: _stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier keys win ties
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_md5(text) -> Column:
    """128-bit content fingerprint (md5 hex) — exact-dup key with a
    byte-identical DuckDB oracle."""
    return F.md5(_c(text).cast("string"))


def rolling_fingerprint(text, mod: int = 144115188075855859) -> Column:
    """Polynomial rolling hash over characters (acc*31 + code mod a
    ~2^57 prime — small enough that acc*31 never overflows a checked
    64-bit multiply in Spark ANSI mode or DuckDB). Pure Column via
    aggregate over the char array."""
    chars = F.split(_c(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(mod),
    )


def char_entropy(text) -> Column:
    """Shannon entropy of the document's CHARACTER distribution in
    nats, pure Column — the cheap detector for encoded blobs, base64
    runs, and single-character padding that length/punct heuristics
    miss (natural prose sits ~2.5-3.2 nats; uniform base64 ~4.1;
    repeated filler ~0).

    Exact cross-engine math: H = ln(n) - (1/n) * sum_x c_x * ln(c_x)
    keeps every ln argument an INTEGER count, each term rounds to
    integer micronats, and only the final division is floating —
    the DuckDB oracle replays it bit-for-bit. Cost is O(n * distinct)
    character comparisons per document (a quality-scan pass, not a
    hot-join path); '' / NULL score 0.0."""
    t = _c(text)
    n = F.length(t)
    chars = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(1)))
    cnt = lambda x: F.size(F.filter(chars, lambda y: y == x)).cast("long")  # noqa: E731
    term = lambda x: cnt(x) * F.round(  # noqa: E731
        F.log(cnt(x).cast("double")) * 1e6
    ).cast("long")
    ssum = F.aggregate(
        F.transform(F.array_distinct(chars), term),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    h = (
        F.round(F.log(n.cast("double")) * 1e6) - ssum.cast("double") / n
    ) / F.lit(1e6)
    return F.when(F.coalesce(n, F.lit(0)) == 0, F.lit(0.0)).otherwise(F.round(h, 6))


def char_entropy_stats(
    df, text_col: str = "text", key_col: str = "doc_id", features=None
):
    """:func:`char_entropy` as a distributed aggregate — the corpus-
    scan form: one character explode + two map-side-combinable hash
    aggregates, ln only over integer counts (JVM expressions, zero
    Python, zero interpreted lambdas — the pure-Column form evaluates
    O(n * distinct) interpreted comparisons per row and is only for
    ad-hoc short strings). Returns ``(key, *features, h_char)``;
    ''/NULL -> 0.0.

    ``features`` (r12, the dsir_weights pattern): an optional mapping
    of output name -> Column computed from the SAME scan. The columns
    ride the per-key branch of the plan (never the character explode),
    so a caller that previously joined its own projection onto this
    result on the primary key gets one scan and one join fewer —
    identical rows by construction (both sides keyed by ``key_col``,
    one row per key on each)."""
    features = dict(features or {})
    key = _c(key_col).alias("__key")
    t = _c(text_col)
    base = df.select(
        key,
        F.coalesce(F.length(t), F.lit(0)).alias("__n"),
        t.alias("__t"),
        *[c.alias(f"__f_{name}") for name, c in features.items()],
    )
    chars = base.where(F.col("__n") > 0).select(
        "__key",
        "__n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n")),
                lambda i: F.col("__t").substr(i, F.lit(1)),
            )
        ).alias("__ch"),
    )
    counts = chars.groupBy("__key", "__n", "__ch").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per = counts.groupBy("__key", "__n").agg(
        F.sum(
            F.col("__c")
            * F.round(F.log(F.col("__c").cast("double")) * 1e6).cast("long")
        ).alias("__s")
    )
    keys = base.select(
        "__key", "__n", *[f"__f_{name}" for name in features]
    )
    return keys.join(per, ["__key", "__n"], "left").select(
        F.col("__key").alias(key_col),
        *[F.col(f"__f_{name}").alias(name) for name in features],
        F.when(F.col("__n") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (
                    F.round(F.log(F.col("__n").cast("double")) * 1e6)
                    - F.col("__s").cast("double") / F.col("__n")
                )
                / F.lit(1e6),
                6,
            )
        )
        .alias("h_char"),
    )
