"""SQL-surface registration for the LLM text layer — every scalar
text/quality/prep function as a Spark 4 SQL scalar function
(``CREATE FUNCTION ... RETURN <expr>``), so ``spark.sql`` users get
the SAME pure-JVM expressions as the DataFrame API (no Python stage;
the same trick functions/register.py uses for the cell bit ops).

Two tiers:
- functions whose Column tree round-trips through
  ``Expression.sql()`` are registered from the live expression —
  zero duplication, can never drift;
- functions built on higher-order lambdas (``Expression.sql()``
  prints ``lambdafunction(...)`` which does not re-parse) carry a
  hand-written SQL body with ``x ->`` lambda syntax; a parity test
  (tests/test_repetition.py::TestLlmSqlSurface) asserts SQL == Column
  over a randomized corpus for every registered function, so a drift
  in either tier fails CI.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import prep as PR
from . import textstats as T
from . import web as WB

__all__ = ["register_llm_sql_functions", "LLM_SQL_FUNCTIONS"]

#: words helper as an inline SQL fragment (empty text -> empty array)
_W = "if(length(trim(t)) = 0, array(), split(trim(t), '\\\\s+'))"


def _sw_array(lang: str) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + ")"


def _hits(lang: str) -> str:
    return (
        f"size(filter(transform({_W}, w -> lower(w)), "
        f"w -> array_contains({_sw_array(lang)}, w)))"
    )


def _stopword_ratio_sql() -> str:
    return (
        f"if(size({_W}) = 0, 0.0D, "
        f"cast({_hits('en')} AS DOUBLE) / cast(size({_W}) AS DOUBLE))"
    )


def _mean_word_length_sql() -> str:
    return (
        f"if(size({_W}) = 0, 0.0D, "
        f"cast(aggregate({_W}, 0L, (acc, w) -> acc + length(w)) AS DOUBLE)"
        f" / cast(size({_W}) AS DOUBLE))"
    )


def _duplicate_word_ratio_sql() -> str:
    low = f"transform({_W}, w -> lower(w))"
    return (
        f"if(size({_W}) = 0, 0.0D, "
        f"1.0D - cast(size(array_distinct({low})) AS DOUBLE)"
        f" / cast(size({_W}) AS DOUBLE))"
    )


def _quality_score_sql() -> str:
    # mirrors textstats.quality_score term by term, reusing the
    # already-registered punct_ratio/stopword_ratio SQL functions so
    # the regex/stopword logic exists in exactly one place
    len_score = "least(cast(length(t) AS DOUBLE) / 500.0D, 1.0D)"
    punct = "__PFX__punct_ratio(t)"
    punct_score = f"case when {punct} > 0.3D then 0.0D else 1.0D - {punct} / 0.3D end"
    sw_score = "least(__PFX__stopword_ratio(t) * 5.0D, 1.0D)"
    return f"round(0.4D * {len_score} + 0.3D * {punct_score} + 0.3D * {sw_score}, 6)"


def _langid_sql() -> str:
    langs = list(T.STOPWORDS)
    hits = {lang: _hits(lang) for lang in langs}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    expr = "'und'"
    for lang in reversed(langs):  # earlier keys win ties
        expr = (
            f"case when {hits[lang]} = __b AND __b > 0 then '{lang}' "
            f"else {expr} end"
        )
    # bind best once via a lateral-style substitution: SQL scalar
    # functions have no LET, so inline it (greatest is cheap)
    return expr.replace("__b", best)


def _rolling_fingerprint_sql(mod: int = 144115188075855859) -> str:
    return (
        f"aggregate(split(t, ''), 0L, "
        f"(acc, ch) -> (acc * 31L + ascii(ch)) % {mod}L)"
    )


#: name -> (result SQL type, Column builder or hand-written SQL body)
LLM_SQL_FUNCTIONS = {
    "char_count": ("INT", lambda: T.char_count(F.col("t"))),
    "token_count": ("INT", lambda: T.token_count(F.col("t"))),
    "word_count": ("INT", lambda: T.word_count(F.col("t"))),
    "punct_ratio": ("DOUBLE", lambda: T.punct_ratio(F.col("t"))),
    "digit_ratio": ("DOUBLE", lambda: T.digit_ratio(F.col("t"))),
    "uppercase_ratio": ("DOUBLE", lambda: T.uppercase_ratio(F.col("t"))),
    "fingerprint_md5": ("STRING", lambda: T.fingerprint_md5(F.col("t"))),
    "hash_split": ("STRING", lambda: PR.hash_split(F.col("t"))),
    "hash_sample": ("BOOLEAN", lambda: PR.hash_sample(F.col("t"))),
    "redact_pii": ("STRING", lambda: PR.redact_pii(F.col("t"))),
    "stopword_ratio": ("DOUBLE", _stopword_ratio_sql),
    "mean_word_length": ("DOUBLE", _mean_word_length_sql),
    "duplicate_word_ratio": ("DOUBLE", _duplicate_word_ratio_sql),
    "quality_score": ("DOUBLE", _quality_score_sql),
    "langid": ("STRING", _langid_sql),
    "rolling_fingerprint": ("BIGINT", _rolling_fingerprint_sql),
    "char_entropy": ("DOUBLE", lambda: _char_entropy_sql()),
    # web URL layer (llm/web.py) — plain regex/string trees, tier 1
    "url_scheme": ("STRING", lambda: WB.url_scheme(F.col("t"))),
    "url_host": ("STRING", lambda: WB.url_host(F.col("t"))),
    "url_path": ("STRING", lambda: WB.url_path(F.col("t"))),
    "url_query": ("STRING", lambda: WB.url_query(F.col("t"))),
    "normalize_url": ("STRING", lambda: WB.normalize_url(F.col("t"))),
    "url_registered_domain": (
        "STRING",
        lambda: WB.registered_domain(WB.url_host(F.col("t"))),
    ),
}


def _char_entropy_sql() -> str:
    # hand-written (nested higher-order lambdas don't round-trip
    # through Expression.sql()); parity vs the Column twin is asserted
    # by the randomized-corpus test like every other entry. NOTE: this
    # is the ad-hoc per-row form — corpus scans should use
    # textstats.char_entropy_stats (JVM aggregate, no interpreted
    # lambdas).
    chars = "transform(sequence(1, length(t)), i -> substr(t, i, 1))"
    cnt = f"CAST(size(filter({chars}, y -> y = x)) AS BIGINT)"
    return f"""
CASE WHEN coalesce(length(t), 0) = 0 THEN 0.0 ELSE
 round((round(ln(CAST(length(t) AS DOUBLE)) * 1e6)
  - CAST(aggregate(transform(array_distinct({chars}),
      x -> {cnt} * CAST(round(ln(CAST({cnt} AS DOUBLE)) * 1e6) AS BIGINT)),
    CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) / length(t)) / 1e6, 6) END
"""


def register_llm_sql_functions(spark: SparkSession, prefix: str = "") -> list:
    """Register every LLM text scalar as ``<prefix><name>(t STRING)``.
    Returns the registered names. Idempotent (CREATE OR REPLACE)."""
    sess = spark._jsparkSession
    out = []
    for name, (rtype, builder) in LLM_SQL_FUNCTIONS.items():
        body = builder()
        if not isinstance(body, str):
            body = sess.expression(body._jc).sql()
        # hand-written bodies may call sibling functions; honor prefix
        body = body.replace("__PFX__", prefix)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}{name}(t STRING) "
            f"RETURNS {rtype} RETURN {body}"
        )
        out.append(f"{prefix}{name}")
    return out
