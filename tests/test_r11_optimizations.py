"""Round-11 optimization regression tests.

Each optimization that changed an operator's internals gets a focused
identity test here: the optimized path must produce exactly the rows
the original path produced.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def lm_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c a b"),
            (2, "x"),
            (3, ""),
            (4, None),
            (5, "  padded   words  here  "),
            (6, "a b a c a b"),
        ],
        ["doc_id", "text"],
    )


def test_lm_tokens_col_path_is_identical(spark, lm_docs):
    """unigram/bigram/trigram NLL over a pre-tokenized array column
    must equal the text-splitting path row for row (the r11 ngram_nll
    gate tokenizes once and feeds all three models)."""
    from pyspark.sql import functions as F

    from duckdb_geography_spark.llm.lm import (
        _words,
        bigram_nll,
        ngram_nll,
        unigram_nll,
    )

    toks = lm_docs.select("doc_id", _words(F.col("text")).alias("__w"))
    for fn, kw in (
        (unigram_nll, {}),
        (bigram_nll, {}),
        (ngram_nll, {"n": 3}),
    ):
        via_text = _rows(fn(lm_docs, exact_micro=True, **kw))
        via_toks = _rows(fn(toks, exact_micro=True, tokens_col="__w", **kw))
        assert via_text == via_toks, fn.__name__


def test_lm_tokens_col_counts_identical(spark, lm_docs):
    from pyspark.sql import functions as F

    from duckdb_geography_spark.llm.lm import (
        _words,
        ngram_counts,
        unigram_counts,
    )

    toks = lm_docs.select("doc_id", _words(F.col("text")).alias("__w"))
    assert _rows(unigram_counts(lm_docs)) == _rows(
        unigram_counts(toks, tokens_col="__w")
    )
    assert _rows(ngram_counts(lm_docs, 2)) == _rows(
        ngram_counts(toks, 2, tokens_col="__w")
    )


def test_query_vec_matches_spark_collect(spark):
    """The driver-side parquet read of the ANN gates' query vector
    must produce exactly the floats Spark's collect() produced."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    got = e._query_vec(SF_DIR)
    ref = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    )
    assert len(got) == len(ref)
    assert all(isinstance(x, float) for x in got)
    assert all(x == y for x, y in zip(got, ref))


def test_query_vec_missing_id_raises(spark):
    import __spark_entry__ as e

    with pytest.raises(KeyError):
        e._query_vec(SF_DIR, vec_id=10**12)


def test_dsir_features_param_is_identical(spark):
    """dsir_weights over a pre-exploded feature frame must equal the
    internal-explode path row for row."""
    from pyspark.sql import functions as F

    from duckdb_geography_spark.llm import dsir as D
    from duckdb_geography_spark.llm.dsir import _feature_buckets

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha"),
            (2, "de", "gamma beta"),
            (3, "en", ""),
            (4, None, None),
            (5, "en", "alpha gamma delta epsilon"),
        ],
        ["doc_id", "lang", "text"],
    )
    tc = D.hashed_feature_counts(docs.where(F.col("lang") == "en"), buckets=97)
    ref = _rows(D.dsir_weights(docs, tc, buckets=97))
    grams = docs.select(
        "doc_id",
        F.explode(_feature_buckets(F.col("text"), (1, 2), 97, "md5")).alias(
            "bucket"
        ),
    )
    got = _rows(D.dsir_weights(docs, tc, buckets=97, features=grams))
    assert ref == got


def test_boilerplate_frac_shared_per_doc_matches_ngrams(spark):
    """boilerplate_frac's internally derived boilerplate table (from
    the shared per-doc frame) must match boilerplate_ngrams exactly."""
    from duckdb_geography_spark.llm.repetition import (
        boilerplate_frac,
        boilerplate_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown cat sits here now"),
            (3, "the quick brown fox jumps over"),
            (4, ""),
            (5, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in boilerplate_frac(docs, n=3, min_df=2).collect()}
    grams = {
        r["gram"] for r in boilerplate_ngrams(docs, n=3, min_df=2).collect()
    }
    assert out[1]["n_boiler"] == sum(
        1 for g in ["the quick brown", "quick brown fox", "brown fox jumps", "fox jumps over"] if g in grams
    )
    assert out[4]["n_grams"] == 0 and out[5]["n_grams"] == 0
    # explicit grams table path still works and agrees
    via_grams = {
        r["doc_id"]: r
        for r in boilerplate_frac(
            docs, n=3, min_df=2, grams=boilerplate_ngrams(docs, n=3, min_df=2)
        ).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in via_grams.items()
    }


def test_pip_join_evaluates_cell_udf_once(spark):
    """The flagship covering join projects the Arrow leaf-cell UDF into
    its own column before the parent bit-math references it — the
    executed plan must carry exactly ONE _cellfromlonlat evaluation
    (the composed form inlined eleven)."""
    import __spark_entry__ as e

    df = e.queries()["pip_covering_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("_cellfromlonlat_udf(") == 1, plan.count(
        "_cellfromlonlat_udf("
    )


def test_ivf_fused_kernel_identical(spark):
    """ivf_topk's fused assign+score kernel must produce exactly the
    rows of the two-stage assign-then-score composition."""
    from pyspark.sql import functions as F

    from duckdb_geography_spark.llm import similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    base = emb.where(F.col("vec_id") != 0)
    got = _rows(S.ivf_topk(base, q, k=10, n_centroids=8, n_probe=3))
    # reference: the pre-fusion composition
    probe = S.probe_cells(q, 8, 3, 11, None)
    ref_cand = (
        base.withColumn("__cent", S.ivf_assign_udf(len(q), 8, 11, None)(F.col("embedding")))
        .where(F.col("__cent").isin(probe))
        .drop("__cent")
    )
    ref = _rows(S.cosine_topk(ref_cand, q, 10))
    assert got == ref
    # plan: exactly ONE Python eval stage
    plan = (
        S.ivf_topk(base, q, k=10, n_centroids=8, n_probe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan.count("ArrowEvalPython")
