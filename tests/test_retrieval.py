"""Unit tests for the round-5 training-pipeline additions:
llm/retrieval.py (TF-IDF + BM25), llm/spans.py (duplicate-substring
spans), llm/dsir.py (importance weighting). The DuckDB oracle gates
(bm25_retrieval / tfidf_vectors / dup_spans / dsir_weights) replay
these bit-for-bit at sf0.01; here we pin the semantics on hand-built
fixtures where the expected answer is computable by eye."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_geography_spark.llm import dsir as D
from duckdb_geography_spark.llm import retrieval as R
from duckdb_geography_spark.llm import spans as S


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# retrieval
# ---------------------------------------------------------------------------


class TestRetrieval:
    def test_term_frequencies_and_dl(self, spark):
        df = _docs(spark, ["a b a", "  b  "])
        rows = {
            (r.doc_id, r.word): (r.tf, r.dl)
            for r in R.term_frequencies(df).collect()
        }
        assert rows == {(0, "a"): (2, 3), (0, "b"): (1, 3), (1, "b"): (1, 1)}

    def test_document_frequencies(self, spark):
        df = _docs(spark, ["a b a", "b c", "c"])
        rows = {r.word: r.df_ct for r in R.document_frequencies(df).collect()}
        assert rows == {"a": 1, "b": 2, "c": 2}

    def test_tfidf_zero_for_ubiquitous_word(self, spark):
        # a word in EVERY document has idf ln((D+1)/(D+1)) = 0
        df = _docs(spark, ["x a", "x b", "x c"])
        w = {
            (r.doc_id, r.word): r.w_micro for r in R.tf_idf(df).collect()
        }
        assert w[(0, "x")] == 0 and w[(1, "x")] == 0 and w[(2, "x")] == 0
        assert w[(0, "a")] > 0  # rare word weighs positive

    def test_bm25_plan_tokenizes_candidates_once(self, spark):
        """Round-9 shape pin: the candidate set is tokenized exactly
        once — document frequencies derive from the lineage-cut
        posting table, so the plan bm25 RETURNS must read an
        ExistingRDD (the materialized postings) and contain NO
        Generate/explode of its own. A Generate reappearing here means
        someone reintroduced a second tokenize scan (the pre-round-9
        document_frequencies form)."""
        df = _docs(spark, ["a b a", "b c", "c a"])
        p = (
            R.bm25_topk(df, ["a", "c"], k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ExistingRDD" in p
        assert "Generate" not in p and "explode" not in p

    def test_bm25_ranks_denser_match_higher(self, spark):
        df = _docs(
            spark,
            [
                "hash table hash table hash",  # dense match, short doc
                "hash filler filler filler filler filler filler filler",
                "nothing relevant here",
            ],
        )
        top = R.bm25_topk(df, ["hash", "table"], k=10).collect()
        assert [r.doc_id for r in top] == [0, 1]  # doc 2 matches nothing
        assert top[0].bm25_micro > top[1].bm25_micro
        assert top[0].n_matched == 2 and top[1].n_matched == 1

    def test_bm25_empty_query_raises(self, spark):
        df = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            R.bm25_scores(df, [])

    def test_bm25_duplicate_query_terms_counted_once(self, spark):
        df = _docs(spark, ["hash table", "hash filler"])
        a = R.bm25_scores(df, ["hash", "hash"]).collect()
        b = R.bm25_scores(df, ["hash"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_bm25_constants_ignore_empty_and_null_text(self, spark):
        # D and L (avgdl) must come from the dl universe — documents
        # with >=1 word — exactly like the DuckDB oracle, where NULL/
        # empty text never produces a words row. Adding empty docs to
        # the corpus must not move any score (ADVICE r5 item 1).
        base = ["hash table hash", "hash filler filler", "table only"]
        clean = _docs(spark, base)
        noisy = spark.createDataFrame(
            [(i, t) for i, t in enumerate(base)] + [(97, ""), (98, "   "), (99, None)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, R.bm25_scores(clean, ["hash", "table"]).collect()))
        b = sorted(map(tuple, R.bm25_scores(noisy, ["hash", "table"]).collect()))
        assert a == b


# ---------------------------------------------------------------------------
# duplicate-substring spans
# ---------------------------------------------------------------------------


class TestSpans:
    def test_cross_document_duplicate_detected(self, spark):
        shared = "one two three four five"
        df = _docs(spark, [f"{shared} tail-a xx yy", f"head-b {shared} zz ww"])
        spans = {
            r.doc_id: (r.span_start, r.span_end, r.n_windows)
            for r in S.duplicate_spans(df, 5).collect()
        }
        # doc0: words 0..4 duplicated -> span [0, 5); doc1: words 1..5 -> [1, 6)
        assert spans == {0: (0, 5, 1), 1: (1, 6, 1)}

    def test_within_document_repetition_detected(self, spark):
        # the same 3-gram twice inside ONE doc, nothing cross-doc
        df = _docs(spark, ["p q r gap1 gap2 gap3 gap4 p q r", "unrelated text here"])
        spans = [
            (r.span_start, r.span_end)
            for r in S.duplicate_spans(df, 3).where("doc_id = 0").collect()
        ]
        assert sorted(spans) == [(0, 3), (7, 10)]

    def test_overlapping_windows_merge_to_one_span(self, spark):
        # six identical words: every 3-window duplicated, all overlap
        df = _docs(spark, ["w w w w w w", "w w w unrelated trailing words"])
        spans = [
            (r.span_start, r.span_end, r.n_windows)
            for r in S.duplicate_spans(df, 3).where("doc_id = 0").collect()
        ]
        assert spans == [(0, 6, 4)]

    def test_short_documents_contribute_nothing(self, spark):
        df = _docs(spark, ["a b", "a b"])
        assert S.duplicated_windows(df, 5).count() == 0
        stats = {r.doc_id: (r.n_spans, r.dup_words, r.dup_frac) for r in
                 S.duplication_stats(df, 5).collect()}
        assert stats == {0: (0, 0, 0.0), 1: (0, 0, 0.0)}

    def test_duplication_stats_fraction(self, spark):
        shared = "s1 s2 s3 s4 s5"
        df = _docs(spark, [f"{shared} u1 u2 u3 u4 u5", shared])
        stats = {r.doc_id: r for r in S.duplication_stats(df, 5).collect()}
        assert stats[0].n_words == 10 and stats[0].dup_words == 5
        assert stats[0].dup_frac == 0.5
        assert stats[1].dup_frac == 1.0

    def test_bad_k_raises(self, spark):
        df = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            S.window_positions(df, 0)

    def test_remove_keep_first_preserves_one_occurrence(self, spark):
        shared = "d1 d2 d3"
        df = _docs(spark, [f"{shared} tail0 tail1", f"{shared} other words"])
        out = {r.doc_id: r.text for r in
               S.remove_duplicate_spans(df, 3).collect()}
        # doc 0 holds the corpus-wide first occurrence (min key) -> intact
        assert out[0] == f"{shared} tail0 tail1"
        assert out[1] == "other words"

    def test_remove_all_occurrences(self, spark):
        shared = "d1 d2 d3"
        df = _docs(spark, [f"{shared} tail0 tail1", f"{shared} other words"])
        out = {r.doc_id: r.text for r in
               S.remove_duplicate_spans(df, 3, keep_first=False).collect()}
        assert out[0] == "tail0 tail1"
        assert out[1] == "other words"

    def test_remove_within_doc_keeps_first_instance(self, spark):
        df = _docs(spark, ["p q r x0 x1 x2 x3 p q r", "no dup content at all"])
        out = {r.doc_id: r.text for r in
               S.remove_duplicate_spans(df, 3).collect()}
        assert out[0] == "p q r x0 x1 x2 x3"
        assert out[1] == "no dup content at all"

    def test_remove_null_text_stays_null(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "a b c"), (2, "a b c")], "doc_id long, text string"
        )
        out = {r.doc_id: r.text for r in
               S.remove_duplicate_spans(df, 3).collect()}
        assert out[0] is None and out[1] == "a b c" and out[2] == ""

    def test_remove_untouched_docs_keep_text(self, spark):
        df = _docs(spark, ["unique alpha beta gamma", "totally different words here"])
        out = {r.doc_id: r.text for r in
               S.remove_duplicate_spans(df, 3).collect()}
        assert out[0] == "unique alpha beta gamma"
        assert out[1] == "totally different words here"


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


class TestDsir:
    def test_target_like_documents_weigh_higher(self, spark):
        target = _docs(spark, ["alpha beta gamma delta"] * 3)
        pool = _docs(
            spark,
            [
                "alpha beta gamma delta",  # exactly target-like
                "zeta eta theta iota",  # disjoint vocabulary
            ],
        )
        tc = D.hashed_feature_counts(target, buckets=512)
        w = {r.doc_id: r.w_micro for r in D.dsir_weights(pool, tc, buckets=512).collect()}
        assert w[0] > w[1]

    def test_topk_deterministic_cut(self, spark):
        target = _docs(spark, ["aa bb cc"])
        pool = _docs(spark, ["aa bb cc", "dd ee ff", "aa bb zz"])
        tc = D.hashed_feature_counts(target, buckets=256)
        top = D.dsir_topk(pool, tc, k=2, buckets=256).collect()
        assert [r.doc_id for r in top] == [0, 2]

    def test_featureless_documents_score_zero(self, spark):
        target = _docs(spark, ["aa bb"])
        pool = _docs(spark, ["   ", "aa bb"])
        tc = D.hashed_feature_counts(target, buckets=64)
        rows = {r.doc_id: (r.n_feats, r.w_micro) for r in
                D.dsir_weights(pool, tc, buckets=64).collect()}
        assert rows[0] == (0, 0)
        assert rows[1][0] == 3  # 2 unigrams + 1 bigram

    def test_empty_target_model_still_scores(self, spark):
        target = _docs(spark, [])
        pool = _docs(spark, ["aa bb cc"])
        tc = D.hashed_feature_counts(target, buckets=64)
        rows = D.dsir_weights(pool, tc, buckets=64).collect()
        assert len(rows) == 1 and rows[0].n_feats == 5
        # every feature unseen under an empty target: weight strictly
        # negative (raw mass dominates)
        assert rows[0].w_micro < 0

    def test_bad_buckets_raises(self, spark):
        df = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            D.hashed_feature_counts(df, buckets=1)

    def test_xxhash_variant_matches_md5_ranking_shape(self, spark):
        # xxhash64 is the fast path; it must produce the same row
        # structure (not the same hashes) and deterministic output
        target = _docs(spark, ["alpha beta gamma"] * 2)
        pool = _docs(spark, ["alpha beta gamma", "zz yy xx"])
        tc = D.hashed_feature_counts(target, buckets=512, hash_fn="xxhash64")
        w1 = D.dsir_weights(pool, tc, buckets=512, hash_fn="xxhash64").collect()
        w2 = D.dsir_weights(pool, tc, buckets=512, hash_fn="xxhash64").collect()
        assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
        w = {r.doc_id: r.w_micro for r in w1}
        assert w[0] > w[1]
