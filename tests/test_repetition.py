"""Unit tests for llm/repetition.py, prep.decontaminate, and
dedup.semdedup — hand-computed truths on tiny frames, plus the policy
edge cases each docstring promises (tie-breaks, short docs, chains,
skew guards)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_geography_spark.llm.dedup import semdedup
from duckdb_geography_spark.llm.prep import decontaminate
from duckdb_geography_spark.llm.repetition import (
    boilerplate_frac,
    boilerplate_ngrams,
    dup_ngram_stats,
    repetition_signals,
    top_ngram_stats,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestWordNgrams:
    def test_basic(self, spark):
        df = spark.range(1).select(word_ngrams(F.lit("a b c d"), 2).alias("g"))
        assert df.collect()[0]["g"] == ["a b", "b c", "c d"]

    def test_short_doc_empty(self, spark):
        df = spark.range(1).select(word_ngrams(F.lit("solo"), 2).alias("g"))
        assert df.collect()[0]["g"] == []

    def test_null_text_null(self, spark):
        df = spark.range(1).select(
            word_ngrams(F.lit(None).cast("string"), 2).alias("g")
        )
        assert df.collect()[0]["g"] is None

    def test_whitespace_runs_collapse(self, spark):
        df = spark.range(1).select(word_ngrams(F.lit("  a   b  "), 2).alias("g"))
        assert df.collect()[0]["g"] == ["a b"]

    def test_n_must_be_positive(self):
        with pytest.raises(ValueError):
            word_ngrams("text", 0)


class TestTopNgram:
    def test_counts_and_frac(self, spark):
        # "a b a b c": 2-grams a b, b a, a b, b c -> top ("a b", 2);
        # chars = 2 * 3 / len("a b a b c")=9 -> 0.666667
        df = _docs(spark, [(1, "a b a b c")])
        row = top_ngram_stats(df, n=2).collect()[0]
        assert (row["top_gram"], row["top_count"]) == ("a b", 2)
        assert row["top_ngram_char_frac"] == pytest.approx(2 * 3 / 9, abs=1e-6)

    def test_tie_breaks_to_greatest_gram(self, spark):
        # all 2-grams unique -> tie at count 1, max(struct) picks "z w"
        df = _docs(spark, [(1, "x y z w")])
        row = top_ngram_stats(df, n=2).collect()[0]
        assert row["top_gram"] == "z w"
        assert row["top_count"] == 1

    def test_short_doc_keeps_row(self, spark):
        df = _docs(spark, [(1, "solo"), (2, "a b")])
        got = {r["doc_id"]: r for r in top_ngram_stats(df, n=2).collect()}
        assert got[1]["top_gram"] is None
        assert got[1]["top_count"] == 0
        assert got[1]["top_ngram_char_frac"] == 0.0
        assert got[2]["top_gram"] == "a b"

    def test_frac_capped_at_one(self, spark):
        # "a a a a": gram "a a" x3 -> 3*3/7 chars = 9/7 > 1 -> capped
        df = _docs(spark, [(1, "a a a a")])
        row = top_ngram_stats(df, n=2).collect()[0]
        assert row["top_ngram_char_frac"] == 1.0


class TestDupNgram:
    def test_duplicated_grams_counted(self, spark):
        # "a b a b c": "a b" occurs twice -> 1 dup gram, 2*3=6 chars / 9
        df = _docs(spark, [(1, "a b a b c")])
        row = dup_ngram_stats(df, n=2).collect()[0]
        assert row["dup_ngram_count"] == 1
        assert row["dup_ngram_char_frac"] == pytest.approx(6 / 9, abs=1e-6)

    def test_no_dups_zero(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        row = dup_ngram_stats(df, n=2).collect()[0]
        assert row["dup_ngram_count"] == 0
        assert row["dup_ngram_char_frac"] == 0.0

    def test_signals_join(self, spark):
        df = _docs(spark, [(1, "a b a b c"), (2, "x y")])
        got = repetition_signals(df, top_n=2, dup_n=2)
        assert set(got.columns) == {
            "doc_id",
            "top_gram",
            "top_count",
            "top_ngram_char_frac",
            "dup_ngram_count",
            "dup_ngram_char_frac",
        }
        assert got.count() == 2


class TestBoilerplate:
    def test_df_threshold(self, spark):
        df = _docs(
            spark,
            [
                (1, "the same header here"),
                (2, "the same header again"),
                (3, "totally different words"),
            ],
        )
        grams = {
            r["gram"]: r["doc_freq"]
            for r in boilerplate_ngrams(df, n=2, min_df=2).collect()
        }
        # only grams in >= 2 docs survive
        assert grams == {"the same": 2, "same header": 2}

    def test_frac_per_doc(self, spark):
        df = _docs(
            spark,
            [
                (1, "the same header here"),
                (2, "the same header again"),
                (3, "totally different words"),
            ],
        )
        got = {r["doc_id"]: r for r in boilerplate_frac(df, n=2, min_df=2).collect()}
        # doc 1: grams {the same, same header, header here} -> 2/3 boiler
        assert got[1]["n_grams"] == 3
        assert got[1]["n_boiler"] == 2
        assert got[1]["boilerplate_frac"] == pytest.approx(2 / 3, abs=1e-6)
        assert got[3]["n_boiler"] == 0

    def test_within_doc_repeat_counts_once(self, spark):
        # the same gram twice in ONE doc must not inflate doc_freq
        df = _docs(spark, [(1, "a b a b"), (2, "c d")])
        grams = boilerplate_ngrams(df, n=2, min_df=2).collect()
        assert grams == []

    def test_precomputed_grams_reused(self, spark):
        df = _docs(spark, [(1, "a b c"), (2, "a b d")])
        g = boilerplate_ngrams(df, n=2, min_df=2)
        got = {r["doc_id"]: r for r in boilerplate_frac(df, n=2, grams=g).collect()}
        assert got[1]["n_boiler"] == 1  # "a b"


class TestDecontaminate:
    def test_flags_overlap(self, spark):
        docs = _docs(
            spark,
            [
                (1, "one two three four five"),
                (2, "six seven eight nine ten"),
            ],
        )
        bench = _docs(spark, [(100, "zero one two three four end")])
        got = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(docs, bench, n=4).collect()
        }
        assert got == {1: True, 2: False}

    def test_keeps_all_columns(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c", "en")], "doc_id long, text string, lang string"
        )
        bench = _docs(spark, [(9, "x y z")])
        out = decontaminate(docs, bench, n=2)
        assert set(out.columns) == {"doc_id", "text", "lang", "contaminated"}

    def test_no_ngram_doc_clean(self, spark):
        docs = _docs(spark, [(1, "short")])
        bench = _docs(spark, [(9, "short")])
        got = decontaminate(docs, bench, n=4).collect()
        assert got[0]["contaminated"] is False


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemdedup:
    # two orthogonal unit centroids; vectors hand-placed around them
    CENTS = np.array([[1.0, 0.0], [0.0, 1.0]])

    def test_near_dup_dropped_keep_earliest(self, spark):
        df = _emb(
            spark,
            [
                (1, [1.0, 0.01]),
                (2, [1.0, 0.012]),  # ~identical to 1 -> dropped
                (3, [0.01, 1.0]),  # other cluster, kept
            ],
        )
        got = {r["vec_id"]: r for r in semdedup(df, self.CENTS, threshold=0.99).collect()}
        assert got[1]["kept"] is True
        assert got[2]["kept"] is False
        assert got[3]["kept"] is True
        assert got[1]["cluster"] == 1 and got[3]["cluster"] == 2

    def test_cross_cluster_pair_not_formed(self, spark):
        # identical vectors in DIFFERENT clusters are never compared
        df = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
        got = semdedup(df, self.CENTS, threshold=0.0).collect()
        assert all(r["kept"] for r in got)

    def test_chain_drops_both_followers(self, spark):
        # documented greedy policy: a~b and b~c drop b AND c even if
        # a!~c (keep-earliest sweeps against ALL smaller keys)
        df = _emb(
            spark,
            [
                (1, [1.0, 0.0]),
                (2, [0.96, 0.28]),  # cos(1,2) ~ 0.96
                (3, [0.85, 0.53]),  # cos(2,3) ~ 0.96, cos(1,3) ~ 0.85
            ],
        )
        got = {r["vec_id"]: r["kept"] for r in semdedup(df, self.CENTS, threshold=0.95).collect()}
        assert got == {1: True, 2: False, 3: False}

    def test_max_cluster_guard_skips_big_cluster(self, spark):
        df = _emb(
            spark,
            [
                (1, [1.0, 0.01]),
                (2, [1.0, 0.012]),
                (3, [1.0, 0.013]),
                (4, [0.01, 1.0]),
                (5, [0.012, 1.0]),
            ],
        )
        got = {
            r["vec_id"]: r["kept"]
            for r in semdedup(df, self.CENTS, threshold=0.99, max_cluster=2).collect()
        }
        # cluster 1 has 3 members (> cap) -> untouched; cluster 2 pruned
        assert got == {1: True, 2: True, 3: True, 4: True, 5: False}

    def test_assignment_first_wins_tie(self, spark):
        # equidistant from both centroids -> first centroid wins
        df = _emb(spark, [(1, [1.0, 1.0])])
        got = semdedup(df, self.CENTS, threshold=0.99).collect()[0]
        assert got["cluster"] == 1


class TestEmptyTextEdge:
    def test_n1_empty_text_no_phantom_gram(self, spark):
        # split(trim(''), '\s+') is [''] — a phantom empty word; n=1
        # must NOT report a '' unigram for empty/whitespace-only text
        df = _docs(spark, [(1, ""), (2, "   "), (3, "word")])
        rows = {r["doc_id"]: r for r in top_ngram_stats(df, n=1).collect()}
        assert rows[1]["top_gram"] is None and rows[1]["top_count"] == 0
        assert rows[2]["top_gram"] is None and rows[2]["top_count"] == 0
        assert rows[3]["top_gram"] == "word"

    def test_n1_empty_not_boilerplate(self, spark):
        df = _docs(spark, [(1, ""), (2, ""), (3, "")])
        assert boilerplate_ngrams(df, n=1, min_df=2).collect() == []


def test_signals_mixed_n_two_call_path(spark):
    # top_n != dup_n exercises the join-of-two-aggregates path
    df = _docs(spark, [(1, "a b a b a b c")])
    row = repetition_signals(df, top_n=2, dup_n=3).collect()[0]
    assert row["top_gram"] == "a b" and row["top_count"] == 3
    # 3-grams: "a b a","b a b","a b a","b a b","a b c" -> 2 dup grams
    assert row["dup_ngram_count"] == 2


class TestRandomizedCrossCheck:
    """Seeded randomized corpora cross-checked against a pure-Python
    reference implementation — one Spark job per test, 200 docs of
    adversarial word soup (tiny vocab -> many collisions)."""

    def _random_docs(self, rng, n_docs=200, vocab=8, max_words=30):
        docs = []
        for i in range(n_docs):
            k = int(rng.integers(0, max_words))
            words = [f"w{int(rng.integers(0, vocab))}" for _ in range(k)]
            docs.append((i, " ".join(words)))
        return docs

    @staticmethod
    def _py_signals(text, n):
        words = [w for w in text.strip().split() if w]
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        nc = max(len(text), 1)
        from collections import Counter

        c = Counter(grams)
        if not c:
            return (None, 0, 0.0, 0, 0.0)
        top_cnt = max(c.values())
        top_gram = max(g for g, v in c.items() if v == top_cnt)
        top_frac = round(min(1.0, top_cnt * len(top_gram) / nc), 6)
        dups = {g: v for g, v in c.items() if v >= 2}
        dup_chars = sum(v * len(g) for g, v in dups.items())
        dup_frac = round(min(1.0, dup_chars / nc), 6)
        return (top_gram, top_cnt, top_frac, len(dups), dup_frac)

    def test_signals_match_python_reference(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        docs = self._random_docs(rng)
        df = _docs(spark, docs)
        got = {
            r["doc_id"]: (
                r["top_gram"],
                r["top_count"],
                r["top_ngram_char_frac"],
                r["dup_ngram_count"],
                r["dup_ngram_char_frac"],
            )
            for r in repetition_signals(df, top_n=2, dup_n=2).collect()
        }
        for doc_id, text in docs:
            want = self._py_signals(text, 2)
            g = got[doc_id]
            assert g[0] == want[0], (doc_id, text, g, want)
            assert g[1] == want[1]
            assert g[2] == pytest.approx(want[2], abs=2e-6)
            assert g[3] == want[3]
            assert g[4] == pytest.approx(want[4], abs=2e-6)

    def test_semdedup_matches_numpy_reference(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(100, 8))
        cents = rng.normal(size=(4, 8))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        df = _emb(
            spark,
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        )
        thr = 0.6
        got = {
            r["vec_id"]: (r["cluster"], r["kept"])
            for r in semdedup(df, cents, threshold=thr).collect()
        }
        # numpy reference: first-wins argmax assignment, keep-earliest
        assign = np.argmax(vecs @ cents.T, axis=1) + 1
        norms = np.linalg.norm(vecs, axis=1)
        cos = (vecs @ vecs.T) / np.outer(norms, norms)
        for j in range(100):
            dropped = any(
                assign[i] == assign[j] and round(cos[i, j], 6) >= thr
                for i in range(j)
            )
            assert got[j][0] == assign[j], (j, got[j], assign[j])
            assert got[j][1] == (not dropped), (j, got[j], dropped)


class TestPacking:
    def test_pack_boundaries(self, spark):
        from duckdb_geography_spark.llm.prep import pack_chunks

        # one bucket (buckets=1): running sums 0,3,6,9,12 with cap 6 ->
        # packs 0,0,1,1,2
        chunks = spark.createDataFrame(
            [(1, i, 3) for i in range(5)],
            "doc_id long, chunk_idx int, n_chars long",
        )
        got = (
            pack_chunks(chunks, max_units=6, buckets=1)
            .orderBy("chunk_idx")
            .collect()
        )
        assert [r["pack_id"] for r in got] == [0, 0, 1, 1, 2]
        assert [r["pack_pos"] for r in got] == [0, 1, 0, 1, 0]

    def test_pack_overflow_at_most_one_chunk(self, spark):
        from duckdb_geography_spark.llm.prep import pack_chunks

        # 5,5,5 with cap 8: sums-before 0,5,10 -> packs 0,0,1 — pack 0
        # overflows to 10 (one straddling chunk), documented behavior
        chunks = spark.createDataFrame(
            [(1, i, 5) for i in range(3)],
            "doc_id long, chunk_idx int, n_chars long",
        )
        got = pack_chunks(chunks, max_units=8, buckets=1).orderBy("chunk_idx")
        assert [r["pack_id"] for r in got.collect()] == [0, 0, 1]

    def test_buckets_partition_by_doc(self, spark):
        from duckdb_geography_spark.llm.prep import pack_chunks

        chunks = spark.createDataFrame(
            [(d, 0, 1) for d in range(50)],
            "doc_id long, chunk_idx int, n_chars long",
        )
        got = pack_chunks(chunks, max_units=10, buckets=8).collect()
        # every doc's chunks stay in one bucket; buckets in range
        assert all(0 <= r["pack_bucket"] < 8 for r in got)

    def test_md5_and_xxhash_agree_on_grouping_invariants(self, spark):
        from duckdb_geography_spark.llm.prep import pack_chunks

        chunks = spark.createDataFrame(
            [(d, i, 7) for d in range(10) for i in range(4)],
            "doc_id long, chunk_idx int, n_chars long",
        )
        for fn in ("xxhash64", "md5"):
            got = pack_chunks(chunks, max_units=20, buckets=4, hash_fn=fn)
            # pack_pos is dense 0..n-1 within each (bucket, pack)
            import collections

            packs = collections.defaultdict(list)
            for r in got.collect():
                packs[(r["pack_bucket"], r["pack_id"])].append(r["pack_pos"])
            for pos in packs.values():
                assert sorted(pos) == list(range(len(pos)))

    def test_bad_hash_fn(self, spark):
        from duckdb_geography_spark.llm.prep import pack_chunks

        chunks = spark.createDataFrame(
            [(1, 0, 1)], "doc_id long, chunk_idx int, n_chars long"
        )
        with pytest.raises(ValueError):
            pack_chunks(chunks, max_units=10, hash_fn="sha9")


class TestHashSample:
    def test_deterministic_and_rate(self, spark):
        from duckdb_geography_spark.llm.prep import hash_sample

        docs = spark.createDataFrame(
            [(i, f"document number {i} text") for i in range(500)],
            "doc_id long, text string",
        )
        a = docs.where(hash_sample("text", rate_pct=20)).count()
        b = docs.where(hash_sample("text", rate_pct=20)).count()
        assert a == b  # deterministic
        assert 50 < a < 150  # ~20% of 500
        # salt decorrelates
        c = docs.where(hash_sample("text", rate_pct=20, salt="x")).count()
        assert 50 < c < 150

    def test_duplicates_sample_together(self, spark):
        from duckdb_geography_spark.llm.prep import hash_sample

        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text")], "doc_id long, text string"
        )
        kept = docs.where(hash_sample("text", rate_pct=50)).count()
        assert kept in (0, 2)


class TestUnigramLM:
    def test_hand_computed_nll(self, spark):
        import math

        from duckdb_geography_spark.llm.lm import unigram_nll

        # corpus: "a a b" + "a c" -> counts a:3 b:1 c:1, N=5, V=3
        df = _docs(spark, [(1, "a a b"), (2, "a c")])
        got = {r["doc_id"]: r for r in unigram_nll(df).collect()}

        def nll(c):
            return (
                round(math.log(5 + 3) * 1e6) - round(math.log(c + 1) * 1e6)
            ) / 1e6

        def r6(x):  # HALF_UP like Spark/DuckDB round(), not banker's
            import math as _m

            return _m.floor(x * 1e6 + 0.5) / 1e6

        want1 = r6((2 * nll(3) + nll(1)) / 3)
        want2 = r6((nll(3) + nll(1)) / 2)
        assert got[1]["n_words"] == 3 and got[1]["nll"] == pytest.approx(want1, abs=1e-9)
        assert got[2]["n_words"] == 2 and got[2]["nll"] == pytest.approx(want2, abs=1e-9)
        # rarer words -> higher NLL
        assert got[2]["nll"] > 0

    def test_empty_doc_scores_zero(self, spark):
        from duckdb_geography_spark.llm.lm import unigram_nll

        df = _docs(spark, [(1, ""), (2, "x y")])
        got = {r["doc_id"]: r for r in unigram_nll(df).collect()}
        assert got[1]["n_words"] == 0 and got[1]["nll"] == 0.0

    def test_fixed_model_scores_unseen(self, spark):
        import math

        from duckdb_geography_spark.llm.lm import unigram_counts, unigram_nll

        train = _docs(spark, [(1, "a a a b")])  # N=4, V=2
        model = unigram_counts(train)
        test = _docs(spark, [(9, "zzz")])  # unseen word
        got = unigram_nll(test, counts=model).collect()[0]
        # unseen: ln(4+2) - ln(1) = ln 6
        want = round(round(math.log(6) * 1e6) / 1e6, 6)
        assert got["nll"] == pytest.approx(want, abs=1e-9)
        # an out-of-domain doc scores WORSE than an in-domain one
        common = unigram_nll(_docs(spark, [(8, "a a")]), counts=model).collect()[0]
        assert got["nll"] > common["nll"]

    def test_alpha_must_be_positive_int(self, spark):
        from duckdb_geography_spark.llm.lm import unigram_nll

        df = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            unigram_nll(df, alpha=0)

    def test_ln_micro_parity_with_duckdb(self, spark):
        """round(ln(k)*1e6) must agree between the JVM and DuckDB over
        the whole count domain the model can produce (the parity the
        oracle depends on)."""
        import duckdb

        sdf = (
            spark.range(1, 2_000_001)
            .select(
                "id",
                F.round(F.log(F.col("id").cast("double")) * 1e6)
                .cast("long")
                .alias("v"),
            )
            .toPandas()
        )
        ddf = duckdb.sql(
            "select range as id, round(ln(range::DOUBLE)*1e6)::BIGINT v "
            "from range(1, 2000001)"
        ).df()
        m = sdf.merge(ddf, on="id", suffixes=("_s", "_d"))
        assert (m.v_s != m.v_d).sum() == 0


class TestLlmSqlSurface:
    """Every LLM SQL scalar must agree exactly with its Column twin —
    both the auto-derived and the hand-written-lambda bodies."""

    COLUMN_TWINS = None  # built lazily to import inside the test

    def _twins(self):
        from duckdb_geography_spark.llm import prep as PR
        from duckdb_geography_spark.llm import textstats as T
        from duckdb_geography_spark.llm import web as WB

        return {
            "url_scheme": WB.url_scheme,
            "url_host": WB.url_host,
            "url_path": WB.url_path,
            "url_query": WB.url_query,
            "normalize_url": WB.normalize_url,
            "url_registered_domain": lambda c: WB.registered_domain(WB.url_host(c)),
            "char_count": T.char_count,
            "token_count": T.token_count,
            "word_count": T.word_count,
            "punct_ratio": T.punct_ratio,
            "digit_ratio": T.digit_ratio,
            "uppercase_ratio": T.uppercase_ratio,
            "fingerprint_md5": T.fingerprint_md5,
            "hash_split": PR.hash_split,
            "hash_sample": PR.hash_sample,
            "redact_pii": PR.redact_pii,
            "stopword_ratio": T.stopword_ratio,
            "mean_word_length": T.mean_word_length,
            "duplicate_word_ratio": T.duplicate_word_ratio,
            "quality_score": T.quality_score,
            "langid": T.langid,
            "rolling_fingerprint": T.rolling_fingerprint,
            "char_entropy": T.char_entropy,
        }

    def test_sql_equals_column_everywhere(self, spark):
        import numpy as np

        from duckdb_geography_spark.llm.register import (
            LLM_SQL_FUNCTIONS,
            register_llm_sql_functions,
        )

        names = register_llm_sql_functions(spark)
        twins = self._twins()
        assert set(LLM_SQL_FUNCTIONS) == set(twins)

        rng = np.random.default_rng(3)
        vocab = ["the", "and", "der", "le", "el", "Word", "x2",
                 "PUNCT!", "a.b@c.de", "123", "?!", "", "und", "la"]
        rows = []
        for i in range(120):
            k = int(rng.integers(0, 20))
            rows.append((i, " ".join(vocab[int(rng.integers(0, len(vocab)))]
                                     for _ in range(k))))
        rows += [(900, ""), (901, "   "), (902, "one"),
                 (903, "The THE the tHe"), (904, "mail me a.b@c.de now"),
                 (905, "der die das und ist"), (906, "!!!!!"),
                 # URL-shaped rows so the web-layer branches run too
                 (907, "HTTPS://User@WWW.ExAmple.COM:443/A//?utm_x=1&id=2#f"),
                 (908, "http://a.b.c.example.org/p?gclid=1"),
                 (909, "ftp://Files.Example.net:2121/pub/")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.createOrReplaceTempView("sqltest_docs")

        sql_cols = ", ".join(f"{n}(text) AS {n}" for n in LLM_SQL_FUNCTIONS)
        got_sql = (
            spark.sql(f"SELECT doc_id, {sql_cols} FROM sqltest_docs")
            .orderBy("doc_id")
            .collect()
        )
        got_col = (
            df.select(
                "doc_id",
                *[twins[n]("text").alias(n) for n in LLM_SQL_FUNCTIONS],
            )
            .orderBy("doc_id")
            .collect()
        )
        for rs, rc in zip(got_sql, got_col):
            for n in LLM_SQL_FUNCTIONS:
                assert rs[n] == rc[n], (rs["doc_id"], n, rs[n], rc[n])
        assert names  # registration returned the names

    def test_prefix_respected(self, spark):
        from duckdb_geography_spark.llm.register import register_llm_sql_functions

        register_llm_sql_functions(spark, prefix="llm_")
        r = spark.sql("SELECT llm_quality_score('the and of to in a doc') AS v")
        assert r.collect()[0]["v"] > 0
