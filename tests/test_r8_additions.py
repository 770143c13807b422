"""Unit tests for the round-8 additions: llm/retrieval.py::rrf_fuse /
hybrid_rrf_topk (reciprocal-rank fusion hybrid retrieval) and
llm/cdc.py::snapshot_diff (corpus snapshot change-data-capture). The
DuckDB oracle gates (rrf_hybrid / snapshot_diff) replay these at
sf0.01; here the semantics are pinned on hand-built fixtures."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_geography_spark.llm import cdc as C
from duckdb_geography_spark.llm import retrieval as R


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        # list A ranks 10,20,30 ; list B ranks 20,30,40
        a = _ranked(spark, [(10, 1), (20, 2), (30, 3)])
        b = _ranked(spark, [(20, 1), (30, 2), (40, 3)])
        rows = {r.doc_id: r for r in R.rrf_fuse([a, b], c=60).collect()}
        s = lambda r: round(1e9 / (60 + r))
        assert rows[20].rrf_micro == s(2) + s(1)
        assert rows[20].n_lists == 2 and rows[20].best_rank == 1
        assert rows[10].rrf_micro == s(1) and rows[10].n_lists == 1
        assert rows[40].rrf_micro == s(3)
        # doc present in both lists outranks any single-list doc here
        order = [
            r.doc_id
            for r in R.rrf_fuse([a, b], c=60).collect()
        ]
        assert order[0] == 20 and order[1] == 30

    def test_tie_breaks_on_key_and_k_cut(self, spark):
        a = _ranked(spark, [(5, 1), (3, 1)])  # impossible ranks, same score
        out = R.rrf_fuse([a], c=60, k=1).collect()
        assert len(out) == 1 and out[0].doc_id == 3

    def test_empty_and_bad_args(self, spark):
        with pytest.raises(ValueError):
            R.rrf_fuse([])
        a = _ranked(spark, [(1, 1)])
        with pytest.raises(ValueError):
            R.rrf_fuse([a], c=0)

    def test_no_halfway_contribution_below_1024(self):
        # round() halfway cases would differ between HALF_UP (Spark)
        # and HALF_EVEN engines; assert none exist for c+rank < 1024
        for x in range(1, 1024):
            v = 1e9 / x
            assert v - int(v) != 0.5, x

    def test_hybrid_rrf_topk_shape(self, spark):
        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha alpha"), (2, "gamma")],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1])],
            "vec_id long, embedding array<double>",
        )
        out = R.hybrid_rrf_topk(
            docs, emb, ["alpha"], [1.0, 0.0], k=3, n_each=3
        ).collect()
        assert [c for c in out[0].asDict()] == [
            "doc_id", "n_lists", "best_rank", "rrf_micro",
        ]
        by_id = {r.doc_id: r for r in out}
        # doc 0 is rank 2 lexically (one 'alpha' vs doc 1's two) and
        # rank 1 densely -> fused above doc 2 (dense rank 2 only)
        assert by_id[0].n_lists == 2
        assert out[0].doc_id == 0


class TestSnapshotDiff:
    def _snaps(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "doc_id long, text string, meta int",
        )
        new = spark.createDataFrame(
            [(2, "b", 20), (3, "C", 30), (4, "", 40), (5, "e", 50)],
            "doc_id long, text string, meta int",
        )
        return old, new

    def test_classification(self, spark):
        old, new = self._snaps(spark)
        got = {
            r.doc_id: r.change_type
            for r in C.snapshot_diff(old, new, "doc_id").collect()
        }
        # 1 removed; 2 unchanged (dropped); 3 changed; 4 NULL->''
        # must be a change, not a collision; 5 added
        assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}

    def test_include_unchanged_and_payload(self, spark):
        old, new = self._snaps(spark)
        out = C.snapshot_diff(
            old, new, "doc_id", include_unchanged=True, include_payload=True
        )
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[2].change_type == "unchanged"
        assert rows[5].text == "e" and rows[5].meta == 50  # new payload
        assert rows[1].text == "a" and rows[1].meta == 10  # removed: old
        assert rows[3].text == "C"  # changed: new payload wins

    def test_content_cols_subset(self, spark):
        old, new = self._snaps(spark)
        got = {
            r.doc_id: r.change_type
            for r in C.snapshot_diff(old, new, "doc_id", ["meta"]).collect()
        }
        # meta is identical for every shared key -> only add/remove
        assert got == {1: "removed", 5: "added"}

    def test_no_content_cols_raises(self, spark):
        a = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            C.snapshot_diff(a, a, "doc_id")

    def test_fingerprint_null_vs_empty(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "")], "k long, v string"
        )
        fps = [
            r.fp
            for r in df.select(
                C.content_fingerprint(["v"]).alias("fp")
            ).collect()
        ]
        assert fps[0] != fps[1]


class TestSnapshotApply:
    def test_closure_property(self, spark):
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "doc_id long, text string"
        )
        diff = C.snapshot_diff(old, new, "doc_id", ["text"], include_payload=True)
        rebuilt = C.snapshot_apply(old, diff, "doc_id", ["text"])
        assert sorted((r.doc_id, r.text) for r in rebuilt.collect()) == sorted(
            (r.doc_id, r.text) for r in new.collect()
        )

    def test_requires_payload(self, spark):
        old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        diff = C.snapshot_diff(old, old, "doc_id", ["text"], include_unchanged=True)
        with pytest.raises(ValueError, match="payload"):
            C.snapshot_apply(old, diff, "doc_id", ["text"])


class TestLinearTextScore:
    def test_hand_computed_scores(self, spark):
        from duckdb_geography_spark.llm import classify as CL

        docs = spark.createDataFrame(
            [(0, "good good bad"), (1, "neutral words"), (2, None)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_matched, r.score_micro)
            for r in CL.linear_text_score(
                docs, {"good": 1.5, "bad": -2.0}, bias=0.25
            ).collect()
        }
        # doc 0: 2*1.5e6 - 1*2e6 + 0.25e6 = 1_250_000, 2 matched terms
        assert out[0] == (2, 1_250_000)
        # no match / NULL text: bias only
        assert out[1] == (0, 250_000)
        assert out[2] == (0, 250_000)

    def test_filter_threshold(self, spark):
        from duckdb_geography_spark.llm import classify as CL

        docs = spark.createDataFrame(
            [(0, "good"), (1, "bad"), (2, "meh")], "doc_id long, text string"
        )
        kept = CL.linear_text_filter(
            docs, {"good": 1.0, "bad": -1.0}, threshold=0.5
        ).collect()
        assert [r.doc_id for r in kept] == [0]
        assert kept[0].text == "good" and kept[0].score_micro == 1_000_000

    def test_empty_weights_raise(self, spark):
        from duckdb_geography_spark.llm import classify as CL

        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            CL.linear_text_score(docs, {})


class TestVocabDivergence:
    def test_hand_computed_contributions(self, spark):
        import math

        from duckdb_geography_spark.llm import drift as D

        a = spark.createDataFrame(
            [(0, "x x y")], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(0, "x z")], "doc_id long, text string"
        )
        rows = {
            r.word: r
            for r in D.vocab_divergence(a, b).collect()
        }
        # union vocab {x, y, z}; N_a=3, N_b=2, V=3
        lnm = lambda x: round(math.log(x) * 1e6)
        def contrib(ca, cb):
            return (ca + 1) * (lnm(ca + 1) - lnm(3 + 3) - lnm(cb + 1) + lnm(2 + 3))
        assert (rows["x"].c_a, rows["x"].c_b) == (2, 1)
        assert rows["x"].contrib_micro == contrib(2, 1)
        assert rows["y"].contrib_micro == contrib(1, 0)  # new-in-A word
        assert rows["z"].contrib_micro == contrib(0, 1)  # gone-from-A word
        # identical slices -> zero divergence exactly
        zero = D.vocab_divergence(a, a).agg(F.sum("contrib_micro")).first()[0]
        assert zero == 0

    def test_drift_direction(self, spark):
        from duckdb_geography_spark.llm import drift as D

        a = spark.createDataFrame(
            [(i, "spam " * 5) for i in range(20)], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(i, "ham " * 5) for i in range(20)], "doc_id long, text string"
        )
        top = (
            D.vocab_divergence(a, b)
            .orderBy(F.desc("contrib_micro"), "word")
            .first()
        )
        assert top.word == "spam" and top.contrib_micro > 0


class TestSnapshotDiffBucketed:
    def test_cobucketed_diff_plans_zero_exchange(self, spark):
        """The module-docstring scale claim, mechanically checked:
        with both snapshots bucketed on the snapshot key, the diff's
        full-outer join picks the bucketing up from table metadata and
        plans with NO Exchange anywhere — the pay-the-shuffle-once-at-
        ingest layout an incremental 100 TB pipeline would maintain."""
        from duckdb_geography_spark import sources as S

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            base = spark.range(0, 3000).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("txt"), F.col("id")).alias("text"),
            )
            old = base.where(F.col("doc_id") % 7 != 0)
            new = base.where(F.col("doc_id") % 5 != 0).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 11 == 0, F.upper("text")
                ).otherwise(F.col("text")),
            )
            S.write_bucketed(old, "t_snap_old", ["doc_id"], 8, ["doc_id"])
            S.write_bucketed(new, "t_snap_new", ["doc_id"], 8, ["doc_id"])
            d = C.snapshot_diff(
                S.read_bucketed(spark, "t_snap_old"),
                S.read_bucketed(spark, "t_snap_new"),
                "doc_id",
                ["text"],
            )
            plan = d._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            got = {r.doc_id: r.change_type for r in d.collect()}
            # spot-check the classification against the plain-parquet path
            plain = {
                r.doc_id: r.change_type
                for r in C.snapshot_diff(old, new, "doc_id", ["text"]).collect()
            }
            assert got == plain and len(got) > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS t_snap_old")
            spark.sql("DROP TABLE IF EXISTS t_snap_new")
