"""Round-9 regressions — the four ADVICE r8 findings:

1. snapshot_apply must not lose 'unchanged' rows when the diff was
   built with include_unchanged=True + include_payload=True (the
   anti-join drops every diff key, so unchanged rows must be re-added
   from the diff payload).
2. knn_join's broadcast all-pairs fast path must handle NULL right
   keys (pandas argsort over object-with-None raised TypeError) and
   must mirror Spark's ASC NULLS FIRST tiebreak so the two paths stay
   equivalent.
3. vocab_divergence must pay the two token scans exactly once: the
   count frame is checkpointed, so the returned plan has no lineage
   back to the tokenize/explode stage.
4. rrf_fuse must collapse a key repeated WITHIN one ranking list to
   its best rank instead of double-counting it.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_geography_spark import joins as J  # noqa: E402
from duckdb_geography_spark.llm import cdc as C  # noqa: E402
from duckdb_geography_spark.llm import drift as D  # noqa: E402
from duckdb_geography_spark.llm import retrieval as R  # noqa: E402


class TestSnapshotApplyUnchanged:
    def test_closure_with_include_unchanged_payload_diff(self, spark):
        """apply(old, diff(old, new)) == new even when the diff keeps
        unchanged rows — previously key 2 vanished from the rebuild."""
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "doc_id long, text string"
        )
        diff = C.snapshot_diff(
            old, new, "doc_id", ["text"],
            include_unchanged=True, include_payload=True,
        )
        rebuilt = C.snapshot_apply(old, diff, "doc_id", ["text"])
        assert sorted((r.doc_id, r.text) for r in rebuilt.collect()) == [
            (2, "b"), (3, "C"), (4, "d"),
        ]

    def test_unchanged_rows_counted_once(self, spark):
        """The unchanged key must come back exactly once (anti-join
        drops it, upsert re-adds it — never both)."""
        old = spark.createDataFrame([(1, "same")], "doc_id long, text string")
        diff = C.snapshot_diff(
            old, old, "doc_id", ["text"],
            include_unchanged=True, include_payload=True,
        )
        rebuilt = C.snapshot_apply(old, diff, "doc_id", ["text"])
        assert rebuilt.collect() == [(1, "same")]


class TestKnnBroadcastNullKeys:
    def _pts(self, spark, rows, key_type="string"):
        from duckdb_geography_spark.functions import cells as CE
        from duckdb_geography_spark.functions.casts import (
            s2_cell_center_to_geography,
        )

        df = spark.createDataFrame(rows, f"b {key_type}, lon double, lat double")
        geog = s2_cell_center_to_geography(
            CE.s2_cellfromlonlat(F.col("lon"), F.col("lat"))
        )
        return df.select("b", geog.alias("geog"))

    def test_null_right_keys_do_not_raise_and_rank_nulls_first(self, spark):
        # two right rows at the SAME point (exact distance tie): the
        # NULL-keyed one must win rank 1 on BOTH paths (ASC NULLS FIRST)
        right_rows = [
            (None, 10.0, 45.0),
            ("x", 10.0, 45.0),
            ("y", 11.0, 45.0),
            (None, 12.0, 45.0),
        ]
        left_rows = [("L1", 10.0, 45.0), ("L2", 12.2, 45.0)]
        right = self._pts(spark, right_rows)
        left = self._pts(spark, left_rows).withColumnRenamed("b", "a")

        fast = J.knn_join(
            left, right, k=3, left_key="a", right_key="b",
            allpairs_right_max=2048,
        )
        slow = J.knn_join(
            left, right, k=3, left_key="a", right_key="b",
            initial_meters=500_000, allpairs_right_max=0,
        )
        got_fast = {(r.a, r.b, r.knn_rank) for r in fast.collect()}
        got_slow = {(r.a, r.b, r.knn_rank) for r in slow.collect()}
        assert got_fast == got_slow
        # the distance tie at L1 resolves NULL-first on both paths
        assert ("L1", None, 1) in got_fast and ("L1", "x", 2) in got_fast

    def test_all_null_right_keys(self, spark):
        right = self._pts(spark, [(None, 10.0, 45.0), (None, 11.0, 45.0)])
        left = self._pts(spark, [("L1", 10.2, 45.0)]).withColumnRenamed("b", "a")
        got = J.knn_join(
            left, right, k=2, left_key="a", right_key="b",
            allpairs_right_max=2048,
        )
        rows = got.collect()
        assert len(rows) == 2 and {r.knn_rank for r in rows} == {1, 2}


class TestVocabDivergenceSingleScan:
    def test_plan_has_no_tokenize_lineage(self, spark):
        a = spark.createDataFrame([("x y z",), ("x",)], "text string")
        b = spark.createDataFrame([("y q",)], "text string")
        out = D.vocab_divergence(a, b)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the checkpoint cut the lineage: no Generate/explode (the
        # tokenizer) may appear in the final plan — the token scans
        # were paid once, at checkpoint time
        assert "Generate" not in plan and "explode" not in plan
        # and the values still match the hand-computable contract:
        # union vocabulary, integer counts
        got = {r.word: (r.c_a, r.c_b) for r in out.collect()}
        assert got == {
            "x": (2, 0), "y": (1, 1), "z": (1, 0), "q": (0, 1),
        }


class TestRrfFuseDuplicateKeys:
    def test_duplicate_key_within_one_list_collapses_to_best_rank(self, spark):
        dup = spark.createDataFrame(
            [("d1", 1), ("d1", 4), ("d2", 2)], "doc_id string, rank long"
        )
        other = spark.createDataFrame([("d2", 1)], "doc_id string, rank long")
        out = {r.doc_id: r for r in R.rrf_fuse([dup, other], c=60).collect()}
        # d1 appears twice in ONE list: n_lists must stay 1 and the
        # contribution must be the min-rank one only
        assert out["d1"].n_lists == 1
        assert out["d1"].best_rank == 1
        assert out["d1"].rrf_micro == round(1e9 / 61)
        # d2: once in each list
        assert out["d2"].n_lists == 2
        assert out["d2"].rrf_micro == round(1e9 / 62) + round(1e9 / 61)
