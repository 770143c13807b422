"""Sketch operators (llm/sketch.py): HyperLogLog distinct counting,
count-min frequency estimation, and the int8 quantization ANN path
(llm/similarity.py) — correctness properties the sf0.01 driver gates
(hll_distinct / cms_counts / int8_topk) don't pin: merge exactness,
error bounds on larger cardinalities, the never-undercount guarantee,
and quantized-vs-exact recall."""

import pytest
from pyspark.sql import functions as F

from duckdb_geography_spark.llm.sketch import (
    cms_lookup,
    cms_merge,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def keys5k(spark):
    # 5000 distinct string keys, each appearing 1-3 times
    return spark.range(11000).select(
        F.concat(F.lit("k"), (F.col("id") % 5000).cast("string")).alias("k")
    )


class TestHLL:
    def test_estimate_within_error_bound(self, spark, keys5k):
        # p=8 => sigma = 1.04/16 = 6.5%; allow 4 sigma
        row = hll_distinct(keys5k, "k", p=8).collect()[0]
        assert abs(row.distinct_est - 5000) / 5000 < 0.26

    def test_higher_p_tightens(self, spark, keys5k):
        row = hll_distinct(keys5k, "k", p=12).collect()[0]
        # sigma = 1.04/64 = 1.6%; allow 4 sigma
        assert abs(row.distinct_est - 5000) / 5000 < 0.07

    def test_small_set_linear_counting_is_near_exact(self, spark):
        df = spark.range(20).select(F.col("id").cast("string").alias("k"))
        row = hll_distinct(df, "k", p=8).collect()[0]
        # LC on 20/256 registers: relative error well under 5%
        assert row.v_registers <= 20
        assert abs(row.distinct_est - 20) < 1.0

    def test_merge_equals_whole(self, spark, keys5k):
        a = keys5k.where(F.length("k") <= 3)
        b = keys5k.where(F.length("k") > 3)
        merged = hll_merge(
            hll_registers(a, "k", p=8).unionByName(hll_registers(b, "k", p=8))
        )
        whole = hll_registers(keys5k, "k", p=8)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_md5_and_xxhash_tiers_both_estimate(self, spark, keys5k):
        for fn in ("md5", "xxhash64"):
            row = hll_distinct(keys5k, "k", p=8, hash_fn=fn).collect()[0]
            assert abs(row.distinct_est - 5000) / 5000 < 0.26, fn

    def test_null_keys_skipped(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), (None,), ("a",)], ["k"]
        )
        regs = hll_registers(df, "k", p=8)
        # two distinct non-null keys -> at most 2 registers
        assert regs.count() <= 2

    def test_grouped(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = hll_distinct(ev, "user_id", group_cols=["event_type"], p=8)
        exact = dict(
            ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("x"))
            .collect()
        )
        for r in out.collect():
            assert abs(r.distinct_est - exact[r.event_type]) / exact[
                r.event_type
            ] < 0.3

    def test_p_validation(self, spark, keys5k):
        with pytest.raises(ValueError, match=r"p must be"):
            hll_registers(keys5k, "k", p=3)
        with pytest.raises(ValueError, match=r"p must be"):
            hll_estimate(hll_registers(keys5k, "k", p=8), p=15)

    def test_bad_hash_fn(self, spark, keys5k):
        with pytest.raises(ValueError, match="hash_fn"):
            hll_registers(keys5k, "k", hash_fn="sha1")


class TestCMS:
    @pytest.fixture(scope="class")
    def words(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        return docs.select(
            F.explode(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
            ).alias("w")
        )

    def test_never_undercounts(self, spark, words):
        exact = {
            r.w: r.exact
            for r in words.groupBy("w")
            .agg(F.count(F.lit(1)).alias("exact"))
            .orderBy(F.desc("exact"), "w")
            .limit(50)
            .collect()
        }
        probes = spark.createDataFrame([(w,) for w in exact], ["w"])
        sk = cms_sketch(words, "w", depth=4, width=1024)
        est = cms_lookup(sk, probes, "w", depth=4, width=1024).collect()
        # sf0.001's synthetic vocabulary may be smaller than 50 words
        assert len(est) == len(exact) > 0
        n_rows = words.count()
        for r in est:
            assert r.est >= exact[r.key], r
            # CM guarantee: overestimate < e*N/width w.h.p.
            assert r.est - exact[r.key] <= 2.72 * n_rows / 1024 * 4

    def test_absent_key_zero_or_collision_bounded(self, spark, words):
        probes = spark.createDataFrame([("qqq_not_a_word",)], ["w"])
        sk = cms_sketch(words, "w", depth=4, width=1024)
        est = cms_lookup(sk, probes, "w", depth=4, width=1024).collect()[0]
        assert est.est >= 0

    def test_merge_equals_whole(self, spark, words):
        half = words.limit(5000)
        sk_whole = cms_sketch(words.limit(10000), "w", depth=2, width=64)
        # split deterministically: first 5000 vs rest of the 10000
        rest = words.limit(10000).exceptAll(half)
        merged = cms_merge(
            cms_sketch(half, "w", depth=2, width=64).unionByName(
                cms_sketch(rest, "w", depth=2, width=64)
            )
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, sk_whole.collect())
        )

    def test_weighted(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], ["k", "n"]
        )
        sk = cms_sketch(df, "k", weight_col="n", depth=3, width=32)
        est = cms_lookup(
            sk, df.select("k").distinct(), "k", depth=3, width=32
        ).collect()
        got = {r.key: r.est for r in est}
        assert got["a"] >= 12 and got["b"] >= 1

    def test_validation(self, spark, words):
        with pytest.raises(ValueError, match="positive"):
            cms_sketch(words, "w", depth=0)


class TestInt8:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_codes_bounded_and_zero_vector(self, spark):
        from duckdb_geography_spark.llm.similarity import quantize_int8

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
            ["id", "v"],
        )
        rows = df.select(
            "id", quantize_int8("v").alias("q")
        ).orderBy("id").collect()
        assert rows[0].q.codes == [64, -127, 32]
        assert rows[0].q.scale == pytest.approx(1.0 / 127.0)
        assert rows[1].q.codes == [0, 0, 0]
        assert rows[1].q.scale == 0.0

    def test_recall_vs_exact(self, spark, emb):
        from duckdb_geography_spark.llm.similarity import (
            cosine_topk,
            int8_cosine_topk,
        )

        q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
        data = emb.where(F.col("vec_id") != 0)
        exact = {
            r.vec_id for r in cosine_topk(data, list(q), k=10).collect()
        }
        quant = {
            r.vec_id
            for r in int8_cosine_topk(data, list(q), k=10).collect()
        }
        assert len(exact & quant) >= 7

    def test_zero_query_raises(self, spark, emb):
        from duckdb_geography_spark.llm.similarity import int8_cosine_topk

        with pytest.raises(ValueError, match="all zeros"):
            int8_cosine_topk(emb, [0.0, 0.0])


class TestBloom:
    @pytest.fixture(scope="class")
    def vocab(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        w = docs.select(
            F.explode(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
            ).alias("w")
        )
        return w

    def test_no_false_negatives(self, spark, vocab):
        from duckdb_geography_spark.llm.sketch import (
            bloom_contains,
            bloom_sketch,
        )

        dim = vocab.distinct().limit(20)
        members = {r.w for r in dim.collect()}
        sk = bloom_sketch(dim, "w", n_bits=1024, k=5)
        got = bloom_contains(
            sk, vocab.distinct(), "w", n_bits=1024, k=5
        ).collect()
        for r in got:
            if r.key in members:
                assert r.maybe, r

    def test_fp_rate_bounded(self, spark):
        from duckdb_geography_spark.llm.sketch import (
            bloom_contains,
            bloom_sketch,
        )

        dim = spark.range(100).select(
            F.concat(F.lit("in"), "id").alias("k")
        )
        probe = spark.range(1000).select(
            F.concat(F.lit("out"), "id").alias("k")
        )
        # 2048 bits for 100 keys at k=5: theoretical fp ~ 1.7%
        sk = bloom_sketch(dim, "k", n_bits=2048, k=5)
        got = bloom_contains(sk, probe, "k", n_bits=2048, k=5).collect()
        fp = sum(1 for r in got if r.maybe)
        assert fp <= 100  # generous 10% ceiling vs ~1.7% expected

    def test_merge_equals_whole(self, spark):
        from duckdb_geography_spark.llm.sketch import bloom_merge, bloom_sketch

        a = spark.range(50).select(F.concat(F.lit("k"), "id").alias("k"))
        b = spark.range(50, 100).select(
            F.concat(F.lit("k"), "id").alias("k")
        )
        whole = spark.range(100).select(
            F.concat(F.lit("k"), "id").alias("k")
        )
        merged = bloom_merge(
            bloom_sketch(a, "k", n_bits=512, k=3).unionByName(
                bloom_sketch(b, "k", n_bits=512, k=3)
            )
        )
        want = bloom_sketch(whole, "k", n_bits=512, k=3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_prefilter_exact_matches_semi_join(self, spark, vocab):
        from duckdb_geography_spark.llm.sketch import bloom_prefilter

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        dim = (
            docs.where(F.col("lang") == "en")
            .select(
                F.explode(
                    F.filter(
                        F.split(F.trim("text"), r"\s+"), lambda x: x != ""
                    )
                ).alias("w")
            )
            .distinct()
        )
        truth = vocab.join(dim, on="w", how="left_semi").count()
        tight = bloom_prefilter(
            vocab, dim, "w", "w", n_bits=4096, k=5, exact=True
        ).count()
        loose = bloom_prefilter(
            vocab, dim, "w", "w", n_bits=4096, k=5, exact=False
        ).count()
        assert tight == truth
        assert loose >= truth

    def test_prefilter_plan_is_broadcast_only(self, spark, vocab):
        from duckdb_geography_spark.llm.sketch import bloom_prefilter

        dim = vocab.distinct().limit(10)
        out = bloom_prefilter(
            vocab, dim, "w", "w", n_bits=512, k=3, exact=False
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_validation(self, spark, vocab):
        from duckdb_geography_spark.llm.sketch import bloom_sketch

        with pytest.raises(ValueError, match="multiple of 32"):
            bloom_sketch(vocab, "w", n_bits=100)
        with pytest.raises(ValueError, match=r"k must be"):
            bloom_sketch(vocab, "w", n_bits=512, k=0)


class TestStreamingHLL:
    def test_stream_matches_batch_registers(self, spark):
        import uuid

        from duckdb_geography_spark.llm.sketch import hll_registers
        from duckdb_geography_spark.streaming import events as SE

        ev_stream = SE.read_events_stream(spark, SF)
        regs = SE.windowed_hll_registers(ev_stream, key_col="user_id", p=8)
        qname = f"t_hll_{uuid.uuid4().hex[:8]}"
        q = (
            regs.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        got = sorted(
            (r.window_start, r.reg, r.m_rho)
            for r in spark.table(qname).collect()
        )
        ev = SE._ensure_event_time(
            spark.read.parquet(f"{SF}/events.parquet")
        ).withColumn("hour", F.date_trunc("hour", "ts"))
        want = sorted(
            (r.hour, r.reg, r.m_rho)
            for r in hll_registers(
                ev, "user_id", group_cols=["hour"], p=8
            ).collect()
        )
        assert got == want
