"""Product quantization: training determinism, encode correctness vs a
pure-python reference, pure-Column ADC scoring, and two-stage recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_geography_spark.llm import pq


def _sample(seed=3, n=200, dim=32):
    rng = np.random.default_rng(seed)
    # clustered data so nearest-neighbor structure exists
    centers = rng.normal(size=(8, dim))
    x = centers[rng.integers(0, 8, n)] + 0.15 * rng.normal(size=(n, dim))
    return x


def test_train_deterministic_and_shapes():
    x = _sample()
    b1 = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    b2 = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    assert b1.shape == (4, 8, 8)
    assert np.array_equal(b1, b2)
    b3 = pq.train_pq_codebooks(x, m=4, k=8, seed=8)
    assert not np.array_equal(b1, b3)
    with pytest.raises(ValueError, match="divisible"):
        pq.train_pq_codebooks(x, m=5, k=8)


def test_encode_matches_python_reference(spark):
    x = _sample(seed=11, n=60, dim=16)
    books = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode(df, books, key_col="vec_id").collect()
    }
    ds = 4
    for i, row in enumerate(x):
        want = []
        for s in range(4):
            sub = row[s * ds : (s + 1) * ds]
            dists = [float(pq._seq_sq_dist(sub, books[s, j])[0]) for j in range(8)]
            want.append(int(np.argmin(dists)))
        assert got[i] == want, i


def test_adc_score_is_pure_column(spark):
    x = _sample(seed=5, n=30, dim=16)
    books = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    codes_rows = [
        (i, [int(c) for c in row])
        for i, row in enumerate(
            np.random.default_rng(0).integers(0, 8, (30, 4))
        )
    ]
    codes = spark.createDataFrame(codes_rows, "vec_id long, codes array<int>")
    out = pq.pq_topk(codes, x[0], books, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # scoring is whole-stage codegen
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 5


def test_adc_equals_lut_sum(spark):
    x = _sample(seed=9, n=40, dim=16)
    books = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    codes = pq.pq_encode(df, books)
    lut = pq.pq_adc_lut(x[1], books)
    got = {
        r["vec_id"]: r["adc"]
        for r in codes.select(
            "vec_id", F.round(pq.pq_score("codes", lut), 6).alias("adc")
        ).collect()
    }
    enc = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for i in range(40):
        want = 0.0
        for s in range(4):
            want = want + lut[s][enc[i][s]]
        assert got[i] == pytest.approx(round(want, 6), abs=1e-9)


def test_two_stage_recall_vs_exact(spark):
    """PQ+rerank must recover most of the exact cosine top-k on
    clustered data (the fixture's nearest neighbors share a cluster)."""
    x = _sample(seed=21, n=300, dim=32)
    books = pq.train_pq_codebooks(x[:200], m=8, k=16, seed=7)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    base = df.where(F.col("vec_id") != 0)
    q = x[0]
    codes = pq.pq_encode(base, books)
    got = pq.pq_topk(
        codes, q, books, k=10, rerank=50, vectors=base, vec_col="embedding"
    ).collect()
    got_ids = {r["vec_id"] for r in got}
    qn = q / np.linalg.norm(q)
    sims = (x[1:] / np.linalg.norm(x[1:], axis=1, keepdims=True)) @ qn
    exact = set((np.argsort(-sims, kind="stable")[:10] + 1).tolist())
    recall = len(got_ids & exact) / 10
    assert recall >= 0.8, (recall, sorted(got_ids), sorted(exact))


def test_corrupted_codes_score_null_and_sort_last(spark):
    x = _sample(seed=2, n=20, dim=16)
    books = pq.train_pq_codebooks(x, m=4, k=8, seed=7)
    lut = pq.pq_adc_lut(x[0], books)
    rows = [
        (1, [0, 1, 2, 3]),     # valid
        (2, [-1, 1, 2, 3]),    # element_at(arr, 0) would throw
        (3, [-2, 1, 2, 3]),    # negative index would pick from the END
        (4, [99, 1, 2, 3]),    # out of range high
    ]
    codes = spark.createDataFrame(rows, "vec_id long, codes array<int>")
    got = {
        r["vec_id"]: r["adc"]
        for r in codes.select(
            "vec_id", F.round(pq.pq_score("codes", lut), 6).alias("adc")
        ).collect()
    }
    assert got[1] is not None
    assert got[2] is None and got[3] is None and got[4] is None
    top = pq.pq_topk(codes, x[0], books, k=4).collect()
    assert top[0]["vec_id"] == 1  # the only real candidate ranks first
