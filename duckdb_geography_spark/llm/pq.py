"""Product quantization (PQ) similarity search — the memory-bound ANN
layout for vector corpora that dwarf RAM (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Shape at 100 TB:

- **train** — per-subspace euclidean k-means on a bounded driver-side
  sample (milliseconds; deterministic so the DuckDB oracle can replay
  the codebooks bit-for-bit).
- **encode (ingest-time)** — ONE vectorized Arrow pass turns each
  ``dim``-float vector into ``m`` small codes: with m=8 subspaces and
  k=16 codewords a 64-float (256 B) embedding becomes 8 bytes — 32×
  compression. The codes table is what you store and scan.
- **query (ADC)** — the query vector becomes an (m × k) lookup table
  of partial squared distances, embedded as LITERAL arrays in the
  plan; scoring a candidate is ``m`` ``element_at`` picks + adds —
  PURE Column, whole-stage codegen, zero Python, no shuffle until the
  final TakeOrdered top-k. Scanning compressed codes at codegen speed
  is exactly why PQ wins when vectors don't fit in memory.
- **rerank (optional)** — take ``rerank`` ADC candidates, join back to
  the raw vectors (an equi-join on the key — broadcast-sized by
  construction), exact cosine on that tiny set.

Float determinism: every multi-term sum here (encode distances, LUT
entries) accumulates SEQUENTIALLY (left-to-right) — numpy's
``np.sum`` switches to pairwise/tree order at length 8, which would
diverge from SQL's left-associative ``+`` chain on the same doubles.
The explicit accumulation loops make Spark, numpy, and the DuckDB
oracle bit-identical.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_pq_codebooks",
    "pq_encode",
    "pq_adc_lut",
    "pq_score",
    "pq_topk",
]


def _seq_sq_dist(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared euclidean distance with SEQUENTIAL accumulation over the
    feature axis (x: (n, d) or (d,), c: (d,)) — the float-add order the
    SQL oracle's left-associative ``+`` chain produces."""
    x2 = np.atleast_2d(np.asarray(x, dtype=np.float64))
    acc = np.zeros(len(x2), dtype=np.float64)
    for i in range(x2.shape[1]):
        d = x2[:, i] - c[i]
        acc += d * d
    return acc


def train_pq_codebooks(
    sample: np.ndarray,
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic per-subspace euclidean k-means: greedy kmeans++
    init (first pick seeded, each next = farthest-from-chosen,
    first-wins ties), fixed iteration count, empty cells reseeded to
    the worst-quantized sample point. Returns (m, k, dim // m)
    float64 codebooks. The sample is the only data that touches the
    driver."""
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2 or len(X) < k:
        raise ValueError("training sample must be 2-D with >= k rows")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, ds), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * ds : (s + 1) * ds]
        chosen = [int(rng.integers(len(Xs)))]
        mind = _seq_sq_dist(Xs, Xs[chosen[0]])
        while len(chosen) < k:
            nxt = int(np.argmax(mind))  # first-wins
            chosen.append(nxt)
            mind = np.minimum(mind, _seq_sq_dist(Xs, Xs[nxt]))
        C = Xs[chosen].copy()
        for _ in range(iters):
            dists = np.stack([_seq_sq_dist(Xs, C[j]) for j in range(k)], axis=1)
            assign = np.argmin(dists, axis=1)  # first-wins ties
            worst = np.argsort(-dists[np.arange(len(Xs)), assign], kind="stable")
            wi = 0
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
                else:  # reseed dead codeword deterministically
                    C[j] = Xs[worst[wi]]
                    wi += 1
        books[s] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Ingest-time encode: (key, codes array<int> of length m) via one
    vectorized Arrow pass (argmin over k codewords per subspace,
    first-wins ties). Persist the result — it IS the index."""
    m, k, ds = codebooks.shape
    books = np.ascontiguousarray(codebooks)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        if X.ndim != 2 or X.shape[1] != m * ds:
            raise ValueError(
                f"pq_encode: vectors of dim {X.shape[-1] if X.ndim else '?'} "
                f"do not match codebooks ({m} x {ds})"
            )
        out = np.empty((len(X), m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * ds : (s + 1) * ds]
            d = np.stack([_seq_sq_dist(Xs, books[s, j]) for j in range(k)], axis=1)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series([row.tolist() for row in out])

    return df.select(
        F.col(key_col), _enc(F.col(vec_col)).alias("codes")
    )


def pq_adc_lut(query, codebooks: np.ndarray) -> np.ndarray:
    """(m, k) asymmetric-distance lookup table for one query vector:
    ``lut[s, j]`` = sequential-sum squared distance between the query's
    s-th subvector and codeword j."""
    q = np.asarray(query, dtype=np.float64)
    m, k, ds = codebooks.shape
    lut = np.empty((m, k), dtype=np.float64)
    for s in range(m):
        qs = q[s * ds : (s + 1) * ds]
        for j in range(k):
            lut[s, j] = _seq_sq_dist(qs, codebooks[s, j])[0]
    return lut


def pq_score(codes_col, lut: np.ndarray) -> Column:
    """ADC score (smaller = closer) as a PURE Column expression: the
    LUT rides the plan as literal arrays; each subspace contributes one
    ``element_at`` pick; the adds chain left-to-right. Whole-stage
    codegen end to end — no Python anywhere in the scoring scan."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    m, k = lut.shape
    score: Optional[Column] = None
    for s in range(m):
        arr = F.array(*[F.lit(float(x)) for x in lut[s]])
        code = F.element_at(c, s + 1)
        # clamp corruption to NULL: element_at(arr, 0) would throw, a
        # negative index silently picks from the END of the LUT, and a
        # runtime-NULL index ALSO resolves to the last element in this
        # Spark build — so the element_at itself must sit inside the
        # when() branch (CaseWhen evaluates branches lazily per row)
        term = F.when((code >= 0) & (code < int(k)), F.element_at(arr, code + 1))
        score = term if score is None else score + term
    return score


def pq_topk(
    codes: DataFrame,
    query,
    codebooks: np.ndarray,
    k: int = 10,
    key_col: str = "vec_id",
    rerank: int = 0,
    vectors: Optional[DataFrame] = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by ADC over a PQ codes table: pure-Column scoring +
    TakeOrdered (never a global sort). With ``rerank > 0`` and the raw
    ``vectors`` frame, the ``rerank`` best ADC candidates join back to
    their full vectors (equi-join on the key, broadcast-sized by
    construction) and exact cosine orders the final k — the standard
    two-stage PQ pipeline. Returns (key, adc) or (key, score) for the
    reranked form, floats rounded to 6dp."""
    lut = pq_adc_lut(query, codebooks)
    scored = codes.select(
        F.col(key_col), pq_score("codes", lut).alias("__adc")
    )
    # asc_nulls_last: a corrupted code (out of [0, k)) scores NULL,
    # which must never outrank a real candidate
    if rerank <= 0:
        return scored.select(
            key_col, F.round("__adc", 6).alias("adc")
        ).orderBy(F.col("adc").asc_nulls_last(), F.col(key_col).asc()).limit(k)
    if vectors is None:
        raise ValueError("rerank > 0 requires the raw vectors frame")
    cand = scored.orderBy(
        F.col("__adc").asc_nulls_last(), F.col(key_col).asc()
    ).limit(int(rerank))
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    qarr = F.array(*[F.lit(float(x)) for x in qn])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col(vec_col).cast("array<double>"),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = (
        vectors.join(F.broadcast(cand.select(key_col)), key_col)
        .select(F.col(key_col), (dot / F.greatest(norm, F.lit(1e-30))).alias("__cos"))
    )
    return (
        exact.select(key_col, F.round("__cos", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(key_col).asc())
        .limit(k)
    )
