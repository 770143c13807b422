"""Mergeable streaming sketches — HyperLogLog distinct counting and
count-min frequency estimation — as pure Column/aggregate plans.

Why these exist in a 100-TB curation engine: exact ``COUNT(DISTINCT
key)`` over a high-cardinality key (users, URLs, shingles) shuffles
every distinct value; a HyperLogLog register table shuffles at most
``m`` rows per group (here m=256 → a few KB) and the register ``max``
is map-side combinable, so the reduce side sees group×register keys
only.  Count-min bounds frequency-table state at ``depth×width``
cells regardless of vocabulary size.  Both sketches are MERGEABLE
(register max / cell sum), so per-day or per-corpus sketches union
without rescanning raw data — the property that makes them the
standard incremental-rollup primitives.

Spark-native shape: everything below is ``groupBy().agg()`` over JVM
column expressions (md5/xxhash64, bit math via ``conv``/``bin``) —
no UDFs, no driver-side state, whole-stage codegen end to end.

Determinism / oracle story: with ``hash_fn='md5'`` the 60-bit key
hash is ``('0x' || substr(md5(k),1,15))::BIGINT`` — exactly
replayable in DuckDB — and every estimate is derived from integer
register state: the harmonic denominator is an exact BIGINT sum of
powers of two (``2^(S - M_j)`` at fixed scale S), the linear-counting
branch routes through integer-argument micronat logs (the
cross-engine-parity trick ``llm/lm.py`` established), and the one
float division uses a single precomputed double constant — so the
whole output is bit-stable across engines and row orders.

Reference: the reference engine has no sketch surface; this follows
Flajolet et al. 2007 (HyperLogLog) and Cormode & Muthukrishnan 2005
(count-min), re-expressed as Spark aggregation plans.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
    "cms_sketch",
    "cms_merge",
    "cms_lookup",
    "bloom_sketch",
    "bloom_merge",
    "bloom_contains",
    "bloom_prefilter",
]

#: md5 prefix width: 15 hex chars = 60 bits fits a signed BIGINT in
#: both Spark and DuckDB (dedup.py::_token_hash uses the same cut).
_HASH_BITS = 60


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _key_hash(col, hash_fn: str) -> Column:
    """Non-negative 60-bit hash of the key (md5 tier is the DuckDB-
    replayable one; xxhash64 is the fast JVM-intrinsic tier)."""
    if hash_fn == "md5":
        # md5 needs STRING/BINARY; integer keys render identically as
        # strings in Spark and DuckDB (CAST(x AS VARCHAR))
        return F.conv(
            F.substring(F.md5(_c(col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    if hash_fn == "xxhash64":
        return F.xxhash64(_c(col)).bitwiseAND(F.lit((1 << _HASH_BITS) - 1))
    raise ValueError(f"unknown hash_fn {hash_fn!r} (use 'md5' or 'xxhash64')")


def _check_p(p: int) -> None:
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")


def _alpha(m: int) -> float:
    # standard HLL bias constants (Flajolet et al. 2007, fig. 3)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_reg_rho(key_col, p: int, hash_fn: str) -> tuple[Column, Column]:
    """The (register, rho) column pair for one key — shared by the
    batch register table and the streaming windowed variant."""
    nbits = _HASH_BITS - p  # rho bits
    h = _key_hash(key_col, hash_fn)
    reg = F.call_function("shiftrightunsigned", h, F.lit(nbits))
    w = h.bitwiseAND(F.lit((1 << nbits) - 1))
    # bit_length(w) == length(conv(w, 10, 2)) for w > 0; rho is
    # (nbits - bit_length + 1), and an all-zero remainder maxes out
    rho = (
        F.when(w == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits + 1) - F.length(F.conv(w, 10, 2)))
        .cast("int")
    )
    return reg, rho


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """HyperLogLog register table ``(group..., reg, m_rho)`` for
    ``2**p`` registers: reg = top ``p`` hash bits, rho = leading-zero
    rank of the remaining ``60 - p`` bits (1-based; all-zero remainder
    scores the max rank ``60 - p + 1``).  The ``max`` aggregate is
    map-side combinable, so at scale each executor emits at most
    ``groups × 2**p`` rows into the shuffle no matter how many raw
    keys it scanned.  NULL keys are skipped (COUNT DISTINCT parity).

    Persist / union register tables across runs and fold them with
    :func:`hll_merge` — sketch merging is exact (register-wise max).
    """
    _check_p(p)
    group_cols = list(group_cols or [])
    reg, rho = hll_reg_rho(key_col, p, hash_fn)
    return (
        df.where(_c(key_col).isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_merge(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold a union of register tables (same ``p``) into one —
    register-wise max.  HLL union is lossless: the merged sketch is
    identical to sketching the concatenated inputs."""
    group_cols = list(group_cols or [])
    return registers.groupBy(*group_cols, "reg").agg(
        F.max("m_rho").alias("m_rho")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    Returns ``(group..., v_registers, z_num, est_raw, distinct_est)``:

    - ``v_registers`` — occupied registers (BIGINT),
    - ``z_num`` — the harmonic denominator as an EXACT integer:
      ``sum(2^(S - M_j))`` over all ``m`` registers at scale
      ``S = 61 - p`` (absent registers contribute ``2^S``); max value
      ``m * 2^S = 2^61`` fits BIGINT and integer sums are
      order-independent,
    - ``est_raw`` — the raw HLL estimate ``alpha_m * m^2 / Z``
      evaluated as one double division by ``z_num``,
    - ``distinct_est`` — with the standard small-range correction:
      linear counting ``m * ln(m / (m - v))`` (computed in integer
      micronats, the lm.py cross-engine trick) when
      ``est_raw <= 2.5 m`` and some register is empty.

    Relative error ≈ ``1.04 / sqrt(m)`` (~6.5% at p=8).
    """
    _check_p(p)
    group_cols = list(group_cols or [])
    m = 1 << p
    scale = _HASH_BITS + 1 - p  # S: max rho, so S - M_j >= 0
    # single precomputed double constant => one deterministic division
    numer = _alpha(m) * m * m * float(1 << scale)
    z_present = F.sum(
        F.call_function("shiftleft", F.lit(1).cast("long"), F.lit(scale) - F.col("m_rho"))
    )
    v = F.count(F.lit(1))
    agg = registers.groupBy(*group_cols).agg(
        v.alias("v_registers"), z_present.alias("z_present")
    )
    z_num = (
        F.col("z_present")
        + (F.lit(m) - F.col("v_registers"))
        * F.lit(1 << scale).cast("long")
    ).alias("z_num")
    out = agg.select(*group_cols, F.col("v_registers"), z_num)
    est_raw = F.round(F.lit(numer) / F.col("z_num").cast("double"), 6)
    # linear counting in integer micronats: m * (ln(m) - ln(m - v))
    ln_m = F.lit(int(round(math.log(m) * 1_000_000)))
    ln_rem = F.round(
        F.log(F.lit(m).cast("double") - F.col("v_registers").cast("double"))
        * 1_000_000
    ).cast("long")
    lc_micro = F.lit(m).cast("long") * (ln_m - ln_rem)
    est_lc = F.round(lc_micro.cast("double") / 1_000_000.0, 6)
    out = out.withColumn("est_raw", est_raw)
    return out.withColumn(
        "distinct_est",
        F.when(
            (F.col("est_raw") <= F.lit(2.5 * m)) & (F.col("v_registers") < m),
            est_lc,
        ).otherwise(F.col("est_raw")),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-shot ``hll_registers`` → ``hll_estimate``: approximate
    ``COUNT(DISTINCT key_col)`` per group with bounded shuffle width.
    See :func:`hll_estimate` for the output columns."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols=group_cols, p=p, hash_fn=hash_fn),
        group_cols=group_cols,
        p=p,
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_cell(col, j: int, width: int, hash_fn: str) -> Column:
    """Row-``j`` cell index: 60-bit hash of ``j || ':' || key`` mod
    width — depth independent salted hashes from one md5 family."""
    salted = F.concat_ws(":", F.lit(str(j)), _c(col))
    return F.pmod(_key_hash(salted, hash_fn), F.lit(width)).alias("cell")


def cms_sketch(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-min sketch ``(j, cell, c)`` of key frequencies (or
    weighted sums): each key increments one cell per hash row.  State
    is bounded at ``depth × width`` cells regardless of key
    cardinality; the sum aggregate is map-side combinable and the
    sketch is mergeable by cell-wise addition (:func:`cms_merge`).

    The per-key fan-out to ``depth`` rows is a no-shuffle
    generate+explode; the single shuffle is the bounded cell
    aggregation.  NULL keys are skipped.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    w = _c(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                _cms_cell(key_col, j, width, hash_fn).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.where(_c(key_col).isNotNull())
        .select(F.explode(rows).alias("rc"), w.alias("w"))
        .select("rc.j", "rc.cell", "w")
        .groupBy("j", "cell")
        .agg(F.sum("w").alias("c"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Fold a union of sketches (same depth/width/hash) into one —
    cell-wise sum, the exact merge."""
    return sketches.groupBy("j", "cell").agg(F.sum("c").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-estimate frequencies for a key set: ``est = min_j
    sketch[j][h_j(key)]`` — never an under-count, over-counts bounded
    by ``e·N/width`` with prob ``1 - e^-depth``.  The probe is a
    ``depth``-row explode per key joined against the bounded sketch
    (AQE broadcasts it: ≤ depth×width rows), then a min aggregate —
    no full-vocabulary join anywhere.  A cell absent from the sketch
    is an exact zero."""
    probes = keys.select(
        _c(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _cms_cell(key_col, j, width, hash_fn).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("key", "rc.j", "rc.cell")
    joined = probes.join(sketch, on=["j", "cell"], how="left").select(
        "key", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    return joined.groupBy("key").agg(F.min("c").alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_probes(col, k: int, n_bits: int, hash_fn: str) -> list[Column]:
    """The k bit positions for one key — salted members of one md5/
    xxhash64 family, like the count-min rows."""
    return [
        F.pmod(
            _key_hash(F.concat_ws(":", F.lit(str(j)), _c(col)), hash_fn),
            F.lit(n_bits),
        )
        for j in range(k)
    ]


def _check_bloom(n_bits: int, k: int) -> None:
    # 32 bits per BIGINT word: both engines can shift 1 << 31 without
    # signed-overflow errors (DuckDB refuses 1::BIGINT << 63)
    if n_bits < 32 or n_bits % 32 != 0:
        raise ValueError("n_bits must be a positive multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")


def bloom_sketch(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bloom filter of a key set as a bounded table ``(word_idx,
    bits)``: ``n_bits`` bit positions packed 32 per BIGINT word, each
    key setting ``k`` salted-hash bits. Build is explode(k) →
    ``bit_or`` per word — map-side combinable, at most ``n_bits/64``
    rows in the shuffle regardless of key count; merge of two blooms
    (same shape) is the same ``bit_or`` (:func:`bloom_merge`).

    Why at 100 TB: the standard join-prefilter shape — a dimension
    side too big to broadcast raw often has a bloom that DOES fit
    (2^20 bits = 32K rows = 256 KB), turning a shuffle join into a
    broadcast bitmap probe that drops most fact rows at the scan
    stage. False-positive rate ≈ ``(1 - e^{-k·n/n_bits})^k`` — size
    n_bits ≈ 10-15 bits/key for ~1% at k=5. NULL keys are skipped;
    membership has NO false negatives.
    """
    _check_bloom(n_bits, k)
    probes = _bloom_probes(key_col, k, n_bits, hash_fn)
    rows = F.array(
        *[
            F.struct(
                F.call_function("shiftrightunsigned", b, F.lit(5)).alias(
                    "word_idx"
                ),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    b.bitwiseAND(F.lit(31)).cast("int"),
                ).alias("mask"),
            )
            for b in probes
        ]
    )
    return (
        df.where(_c(key_col).isNotNull())
        .select(F.explode(rows).alias("wb"))
        .select("wb.word_idx", "wb.mask")
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Union of bloom filters (same n_bits/k/hash): word-wise OR."""
    return sketches.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Membership probe: ``(key, maybe)`` — ``maybe`` true iff ALL k
    probe bits are set (false ⇒ definitely absent). The probe is an
    explode(k) → broadcast-sized left join on word_idx → all-bits-hit
    aggregate."""
    _check_bloom(n_bits, k)
    probes = _bloom_probes(key_col, k, n_bits, hash_fn)
    rows = F.array(
        *[
            F.struct(
                F.call_function("shiftrightunsigned", b, F.lit(5)).alias(
                    "word_idx"
                ),
                b.bitwiseAND(F.lit(31)).cast("int").alias("bit"),
            )
            for b in probes
        ]
    )
    pr = (
        keys.select(_c(key_col).alias("key"), F.explode(rows).alias("wb"))
        .select("key", "wb.word_idx", "wb.bit")
        .join(F.broadcast(sketch), on="word_idx", how="left")
        .select(
            "key",
            (
                F.call_function(
                    "shiftrightunsigned",
                    F.coalesce(F.col("bits"), F.lit(0).cast("long")),
                    F.col("bit"),
                ).bitwiseAND(F.lit(1))
                == 1
            ).alias("hit"),
        )
    )
    return pr.groupBy("key").agg(F.min("hit").alias("maybe"))


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    k: int = 5,
    hash_fn: str = "xxhash64",
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` through a bloom of the dim keys:
    probe bits drop definitely-absent fact rows against a broadcast
    128 KB bitmap (no shuffle of the fact side), then — with
    ``exact=True`` — a LEFT SEMI join against the surviving minority
    removes the bloom's false positives. With ``exact=False`` you keep
    the ~fp_rate over-selection and skip the second join entirely
    (fine when a downstream exact join re-checks the key anyway)."""
    probes = _bloom_probes(fact_key, k, n_bits, hash_fn)
    sketch = bloom_sketch(dim, dim_key, n_bits=n_bits, k=k, hash_fn=hash_fn)
    # inline all-k-bits check as one conjunction over the broadcast map
    # (collect-free: join per probe word would shuffle; instead probe
    # via k broadcast left joins folded into one array lookup table)
    words = sketch.select("word_idx", "bits")
    out = fact
    conds = []
    for j, b in enumerate(probes):
        w = words.withColumnRenamed("word_idx", f"__w{j}").withColumnRenamed(
            "bits", f"__b{j}"
        )
        out = out.join(
            F.broadcast(w),
            F.call_function("shiftrightunsigned", b, F.lit(5))
            == F.col(f"__w{j}"),
            "left",
        )
        conds.append(
            F.call_function(
                "shiftrightunsigned",
                F.coalesce(F.col(f"__b{j}"), F.lit(0).cast("long")),
                b.bitwiseAND(F.lit(31)).cast("int"),
            ).bitwiseAND(F.lit(1))
            == 1
        )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    out = out.where(cond).select(*fact.columns)
    if exact:
        out = out.join(
            dim.select(_c(dim_key).alias(fact_key)).distinct(),
            on=fact_key,
            how="left_semi",
        )
    return out
