"""Deduplication operators for training-data pipelines.

Five families, each designed around its 100 TB shape:

- **exact**: md5 groupBy — one shuffle on a 128-bit key, map-side
  combinable, fully JVM-side.
- **n-gram Jaccard**: exact pairwise similarity for modest candidate
  sets; SQL-expressible for the oracle gate.
- **MinHash + LSH**: banded minhash signatures -> bucket equi-join;
  the only all-pairs-free near-dup join shape that scales.
- **SimHash**: 64-bit signature, hamming-bucket join.
- **embedding near-dup**: cosine over `array<float>` with a random
  hyperplane LSH variant as the scale path (see similarity.py).

All signature math uses Spark built-ins (xxhash64, aggregate,
transform) — no Python in any per-row path.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "ngram_set",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_jaccard_pairs",
    "minhash_dedup",
    "connected_components",
    "simhash",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "semdedup",
]

_MERSENNE61 = (1 << 61) - 1


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _token_hash(col, bits: int, hash_fn: str) -> Column:
    """``bits``-wide non-negative hash of a string column.

    ``xxhash64`` is the fast default (JVM intrinsic). ``md5`` derives
    the value from a hex prefix of md5 — a few times slower but it has
    an exact DuckDB twin (``('0x' || substr(md5(s),1,N))::BIGINT``),
    which is what puts the minhash/simhash pipelines under the
    driver's SQL oracle. Both stay fully JVM-side."""
    if hash_fn == "xxhash64":
        return F.xxhash64(_c(col)).bitwiseAND(F.lit((1 << bits) - 1))
    if hash_fn == "md5":
        nhex = (bits + 3) // 4
        return (
            F.conv(F.substring(F.md5(_c(col)), 1, nhex), 16, 10)
            .cast("long")
            .bitwiseAND(F.lit((1 << bits) - 1))
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r} (use 'xxhash64' or 'md5')")


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep one row (min key) per distinct text. Single hash-shuffle on
    md5(text); survives 100 TB because the shuffle key is 32 bytes no
    matter how big the documents are."""
    h = F.md5(_c(text_col))
    winners = (
        df.select(h.alias("__h"), F.col(key_col))
        .groupBy("__h")
        .agg(F.min(key_col).alias(key_col))
    )
    return df.join(winners, key_col, "left_semi").dropDuplicates([key_col])


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_set(text, n: int = 3) -> Column:
    """Distinct character n-grams of a string (array<string>)."""
    t = _c(text)
    count = F.greatest(F.length(t) - F.lit(n - 1), F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), count), lambda i: t.substr(i, F.lit(n)))
    return F.when(count == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def ngram_jaccard(a, b, n: int = 3) -> Column:
    """Exact Jaccard similarity of two strings' n-gram sets."""
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = (F.size(sa) + F.size(sb)).cast("double") - inter
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def _assert_small(df: DataFrame, max_rows, scale_path: str, caller: str) -> None:
    """Guard rail on the documented quadratic baselines: they exist to
    validate the scale paths on small candidate sets, and an
    accidental call over a big table would plan an all-pairs join.
    Pass ``max_rows=None`` to opt out explicitly.

    NOTE the probe is an EAGER Spark action at plan-construction time
    (a limit(max_rows+1).count() — bounded, never a full scan). That
    is a deliberate trade: the guard must fire before the quadratic
    plan is even built, and these baselines are small-N validation
    tools, not hot-path operators. Callers that only want to inspect
    the plan (explain, registries) pass max_rows=None to stay lazy."""
    if max_rows is None:
        return
    # bounded probe: read at most max_rows+1 rows, never a full count
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{caller} is a quadratic all-pairs baseline and the input has "
            f"> max_rows={max_rows} rows; use {scale_path} at scale, "
            f"or pass max_rows=None to force the quadratic plan"
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold (key_a < key_b).

    Exact all-pairs comparison — only for candidate sets that fit a
    shuffle (use :func:`minhash_lsh_pairs` to generate candidates at
    scale, then refine with :func:`ngram_jaccard`).

    Gram sets are materialized per document *before* the pair join
    (not per pair), and the probe side is repartitioned so the
    nested-loop join parallelizes instead of running on one task."""
    _assert_small(df, max_rows, "minhash_lsh_pairs + ngram refine", "ngram_jaccard_pairs")
    sc = df.sparkSession.sparkContext
    grams = df.select(F.col(key_col).alias("__k"), ngram_set(text_col, n).alias("__g"))
    a = grams.select(F.col("__k").alias("key_a"), F.col("__g").alias("ga")).repartition(
        max(sc.defaultParallelism, 4)
    )
    b = grams.select(F.col("__k").alias("key_b"), F.col("__g").alias("gb"))
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = (F.size("ga") + F.size("gb")).cast("double") - inter
    sim = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        pairs.select("key_a", "key_b", F.round(sim, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _perm_coeffs(num_perm: int, seed: int = 42):
    # 31-bit coefficients over a 31-bit hash domain: a*h < 2^62, so the
    # permutation never overflows Spark's ANSI-checked 64-bit multiply
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 31) - 1, num_perm, dtype=np.int64)
    b = rng.integers(0, (1 << 31) - 1, num_perm, dtype=np.int64)
    return a, b


def minhash_signature(
    text, n: int = 5, num_perm: int = 64, seed: int = 42, hash_fn: str = "xxhash64"
) -> Column:
    """MinHash signature (array<long>, length num_perm) over character
    n-gram shingles. shingle hash = 31-bit (:func:`_token_hash`);
    permutation k = (a_k*h + b_k) mod 2^61-1 — all Column math,
    map-side only."""
    shingles = ngram_set(text, n)
    hashes = F.transform(shingles, lambda s: _token_hash(s, 31, hash_fn))
    a, b = _perm_coeffs(num_perm, seed)

    def perm(ai: int, bi: int):
        return lambda h: (h * F.lit(ai) + F.lit(bi)) % F.lit(_MERSENNE61)

    mins = [
        F.array_min(F.transform(hashes, perm(int(a[k]), int(b[k]))))
        for k in range(num_perm)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 5,
    num_perm: int = 64,
    bands: int = 8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket: Optional[int] = 500,
    warn_dropped: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band-slice of the
    minhash signature -> same bucket. One explode + one equi-join; no
    all-pairs stage anywhere (the 100 TB shape).

    ``max_bucket`` (default 500) is the skew guard: a degenerate
    bucket holding B keys (boilerplate text, empty docs) emits B^2/2
    pairs — at corpus scale one hot bucket can dominate the whole
    join. Buckets above the cap are dropped BEFORE any member list is
    materialized: a per-bucket ``count(*)`` (map-side-combinable, the
    shuffled partial counts are tiny) selects the eligible buckets,
    and a LEFT SEMI join keeps only their rows — so an oversized
    bucket never reaches a ``collect_list`` aggregation buffer. The
    semi-join output is already hash-partitioned on the bucket key,
    so the member aggregation that follows adds no extra shuffle of
    the wide rows. Near-identical members of a dropped bucket still
    pair through their other ``bands-1`` (less degenerate) bands.
    This is the same escape hatch every production LSH dedup ships
    (cf. the candidate cap in spark-ml's MinHashLSH
    approxSimilarityJoin). ``max_bucket=None`` disables the guard
    (NOT recommended beyond toy scale).

    NOTE the default changed from None to 500 in round 4: homogeneous
    near-dup clusters larger than the cap saturate every band's
    bucket and emit zero candidate pairs — run :func:`exact_dedup`
    first or raise the cap when such clusters are expected.
    ``warn_dropped=True`` makes the recall loss observable: it runs
    one extra bounded job (per-bucket counts only — no member lists)
    and emits a UserWarning naming how many buckets/rows the guard
    dropped. Off by default because the count job re-evaluates the
    signature subtree.

    Returns (key_a, key_b) candidates, key_a < key_b, deduped.
    """
    assert num_perm % bands == 0
    if max_bucket is not None and max_bucket < 2:
        raise ValueError("max_bucket must be >= 2 (or None to disable)")
    rows = num_perm // bands
    # explode shingles -> per-shingle hash -> groupBy min per
    # permutation. One pass over the shingles, map-side partial
    # aggregation, no repeated evaluation of the shingle array (the
    # single-expression form recomputes the n-gram set per
    # permutation — 30x slower at sf0.1).
    a, b = _perm_coeffs(num_perm, seed)
    sh = df.select(
        F.col(key_col).alias("__key"),
        F.explode(ngram_set(text_col, n)).alias("__gram"),
    ).select(
        "__key",
        _token_hash("__gram", 31, hash_fn).alias("__h"),
    )
    # the whole signature is ONE array expression and the banding is
    # ONE explode(transform(...)) expression: query construction is
    # driver-side Py4J latency (a quarter-millisecond per Column node),
    # and the column-at-a-time form costs ~3400 round-trips (~0.9s)
    # before Spark sees any SQL at all
    mins_csv = ", ".join(
        f"min((__h * {int(a[k])}L + {int(b[k])}L) % {_MERSENNE61}L)"
        for k in range(num_perm)
    )
    sig = sh.groupBy("__key").agg(F.expr(f"array({mins_csv})").alias("__ms"))
    # band key = the raw min tuple (not a hash of it): equally correct
    # as a bucket key, with zero false-positive band collisions, and —
    # unlike Spark's murmur3 F.hash — exactly reproducible by the SQL
    # oracle. 8 longs per key is a slightly fatter shuffle; acceptable.
    buckets = sig.select(
        "__key",
        F.expr(
            f"explode(transform(sequence(0, {bands - 1}), "
            f"bi -> struct(bi AS band, slice(__ms, bi * {rows} + 1, {rows}) AS h)))"
        ).alias("__bucket"),
    )
    # pair expansion via ONE aggregation instead of a self-join: the
    # join form evaluates the whole signature subtree (shingle explode
    # + 64-way min agg) TWICE — once per join branch, since the
    # branches project differently and their exchanges can't be
    # reused. Collecting each bucket's members and expanding the
    # sorted combinations keeps a single signature pass. Memory: only
    # buckets already proven <= max_bucket by the count below ever
    # reach an aggregation buffer (the join form degrades the same
    # way, just by emitting B^2 rows instead).
    if max_bucket is not None:
        # skew guard, applied BEFORE collect_list: per-bucket count
        # (partial-aggregated map-side, so the extra shuffle moves
        # only (bucket, count) rows) -> eligible buckets -> LEFT SEMI
        # join. The signature subtree is shared between the two
        # branches up through sig's exchange, which ReuseExchange
        # dedups — the shingle explode + 64-way min scan runs once.
        counts = buckets.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
        if warn_dropped:
            import warnings

            drop = (
                counts.where(F.col("__n") > int(max_bucket))
                .agg(F.count(F.lit(1)).alias("nb"), F.sum("__n").alias("nk"))
                .collect()[0]
            )
            if drop["nb"]:
                warnings.warn(
                    f"minhash_lsh_pairs: skew guard dropped {drop['nb']} "
                    f"bucket(s) holding {drop['nk']} member rows (> "
                    f"max_bucket={max_bucket}); clusters larger than the "
                    "cap only pair through their other bands. Run "
                    "exact_dedup first or raise max_bucket if full "
                    "recall over giant duplicate clusters is required.",
                    UserWarning,
                    stacklevel=3,
                )
        eligible = counts.where(
            (F.col("__n") >= 2) & (F.col("__n") <= int(max_bucket))
        ).select("__bucket")
        buckets = buckets.join(eligible, "__bucket", "left_semi")
    members = buckets.groupBy("__bucket").agg(
        F.sort_array(F.collect_list("__key")).alias("__ks")
    )
    pairs = (
        members.where(F.size("__ks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__ks, (x, i) -> "
                    "transform(slice(__ks, i + 2, size(__ks)), "
                    "y -> struct(x AS key_a, y AS key_b))))"
                )
            ).alias("__p")
        )
        .select(F.col("__p.key_a").alias("key_a"), F.col("__p.key_b").alias("key_b"))
        # strict inequality, not just ordering: duplicate keys in the
        # input (re-ingested corpus) would otherwise emit (k, k)
        # self-pairs — the replaced self-join's key_a < key_b made
        # those impossible
        .where(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )
    return pairs


def minhash_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket: Optional[int] = 500,
    warn_dropped: bool = False,
) -> DataFrame:
    """Near-dup pairs with exact n-gram Jaccard, generated the scalable
    way: banded MinHash-LSH candidates -> exact Jaccard refine. No
    all-pairs stage — the candidate join is a bucket equi-join, and
    only candidate pairs pay the gram-set intersection.

    Returns (key_a, key_b, jaccard) with jaccard >= threshold, for
    pairs the LSH recalls (recall follows the banding S-curve; raise
    ``bands`` for lower thresholds). ``max_bucket`` is
    :func:`minhash_lsh_pairs`'s skew guard — NOTE that a homogeneous
    duplicate cluster larger than the cap saturates EVERY band's
    bucket and emits no pairs at all; run :func:`exact_dedup` first
    (byte-identical copies collapse there) or raise the cap if such
    clusters are expected."""
    cands = minhash_lsh_pairs(
        df, text_col, key_col, n, num_perm, bands, seed, hash_fn, max_bucket,
        warn_dropped=warn_dropped,
    )
    # precomputed-gram refine, same exact values as per-pair
    # ngram_jaccard on raw text — see minhash_dedup for the rationale
    # and measurements (each doc re-shingled once, not once per pair)
    grams = df.select(
        F.col(key_col).alias("__gk"), ngram_set(text_col, n).alias("__gs")
    ).localCheckpoint(eager=False)
    ga = grams.select(F.col("__gk").alias("key_a"), F.col("__gs").alias("__gs_a"))
    gb = grams.select(F.col("__gk").alias("key_b"), F.col("__gs").alias("__gs_b"))
    inter = F.size(F.array_intersect("__gs_a", "__gs_b")).cast("double")
    union = (F.size("__gs_a") + F.size("__gs_b")).cast("double") - inter
    sim = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        cands.join(ga, "key_a")
        .join(gb, "key_b")
        .select("key_a", "key_b", F.round(sim, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    exact_components: bool = False,
    max_bucket: Optional[int] = 500,
    hash_fn: str = "xxhash64",
    warn_dropped: bool = False,
) -> DataFrame:
    """Near-dup removal: LSH candidates -> exact n-gram Jaccard refine
    -> keep one representative per duplicate group.

    Default is the greedy single-hop rule (a row survives unless it
    pairs with a smaller key) — one pass, but a chain a-b-c can keep
    both a and c. ``exact_components=True`` runs full connected
    components over the verified pairs instead (iterative min-label
    propagation, see :func:`connected_components`) and keeps exactly
    the min-key member of every component.

    ``max_bucket`` (default 500) caps LSH bucket size — a homogeneous
    near-dup cluster LARGER than the cap saturates every band's
    bucket and is NOT deduped by this pass (no candidates emitted).
    Byte-identical copies should be collapsed by :func:`exact_dedup`
    first (``llm.pipeline.curate_corpus`` stages it that way); raise
    or disable the cap only if >cap near-identical-but-not-identical
    clusters are expected and the skew cost is acceptable."""
    cands = minhash_lsh_pairs(
        df, text_col, key_col, n, num_perm, bands, seed, hash_fn, max_bucket,
        warn_dropped=warn_dropped,
    )
    # refine over PRECOMPUTED per-document gram arrays, not raw text:
    # a document appears in ~(candidates/docs) pairs, and the old
    # per-pair ngram_jaccard re-shingled both texts for every pair —
    # at sf0.1's ~185 candidates/doc that re-shingling was 80% of the
    # whole dedup (measured 199 s -> 40 s, identical survivors). The
    # gram table is lineage-cut so it is built once and both join
    # sides read the same blocks; the per-pair work left is the
    # irreducible array_intersect. Same exact semantics: ngram_set is
    # deterministic and the Jaccard expression is unchanged, just
    # over stored arrays. (Trade at cluster scale: the join ships
    # gram arrays (~n x text bytes) instead of text — CPU dominates
    # measured wall by far.)
    grams = df.select(
        F.col(key_col).alias("__gk"), ngram_set(text_col, n).alias("__gs")
    ).localCheckpoint(eager=False)
    ga = grams.select(F.col("__gk").alias("key_a"), F.col("__gs").alias("__gs_a"))
    gb = grams.select(F.col("__gk").alias("key_b"), F.col("__gs").alias("__gs_b"))
    inter = F.size(F.array_intersect("__gs_a", "__gs_b")).cast("double")
    union = (F.size("__gs_a") + F.size("__gs_b")).cast("double") - inter
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    verified = (
        cands.join(ga, "key_a")
        .join(gb, "key_b")
        .where(jac >= threshold)
        .select("key_a", "key_b")
    )
    if exact_components:
        comp = connected_components(verified)
        losers = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias(key_col)
        )
    else:
        losers = verified.select(F.col("key_b").alias(key_col)).distinct()
    return df.join(losers, key_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    nodes: Optional[DataFrame] = None,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Full near-dup clustering: connected components over candidate
    pairs by iterative min-label propagation (the exact version of
    ``minhash_dedup``'s greedy single-hop).

    Each round is one equi-join + min-aggregation — two key shuffles,
    no all-pairs anywhere — and the number of rounds is the graph
    diameter, which for near-dup clusters is small (dup clusters are
    dense, so labels cross them in one or two hops).
    ``localCheckpoint`` truncates lineage each round so the plan does
    not grow with iterations (the standard guard for iterative
    DataFrame algorithms). Convergence is detected distributedly (a
    count of changed labels), so the driver never holds labels — and
    the changed flag is computed IN the label-update projection, so
    counting it just scans the freshly checkpointed blocks: no
    old-vs-new re-join, no extra shuffle job per round.

    Returns ``(node, component)`` where ``component`` is the minimum
    key in the node's component. ``nodes`` (optional, first column
    used) adds isolated nodes as singleton components.
    """
    e = pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    n = edges.select(F.col("src").alias("node"))
    if nodes is not None:
        n = n.unionAll(nodes.select(F.col(nodes.columns[0]).alias("node")))
    labels = n.distinct().select("node", F.col("node").alias("label")).localCheckpoint()
    changed = None  # None = the loop never ran (max_iter <= 0)
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("dlabel")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr.select(F.col("src").alias("node"), "nbr_min"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                # changed iff a neighbor offered a strictly smaller
                # label — carried as a column so the convergence count
                # below reads the checkpoint, not a re-join
                (F.col("nbr_min") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint()  # eager: the one heavy action per round
        )
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    else:
        # exhausting max_iter without convergence means labels are
        # still propagating (graph diameter > max_iter) — returning
        # them would silently split components
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            + (f"({changed} labels still changing); " if changed is not None else "")
            + "raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_bits: int = 64,
    hash_fn: str = "xxhash64",
    out_col: str = "sig",
) -> DataFrame:
    """Batch twin of :func:`simhash` — identical signatures, computed
    as explode + ``n_bits`` codegen'd vote sums instead of the per-row
    interpreted higher-order lambda (which pays ~n_bits interpreted
    expression evals PER TOKEN; measured 3.2s -> 0.6s for 5k docs at
    sf0.1). Use this for batch corpora; keep the Column form for
    per-row contexts (streaming, ad-hoc expressions).

    Shape: explode tokens -> hash once per token -> groupBy(key) with
    one integer SUM per bit (map-side combinable: the exchange carries
    one n_bits-wide row per key per partition) -> signature assembled
    by a pure projection. Bit-exactness with the Column form: the
    votes are order-free integer sums, the majority test (> 0) and the
    bit placement (shiftleft; distinct powers, so the sum IS the
    bitwise or) are the same arithmetic. Docs with no tokens (empty,
    whitespace-only, or NULL text) get 0 — the Column form's exact
    contract. ``key_col`` must be unique (one signature per key)."""
    tokens = F.filter(
        F.split(F.trim(F.col(text_col)), "\\s+"), lambda t: F.length(t) > 0
    )
    tok = df.select(F.col(key_col).alias("__key"), F.explode(tokens).alias("__t"))
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.col("__t"))
    else:
        h = _token_hash(F.col("__t"), 60, hash_fn)
    tok = tok.select("__key", h.alias("__h"))
    # two-level branch-free vote form (round 9; suite gate measured
    # 2.5 s -> ~0.9 s at sf0.1): level 1 collapses repeated tokens to
    # (key, hash, count) — a 1-counter map-side-combinable aggregate,
    # and natural text repeats words (~2.3x here), so the expensive
    # stage sees only distinct (key, hash) rows. Level 2 runs the
    # n_bits per-bit sums weighted by the count. The +1/-1 majority
    # vote over bit i equals 2*sum(bit_i) - n_tokens, so each
    # per-bit aggregate is a plain weighted sum of (h >>> i) & 1 —
    # no when/otherwise in the hot path — plus one shared token
    # count; the majority test (votes > 0) becomes 2*ones > n:
    # identical arithmetic (ties, i.e. votes == 0, stay bit 0 on
    # both forms — bit-exact with the Column form, test-pinned).
    # The per-bit expressions are built as SQL strings (one py4j
    # round-trip each, and ONE for the whole signature assembly)
    # rather than nested Column objects: driver-side plan
    # construction of ~180 Column expressions cost more wall time
    # (2.8 s) than executing the query (0.5 s).
    lvl1 = tok.groupBy("__key", "__h").agg(F.count(F.lit(1)).alias("__c"))
    # ONE array-of-sums vote aggregate instead of n_bits separate agg
    # columns (r11, same reshape as kmeans_fit): identical integer
    # sums in identical order, but the n_bits-wide flat agg paid ~2x
    # per pass in plan/codegen width.
    votes_arr = "array(" + ", ".join(
        f"sum(__c * (shiftrightunsigned(__h, {i}) & 1))" for i in range(n_bits)
    ) + ") AS __ov"
    votes = lvl1.groupBy("__key").agg(
        F.expr("sum(__c) AS __n"), F.expr(votes_arr)
    )
    # bit weights as SIGNED two's-complement literals: 1 << 63 would
    # overflow the BIGINT cast (the Column form's shiftleft wrapped
    # to negative implicitly)
    sig_sql = " + ".join(
        "(CASE WHEN 2*element_at(__ov, {j}) > __n THEN CAST({v} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)".format(
            j=i + 1, v=(1 << i) if i < 63 else (1 << i) - (1 << 64)
        )
        for i in range(n_bits)
    )
    votes = votes.select("__key", F.expr(sig_sql).alias("__sig"))
    base = df.select(F.col(key_col).alias("__key"))
    # no-token docs (empty, whitespace-only, NULL text) all get 0 —
    # the Column form's exact contract (its per-bit when(null > 0)
    # falls through to 0 for NULL text too)
    return base.join(votes, "__key", "left").select(
        F.col("__key").alias(key_col),
        F.coalesce(F.col("__sig"), F.lit(0).cast("long")).alias(out_col),
    )


def simhash(text, n_bits: int = 64, hash_fn: str = "xxhash64") -> Column:
    """SimHash of whitespace tokens: per-bit majority vote of token
    hashes, pure Column math (aggregate over an n_bits-slot weight
    array). Batch corpora should prefer :func:`simhash_batch` — the
    same signatures at a fraction of the CPU (this form pays ~n_bits
    interpreted lambda evals per token; the batch form runs codegen'd
    sums). With ``hash_fn='md5'`` the token hash is 60-bit (15 hex
    chars fit a BIGINT in both engines) so the signature has an exact
    DuckDB twin; pass n_bits=60 to skip the always-zero high bits."""
    tokens = F.filter(F.split(F.trim(_c(text)), "\\s+"), lambda t: F.length(t) > 0)
    if hash_fn == "xxhash64":
        hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    else:
        hashes = F.transform(tokens, lambda t: _token_hash(t, 60, hash_fn))
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    weights = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bits - 1)),
                lambda i: F.when(
                    F.call_function("shiftrightunsigned", h, i.cast("int")).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)).cast("long"),
            ),
            lambda a, b: a + b,
        ),
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda i: F.when(F.element_at(weights, i.cast("int") + 1) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return F.aggregate(
        F.zip_with(bits, F.sequence(F.lit(0), F.lit(n_bits - 1)), lambda b, i: F.struct(b.alias("b"), i.alias("i"))),
        F.lit(0).cast("long"),
        lambda acc, s: acc.bitwiseOR(
            F.call_function("shiftleft", s["b"].cast("long"), s["i"].cast("int"))
        ),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    n_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates with hamming(simhash) <= max_hamming.

    Scale shape: split the ``n_bits`` signature into ``blocks`` chunks;
    by pigeonhole any pair within hamming distance < blocks shares at
    least one exact chunk -> equi-join on (block_idx, chunk), then
    refine with the true hamming distance (bit_count(xor)). ``blocks``
    is raised automatically to keep that recall guarantee.
    ``hash_fn='md5'`` (with n_bits=60) makes the whole pipeline
    DuckDB-oracle-replayable, like the minhash md5 variant."""
    # raise blocks to the next DIVISOR of n_bits that preserves the
    # pigeonhole guarantee (blocks > max_hamming); doubling alone can
    # land on a non-divisor for n_bits like 60
    while blocks <= max_hamming or n_bits % blocks != 0:
        blocks += 1
        if blocks > n_bits:
            raise ValueError(
                f"no chunk split of {n_bits} bits supports max_hamming={max_hamming}"
            )
    sig = simhash_batch(
        df, text_col=text_col, key_col=key_col, n_bits=n_bits,
        hash_fn=hash_fn, out_col="__sig",
    ).withColumnRenamed(key_col, "__key")
    # materialization barrier (lineage cut, not just an exchange): the
    # self-join's inferred isnotnull(join key) constraint rewrites to
    # isnotnull(<the whole signature expression subtree>) and pushes
    # through any Exchange toward BOTH sides' scans, re-evaluating the
    # signature per row per side (measured 147s for 5k docs at sf0.1
    # with the interpreted Column form; 3s with the cut).
    # localCheckpoint stores 16 bytes/row on executor-local storage,
    # both join sides read the same blocks, and no filter can cross an
    # RDD boundary. Batch-only operator, so eager=False is safe.
    sig = sig.localCheckpoint(eager=False)
    return simhash_pairs_from_sigs(
        sig, sig_col="__sig", key_col="__key",
        max_hamming=max_hamming, blocks=blocks, n_bits=n_bits,
    )


def simhash_pairs_from_sigs(
    sigs: DataFrame,
    sig_col: str = "sig",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    n_bits: int = 64,
) -> DataFrame:
    """:func:`simhash_pairs` from PRECOMPUTED signatures — callers that
    already materialized a signature table (an incremental-dedup store,
    or a gate unioning signatures + pairs) skip the second signature
    pass. ``sigs`` should be cheap to recompute or already a lineage
    cut (see simhash_pairs); the caller owns that contract."""
    while blocks <= max_hamming or n_bits % blocks != 0:
        blocks += 1
        if blocks > n_bits:
            raise ValueError(
                f"no chunk split of {n_bits} bits supports max_hamming={max_hamming}"
            )
    sig = sigs.select(F.col(key_col).alias("__key"), F.col(sig_col).alias("__sig"))
    width = n_bits // blocks
    chunk_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned("__sig", i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk"),
            )
            for i in range(blocks)
        ]
    )
    buckets = sig.select("__key", "__sig", F.explode(chunk_keys).alias("__b"))
    a = buckets.select(F.col("__key").alias("key_a"), F.col("__sig").alias("sig_a"), "__b")
    b = buckets.select(F.col("__key").alias("key_b"), F.col("__sig").alias("sig_b"), "__b")
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, "__b")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["key_a", "key_b"])
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact cosine near-dup pairs (key_a < key_b). Brute-force; use
    similarity.lsh_buckets for candidate generation at scale."""
    _assert_small(df, max_rows, "similarity.lsh_neardup_pairs", "embedding_neardup_pairs")
    from .similarity import cosine_sim

    a = df.select(F.col(key_col).alias("key_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(key_col).alias("key_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    return pairs.select(
        "key_a", "key_b", F.round(cosine_sim("va", "vb"), 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)


def semdedup(
    df: DataFrame,
    centroids,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    max_cluster: Optional[int] = None,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding column by clustering, then pruning
    within-cluster near-duplicates — the embedding analogue of MinHash
    dedup, and the trick that makes cosine dedup tractable: pairs are
    only formed INSIDE a cluster, never across the corpus.

    ``centroids`` is the trained coarse quantizer — an (k, dim)
    array of unit rows from :func:`~..similarity.train_ivf_centroids`
    (deterministic, so the DuckDB oracle replays the whole pipeline
    from the same literals). Assignment is first-wins argmax-dot, the
    same rule as the IVF index, as one JVM expression.

    Keep policy: within a cluster, a row is dropped iff some
    smaller-keyed row in the same cluster has rounded cosine >=
    ``threshold`` with it ("keep earliest"). Chains (a~b, b~c, a!~c)
    drop both b and c — documented greedy behavior, matching the
    reference SemDedup implementation's keep-one-per-pair sweep.

    ``max_cluster`` is the skew guard (same escape hatch as
    ``minhash_lsh_pairs``): clusters larger than the cap skip the
    pair stage entirely (all their rows stay kept) rather than emit a
    B^2/2 pair blow-up. At real scale you instead raise k — SemDedup
    runs with k ~ sqrt(N) clusters so mean cluster size stays O(sqrt N).

    Returns ``(key, cluster, kept)`` ordered semantics-free; one
    cluster-keyed self-join plus key-keyed joins, no all-pairs stage.
    """
    from .similarity import _dots_expr, cosine_pair

    cents = np.asarray(centroids, dtype=np.float64)
    dots = _dots_expr(vec_col, cents)
    assigned = df.select(
        _c(key_col).alias("__key"),
        _c(vec_col).alias("__v"),
        F.expr(f"array_position({dots}, array_max({dots}))").alias("cluster"),
    )
    # lineage cut (same pathology as simhash_pairs): the cluster
    # self-join's inferred isnotnull(cluster) constraint rewrites to
    # isnotnull(<the k x dim argmax-dot expression>) and pushes into
    # BOTH join sides' scans, re-evaluating the assignment per row per
    # side. Checkpoint the (key, vec, cluster) rows once; every
    # downstream consumer (a/b pair sides, the skew-cap join, the
    # final kept left-join) reads the same blocks. Batch-only op.
    assigned = assigned.localCheckpoint(eager=False)
    pairable = assigned
    if max_cluster is not None:
        sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__sz"))
        pairable = assigned.join(
            sizes.where(F.col("__sz") <= max_cluster).select("cluster"), "cluster"
        )
    a = pairable.select(
        "cluster", F.col("__key").alias("__ka"), F.col("__v").alias("__va")
    )
    b = pairable.select(
        "cluster", F.col("__key").alias("__kb"), F.col("__v").alias("__vb")
    )
    losers = (
        a.join(b, "cluster")
        .where(F.col("__ka") < F.col("__kb"))
        .where(F.round(cosine_pair("__va", "__vb"), 6) >= threshold)
        .select(F.col("__kb").alias("__key"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        assigned.join(losers, "__key", "left")
        .select(
            F.col("__key").alias(key_col),
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )
