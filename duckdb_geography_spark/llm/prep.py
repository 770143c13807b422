"""Dataset-preparation operators for training-data pipelines:
chunking, deterministic splits, and PII redaction.

All pure Spark Column expressions (JVM codegen, no Python per row) —
at 100 TB these are map-side passes that fuse into the scan stage —
and each has an exact DuckDB twin for the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "chunk_documents",
    "hash_split",
    "redact_pii",
    "decontaminate",
    "hash_sample",
    "stratified_sample",
    "weighted_sample",
    "weighted_sample_per_group",
    "sample_to_token_budget",
    "sample_to_token_budget_global",
    "weighted_mix",
    "dedup_lines",
    "pack_chunks",
    "PII_PATTERNS",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Java-regex metacharacters that need escaping to read a pattern as
#: a literal string (java.util.regex.Pattern.quote semantics, spelled
#: out char-by-char so the result stays inside the RE2-compatible
#: subset the DuckDB oracles replay)
_JAVA_REGEX_META = set("\\.[]{}()*+-?^$|")


def _regex_literal(s: str) -> str:
    """Escape ``s`` so Java regex (and RE2) match it literally."""
    return "".join("\\" + ch if ch in _JAVA_REGEX_META else ch for ch in s)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    chunk_chars: int = 500,
    overlap: int = 50,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the context-window packing step. One generate+explode, no shuffle:
    chunk starts are ``1, 1+stride, ...`` (stride = chunk - overlap),
    every chunk is ``substr(text, start, chunk_chars)``. Empty docs
    produce no chunks. Returns (key, chunk_idx, chunk_text, n_chars).
    """
    assert 0 <= overlap < chunk_chars
    stride = chunk_chars - overlap
    t = _c(text_col)
    # a chunk starting at s contributes new content iff s <= len - overlap
    # (otherwise it is wholly contained in the previous chunk's overlap
    # region); bounding the start sequence there drops the redundant
    # fully-duplicated tail chunk without losing any characters
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(t) - overlap, F.lit(1)), F.lit(stride)
    )
    out = df.select(
        F.col(key_col),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        t.alias("__t"),
    ).select(
        key_col,
        "chunk_idx",
        F.substring(F.col("__t"), F.col("__start"), chunk_chars).alias("chunk_text"),
    )
    return out.where(F.length("chunk_text") > 0).withColumn(
        "n_chars", F.length("chunk_text")
    )


def hash_split(
    text,
    train_pct: int = 90,
    buckets: int = 100,
) -> Column:
    """Deterministic content-hash split label ('train'/'held'):
    bucket = first 8 hex chars of md5(text) as an integer, mod
    ``buckets``. Content-keyed (not row-keyed), so exact duplicates
    always land in the same split — the leakage-safe assignment — and
    the oracle replays it byte-for-byte via DuckDB's md5."""
    threshold = buckets * train_pct // 100
    bucket = F.conv(F.substring(F.md5(_c(text)), 1, 8), 16, 10).cast("long") % buckets
    return F.when(bucket < threshold, F.lit("train")).otherwise(F.lit("held"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation/benchmark set (the standard
    n-gram-overlap test-set-leakage check, as run for GPT-3/PaLM/Llama
    training corpora — 8- to 13-gram word overlap).

    Returns ``docs`` plus a boolean ``contaminated`` column. Shape:
    both sides shingle into word n-grams (pure Column explode), the
    benchmark side is distinct-ed (eval suites are tiny relative to
    the corpus — the distinct gram set broadcasts; AQE picks that up
    from its size, no hint needed), and the hit set is a gram-keyed
    equi-join -> distinct doc keys -> left join back. No all-pairs
    stage; the corpus side is one explode + one semi-join-shaped
    probe, exactly the shape this runs at 100 TB.
    """
    from .repetition import word_ngrams

    bench_grams = (
        benchmark.select(F.explode(word_ngrams(bench_text_col, n)).alias("__g"))
        .distinct()
    )
    doc_grams = docs.select(
        _c(key_col).alias("__key"), F.explode(word_ngrams(text_col, n)).alias("__g")
    )
    hit_keys = (
        doc_grams.join(bench_grams, "__g")
        .select("__key")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        docs.join(hit_keys, docs[key_col] == hit_keys["__key"], "left")
        .drop("__key")
        .withColumn("contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


#: (pattern, replacement) applied in order; conservative patterns that
#: parse identically under Java regex (Spark) and RE2 (DuckDB)
PII_PATTERNS = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("https?://[^ \\t\\n]+", "<URL>"),
    ("[0-9][0-9][0-9][-. ][0-9][0-9][0-9][-. ][0-9][0-9][0-9][0-9]", "<PHONE>"),
]


def redact_pii(text) -> Column:
    """Rule-based PII scrub (emails, URLs, phone-shaped numbers) as a
    chain of regexp_replace — a map-side cleaning pass. The pattern
    list is deliberately restricted to syntax with identical semantics
    in Java regex and RE2 so the oracle replays it exactly."""
    out = _c(text)
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def hash_sample(
    text,
    rate_pct: int = 10,
    buckets: int = 100,
    salt: str = "",
) -> Column:
    """Deterministic content-keyed Bernoulli sample predicate: keep a
    row iff its md5 bucket falls under ``rate_pct``. Content-keyed
    like :func:`hash_split` (duplicates sample together — no leakage
    between a kept copy and a dropped copy), reproducible across runs
    and engines, ``salt`` decorrelates independent samples. Pure
    Column — fuses into the scan."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), _c(text))), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    return bucket < (buckets * rate_pct // 100)


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 10,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Fixed-size deterministic sample per stratum (the balanced
    per-language/per-source draw every corpus mix step runs): rank rows
    inside each stratum by the md5 of their key (+ ``salt``) and keep
    the first ``n_per_stratum``. md5 ordering is uniform,
    engine-portable (the DuckDB oracle replays it verbatim), and
    reproducible at any parallelism — unlike ``rand()``-based sampling,
    rerunning the job keeps the SAME rows, so downstream caches and
    eval sets stay stable. ONE hash shuffle on the stratum key; rank is
    partition-local.

    The stability guarantee requires UNIQUE keys: rows sharing a key
    are indistinguishable to the sort, so WHICH duplicate survives a
    cutoff that splits them is partition-layout-dependent. NULL keys
    hash as a fixed sentinel (they don't monopolize the top ranks the
    way a raw NULL-first sort would) but are likewise mutually
    indistinguishable."""
    from pyspark.sql.window import Window

    key_str = F.coalesce(_c(key_col).cast("string"), F.lit("\x00<null-key>"))
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat(F.lit(salt), key_str)), _c(key_col).asc_nulls_last()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(n_per_stratum))
        .drop("__rk")
    )


def sample_to_token_budget(
    df: DataFrame,
    token_col,
    budget_tokens: int,
    strata_col,
    weight_col=None,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Fill each stratum (domain, language, source) with a random
    document sample up to a TOKEN budget — the corpus-mixing
    primitive when the recipe says "20B tokens of web, 5B of code"
    rather than a document count.

    Per stratum, rows are ranked by the same exact-integer
    Efraimidis-Spirakis priority as :func:`weighted_sample`
    (``weight_col=None`` draws uniformly; a positive-integer weight
    biases selection, e.g. a quality score), and a row is kept while
    the tokens accumulated BEFORE it are still under the budget — so
    the budget is always reached (the crossing document is included,
    overshooting by at most one document) unless the stratum runs
    out. Deterministic, salt-decorrelated, replayable in any SQL
    engine as ``SUM(tokens) OVER (PARTITION BY stratum ORDER BY
    priority DESC, key ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING) < budget``.

    Scale shape: ONE shuffle on the stratum key; each stratum sorts
    within its hash partition (strata are bounded in practice —
    domains/languages — which is what keeps the running sum
    scale-safe; an unbounded single stratum would serialize into one
    task, so split giant strata first). Token counts must be
    POSITIVE — a NULL/non-positive count fails loudly rather than
    silently stretching the budget.

    Returns the sampled rows plus ``__priority`` and
    ``tokens_before`` (the running total excluding the row).
    """
    from pyspark.sql import Window

    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    t = _c(token_col).cast("long")
    tok = F.when(
        t.isNull() | (t <= 0),
        F.raise_error(
            F.concat(
                F.lit("sample_to_token_budget: non-positive token count for key "),
                _c(key_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(t)
    wcol = weight_col if weight_col is not None else F.lit(1)
    out = df.withColumn("__priority", _es_priority(wcol, key_col, salt))
    w = (
        Window.partitionBy(_c(strata_col))
        .orderBy(F.desc("__priority"), _c(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "tokens_before", F.coalesce(F.sum(tok).over(w), F.lit(0).cast("long"))
    )
    return out.where(F.col("tokens_before") < int(budget_tokens))


def sample_to_token_budget_global(
    df: DataFrame,
    token_col,
    budget_tokens: int,
    weight_col=None,
    key_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 65536,
) -> DataFrame:
    """GLOBAL fill-to-token-budget sampling WITHOUT a global sort —
    the scale shape of :func:`sample_to_token_budget` when the budget
    spans the whole corpus rather than per-stratum quotas.

    A naive implementation sorts every row by priority (one task at
    the end of a range shuffle — dead at 100 TB). Instead:

    1. histogram pass: rows map to ``n_buckets`` priority buckets
       (monotone in priority), and a map-side-combinable sum gives
       per-bucket token totals — the driver sees at most
       ``n_buckets`` tiny rows;
    2. the driver walks buckets in priority order to find the
       CROSSING bucket ``c*`` (the first whose cumulative total
       reaches the budget) and the exact token count consumed before
       it;
    3. final plan: buckets before ``c*`` are kept whole (a map-side
       filter), buckets after are dropped, and ONLY the boundary
       bucket's rows — a ``~corpus/n_buckets`` sliver — run the
       exact Efraimidis-Spirakis running-sum window.

    The selection is IDENTICAL to the full-sort semantics (buckets
    are monotone in priority and equal priorities share a bucket, so
    the bucket walk and the within-bucket window compose to the
    global order) — the DuckDB oracle replays it with a plain global
    running sum. Two bounded shuffles + one sliver-sized window; the
    histogram action runs eagerly at call time.

    Weight-domain contract: weights participate as ``cast("long")``
    — positive integers. Fractional weights below 1 truncate to 0 and
    fail loudly (the raise_error guard); floats >= 1 participate as
    their integer floor. Priorities for long weights >= 1 stay inside
    [-ln(2^60), 0] ~ [-41.6, 0], so the [-43, 0] bucket band always
    covers them; extreme weights can still CONCENTRATE priorities
    (e.g. all-huge weights -> every priority ~0 -> one bucket, whose
    boundary window then spans the corpus) — selection stays exact
    (the clamp and the bucket map are monotone; adversarial cases
    pinned in tests/test_llm.py::test_token_budget_global_weight_extremes),
    only the sliver-size guarantee degrades. If weights are known to
    be degenerate-uniform, prefer plain :func:`sample_to_token_budget`
    with a constant stratum.

    Returns the sampled rows (``__priority`` retained,
    ``tokens_before`` only exact within the boundary bucket — pass
    through :func:`sample_to_token_budget` with a constant stratum if
    exact global running totals matter more than scale).
    """
    from pyspark.sql import Window

    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    if n_buckets < 16:
        raise ValueError("n_buckets must be >= 16")
    t = _c(token_col).cast("long")
    tok = F.when(
        t.isNull() | (t <= 0),
        F.raise_error(
            F.concat(
                F.lit("sample_to_token_budget_global: non-positive token count for key "),
                _c(key_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(t)
    wcol = weight_col if weight_col is not None else F.lit(1)
    # priority is in [-43, 0] for integer weights >= 1 (ln(2^60) nats
    # over the smallest weight); bucket 0 = highest priority
    scale = float(n_buckets) / 43.0
    pr = df.withColumn("__priority", _es_priority(wcol, key_col, salt))
    pr = pr.withColumn(
        "__b",
        F.least(
            F.lit(int(n_buckets) - 1),
            F.floor(-F.col("__priority") * F.lit(scale)).cast("long"),
        ),
    ).withColumn("__tok", tok)
    hist = {
        r["__b"]: r["s"]
        for r in pr.groupBy("__b").agg(F.sum("__tok").alias("s")).collect()
    }
    cum = 0
    crossing = None
    for b in sorted(hist):
        if cum + hist[b] >= budget_tokens:
            crossing = b
            break
        cum += hist[b]
    if crossing is None:
        return pr.drop("__b", "__tok")  # corpus smaller than the budget
    whole = pr.where(F.col("__b") < int(crossing))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.desc("__priority"), _c(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        pr.where(F.col("__b") == int(crossing))
        .withColumn(
            "__before",
            F.lit(int(cum)) + F.coalesce(F.sum("__tok").over(w), F.lit(0).cast("long")),
        )
        .where(F.col("__before") < int(budget_tokens))
        .drop("__before")
    )
    return whole.unionByName(boundary).drop("__b", "__tok")


def weighted_mix(
    df: DataFrame,
    weights: dict,
    source_col: str = "source",
    key_col: str = "doc_id",
    buckets: int = 10000,
    salt: str = "",
) -> DataFrame:
    """Weighted corpus mixing: keep each source at its configured
    sampling rate (``weights``: source -> fraction in [0, 1]; sources
    absent from the dict drop entirely) — the dataset-mix step that
    turns raw corpora into a training distribution. Deterministic and
    key-coupled like :func:`hash_sample` (the same document keeps the
    same fate across reruns; ``salt`` draws an independent mix), and a
    pure Column filter — it fuses into the scan, so an upsampled
    pipeline reads only what it keeps."""
    if not weights:
        return df.where(F.lit(False))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), _c(key_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    keep = F.lit(False)
    for src, frac in sorted(weights.items()):
        thresh = int(round(float(frac) * buckets))
        keep = keep | ((_c(source_col) == src) & (bucket < thresh))
    return df.where(keep)


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_df: int = 1,
    min_line_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style line-level dedup: drop every line whose document
    frequency exceeds ``max_df`` (navigation chrome, cookie banners,
    'subscribe' calls — the boilerplate that survives document-level
    dedup because each PAGE is unique), then reassemble each document
    with its remaining lines in original order. Lines shorter than
    ``min_line_chars`` are exempt (blank separators carry structure,
    not boilerplate). Returns ``(key, <text>_clean, n_lines_kept)``;
    a document whose every line was dropped survives with ''.
    ``sep`` is a LITERAL string (escaped before the regex split, so
    ``'.'`` or ``'|'`` split on those characters, matching the DuckDB
    oracle's literal ``string_split``), and is also the join string
    on reassembly.

    100 TB shape: one explode, one line-keyed count-distinct (hash
    shuffle on the line — uniform unless the corpus is one page), a
    LEFT ANTI join against the frequent-line set (small by
    construction: only lines with df > max_df — AQE broadcasts it),
    and one key-keyed reassembly groupBy. Order restoration is an
    in-aggregate ``array_sort`` over (pos, line) structs — no window,
    no second sort shuffle."""
    lines = df.select(
        _c(key_col).alias("__key"),
        F.posexplode(F.split(_c(text_col), _regex_literal(sep))).alias(
            "__pos", "__line"
        ),
    )
    frequent = (
        lines.where(F.length("__line") >= min_line_chars)
        .groupBy("__line")
        .agg(F.count_distinct("__key").alias("__df"))
        .where(F.col("__df") > int(max_df))
        .select("__line")
    )
    kept = lines.join(frequent, "__line", "left_anti")
    re = kept.groupBy("__key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("__clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        df.select(_c(key_col).alias("__key"))
        .join(re, "__key", "left")
        .select(
            F.col("__key").alias(key_col),
            F.coalesce("__clean", F.lit("")).alias(f"{text_col}_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    max_units: int,
    unit_col: str = "n_chars",
    key_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    buckets: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sequence packing: assemble chunks into fixed-capacity training
    windows (packs), the GPT-style concat-and-slice step at the chunk
    granularity. Deterministic and SQL-replayable: chunks are ordered
    by (key, idx) within a content-hash bucket and assigned
    ``pack_id = floor(running_sum_before / max_units)`` — pack
    boundaries fall where the cumulative unit count crosses a
    multiple of the capacity, so a pack can overflow by at most one
    chunk (the standard cumsum approximation; exact first-fit needs a
    sequential scan and buys <1 chunk of slack).

    100 TB shape: packing is inherently order-sequential, so the
    corpus is sharded into ``buckets`` independent streams by document
    hash (one window partition each — parallelism = buckets, state =
    one running sum per bucket); each pack lives inside one bucket.
    Returns the input plus (pack_bucket, pack_id, pack_pos).

    ``hash_fn``: 'xxhash64' (fast JVM intrinsic, default) or 'md5'
    (a few times slower, exactly replayable by the DuckDB oracle —
    same trade as the dedup signature hashes)."""
    from pyspark.sql.window import Window

    if hash_fn == "xxhash64":
        b = F.pmod(F.xxhash64(_c(key_col)), F.lit(buckets))
    elif hash_fn == "md5":
        b = (
            F.conv(
                F.substring(F.md5(_c(key_col).cast("string")), 1, 8), 16, 10
            ).cast("long")
            % buckets
        )
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    w = Window.partitionBy("pack_bucket").orderBy(
        F.col(key_col).asc(), F.col(idx_col).asc()
    )
    out = chunks.withColumn("pack_bucket", b)
    run_before = F.coalesce(
        F.sum(_c(unit_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    out = out.withColumn("pack_id", F.floor(run_before / max_units))
    pos_w = Window.partitionBy("pack_bucket", "pack_id").orderBy(
        F.col(key_col).asc(), F.col(idx_col).asc()
    )
    return out.withColumn("pack_pos", F.row_number().over(pos_w) - 1)


def weighted_sample(
    df: DataFrame,
    weight_col,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006): each row draws a priority
    ``u^(1/w)`` for a uniform ``u``; the top-``k`` priorities are an
    exact weighted sample. Corpus use: quota-sample documents in
    proportion to a quality/importance score without a full shuffle —
    the selection is one map-side priority column + a
    TakeOrderedAndProject top-k.

    Determinism / cross-engine exactness: ``u`` is the md5 60-bit key
    hash scaled to (0,1]; ranking by ``u^(1/w)`` equals ranking by
    ``ln(u)/w``, and ``ln(u) = ln(h) - 60 ln 2`` routes through
    integer-argument micronat logs... except ``ln(h)`` over a 60-bit
    h exceeds the pytest-asserted parity domain, so instead we use
    the exact integer pair: priority = (ln_micro(h) - C) / w as ONE
    IEEE double division of exact integers (h <= 2^60 keeps
    round(ln(h)*1e6) ~ 41.6e6, far inside 2^53). Ties (identical
    hash AND weight) break on the key. Weights must be POSITIVE
    integers (e.g. token counts, clipped quality scores scaled to
    ints) so every intermediate stays exact.

    Returns the sampled rows with their ``__priority`` (drop it if
    unwanted); higher priority = kept first.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out = df.withColumn("__priority", _es_priority(weight_col, key_col, salt))
    return out.orderBy(F.desc("__priority"), _c(key_col)).limit(k)


def _es_priority(weight_col, key_col, salt: str = "") -> Column:
    """The Efraimidis-Spirakis priority column shared by
    :func:`weighted_sample` and :func:`weighted_sample_per_group`:
    ``(ln_micro(md5_60bit(salt||key)) - ln_micro(2^60)) / w`` as one
    IEEE division of exact integers, rounded to 9 dp."""
    import math

    w = _c(weight_col).cast("long")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), _c(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # ln in micronats of the integer hash (h >= 1: conv of md5 prefix
    # is 0 only with probability 16^-15; map 0 -> 1 to stay in-domain)
    h_safe = F.greatest(h, F.lit(1).cast("long"))
    ln_h = F.round(F.log(h_safe.cast("double")) * 1_000_000).cast("long")
    ln_max = int(round(math.log(float(1 << 60)) * 1_000_000))
    # ln(u)/w <= 0; larger (closer to 0) wins. Loud contract: a NULL
    # or non-positive weight fails the job instead of silently skewing
    # the sample (the raise_error guard pattern temporal.py uses).
    prio = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit("weighted_sample: non-positive weight for key "),
                _c(key_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise((ln_h - F.lit(ln_max)).cast("double") / w)
    return F.round(prio, 9)


def weighted_sample_per_group(
    df: DataFrame,
    weight_col,
    strata_col,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted quota sampling: an independent Efraimidis-Spirakis
    draw of ``n_per_stratum`` rows inside EVERY stratum (language,
    source, topic bucket) — the corpus-mixing primitive when quotas
    are per-slice but importance weights are per-document. ONE
    shuffle on the stratum key (the window's hash partitioning);
    strata smaller than the quota keep everything they have.

    Same exact-integer priority as :func:`weighted_sample`, so the
    draw is deterministic, salt-decorrelated, and replayable in any
    SQL engine as ``row_number() OVER (PARTITION BY stratum ORDER BY
    priority DESC, key) <= n``."""
    from pyspark.sql import Window

    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    out = df.withColumn("__priority", _es_priority(weight_col, key_col, salt))
    w = Window.partitionBy(_c(strata_col)).orderBy(
        F.desc("__priority"), _c(key_col)
    )
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(n_per_stratum))
        .drop("__rk")
    )
