"""r12 experiment: minhash signature via mapInArrow kernel vs the
expression-forest aggregate (interleaved same-session A/B — the box
steal protocol). Usage:

    python scripts/exp_r12_minhash.py [sf_dir] [rounds]

Verifies output identity at the given SF first (sorted pair sets must
match exactly), then times variants interleaved. Not part of the bench
or the test suite — a measurement harness only.

MEASURED RESULT (r12, quiet window, sf1, min after JIT warm-up round):
  A_expr (shipped form)      6.524 s
  B_kernel (this candidate) 10.984 s   <- 1.7x LOSS, rejected
  C_md5_floor                2.359 s
Stage decomposition (same session): the per-doc hash-ARRAY build the
kernel needs costs 3.246 s on its own — already more than the whole
exploded-md5 floor (2.359 s) — and the banding repartition that keeps
the kernel single-evaluated shuffles full banded rows where the
expression form's groupBy exchange ships one partially-aggregated row
per key. The kernel itself was bit-identical (64-perm mins, Mersenne
fast reduction == `% (2^61-1)`), so the rejection is purely economic.
The kernel lives here (not in dedup.py) for the record.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from duckdb_geography_spark.llm import dedup as D
from duckdb_geography_spark.session import get_spark


def _minhash_sig_kernel(a: np.ndarray, b: np.ndarray):
    """mapInArrow minhash-signature kernel (REJECTED candidate — see
    module docstring). Exact twin of the expression aggregate:
    (a_k*h + b_k) < 2^62 never overflows int64 (31-bit coeffs x 31-bit
    hash), and the Mersenne reduction x -> (x & M) + (x >> 61) with one
    conditional subtract equals x % (2^61-1) for 0 <= x < 2^62."""
    A = np.ascontiguousarray(a, dtype=np.int64)
    B = np.ascontiguousarray(b, dtype=np.int64)
    num_perm = len(A)
    M = D._MERSENNE61

    def _fn(batches):
        import pyarrow as pa

        for batch in batches:
            keys = batch.column(0)
            hs = batch.column(1)
            lens = np.zeros(len(hs), dtype=np.int64)
            valid = ~np.asarray(hs.is_null())
            if valid.any():
                import pyarrow.compute as pc

                lv = pc.list_value_length(hs)
                lens[valid] = np.asarray(lv)[valid]
            keep = lens > 0
            if not keep.any():
                continue
            flat = np.asarray(hs.flatten(), dtype=np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            assert offs[-1] == len(flat), "list offsets out of sync"
            starts = offs[:-1][keep]
            nkept = int(keep.sum())
            sig = np.empty((nkept, num_perm), dtype=np.int64)
            for k in range(num_perm):
                v = flat * A[k] + B[k]
                v = (v & M) + (v >> 61)
                v = np.where(v >= M, v - M, v)
                sig[:, k] = np.minimum.reduceat(v, starts)
            ms = pa.ListArray.from_arrays(
                np.arange(0, (nkept + 1) * num_perm, num_perm, dtype=np.int32),
                pa.array(sig.ravel(), type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [keys.filter(pa.array(keep)), ms], ["__key", "__ms"]
            )

    return _fn

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(cpus="32", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def pairs_kernel(
    df,
    text_col="text",
    key_col="doc_id",
    n=5,
    num_perm=64,
    bands=8,
    seed=42,
    hash_fn="md5",
    max_bucket=500,
):
    """The candidate r12 rewrite, inline: JVM shingle-hash array ->
    one mapInArrow signature kernel -> banding over a single shared
    repartition exchange."""
    rows = num_perm // bands
    a, b = D._perm_coeffs(num_perm, seed)
    hs = df.select(
        F.col(key_col).alias("__key"),
        F.transform(
            D.ngram_set(text_col, n), lambda s: D._token_hash(s, 31, hash_fn)
        ).alias("__hs"),
    )
    ktype = hs.schema["__key"].dataType.simpleString()
    sig = hs.mapInArrow(
        _minhash_sig_kernel(a, b), f"__key {ktype}, __ms array<long>"
    )
    buckets = sig.select(
        "__key",
        F.expr(
            f"explode(transform(sequence(0, {bands - 1}), "
            f"bi -> struct(bi AS band, slice(__ms, bi * {rows} + 1, {rows}) AS h)))"
        ).alias("__bucket"),
    ).repartition("__bucket")
    counts = buckets.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    eligible = counts.where(
        (F.col("__n") >= 2) & (F.col("__n") <= int(max_bucket))
    ).select("__bucket")
    buckets = buckets.join(eligible, "__bucket", "left_semi")
    members = buckets.groupBy("__bucket").agg(
        F.sort_array(F.collect_list("__key")).alias("__ks")
    )
    return (
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
        .where(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# ---- identity check (at sf0.01 scale use full collect; here compare counts + full anti-joins)
A = D.minhash_lsh_pairs(docs, num_perm=64, bands=8, hash_fn="md5", max_bucket=500)
B = pairs_kernel(docs)
ca, cb = A.count(), B.count()
onlyA = A.join(B, ["key_a", "key_b"], "left_anti").count()
onlyB = B.join(A, ["key_a", "key_b"], "left_anti").count()
print(f"# identity: A={ca} B={cb} onlyA={onlyA} onlyB={onlyB}")
assert ca == cb and onlyA == 0 and onlyB == 0, "IDENTITY FAILED"

# ---- also isolate the md5+explode floor (variant C) for attribution
sh = docs.select(
    F.col("doc_id").alias("__key"),
    F.explode(D.ngram_set("text", 5)).alias("__gram"),
).select("__key", D._token_hash("__gram", 31, "md5").alias("__h"))


def t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


variants = {
    "A_expr": lambda: D.minhash_lsh_pairs(
        docs, num_perm=64, bands=8, hash_fn="md5", max_bucket=500
    ).write.format("noop").mode("overwrite").save(),
    "B_kernel": lambda: pairs_kernel(docs)
    .write.format("noop")
    .mode("overwrite")
    .save(),
    "C_md5_floor": lambda: sh.groupBy("__key")
    .agg(F.count(F.lit(1)))
    .write.format("noop")
    .mode("overwrite")
    .save(),
}

results = {k: [] for k in variants}
for r in range(ROUNDS):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"exp_minhash {name} r{r}")
        dt = t(fn)
        results[name].append(round(dt, 3))
        print(f"# round {r} {name}: {dt:.3f}s", flush=True)

print("# RESULTS (discard round 0 — JIT warm):")
for name, ts in results.items():
    steady = ts[1:] or ts
    print(f"#   {name}: {ts} -> min-after-warm {min(steady):.3f}s")
spark.stop()
