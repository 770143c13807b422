"""End-to-end corpus curation: the composition a real training-data
pipeline runs before tokenization, as ONE operator —

    exact dedup -> MinHash near-dup removal (greedy drop-larger-key)
    -> C4/Gopher quality filter -> PII redaction

Every stage is an already-oracle-gated operator from this package;
the composition exists so a user gets the staging ORDER right (dedup
before quality filters — near-dups vote as one; redaction last — it
must not perturb the dedup hashes) and so the whole chain carries a
single replayable oracle (`corpus_curation` gate).

100 TB shape: exact dedup is one 32-byte-key shuffle; the near-dup
stage is the skew-guarded banded LSH equi-join (never all-pairs);
the quality filter is a pure-Column predicate that pushes into the
scan; redaction is a map-side regex chain. No stage adds a shuffle
beyond what its standalone operator already pays.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup, minhash_dedup
from .prep import redact_pii
from .textstats import quality_filter

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.7,
    n: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket: Optional[int] = 500,
    quality_kwargs: Optional[dict] = None,
) -> DataFrame:
    """Curated corpus: rows of ``df`` that survive exact dedup,
    MinHash near-dup removal (:func:`~duckdb_geography_spark.llm.dedup.
    minhash_dedup`: LSH candidates refined by exact n-gram Jaccard >=
    ``threshold``, greedy keep-smaller-key), and the C4/Gopher
    :func:`~duckdb_geography_spark.llm.textstats.quality_filter`
    — with ``<text_col>_clean`` added as the PII-redacted text.

    ``bands`` defaults to 16 (4 rows/band): at the default
    ``threshold=0.7`` that puts LSH recall near 1.0 for true
    near-dups; 8 bands of 8 rows would recall only ~38% of pairs at
    J=0.7 (the banding S-curve).

    ``hash_fn='md5'`` makes the whole chain exactly replayable by the
    DuckDB oracle (the ``corpus_curation`` driver gate).
    """
    d1 = exact_dedup(df, text_col, key_col)
    d2 = minhash_dedup(
        d1,
        text_col,
        key_col,
        n=n,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        seed=seed,
        max_bucket=max_bucket,
        hash_fn=hash_fn,
    )
    d3 = d2.where(quality_filter(text_col, **(quality_kwargs or {})))
    return d3.withColumn(f"{text_col}_clean", redact_pii(text_col))
