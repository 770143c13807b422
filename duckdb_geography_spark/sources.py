"""Sources & sinks (SURVEY.md S2.1 patterns).

- TSV ingestion with WKT columns (the reference's data.test pattern:
  ``SELECT ..., geog::GEOGRAPHY FROM 'file.tsv'``);
- cell-token partitioned parquet sink + partition-pruned reads (the
  reference's documented COPY ... PARTITION_BY partition_cell recipe,
  docs/function-reference.md:748-768) — on Spark the token partition
  column is pruned natively by Catalyst, which is the 100 TB read
  path: a spatial filter touches only the matching directories.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import cells as C
from .functions.io import s2_geogfromtext

__all__ = [
    "read_tsv_geography",
    "write_partitioned_by_cell",
    "read_cell_partition",
    "partition_token",
    "write_ivf_partitioned",
    "ivf_topk_pruned",
]


def read_tsv_geography(
    spark: SparkSession, path: str, wkt_col: str = "geog", validate: bool = True
) -> DataFrame:
    """Tab-separated file with a WKT column -> DataFrame with the
    column parsed to GEOGRAPHY (reference: test/sql/geography/
    data.test:19-44 loads data/cities.tsv this way)."""
    from .functions.io import s2_geogfromtext_novalidate

    df = spark.read.csv(path, sep="\t", header=True, inferSchema=True)
    parse = s2_geogfromtext if validate else s2_geogfromtext_novalidate
    return df.withColumn(wkt_col, parse(F.col(wkt_col)))


def partition_token(cell_col, level: int = 4):
    """Cell-token partition key: token of the cell's level-``level``
    ancestor — short, prefix-ordered, filesystem-safe."""
    return C.s2_cell_token(C.s2_cell_parent(cell_col, level))


def write_partitioned_by_cell(
    df: DataFrame,
    path: str,
    cell_col: str = "cell",
    level: int = 4,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink keyed by coarse cell token.

    At scale this gives: (1) partition pruning for spatial filters,
    (2) co-located cell-range joins when both sides share the scheme,
    (3) bounded file counts (4^level directories max)."""
    out = df.withColumn("partition_cell", partition_token(F.col(cell_col), level))
    out.write.partitionBy("partition_cell").mode(mode).parquet(path)


def read_cell_partition(
    spark: SparkSession, path: str, cell_token: Optional[str] = None
) -> DataFrame:
    """Read a cell-partitioned dataset; with ``cell_token`` the filter
    is a partition-column predicate Catalyst prunes at planning time
    (verify with .explain: PartitionFilters, not PushedFilters)."""
    df = spark.read.parquet(path)
    if cell_token is not None:
        df = df.where(F.col("partition_cell") == cell_token)
    return df


#: sidecar dataset name; the leading underscore hides it from Spark's
#: data-file discovery when the layout root itself is read as parquet
CENTROIDS_DIR = "_ivf_centroids"


def _persist_centroids(
    spark: SparkSession, path: str, cents, n_centroids: int, seed: int, trained: bool
):
    """Persist the quantizer THROUGH Spark (JSON dataset), so the
    sidecar lands on the same filesystem as the layout — local paths,
    HDFS, s3a://, anything with a Hadoop connector. A driver-local
    open() here would silently strand the centroids on the driver for
    remote layouts and later readers would fall back to the wrong
    quantizer."""
    rows = [
        (int(j), [float(x) for x in row], int(n_centroids), int(seed), bool(trained))
        for j, row in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "j int, v array<double>, n_centroids int, seed int, trained boolean"
    )
    df.coalesce(1).write.mode("overwrite").json(f"{path}/{CENTROIDS_DIR}")


def load_ivf_centroids(spark: SparkSession, path: str):
    """Centroids persisted beside an IVF layout, or None for layouts
    written before training existed (callers fall back to the seeded
    quantizer with the recorded seed)."""
    import numpy as np

    try:
        rows = spark.read.json(f"{path}/{CENTROIDS_DIR}").collect()
    except Exception as ex:
        # ONLY a missing sidecar (pre-training layout) may fall back to
        # the seeded quantizer. Any other failure (credentials, network,
        # corrupt sidecar) must propagate: silently probing with the
        # wrong quantizer returns low-recall results with no error.
        from pyspark.errors import AnalysisException

        if isinstance(ex, AnalysisException) and (
            "PATH_NOT_FOUND" in str(ex) or "Path does not exist" in str(ex)
        ):
            return None
        raise
    if not rows:
        return None
    rows = sorted(rows, key=lambda r: int(r.j))
    return np.asarray([[float(x) for x in r.v] for r in rows], dtype=np.float64)


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    seed: int = 11,
    mode: str = "overwrite",
    train: bool = True,
    sample_size: int = 256,
    key_col: str = "vec_id",
) -> None:
    """ANN ingest: assign every vector to its IVF centroid cell
    (Arrow-batched argmax kernel — one map-side pass, no shuffle) and
    write parquet partitioned by the cell id. This is the IVF index
    as a DIRECTORY LAYOUT: a top-k query then reads only its n_probe
    cells via Catalyst partition pruning — 1/(n_centroids/n_probe) of
    the bytes at any scale, before a single row is decoded.

    ``train=True`` (default) runs deterministic spherical k-means on a
    bounded driver-side sample (the ``sample_size`` smallest keys) so
    cells follow the data distribution instead of random directions;
    the centroids are persisted next to the layout (the
    ``_ivf_centroids`` sidecar dataset) and re-loaded by
    ``ivf_topk_pruned`` —
    a query with mismatched centroids would probe wrong-but-existing
    partitions."""
    from .llm.similarity import (
        ivf_assign_udf,
        ivf_training_sample,
        train_ivf_centroids,
    )

    cents = None
    if train:
        sample = ivf_training_sample(df, vec_col, key_col, sample_size)
        cents = train_ivf_centroids(sample, n_centroids, seed)
    out = df.withColumn(
        "ivf_cell", ivf_assign_udf(dim, n_centroids, seed, cents)(F.col(vec_col))
    )
    out.write.partitionBy("ivf_cell").mode(mode).parquet(path)
    if cents is None:
        from .llm.similarity import _ivf_centroids

        cents = _ivf_centroids(dim, n_centroids, seed)
    _persist_centroids(df.sparkSession, path, cents, n_centroids, seed, trained=train)


def ivf_topk_pruned(
    spark: SparkSession,
    path: str,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Top-k over an IVF-partitioned dataset: the probe-cell filter is
    a partition-column predicate (PartitionFilters in the scan — whole
    directories skipped at planning time), then the Arrow-batched
    exact cosine ranks only the probed fraction. Identical results to
    ``llm.similarity.ivf_topk`` on the raw table (probe selection is
    the shared ``probe_cells`` helper, so the two paths cannot
    diverge). The quantizer is loaded from the layout's persisted
    ``_ivf_centroids`` sidecar (written by ``write_ivf_partitioned``), so
    trained layouts probe with their trained centroids; layouts from
    before training existed fall back to the seeded quantizer — the
    ``n_centroids`` / ``seed`` args must then match the write call."""
    from .llm.similarity import cosine_topk, probe_cells

    cents = load_ivf_centroids(spark, path)
    probe = probe_cells(query_vec, n_centroids, n_probe, seed, cents)
    df = spark.read.parquet(path).where(F.col("ivf_cell").isin(probe))
    return cosine_topk(df, query_vec, k, vec_col, key_col)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list,
    n_buckets: int = 32,
    sort_cols: Optional[list] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: ``bucketBy`` pre-shuffles the data
    ONCE at write time so every later equi-join or aggregation on the
    bucket key runs with NO exchange (SortMergeJoin picks up the
    bucketing from the table metadata). This is the 100 TB recipe for
    a fact table that is joined on the same key every day — pay the
    shuffle once at ingest, never again. ``sort_cols`` additionally
    pre-sorts within buckets so the merge join skips its sort too."""
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucketing metadata applies automatically
    to joins/aggs on the bucket key)."""
    return spark.table(table)


def quantize_dim(col, lo: float, hi: float, bits: int = 16):
    """Quantize a numeric column to an unsigned ``bits``-bit bin index
    over [lo, hi] (clamped). Pure Column arithmetic — the standard
    prelude to :func:`zorder_value` for continuous dimensions."""
    n = (1 << bits) - 1
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.floor((c.cast("double") - lo) / (hi - lo) * (1 << bits))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n)).cast("long")


def zorder_value(cols, bits: int = 16):
    """Morton/Z-order interleave of the low ``bits`` bits of N
    non-negative integer columns into one long — pure JVM-side bit
    math (no UDF, stays inside whole-stage codegen).

    This is the data-layout primitive behind multi-dimensional data
    skipping (the technique Delta Lake's OPTIMIZE ZORDER BY and
    DuckDB's spatial sort use): rows close in z-value are close in
    EVERY interleaved dimension, so sorting a table by z-value makes
    parquet row-group min/max stats tight on ALL of the dimensions at
    once — a filter on any one of them prunes row groups at scan time
    without touching row data. At 100 TB this is the difference
    between scanning one machine's worth of files and the whole lake.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs >= 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*ncols must be <= 62 (got {bits * n})")
    one = F.lit(1).cast("long")
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(cols):
            c = F.col(col) if isinstance(col, str) else col
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(one)
            acc = acc + F.shiftleft(bit, b * n + i)
    return acc


def zorder_sql(exprs, bits: int = 16) -> str:
    """The exact SQL text of :func:`zorder_value` over SQL
    sub-expressions — same term order, integer adds (order-exact in
    any engine). Usable as a DuckDB oracle or in raw Spark SQL."""
    n = len(exprs)
    terms = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            terms.append(f"((({e} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcols,
    bits: int = 16,
    num_files: int = 8,
    mode: str = "overwrite",
    z_col: str = "__z",
) -> None:
    """Z-order-clustered parquet sink: ONE range shuffle on the
    z-value, sort within partitions, write. Every interleaved
    dimension then has tight per-row-group min/max stats, so scans
    filtered on any of them skip data. ``num_files`` bounds the
    output file count (range partitioner keeps files balanced even
    under z-value skew)."""
    out = df.withColumn(z_col, zorder_value(zcols, bits))
    out = out.repartitionByRange(num_files, F.col(z_col)).sortWithinPartitions(z_col)
    # Drop the internal z column AFTER the range shuffle + sort (row
    # order within partitions is preserved by the projection) so the
    # written schema equals the input schema (ADVICE r5).
    out = out.drop(z_col)
    out.write.mode(mode).parquet(path)


__all__ += ["quantize_dim", "zorder_value", "zorder_sql", "write_zordered"]
