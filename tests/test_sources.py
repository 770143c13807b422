"""Sources/sinks: TSV geography ingestion + cell-partitioned parquet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import duckdb_geography_spark.functions as G
from duckdb_geography_spark import sources as S
from duckdb_geography_spark import synth
from duckdb_geography_spark.functions import cells as C


def test_tsv_roundtrip(spark, tmp_path):
    tsv = tmp_path / "cities.tsv"
    tsv.write_text(
        "name\tpopulation\tgeog\n"
        "Vancouver\t603502\tPOINT (-123.12359 49.2753624)\n"
        "Toronto\t3934421\tPOINT (-79.4219667 43.7019257)\n"
    )
    df = S.read_tsv_geography(spark, str(tsv))
    rows = df.select("name", G.s2_format("geog", 6).alias("t")).collect()
    got = {(r.name, r.t) for r in rows}
    assert ("Vancouver", "POINT (-123.12359 49.275362)") in got


def test_partitioned_sink_prunes(spark, tmp_path):
    path = str(tmp_path / "cust_cells")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey",
        C.s2_cellfromlonlat(synth.cust_lon(), synth.cust_lat()).alias("cell"),
    )
    S.write_partitioned_by_cell(cust, path, level=2)
    # directories keyed by token
    parts = [d for d in os.listdir(path) if d.startswith("partition_cell=")]
    assert len(parts) > 4
    token = parts[0].split("=", 1)[1]
    pruned = S.read_cell_partition(spark, path, token)
    n = pruned.count()
    assert 0 < n < cust.count()
    # the filter must be a partition filter (pruned at plan time)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(partition_cell" in plan
    # every row is inside the partition's cell
    back = pruned.withColumn(
        "ok",
        C.s2_cell_contains(C.s2_cell_from_token(F.lit(token)), F.col("cell")),
    )
    assert back.where(~F.col("ok")).count() == 0
