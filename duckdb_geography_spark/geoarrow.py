"""GeoArrow interop (reference: src/s2_geoarrow.cpp).

The reference tags Arrow WKB columns with the ``geoarrow.wkb``
extension (spherical edges, OGC:CRS84) on export and accepts them on
import. Spark-side equivalents:

- :func:`to_geoarrow_table` — DataFrame (geography binary col) ->
  pyarrow Table whose column carries geoarrow.wkb field metadata;
- :func:`from_geoarrow_table` — pyarrow Table with a geoarrow.wkb
  column -> DataFrame with our GEOGRAPHY encoding;
- :func:`write_geoparquet` / :func:`read_geoparquet` — the same
  through parquet files (metadata preserved).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.io import s2_aswkb, s2_geogfromwkb

__all__ = [
    "s2_register_geoarrow_extensions",
    "to_geoarrow_table",
    "from_geoarrow_table",
    "write_geoparquet",
    "read_geoparquet",
    "write_geoparquet_dir",
    "read_geoparquet_dir",
    "GEOARROW_META",
]

#: Arrow extension metadata the reference emits
#: (src/s2_geoarrow.cpp:48-84: spherical edges, OGC:CRS84)
GEOARROW_META = {
    "ARROW:extension:name": "geoarrow.wkb",
    "ARROW:extension:metadata": json.dumps({"edges": "spherical", "crs": "OGC:CRS84"}),
}


class GeoArrowWkbType(pa.ExtensionType):
    """A live ``geoarrow.wkb`` pyarrow ExtensionType (reference
    src/s2_geoarrow.cpp:18-93 registers the equivalent callbacks with
    DuckDB's Arrow runtime). Storage is plain binary WKB; the
    serialized metadata carries the edge model + CRS. Registered by
    :func:`s2_register_geoarrow_extensions`, after which tables from
    other geoarrow-aware libraries round-trip through
    ``__arrow_ext_deserialize__`` with their edge model intact."""

    def __init__(self, edges: str = "spherical", crs: str = "OGC:CRS84"):
        self._ext_meta = {"edges": edges, "crs": crs}
        super().__init__(pa.binary(), "geoarrow.wkb")

    @property
    def edges(self) -> str:
        return self._ext_meta.get("edges", "planar")

    @property
    def crs(self):
        return self._ext_meta.get("crs")

    def __arrow_ext_serialize__(self) -> bytes:
        return json.dumps(self._ext_meta).encode()

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        meta = json.loads(serialized.decode() or "{}") if serialized else {}
        # geoarrow's default for an omitted "edges" key is PLANAR
        return cls(edges=meta.get("edges", "planar"), crs=meta.get("crs"))


def s2_register_geoarrow_extensions() -> bool:
    """Reference parity: SELECT * FROM s2_register_geoarrow_extensions()
    returns true (test/sql/geography/geoarrow.test:6-9). Registers
    :class:`GeoArrowWkbType` with pyarrow's extension registry
    (idempotent — an already-registered name, e.g. by
    ``geoarrow-pyarrow``, is left in place) so IPC/pandas round-trips
    reconstruct typed arrays. Field-metadata tagging keeps working
    regardless, so this returns True even when registration is
    unavailable."""
    try:
        pa.register_extension_type(GeoArrowWkbType())
    except pa.ArrowKeyError:
        pass  # already registered (ours or another geoarrow library's)
    except Exception:
        pass  # metadata tagging still interops
    return True


def _tag_schema(schema: pa.Schema, geog_col: str) -> pa.Schema:
    idx = schema.get_field_index(geog_col)
    field = schema.field(idx).with_metadata(
        {k.encode(): v.encode() for k, v in GEOARROW_META.items()}
    )
    return schema.set(idx, field)


def to_geoarrow_table(
    df: DataFrame,
    geog_col: str = "geog",
    extension: bool = False,
    max_rows: int = 1_000_000,
) -> pa.Table:
    """Export: geography -> WKB column tagged geoarrow.wkb.

    DRIVER-SIDE interop helper: collects the whole DataFrame, so it is
    bounded by driver memory — use it for dimension tables and query
    results, and :func:`write_geoparquet_dir` for anything large.
    ``max_rows`` (default 1M) is the guard rail: the export errors
    with a bounded ``limit(max_rows+1).count()`` probe instead of
    OOMing the driver on an accidental 100 TB collect; pass
    ``max_rows=None`` to opt out explicitly.
    ``extension=True`` returns the column as a LIVE
    :class:`GeoArrowWkbType` ExtensionArray (call
    :func:`s2_register_geoarrow_extensions` first so IPC round-trips
    re-materialize the type); the default stays field-metadata tagged,
    which every geoarrow reader — including parquet footers — already
    understands."""
    wkb_df = df.withColumn(geog_col, s2_aswkb(geog_col))
    if max_rows is not None:
        # single pass: collect at most max_rows+1 rows (driver memory
        # still bounded) instead of a separate count job that would
        # execute the upstream plan twice
        pdf = wkb_df.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"to_geoarrow_table collects to the driver and the input "
                f"has > max_rows={max_rows} rows; use write_geoparquet_dir "
                "for distributed export, or pass max_rows=None to force"
            )
    else:
        pdf = wkb_df.toPandas()
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    if extension:
        idx = tbl.schema.get_field_index(geog_col)
        storage = tbl.column(idx).combine_chunks().cast(pa.binary())
        ext_arr = pa.ExtensionArray.from_storage(GeoArrowWkbType(), storage)
        return tbl.set_column(idx, pa.field(geog_col, ext_arr.type), ext_arr)
    # single source of truth for the field tagging (shared with the
    # distributed write_geoparquet_dir path)
    return tbl.cast(_tag_schema(tbl.schema, geog_col))


def write_geoparquet_dir(
    df: DataFrame, dir_path: str, geog_col: str = "geog"
) -> list:
    """Distributed geoarrow export: every partition streams its own
    footer-tagged parquet file through ``mapInArrow`` — the driver
    only ever sees (path, row-count) receipts. This is the scale path
    (100 TB never flows through the driver); the per-file schema
    carries the same geoarrow.wkb field metadata the reference writes
    (src/s2_geoarrow.cpp:48-84). The directory must be on storage all
    executors can reach (local dir in local mode, shared/dist FS on a
    cluster). Files land under temp names and are renamed on success,
    so failed tasks never leave truncated parquet; a retry after a
    successful rename can still produce a duplicate part — run with
    speculative execution off, or write through a committing sink
    (write.parquet on the WKB frame) when exactly-once matters.
    """
    import os

    os.makedirs(dir_path, exist_ok=True)
    wkb_df = df.withColumn(geog_col, s2_aswkb(geog_col))

    def _write(batches):
        import os
        import uuid

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        writer = None
        name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(dir_path, "_tmp-" + name)
        path = os.path.join(dir_path, name)
        rows = 0
        # write under a _tmp- name and rename on success: a task that
        # dies mid-write leaves only a _tmp- file the reader skips, so
        # retries never surface truncated parquet. (A retry AFTER a
        # successful rename can still duplicate a part — full
        # exactly-once needs a commit protocol; see docstring.)
        for batch in batches:
            if writer is None:
                writer = _pq.ParquetWriter(tmp, _tag_schema(batch.schema, geog_col))
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return  # empty partition: no file
        writer.close()
        os.rename(tmp, path)
        yield _pa.RecordBatch.from_pydict({"path": [path], "rows": [rows]})

    receipts = wkb_df.mapInArrow(_write, "path string, rows long").collect()
    return [(r.path, r.rows) for r in receipts]


def read_geoparquet_dir(
    spark: SparkSession, dir_path: str, geog_col: str = "geog"
) -> DataFrame:
    """Read a :func:`write_geoparquet_dir` directory back as GEOGRAPHY
    through Spark's parallel parquet scan (the geoarrow tagging lives
    in each file's footer; the WKB decode is the same worker-side
    path as any other scan)."""
    df = (
        spark.read.option("pathGlobFilter", "part-*.parquet").parquet(dir_path)
    )
    return df.withColumn(geog_col, s2_geogfromwkb(F.col(geog_col)))


def from_geoarrow_table(
    spark: SparkSession, table: pa.Table, geog_col: str = "geog", strict: bool = True
) -> DataFrame:
    """Import: WKB column tagged geoarrow.wkb -> GEOGRAPHY encoding.

    ``strict`` enforces the spherical-edges check the reference
    performs on ingestion (src/s2_geoarrow.cpp:27-29). Accepts BOTH
    carriers of the extension: a live ExtensionType column (ours or
    another geoarrow library's — the edge model is read from the
    type's serialized metadata) and plain field-metadata tagging."""
    idx = table.schema.get_field_index(geog_col)
    field = table.schema.field(idx)
    if isinstance(field.type, pa.ExtensionType):
        ext_type = field.type
        name = ext_type.extension_name
        try:
            ext = json.loads(
                (ext_type.__arrow_ext_serialize__() or b"{}").decode() or "{}"
            )
        except Exception:
            ext = {}
        # unwrap to storage so the pandas/Spark conversion below sees
        # plain binary
        storage = table.column(idx).combine_chunks()
        storage = (
            storage.storage if hasattr(storage, "storage") else storage.cast(pa.binary())
        )
        table = table.set_column(idx, pa.field(geog_col, pa.binary()), storage)
    else:
        meta = field.metadata or {}
        name = meta.get(b"ARROW:extension:name", b"").decode()
        ext = json.loads(meta.get(b"ARROW:extension:metadata", b"{}") or b"{}")
    if strict:
        if name != "geoarrow.wkb":
            raise ValueError(f"column {geog_col!r} is not geoarrow.wkb (got {name!r})")
        # the geoarrow spec's default for an omitted "edges" key is
        # PLANAR: accepting it silently would reinterpret planar
        # polygons as geodesic ones (edges shift by up to tens of km)
        if ext.get("edges") != "spherical":
            raise ValueError(
                "only spherical-edge geoarrow data is supported; "
                f"got edges={ext.get('edges')!r} (omitted means planar; "
                "pass strict=False to import anyway)"
            )
    pdf = table.to_pandas()
    df = spark.createDataFrame(pdf)
    return df.withColumn(geog_col, s2_geogfromwkb(F.col(geog_col)))


def write_geoparquet(
    df: DataFrame, path: str, geog_col: str = "geog", max_rows: int = 1_000_000
) -> None:
    """Collect ``df`` on the driver and write ONE geoparquet file with
    geoarrow.wkb column metadata — the single-file convenience twin of
    :func:`write_geoparquet_dir` (which writes distributed).
    ``max_rows`` passes through to :func:`to_geoarrow_table`'s
    driver-memory guard; ``max_rows=None`` opts out."""
    pq.write_table(to_geoarrow_table(df, geog_col, max_rows=max_rows), path)


def read_geoparquet(spark: SparkSession, path: str, geog_col: str = "geog") -> DataFrame:
    """Read one geoparquet file (geoarrow.wkb column) into a DataFrame
    with our GEOGRAPHY encoding; single-file twin of
    :func:`read_geoparquet_dir`."""
    return from_geoarrow_table(spark, pq.read_table(path), geog_col)
