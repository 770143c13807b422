"""GeoArrow interop roundtrips (reference: test/python/test_geoarrow.py)."""

from __future__ import annotations

import pytest

import duckdb_geography_spark.functions as G
from duckdb_geography_spark import geoarrow as GA
from duckdb_geography_spark.functions import data as D


def test_table_roundtrip(spark):
    cities = D.s2_data_cities(spark).limit(20)
    tbl = GA.to_geoarrow_table(cities)
    meta = tbl.schema.field("geog").metadata
    assert meta[b"ARROW:extension:name"] == b"geoarrow.wkb"
    back = GA.from_geoarrow_table(spark, tbl)
    a = cities.select("name", G.s2_format("geog", 6).alias("t")).collect()
    b = back.select("name", G.s2_format("geog", 6).alias("t")).collect()
    assert {(r.name, r.t) for r in a} == {(r.name, r.t) for r in b}


def test_strict_rejects_untagged(spark):
    import pyarrow as pa

    tbl = pa.table({"geog": [b"\x00"], "name": ["x"]})
    with pytest.raises(ValueError, match="geoarrow.wkb"):
        GA.from_geoarrow_table(spark, tbl)


def test_strict_rejects_planar_and_omitted_edges(spark):
    """Reference parity (test/python/test_geoarrow.py
    test_reject_planar_edges): geoarrow.wkb WITHOUT explicit
    edges=spherical must be refused — the spec's default for an
    omitted key is planar, and silently reinterpreting planar
    polygons as geodesic shifts long edges by kilometers."""
    import pyarrow as pa

    for ext_meta in (b"{}", b'{"edges": "planar"}'):
        field = pa.field(
            "geog",
            pa.binary(),
            metadata={
                b"ARROW:extension:name": b"geoarrow.wkb",
                b"ARROW:extension:metadata": ext_meta,
            },
        )
        point_wkb = bytes.fromhex(
            "01010000000000000000002440000000000000" "3440"
        )
        tbl = pa.table([pa.array([point_wkb])], schema=pa.schema([field]))
        with pytest.raises(ValueError, match="spherical"):
            GA.from_geoarrow_table(spark, tbl)
        # non-strict mode imports anyway (explicit opt-in)
        assert GA.from_geoarrow_table(spark, tbl, strict=False).count() == 1


def test_geoparquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "cities.parquet")
    cities = D.s2_data_cities(spark).limit(10)
    GA.write_geoparquet(cities, path)
    back = GA.read_geoparquet(spark, path)
    assert back.count() == 10
    a = cities.select(G.s2_format("geog", 6).alias("t")).collect()
    b = back.select(G.s2_format("geog", 6).alias("t")).collect()
    assert {r.t for r in a} == {r.t for r in b}


def test_geoparquet_dir_distributed_roundtrip(spark, tmp_path):
    import pyarrow.parquet as pq

    d = str(tmp_path / "cities_dir")
    cities = D.s2_data_cities(spark).repartition(4)
    receipts = GA.write_geoparquet_dir(cities, d)
    assert sum(r for _, r in receipts) == 243
    assert 1 <= len(receipts) <= 4
    # the footer of every part file carries the geoarrow tag. If the
    # live ExtensionType is registered with pyarrow (another test in
    # the same process may have called s2_register_geoarrow_extensions),
    # pyarrow reconstitutes the tag as the extension type itself and
    # field.metadata comes back None — accept both forms.
    for path, _rows in receipts:
        field = pq.ParquetFile(path).schema_arrow.field("geog")
        meta = field.metadata or {}
        if b"ARROW:extension:name" in meta:
            assert meta[b"ARROW:extension:name"] == b"geoarrow.wkb"
        else:
            assert getattr(field.type, "extension_name", None) == "geoarrow.wkb"
    back = GA.read_geoparquet_dir(spark, d)
    assert back.count() == 243
    a = cities.select(G.s2_format("geog", 6).alias("t")).collect()
    b = back.select(G.s2_format("geog", 6).alias("t")).collect()
    assert {r.t for r in a} == {r.t for r in b}


# ---------------------------------------------------------------------------
# live pyarrow ExtensionType (round 5; reference src/s2_geoarrow.cpp:18-93,
# test/python/test_geoarrow.py:13-86)
# ---------------------------------------------------------------------------


def test_register_extension_idempotent():
    assert GA.s2_register_geoarrow_extensions() is True
    assert GA.s2_register_geoarrow_extensions() is True  # second call: no raise


def test_extension_export_roundtrips_through_ipc(spark):
    import pyarrow as pa

    GA.s2_register_geoarrow_extensions()
    cities = D.s2_data_cities(spark).limit(10)
    tbl = GA.to_geoarrow_table(cities, extension=True)
    assert isinstance(tbl.schema.field("geog").type, GA.GeoArrowWkbType)
    assert tbl.schema.field("geog").type.edges == "spherical"
    # IPC round-trip re-materializes the registered type
    import io

    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, tbl.schema) as w:
        w.write_table(tbl)
    buf.seek(0)
    back_tbl = pa.ipc.open_stream(buf).read_all()
    assert isinstance(back_tbl.schema.field("geog").type, GA.GeoArrowWkbType)
    back = GA.from_geoarrow_table(spark, back_tbl)
    a = cities.select("name", G.s2_format("geog", 6).alias("t")).collect()
    b = back.select("name", G.s2_format("geog", 6).alias("t")).collect()
    assert {(r.name, r.t) for r in a} == {(r.name, r.t) for r in b}


def test_cross_library_extension_array_imports(spark):
    # simulate a table built by ANOTHER geoarrow-aware library: a raw
    # ExtensionArray over WKB storage, no field metadata at all
    import pyarrow as pa

    GA.s2_register_geoarrow_extensions()
    point_wkb = bytes.fromhex("0101000000000000000000f03f0000000000000040")  # POINT(1 2)
    storage = pa.array([point_wkb], type=pa.binary())
    arr = pa.ExtensionArray.from_storage(GA.GeoArrowWkbType(), storage)
    tbl = pa.table({"name": pa.array(["p"]), "geog": arr})
    back = GA.from_geoarrow_table(spark, tbl)
    # points snap to leaf cell centers on parse (engine-wide contract)
    got = back.select(G.s2_format("geog", 6).alias("t")).head()["t"]
    assert got == "POINT (1 2)"


def test_planar_extension_type_rejected_strict(spark):
    import pyarrow as pa

    GA.s2_register_geoarrow_extensions()
    storage = pa.array([b"\x00"], type=pa.binary())
    arr = pa.ExtensionArray.from_storage(GA.GeoArrowWkbType(edges="planar"), storage)
    tbl = pa.table({"geog": arr})
    with pytest.raises(ValueError, match="spherical"):
        GA.from_geoarrow_table(spark, tbl)
