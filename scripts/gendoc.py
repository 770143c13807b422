"""Generate docs/function-reference.md from the package docstrings —
duckdoc parity (reference docs/duckdoc.py renders the same shape from
the catalog + jinja; we render from the Python API surface, which is
the primary interface here).

Every example is a self-verifying PySpark snippet (asserts inline);
tests/test_docs.py executes them all against a real SparkSession and
fails if the committed markdown is stale. Run:

    python scripts/gendoc.py          # rewrite docs/function-reference.md
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "duckdb_geography_spark"

#: (category title, module path, names-to-skip)
REGISTRY = [
    ("Input/Output", f"{PKG}.functions.io", ()),
    ("Accessors", f"{PKG}.functions.accessors", ()),
    ("Predicates & Overlays", f"{PKG}.functions.predicates", ()),
    ("Bounds & Coverings", f"{PKG}.functions.bounds", ("BOX_SCHEMA",)),
    ("Cell Operations", f"{PKG}.functions.cells", ("SENTINEL_LONG",)),
    ("Casts & Conversions", f"{PKG}.functions.casts", ()),
    ("Sample Data", f"{PKG}.functions.data", ()),
    ("Spatial Joins", f"{PKG}.joins", ("SpatialJoinLintWarning",)),
    ("Spatial Join Rewrite", f"{PKG}.rewrite", ("RewriteUnsupported",)),
    ("Temporal Joins", f"{PKG}.temporal", ()),
    ("Deduplication", f"{PKG}.llm.dedup", ()),
    ("Similarity Search", f"{PKG}.llm.similarity", ()),
    ("Text Statistics", f"{PKG}.llm.textstats", ("STOPWORDS",)),
    ("Dataset Preparation", f"{PKG}.llm.prep", ("PII_PATTERNS",)),
    ("Curation Pipeline", f"{PKG}.llm.pipeline", ()),
    ("Language Models", f"{PKG}.llm.lm", ()),
    ("Lexical Retrieval", f"{PKG}.llm.retrieval", ()),
    ("Duplicate Spans", f"{PKG}.llm.spans", ()),
    ("Importance Resampling (DSIR)", f"{PKG}.llm.dsir", ()),
    ("Repetition Signals", f"{PKG}.llm.repetition", ()),
    ("URL / Web", f"{PKG}.llm.web", ()),
    ("Snapshot CDC", f"{PKG}.llm.cdc", ()),
    ("Linear Text Classification", f"{PKG}.llm.classify", ()),
    ("Corpus Drift", f"{PKG}.llm.drift", ()),
    ("Product Quantization", f"{PKG}.llm.pq", ()),
    ("Corpus Clustering", f"{PKG}.llm.cluster", ()),
    (
        "Multimodal",
        f"{PKG}.llm.multimodal",
        ("MEDIA_SCHEMA", "IMAGE_FEATURES_SCHEMA"),
    ),
    ("Streaming & Sessions", f"{PKG}.streaming.events", ()),
    ("Sources & Sinks", f"{PKG}.sources", ()),
    ("GeoArrow Interop", f"{PKG}.geoarrow", ("GEOARROW_META",)),
    ("Fluent API", f"{PKG}.fluent", ()),
]

#: Self-verifying runnable examples. Namespace: ``spark``, ``F``
#: (pyspark.sql.functions), and every documented function by name.
EXAMPLES = {
    # --- io ---
    "s2_geogfromtext": """df = spark.createDataFrame([("POINT (-64 45)",)], ["wkt"])
row = df.select(s2_astext(s2_geogfromtext("wkt")).alias("t")).first()
# points snap to the containing leaf cell center (~1 cm)
assert row["t"].startswith("POINT (-63.9999999")""",
    "s2_geogfromtext_novalidate": """bad = "LINESTRING (0 0, 0 0, 1 1)"  # duplicate vertex
df = spark.createDataFrame([(bad,)], ["wkt"])
row = df.select(
    s2_is_valid_reason(s2_geogfromtext_novalidate("wkt")).alias("r")).first()
assert row["r"] == "Vertices 0 and 1 are identical\"""",
    "s2_astext": """df = spark.createDataFrame([("POINT (0.5 1.5)",)], ["wkt"])
t = df.select(s2_astext(s2_geogfromtext("wkt")).alias("t")).first()["t"]
assert t.startswith("POINT (0.4999999") or t.startswith("POINT (0.5000000")""",
    "s2_format": """df = spark.createDataFrame([("POINT (0.123456 0.654321)",)], ["wkt"])
# precision must be a Python constant (the reference's const-arg rule)
row = df.select(s2_format(s2_geogfromtext("wkt"), 2).alias("t")).first()
assert row["t"] == "POINT (0.12 0.65)\"""",
    "s2_geogfromwkb": """df = spark.createDataFrame([("POINT (10 20)",)], ["wkt"])
g = df.select(s2_aswkb(s2_geogfromtext("wkt")).alias("wkb"))
t = g.select(s2_astext(s2_geogfromwkb("wkb")).alias("t")).first()["t"]
assert t.startswith("POINT (10.0000000") or t.startswith("POINT (9.9999999")""",
    "s2_geogfromwkb_novalidate": """df = spark.createDataFrame([("LINESTRING (0 0, 0 0, 1 1)",)], ["wkt"])
wkb = df.select(s2_aswkb(s2_geogfromtext_novalidate("wkt")).alias("b"))
row = wkb.select(s2_is_valid(s2_geogfromwkb_novalidate("b")).alias("v")).first()
assert row["v"] is False""",
    "s2_aswkb": """df = spark.createDataFrame([("POINT (10 20)",)], ["wkt"])
b = df.select(s2_aswkb(s2_geogfromtext("wkt")).alias("wkb")).first()["wkb"]
assert bytes(b)[:5] == b"\\x01\\x01\\x00\\x00\\x00"  # LE WKB point header""",
    "s2_prepare": """poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
df = spark.createDataFrame([(poly,)], ["wkt"]).select(
    s2_prepare(s2_geogfromtext("wkt")).alias("g"))
# prepared values print as an index summary, not WKT
assert df.select(s2_astext("g").alias("t")).first()["t"].startswith("<S2ShapeIndex")""",
    # --- accessors ---
    "s2_isempty": """df = spark.createDataFrame([("POINT (0 1)",), ("POINT EMPTY",)], ["wkt"])
got = [r["e"] for r in
       df.select(s2_isempty(s2_geogfromtext("wkt")).alias("e")).collect()]
assert got == [False, True]""",
    "s2_is_valid": """df = spark.createDataFrame([("POINT (0 1)",)], ["wkt"])
assert df.select(s2_is_valid(s2_geogfromtext("wkt")).alias("v")).first()["v"]""",
    "s2_is_valid_reason": """df = spark.createDataFrame([("POINT (0 1)",)], ["wkt"])
assert df.select(
    s2_is_valid_reason(s2_geogfromtext("wkt")).alias("r")).first()["r"] == \"\"""",
    "s2_area": """df = spark.createDataFrame([("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], ["wkt"])
a = df.select(s2_area(s2_geogfromtext("wkt")).alias("a")).first()["a"]
assert 1.2e10 < a < 1.3e10  # ~1 sq degree at the equator, m^2""",
    "s2_perimeter": """df = spark.createDataFrame([("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], ["wkt"])
p = df.select(s2_perimeter(s2_geogfromtext("wkt")).alias("p")).first()["p"]
assert 440_000 < p < 450_000  # ~4 degree-sides in meters""",
    "s2_length": """df = spark.createDataFrame([("LINESTRING (0 0, 1 0)",)], ["wkt"])
ln = df.select(s2_length(s2_geogfromtext("wkt")).alias("l")).first()["l"]
assert 110_000 < ln < 112_000  # one equatorial degree""",
    "s2_x": """df = spark.createDataFrame([("POINT (-64 45)",)], ["wkt"])
x = df.select(s2_x(s2_geogfromtext("wkt")).alias("x")).first()["x"]
assert abs(x - -64.0) < 1e-6  # leaf-cell snapped""",
    "s2_y": """df = spark.createDataFrame([("POINT (-64 45)",)], ["wkt"])
y = df.select(s2_y(s2_geogfromtext("wkt")).alias("y")).first()["y"]
assert abs(y - 45.0) < 1e-6  # leaf-cell snapped""",
    "s2_dimension": """rows = [("POINT (0 0)",), ("LINESTRING (0 0, 1 1)",),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)]
df = spark.createDataFrame(rows, ["wkt"])
got = [r["d"] for r in
       df.select(s2_dimension(s2_geogfromtext("wkt")).alias("d")).collect()]
assert got == [0, 1, 2]""",
    "s2_num_points": """df = spark.createDataFrame([("LINESTRING (0 0, 1 1, 2 2)",)], ["wkt"])
assert df.select(
    s2_num_points(s2_geogfromtext("wkt")).alias("n")).first()["n"] == 3""",
    # --- predicates ---
    "s2_intersects": """a, b = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (1 1)"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
assert df.select(s2_intersects(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("i")).first()["i"]""",
    "s2_contains": """a, b = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (1 1)"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
assert df.select(s2_contains(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("c")).first()["c"]""",
    "s2_equals": """df = spark.createDataFrame([("POINT (1 1)", "POINT (1 1)")], ["wa", "wb"])
assert df.select(s2_equals(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("e")).first()["e"]""",
    "s2_mayintersect": """a, b = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT (30 30)"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
# covering prefilter: definite miss -> False with no geometry decode
assert df.select(s2_mayintersect(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("m")).first()["m"] is False""",
    "s2_intersection": """a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
inter = df.select(s2_intersection(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("g"))
frac = inter.select((s2_area("g") / 1.0).alias("a")).first()["a"]
assert frac > 0""",
    "s2_difference": """a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
d = df.select(s2_area(s2_difference(
    s2_geogfromtext("wa"), s2_geogfromtext("wb"))).alias("a")).first()["a"]
full = df.select(s2_area(s2_geogfromtext("wa")).alias("a")).first()["a"]
assert 0 < d < full""",
    "s2_union": """a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
df = spark.createDataFrame([(a, b)], ["wa", "wb"])
u = df.select(s2_area(s2_union(
    s2_geogfromtext("wa"), s2_geogfromtext("wb"))).alias("a")).first()["a"]
one = df.select(s2_area(s2_geogfromtext("wa")).alias("a")).first()["a"]
assert u > one""",
    "s2_dwithin": """df = spark.createDataFrame([("POINT (0 0)", "POINT (1 0)")], ["wa", "wb"])
got = df.select(
    s2_dwithin(s2_geogfromtext("wa"), s2_geogfromtext("wb"), 200_000.0).alias("near"),
    s2_dwithin(s2_geogfromtext("wa"), s2_geogfromtext("wb"), 50_000.0).alias("far"),
).first()
assert got["near"] is True and got["far"] is False""",
    "s2_distance": """df = spark.createDataFrame([("POINT (0 0)", "POINT (1 0)")], ["wa", "wb"])
d = df.select(s2_distance(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("d")).first()["d"]
assert 110_000 < d < 112_000""",
    "s2_max_distance": """df = spark.createDataFrame(
    [("LINESTRING (0 0, 1 0)", "POINT (0 0)")], ["wa", "wb"])
d = df.select(s2_max_distance(
    s2_geogfromtext("wa"), s2_geogfromtext("wb")).alias("d")).first()["d"]
assert 110_000 < d < 112_000  # farthest point of the line from the point""",
    # --- bounds ---
    "s2_covering": """df = spark.createDataFrame([("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], ["wkt"])
n = df.select(F.size(s2_covering(s2_geogfromtext("wkt"))).alias("n")).first()["n"]
assert 1 <= n <= 8  # default max_cells=8""",
    "s2_covering_fixed_level": """df = spark.createDataFrame([("POINT (1 1)",)], ["wkt"])
cells = df.select(
    s2_covering_fixed_level(s2_geogfromtext("wkt"), 4).alias("c")).first()["c"]
assert len(cells) == 1 and s2_cell_level is not None""",
    "s2_bounds_box": """df = spark.createDataFrame([("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",)], ["wkt"])
b = df.select(s2_bounds_box(s2_geogfromtext("wkt")).alias("b")).first()["b"]
assert b["xmin"] == 0.0 and b["xmax"] == 10.0 and b["ymax"] >= 10.0""",
    "s2_box": """df = spark.range(1).select(s2_box(
    F.lit(-1.0), F.lit(-2.0), F.lit(3.0), F.lit(4.0)).alias("b"))
b = df.first()["b"]
assert (b["xmin"], b["ymin"], b["xmax"], b["ymax"]) == (-1.0, -2.0, 3.0, 4.0)""",
    "s2_box_intersects": """df = spark.range(1).select(
    s2_box(F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(2.0)).alias("a"),
    s2_box(F.lit(1.0), F.lit(1.0), F.lit(3.0), F.lit(3.0)).alias("b"))
assert df.select(s2_box_intersects("a", "b").alias("i")).first()["i"]""",
    "s2_box_union": """df = spark.range(1).select(
    s2_box(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0)).alias("a"),
    s2_box(F.lit(2.0), F.lit(2.0), F.lit(3.0), F.lit(3.0)).alias("b"))
u = df.select(s2_box_union("a", "b").alias("u")).first()["u"]
assert u["xmax"] == 3.0 and u["ymin"] == 0.0""",
    "s2_box_wkb": """df = spark.range(1).select(
    s2_box(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0)).alias("b"))
wkb = df.select(s2_box_wkb("b").alias("w")).first()["w"]
assert bytes(wkb)[:5] == b"\\x01\\x03\\x00\\x00\\x00"  # LE WKB polygon""",
    "s2_box_struct": """df = spark.range(1).select(s2_box_struct(
    s2_box(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0))).alias("s"))
assert df.first()["s"]["xmin"] == 0.0""",
    # --- cells ---
    "s2_cellfromlonlat": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c = df.select(s2_cellfromlonlat("lon", "lat").alias("c")).first()["c"]
assert s2_cell_level is not None and c != 0""",
    "s2_cell_level": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
lev = df.select(s2_cell_level(
    s2_cellfromlonlat("lon", "lat")).alias("l")).first()["l"]
assert lev == 30  # cellfromlonlat returns leaf cells""",
    "s2_cell_parent": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
p = df.select(s2_cell_level(s2_cell_parent(
    s2_cellfromlonlat("lon", "lat"), 4)).alias("l")).first()["l"]
assert p == 4""",
    "s2_cell_child": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
parent = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
lev = df.select(
    s2_cell_level(s2_cell_child(parent, 2)).alias("l")).first()["l"]
assert lev == 5""",
    "s2_cell_range_min": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c4 = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
row = df.select(s2_cell_range_min(c4).alias("lo"),
                s2_cell_range_max(c4).alias("hi")).first()
assert row["lo"] <= row["hi"]""",
    "s2_cell_range_max": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c4 = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
leaf = s2_cellfromlonlat("lon", "lat")
row = df.select((s2_cell_range_min(c4) <= leaf).alias("a"),
                (leaf <= s2_cell_range_max(c4)).alias("b")).first()
assert row["a"] and row["b"]  # the BETWEEN containment idiom""",
    "s2_cell_contains": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
leaf = s2_cellfromlonlat("lon", "lat")
assert df.select(s2_cell_contains(
    s2_cell_parent(leaf, 4), leaf).alias("c")).first()["c"]""",
    "s2_cell_intersects": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
leaf = s2_cellfromlonlat("lon", "lat")
assert df.select(s2_cell_intersects(
    leaf, s2_cell_parent(leaf, 4)).alias("i")).first()["i"]""",
    "s2_cell_token": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
tok = df.select(s2_cell_token(s2_cell_parent(
    s2_cellfromlonlat("lon", "lat"), 4)).alias("t")).first()["t"]
assert 1 <= len(tok) <= 16""",
    "s2_cell_from_token": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c4 = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
row = df.select(c4.alias("c"),
                s2_cell_from_token(s2_cell_token(c4)).alias("rt")).first()
assert row["c"] == row["rt"]  # token round-trip""",
    "s2_cell_is_valid": """df = spark.createDataFrame([(0,)], ["c"])
assert df.select(
    s2_cell_is_valid(F.col("c")).alias("v")).first()["v"] is False""",
    "s2_cell_debug_string": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
s = df.select(s2_cell_debug_string(s2_cell_parent(
    s2_cellfromlonlat("lon", "lat"), 2)).alias("d")).first()["d"]
assert "/" in s  # face/positions form""",
    "s2_cell_from_debug_string": """df = spark.createDataFrame([("2/03",)], ["d"])
c = df.select(s2_cell_from_debug_string("d").alias("c")).first()["c"]
lev = df.select(s2_cell_level(
    s2_cell_from_debug_string("d")).alias("l")).first()["l"]
assert lev == 2""",
    "s2_cell_edge_neighbor": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c4 = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
n = df.select(s2_cell_level(
    s2_cell_edge_neighbor(c4, 0)).alias("l")).first()["l"]
assert n == 4  # neighbors share the level""",
    "s2_cell_center_lon": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
row = df.select(
    s2_cell_center_lon(s2_cellfromlonlat("lon", "lat")).alias("x"),
    s2_cell_center_lat(s2_cellfromlonlat("lon", "lat")).alias("y")).first()
assert abs(row["x"] + 64.0) < 1e-6 and abs(row["y"] - 45.0) < 1e-6""",
    "with_cellfromlonlat": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
out = with_cellfromlonlat(df, "lon", "lat", "cell")
assert "cell" in out.columns and out.first()["cell"] != 0""",
    # --- casts ---
    "s2_cell_center_to_geography": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
t = df.select(s2_astext(s2_cell_center_to_geography(
    s2_cellfromlonlat("lon", "lat"))).alias("t")).first()["t"]
assert t.startswith("POINT (-6")  # snapped to the leaf cell center""",
    "s2_geography_to_cell_center": """df = spark.createDataFrame([("POINT (-64 45)",)], ["wkt"])
c = df.select(s2_geography_to_cell_center(
    s2_geogfromtext("wkt")).alias("c")).first()["c"]
assert c != 0""",
    "s2_cell_to_geography": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
poly = s2_cell_to_geography(s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4))
t = df.select(s2_astext(poly).alias("t")).first()["t"]
assert t.startswith("POLYGON")  # the 4-vertex cell polygon""",
    "s2_cellfromwkb": """df = spark.createDataFrame([("POINT (10 20)",)], ["wkt"])
wkb = df.select(s2_aswkb(s2_geogfromtext("wkt")).alias("b"))
assert wkb.select(s2_cellfromwkb("b").alias("c")).first()["c"] != 0""",
    "s2_arbitrarycellfromwkb": """df = spark.createDataFrame([("LINESTRING (0 0, 1 1)",)], ["wkt"])
wkb = df.select(s2_aswkb(s2_geogfromtext("wkt")).alias("b"))
# non-points give an arbitrary nearby cell instead of an error
assert wkb.select(s2_arbitrarycellfromwkb("b").alias("c")).first()["c"] != 0""",
    "s2_cell_vertex": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
c4 = s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)
t = df.select(s2_astext(s2_cell_vertex(c4, 0)).alias("t")).first()["t"]
assert t.startswith("POINT")""",
    "s2_cell_to_cell_union": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
u = df.select(s2_cell_to_cell_union(
    s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4)).alias("u")).first()["u"]
assert len(u) == 1""",
    "s2_cell_union_normalize": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
leaf = s2_cellfromlonlat("lon", "lat")
# 4 siblings normalize to their parent
kids = F.array(*[s2_cell_child(s2_cell_parent(leaf, 4), k) for k in range(4)])
u = df.select(s2_cell_union_normalize(kids).alias("u")).first()["u"]
assert len(u) == 1""",
    "s2_cell_union_to_geography": """df = spark.createDataFrame([(-64.0, 45.0)], ["lon", "lat"])
u = s2_cell_to_cell_union(s2_cell_parent(s2_cellfromlonlat("lon", "lat"), 4))
t = df.select(s2_astext(s2_cell_union_to_geography(u)).alias("t")).first()["t"]
assert t.startswith("POLYGON")""",
    # --- data ---
    "s2_data_cities": """cities = s2_data_cities(spark)
assert cities.count() == 243 and "geog" in cities.columns""",
    "s2_data_countries": """countries = s2_data_countries(spark)
assert countries.count() == 177""",
    "s2_data_city": """# returns encoded geography bytes -> embed as a literal
df = spark.range(1).select(
    s2_astext(F.lit(s2_data_city("Toronto"))).alias("t"))
assert df.first()["t"].startswith("POINT (-79.42")""",
    "s2_data_country": """df = spark.range(1).select(
    s2_dimension(F.lit(s2_data_country("Fiji"))).alias("d"))
assert df.first()["d"] == 2""",
    "s2_dependencies": """deps = s2_dependencies(spark)
assert deps.count() >= 1""",
    # --- joins ---
    "spatial_join": """cities = s2_data_cities(spark).select(F.col("name").alias("city"), "geog")
two = s2_data_countries(spark).where(F.col("name").isin("Canada", "Chile"))
got = spatial_join(cities, two, right_geog="geog", left_geog="geog")
assert got.where(F.col("city") == "Toronto").count() == 1""",
    "lint_spatial_joins": """cities = s2_data_cities(spark).select("name", "geog")
r = s2_data_countries(spark).select(F.col("name").alias("m"),
                                    F.col("geog").alias("geog2"))
naive = cities.join(r, s2_intersects("geog", "geog2"))
assert len(lint_spatial_joins(naive, warn=False)) == 1  # the footgun
recipe = spatial_join(cities, s2_data_countries(spark),
                      left_key="name", right_key="name")
assert lint_spatial_joins(recipe, warn=False) == []""",
    "rewrite_spatial_joins": """import warnings
cities = s2_data_cities(spark).select(
    F.col("name").alias("city"), F.col("geog").alias("cgeog")).limit(40)
two = s2_data_countries(spark).select(
    F.col("name").alias("country"), F.col("geog").alias("ngeog")).limit(20)
naive = cities.join(two, s2_intersects("cgeog", "ngeog")).select(
    "country", "city")  # executes as an unconditioned cartesian join
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    fixed = rewrite_spatial_joins(naive)
plan = fixed._jdf.queryExecution().executedPlan().toString()
assert "CartesianProduct" not in plan
assert "BroadcastNestedLoopJoin" not in plan
assert {tuple(r) for r in fixed.collect()} == {tuple(r) for r in naive.collect()}""",
    # --- temporal ---
    "asof_join": """import datetime as dt
t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
left = spark.createDataFrame([(1, t(10)), (1, t(30))], ["k", "ts"])
right = spark.createDataFrame([(1, t(5), "a"), (1, t(25), "b")],
                              ["k", "ts", "v"])
got = {r["ts"].second: r["v"]
       for r in asof_join(left, right, on="k").collect()}
assert got == {10: "a", 30: "b"}  # latest right row at-or-before each left ts""",
    # --- dedup ---
    "exact_dedup": """df = spark.createDataFrame(
    [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"])
kept = exact_dedup(df)
assert kept.count() == 2  # one winner per identical text""",
    "minhash_lsh_pairs": """df = spark.createDataFrame(
    [(1, "the quick brown fox jumps over the lazy dog"),
     (2, "the quick brown fox jumps over the lazy dog!"),
     (3, "completely different content here")], ["doc_id", "text"])
pairs = {(r["key_a"], r["key_b"]) for r in minhash_lsh_pairs(df).collect()}
assert (1, 2) in pairs and (1, 3) not in pairs""",
    "connected_components": """pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)],
                              ["key_a", "key_b"])
comp = {r["node"]: r["component"]
        for r in connected_components(pairs).collect()}
assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}""",
    "simhash": """df = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
assert df.select(simhash("text").alias("s")).first()["s"] != 0""",
    # --- similarity ---
    "cosine_topk": """rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)]
emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
top = cosine_topk(emb, [1.0, 0.0, 0.0, 0.0], k=3)
assert top.count() == 3""",
    # --- textstats ---
    "token_count": """df = spark.createDataFrame([("one two  three",)], ["text"])
assert df.select(token_count("text").alias("n")).first()["n"] == 3""",
    "quality_score": """df = spark.createDataFrame(
    [("A normal, well punctuated sentence with common words.",)], ["text"])
s = df.select(quality_score("text").alias("q")).first()["q"]
assert 0.0 <= s <= 1.0""",
    "langid": """df = spark.createDataFrame(
    [("the quick brown fox and the lazy dog walked together",),
     ("der schnelle braune fuchs und der faule hund",)], ["text"])
got = [r["l"] for r in df.select(langid("text").alias("l")).collect()]
assert got[0] == "en\"""",
    "char_entropy": """df = spark.createDataFrame([("aaaaaaaa",), ("a1b2c3d4",)], ["text"])
e = [r["e"] for r in df.select(char_entropy("text").alias("e")).collect()]
assert e[0] == 0.0 and e[1] > 2.0""",
    # --- prep ---
    "chunk_documents": """df = spark.createDataFrame([(1, "x" * 1200)], ["doc_id", "text"])
chunks = chunk_documents(df, chunk_chars=500, overlap=50)
assert chunks.count() == 3""",
    "hash_split": """df = spark.range(1000).select(
    F.concat(F.lit("doc "), F.col("id")).alias("text"))
out = df.withColumn("split", hash_split("text", train_pct=90))
frac = out.where(F.col("split") == "train").count() / 1000
assert 0.85 < frac < 0.95  # content-hashed, deterministic""",
    "redact_pii": """df = spark.createDataFrame([("mail me at a@b.com",)], ["text"])
assert "<EMAIL>" in df.select(redact_pii("text").alias("t")).first()["t"]""",
    "dedup_lines": """df = spark.createDataFrame(
    [(1, "SUBSCRIBE!\\nreal content one"),
     (2, "SUBSCRIBE!\\nreal content two")], ["doc_id", "text"])
out = {r["doc_id"]: r["text_clean"] for r in dedup_lines(df).collect()}
assert out[1] == "real content one"  # the shared line is boilerplate""",
    "curate_corpus": """base = " ".join(f"alpha{i:02d} beta{i:02d}" for i in range(30))
rows = [(1, base), (2, base), (3, base + " tail"),
        (4, "mail a@b.com " + " ".join(f"gamma{i:02d}" for i in range(30)))]
df = spark.createDataFrame(rows, ["doc_id", "text"])
out = curate_corpus(df, threshold=0.6, hash_fn="md5")
got = {r["doc_id"]: r["text_clean"] for r in out.collect()}
assert set(got) == {1, 4}          # exact dup 2 and near-dup 3 dropped
assert "<EMAIL>" in got[4]         # PII redacted last""",
    # --- lm ---
    "unigram_nll": """df = spark.createDataFrame(
    [(1, "a a a a"), (2, "a b c d")], ["doc_id", "text"])
got = {r["doc_id"]: r["nll"] for r in unigram_nll(df).collect()}
assert got[1] < got[2]  # repetitive text is more predictable""",
    # --- repetition ---
    "repetition_signals": """df = spark.createDataFrame(
    [(1, "spam spam spam spam spam"), (2, "all words differ here now")],
    ["doc_id", "text"])
sig = {r["doc_id"]: r for r in repetition_signals(df).collect()}
assert sig[1]["top_ngram_char_frac"] > sig[2]["top_ngram_char_frac"]""",
    # --- web ---
    "url_host": """df = spark.createDataFrame([("HTTPS://User@WWW.Example.COM:443/p?q=1#f",)],
                           ["url"])
assert df.select(url_host("url").alias("h")).first()["h"] == "www.example.com\"""",
    "normalize_url": """df = spark.createDataFrame(
    [("HTTPS://a.com/p/?utm_source=feed&id=7#frag",)], ["url"])
assert df.select(normalize_url("url").alias("n")
    ).first()["n"] == "https://a.com/p?id=7\"""",
    # --- fluent ---
    "geo": """df = spark.createDataFrame([("POINT (-64 45)",)], ["wkt"])
g = geo("wkt").s2_geogfromtext()
x = df.select(g.s2_x().alias("x")).first()["x"]
assert abs(x - -64.0) < 1e-6""",
}


def collect():
    out = []
    for title, modpath, skip in REGISTRY:
        mod = importlib.import_module(modpath)
        names = [
            n
            for n in (getattr(mod, "__all__", None) or [])
            if n not in skip and not n[0].isupper()
        ]
        funcs = []
        for n in names:
            obj = getattr(mod, n)
            if not callable(obj):
                continue
            doc = inspect.getdoc(obj) or ""
            summary = doc.split("\n\n")[0].replace("\n", " ") if doc else ""
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            funcs.append(
                {
                    "name": n,
                    "module": modpath,
                    "signature": sig,
                    "summary": summary,
                    "doc": doc,
                    "example": EXAMPLES.get(n),
                }
            )
        if funcs:
            out.append({"title": title, "module": modpath, "functions": funcs})
    return out


def render(categories) -> str:
    lines = [
        "# Function Reference",
        "",
        "<!-- GENERATED by scripts/gendoc.py — edit docstrings, not this"
        " file. tests/test_docs.py regenerates and runs every example. -->",
        "",
        "All examples assume:",
        "",
        "```python",
        "from pyspark.sql import functions as F",
        "from duckdb_geography_spark.session import get_spark",
        "# ... and the documented functions imported from their modules",
        "spark = get_spark()",
        "```",
        "",
        "| Function | Module | Summary |",
        "| --- | --- | --- |",
    ]
    for cat in categories:
        for f in cat["functions"]:
            summ = f["summary"].replace("|", "\\|")
            if len(summ) > 110:
                summ = summ[:107] + "..."
            lines.append(
                f"| [`{f['name']}`](#{f['name'].lower()}) | "
                f"`{f['module'].removeprefix(PKG + '.')}` | {summ} |"
            )
    for cat in categories:
        lines += ["", f"## {cat['title']}", ""]
        for f in cat["functions"]:
            lines += [
                f"### {f['name']}",
                "",
                f"```python",
                f"{f['name']}{f['signature']}",
                f"```",
                "",
                f["doc"] or "*(undocumented)*",
                "",
            ]
            if f["example"]:
                lines += ["#### Example", "", "```python", f["example"], "```", ""]
    return "\n".join(lines).rstrip() + "\n"


#: Reference-parity map (VERDICT r8 item 5): every function the
#: reference registers, its anchor in the REFERENCE repo's own
#: function-reference.md (category, line of the `### name` heading
#: with the worked example) or src location for the ones its docs
#: omit, and the driver gate that oracle-verifies the repo
#: equivalent. Line numbers are pinned to the reference snapshot this
#: repo was built against; the repo-side anchors are validated live
#: against collect().
REF_PARITY = {
    # Accessors
    "s2_area": ("Accessors", "docs/function-reference.md:61", "rect_measures"),
    "s2_dimension": ("Accessors", "docs/function-reference.md:96", "accessor_suite"),
    "s2_distance": ("Accessors", "docs/function-reference.md:155", "snapped_distance_pairs"),
    "s2_dwithin": ("Accessors", "docs/function-reference.md:178", "dwithin_gate"),
    "s2_is_valid": ("Accessors", "docs/function-reference.md:214", "validity_gate"),
    "s2_is_valid_reason": ("Accessors", "docs/function-reference.md:247", "validity_gate"),
    "s2_isempty": ("Accessors", "docs/function-reference.md:275", "accessor_suite"),
    "s2_length": ("Accessors", "docs/function-reference.md:295", "accessor_suite"),
    "s2_max_distance": ("Accessors", "docs/function-reference.md:335", "snap_cast_distance"),
    "s2_num_points": ("Accessors", "docs/function-reference.md:358", "accessor_suite"),
    "s2_perimeter": ("Accessors", "docs/function-reference.md:386", "rect_measures"),
    "s2_x": ("Accessors", "docs/function-reference.md:423", "accessor_suite"),
    "s2_y": ("Accessors", "docs/function-reference.md:447", "accessor_suite"),
    # Bounds
    "s2_bounds_box": ("Bounds", "docs/function-reference.md:472", "bounds_box_gate"),
    "s2_box": ("Bounds", "docs/function-reference.md:505", "box_ops"),
    "s2_box_intersects": ("Bounds", "docs/function-reference.md:539", "box_ops"),
    "s2_box_struct": ("Bounds", "docs/function-reference.md:573", "box_ops"),
    "s2_box_union": ("Bounds", "docs/function-reference.md:593", "box_ops"),
    "s2_box_wkb": ("Bounds", "docs/function-reference.md:616", "box_ops"),
    "s2_covering": ("Bounds", "docs/function-reference.md:636", "covering_sizes"),
    "s2_covering_fixed_level": ("Bounds", "docs/function-reference.md:682", "pip_covering_join"),
    "s2_bounds_box_agg": ("Bounds", "src/s2_bounds.cpp:245-341 (not in reference docs)", "bounds_box_agg"),
    # Cellops
    "s2_arbitrarycellfromwkb": ("Cellops", "docs/function-reference.md:715", "cellfromwkb_gate"),
    "s2_cell_child": ("Cellops", "docs/function-reference.md:771", "cell_bitops"),
    "s2_cell_contains": ("Cellops", "docs/function-reference.md:802", "cell_containment_join"),
    "s2_cell_edge_neighbor": ("Cellops", "docs/function-reference.md:835", "cell_neighbor_gate"),
    "s2_cell_from_token": ("Cellops", "docs/function-reference.md:866", "cell_bitops"),
    "s2_cell_intersects": ("Cellops", "docs/function-reference.md:901", "cell_containment_join"),
    "s2_cell_level": ("Cellops", "docs/function-reference.md:937", "cell_bitops"),
    "s2_cell_parent": ("Cellops", "docs/function-reference.md:957", "cell_bitops"),
    "s2_cell_range_max": ("Cellops", "docs/function-reference.md:990", "cell_bitops"),
    "s2_cell_range_min": ("Cellops", "docs/function-reference.md:1012", "cell_bitops"),
    "s2_cell_token": ("Cellops", "docs/function-reference.md:1034", "cell_bitops"),
    "s2_cell_vertex": ("Cellops", "docs/function-reference.md:1067", "cell_vertex_gate"),
    "s2_cellfromlonlat": ("Cellops", "docs/function-reference.md:1110", "cellfromlonlat"),
    "s2_cellfromwkb": ("Cellops", "docs/function-reference.md:1151", "cellfromwkb_gate"),
    # Conversion
    "s2_astext": ("Conversion", "docs/function-reference.md:1190", "wkt_roundtrip"),
    "s2_aswkb": ("Conversion", "docs/function-reference.md:1221", "wkb_codec"),
    "s2_format": ("Conversion", "docs/function-reference.md:1250", "wkt_roundtrip"),
    "s2_geogfromtext": ("Conversion", "docs/function-reference.md:1275", "wkt_roundtrip"),
    "s2_geogfromtext_novalidate": ("Conversion", "docs/function-reference.md:1308", "validity_gate"),
    "s2_geogfromwkb": ("Conversion", "docs/function-reference.md:1333", "wkb_codec"),
    "s2_geogfromwkb_novalidate": ("Conversion", "docs/function-reference.md:1360", "wkb_codec"),
    "s2_prepare": ("Conversion", "docs/function-reference.md:1387", "prepare_gate"),
    # Data
    "s2_data_city": ("Data", "docs/function-reference.md:1437", "data_tables_gate"),
    "s2_data_country": ("Data", "docs/function-reference.md:1469", "data_tables_gate"),
    "s2_data_cities": ("Data", "src/s2_data.cpp:26-76 (not in reference docs)", "data_tables_gate"),
    "s2_data_countries": ("Data", "src/s2_data.cpp:78-128 (not in reference docs)", "data_tables_gate"),
    "s2_dependencies": ("Data", "src/s2_dependencies.cpp (not in reference docs)", "data_tables_gate"),
    # Overlay
    "s2_difference": ("Overlay", "docs/function-reference.md:1502", "overlay_suite"),
    "s2_intersection": ("Overlay", "docs/function-reference.md:1525", "overlay_suite"),
    "s2_union": ("Overlay", "docs/function-reference.md:1548", "overlay_suite"),
    # Predicates
    "s2_contains": ("Predicates", "docs/function-reference.md:1572", "predicate_gate"),
    "s2_equals": ("Predicates", "docs/function-reference.md:1608", "predicate_gate"),
    "s2_intersects": ("Predicates", "docs/function-reference.md:1641", "pip_covering_join"),
    "s2_mayintersect": ("Predicates", "docs/function-reference.md:1669", "pip_covering_join"),
    # Extension smoke scalar
    "s2": (
        "Data", "src/geography_extension.cpp:18-27 (not in reference docs)",
        "data_tables_gate",
    ),
    # GeoArrow (src-only surface)
    "s2_register_geoarrow_extensions": (
        "GeoArrow", "src/s2_geoarrow.cpp:18-93 (not in reference docs)",
        "geoarrow_roundtrip",
    ),
}


def render_parity(categories) -> str:
    """docs/reference-parity.md: one row per function the reference
    registers — where its worked example lives in the REFERENCE repo's
    docs, the same-named repo equivalent (linked into our
    function-reference.md), and the driver gate whose DuckDB oracle
    verifies the behavior end to end."""
    repo_mod = {
        f["name"]: f["module"].removeprefix(PKG + ".")
        for cat in categories
        for f in cat["functions"]
    }
    missing = sorted(n for n in REF_PARITY if n not in repo_mod)
    if missing:
        raise SystemExit(f"reference functions without repo equivalents: {missing}")
    lines = [
        "# Reference Parity",
        "",
        "<!-- GENERATED by scripts/gendoc.py — edit REF_PARITY there,"
        " not this file. tests/test_docs.py keeps it current. -->",
        "",
        "Every function the reference engine registers, mapped to its"
        " repo equivalent. *Reference example* points into the"
        " reference repo's own `docs/function-reference.md` (the `###`"
        " heading with the worked example) or, for functions its docs"
        " omit, the registering source file. *Repo equivalent* links"
        " into [function-reference.md](function-reference.md), whose"
        " examples are executable and test-pinned. *Driver gate* names"
        " the `__spark_entry__.queries()` entry whose DuckDB oracle"
        " verifies the behavior on real data every round.",
        "",
        "| Reference function | Reference example | Repo equivalent | Driver gate |",
        "| --- | --- | --- | --- |",
    ]
    by_cat: dict = {}
    for name, (cat, anchor, gate) in REF_PARITY.items():
        by_cat.setdefault(cat, []).append((name, anchor, gate))
    for cat in sorted(by_cat):
        for name, anchor, gate in sorted(by_cat[cat]):
            lines.append(
                f"| `{name}` ({cat}) | {anchor} | "
                f"[`{repo_mod[name]}.{name}`](function-reference.md#{name.lower()}) | "
                f"`{gate}` |"
            )
    lines += [
        "",
        f"{len(REF_PARITY)} reference functions, {len(REF_PARITY)} repo"
        " equivalents, 0 missing.",
    ]
    return "\n".join(lines) + "\n"


def example_namespace(spark):
    """The namespace tests execute examples in: spark + F + every
    documented function."""
    from pyspark.sql import functions as F  # noqa: N812

    ns = {"spark": spark, "F": F}
    for _, modpath, skip in REGISTRY:
        mod = importlib.import_module(modpath)
        for n in getattr(mod, "__all__", None) or []:
            if n not in skip:
                ns[n] = getattr(mod, n)
    return ns


def main():
    cats = collect()
    docs_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )
    os.makedirs(docs_dir, exist_ok=True)
    for fname, content in (
        ("function-reference.md", render(cats)),
        ("reference-parity.md", render_parity(cats)),
    ):
        out = os.path.join(docs_dir, fname)
        with open(out, "w") as fh:
            fh.write(content)
        print(f"wrote {out} ({len(content.splitlines())} lines)")


if __name__ == "__main__":
    main()
