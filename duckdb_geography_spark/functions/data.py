"""Built-in sample datasets and lookups
(reference: src/s2_data.cpp — s2_data_cities / s2_data_countries
table functions, s2_data_city / s2_data_country scalar lookups,
src/s2_dependencies.cpp — s2_dependencies).

The reference bundles 243 city points and 177 country polygons
(test/sql/geography/data.test:23-39). Since round 6 we bundle the
SAME public-domain Natural Earth-derived TSVs (../data/cities.tsv,
../data/countries.tsv — see ../data/README.md for provenance), so
every dataset-wide reference golden (bounds_box_agg over all rows,
the data.test TSV cross-check, box exporters over real boundaries)
replays with the reference's exact decimals. Rounds 1-5 pinned only
the 7 golden rows and synthesized the rest; PINNED_CITIES remains as
the documented golden-row subset (now sourced from the TSV like
everything else).
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

#: golden rows the pinned reference queries use (FIXTURES.md S1) —
#: verified against the bundled TSVs at load (values from the same
#: public Natural Earth source the reference bundles)
PINNED_CITIES = [
    ("Vancouver", 603502, "POINT (-123.12359 49.2753624)"),
    ("Toronto", 3934421, "POINT (-79.4219667 43.7019257)"),
    ("Berlin", 3094014, "POINT (13.3996028 52.5237645)"),
    ("Chicago", 2841952, "POINT (-87.7520008 41.8319365)"),
]

def _load_tsv(name: str) -> pd.DataFrame:
    # importlib.resources handles both the on-disk package dir and the
    # addPyFile zip (the driver may resolve the package from the zip)
    import io
    from importlib.resources import files

    buf = files("duckdb_geography_spark").joinpath("data", name).read_bytes()
    return pd.read_csv(io.BytesIO(buf), sep="\t")


_CITIES_PDF = None
_COUNTRIES_PDF = None


def _cities_pdf() -> pd.DataFrame:
    """The bundled Natural Earth city table (driver-side; see
    ../data/README.md for provenance). Validated at first load:
    cardinality AND the PINNED_CITIES golden rows must match the TSV
    byte-for-byte (explicit raise, not assert — must survive -O)."""
    global _CITIES_PDF
    if _CITIES_PDF is None:
        pdf = _load_tsv("cities.tsv").rename(columns={"geog": "geog_wkt"})
        if len(pdf) != N_CITIES:
            raise ValueError(f"bundled cities.tsv has {len(pdf)} rows, expected {N_CITIES}")
        by_name = pdf.set_index("name")
        for name, pop, wkt in PINNED_CITIES:
            row = by_name.loc[name]
            if int(row["population"]) != pop or row["geog_wkt"] != wkt:
                raise ValueError(
                    f"bundled cities.tsv row for {name!r} does not match the "
                    f"pinned golden ({row['population']}, {row['geog_wkt']!r})"
                )
        _CITIES_PDF = pdf
    return _CITIES_PDF


def _countries_pdf() -> pd.DataFrame:
    """The bundled Natural Earth country table (driver-side; see
    ../data/README.md for provenance)."""
    global _COUNTRIES_PDF
    if _COUNTRIES_PDF is None:
        pdf = _load_tsv("countries.tsv").rename(columns={"geog": "geog_wkt"})
        if len(pdf) != N_COUNTRIES:
            raise ValueError(f"bundled countries.tsv has {len(pdf)} rows, expected {N_COUNTRIES}")
        _COUNTRIES_PDF = pdf
    return _COUNTRIES_PDF


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
