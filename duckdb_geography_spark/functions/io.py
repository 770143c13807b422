"""Conversion / IO functions (reference: src/s2_functions_io.cpp).

WKT/WKB in and out, fixed-precision formatting, prepare. All are
Arrow-batched pandas UDFs over the binary GEOGRAPHY encoding.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from ..geo.geography import KIND_PREPARED, Geography, from_wkb, from_wkt
from . import geoudfs as U

__all__ = [
    "s2_geogfromtext",
    "s2_geogfromtext_novalidate",
    "s2_astext",
    "s2_format",
    "s2_geogfromwkb",
    "s2_geogfromwkb_novalidate",
    "s2_aswkb",
    "s2_prepare",
    "s2_unprepare",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


@lru_cache(maxsize=4096)
def _fromtext_cached(t: str, validate: bool) -> bytes:
    """Parse+encode is covering-bearing (the adaptive coverer runs at
    encode), so repeated texts — dimension tables re-read across
    queries, literal geometries — are worth memoizing per worker."""
    return from_wkt(t, validate=validate).encode()


def _fromtext_series(s: pd.Series, validate: bool) -> pd.Series:
    out = []
    for t in s:
        if t is None:
            out.append(None)
        else:
            out.append(_fromtext_cached(t, validate))
    return pd.Series(out, dtype=object)


@F.pandas_udf(BinaryType())
def _geogfromtext_udf(s: pd.Series) -> pd.Series:
    return _fromtext_series(s, True)


@F.pandas_udf(BinaryType())
def _geogfromtext_novalidate_udf(s: pd.Series) -> pd.Series:
    return _fromtext_series(s, False)


def s2_geogfromtext(wkt) -> Column:
    """WKT -> GEOGRAPHY, validating (src/s2_functions_io.cpp:22-101)."""
    return _geogfromtext_udf(_c(wkt))


def s2_geogfromtext_novalidate(wkt) -> Column:
    """WKT -> GEOGRAPHY without validation (src/s2_functions_io.cpp:48-83)."""
    return _geogfromtext_novalidate_udf(_c(wkt))


@F.pandas_udf(StringType())
def _astext_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    return pd.Series(
        [U.decode_cached(bytes(b)).to_wkt(None) if b is not None else None for b in s],
        dtype=object,
    )


def s2_astext(geog) -> Column:
    """GEOGRAPHY -> lossless WKT; prepared prints <S2ShapeIndex N b>
    (src/s2_functions_io.cpp:104-131)."""
    return _astext_udf(_c(geog))


def s2_format(geog, precision: int) -> Column:
    """WKT with fixed precision; precision must be a Python literal,
    mirroring the reference's constant-argument rule
    (src/s2_functions_io.cpp:133-172)."""
    if not isinstance(precision, int):
        raise ValueError("s2_format(): precision must be a constant integer")
    p = int(precision)

    @F.pandas_udf(StringType())
    def _format_udf(s: pd.Series) -> pd.Series:
        s = U.coerce_geog(s)
        return pd.Series(
            [U.decode_cached(bytes(b)).to_wkt(p) if b is not None else None for b in s],
            dtype=object,
        )

    return _format_udf(_c(geog))


def _fromwkb_series(s: pd.Series, validate: bool) -> pd.Series:
    out = []
    for b in s:
        if b is None:
            out.append(None)
        else:
            out.append(from_wkb(bytes(b), validate=validate).encode())
    return pd.Series(out, dtype=object)


@F.pandas_udf(BinaryType())
def _geogfromwkb_udf(s: pd.Series) -> pd.Series:
    return _fromwkb_series(s, True)


@F.pandas_udf(BinaryType())
def _geogfromwkb_novalidate_udf(s: pd.Series) -> pd.Series:
    return _fromwkb_series(s, False)


def s2_geogfromwkb(wkb) -> Column:
    """WKB -> GEOGRAPHY (lon/lat, spherical edges assumed;
    src/s2_functions_io.cpp:200-273)."""
    return _geogfromwkb_udf(_c(wkb))


def s2_geogfromwkb_novalidate(wkb) -> Column:
    """WKB -> GEOGRAPHY without validation — invalid inputs parse and
    report through s2_is_valid_reason (src/s2_functions_io.cpp:248-273)."""
    return _geogfromwkb_novalidate_udf(_c(wkb))


@F.pandas_udf(BinaryType())
def _aswkb_udf(s: pd.Series) -> pd.Series:
    from ..geo.geography import to_wkb

    s = U.coerce_geog(s)
    return pd.Series(
        [to_wkb(U.decode_cached(bytes(b))) if b is not None else None for b in s],
        dtype=object,
    )


def s2_aswkb(geog) -> Column:
    """GEOGRAPHY -> ISO WKB (src/s2_functions_io.cpp:276-318)."""
    return _aswkb_udf(_c(geog))


#: below this many encoded bytes s2_prepare is a passthrough
PREPARE_THRESHOLD_BYTES = 64


@F.pandas_udf(BinaryType())
def _prepare_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    out = []
    for b in s:
        if b is None:
            out.append(None)
            continue
        raw = bytes(b)
        if len(raw) < PREPARE_THRESHOLD_BYTES or raw[0] == KIND_PREPARED:
            out.append(raw)  # passthrough, same rule as the reference
            continue
        g = U.decode_cached(raw)
        prepared = Geography(KIND_PREPARED, geoms=[g], prepared_size=len(raw))
        out.append(prepared.encode())
    return pd.Series(out, dtype=object)


@F.pandas_udf(BinaryType())
def _unprepare_udf(s: pd.Series) -> pd.Series:
    out = []
    for b in s:
        if b is None:
            out.append(None)
            continue
        raw = bytes(b)
        if not raw or raw[0] != KIND_PREPARED:
            out.append(raw)  # already plain
            continue
        g = U.decode_cached(raw)
        # the prepared payload embeds the original geometry; re-encode
        # it to recover the plain tagged form
        out.append(g.geoms[0].encode() if g.geoms else raw)
    return pd.Series(out, dtype=object)


def s2_unprepare(geog) -> Column:
    """Inverse of :func:`s2_prepare`: recover the plain tagged
    encoding from a PREPARED value (passthrough for anything else).
    Lets a join ship ONLY the prepared bytes in a broadcast and
    restore plain geographies on the output side — the prepared
    payload already embeds the original geometry, so nothing is
    transferred twice."""
    return _unprepare_udf(_c(geog))


def s2_prepare(geog) -> Column:
    """Prepare a geography for repeated predicate probes.

    Like the reference's serialized S2ShapeIndex
    (src/s2_functions_io.cpp:321-386, 64-byte threshold at :373-379),
    the PREPARED encoding carries a serialized probe index — the
    precomputed unit-vector shapes, ring orientations, and bounding
    caps (geo/geography.py::_encode_prepared_index) — so decoding on
    an executor restores a probe-ready value with no re-validation or
    re-indexing. Combined with the executor LRU over encoded bytes
    (functions/geoudfs.py), a broadcast prepared geography is decoded
    and indexed once per worker and then probed at memoized-index
    speed.
    """
    return _prepare_udf(_c(geog))
