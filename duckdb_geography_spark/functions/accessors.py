"""Accessor functions (reference: src/s2_accessors.cpp)."""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, IntegerType, StringType

from ..geo import ops
from ..geo.geography import validation_error
from . import geoudfs as U

__all__ = [
    "s2_isempty",
    "s2_is_valid",
    "s2_is_valid_reason",
    "s2_area",
    "s2_perimeter",
    "s2_length",
    "s2_x",
    "s2_y",
    "s2_dimension",
    "s2_num_points",
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


@F.pandas_udf(BooleanType())
def _isempty_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    # tag-only read: byte 1 flag bit, never decodes the body
    # (reference fast path: src/s2_accessors.cpp:19-49)
    return pd.Series(U.tag_is_empty(s))


def s2_isempty(geog) -> Column:
    """True for empty geographies — decided from the encoded tag byte
    alone, no geometry decode (src/s2_accessors.cpp:21-49)."""
    return _isempty_udf(_c(geog))


@F.pandas_udf(BooleanType())
def _is_valid_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    out = []
    for b in s:
        if b is None:
            out.append(None)
        else:
            out.append(validation_error(U.decode_cached(bytes(b))) is None)
    return pd.Series(out)


def s2_is_valid(geog) -> Column:
    """S2 validity; empties and cell centers short-circuit true
    (src/s2_accessors.cpp:51-98)."""
    return _is_valid_udf(_c(geog))


@F.pandas_udf(StringType())
def _is_valid_reason_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    out = []
    for b in s:
        if b is None:
            out.append(None)
        else:
            out.append(validation_error(U.decode_cached(bytes(b))) or "")
    return pd.Series(out, dtype=object)


def s2_is_valid_reason(geog) -> Column:
    """'' when valid, else the validation message
    (src/s2_accessors.cpp:100-150)."""
    return _is_valid_reason_udf(_c(geog))


def _scalar_udf(fn):
    @F.pandas_udf(DoubleType())
    def _udf(s: pd.Series) -> pd.Series:
        s = U.coerce_geog(s)
        out = []
        for b in s:
            if b is None:
                out.append(None)
            else:
                out.append(fn(U.decode_cached(bytes(b))))
        return U.float_series(out)

    return _udf


_area_udf = _scalar_udf(ops.area)
_perimeter_udf = _scalar_udf(ops.perimeter)
_length_udf = _scalar_udf(ops.length)
# ops.x_coord / y_coord return NaN themselves for non-point input
_x_udf = _scalar_udf(ops.x_coord)
_y_udf = _scalar_udf(ops.y_coord)


def s2_area(geog) -> Column:
    """Spherical area m^2; 0 for dim<2 (src/s2_accessors.cpp:152-208)."""
    return _area_udf(_c(geog))


def s2_perimeter(geog) -> Column:
    """Polygon ring length m (src/s2_accessors.cpp:210-267)."""
    return _perimeter_udf(_c(geog))


def s2_length(geog) -> Column:
    """Polyline length m (src/s2_accessors.cpp:269-323)."""
    return _length_udf(_c(geog))


def s2_x(geog) -> Column:
    """Longitude of a single point, NaN otherwise
    (src/s2_accessors.cpp:325-409)."""
    return _x_udf(_c(geog))


def s2_y(geog) -> Column:
    """Latitude of a single point, NaN otherwise
    (src/s2_accessors.cpp:325-409)."""
    return _y_udf(_c(geog))


@F.pandas_udf(IntegerType())
def _dimension_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    out = []
    for b in s:
        if b is None:
            out.append(None)
        else:
            out.append(U.decode_cached(bytes(b)).dimension())
    return pd.Series(out, dtype="int32")


def s2_dimension(geog) -> Column:
    """0/1/2 by max element dimension; -1 for empty collections
    (src/s2_accessors.cpp:411-472)."""
    return _dimension_udf(_c(geog))


@F.pandas_udf(IntegerType())
def _num_points_udf(s: pd.Series) -> pd.Series:
    s = U.coerce_geog(s)
    out = []
    for b in s:
        if b is None:
            out.append(None)
        else:
            out.append(U.decode_cached(bytes(b)).num_points())
    return pd.Series(out, dtype="int32")


def s2_num_points(geog) -> Column:
    """Vertex count (src/s2_accessors.cpp:474-523)."""
    return _num_points_udf(_c(geog))
