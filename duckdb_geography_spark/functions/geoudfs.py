"""Shared helpers for geography pandas UDFs.

All geography functions move data JVM->Python as Arrow batches of our
binary encoding (SURVEY.md S4.2 #9: the vectorized-execution port).
Decoding to :class:`Geography` objects is the per-row cost; an
executor-local LRU keyed by the encoded bytes amortizes repeated
values — exactly the win the reference gets from ``s2_prepare`` +
prepared-index dispatch (src/s2_functions_io.cpp:321-386,
src/s2_binary_index_ops.cpp:26-50), and what makes the broadcast side
of a spatial join cheap here.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd

from ..geo.geography import Geography


@lru_cache(maxsize=4096)
def decode_cached(buf: bytes) -> Geography:
    return Geography.decode(buf)


@lru_cache(maxsize=4096)
def parts_cached(buf: bytes):
    from ..geo.ops import _Parts

    return _Parts(decode_cached(buf))


def decode_series(s: pd.Series):
    """bytes Series -> list of Geography (None stays None)."""
    return [decode_cached(bytes(b)) if b is not None else None for b in s]


def encode_list(geogs) -> pd.Series:
    return pd.Series([g.encode() if g is not None else None for g in geogs], dtype=object)


def float_series(values) -> pd.Series:
    """Double Series that PRESERVES NaN through Arrow.

    A plain float64 pandas Series turns NaN into SQL NULL at the
    Arrow boundary (nan_as_null); the reference's contract needs real
    NaN (e.g. s2_x of a non-point, accessors.test:104-112). Backing
    the Series with an Arrow array keeps NaN as NaN while None stays
    NULL.
    """
    import pyarrow as pa

    arr = pa.array(list(values), type=pa.float64(), from_pandas=False)
    return pd.Series(pd.arrays.ArrowExtensionArray(arr))


def tag_kind(s: pd.Series) -> np.ndarray:
    """kind byte per row without decoding (tag-only fast path,
    reference: s2_geography_serde.hpp:17-20)."""
    return np.array([b[0] if b is not None else -1 for b in s], dtype=np.int64)


def tag_is_empty(s: pd.Series):
    """Per-row empty flag; NULL in -> NULL out (object array so the
    Nones survive — a bool dtype would coerce them to True)."""
    return np.array(
        [bool(b[1] & 1) if b is not None else None for b in s], dtype=object
    )


def tag_covering(buf: Optional[bytes]) -> np.ndarray:
    """Covering cell ids from the fixed prefix (no geometry decode)."""
    if buf is None:
        return np.empty(0, dtype=np.uint64)
    ncov = int.from_bytes(buf[2:4], "little")
    return np.frombuffer(buf, dtype="<u8", count=ncov, offset=4).astype(np.uint64)
