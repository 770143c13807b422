"""Fluent dot-chain sugar — the reference's method-call style on
Columns.

DuckDB lets any scalar call chain as a method:
``geog.s2_aswkb().s2_cellfromwkb()`` (test/sql/geography/
cell_ops.test:95-97). Spark Columns have no user-method registry, so
:class:`GeoCol` wraps a Column and resolves ``s2_*`` attribute access
against the function modules, re-wrapping Column results so chains
keep flowing:

    from duckdb_geography_spark.fluent import geo
    df.select(
        geo(wkt_col).s2_geogfromtext_col()  # or build from a helper
    )
    df.select(
        geo(s2_geogfromtext(F.lit("POINT (-64 45)")))
        .s2_aswkb()
        .s2_cellfromwkb()
        .s2_cell_debug_string()
        .alias("dbg")
    )

Unknown attributes fall through to the wrapped Column (``.alias``,
``.cast``, operators), ending the chain with a plain Column —
exactly where a select list needs one. GeoCol arguments to chained
calls unwrap automatically (``a.s2_intersects(b)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .functions import accessors as _accessors
from .functions import bounds as _bounds
from .functions import casts as _casts
from .functions import cells as _cells
from .functions import io as _io
from .functions import predicates as _predicates

__all__ = ["GeoCol", "geo"]

#: resolution order for s2_* method names (first match wins)
_SOURCES = (_io, _accessors, _predicates, _bounds, _cells, _casts)


class GeoCol:
    """A Column wrapper whose ``s2_*`` methods are the package's
    functions with ``self`` as the first argument, returning GeoCol
    for Column results so calls chain like the reference's SQL."""

    __slots__ = ("_col",)

    def __init__(self, col):
        if isinstance(col, GeoCol):
            col = col._col  # geo(geo(x)) must not double-wrap
        self._col = F.col(col) if isinstance(col, str) else col

    @property
    def col(self) -> Column:
        """The wrapped Column (explicit exit from the fluent chain)."""
        return self._col

    def __getattr__(self, name: str):
        if name.startswith("s2_") or name == "s2":
            for mod in _SOURCES:
                fn = getattr(mod, name, None)
                if callable(fn):

                    def _call(*args, _fn=fn, **kwargs):
                        args = tuple(
                            a._col if isinstance(a, GeoCol) else a for a in args
                        )
                        kwargs = {
                            k: (v._col if isinstance(v, GeoCol) else v)
                            for k, v in kwargs.items()
                        }
                        out = _fn(self._col, *args, **kwargs)
                        return GeoCol(out) if isinstance(out, Column) else out

                    _call.__name__ = name
                    return _call
            raise AttributeError(f"no s2 function named {name!r}")
        # fall through to the Column API: .alias/.cast end the chain
        # with a plain Column
        return getattr(self._col, name)

    def __repr__(self) -> str:
        return f"GeoCol({self._col!r})"


def _fwd(dunder: str):
    """Operator forwarding: Python looks special methods up on the
    CLASS, bypassing ``__getattr__``, so every operator the docstring
    promises needs an explicit stub. Results are plain Columns (an
    operator is where a fluent chain meets a select/filter list)."""

    def _op(self, *args):
        args = tuple(a._col if isinstance(a, GeoCol) else a for a in args)
        return getattr(self._col, dunder)(*args)

    _op.__name__ = dunder
    return _op


for _d in (
    "__eq__", "__ne__", "__lt__", "__le__", "__gt__", "__ge__",
    "__add__", "__radd__", "__sub__", "__rsub__", "__mul__", "__rmul__",
    "__truediv__", "__rtruediv__", "__mod__", "__rmod__",
    "__and__", "__rand__", "__or__", "__ror__",
    "__invert__", "__neg__", "__getitem__",
):
    setattr(GeoCol, _d, _fwd(_d))
del _d


def geo(col) -> GeoCol:
    """Wrap a Column (or column name) for fluent ``s2_*`` chaining."""
    return GeoCol(col)
