"""Auto-rewrite of naive spatial-join plans — the SURVEY §4.3
"auto-rewrite rule", delivered.

The reference's README flagship (README.md:14-19) writes

    SELECT ... FROM a JOIN b ON s2_intersects(a.geog, b.geog)

which Spark executes as an UNCONDITIONED nested-loop/cartesian join
with the predicate pulled into a Python-UDF filter — the one plan
shape that more executors cannot save. :func:`rewrite_spatial_joins`
detects that pattern in an analyzed plan (DataFrame API or
``spark.sql`` output alike), reconstructs the two join inputs, and
returns the SAME relation expressed as
:func:`~duckdb_geography_spark.joins.covering_join` /
:func:`~duckdb_geography_spark.joins.distance_join` — a cell-covering
EQUI-join + exact refine that shuffles, broadcasts, and AQE-replans
like any other hash join.

:func:`sql` wraps ``spark.sql`` with the rewrite applied, so the
reference query is scalable verbatim:

    from duckdb_geography_spark import rewrite
    df = rewrite.sql(spark, "SELECT ... JOIN ... ON s2_intersects(...)")

Scope (explicit, checked, loud): the offending Join must sit at the
plan root or under attribute-only Projects (which is exactly what
``SELECT cols FROM a JOIN b ON pred`` analyzes to). Joins buried
under other operators raise ``RewriteUnsupported`` with the manual
recipe named — a wrong silent rewrite would be worse than the warning.
"""

from __future__ import annotations

import warnings
from typing import Optional

from pyspark.sql import DataFrame

from . import joins as J

__all__ = ["rewrite_spatial_joins", "sql", "RewriteUnsupported"]

#: plan-visible predicate UDF name -> covering_join predicate key.
#: These are SEMANTICS-PRESERVING rewrites: the covering candidates
#: are a superset of the matches and an exact refine recovers the
#: predicate. `mayintersect` is deliberately absent — its adaptive
#: coverings and a fixed-level covering overlap are DIFFERENT
#: approximations, so the rewrite would change the row set; it is
#: detected (so users get a loud refusal, not a silent cartesian) but
#: never rewritten.
_PREDICATE_NAMES = {
    "s2_intersects": "intersects",
    "s2_contains": "contains",
    "s2_equals": "equals",
}
_DWITHIN_NAMES = {"s2_dwithin", "_dwithin_udf"}
#: detected-but-unrewritable: refuse loudly instead of rewriting to a
#: different approximation
_UNREWRITABLE_NAMES = {"s2_mayintersect", "_mayintersect_udf"}


class RewriteUnsupported(ValueError):
    """The plan has a naive spatial join the rewriter cannot safely
    restructure; the message names the manual recipe."""


def _df_of(spark, jplan) -> DataFrame:
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _output_ids(jplan):
    out = jplan.output()
    return {out.apply(i).exprId().id(): i for i in range(out.size())}


def _literal_value(expr):
    """Unwrap Cast chains to a Literal's numeric value, else None.
    SQL literals can surface as Java BigDecimal objects through py4j —
    coerce through str()."""
    node = expr
    for _ in range(4):
        cls = node.getClass().getSimpleName()
        if cls == "Literal":
            v = node.value()
            try:
                return float(str(v))
            except (TypeError, ValueError):
                return None
        kids = _children(node)
        if len(kids) != 1:
            return None
        node = kids[0]
    return None


def _find_naive_join(node, above_ok=True):
    """Return (join_node, projects_above) for the first naive spatial
    join reachable through attribute-only Projects, or None. A join
    deeper in the plan (below filters/aggregates/other joins) returns
    the sentinel string 'deep' so callers can raise loudly instead of
    silently keeping the cartesian plan."""
    cls = node.getClass().getSimpleName()
    if cls == "Join" and node.condition().isDefined():
        cond = node.condition().get()
        # py4j proxies "have" every attribute — gate on the class
        # before calling .name(), or non-UDF conditions throw
        if cond.getClass().getSimpleName() == "PythonUDF":
            name = cond.name()
            hinted = any(
                ch.getClass().getSimpleName() == "ResolvedHint"
                for ch in _children(node)
            )
            if (
                not hinted  # explicit broadcast: the intentional NL recipe
                and (
                    name in _PREDICATE_NAMES
                    or name in _DWITHIN_NAMES
                    or name in _UNREWRITABLE_NAMES
                )
                and " = " not in cond.toString()
            ):
                return node, []
    if cls == "Project" and above_ok:
        exprs = node.projectList()
        only_attrs = all(
            exprs.apply(i).getClass().getSimpleName() == "AttributeReference"
            for i in range(exprs.size())
        )
        hit = _find_naive_join(_children(node)[0], above_ok=only_attrs)
        if isinstance(hit, tuple):
            join, projs = hit
            if not only_attrs:
                return "deep"
            return join, projs + [node]
        return hit
    # anything else: a naive join below it is out of scope
    for ch in _children(node):
        if _find_naive_join(ch, above_ok=False) is not None:
            return "deep"
    return None


def rewrite_spatial_joins(
    df: DataFrame, level: int = 8, warn: bool = True
) -> DataFrame:
    """Rewrite a naive geography-predicate join into the covering
    equi-join recipe; return ``df`` unchanged when no naive join is
    present.

    The rewritten plan computes the SAME rows (covering prefilter +
    exact refine is semantics-preserving for
    intersects/contains/equals/dwithin) with the same column names and
    order. ``level`` is the fixed covering level passed to
    :func:`~duckdb_geography_spark.joins.covering_join`. Only INNER
    joins are rewritten; explicitly-broadcast joins (the intentional
    NL recipe) are left untouched.

    Raises :class:`RewriteUnsupported` when a naive join exists but
    cannot be safely restructured — non-inner join types, joins below
    operators this rewriter does not walk, ``s2_mayintersect``
    conditions (the fixed-level covering is a DIFFERENT approximation,
    so rewriting would change the row set) — the caller should build
    the query with :func:`~duckdb_geography_spark.joins.spatial_join`
    / ``covering_join(predicate="mayintersect")`` directly.
    """
    spark = df.sparkSession
    analyzed = df._jdf.queryExecution().analyzed()
    hit = _find_naive_join(analyzed)
    if hit is None:
        return df
    if hit == "deep":
        raise RewriteUnsupported(
            "a geography-predicate join sits below operators "
            "rewrite_spatial_joins does not restructure; express the "
            "join with duckdb_geography_spark.joins.spatial_join and "
            "apply the remaining operators to its result"
        )
    join, projects = hit
    join_type = join.joinType().toString()
    if join_type != "Inner":
        raise RewriteUnsupported(
            f"naive spatial join has type {join_type!r}; only INNER "
            "joins rewrite to the covering recipe (an outer/semi/anti "
            "rewrite would change the row set) — restructure around "
            "joins.spatial_join's inner result"
        )
    cond = join.condition().get()
    name = cond.name()
    if name in _UNREWRITABLE_NAMES:
        raise RewriteUnsupported(
            "s2_mayintersect join conditions are not rewritten: the "
            "adaptive-covering test and a fixed-level covering overlap "
            "are different approximations, so the rewrite would change "
            "the row set. Use joins.covering_join(predicate="
            "'mayintersect') explicitly if the fixed-level form is "
            "acceptable."
        )
    args = _children(cond)
    left_plan, right_plan = _children(join)
    left_ids, right_ids = _output_ids(left_plan), _output_ids(right_plan)

    def _side_of(attr):
        aid = attr.exprId().id()
        if aid in left_ids:
            return "L", left_ids[aid]
        if aid in right_ids:
            return "R", right_ids[aid]
        raise RewriteUnsupported(
            f"join condition argument {attr.toString()} resolves to "
            "neither join input"
        )

    geo_args = [a for a in args if a.getClass().getSimpleName() == "AttributeReference"]
    if len(geo_args) != 2:
        raise RewriteUnsupported(
            "expected the predicate's geography arguments to be plain "
            "columns; computed arguments need the manual recipe "
            "(joins.spatial_join)"
        )
    (s0, i0), (s1, i1) = _side_of(geo_args[0]), _side_of(geo_args[1])
    if s0 == s1:
        raise RewriteUnsupported(
            "both geography arguments come from the same join side — "
            "not a spatial join shape this rewriter handles"
        )
    left_df, right_df = _df_of(spark, left_plan), _df_of(spark, right_plan)
    # a chained query can nest ANOTHER naive join inside either input
    # (a JOIN b ON pred JOIN c ON pred2) — rewrite children first so
    # no cartesian survives anywhere in the final plan. Attribute
    # positions are preserved (the child rewrite keeps column order),
    # so the index-based column mapping below stays valid.
    left_df = rewrite_spatial_joins(left_df, level=level, warn=False)
    right_df = rewrite_spatial_joins(right_df, level=level, warn=False)
    if s0 == "R":  # normalize: arg0 on the left
        # contains/dwithin are argument-ordered; swapping sides means
        # containment direction flips, which covering_join cannot
        # express by swap alone for 'contains'
        if _PREDICATE_NAMES.get(name) == "contains":
            raise RewriteUnsupported(
                "s2_contains(right.geog, left.geog) argument order "
                "not supported; swap the join inputs or use "
                "joins.spatial_join"
            )
        left_df, right_df = right_df, left_df
        left_ids, right_ids = right_ids, left_ids
        # i0/i1 are already indices WITHIN each argument's own side;
        # swapping the sides moves the args with them, so the indices
        # stay put (exchanging them only worked when both sides had
        # symmetric column counts)
        s0, s1 = "L", "R"
    left_geog = left_df.columns[i0]
    right_geog = right_df.columns[i1]

    if name in _DWITHIN_NAMES:
        dist_expr = [a for a in args if a not in geo_args]
        val = _literal_value(args[2]) if len(args) >= 3 else None
        if val is None and dist_expr:
            val = _literal_value(dist_expr[0])
        if val is None:
            raise RewriteUnsupported(
                "s2_dwithin distance must be a literal for the rewrite"
            )
        out = J.distance_join(
            left_df,
            right_df,
            meters=float(val),
            left_geog=left_geog,
            right_geog=right_geog,
        )
    else:
        out = J.covering_join(
            left_df,
            right_df,
            predicate=_PREDICATE_NAMES[name],
            level=level,
            left_geog=left_geog,
            right_geog=right_geog,
        )
    if warn:
        warnings.warn(
            f"rewrote naive `{name}` join into the covering equi-join "
            f"recipe (level={level}); build with joins.spatial_join to "
            "choose the strategy explicitly",
            J.SpatialJoinLintWarning,
            stacklevel=2,
        )
    # re-apply the attribute-only projections by (side, position):
    # covering_join emits left columns then right columns in input
    # order (right columns renamed only on collision), so positions
    # are stable even when names changed
    n_left = len(left_df.columns)
    for proj in reversed(projects):
        exprs = proj.projectList()
        cols = []
        for i in range(exprs.size()):
            attr = exprs.apply(i)
            aid = attr.exprId().id()
            if aid in left_ids:
                pos = left_ids[aid]
            elif aid in right_ids:
                pos = n_left + right_ids[aid]
            else:
                raise RewriteUnsupported(
                    f"projected column {attr.toString()} is not a join "
                    "input column"
                )
            cols.append(out[out.columns[pos]].alias(attr.name()))
        out = out.select(*cols)
    return out


def sql(spark, query: str, rewrite: bool = True, level: int = 8) -> DataFrame:
    """``spark.sql`` with the naive-spatial-join rewrite applied —
    paste the reference README's JOIN query and get the covering
    equi-join plan. With ``rewrite=False`` just lints and returns the
    raw plan. When the plan contains a naive spatial shape the
    rewriter cannot cover (e.g. a negated predicate condition), the
    lint warning still fires so a cartesian never ships silently."""
    df = spark.sql(query)
    if not rewrite:
        J.lint_spatial_joins(df)
        return df
    out = rewrite_spatial_joins(df, level=level)
    if out is df:
        # nothing rewritten: still surface any lintable footgun (a
        # shape outside the rewriter's detection, e.g. NOT s2_*(...))
        J.lint_spatial_joins(df)
    return out
