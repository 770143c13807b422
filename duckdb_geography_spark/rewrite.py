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

Scope: the naive Join may sit ANYWHERE in the plan — under Filters,
Aggregates, Sorts, Projects with expressions, other Joins (the
reference's host planner composes freely, README.md:14-19, and so
does this). The rewrite is plan surgery: the offending Join subtree
is replaced by the covering recipe's analyzed plan wrapped in a
remap Project that republishes the ORIGINAL output names and
exprIds (``AttributeReference.withName/withExprId``), so every
operator above — whatever it is — re-resolves untouched. Mixed
conditions (``ON s2_intersects(a.g, b.g) AND b.type = 'x'``) rewrite
too: the spatial conjunct drives the covering join and the remaining
conjuncts become a post-join Filter (semantics-preserving for the
INNER joins this handles). Conditions that already contain a real
cross-side equality hash-join fine on their own and are left alone.

Still refused loudly (``RewriteUnsupported`` naming the manual
recipe): non-INNER naive joins, ``s2_mayintersect`` as the only
spatial conjunct (a fixed-level covering is a DIFFERENT
approximation — rewriting would change the row set), computed
geography arguments, and both-arguments-same-side shapes.
"""

from __future__ import annotations

import warnings

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
#: never DRIVES a rewrite. As a residual conjunct next to a
#: rewritable predicate it is exact (a plain filter) and survives.
_PREDICATE_NAMES = {
    "s2_intersects": "intersects",
    "s2_contains": "contains",
    "s2_equals": "equals",
}
_DWITHIN_NAMES = {"s2_dwithin", "_dwithin_udf"}
#: detected-but-undriving: refuse loudly instead of rewriting to a
#: different approximation
_UNREWRITABLE_NAMES = {"s2_mayintersect", "_mayintersect_udf"}


class RewriteUnsupported(ValueError):
    """The plan has a naive spatial join the rewriter cannot safely
    restructure; the message names the manual recipe."""


def _df_of(spark, jplan) -> DataFrame:
    # Spark 4 moved Dataset to org.apache.spark.sql.classic; fall back
    # to the 3.x path instead of hard-coupling to one internal class
    # (ADVICE r4). A missing class surfaces as a non-callable
    # JavaPackage -> TypeError.
    jvm = spark._jvm
    for cls in (
        jvm.org.apache.spark.sql.classic.Dataset,
        jvm.org.apache.spark.sql.Dataset,
    ):
        try:
            jdf = cls.ofRows(spark._jsparkSession, jplan)
        except TypeError:
            continue
        return DataFrame(jdf, spark)
    raise RuntimeError(
        "no Dataset.ofRows entry point found in this Spark version"
    )


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _output_attrs(jplan):
    out = jplan.output()
    return [out.apply(i) for i in range(out.size())]


def _output_ids(jplan):
    return {a.exprId().id(): i for i, a in enumerate(_output_attrs(jplan))}


def _conjuncts(expr):
    if expr.getClass().getSimpleName() == "And":
        yield from _conjuncts(expr.left())
        yield from _conjuncts(expr.right())
    else:
        yield expr


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


def _split_condition(join):
    """Classify a join condition. Returns None when the join is not a
    naive spatial join (no spatial-UDF conjunct, or a real cross-side
    equality already makes it a hash join); otherwise
    ``(driving, residuals)`` where ``driving`` is the spatial PythonUDF
    conjunct the covering recipe will express (None when only
    unrewritable spatial conjuncts exist) and ``residuals`` are the
    remaining conjuncts to re-apply as a post-join Filter."""
    conjs = list(_conjuncts(join.condition().get()))
    lout, rout = join.left().outputSet(), join.right().outputSet()
    for c in conjs:
        if c.getClass().getSimpleName() not in ("EqualTo", "EqualNullSafe"):
            continue
        ar, br = c.left().references(), c.right().references()
        if (
            not ar.intersect(lout).isEmpty() and not br.intersect(rout).isEmpty()
        ) or (
            not ar.intersect(rout).isEmpty() and not br.intersect(lout).isEmpty()
        ):
            # a real equi-join key: Spark hash-joins, the spatial
            # predicate is just a residual filter — scalable already
            return None
    names = {}
    for c in conjs:
        # py4j proxies "have" every attribute — gate on the class
        # before calling .name(), or non-UDF conditions throw
        if c.getClass().getSimpleName() == "PythonUDF":
            names[c] = c.name()
    spatial = {
        c: nm
        for c, nm in names.items()
        if nm in _PREDICATE_NAMES or nm in _DWITHIN_NAMES or nm in _UNREWRITABLE_NAMES
    }
    if not spatial:
        return None
    driving = next(
        (c for c, nm in spatial.items() if nm not in _UNREWRITABLE_NAMES), None
    )
    residuals = [c for c in conjs if c is not driving]
    return driving, residuals


def _find_naive_join(node, path=()):
    """DFS for the topmost naive spatial join. Returns
    ``(join, ancestors, split)`` where ancestors is the root-to-parent
    list of ``(node, child_index)`` pairs, or None."""
    if (
        node.getClass().getSimpleName() == "Join"
        and node.condition().isDefined()
        and not any(
            ch.getClass().getSimpleName() == "ResolvedHint" for ch in _children(node)
        )  # explicit broadcast: the intentional NL recipe
    ):
        split = _split_condition(node)
        if split is not None:
            return node, list(path), split
    for i, ch in enumerate(_children(node)):
        hit = _find_naive_join(ch, path + ((node, i),))
        if hit is not None:
            return hit
    return None


def _fold_and(spark, exprs):
    jvm = spark._jvm
    out = exprs[0]
    for e in exprs[1:]:
        out = jvm.org.apache.spark.sql.catalyst.expressions.And(out, e)
    return out


def _rewrite_one(spark, root, join, ancestors, driving, residuals, level, warn):
    """Replace ``join`` (at ``ancestors`` below ``root``) with the
    covering recipe + residual Filter + exprId-remap Project; return
    the rebuilt root plan."""
    jvm = spark._jvm
    toSeq = jvm.PythonUtils.toSeq
    join_type = join.joinType().toString()
    if join_type != "Inner":
        raise RewriteUnsupported(
            f"naive spatial join has type {join_type!r}; only INNER "
            "joins rewrite to the covering recipe (an outer/semi/anti "
            "rewrite would change the row set) — restructure around "
            "joins.spatial_join's inner result"
        )
    if driving is None:
        raise RewriteUnsupported(
            "s2_mayintersect join conditions are not rewritten: the "
            "adaptive-covering test and a fixed-level covering overlap "
            "are different approximations, so the rewrite would change "
            "the row set. Use joins.covering_join(predicate="
            "'mayintersect') explicitly if the fixed-level form is "
            "acceptable."
        )
    name = driving.name()
    args = _children(driving)
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
        # i0/i1 are already indices WITHIN each argument's own side;
        # swapping the sides moves the args with them, so the indices
        # stay put
        swapped = True
    else:
        swapped = False
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
            stacklevel=3,
        )
    new_plan = out._jdf.queryExecution().analyzed()
    new_attrs = _output_attrs(new_plan)
    old_attrs = _output_attrs(join)  # inner join: left.output ++ right.output
    n_left, n_right = len(left_df.columns), len(right_df.columns)
    if len(new_attrs) != n_left + n_right or len(old_attrs) != n_left + n_right:
        raise RewriteUnsupported(
            "covering recipe changed the join arity — cannot remap "
            "columns positionally"
        )
    # covering_join emits left columns then right columns in INPUT
    # order (right renamed only on collision), so positions map 1:1.
    # If the condition's sides were swapped to normalize the predicate,
    # the new plan's left block corresponds to the OLD right block.
    if swapped:
        order = list(range(n_left, n_left + n_right)) + list(range(n_left))
    else:
        order = list(range(n_left + n_right))
    # remap Project: republish the rewritten plan's columns under the
    # ORIGINAL names and exprIds so every ancestor re-resolves as-is.
    # A projectList AttributeReference is a *reference*, so changed
    # ids need a real Alias(child)(exprId=old) definition; unchanged
    # ids pass through as-is.
    AliasCls = jvm.org.apache.spark.sql.catalyst.expressions.Alias
    none = jvm.scala.Option.apply(None)
    empty = toSeq([])
    remap = []
    for new_pos, old in zip(order, old_attrs):
        na = new_attrs[new_pos]
        if na.exprId().id() == old.exprId().id() and na.name() == old.name():
            remap.append(na)
        else:
            remap.append(
                AliasCls(na, old.name(), old.exprId(), empty, none, empty)
            )
    cur = jvm.org.apache.spark.sql.catalyst.plans.logical.Project(
        toSeq(remap), new_plan
    )
    if residuals:
        # residual conjuncts (single-side equalities, extra spatial
        # predicates, arbitrary boolean exprs) reference only join
        # output attrs — all republished by the remap Project, so the
        # ORIGINAL expression objects re-resolve unchanged. For INNER
        # joins, condition-conjunct -> post-join Filter is exact
        # (NULL and false both drop the row in both positions).
        cur = jvm.org.apache.spark.sql.catalyst.plans.logical.Filter(
            _fold_and(spark, residuals), cur
        )
    for anc, child_idx in reversed(ancestors):
        kids = _children(anc)
        cur = anc.withNewChildren(toSeq(kids[:child_idx] + [cur] + kids[child_idx + 1 :]))
    return cur


def rewrite_spatial_joins(
    df: DataFrame, level: int = 8, warn: bool = True
) -> DataFrame:
    """Rewrite every naive geography-predicate join in ``df``'s plan
    into the covering equi-join recipe; return ``df`` unchanged when
    no naive join is present.

    The rewritten plan computes the SAME rows (covering prefilter +
    exact refine is semantics-preserving for
    intersects/contains/equals/dwithin) with the same column names,
    order, and exprIds — operators above the join (filters,
    aggregates, sorts, projections, further joins) are reattached
    verbatim. ``level`` is the fixed covering level passed to
    :func:`~duckdb_geography_spark.joins.covering_join`. Only INNER
    joins are rewritten; explicitly-broadcast joins (the intentional
    NL recipe) are left untouched.

    Raises :class:`RewriteUnsupported` when a naive join exists but
    cannot be safely restructured — non-inner join types,
    ``s2_mayintersect``-only conditions (the fixed-level covering is a
    DIFFERENT approximation, so rewriting would change the row set),
    computed geography arguments — the caller should build the query
    with :func:`~duckdb_geography_spark.joins.spatial_join` /
    ``covering_join(predicate="mayintersect")`` directly.
    """
    spark = df.sparkSession
    out = df
    for _ in range(10):  # several naive joins rewrite one per pass
        analyzed = out._jdf.queryExecution().analyzed()
        hit = _find_naive_join(analyzed)
        if hit is None:
            return out
        join, ancestors, (driving, residuals) = hit
        rebuilt = _rewrite_one(
            spark, analyzed, join, ancestors, driving, residuals, level, warn
        )
        out = _df_of(spark, rebuilt)
    # Pass cap reached: never hand back a plan that still carries a
    # naive (cartesian NL) spatial join without saying so.
    if _find_naive_join(out._jdf.queryExecution().analyzed()) is not None:
        raise RewriteUnsupported(
            "plan still contains a naive spatial join after 10 rewrite "
            "passes (more than 10 naive joins in one query?) — split the "
            "query, or build the joins directly with "
            "duckdb_geography_spark.joins.spatial_join/covering_join"
        )
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
