"""Web-corpus URL operators: host/path extraction, tracking-param
normalization, naive registered-domain, and per-host rollups — the
curation layer every CommonCrawl-style pipeline runs before text
filters (URL dedup, host-level quality aggregation, domain blocklists).

All pure Column (regex + string expressions — zero Python, scan-speed
at any scale). Every regex here sticks to the common subset of Java
regex (Spark) and RE2 (DuckDB): character classes, anchors,
non-capturing groups — no lookaround, no backreferences — so the
driver oracle can replay the exact semantics in SQL.

``registered_domain`` is deliberately naive (last two labels): a real
pipeline needs the Public Suffix List (co.uk, com.au, ...); shipping a
snapshot of that list is a data problem, not an operator problem, and
the operator's shape (pure-Column label math) is unchanged by it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_scheme",
    "url_host",
    "url_path",
    "url_query",
    "normalize_url",
    "registered_domain",
    "host_stats",
]

#: scheme://[userinfo@]host[:port] — host is everything before the
#: first /, ?, or # and after an optional userinfo@
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*):"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: tracking params dropped by normalize_url
_TRACKING_RE = r"(?:^|&)(?:utm_[^=&]*|fbclid|gclid)=[^&]*"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url) -> Column:
    """Lower-cased URI scheme ('' for scheme-less strings)."""
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def url_host(url) -> Column:
    """Lower-cased host with userinfo and any ``:port`` stripped
    ('' when the string has no ``scheme://host`` shape)."""
    host = F.lower(F.regexp_extract(_c(url), _HOST_RE, 1))
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_path(url) -> Column:
    """Raw path component ('' when absent; no trailing-slash policy —
    that's :func:`normalize_url`'s job)."""
    return F.regexp_extract(_c(url), _PATH_RE, 1)


def url_query(url) -> Column:
    """Query string without the '?' ('' when absent; fragment
    excluded). The fragment is stripped FIRST so a '?' that only
    appears inside the fragment ('https://a.com/p#f?x=1') is not
    misread as a query — matching the path regex's [^?#]
    discipline."""
    return F.regexp_extract(
        F.regexp_replace(_c(url), r"#.*$", ""), r"\?(.*)$", 1
    )


def normalize_url(url) -> Column:
    """Canonical URL for dedup keys: lower-cased scheme and host,
    default ports stripped (:80 http / :443 https via
    :func:`url_host`'s port strip — non-default ports are dropped too;
    URL dedup wants host identity, not transport detail), tracking
    params (``utm_*``, ``fbclid``, ``gclid``) removed, trailing path
    slashes collapsed (bare host renders as ``scheme://host/``),
    fragment dropped. Param ORDER is preserved (sorting params is a
    semantic judgement call; callers who want it should split+sort in
    a dedicated step)."""
    u = _c(url)
    scheme = url_scheme(u)
    host = url_host(u)
    path = F.regexp_replace(url_path(u), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_replace(url_query(u), _TRACKING_RE, "")
    q = F.regexp_replace(q, r"^&", "")
    return F.when(
        host == "",
        F.lower(u),  # not URL-shaped: fall back to a case-folded key
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def registered_domain(host) -> Column:
    """Last two dot-labels of a host (``a.b.c.example.com`` ->
    ``example.com``); ``''`` when the host has fewer than two labels
    (no-match regex extract — single-label hosts like ``localhost``
    have no registrable domain). NAIVE — see module docstring re:
    Public Suffix List."""
    h = _c(host)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def host_stats(
    df: DataFrame, url_col: str = "url", quality_col: str | None = None
) -> DataFrame:
    """Per-host corpus rollup: document count, distinct URL paths under
    the host (low path diversity at high volume is the classic
    boilerplate/mirror signal), and the sum of ``quality_col`` in
    exact integer micros when given. The host-keyed groupBy is ONE
    uniformly-hashed shuffle; host skew (a single giant host) is
    bounded because the aggregate state per host is O(distinct
    paths)."""
    host = url_host(F.col(url_col)).alias("host")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(url_path(F.col(url_col))).alias("n_paths"),
    ]
    if quality_col is not None:
        aggs.append(
            F.sum(F.round(F.col(quality_col) * 1_000_000).cast("long")).alias(
                "quality_micro_sum"
            )
        )
    return df.groupBy(host).agg(*aggs)
