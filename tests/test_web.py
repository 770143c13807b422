"""URL operators: extraction/normalization edge cases + host rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_geography_spark.llm import web as W


def _one(spark, url, col):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(col("url").alias("v"))
        .first()["v"]
    )


def test_host_userinfo_port_case(spark):
    u = "HTTPS://Alice:pw@WWW.News.ExAmple.COM:443/A/B?x=1#f"
    assert _one(spark, u, W.url_host) == "www.news.example.com"
    assert _one(spark, u, W.url_scheme) == "https"
    assert _one(spark, u, W.url_path) == "/A/B"
    assert _one(spark, u, W.url_query) == "x=1"


def test_normalize_branches(spark):
    cases = {
        # tracking-only query drops the '?', trailing slashes collapse
        "http://A.com/x///?utm_source=a&utm_medium=b#frag": "http://a.com/x",
        # bare host renders as scheme://host/
        "https://Example.COM": "https://example.com/",
        # kept params preserve order; fbclid/gclid dropped mid-string
        "https://a.com/p?id=2&fbclid=zz&b=3": "https://a.com/p?id=2&b=3",
        # non-URL strings fall back to a case-folded key
        "Not A Url": "not a url",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, W.normalize_url) == want, raw


def test_registered_domain(spark):
    assert _one(spark, "https://a.b.c.example.com/x", lambda c: W.registered_domain(W.url_host(c))) == "example.com"
    # single-label host has no registrable pair
    assert _one(spark, "https://localhost/x", lambda c: W.registered_domain(W.url_host(c))) == ""


def test_ipv6_bracket_host(spark):
    assert _one(spark, "http://[::1]:8080/x", W.url_host) == "[::1]"


def test_host_stats_rollup(spark):
    rows = [
        ("https://a.example.com/1", 0.5),
        ("https://A.example.com:443/2", 0.25),
        ("https://a.example.com/2?x=1", 0.25),  # same path, new query
        ("https://b.other.org/3", 1.0),
    ]
    df = spark.createDataFrame(rows, "url string, q double")
    out = {
        r["host"]: r
        for r in W.host_stats(df, url_col="url", quality_col="q").collect()
    }
    assert out["a.example.com"]["n_docs"] == 3
    assert out["a.example.com"]["n_paths"] == 2  # /1 and /2
    assert out["a.example.com"]["quality_micro_sum"] == 1_000_000
    assert out["b.other.org"]["n_docs"] == 1


def test_pure_column_no_python_stage(spark):
    df = spark.createDataFrame([("https://a.com/x?utm_a=1",)], "url string").select(
        W.normalize_url("url"), W.url_host("url"), W.registered_domain(W.url_host("url"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_normalize_idempotent_on_random_urls(spark):
    """normalize(normalize(u)) == normalize(u) over a randomized URL
    soup (schemes, userinfo, ports, paths, params, fragments)."""
    import random

    rnd = random.Random(17)
    urls = []
    for _ in range(120):
        scheme = rnd.choice(["http", "HTTPS", "ftp", "hTTp"])
        user = rnd.choice(["", "u@", "a:b@"])
        host = rnd.choice(["Example.COM", "a.b.Example.org", "localhost", "[::1]"])
        port = rnd.choice(["", ":80", ":443", ":8080"])
        path = rnd.choice(["", "/", "/A/b", "/x//", "/x/y/z///"])
        q = rnd.choice(["", "?id=1", "?utm_a=1", "?utm_a=1&id=2", "?id=2&gclid=x&b=3"])
        frag = rnd.choice(["", "#f", "#Frag"])
        urls.append(f"{scheme}://{user}{host}{port}{path}{q}{frag}")
    urls += ["no url", "", "weird:thing", "//missing-scheme.com/x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = W.normalize_url("url").alias("n1")
    rows = df.select("url", once).select(
        "url", "n1", W.normalize_url("n1").alias("n2")
    ).collect()
    for r in rows:
        assert r["n1"] == r["n2"], r["url"]
