"""URL canonicalization (functions/url.py): hand-built URLs with known
canonical forms."""

from pyspark.sql import functions as F  # noqa: F401

from rag_vertex_ai_vector_search_spark.functions.url import (
    normalize_url,
    url_domain,
    url_host,
    url_query_param_count,
)


def _one(spark, expr, url):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(expr.alias("v"))
        .collect()[0]
        .v
    )


def test_normalize_lowercases_scheme_host_only(spark):
    u = "HTTPS://WWW.Example.COM/Path/File?Q=Mixed"
    assert _one(spark, normalize_url("u"), u) == (
        "https://www.example.com/Path/File?Q=Mixed"
    )


def test_normalize_strips_default_port_fragment_tracking(spark):
    u = ("http://Example.com:80/a?utm_source=tw&id=7&utm_campaign=x"
         "&fbclid=abc#section-2")
    assert _one(spark, normalize_url("u"), u) == "http://example.com/a?id=7"
    # https default port; all params tracking -> dangling '?' dropped
    u2 = "https://site.org:443/p?utm_medium=m&gclid=g#f"
    assert _one(spark, normalize_url("u"), u2) == "https://site.org/p"
    # NON-default port survives
    u3 = "http://example.com:8080/a"
    assert _one(spark, normalize_url("u"), u3) == "http://example.com:8080/a"


def test_host_and_domain(spark):
    u = "https://USER:pw@Sub.News.Example.COM:8443/x"
    assert _one(spark, url_host("u"), u) == "sub.news.example.com"
    assert _one(spark, url_domain("u"), u) == "example.com"
    # single-label host falls back to itself
    assert _one(spark, url_domain("u"), "http://localhost/a") == "localhost"
    # non-URL text parses to empty host
    assert _one(spark, url_host("u"), "not a url") == ""


def test_query_param_count_excludes_tracking(spark):
    u = "https://e.com/?a=1&utm_source=x&b=2&msclkid=z"
    assert _one(spark, url_query_param_count("u"), u) == 2
    assert _one(spark, url_query_param_count("u"), "https://e.com/p") == 0
