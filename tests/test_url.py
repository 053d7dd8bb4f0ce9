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


# ---------------------------------------------------------------------------
# PSL registrable domains (functions/psl.py)
# ---------------------------------------------------------------------------

# (host, expected registrable domain) -- drawn from the classes the
# published publicsuffix.org test file exercises: plain TLD (default
# rule), ccSLDs, wildcard rules, exception rules, private section,
# multi-label us locality rules, and the public-suffix-itself /
# single-label fallbacks.
_PSL_CASES = [
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("example.co.uk", "example.co.uk"),
    ("www.example.co.uk", "example.co.uk"),
    ("a.b.co.uk", "b.co.uk"),
    ("b.example.com.au", "example.com.au"),
    # wildcard *.ck: any 2-label suffix is public
    ("foo.ck", "foo.ck"),          # IS a public suffix -> host fallback
    ("bar.foo.ck", "bar.foo.ck"),
    ("x.bar.foo.ck", "bar.foo.ck"),
    # exception !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("x.www.ck", "www.ck"),
    # jp geo wildcards + city exceptions
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("foo.city.kawasaki.jp", "city.kawasaki.jp"),
    ("test.kawasaki.jp", "test.kawasaki.jp"),  # public suffix -> fallback
    ("www.test.kawasaki.jp", "www.test.kawasaki.jp"),
    # normal jp ccSLD unaffected by the wildcards
    ("example.co.jp", "example.co.jp"),
    ("www.example.co.jp", "example.co.jp"),
    # private section
    ("user.github.io", "user.github.io"),
    ("x.user.github.io", "user.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    # 3-label us locality rules
    ("school.k12.ca.us", "school.k12.ca.us"),
    ("www.school.k12.ca.us", "school.k12.ca.us"),
    ("city.ca.us", "city.ca.us"),
    # fallbacks
    ("localhost", "localhost"),
    ("", ""),
    ("com", "com"),
]


def test_psl_registrable_domain_spark(spark):
    from rag_vertex_ai_vector_search_spark.functions.psl import (
        with_registrable_domain,
    )

    df = spark.createDataFrame([(h,) for h, _ in _PSL_CASES], "host string")
    got = {
        r.host: r.domain
        for r in with_registrable_domain(df, "host").collect()
    }
    for host, want in _PSL_CASES:
        assert got[host] == want, (host, got[host], want)


def test_psl_sql_mirror_agrees_with_spark():
    """The generated DuckDB expression and the Spark join implement
    the same algorithm off the same rule snapshot."""
    import duckdb

    from rag_vertex_ai_vector_search_spark.functions.psl import (
        sql_registrable_domain,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(host VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?)", [(h,) for h, _ in _PSL_CASES]
    )
    expr = sql_registrable_domain("t.host")
    got = dict(con.execute(f"SELECT host, {expr} FROM t").fetchall())
    for host, want in _PSL_CASES:
        assert got[host] == want, (host, got[host], want)


def test_psl_case_insensitive_and_uppercase_host(spark):
    from rag_vertex_ai_vector_search_spark.functions.psl import (
        with_registrable_domain,
    )

    df = spark.createDataFrame(
        [("WWW.Example.CO.UK",)], "host string"
    )
    [r] = with_registrable_domain(df, "host").collect()
    assert r.domain == "example.co.uk"


def test_psl_plan_is_broadcast_only(spark):
    """The registrable-domain annotation must add ZERO shuffles: only
    broadcast exchanges (one per candidate level, reused)."""
    from rag_vertex_ai_vector_search_spark.functions.psl import (
        with_registrable_domain,
    )

    df = spark.createDataFrame([("a.b.co.uk",)], "host string")
    plan = with_registrable_domain(df, "host")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re
    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert non_broadcast_exchanges == [], non_broadcast_exchanges


def test_load_psl_file_parses_standard_format(tmp_path):
    from rag_vertex_ai_vector_search_spark.functions.psl import (
        _compile_rules,
        load_psl_file,
    )

    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "com\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "// ===END ICANN DOMAINS===\n"
        "GitHub.IO\n",
        encoding="utf-8",
    )
    rules = load_psl_file(str(dat))
    assert rules == ("com", "co.uk", "*.ck", "!www.ck", "github.io")
    rows, max_k = _compile_rules(rules)
    assert max_k == 2
    by_suffix = {s: (pn, pw, pe) for s, pn, pw, pe in rows}
    assert by_suffix["ck"] == (0, 2, 0)       # wildcard parent
    assert by_suffix["www.ck"] == (0, 0, 1)   # exception
    assert by_suffix["co.uk"] == (2, 0, 0)    # normal
