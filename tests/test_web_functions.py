"""functions/web.py: URL canonicalization + URL-level dedup (the
round-12 queue's RefinedWeb URL-dedup stage)."""

import pytest

from pyspark.sql import functions as F

from reflinkcep_spark.functions import web


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(web.canonical_url("url").alias("c")).collect()
    ]


CASES = [
    # scheme + www + host case + default port + trailing slash + fragment
    ("HTTPS://WWW.News.Example.COM:443/a/b/#top", "news.example.com/a/b"),
    ("http://news.example.com/a/b", "news.example.com/a/b"),
    # tracking params dropped, survivors sorted, '?' dropped when emptied
    ("http://h.io/p?utm_source=x&b=2&a=1", "h.io/p?a=1&b=2"),
    ("http://h.io/p?UTM_SOURCE=x&fbclid=1&ref=feed", "h.io/p"),
    # param order insensitive
    ("h.io/p?b=2&a=1", "h.io/p?a=1&b=2"),
    ("h.io/p?a=1&b=2", "h.io/p?a=1&b=2"),
    # bare host / empty path; :80 stripped; non-default port kept
    ("http://WWW.H.io", "h.io"),
    ("h.io:80/", "h.io"),
    ("h.io:8080/x", "h.io:8080/x"),
    # path case preserved; only ONE leading www. stripped
    ("http://h.io/CaseSensitive", "h.io/CaseSensitive"),
    ("http://www.www.h.io/x", "www.h.io/x"),
    # valueless param kept unless it's a tracking name
    ("h.io/p?flag&a=1", "h.io/p?a=1&flag"),
    ("h.io/p?ref&a=1", "h.io/p?a=1"),
]


def test_canonical_url_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u!r}: {g!r} != {want!r}"


def test_canonical_url_alias_classes_collapse(spark):
    """Every alias of one resource lands on one canonical form."""
    aliases = [
        "http://news.example.com/a/b?id=7",
        "https://news.example.com/a/b?id=7",
        "HTTP://WWW.NEWS.EXAMPLE.COM/a/b?id=7",
        "news.example.com:80/a/b/?id=7",
        "https://news.example.com:443/a/b?id=7&utm_campaign=x#frag",
        "news.example.com/a/b?utm_source=t&id=7",
    ]
    assert set(_canon(spark, aliases)) == {"news.example.com/a/b?id=7"}


def test_domain_of(spark):
    df = spark.createDataFrame(
        [("https://WWW.A.b.Example.com:443/x?q=1#f",), ("a.io/p",)],
        "url string",
    )
    got = [r["d"] for r in df.select(web.domain_of("url").alias("d")).collect()]
    assert got == ["a.b.example.com", "a.io"]


def test_dedup_by_url_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "http://h.io/a?x=1"),
            (2, "HTTPS://WWW.h.io/a/?x=1&utm_source=s"),
            (3, "h.io/a?x=1#frag"),
            (4, "h.io/b"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["canonical_url"]: (r["canonical_doc_id"], r["n_dups"])
        for r in web.dedup_by_url(df).collect()
    }
    assert got == {"h.io/a?x=1": (1, 2), "h.io/b": (4, 0)}


def test_dedup_by_url_plan_is_one_aggregate(spark):
    """The canonicalization must stay a codegen projection: exactly one
    exchange (the group-by), no UDF, no join in the plan."""
    df = spark.createDataFrame([(1, "h.io/a")], "doc_id long, url string")
    plan = web.dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
