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


def test_canonical_url_idempotent_and_alias_invariant(spark):
    """Two properties over 300 seeded random URLs, checked in ONE
    Spark pass each (not per-example — Arrow round-trips dominate
    otherwise):

    * idempotence: canonical(canonical(u)) == canonical(u) — the
      canonical form is a fixed point, so re-canonicalizing an
      already-deduped feed is a no-op;
    * alias invariance: every member of a URL's alias class (scheme
      added/flipped, one www., a default port, trailing slashes, a
      fragment, tracking params injected at random positions, real
      params shuffled) canonicalizes to the base's canonical form.
    """
    import random

    rng = random.Random(20260815)
    hosts = ["example.com", "News.Example.org", "a.b.io", "x-y.net:8080"]
    paths = ["", "/", "/a", "/a/B/c", "/p%20q"]
    params = [[], ["id=7"], ["a=1", "b=2"], ["z=", "flag"]]
    bases = []
    for _ in range(300):
        h = rng.choice(hosts)
        p = rng.choice(paths)
        q = list(rng.choice(params))
        rng.shuffle(q)
        bases.append(h + p + (("?" + "&".join(q)) if q else ""))

    def alias(u):
        q_at = u.find("?")
        pre, q = (u, "") if q_at < 0 else (u[:q_at], u[q_at + 1:])
        qparts = [x for x in q.split("&") if x]
        rng.shuffle(qparts)
        for t in rng.sample(
            ["utm_source=x", "fbclid=abc", "REF=feed"], rng.randint(0, 3)
        ):
            qparts.insert(rng.randint(0, len(qparts)), t)
        host_path = pre
        if ":8080" not in host_path.split("/")[0] and rng.random() < 0.5:
            hp = host_path.split("/", 1)
            hp[0] += rng.choice([":80", ":443"])
            host_path = "/".join(hp)
        if rng.random() < 0.5 and "/" in host_path:
            host_path = host_path.rstrip("/") + "/" * rng.randint(1, 3)
        out = (
            rng.choice(["", "http://", "HTTPS://", "https://"])
            + rng.choice(["", "www.", "WWW."])
            + (host_path[0].upper() + host_path[1:] if rng.random() < 0.5 else host_path)
            + (("?" + "&".join(qparts)) if qparts else "")
            + rng.choice(["", "#frag", "#a#b"])
        )
        return out

    rows = [(i, b, alias(b)) for i, b in enumerate(bases)]
    df = spark.createDataFrame(rows, "i long, base string, aliased string")
    out = df.select(
        "i",
        web.canonical_url("base").alias("c1"),
        web.canonical_url(web.canonical_url("base")).alias("c2"),
        web.canonical_url("aliased").alias("ca"),
    ).collect()
    for r in out:
        assert r["c2"] == r["c1"], (r["i"], r["c1"], r["c2"])
        assert r["ca"] == r["c1"], (r["i"], rows[r["i"]], r["c1"], r["ca"])


def test_dedup_by_url_plan_is_one_aggregate(spark):
    """The canonicalization must stay a codegen projection: exactly one
    exchange (the group-by), no UDF, no join in the plan."""
    df = spark.createDataFrame([(1, "h.io/a")], "doc_id long, url string")
    plan = web.dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
