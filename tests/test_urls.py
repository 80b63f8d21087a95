"""URL canonicalization + filtering (functions/urls.py) — hand
goldens for each rewrite rule and the first-failing-reason policy."""

from pyspark.sql import functions as F

from icicle_spark.functions.urls import (
    canonicalize_url,
    registered_domain,
    url_filter,
    url_host,
)

CASES = [
    # (raw, canonical)
    (
        "HTTPS://WWW.Example.COM:443/Articles/A/7?utm_source=f&utm_campaign=x#frag",
        "https://example.com/Articles/A/7",
    ),
    ("http://blog.example.org/post/9?id=7&gclid=a&ref=t", "http://blog.example.org/post/9?id=7"),
    ("http://News.Site.net:80/read/3/", "http://news.site.net/read/3"),
    ("https://example.com/a/b/4/?ref=tw&keep=1", "https://example.com/a/b/4/?keep=1"),
    ("https://example.com/", "https://example.com"),
    # non-default port survives; path case survives
    ("https://Example.com:8443/KeepCase", "https://example.com:8443/KeepCase"),
    # utm mid-query: separator collapse keeps the real param
    ("https://a.io/x?utm_a=1&q=2", "https://a.io/x?q=2"),
    # no scheme: prefix rules no-op, tail rules still apply
    ("plain/text/path/#frag", "plain/text/path"),
]


def test_canonicalize_url_goldens(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://a.b.Example.COM:8080/x", "a.b.example.com", "example.com"),
            ("http://www.example.org/", "example.org", "example.org"),
            ("http://user:pw@Secret.Example.net/x", "secret.example.net", "example.net"),
            ("https://localhost/x", "localhost", "localhost"),
        ],
        "url string, want_host string, want_dom string",
    )
    rows = df.select(
        "want_host",
        "want_dom",
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()
    for r in rows:
        assert r["h"] == r["want_host"]
        assert r["d"] == r["want_dom"]


def test_url_filter_policy_order(spark):
    df = spark.createDataFrame(
        [
            (0, "https://spam-casino.biz/win/1"),  # domain AND pattern -> domain first
            (1, "https://fine.example.com/win/2"),  # pattern only
            (2, "https://fine.example.com/ok/3?x=" + "z" * 300),  # too_long
            (3, "https://fine.example.com/ok/4"),  # kept
        ],
        "doc_id int, url string",
    )
    out = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in url_filter(
            df,
            blocked_domains=["spam-casino.biz"],
            blocked_patterns=[r"/win/"],
            max_len=100,
        ).collect()
    }
    assert out[0] == (False, "blocked_domain")
    assert out[1] == (False, "blocked_pattern")
    assert out[2] == (False, "too_long")
    assert out[3] == (True, None)


def test_url_filter_blocklist_dataframe_broadcast(spark):
    docs = spark.createDataFrame(
        [(0, "https://bad.example.net/a"), (1, "https://good.example.io/a")],
        "doc_id int, url string",
    )
    bl = spark.createDataFrame([("example.net",)], "domain string")
    out = url_filter(docs, blocked_domains=bl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert got == {0: False, 1: True}


def test_canonicalize_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a
    structured URL grid (scheme x www x port x path x params x
    fragment) — the re-crawl/re-ingest invariant."""
    import itertools

    urls = [
        f"{scheme}{www}Host{i}.Example.ORG{port}{path}{params}{frag}"
        for i, (scheme, www, port, path, params, frag) in enumerate(
            itertools.product(
                ["https://", "HTTP://"],
                ["www.", ""],
                [":443", ":80", ":8080", ""],
                ["/A/b/", "/x", ""],
                ["?utm_q=1&id=2", "?ref=a", "?id=3&fbclid=z", ""],
                ["#Frag", ""],
            )
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], f"not idempotent: {r['url']!r} -> {r['c1']!r} -> {r['c2']!r}"
