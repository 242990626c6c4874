"""URL normalization/filtering (functions/url.py)."""

from pyspark.sql import functions as F

from vechord_spark.functions.url import (
    filter_urls,
    normalize_url,
    url_domain,
    url_host,
)


def _apply(spark, fn, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.out for r in df.select(fn("url").alias("out")).collect()]


def test_normalize_url(spark):
    got = _apply(spark, normalize_url, [
        "HTTP://Example.COM:80/Path/?utm_source=x&q=1#frag",
        "https://a.example:443/",
        "https://a.example/page?utm_campaign=c&utm_medium=m",
        "https://a.example/page?q=1&fbclid=abc&r=2",
    ])
    assert got[0] == "http://example.com/Path?q=1"
    assert got[1] == "https://a.example"
    assert got[2] == "https://a.example/page"
    assert got[3] == "https://a.example/page?q=1&r=2"


def test_host_and_domain(spark):
    assert _apply(spark, url_host, [
        "https://USER:pw@Sub.Example.COM:8443/x",
        "http://localhost/x",
    ]) == ["sub.example.com", "localhost"]
    assert _apply(spark, url_domain, [
        "https://news.bbc.co.uk/story",
        "https://a.b.example.com/",
        "http://example.com/",
        "http://localhost/",
    ]) == ["bbc.co.uk", "example.com", "example.com", "localhost"]


def test_filter_urls(spark):
    df = spark.createDataFrame(
        [
            ("https://good.example/a",),
            ("ftp://files.example/b",),
            ("javascript:alert(1)",),
            ("https://spam.badsite.example/c",),
        ],
        "url string",
    )
    kept = [
        r.url
        for r in filter_urls(
            df, "url", blocked_domains=["badsite.example"]
        ).collect()
    ]
    assert kept == ["https://good.example/a"]


def test_normalized_url_as_dedup_key(spark):
    """The point of normalization: same page, different crawl-time
    decorations -> ONE fingerprint."""
    df = spark.createDataFrame(
        [
            (1, "https://A.example/page?utm_source=feed"),
            (2, "https://a.example/page"),
            (3, "https://a.example/other"),
        ],
        "id long, url string",
    )
    n = (
        df.select(F.md5(normalize_url("url")).alias("fp"))
        .distinct()
        .count()
    )
    assert n == 2


def test_normalize_idempotent_random(spark):
    """normalize(normalize(u)) == normalize(u) — the dedup-key property:
    a normalized URL re-entering the pipeline must not change again."""
    import random

    rng = random.Random(9)
    schemes = ["http", "https", "HTTP", "HtTpS"]
    hosts = ["Example.com", "a.b.co.uk", "X9.example", "localhost"]
    paths = ["", "/", "/A/b", "/p/"]
    queries = ["", "?q=1", "?utm_source=x", "?utm_source=x&q=2", "?a=1&fbclid=z&b=2"]
    frags = ["", "#top", "#a/b"]
    ports = ["", ":80", ":443", ":8080"]
    urls = [
        f"{rng.choice(schemes)}://{rng.choice(hosts)}{rng.choice(ports)}"
        f"{rng.choice(paths)}{rng.choice(queries)}{rng.choice(frags)}"
        for _ in range(120)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url("url").alias("n1"))
    twice = once.select(F.col("n1"), normalize_url("n1").alias("n2"))
    bad = twice.filter(F.col("n1") != F.col("n2")).collect()
    assert not bad, bad[:5]


def test_normalize_schemeless_passthrough(spark):
    """Scheme-less / malformed URLs fall back to the trimmed input —
    they must NOT all collapse onto the '' fingerprint (that would make
    drop_exact_duplicates keep one junk row and silently discard the
    rest)."""
    got = _apply(spark, normalize_url, [
        "  example.com/page  ",
        "not a url at all",
        "://missing-scheme",
        "https://ok.example/page",
    ])
    assert got[0] == "example.com/page"
    assert got[1] == "not a url at all"
    assert got[2] == "://missing-scheme"
    assert got[3] == "https://ok.example/page"
    # distinct junk inputs keep distinct fingerprints
    assert len(set(got)) == 4
