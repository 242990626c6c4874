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
