"""URL canonicalization: fragment/port/tracking-param/case rules, the
registered-domain fallback, and idempotence (canon(canon(u)) == canon(u))."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc_agent_spark.functions import urls

CASES = [
    (
        "https://WWW.Sub.Example.COM:443/docs/12/view?utm_source=feed&id=12&b=2&a=1#frag",
        "https://sub.example.com/docs/12/view?a=1&b=2&id=12",
        "example.com",
    ),
    ("http://example.com:80/path?gclid=xx&z=9", "http://example.com/path?z=9", "example.com"),
    ("https://Example.Com/", "https://example.com/", "example.com"),
    ("http://Host.Example.com:8080/a/b?x=1", "http://host.example.com:8080/a/b?x=1", "example.com"),
    ("https://example.com", "https://example.com/", "example.com"),
    ("http://www.a.b.c.example.org/deep/?fbclid=1", "http://a.b.c.example.org/deep/", "example.org"),
    ("https://localhost/x", "https://localhost/x", "localhost"),
]


def test_url_canonicalize_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: (r.canon, r.rd)
        for r in df.select(
            "i",
            urls.url_canonicalize(F.col("url")).alias("canon"),
            urls.registered_domain(F.col("url")).alias("rd"),
        ).collect()
    }
    for i, (_, canon, rd) in enumerate(CASES):
        assert got[i] == (canon, rd), (i, got[i])


def test_url_canonicalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "i long, url string"
    )
    once = df.select("i", urls.url_canonicalize(F.col("url")).alias("u"))
    twice = once.select("i", urls.url_canonicalize(F.col("u")).alias("u2"))
    j = once.join(twice, "i")
    assert j.filter(F.col("u") != F.col("u2")).count() == 0
