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


def test_url_canonicalize_randomized_parity_and_idempotence(spark):
    """200 seeded messy URLs: Spark canon == DuckDB mirror canon, and
    canon is a fixpoint (canon(canon(u)) == canon(u)) on every one."""
    import random

    import duckdb

    rng = random.Random(42)
    hosts = ["Example.COM", "www.Sub.Example.org", "API.test.example.NET", "localhost"]
    params = ["a=1", "b=2", "utm_source=x", "gclid=y", "id=9", "z=0", "fbclid=f"]
    urls_list = []
    for i in range(200):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/a", "/a/b", "/a/b/"])
        q = rng.sample(params, rng.randint(0, 4))
        frag = rng.choice(["", "#x", "#sec/2"])
        u = f"{scheme}://{host}{port}{path}"
        if q:
            u += "?" + "&".join(q)
        u += frag
        urls_list.append((i, u))

    df = spark.createDataFrame(urls_list, "i long, url string")
    once = df.select("i", urls.url_canonicalize(F.col("url")).alias("c1"))
    twice = once.select("i", "c1", urls.url_canonicalize(F.col("c1")).alias("c2"))
    rows = {r.i: (r.c1, r.c2) for r in twice.collect()}
    assert all(c1 == c2 for c1, c2 in rows.values())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{u}')" for i, u in urls_list)
        + ") v(i, url)"
    )
    orows = dict(
        con.execute(
            f"SELECT i, {urls.url_canonicalize_sql('url')} FROM t"
        ).fetchall()
    )
    assert all(rows[i][0] == orows[i] for i in orows)
