"""Outlink extraction + reference resolution: urljoin parity, DuckDB-mirror
parity, and extraction order/shape."""

from __future__ import annotations

from urllib.parse import urljoin

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions import urls

BASES = [
    "https://h.example.com",
    "https://h.example.com/",
    "http://h.example.com/a/",
    "https://h.example.com/a/b/page.html",
    "https://h.example.com/p.html?q=1",
    "https://h.example.com/a/b/c/d/e.html?x=1&y=2",
    "https://h.example.com/a/b/page.html?q=1#old",
]

REFS = [
    "https://abs.example.org/z",
    "//cdn.example.org/l.js",
    "/rooted/x",
    "/r/./s/../t.html",
    "?p=2",
    "#f",
    "x.html",
    "./x.html",
    "../up.html",
    "../../u2.html",
    "../../../u3.html",
    "a/../b.html",
    "d/e/../../f.html",
    "sub/dir/",
    "mailto:someone@example.com",
    "..",
    "../",
    ".",
]


@pytest.fixture(scope="module")
def resolved(spark):
    pairs = [(b, r) for b in BASES for r in REFS]
    df = spark.createDataFrame(pairs, "base string, ref string")
    out = df.select(
        "base", "ref", urls.resolve_url(F.col("base"), F.col("ref")).alias("res")
    ).collect()
    return {(r["base"], r["ref"]): r["res"] for r in out}


def test_resolve_matches_urljoin(resolved):
    mismatches = []
    for (b, r), got in resolved.items():
        want = urljoin(b, r)
        if got != want:
            mismatches.append((b, r, got, want))
    assert not mismatches, mismatches[:10]


def test_resolve_sql_mirror_parity(resolved):
    con = duckdb.connect()
    pairs = pd.DataFrame(
        [(b, r) for b in BASES for r in REFS], columns=["base", "ref"]
    )
    con.register("pairs", pairs)
    q = f"SELECT base, ref, {urls.resolve_url_sql('base', 'ref')} AS res FROM pairs"
    for b, r, res in con.execute(q).fetchall():
        assert res == resolved[(b, r)], (b, r, res, resolved[(b, r)])


def test_extract_hrefs_order_and_forms(spark):
    html = (
        '<a href="/q">quoted</a> text <a href=\'/s\'>single</a>'
        "<a href=/bare>bare</a><a href=\"../rel/p.html\">rel</a>"
        '<img src="/not-a-link.png"><a href="#frag">f</a>'
    )
    row = spark.createDataFrame([(html,)], "html string").select(
        urls.extract_hrefs(F.col("html")).alias("links")
    ).head()
    assert row["links"] == ["/q", "/s", "/bare", "../rel/p.html", "#frag"]


def test_extract_hrefs_sql_mirror(spark):
    html = '<a href="/q">x</a><a href=/bare>y</a><a href=\'../r\'>z</a>'
    row = spark.createDataFrame([(html,)], "html string").select(
        urls.extract_hrefs(F.col("html")).alias("links")
    ).head()
    got = duckdb.connect().execute(
        "SELECT " + urls.extract_hrefs_sql("'" + html.replace("'", "''") + "'")
    ).fetchone()[0]
    assert list(got) == list(row["links"])


def test_outlink_graph_feeds_pagerank(spark):
    """End-to-end: HTML pages → extracted+resolved+canonicalized link graph →
    PageRank — the crawl-prior loop closed on real extraction output."""
    from doc_agent_spark.operators import graphrank

    pages = spark.createDataFrame(
        [
            ("https://a.com/i.html", '<a href="/p1.html">1</a><a href="https://b.com/x">b</a>'),
            ("https://a.com/p1.html", '<a href="i.html">home</a>'),
            ("https://b.com/x", '<a href="//a.com/i.html">a</a>'),
        ],
        "url string, html string",
    )
    edges = (
        pages.select(
            urls.url_canonicalize(F.col("url")).alias("src"),
            F.explode(urls.extract_hrefs(F.col("html"))).alias("ref"),
            F.col("url"),
        )
        .select(
            "src",
            urls.url_canonicalize(
                urls.resolve_url(F.col("url"), F.col("ref"))
            ).alias("dst"),
        )
        .filter(F.col("dst").rlike("^https?://"))
    )
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {
        ("https://a.com/i.html", "https://a.com/p1.html"),
        ("https://a.com/i.html", "https://b.com/x"),
        ("https://a.com/p1.html", "https://a.com/i.html"),
        ("https://b.com/x", "https://a.com/i.html"),
    }
    nodes = edges.select(F.col("src").alias("id")).union(
        edges.select("dst")
    ).distinct()
    ranks = graphrank.pagerank(nodes, edges)
    vals = {r["id"]: r["rank"] for r in ranks.collect()}
    assert len(vals) == 3 and abs(sum(vals.values()) - 1.0) < 1e-6
    # i.html has two in-links, the others one each
    assert vals["https://a.com/i.html"] == max(vals.values())


def test_extract_hrefs_only_anchor_tags(spark):
    html = (
        '<link rel="stylesheet" href="/style.css">'
        '<base href="/base/"><a data-href="/decoy" href="/real">r</a>'
        '<AREA shape=rect href="/map">'
        '<script>var x = "href=/injs";</script>'
        '<a class="x" href=/second>s</a>'
    )
    row = spark.createDataFrame([(html,)], "html string").select(
        urls.extract_hrefs(F.col("html")).alias("links")
    ).head()
    # stylesheet/base/data-href/script text are not crawl targets
    assert row["links"] == ["/real", "/map", "/second"]
    got = duckdb.connect().execute(
        "SELECT " + urls.extract_hrefs_sql("'" + html.replace("'", "''") + "'")
    ).fetchone()[0]
    assert list(got) == ["/real", "/map", "/second"]


def test_query_on_bare_host_canonicalizes_sanely(spark):
    df = spark.createDataFrame(
        [("https://h.example.com?p=2&utm_source=x",)], "url string"
    ).select(
        urls.url_canonicalize(F.col("url")).alias("canon"),
        urls.url_host(F.col("url")).alias("host"),
        urls.url_pathq(F.col("url")).alias("pathq"),
    )
    r = df.head()
    # the query must not leak into the host / dedup keys
    assert r["host"] == "h.example.com"
    assert r["canon"] == "https://h.example.com/?p=2"
    assert r["pathq"] == "?p=2&utm_source=x"   # raw: canon strips tracking, pathq doesn't
    got = duckdb.connect().execute(
        "SELECT " + urls.url_canonicalize_sql("'https://h.example.com?p=2&utm_source=x'")
    ).fetchone()[0]
    assert got == r["canon"]


def test_resolve_url_fuzz_matches_urljoin(spark):
    """Grammar-constrained fuzz: hundreds of (base, ref) pairs through one
    Spark pass, compared to urllib.parse.urljoin byte-for-byte."""
    import itertools
    import random

    rng = random.Random(42)
    segs = ["a", "bb", "c3", "d.e", "x-y"]

    def mk_base():
        host = rng.choice(["h.example.com", "www.H.org:8080"])
        depth = rng.randrange(0, 4)
        path = "".join("/" + rng.choice(segs) for _ in range(depth))
        leaf = rng.choice(["", "/", "/page.html", "/p.php?q=1&r=2"])
        return f"{rng.choice(['http', 'https'])}://{host}{path}{leaf}"

    def mk_ref():
        kind = rng.randrange(0, 7)
        if kind == 0:
            return "https://abs.example.net/" + rng.choice(segs)
        if kind == 1:
            return "//cdn.example.net/" + rng.choice(segs)
        if kind == 2:
            return "/" + "/".join(rng.choice(segs + [".", ".."])
                                  for _ in range(rng.randrange(1, 4)))
        if kind == 3:
            return "?" + rng.choice(["a=1", "z=9&y=8"])
        if kind == 4:
            return "#" + rng.choice(segs)
        parts = [rng.choice(segs + [".", ".."])
                 for _ in range(rng.randrange(1, 5))]
        return "/".join(parts) + rng.choice(["", "/", ".html"])

    pairs = sorted({(mk_base(), mk_ref()) for _ in range(400)})
    df = spark.createDataFrame(pairs, "base string, ref string")
    got = {
        (r["base"], r["ref"]): r["res"]
        for r in df.select(
            "base", "ref",
            urls.resolve_url(F.col("base"), F.col("ref")).alias("res"),
        ).collect()
    }
    bad = [
        (b, r, got[(b, r)], urljoin(b, r))
        for (b, r) in pairs
        if got[(b, r)] != urljoin(b, r)
    ]
    assert not bad, bad[:10]
