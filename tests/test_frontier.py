"""Robots.txt parsing, exclusion filtering, politeness scheduling."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from doc_agent_spark.operators import frontier

ROBOTS_A = (
    "# site a\n"
    "User-agent: googlebot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: bing\n"
    "User-agent: *\n"
    "Crawl-delay: 1\n"
    "Disallow: /private/\n"
    "Disallow: /tmp/ # trailing comment\n"
    "Allow: /private/ok.html\n"
    "Disallow:\n"
    "\n"
    "User-agent: other\n"
    "Disallow: /other/\n"
)

ROBOTS_B = (
    "User-agent: googlebot\nDisallow: /g/\n"
)  # no * group at all


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)], "host string, body string"
    )
    return frontier.parse_robots(df)


def test_parse_robots_star_groups_only(spark):
    got = {(r["host"], r["rule"], r["pattern"]) for r in _rules(spark).collect()}
    # shared bing+* group applies; googlebot-only and other-only groups do
    # not; blank Disallow (allow-all) drops; Allow lines are first-class
    # rules (RFC 9309); trailing comments strip
    assert got == {
        ("a.com", "disallow", "/private/"),
        ("a.com", "disallow", "/tmp/"),
        ("a.com", "allow", "/private/ok.html"),
    }


def test_parse_robots_sql_mirror(spark):
    con = duckdb.connect()
    con.register(
        "robots",
        pd.DataFrame({"host": ["a.com", "b.com"], "body": [ROBOTS_A, ROBOTS_B]}),
    )
    got = set(map(tuple, con.execute(frontier.parse_robots_sql("robots")).fetchall()))
    want = {(r["host"], r["rule"], r["pattern"]) for r in _rules(spark).collect()}
    assert got == want


def test_robots_filter_blocks_by_prefix(spark):
    fr = spark.createDataFrame(
        [
            ("https://www.A.com/private/x.html",),   # blocked (host canon)
            ("https://a.com/tmp/y?q=1",),            # blocked
            ("https://a.com/public/z.html",),        # kept
            ("https://a.com/privateer.html",),       # kept (prefix, not substring)
            ("https://b.com/g/anything",),           # kept (no * group)
            ("https://nobody.org/x",),               # kept (no rules at all)
        ],
        "url string",
    )
    out = {r["url"]: r["blocked"] for r in
           frontier.robots_filter(fr, _rules(spark)).collect()}
    assert out == {
        "https://www.A.com/private/x.html": True,
        "https://a.com/tmp/y?q=1": True,
        "https://a.com/public/z.html": False,
        "https://a.com/privateer.html": False,
        "https://b.com/g/anything": False,
        "https://nobody.org/x": False,
    }


def test_schedule_frontier_slots(spark):
    fr = spark.createDataFrame(
        [
            ("https://a.com/p1", 5.0),
            ("https://a.com/p2", 9.0),
            ("https://a.com/p3", 9.0),
            ("https://b.com/q1", 1.0),
        ],
        "url string, priority double",
    )
    out = {r["url"]: (r["slot"], r["fetch_offset_s"]) for r in
           frontier.schedule_frontier(fr, "priority", crawl_delay_s=2.0).collect()}
    # a.com: p2/p3 tie on priority → url order; p1 last; b.com independent
    assert out == {
        "https://a.com/p2": (0, 0.0),
        "https://a.com/p3": (1, 2.0),
        "https://a.com/p1": (2, 4.0),
        "https://b.com/q1": (0, 0.0),
    }


def test_schedule_partitioning_invariant(spark):
    fr = spark.range(0, 200).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 5).cast("string"),
            F.lit(".com/p"), F.col("id").cast("string"),
        ).alias("url"),
        (F.col("id") % 7).cast("double").alias("priority"),
    )
    a = sorted(map(tuple, frontier.schedule_frontier(fr.coalesce(1), "priority").collect()))
    b = sorted(map(tuple, frontier.schedule_frontier(fr.repartition(13), "priority").collect()))
    assert a == b


def test_sitemap_locs_blockwise_lastmod(spark):
    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.com/p1 </loc><lastmod>2024-01-02</lastmod></url>"
        "<url><loc>https://a.com/p2</loc></url>"           # no lastmod
        "<url><lastmod>2024-03-04</lastmod><loc>https://a.com/p3</loc></url>"
        "<url><lastmod>2024-05-06</lastmod></url>"          # no loc -> dropped
        "</urlset>"
    )
    df = spark.createDataFrame([(body,)], "body string")
    got = {r["url"]: r["lastmod"] for r in frontier.sitemap_locs(df).collect()}
    # lastmod pairs with ITS OWN block even when a sibling block omits it
    assert got == {
        "https://a.com/p1": "2024-01-02",
        "https://a.com/p2": None,
        "https://a.com/p3": "2024-03-04",
    }


def test_robots_hosts_canonicalized_like_urls(spark):
    rules = frontier.parse_robots(spark.createDataFrame(
        [("WWW.A.com:443", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    ))
    assert {tuple(r) for r in rules.collect()} == {("a.com", "disallow", "/private/")}
    fr = spark.createDataFrame(
        [("https://www.a.com/private/x.html",), ("https://a.com/ok.html",)],
        "url string",
    )
    out = {r["url"]: r["blocked"] for r in
           frontier.robots_filter(fr, rules).collect()}
    # as-fetched robots host (www + port) still blocks the canonical frontier
    assert out["https://www.a.com/private/x.html"] is True
    assert out["https://a.com/ok.html"] is False


RFC_BODY = (
    "User-agent: *\n"
    "Crawl-delay: 2.5\n"
    "Disallow: /sec/\n"
    "Allow: /sec/pub\n"          # longer -> overrides /sec/ for /sec/pub*
    "Disallow: /*9.html$\n"      # wildcard + end anchor
    "Allow: /fish*.php\n"
    "Crawl-delay: 7\n"           # several values -> max wins
)


def _rfc_rules(spark):
    return spark.createDataFrame(
        [("c.com", RFC_BODY)], "host string, body string"
    )


def test_rfc9309_precedence_wildcards_and_anchors(spark):
    cases = {
        "https://c.com/sec/a.html": True,        # /sec/ disallow
        "https://c.com/sec/pub/x": False,        # allow longer than disallow
        "https://c.com/sec/pub9.html": True,     # 9-octet wildcard disallow
                                                 # beats the 8-octet allow
        "https://c.com/p9.html": True,           # $-anchored wildcard
        "https://c.com/p9.html?x=1": False,      # $ means END -> query breaks it
        "https://c.com/fishheads/catfish.php?x": False,  # mid-path wildcard allow
        "https://c.com/ok.html": False,          # no match -> allowed
    }
    fr = spark.createDataFrame([(u,) for u in cases], "url string")
    rules = frontier.parse_robots(_rfc_rules(spark))
    out = {r["url"]: r["blocked"] for r in
           frontier.robots_filter(fr, rules).collect()}
    assert out == cases


def test_rfc9309_duckdb_mirror_agrees(spark):
    """The full matcher (regex compile + precedence argmax) reproduces in
    DuckDB from the same bodies: parse mirror -> rule_regex_sql -> list-max
    precedence, per-URL blocked flags identical to Spark's."""
    urls_ = ["https://c.com/sec/a.html", "https://c.com/sec/pub/x",
             "https://c.com/sec/pub9.html", "https://c.com/p9.html",
             "https://c.com/p9.html?x=1", "https://c.com/ok.html"]
    fr = spark.createDataFrame([(u,) for u in urls_], "url string")
    rules = frontier.parse_robots(_rfc_rules(spark))
    want = {r["url"]: r["blocked"] for r in
            frontier.robots_filter(fr, rules).collect()}
    con = duckdb.connect()
    con.register("robots", pd.DataFrame({"host": ["c.com"], "body": [RFC_BODY]}))
    con.register("front", pd.DataFrame({"url": urls_}))
    q = f"""
WITH rules AS ({frontier.parse_robots_sql("robots")}),
rx AS (SELECT host, rule, octet_length(encode(pattern)) AS spec,
              {frontier.rule_regex_sql("pattern")} AS rx FROM rules),
f AS (SELECT url, regexp_replace(regexp_replace(url, '^[a-z]+://[^/]*', ''),
                                 '^$', '/') AS pathq FROM front),
m AS (SELECT f.url,
             max([r.spec, CASE WHEN r.rule = 'allow' THEN 1 ELSE 0 END]) AS best
      FROM f JOIN rx r ON regexp_matches(f.pathq, r.rx) GROUP BY f.url)
SELECT f.url, coalesce(m.best[2] = 0, FALSE) AS blocked
FROM f LEFT JOIN m USING (url)
"""
    got = dict(con.execute(q).fetchall())
    assert got == want


def test_crawl_delays_max_wins_and_sql_mirror(spark):
    df = _rfc_rules(spark)
    got = {(r["host"], r["crawl_delay_s"]) for r in
           frontier.crawl_delays(df).collect()}
    assert got == {("c.com", 7.0)}
    con = duckdb.connect()
    con.register("robots", pd.DataFrame({"host": ["c.com"], "body": [RFC_BODY]}))
    assert set(map(tuple, con.execute(
        frontier.crawl_delays_sql("robots")).fetchall())) == got


def test_schedule_frontier_per_host_delay_override(spark):
    fr = spark.createDataFrame(
        [("https://c.com/p1", 2.0), ("https://c.com/p2", 1.0),
         ("https://d.com/q1", 2.0), ("https://d.com/q2", 1.0)],
        "url string, priority double",
    )
    delays = spark.createDataFrame(
        [("c.com", 7.0)], "host string, crawl_delay_s double"
    )
    out = {r["url"]: r["fetch_offset_s"] for r in
           frontier.schedule_frontier(fr, "priority", crawl_delay_s=2.0,
                                      delays=delays).collect()}
    # c.com paces at its published 7s; d.com falls back to the 2s default
    assert out == {"https://c.com/p1": 0.0, "https://c.com/p2": 7.0,
                   "https://d.com/q1": 0.0, "https://d.com/q2": 2.0}


def test_rfc9309_equal_octet_tie_allow_wins(spark):
    """The §2.2.2 tie-break branch in isolation: an Allow and a Disallow
    of EQUAL octet length both matching -> allowed (flipping the
    is_allow struct ordering would invert this). Also pins octet (not
    character) specificity: a 2-char/3-octet non-ASCII Allow ties a
    3-char/3-octet Disallow (character counting would block)."""
    body = ("User-agent: *\n"
            "Disallow: /a/x\n"     # 4 octets
            "Allow: /a/y\n"        # 4 octets — irrelevant, different path
            "Allow: /a/x\n"        # 4 octets — ties the disallow -> allow
            "Disallow: /дx\n"      # 3 chars, 4 octets
            "Allow: /дxy\n")       # 4 chars, 5 octets -> more octets, allow
    rules = frontier.parse_robots(spark.createDataFrame(
        [("t.com", body)], "host string, body string"))
    fr = spark.createDataFrame(
        [("https://t.com/a/x1",), ("https://t.com/дxyz",)], "url string")
    out = {r["url"]: r["blocked"] for r in
           frontier.robots_filter(fr, rules).collect()}
    assert out["https://t.com/a/x1"] is False   # equal octets -> allow wins
    assert out["https://t.com/дxyz"] is False   # octet-longer allow governs


def test_rule_regex_cross_engine_grid(spark):
    """Generative cross-engine check of the robots pattern compiler: a
    grid of patterns exercising every metacharacter/escape/wildcard/
    anchor combination × a grid of paths, matched through Spark
    (regexp_like on rule_regex) AND DuckDB (regexp_matches on
    rule_regex_sql) — the compiled regex STRINGS and every match verdict
    must agree, or the oracle could silently diverge from the engine on
    hosts publishing exotic rules."""
    patterns = [
        "/a", "/a/", "/a$", "/*", "/*$", "/a*b", "/a*b$", "/*.php",
        "/*.php$", "/a.b", "/a+b", "/a?x=1", "/a(b)c", "/a[b]c",
        "/a{2}", "/a|b", "/a^b", "/a\\b", "/a$b", "/a$b$", "/**",
        "/a**b$", "/.^$+?()[]{}|*$", "/д/ж", "/%7Ea",
    ]
    paths = [
        "/a", "/a/", "/a/x", "/ab", "/a.b", "/axb", "/a*b", "/aXYb",
        "/x.php", "/x.phpq", "/a?x=1", "/a?x=12", "/a(b)c", "/a[b]c",
        "/a{2}", "/a|b", "/a^b", "/a\\b", "/a$b", "/д/ж", "/%7Ea", "/",
    ]
    cases = [(pat, path) for pat in patterns for path in paths]
    df = spark.createDataFrame(cases, "pattern string, path string")
    got_spark = {
        (r["pattern"], r["path"]): (r["rx"], r["m"])
        for r in df.select(
            "pattern", "path",
            frontier.rule_regex(F.col("pattern")).alias("rx"),
            F.regexp_like(
                F.col("path"), frontier.rule_regex(F.col("pattern"))
            ).alias("m"),
        ).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.register("cases", pd.DataFrame(cases, columns=["pattern", "path"]))
    got_duck = {
        (pat, path): (rx, m)
        for pat, path, rx, m in con.execute(
            f"SELECT pattern, path, {frontier.rule_regex_sql('pattern')} AS rx,"
            f" regexp_matches(path, {frontier.rule_regex_sql('pattern')})"
            " FROM cases"
        ).fetchall()
    }
    assert got_spark == got_duck
