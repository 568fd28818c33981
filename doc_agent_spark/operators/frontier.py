"""Crawl-frontier politeness: robots.txt exclusion + per-host fetch
scheduling.

After outlink extraction grows the frontier (functions/urls.py), two steps
decide what actually gets fetched: the robots.txt contract (don't fetch
what the host disallows) and politeness pacing (one request per host per
crawl-delay). Both are relational here:

- ``parse_robots`` parses robots.txt *bodies* — one tiny text per host, a
  metadata-sized table even at 10^12 frontier rows — into
  ``(host, rule, pattern)`` Allow/Disallow rows with plain line-explode +
  window algebra (group detection = lag/running-sum over line numbers), no
  Python, no per-row state machine. Scope: RFC 9309 ``User-agent: *``
  groups (several UA lines may share one group), both ``Allow`` and
  ``Disallow`` directives, ``*`` wildcards and the ``$`` end anchor.
  Per-host ``Crawl-delay`` (a de-facto extension, not in the RFC) is
  parsed separately by ``crawl_delays``.
- ``robots_filter`` applies the rules scan-side with RFC 9309 precedence:
  each rule compiles (relationally — regexp_replace algebra, no Python) to
  an anchored regex plus its octet-length specificity; rules collapse to
  one struct-array row per host and broadcast-join the frontier (the rule
  table is per-host metadata — millions of rows at web scale, still
  broadcastable or at worst a host-keyed shuffle the frontier already
  has). Per URL the most-specific matching rule wins (most pattern
  octets; Allow beats Disallow on ties — RFC 9309 §2.2.2), no match ⇒
  allowed. No theta join, no explode of the frontier.
- ``schedule_frontier`` assigns per-host fetch slots: rank within host by
  (priority DESC, url) → slot; ``fetch_offset_s = slot * crawl_delay``,
  where the delay is the host's published Crawl-delay when a ``delays``
  table is passed (else the global default). The window partitions by
  host, so skew = one hot host; a 10^12-row frontier bounds it with the
  same WindowGroupLimit cap pattern as sampling.cap_per_domain (cap slots
  per host per cycle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from doc_agent_spark.functions import urls


def _canon_host(host: Column) -> Column:
    """Bare-hostname canon matching ``urls.url_host`` (lowercase, strip
    port and leading ``www.``) — rules and frontier URLs must meet on the
    SAME key or disallowed URLs silently pass the filter."""
    h = F.lower(F.substring_index(host, ":", 1))
    return F.when(h.startswith("www."), F.substring(h, 5, 1 << 30)).otherwise(h)


def _star_group_lines(
    robots: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Exploded robots.txt lines restricted to ``User-agent: *`` groups:
    ``(host, pos, line)`` where ``line`` is comment-stripped + trimmed. A
    rule group starts at a ``User-agent`` line not preceded by another
    ``User-agent`` line (RFC 9309 lets several UA lines share one group);
    a group applies when any of its UA lines is ``*``."""
    host = _canon_host(F.col(host_col))
    lines = robots.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )
    line = F.trim(F.substring_index(F.col("raw"), "#", 1))
    low = F.lower(line)
    parsed = lines.select(
        "host", "pos", line.alias("line"),
        low.startswith("user-agent:").alias("is_ua"),
        F.trim(F.substring(line, 12, 1 << 20)).alias("ua_val"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "grp",
        F.sum(
            (
                F.col("is_ua")
                & ~F.lag("is_ua", 1, False).over(w)
            ).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    star = F.max(
        (F.col("is_ua") & (F.lower(F.col("ua_val")) == "*")).cast("int")
    ).over(Window.partitionBy("host", "grp"))
    return grouped.withColumn("star", star).filter(F.col("star") == 1)


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, rule, pattern)`` Allow/Disallow rows from robots.txt bodies
    (``rule`` ∈ {'allow', 'disallow'}).

    Relational parse: lines explode with position, star groups select via
    lag/running-sum window algebra (see ``_star_group_lines``); each
    group's non-empty ``Allow``/``Disallow`` values are the rules (RFC
    9309 §2.2.2 — an empty pattern matches nothing and drops; a blank
    ``Disallow`` is the classic allow-all no-op). Trailing ``#`` comments
    strip. The host key is canonicalized to ``urls.url_host`` form
    (lowercase, no port, no ``www.``) so a robots table keyed by the
    as-fetched hostname still joins the canonicalized frontier."""
    starred = _star_group_lines(robots, host_col, body_col)
    low = F.lower(F.col("line"))
    is_dis = low.startswith("disallow:")
    is_alw = low.startswith("allow:")
    val = F.when(
        is_dis, F.trim(F.substring(F.col("line"), 10, 1 << 20))
    ).when(is_alw, F.trim(F.substring(F.col("line"), 7, 1 << 20)))
    return (
        starred.select(
            "host",
            F.when(is_dis, F.lit("disallow"))
            .when(is_alw, F.lit("allow")).alias("rule"),
            val.alias("pattern"),
        )
        .filter(F.col("rule").isNotNull() & (F.col("pattern") != ""))
        .distinct()
    )


def crawl_delays(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, crawl_delay_s)`` from ``Crawl-delay`` lines in the
    ``User-agent: *`` groups (de-facto extension — RFC 9309 omits it, but
    hosts publishing one expect slower pacing; ADVICE r3 flagged that
    dropping it silently crawls them at the default rate). Several values
    → the max (politest) wins; unparseable values drop."""
    starred = _star_group_lines(robots, host_col, body_col)
    low = F.lower(F.col("line"))
    val = F.trim(F.substring(F.col("line"), 13, 1 << 20)).cast("double")
    return (
        starred.filter(low.startswith("crawl-delay:"))
        .select("host", val.alias("crawl_delay_s"))
        .filter(F.col("crawl_delay_s").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
    )


def rule_regex(pattern: Column) -> Column:
    """Anchored Java/RE2 regex for one robots rule pattern: regex
    metacharacters escape, ``*`` → ``.*``, a trailing ``$`` anchors the
    end, and ``^`` anchors the start (RFC 9309 matches from the first
    octet of the path). Pure column algebra — identical construction in
    ``rule_regex_sql`` so the DuckDB oracle compiles the same regexes."""
    ends = pattern.endswith("$")
    core = F.regexp_replace(pattern, r"\$$", "")
    esc = F.regexp_replace(core, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def robots_filter(
    frontier: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Frontier + ``blocked`` flag under RFC 9309 precedence: of the rules
    whose pattern matches the URL's path+query, the one with the most
    pattern octets governs; Allow beats Disallow on equal length; no
    matching rule (or no rules for the host) ⇒ allowed.

    Rules compile to (regex, specificity, is_allow) structs sorted and
    collapsed to one array row per host, then broadcast; per URL the best
    match is an ``array_max`` over struct(spec, is_allow) of the matching
    subset — struct ordering compares spec first, then is_allow, which IS
    the RFC tie-break (specificity in OCTETS per §2.2.2). The frontier
    never explodes."""
    compiled = rules.select(
        "host",
        F.struct(
            # RFC 9309 ties break on OCTETS, not characters — a non-ASCII
            # pattern's UTF-8 byte length is what a conforming crawler
            # (and the DuckDB mirror's octet_length) compares
            F.octet_length("pattern").alias("spec"),
            (F.col("rule") == "allow").alias("is_allow"),
            rule_regex(F.col("pattern")).alias("rx"),
        ).alias("r"),
    )
    by_host = compiled.groupBy("host").agg(
        F.array_sort(F.collect_set("r")).alias("_rf_rules")
    ).withColumnRenamed("host", "_rf_host")   # never collide with caller cols
    url = F.col(url_col)
    pathq = urls.url_pathq(url)
    best = F.array_max(
        F.transform(
            F.filter(
                F.col("_rf_rules"), lambda r: F.regexp_like(pathq, r["rx"])
            ),
            lambda r: F.struct(
                r["spec"].alias("spec"), r["is_allow"].alias("is_allow")
            ),
        )
    )
    out = (
        frontier.withColumn("_rf_uhost", urls.url_host(url))
        .join(
            F.broadcast(by_host),
            F.col("_rf_uhost") == F.col("_rf_host"), "left",
        )
        .withColumn("blocked", F.coalesce(~best["is_allow"], F.lit(False)))
    )
    return out.drop("_rf_uhost", "_rf_host", "_rf_rules")


def schedule_frontier(
    frontier: DataFrame,
    priority_col: str,
    url_col: str = "url",
    crawl_delay_s: float = 1.0,
    delays: DataFrame | None = None,
) -> DataFrame:
    """Per-host politeness slots: rank by (priority DESC, url) within host →
    ``slot`` (0-based) and ``fetch_offset_s = slot * delay`` — the
    deterministic dispatch order a fetcher fleet replays without
    coordination. ``delays`` (``crawl_delays`` output, per-host metadata →
    broadcast) overrides the global default for hosts that publish a
    ``Crawl-delay``."""
    url = F.col(url_col)
    host = urls.url_host(url)
    w = Window.partitionBy(host).orderBy(F.col(priority_col).desc(), url.asc())
    slot = F.row_number().over(w) - F.lit(1)
    out = frontier.withColumn("slot", slot)
    if delays is None:
        delay = F.lit(float(crawl_delay_s))
    else:
        d = delays.select(
            F.col("host").alias("_sf_host"),
            F.col("crawl_delay_s").alias("_sf_delay"),
        )
        out = out.join(F.broadcast(d), host == F.col("_sf_host"), "left")
        delay = F.coalesce(F.col("_sf_delay"), F.lit(float(crawl_delay_s)))
    out = out.withColumn("fetch_offset_s", F.col("slot") * delay)
    return out.drop("_sf_host", "_sf_delay") if delays is not None else out


def sitemap_locs(
    sitemaps: DataFrame, body_col: str = "body"
) -> DataFrame:
    """``(url, lastmod)`` from sitemap XML bodies — the host-published seed
    list that complements link discovery. Parses ``<url>`` blocks
    relationally ((?s) dot-all regex — Java and RE2 agree), pairing each
    ``<loc>`` with ITS OWN block's optional ``<lastmod>`` (a flat zip of
    two independent extracts would mis-align the moment one block omits
    lastmod). Sitemap-INDEX files (``<sitemap>`` blocks) list child
    sitemaps, not pages: fetch those bodies and run this again."""
    blocks = sitemaps.select(
        F.explode(
            F.regexp_extract_all(
                F.col(body_col), F.lit(r"(?s)<url>(.*?)</url>"), 1
            )
        ).alias("block")
    )
    loc = F.trim(F.regexp_extract(F.col("block"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1))
    lastmod = F.trim(
        F.regexp_extract(F.col("block"), r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    )
    return (
        blocks.select(
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------

def _star_lines_sql(robots_table: str, host_expr: str = "host",
                    body_expr: str = "body") -> str:
    """DuckDB mirror of _star_group_lines: ``(host, pos, line)`` rows in
    ``User-agent: *`` groups (identical explode + window algebra)."""
    return f"""
  SELECT host, pos, line FROM (
  SELECT host, pos, line, is_ua, ua_val,
         max(CASE WHEN is_ua AND lower(ua_val) = '*' THEN 1 ELSE 0 END)
           OVER (PARTITION BY host, grp) AS star
  FROM (
    SELECT host, pos, line, is_ua, ua_val,
           sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
             OVER (PARTITION BY host ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
    FROM (
    SELECT host, pos, line, is_ua, ua_val,
           coalesce(lag(is_ua) OVER (PARTITION BY host ORDER BY pos),
                    false) AS prev_ua
    FROM (
      SELECT host, pos, line,
             starts_with(lower(line), 'user-agent:') AS is_ua,
             trim(substring(line, 12)) AS ua_val
      FROM (
        SELECT host, pos, trim(split_part(raw, '#', 1)) AS line
        FROM (
          SELECT CASE WHEN starts_with(lower(split_part({host_expr}, ':', 1)), 'www.')
                      THEN substring(lower(split_part({host_expr}, ':', 1)), 5)
                      ELSE lower(split_part({host_expr}, ':', 1)) END AS host,
                 unnest(range(0, len(string_split({body_expr}, chr(10))))) AS pos,
                 unnest(string_split({body_expr}, chr(10))) AS raw
          FROM {robots_table}))))))
  WHERE star = 1
"""


def parse_robots_sql(robots_table: str, host_expr: str = "host",
                     body_expr: str = "body") -> str:
    """DuckDB mirror of parse_robots: ``(host, rule, pattern)`` Allow +
    Disallow rows from star groups."""
    return f"""
SELECT DISTINCT host,
       CASE WHEN starts_with(lower(line), 'disallow:') THEN 'disallow'
            ELSE 'allow' END AS rule,
       CASE WHEN starts_with(lower(line), 'disallow:')
            THEN trim(substring(line, 10))
            ELSE trim(substring(line, 7)) END AS pattern
FROM ({_star_lines_sql(robots_table, host_expr, body_expr)})
WHERE (starts_with(lower(line), 'disallow:')
       OR starts_with(lower(line), 'allow:'))
  AND (CASE WHEN starts_with(lower(line), 'disallow:')
            THEN trim(substring(line, 10))
            ELSE trim(substring(line, 7)) END) <> ''
"""


def crawl_delays_sql(robots_table: str, host_expr: str = "host",
                     body_expr: str = "body") -> str:
    """DuckDB mirror of crawl_delays: ``(host, crawl_delay_s)`` — max of
    parseable Crawl-delay values in star groups."""
    return f"""
SELECT host, max(delay_s) AS crawl_delay_s FROM (
  SELECT host, TRY_CAST(trim(substring(line, 13)) AS DOUBLE) AS delay_s
  FROM ({_star_lines_sql(robots_table, host_expr, body_expr)})
  WHERE starts_with(lower(line), 'crawl-delay:'))
WHERE delay_s IS NOT NULL
GROUP BY host
"""


def rule_regex_sql(pattern_expr: str = "pattern") -> str:
    """DuckDB mirror of rule_regex — same escape/wildcard/anchor algebra,
    RE2 rewrite syntax (``\\0`` whole-match backref instead of Java's
    ``$1`` group)."""
    core = "regexp_replace(" + pattern_expr + ", '\\$$', '')"
    cls = "'([\\\\.\\^\\$\\+\\?\\(\\)\\[\\]\\{\\}\\|])'"
    esc = "regexp_replace(" + core + ", " + cls + ", '\\\\\\0', 'g')"
    wild = "replace(" + esc + ", '*', '.*')"
    return ("'^' || " + wild + " || (CASE WHEN " + pattern_expr
            + " LIKE '%$' THEN '$' ELSE '' END)")
