"""Crawl-frontier politeness: robots.txt exclusion + per-host fetch
scheduling.

After outlink extraction grows the frontier (functions/urls.py), two steps
decide what actually gets fetched: the robots.txt contract (don't fetch
what the host disallows) and politeness pacing (one request per host per
crawl-delay). Both are relational here:

- ``parse_robots`` parses robots.txt *bodies* — one tiny text per host, a
  metadata-sized table even at 10^12 frontier rows — into ``(host, prefix)``
  Disallow rules with plain line-explode + window algebra (group detection =
  lag/running-sum over line numbers), no Python, no per-row state machine.
  Scope (documented): ``User-agent: *`` groups only, prefix-match semantics,
  no Allow overrides or ``$``/``*`` wildcards — the RFC 9309 subset that
  covers the overwhelming majority of real rules; a full matcher slots in
  behind the same (host, prefix) contract.
- ``robots_filter`` applies the rules scan-side: rules collapse to one
  prefix-array row per host and broadcast-join the frontier (the rule table
  is per-host metadata — millions of rows at web scale, still broadcastable
  or at worst a host-keyed shuffle the frontier already has), then an
  ``exists`` over the array marks blocked URLs. No theta join, no explode
  of the frontier.
- ``schedule_frontier`` assigns per-host fetch slots: rank within host by
  (priority DESC, url) → slot; ``fetch_offset_s = slot * crawl_delay``.
  The window partitions by host, so skew = one hot host; a 10^12-row
  frontier bounds it with the same WindowGroupLimit cap pattern as
  sampling.cap_per_domain (cap slots per host per cycle).
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


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, prefix)`` Disallow rules from robots.txt bodies.

    Relational parse: lines explode with position; a rule group starts at a
    ``User-agent`` line not preceded by another ``User-agent`` line (RFC
    9309 lets several UA lines share one group); a group applies when any
    of its UA lines is ``*``; its non-empty ``Disallow`` values are the
    rules. Trailing ``#`` comments strip; blank Disallow (allow-all) drops.
    The host key is canonicalized to ``urls.url_host`` form (lowercase, no
    port, no ``www.``) so a robots table keyed by the as-fetched hostname
    still joins the canonicalized frontier."""
    host = _canon_host(F.col(host_col))
    lines = robots.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )
    line = F.trim(F.substring_index(F.col("raw"), "#", 1))
    low = F.lower(line)
    parsed = lines.select(
        "host", "pos",
        low.startswith("user-agent:").alias("is_ua"),
        F.trim(F.substring(line, 12, 1 << 20)).alias("ua_val"),
        low.startswith("disallow:").alias("is_dis"),
        F.trim(F.substring(line, 10, 1 << 20)).alias("dis_val"),
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
    return (
        grouped.withColumn("star", star)
        .filter(F.col("is_dis") & (F.col("dis_val") != "") & (F.col("star") == 1))
        .select("host", F.col("dis_val").alias("prefix"))
        .distinct()
    )


def robots_filter(
    frontier: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Frontier + ``blocked`` flag: true when the URL's path+query starts
    with any Disallow prefix for its host. Rules collapse to one sorted
    prefix-array row per host and broadcast; the frontier never explodes."""
    by_host = rules.groupBy("host").agg(
        F.array_sort(F.collect_set("prefix")).alias("_rf_prefixes")
    ).withColumnRenamed("host", "_rf_host")   # never collide with caller cols
    url = F.col(url_col)
    out = (
        frontier.withColumn("_rf_uhost", urls.url_host(url))
        .join(
            F.broadcast(by_host),
            F.col("_rf_uhost") == F.col("_rf_host"), "left",
        )
        .withColumn(
            "blocked",
            F.coalesce(
                F.exists(
                    F.col("_rf_prefixes"),
                    lambda p: urls.url_pathq(url).startswith(p),
                ),
                F.lit(False),
            ),
        )
    )
    return out.drop("_rf_uhost", "_rf_host", "_rf_prefixes")


def schedule_frontier(
    frontier: DataFrame,
    priority_col: str,
    url_col: str = "url",
    crawl_delay_s: float = 1.0,
) -> DataFrame:
    """Per-host politeness slots: rank by (priority DESC, url) within host →
    ``slot`` (0-based) and ``fetch_offset_s = slot * crawl_delay_s`` — the
    deterministic dispatch order a fetcher fleet replays without
    coordination."""
    url = F.col(url_col)
    w = (
        Window.partitionBy(urls.url_host(url))
        .orderBy(F.col(priority_col).desc(), url.asc())
    )
    slot = F.row_number().over(w) - F.lit(1)
    return frontier.withColumn("slot", slot).withColumn(
        "fetch_offset_s", F.col("slot") * F.lit(float(crawl_delay_s))
    )


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

def parse_robots_sql(robots_table: str, host_expr: str = "host",
                     body_expr: str = "body") -> str:
    """DuckDB mirror of parse_robots (identical explode + window algebra)."""
    return f"""
SELECT DISTINCT host, dis_val AS prefix FROM (
  SELECT host, is_ua, ua_val, is_dis, dis_val,
         max(CASE WHEN is_ua AND lower(ua_val) = '*' THEN 1 ELSE 0 END)
           OVER (PARTITION BY host, grp) AS star
  FROM (
    SELECT host, pos, is_ua, ua_val, is_dis, dis_val,
           sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
             OVER (PARTITION BY host ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
    FROM (
    SELECT host, pos, is_ua, ua_val, is_dis, dis_val,
           coalesce(lag(is_ua) OVER (PARTITION BY host ORDER BY pos),
                    false) AS prev_ua
    FROM (
      SELECT host, pos,
             starts_with(lower(line), 'user-agent:') AS is_ua,
             trim(substring(line, 12)) AS ua_val,
             starts_with(lower(line), 'disallow:') AS is_dis,
             trim(substring(line, 10)) AS dis_val
      FROM (
        SELECT host, pos, trim(split_part(raw, '#', 1)) AS line
        FROM (
          SELECT CASE WHEN starts_with(lower(split_part({host_expr}, ':', 1)), 'www.')
                      THEN substring(lower(split_part({host_expr}, ':', 1)), 5)
                      ELSE lower(split_part({host_expr}, ':', 1)) END AS host,
                 unnest(range(0, len(string_split({body_expr}, chr(10))))) AS pos,
                 unnest(string_split({body_expr}, chr(10))) AS raw
          FROM {robots_table}))))))
WHERE is_dis AND dis_val <> '' AND star = 1
"""
