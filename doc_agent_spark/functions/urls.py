"""URL canonicalization for crawl curation — the dedup-key normalizer that
runs BEFORE content dedup in a web pipeline (two crawls of the same page
differ only in tracking params / host case / default port / fragment; the
canonical URL collapses them so URL-level dedup catches re-crawls without
touching document bytes).

Steps (the standard crawl-frontier canon, cf. Apache Nutch's
urlnormalizer-basic):
  1. drop the fragment (`#...` never reaches the server)
  2. lowercase the scheme+host, strip a leading `www.`, strip default
     ports (`:80` http, `:443` https)
  3. drop tracking query params (utm_*, fbclid, gclid), sort the rest
     for order-insensitivity, drop the `?` when nothing survives

Everything is split_part/array string algebra — NO engine-specific URL
parser (Spark's parse_url has no DuckDB analog), so the oracle reproduces
the canon byte-for-byte. Zero-shuffle projections; at 100 TB this is scan
-side work that feeds the URL-dedup groupBy with already-32-byte-hashable
keys.

`registered_domain` is the naive last-two-labels rule; a production
pipeline swaps in the Public Suffix List (a ~10k-row broadcast join —
same shape, bigger table). Documented stub, not a hidden approximation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _strip_fragment(url: Column) -> Column:
    return F.substring_index(url, "#", 1)


def url_canonicalize(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring)."""
    nofrag = _strip_fragment(url)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring(nofrag, F.length(scheme) + 4, F.lit(1 << 30))
    hostport = F.substring_index(rest, "/", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(F.substring_index(hostport, ":", 1))
    host = F.when(host.startswith("www."), F.substring(host, 5, 1 << 30)).otherwise(host)
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    hostc = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        pathq.contains("?"), F.substring(pathq, F.length(path) + 2, F.lit(1 << 30))
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid")
            & ~p.startswith("gclid"),
        )
    )
    qc = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), hostc,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (port and `www.` stripped)."""
    nofrag = _strip_fragment(url)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring(nofrag, F.length(scheme) + 4, F.lit(1 << 30))
    host = F.lower(F.substring_index(F.substring_index(rest, "/", 1), ":", 1))
    return F.when(host.startswith("www."), F.substring(host, 5, 1 << 30)).otherwise(host)


def registered_domain(url: Column) -> Column:
    """Naive registered domain: the host's last two dot-labels (production:
    Public Suffix List broadcast join — same plan shape)."""
    labels = F.split(url_host(url), r"\.")
    n = F.size(labels)
    return F.when(
        n <= 2, F.array_join(labels, ".")
    ).otherwise(
        F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1))
    )


def url_canonicalize_sql(url_expr: str) -> str:
    """DuckDB mirror of url_canonicalize (identical split_part algebra)."""
    nofrag = f"split_part({url_expr}, '#', 1)"
    scheme = f"lower(split_part({nofrag}, '://', 1))"
    rest = f"substring({nofrag}, length({scheme}) + 4)"
    hostport = f"split_part({rest}, '/', 1)"
    pathq = f"substring({rest}, length({hostport}) + 1)"
    host0 = f"lower(split_part({hostport}, ':', 1))"
    host = f"CASE WHEN starts_with({host0}, 'www.') THEN substring({host0}, 5) ELSE {host0} END"
    port = f"CASE WHEN contains({hostport}, ':') THEN split_part({hostport}, ':', 2) ELSE '' END"
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80')"
        f" AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    hostc = f"CASE WHEN {keep_port} THEN {host} || ':' || {port} ELSE {host} END"
    path = f"split_part({pathq}, '?', 1)"
    query = f"CASE WHEN contains({pathq}, '?') THEN substring({pathq}, length({path}) + 2) ELSE '' END"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), p -> p <> ''"
        f" AND NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'fbclid')"
        f" AND NOT starts_with(p, 'gclid')))"
    )
    # DuckDB array_to_string([]) is NULL where Spark array_join([]) is ''
    qc = f"coalesce(array_to_string({kept}, '&'), '')"
    return (
        f"{scheme} || '://' || {hostc}"
        f" || (CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
        f" || (CASE WHEN {qc} = '' THEN '' ELSE '?' || {qc} END)"
    )


def registered_domain_sql(url_expr: str) -> str:
    """DuckDB mirror of registered_domain."""
    nofrag = f"split_part({url_expr}, '#', 1)"
    scheme = f"lower(split_part({nofrag}, '://', 1))"
    rest = f"substring({nofrag}, length({scheme}) + 4)"
    host0 = f"lower(split_part(split_part({rest}, '/', 1), ':', 1))"
    host = f"CASE WHEN starts_with({host0}, 'www.') THEN substring({host0}, 5) ELSE {host0} END"
    labels = f"string_split({host}, '.')"
    return (
        f"CASE WHEN len({labels}) <= 2 THEN array_to_string({labels}, '.')"
        f" ELSE {labels}[-2] || '.' || {labels}[-1] END"
    )
