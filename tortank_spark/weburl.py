"""URL canonicalization and per-domain rollups for Common-Crawl-style
page tables (``input_hint``: ``url:string`` is a first-class column).

Web corpora are dominated by URL-keyed bookkeeping: dedup by canonical
URL, per-registrable-domain quality rollups, crawl-frontier stats. The
canonical form implemented here is the common crawl-dedup recipe:

* scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  the path/query stay case-sensitive,
* default ports stripped (``:80`` for http, ``:443`` for https),
* fragment dropped,
* tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``),
* remaining query parameters sorted bytewise (order-insensitive
  canonical form), empty query dropped,
* empty path normalized to ``/``.

Registrable domain ("example.co.uk", the dedup/rollup grouping key)
uses a tiny built-in second-level-suffix heuristic instead of the full
Mozilla public-suffix list (an external data file this sandbox does
not ship): the last two host labels, or the last three when the
second-to-last is a well-known second-level suffix under a two-letter
ccTLD. Loudly documented as a heuristic; swap in the PSL for
production.

Everything is pure JVM column expressions (split / filter / sort /
regexp on the Java-regex+RE2 common subset — no lookaround, no
backrefs), so the plan whole-stage-codegens and the DuckDB oracle can
replay the identical pattern bytes. At 100 TB the normalize step is
embarrassingly parallel (per-row, no shuffle); the rollup is a single
partial-aggregate shuffle keyed by registrable domain. Domain keys are
Zipf-skewed in real crawls — the rollup aggregates are all
algebraic (count / sum / max), so map-side combine absorbs the heavy
head before the exchange and no salting is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Java-regex/RE2 common subset — the DuckDB oracle runs the same bytes.
URL_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
URL_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
URL_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
URL_QUERY = r"^[A-Za-z][A-Za-z0-9+.-]*://[^#]*\?([^#]*)"

# tracking params dropped by the canonical form (prefix match for
# utm_, exact match otherwise)
TRACKING_PREFIX = "utm_"
TRACKING_EXACT = ("fbclid", "gclid")

# second-level suffixes under two-letter ccTLDs (heuristic PSL subset)
SECOND_LEVEL = ("co", "com", "ac", "gov", "org", "net", "edu")


def _canon_query(url: Column) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing kept)."""
    raw = F.regexp_extract(url, URL_QUERY, 1)
    kept = F.array_sort(
        F.filter(
            F.split(raw, "&"),
            lambda p: (p != F.lit(""))
            & ~p.startswith(TRACKING_PREFIX)
            & ~F.split(p, "=")[0].isin(*TRACKING_EXACT),
        )
    )
    return F.array_join(kept, "&")


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL column into canonical parts (all expressions)."""
    scheme = F.lower(F.regexp_extract(url, URL_SCHEME, 1))
    authority = F.regexp_extract(url, URL_AUTHORITY, 1)
    host = F.lower(F.regexp_replace(authority, ":[0-9]+$", ""))
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    # keep only non-default ports in the canonical form
    port_sfx = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(url, URL_PATH, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _canon_query(url)
    return {
        "scheme": scheme,
        "host": host,
        "port_sfx": port_sfx,
        "path": path,
        "query": query,
    }


def registrable_domain(host: Column) -> Column:
    """Heuristic eTLD+1: last 2 labels, or last 3 when label[-2] is a
    known second-level suffix AND the TLD is a two-letter ccTLD
    (co.uk yes, co.com no). Hosts with <2 labels pass through."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*SECOND_LEVEL)
    )
    k = F.when(take3, F.lit(3)).otherwise(F.lit(2))
    return F.when(n < 2, host).otherwise(
        F.array_join(F.slice(labels, n - k + 1, k), ".")
    )


def normalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """(id, url) -> (id, url_norm, scheme, host, domain, path_depth).

    Per-row expressions only — at crawl scale this pipelines inside
    the scan stage with zero shuffle, and Catalyst prunes the source
    to exactly (id, url)."""
    p = url_parts(F.col(url_col))
    url_norm = F.concat(
        p["scheme"], F.lit("://"), p["host"], p["port_sfx"], p["path"],
        F.when(p["query"] == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), p["query"])
        ),
    )
    path_depth = F.size(
        F.filter(F.split(p["path"], "/"), lambda x: x != F.lit(""))
    )
    return df.select(
        id_col,
        url_norm.alias("url_norm"),
        p["scheme"].alias("scheme"),
        p["host"].alias("host"),
        registrable_domain(p["host"]).alias("domain"),
        path_depth.alias("path_depth"),
    )


def domain_rollup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Per-registrable-domain crawl stats: page count, distinct hosts,
    distinct canonical URLs (URL-dedup'd size), max path depth.

    ONE exchange keyed by domain; count/max are algebraic so the
    Zipf-heavy head (a handful of domains owning most pages) is
    absorbed map-side. The two distinct counts re-use the same
    exchange (partial distinct aggregation), not extra shuffles."""
    return (
        normalize_urls(df, url_col, id_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("url_norm").alias("n_urls"),
            F.max("path_depth").alias("max_depth"),
        )
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url",
) -> DataFrame:
    """Robots-exclusion URL gate -> the input rows with
    (rule_path, allowed) attached: for each URL, the LONGEST matching
    path-prefix rule of its host decides (the REP longest-match rule,
    RFC 9309 §2.2.2; Allow wins ties with Disallow at equal length,
    also per the RFC); hosts with no matching rule default to
    allowed. This is the fetch gate a crawl pipeline applies between
    frontier and fetcher — and at re-process time, the compliance
    filter over an already-crawled page table.

    ``rules``: (host, path_prefix, allow) — one row per robots.txt
    directive, host already lowercased. Matching is plain
    starts-with on the URL path (the '*'/'$' wildcard extension is
    out of scope, documented — RFC 9309 §2.2.3 marks it optional).

    Scale shape: ONE equi-join on host (broadcast when the rule table
    is small; rules are per-host and bounded by robots.txt sizes, so
    even the full web's rule table is ~host-count-sized — shuffle
    join on host stays balanced because a host's rule fan-out is
    bounded by its robots.txt length), then max_by over
    (match_len, allow) picks the longest match per URL in the same
    aggregate — no window, no second pass."""
    p = url_parts(F.col(url_col))
    # the row nonce keeps duplicate input rows distinct through the
    # aggregate (task-retry-safe: it is grouping-only, never emitted)
    u = (
        urls.withColumn("_rf_uid", F.monotonically_increasing_id())
        .withColumn("_rf_host", p["host"])
        .withColumn("_rf_path", p["path"])
    )
    r = rules.select(
        F.col("host").alias("_rf_host"),
        F.col("path_prefix").alias("_rf_prefix"),
        F.col("allow").cast("boolean").alias("_rf_allow"),
    )
    j = u.join(r, "_rf_host", "left").withColumn(
        "_rf_match",
        F.col("_rf_prefix").isNotNull()
        & F.col("_rf_path").startswith(F.col("_rf_prefix")),
    )
    # longest match wins; Allow beats Disallow at equal length:
    # order key = (len, allow) lexicographic via max(struct)
    best = (
        j.groupBy(*urls.columns, "_rf_uid", "_rf_path")
        .agg(
            F.max(
                F.when(
                    F.col("_rf_match"),
                    F.struct(
                        F.length("_rf_prefix").alias("l"),
                        F.col("_rf_allow").alias("a"),
                        F.col("_rf_prefix").alias("p"),
                    ),
                )
            ).alias("_rf_best")
        )
    )
    return best.select(
        *urls.columns,
        F.col("_rf_best.p").alias("rule_path"),
        F.coalesce(F.col("_rf_best.a"), F.lit(True)).alias("allowed"),
    )
