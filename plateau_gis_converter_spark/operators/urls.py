"""URL canonicalization + per-host statistics for the Common-Crawl-style
pages layer (url, warc_ts, html, text, lang).

A web-scale training pipeline dedups and filters per *canonical* URL and
per registered host (domain-level spam/license filters, per-domain caps),
so the canonicalizer has to be deterministic and cheap: everything here is
pure Catalyst (regexp + array expressions, JVM codegen, zero Python), and
every regex is chosen to evaluate identically in Spark (Java regex) and
DuckDB (RE2) so the gate oracle can replicate it.

Canonical form (the common normalization core of RFC 3986 §6 +
crawl-dedup practice):
  * scheme and host lowercased; path/query case preserved
  * leading ``www.`` stripped from the host
  * fragment dropped
  * tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``);
    an emptied query string drops its ``?``
  * trailing slashes collapsed off the path (root ``/`` dropped too:
    ``http://h/`` ≡ ``http://h``)

Reference parity: the reference engine has no URL layer (it consumes
CityGML files); this module is part of the engine-addition surface for the
web-pages input (SURVEY.md §2 "training-data pipeline" block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# capture groups valid in both Java regex and RE2 (no lookbehind)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _raw_authority(url: Column) -> Column:
    """Lowercased raw authority (userinfo/port/www all kept). Scheme-less
    URLs (real crawl data contains them — ``example.com/x``) take their
    leading ``[^/?#]+`` segment instead of collapsing to ''."""
    with_scheme = F.regexp_extract(url, _HOST_RE, 1)
    bare = F.regexp_extract(url, r"^([^/?#]+)", 1)
    return F.lower(F.when(url.rlike(_SCHEME_RE), with_scheme)
                   .otherwise(bare))


def url_authority(url: Column) -> Column:
    """Lowercased authority, leading ``www.`` stripped, userinfo/port
    KEPT — the canonical-URL building block (``http://h:8080/x`` and
    ``http://h/x`` are different resources, so the port must survive
    canonicalization)."""
    return F.regexp_replace(_raw_authority(url), r"^www\.", "")


def url_host(url: Column) -> Column:
    """The NETWORK HOST for grouping/domain extraction: the authority
    minus userinfo (``user:pass@``), port (``:8080``) and the leading
    ``www.`` — ADVICE r4: without the strip, ``example.co.uk:8080``
    suffix-matched nothing and per-domain caps split port-carrying URLs
    into phantom domains. ``www.`` strips AFTER userinfo removal so
    ``user@www.b.com`` still groups under ``b.com``. ``[::1]:8080``-style
    bracketed IPv6 keeps its brackets (the port regex only strips a
    trailing ``:digits``)."""
    no_user = F.regexp_replace(_raw_authority(url), r"^[^@/]*@", "")
    no_port = F.regexp_replace(no_user, r":[0-9]+$", "")
    return F.regexp_replace(no_port, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Public-suffix-aware registered domain with FULL PSL semantics
    (functions/psl.py): exact rules of any label count (``co.jp``,
    ``chiyoda.tokyo.jp``, ``act.edu.au``), wildcard rules (``*.ck``,
    ``*.sch.uk``) and exception rules (``!www.ck``), longest match wins,
    exceptions prevail. Dotless hosts (localhost, bare IPv6) and hosts
    that ARE a public suffix fall back to the host itself.

    The bundled snapshot compiles to Catalyst ``IN`` sets (InSet: JVM
    hash probe, zero shuffle/Python). For a runtime-supplied full PSL
    use ``functions.psl.registered_domain_join`` (broadcast joins)."""
    from ..functions.psl import registered_domain_col

    return registered_domain_col(host)


def _clean_query(url: Column) -> Column:
    """Query string minus tracking params ('' when nothing survives)."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.filter(F.split(q, "&"),
                    lambda p: (p != "") & ~p.rlike(_TRACKING_RE))
    return F.array_join(kept, "&")


def canonical_url(url: Column) -> Column:
    """Canonicalized URL per the module contract above. Scheme-less or
    malformed URLs pass through RAW: the scheme/host/path regexes all
    anchor on a scheme, so without the guard every such input would
    collapse to the single string ``"://"`` — used as a dedup key, all
    scheme-less pages would spuriously collide into one canonical URL."""
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    q = _clean_query(url)
    canon = F.concat(
        url_scheme(url), F.lit("://"), url_authority(url), path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))
    return F.when(url.rlike(_SCHEME_RE), canon).otherwise(url)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add canonical_url / host / domain / path_depth columns."""
    u = F.col(url_col)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    host = url_host(u)
    return (df.withColumn("canonical_url", canonical_url(u))
              .withColumn("host", host)
              .withColumn("domain", registered_domain(host))
              .withColumn("path_depth", depth.cast("bigint")))


def host_stats(pages: DataFrame, url_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """Per-host corpus statistics for domain-level filtering: page count,
    distinct canonical URLs (url-dedup size), distinct text fingerprints
    (content-dedup size), total characters.

    Scale: one hash-partial aggregation keyed by host — no join, no
    distinct-explosion (countDistinct compiles to a two-phase partial
    distinct aggregate under AQE).
    """
    parts = with_url_parts(pages, url_col)
    return (parts.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("canonical_url").alias("n_canonical"),
                 F.countDistinct(F.md5(F.col(text_col)))
                 .alias("n_distinct_texts"),
                 F.sum(F.length(text_col)).alias("total_chars")))


def url_template(url: Column) -> Column:
    """Structural URL path template: split the path into segments, replace
    every all-digit segment with ``{n}`` and every long (>= 8 chars)
    hex-ish segment (ids, content hashes, UUID halves) with ``{h}``,
    rejoin. ``https://h/post/2024/9f8e7d6c5b4a3f21/view`` ->
    ``/post/{n}/{h}/view``; an empty path maps to ``/``.

    Crawl/curation use: infinite URL spaces (calendars, session ids,
    pagination) collapse to a handful of templates — per-template counts
    drive crawler traps detection, per-template caps, and sitemap
    inference. Pure Catalyst (split + transform + array_join, zero
    Python), and every regex is RE2-safe (full-match semantics, no
    lookaround) so the DuckDB oracle replicates it verbatim.
    """
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    tseg = F.transform(
        segs,
        lambda s: F.when(s.rlike(r"^[0-9]+$"), F.lit("{n}"))
                   .when(s.rlike(r"^[0-9a-fA-F]{8,}$"), F.lit("{h}"))
                   .otherwise(s))
    return F.concat(F.lit("/"), F.array_join(tseg, "/"))


def url_template_stats(pages: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """Per (host, template) URL-space statistics: page count, distinct
    raw URLs, and the template's segment depth. The classic trap signal
    is ``n_urls >> n_distinct_templates-expected`` — e.g. a calendar
    template with 10^6 distinct URLs on one host.

    Scale: one hash partial-agg keyed by (host, template) — no join; the
    template expression is map-side codegen on the scan.
    """
    u = F.col(url_col)
    t = url_template(u)
    depth = F.size(F.filter(F.split(t, "/"), lambda s: s != "")) \
        .cast("bigint")
    return (pages.select(url_host(u).alias("host"), t.alias("template"),
                         depth.alias("depth"), u.alias("__u"))
            .groupBy("host", "template", "depth")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("__u").alias("n_distinct_urls")))


def query_param_stats(pages: DataFrame, url_col: str = "url",
                      min_hosts: int = 3,
                      min_ndv: int = 20) -> DataFrame:
    """URL query-parameter profiling — the tracking-param detector
    behind canonicalization cleanup rules: a parameter appearing across
    MANY hosts with HIGH value cardinality (utm_*, fbclid, session ids)
    is navigation-irrelevant noise that splinters dedup keys; a
    low-cardinality param (page=1..5) is content-bearing. Produces the
    per-param evidence and the flag.

    Map-side parse (authority + query regexes, one explode, first-'='
    split), then one partial agg with two exact distincts per param.

    Output: (param, n_occurrences, n_hosts, n_values, tracking) —
    tracking = hosts >= min_hosts AND distinct values >= min_ndv.
    """
    host = F.regexp_extract(F.col(url_col),
                            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    query = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    kv = (pages.select(host.alias("h"), query.alias("q"))
          .where(F.col("q") != "")
          .select("h", F.explode(F.split(F.col("q"), "&")).alias("p"))
          .where(F.col("p") != "")
          .select("h",
                  F.substring_index(F.col("p"), "=", 1).alias("k"),
                  F.expr("substr(p, length(substring_index(p, '=', 1))"
                         " + 2)").alias("v")))
    agg = (kv.groupBy(F.col("k").alias("param"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                F.countDistinct("h").cast("bigint").alias("n_hosts"),
                F.countDistinct("v").cast("bigint").alias("n_values")))
    flag = ((F.col("n_hosts") >= int(min_hosts))
            & (F.col("n_values") >= int(min_ndv)))
    return agg.withColumn("tracking", flag.cast("int"))
