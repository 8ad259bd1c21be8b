"""Anchor (<a href>) extraction — the web-graph connector.

``operators/html.py`` turns pages into text; this module turns them into
EDGES, which is what feeds ``graph.pagerank_int`` /
``connected_components`` with a real link graph instead of the synthetic
one (``graph.synthetic_link_edges``).  The whole chain is pure Catalyst
regex — zero Python on a 10^12-page scan:

* ``extract_anchor_tags``: ``regexp_extract_all`` of ``<a ...>`` open
  tags (case-insensitive; the patterns avoid lookarounds so Java regex
  and RE2/DuckDB agree byte-for-byte — same discipline as
  ``html.html_extract_text``).
* per-tag parse: ``href`` value (single- or double-quoted) and a
  ``rel~=nofollow`` flag — the flag a PageRank ingest must respect.
* ``resolve_href``: the deterministic subset of RFC 3986 resolution a
  crawl pipeline applies before canonicalization — absolute http(s)
  kept as-is, protocol-relative ``//host/x`` inherits the source
  scheme, root-relative ``/x`` joins the source origin; fragments,
  ``mailto:``/``javascript:``/``data:`` and dotted relative paths are
  DROPPED (documented: relative-path resolution needs the full
  dot-segment algorithm — out of scope for the graph connector, and
  <1% of crawl anchors).

Scale: one map-side explode per page (anchors per page is small and
bounded); the (src, dst) output feeds ``urls.url_host`` /
``registered_domain`` and then one partial-agg groupBy for degree
stats — no shuffle until the caller aggregates.

Reference parity: the reference walks CityGML xlink references between
features (nusamai-citygml geometry/appearance xlink resolution); the
href graph is the web-pages analog of that cross-reference pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# open tags only; [^>]* never crosses a tag close; (?i) works in both
# Java regex and RE2
ANCHOR_TAG_RE = r"(?i)<a\s[^>]*>"
HREF_RE = r"""(?i)href\s*=\s*["']([^"'#]+)["']"""
NOFOLLOW_RE = r"""(?i)rel\s*=\s*["'][^"']*nofollow[^"']*["']"""


def extract_anchor_tags(html: Column) -> Column:
    """Array of raw ``<a ...>`` open tags."""
    return F.regexp_extract_all(html, F.lit(ANCHOR_TAG_RE), 0)


def resolve_href(href: Column, src_scheme: Column,
                 src_origin: Column) -> Column:
    """Resolve the documented subset; NULL for dropped anchors.

    ``src_scheme``: e.g. 'https'; ``src_origin``: 'https://host[:port]'
    (no trailing slash)."""
    return (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.startswith("//"),
              F.concat(src_scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(src_origin, href))
        .otherwise(F.lit(None)))


def extract_links(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """(url, dst_url, nofollow) — one row per kept anchor, in document
    order.  ``dst_url`` is resolved against the page url's scheme +
    origin."""
    scheme = F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(F.col(url_col),
                              r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1)
    tags = pages.select(
        F.col(url_col).alias("url"),
        scheme.alias("_scheme"), origin.alias("_origin"),
        F.explode(extract_anchor_tags(F.col(html_col))).alias("_tag"))
    href = F.regexp_extract(F.col("_tag"), HREF_RE, 1)
    dst = resolve_href(href, F.col("_scheme"), F.col("_origin"))
    return (tags
            .withColumn("dst_url", dst)
            .where(F.col("dst_url").isNotNull())
            .select("url", "dst_url",
                    F.col("_tag").rlike(NOFOLLOW_RE).alias("nofollow")))


def link_edges(pages: DataFrame, ids: DataFrame,
               html_col: str = "html", url_col: str = "url",
               follow_only: bool = True) -> DataFrame:
    """Intra-corpus integer edges (src_id, dst_id) for
    ``graph.pagerank_int``: anchors resolved, optionally nofollow-
    filtered, then joined to the (url, id) relation on dst — one
    equi-join against the corpus url map (shuffle on url, the join a
    crawl graph build always pays once)."""
    links = extract_links(pages, html_col, url_col)
    if follow_only:
        links = links.where(~F.col("nofollow"))
    src = ids.select(F.col("url").alias("url"),
                     F.col("id").alias("src_id"))
    dst = ids.select(F.col("url").alias("dst_url"),
                     F.col("id").alias("dst_id"))
    return (links.join(src, "url").join(dst, "dst_url")
            .where(F.col("src_id") != F.col("dst_id"))
            .select("src_id", "dst_id"))
