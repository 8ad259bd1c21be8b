"""Crawl-frontier scheduling: politeness-aware fetch planning.

A web-scale crawler (the upstream producer of every ``documents`` row this
engine curates) must serialize fetches WITHIN a host (robots politeness:
one request per host per ``delay`` seconds) while running millions of
hosts in parallel. The classic design (Mercator, Heydon & Najork 1999;
the Common Crawl / Nutch `generate` step) plans each crawl cycle as:

* all URLs of a host go to ONE fetcher queue  → per-host delay is
  enforceable locally on that worker, with zero cross-worker coordination;
* within the host, URLs are ordered by priority and numbered — the k-th
  URL of a host cannot start before ``k * delay`` seconds into the cycle;
* per-cycle host budgets cap how much of one giant host a cycle fetches.

This module is that planner as ONE declarative Spark plan:

* ``politeness_schedule``: (url, host, priority) → (fetcher, seq,
  not_before_s) — a single window shuffle keyed by host plus map-only
  hash routing. No driver loop, no RDDs.
* Scale: the shuffle is keyed by host (10^8-ish keys at web scale —
  well-distributed); the per-host window sort is the politeness
  SEMANTICS, not an implementation skew (a host's queue is serial by
  definition, and ``max_per_host`` bounds the per-key row count — the
  same bound a real cycle planner applies, since a host with 10^8
  pending URLs can only ever fetch cycle_seconds/delay of them anyway).

Reference anchor: the reference engine consumes files from disk
(nusamai/src/sink pipelines); the crawl planner is the web-corpus
acquisition stage the brief's webtext axis adds in front of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetcher_of(host, n_fetchers: int):
    """Deterministic fetcher id for a host: first 15 hex chars of md5 as
    an integer, mod n_fetchers (same stable-hash family as dedup/sampling
    — reproduces bit-identically in any engine, unlike JVM hashCode)."""
    h = F.conv(F.substring(F.md5(host), 1, 15), 16, 10).cast("bigint")
    return h % F.lit(n_fetchers)


def politeness_schedule(frontier: DataFrame, n_fetchers: int = 1024,
                        delay_s: int = 5,
                        max_per_host: int | None = None,
                        url_col: str = "url", host_col: str = "host",
                        priority_col: str | None = None) -> DataFrame:
    """Plan one crawl cycle. Output one row per scheduled URL:

    (url, host, fetcher, seq, not_before_s) where

    * ``fetcher``      — which of ``n_fetchers`` queues the URL routes to
                         (all URLs of a host land on the same fetcher);
    * ``seq``          — 0-based position in the host's serial queue,
                         highest ``priority_col`` first (url tiebreak, so
                         the plan is deterministic);
    * ``not_before_s`` — earliest start offset into the cycle,
                         ``seq * delay_s`` (per-host politeness delay).

    ``max_per_host`` drops queue positions beyond the cycle's per-host
    budget (rows with seq >= max_per_host), the standard giant-host guard.

    One shuffle total (the window keyed by host); routing and delay are
    map-only expressions. Priority order uses descending priority — ties
    broken by ascending url, so re-running the planner on the same
    frontier yields byte-identical schedules (required for the lineage /
    resume story: a re-planned cycle after a crash must re-create the
    same queues).
    """
    order = [F.col(url_col).asc()]
    if priority_col is not None:
        order = [F.col(priority_col).desc()] + order
    w = Window.partitionBy(host_col).orderBy(*order)
    out = (frontier
           .withColumn("seq", (F.row_number().over(w) - F.lit(1))
                       .cast("bigint"))
           .withColumn("fetcher", fetcher_of(F.col(host_col), n_fetchers))
           .withColumn("not_before_s",
                       (F.col("seq") * F.lit(delay_s)).cast("bigint")))
    if max_per_host is not None:
        out = out.where(F.col("seq") < max_per_host)
    return out.select(url_col, host_col, "fetcher", "seq", "not_before_s")


def fetcher_load(schedule: DataFrame) -> DataFrame:
    """Per-fetcher load summary for the planned cycle: URL count, host
    count, and the cycle makespan lower bound (the largest not_before_s
    on the queue — the fetcher cannot finish before its most-delayed
    URL becomes eligible). One partial-agg groupBy; use it to pick
    ``n_fetchers`` so max(makespan) fits the cycle length."""
    return (schedule.groupBy("fetcher")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.max("not_before_s").alias("makespan_s")))


def recrawl_priority(history: DataFrame, now: int, key_col: str = "url",
                     from_col: str = "valid_from",
                     to_col: str = "valid_to") -> DataFrame:
    """Change-frequency recrawl prioritization over the SCD2 page history
    (Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
    Crawlers", TODS 2003): pages that changed often AND have not been
    crawled recently come first in the next cycle's frontier.

    Inputs are ``delta.scd2_history_merge`` rows; a page's version count
    estimates its change rate over its observed lifetime:

        changes        = n_versions - 1
        span           = now - first_seen          (observation window)
        staleness      = now - last_change         (open row's start)
        priority_micro = changes * staleness * 10^6 div span

    — the expected number of unseen changes since the last content
    change under a Poisson change model, integer-exact (no float rate).
    Single-version pages get priority 0 (nothing observed changing yet);
    dead pages (no open row) are excluded — they left the frontier.

    Shape: ONE partial-agg groupBy over the history keyed by url; at
    10^12 urls this is the same shuffle budget as any per-url stat, and
    it composes with ``politeness_schedule`` (feed the top-K by priority
    as the cycle's frontier with ``priority = priority_micro``).

    Overflow: changes * staleness * 10^6 must stay under 2^63 — with
    second-resolution timestamps (staleness < 2^31) that allows ~4e3
    versions per page; millisecond feeds should be floored to seconds
    first (document scale discipline, not a silent cap).
    """
    t_now = F.lit(int(now)).cast("bigint")
    per = (history.groupBy(F.col(key_col).alias("url"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_versions"),
                F.min(F.col(from_col)).cast("bigint").alias("first_seen"),
                F.max(F.col(from_col)).cast("bigint").alias("last_change"),
                F.count(F.when(F.col(to_col).isNull(), 1))
                .alias("_open")))
    alive = per.where(F.col("_open") > 0)
    span = t_now - F.col("first_seen")
    return (alive.select(
        "url", "n_versions", "last_change",
        F.when(span > 0,
               F.expr(f"(n_versions - 1) * ({int(now)} - last_change) "
                      f"* 1000000 div ({int(now)} - first_seen)"))
        .otherwise(F.lit(0)).cast("bigint").alias("priority_micro")))


def hrw_route(keys: DataFrame, n_nodes: int, key_col: str = "key",
              salt: str = "hrw") -> DataFrame:
    """Rendezvous (highest-random-weight) routing — Thaler & Ravishankar
    '96, the consistent shard router behind cache/fetcher/state
    assignment when nodes come and go: key k goes to
    argmax_node md5(k || '|' || node). Unlike ``fetcher_of``'s modulo
    (which remaps ~ (n-1)/n of all keys when n changes), HRW moves ONLY
    the keys whose new node wins — expectation 1/(n+1) of the corpus on
    scale-up, and every moved key lands on the NEW node (nothing
    reshuffles between survivors: their per-node weights are unchanged,
    so a key changes owner only if the added node's weight beats its
    old max).

    Map-only: each key explodes to the O(n_nodes) literal node list
    (n is the cluster size, a constant), one 60-bit md5 weight per
    (key, node), one partial-agg max(struct(weight, node)) keyed by
    key. Ties (astronomically unlikely, but the gate demands bit
    determinism) break to the LOWER node id via the negated-id struct
    trick. Output: (key, node).
    """
    if n_nodes < 1:
        raise ValueError(f"n_nodes must be >= 1, got {n_nodes}")
    node = F.explode(F.array(*[F.lit(i) for i in range(n_nodes)]))
    weighted = keys.select(F.col(key_col).alias("key"),
                           node.alias("node"))
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("key").cast("string"), F.lit("|" + salt + "|"),
                       F.col("node").cast("string"))), 1, 15),
        16, 10).cast("bigint")
    return (weighted
            .select("key", "node", h.alias("w"))
            .groupBy("key")
            .agg(F.max(F.struct(F.col("w"), (-F.col("node")).alias("nn")))
                 .alias("b"))
            .select("key", (-F.col("b.nn")).cast("bigint").alias("node")))


# sitemap XML parsing (sitemaps.org protocol) — lookaround-free patterns
# so Java regex (Spark) and RE2 (DuckDB oracle) agree; (?is) = case-
# insensitive + DOTALL for multi-line pretty-printed sitemaps.
SITEMAP_URL_BLOCK_RE = r"(?is)<url\s*>.*?</url\s*>"
SITEMAP_LOC_RE = r"(?is)<loc\s*>\s*([^<\s][^<]*?)\s*</loc\s*>"
SITEMAP_LASTMOD_RE = r"(?is)<lastmod\s*>\s*([^<\s][^<]*?)\s*</lastmod\s*>"
SITEMAP_PRIORITY_RE = r"(?is)<priority\s*>\s*([0-9.]+)\s*</priority\s*>"


def sitemap_entries(sitemaps: DataFrame, xml_col: str = "xml",
                    id_col: str = "sitemap_url") -> DataFrame:
    """Parse sitemap XML documents (sitemaps.org protocol) into the URL
    relation the frontier consumes: one row per ``<url>`` block with its
    ``<loc>``, optional ``<lastmod>`` (NULL when absent), and
    ``<priority>`` quantized to per-mille (the protocol default 0.5 →
    500 when absent). Sitemaps are how large sites DECLARE their crawl
    surface — the seed/refresh source ``crawl_delta`` diffs against and
    ``politeness_schedule`` plans from; entries with a newer lastmod
    than the stored snapshot route into the re-fetch queue.

    Pure map-side Catalyst: one regexp block extract + explode, three
    per-block field extracts — no Python, no shuffle at all; at 100 TB
    the plan is embarrassingly parallel over sitemap files. Priority's
    decimal string is parsed with the engine-shared
    floor(x * 1000 + 0.5) quantization (same double parse both
    engines, one fixed op order).

    Output: (<id_col>, loc, lastmod, priority_pm); malformed blocks
    with no <loc> are dropped (the protocol makes loc mandatory).
    """
    blocks = (sitemaps.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            F.col(xml_col), F.lit(SITEMAP_URL_BLOCK_RE), 0))
        .alias("_blk")))
    loc = F.regexp_extract(F.col("_blk"), SITEMAP_LOC_RE, 1)
    lastmod = F.regexp_extract(F.col("_blk"), SITEMAP_LASTMOD_RE, 1)
    prio = F.regexp_extract(F.col("_blk"), SITEMAP_PRIORITY_RE, 1)
    pm = F.when(
        prio != "",
        F.floor(prio.cast("double") * F.lit(1000.0) + F.lit(0.5))
        .cast("bigint")).otherwise(F.lit(500).cast("bigint"))
    return (blocks
            .withColumn("loc", loc)
            .where(F.col("loc") != "")
            .select(F.col(id_col),
                    "loc",
                    F.when(lastmod != "", lastmod).alias("lastmod"),
                    pm.alias("priority_pm")))
