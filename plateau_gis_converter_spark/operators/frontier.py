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
