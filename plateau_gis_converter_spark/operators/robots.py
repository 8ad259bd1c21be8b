"""robots.txt rule evaluation at corpus scale (RFC 9309 subset).

The compliance gate in front of the crawl planner (operators/frontier.py):
before a URL may be fetched, the host's robots rules decide allow/deny.
RFC 9309 §2.2.2 semantics implemented here:

* a rule is (host, allow|disallow, path_prefix); a rule MATCHES a URL
  whose path starts with the prefix (octet-wise);
* the MOST SPECIFIC match wins — longest prefix; on an allow/disallow
  tie at the same length, ALLOW wins;
* no matching rule (or no rules for the host) → allowed;
* an empty-prefix rule matches every path (robots' bare ``Disallow:``
  is conventionally an allow-all — encode it as an ``allow`` rule with
  prefix '' if that is the intent; the evaluator itself is policy-free).

Out of scope (documented, not silently wrong): ``*``/``$`` wildcards —
the synthetic fixture and gate use literal prefixes; wildcard support
would lower to a regex rlike with the same winner rule.

Shape: ONE equi-join keyed by host (the rules relation is broadcast
when it fits — robots corpora are ~KB per host) with the prefix match
in the join condition, then one partial-agg max over an all-integer
(length, allow) struct per URL — the max IS the RFC winner rule, so no
window and no per-URL sort. Left join keeps unmatched URLs (allowed).
Zero Python, zero driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_decisions(pages: DataFrame, rules: DataFrame,
                     host_col: str = "host",
                     path_col: str = "path") -> DataFrame:
    """Per page: (host, path, allowed, rule_len) — ``rule_len`` is the
    winning rule's prefix length (-1 when no rule matched).

    ``rules`` columns: host, allow (boolean), prefix (string).
    """
    r = rules.select(F.col("host").alias("__rh"),
                     F.col("allow").cast("boolean").alias("__allow"),
                     F.col("prefix").alias("__prefix"),
                     F.length("prefix").cast("bigint").alias("__rlen"))
    j = pages.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("__rh"))
        & F.col(path_col).startswith(F.col("__prefix")),
        "left")
    # RFC winner = max (length, allow): longest prefix first, allow
    # breaking the tie — a plain partial-agg max, no window
    cand = F.when(F.col("__rh").isNotNull(),
                  F.struct(F.col("__rlen").alias("l"),
                           F.col("__allow").cast("int").alias("a")))
    dec = (j.groupBy(host_col, path_col)
           .agg(F.max(cand).alias("__win")))
    return dec.select(
        host_col, path_col,
        F.coalesce(F.col("__win.a") == 1, F.lit(True)).alias("allowed"),
        F.coalesce(F.col("__win.l"), F.lit(-1)).cast("bigint")
        .alias("rule_len"))


def robots_filter(pages: DataFrame, rules: DataFrame,
                  host_col: str = "host",
                  path_col: str = "path") -> DataFrame:
    """The fetchable subset of ``pages`` (all original columns), i.e.
    the frontier the politeness scheduler may plan. One extra equi-join
    of the decisions back on (host, path)."""
    dec = robots_decisions(
        pages.select(host_col, path_col).distinct(), rules,
        host_col, path_col)
    return (pages.join(dec.where(F.col("allowed"))
                       .select(host_col, path_col),
                       [host_col, path_col], "left_semi"))
