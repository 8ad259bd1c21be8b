"""Heavy hitters (frequent items) with a Misra-Gries candidate prefilter.

The corpus-statistics question "which tokens / domains / cells exceed a
phi fraction of the stream?" is the canonical skew probe — it feeds
stop-word lists, hot-domain caps, and hot-cell splitting (the same skew
the reference's tile writer warns about at 200k features/tile,
atlas_packer.rs / sinks cite in ``operators/skew.py``).

The exact answer is one groupBy — but at 10^12 rows that shuffles EVERY
distinct key (trillions of one-count groups for web tokens/URLs), all to
discard everything below the threshold.  The classic fix (Misra & Gries
1982; merged summaries per Agarwal et al., "Mergeable Summaries", PODS
2012) runs a k-counter sketch per partition and verifies only the
surviving candidates:

* **phase 1 (map-only, zero shuffle)**: each partition streams its rows
  through a weighted Misra-Gries sketch with ``k`` counters (an
  Arrow-batched ``mapInPandas``; per-batch ``value_counts`` then a
  decrement-merge, so the loop is per *distinct-in-batch*, not per row).
  Output <= k candidate keys per partition.
* **pigeonhole guarantee**: any key with global count > N/(k+1) has
  partition count > N_p/(k+1) in at least one partition, and a weighted
  MG sketch with k counters never evicts a key whose partition count
  exceeds N_p/(k+1) (each eviction round subtracts equal mass from k+1
  keys, so at most N_p/(k+1) is ever subtracted from any one key).
  Union of partition candidates ⊇ all global heavy hitters — the
  prefilter is LOSSLESS for threshold N/(k+1), same invariance pattern
  as ``bloom.decontaminate_bloom``.
* **phase 2 (exact verify)**: one pass counts ONLY candidate keys (a
  broadcast InSet filter — O(k · partitions) keys, independent of the
  distinct-key count) and keeps those with count·(k+1) > N.

The result is therefore IDENTICAL to the exact groupBy answer, which is
what the gate's oracle computes — the gate proves losslessness, not just
plausibility.  Driver traffic is bounded: O(k · partitions) candidate
rows + one scalar N.

Reference parity: the reference has no sketch layer (its skew handling
is the per-tile warn in sinks/mvt); this is an engine addition for the
10^12-page corpus per the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> None:
    """Weighted Misra-Gries merge of ``batch_counts`` into ``counters``,
    keeping at most ``k`` counters.  Eviction subtracts the minimum
    surviving count from every counter (>= k+1 keys lose equal mass per
    round), preserving the N_p/(k+1) under-count bound."""
    for key, c in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(c)
    while len(counters) > k:
        m = min(counters.values())
        dead = []
        for key in counters:
            counters[key] -= m
            if counters[key] <= 0:
                dead.append(key)
        for key in dead:
            del counters[key]


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (<= k per partition) —
    map-only, no shuffle; keys are carried as strings (the verify phase
    compares on the same cast).  Output (k, n): candidate rows have
    n = 0; one NULL-key row per partition carries that partition's row
    count (so the caller learns N without a second scan)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    src = (df.select(F.col(key_col).cast("string").alias("k"))
           .where(F.col("k").isNotNull()))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for b in batches:
            n += len(b)
            _mg_merge(counters, b["k"].value_counts().to_dict(), k)
        # one NULL-key row carries the partition row count, so callers
        # get candidates AND the stream total N in a single scan
        yield pd.DataFrame({
            "k": pd.Series(list(counters) + [None], dtype="object"),
            "n": [0] * len(counters) + [n]})

    return src.mapInPandas(part, "k string, n long")


def heavy_hitters(df: DataFrame, key_col: str, k: int,
                  prefilter: bool = True) -> DataFrame:
    """All keys with count·(k+1) > N (strict), with their exact counts —
    columns ``(key string, cnt bigint)``.

    ``prefilter=True`` (default) runs the MG candidate pass and counts
    only candidates; ``False`` is the plain exact groupBy.  Both return
    the same rows by the pigeonhole guarantee (pytest-proven; the gate
    proves it against an independent exact SQL oracle)."""
    keyed = (df.select(F.col(key_col).cast("string").alias("key"))
             .where(F.col("key").isNotNull()))
    if prefilter:
        # ONE scan yields both the candidates and N (the NULL-key rows
        # carry per-partition totals) — the exact path below is then the
        # only other pass over the stream
        rows = mg_candidates(df, key_col, k).collect()
        n_total = sum(r["n"] for r in rows if r["k"] is None)
        cands = sorted({r["k"] for r in rows if r["k"] is not None})
        # InSet hash probe (JVM, codegen); empty candidate set => no hitters
        if not cands:
            return keyed.limit(0).groupBy("key").agg(
                F.count(F.lit(1)).alias("cnt"))
        keyed = keyed.where(F.col("key").isin(cands))
    else:
        n_total = keyed.count()
    return (keyed.groupBy("key")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .where(F.col("cnt") * (k + 1) > F.lit(n_total)))
