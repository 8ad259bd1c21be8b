"""Bloom-filter prefilter for membership-style joins (decontamination,
blocklists) — the standard way to avoid shuffling a 10^12-row side against
a membership set that is too big to ship as a literal IN-list but tiny
compared to the corpus.

Spark's internal ``BloomFilterAggregate`` (injected for runtime join
filters) is not exposed in the public FunctionRegistry, so the filter is
built from DataFrame ops:

* **build**: each member contributes k = ``n_hashes`` bit positions
  ``xxhash64(value, i) mod m_bits`` (JVM-side hashing); one
  distinct-aggregate bounds the result at ``m_bits`` rows no matter how
  large the member relation is.
* **probe (semijoin, default)**: the positions stay a DataFrame and each
  of the k bit tests is a broadcast LEFT SEMI hash join — map-side, zero
  shuffle, zero Python, zero driver collect, no plan literals. This is
  the production shape at any filter size.
* **probe (inset)**: the set-bit positions fold into k Catalyst ``IN``
  predicates (InSet hash probes — zero shuffle, zero Python, whole-stage
  codegen). Only for SMALL position sets: ``Column.isin`` pays one py4j
  round trip per literal (~29 s measured for 4 x 10.8k positions), so the
  driver-side plan build dominates well before executor cost does.
* **probe (bitmap)**: the positions pack into a numpy bitset broadcast to
  executors; probing is an Arrow-batched pandas UDF over the SAME
  JVM-computed position arrays — constant ~m_bits/8 bytes per executor,
  an alternative when even the positions relation is awkward to hash-join.

All three probes answer identically (pytest-proven); a Bloom "yes" is a maybe,
so callers follow with an exact verify against the true member relation —
``decontaminate_bloom`` composes prefilter + exact broadcast verify and is
result-identical to ``dedup.decontaminate`` by construction (no false
negatives: every true member's bits are set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions per value; hashing stays JVM-side (xxhash64 with the
    probe index folded in as a second hashed column)."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(int(m_bits)))
            for i in range(int(k))]


def build_bloom_positions_df(members: DataFrame, col: str, m_bits: int,
                             k: int) -> DataFrame:
    """Distinct set-bit positions of the filter as a one-column DataFrame
    (``p: bigint``) — ONE distinct aggregate, output bounded by m_bits
    regardless of |members|, and NEVER collected to the driver.  This is
    the input shape the semi-join probe consumes."""
    return (members
            .select(F.explode(F.array(
                *_positions(F.col(col), m_bits, k))).alias("p"))
            .distinct())


def build_bloom_positions(members: DataFrame, col: str, m_bits: int,
                          k: int) -> list[int]:
    """Distinct set-bit positions of the filter — ONE distinct aggregate,
    output bounded by m_bits regardless of |members|."""
    pos = build_bloom_positions_df(members, col, m_bits, k)
    return sorted(r["p"] for r in pos.collect())


def pack_bitset(positions: list[int], m_bits: int) -> bytes:
    """LSB-first packed bitset (position p -> byte p>>3, bit p&7)."""
    buf = np.zeros((int(m_bits) + 7) // 8, dtype=np.uint8)
    if positions:
        p = np.asarray(positions, dtype=np.int64)
        np.bitwise_or.at(buf, p >> 3, (1 << (p & 7)).astype(np.uint8))
    return buf.tobytes()


def bloom_probe_inset(col: Column, positions: list[int], m_bits: int,
                      k: int) -> Column:
    """Pure-Catalyst probe: AND of k InSet membership tests."""
    if not positions:
        return F.lit(False)
    cond = F.lit(True)
    for p in _positions(col, m_bits, k):
        cond = cond & p.isin(positions)
    return cond


def bloom_prefilter_semijoin(df: DataFrame, col: str,
                             positions: DataFrame, m_bits: int,
                             k: int) -> DataFrame:
    """Pure-JVM probe with NO driver collect and NO plan literals: the
    set-bit positions stay a (tiny, <= m_bits row) DataFrame and each of
    the k probes is a broadcast LEFT SEMI hash join — map-side, zero
    shuffle on ``df``, whole-stage codegen.  Chaining the k semi-joins is
    the AND of the k bit tests, so the surviving rows are exactly the
    Bloom "maybe" set (identical to the inset/bitmap probes, pytest-proven).

    This is the probe to use at scale: ``Column.isin(<big list>)`` pays one
    py4j round trip PER literal (measured ~29 s for 4 x 10.8k positions at
    sf0.1) and embeds the whole set in the plan, while the broadcast
    relation here ships once per executor regardless of plan size."""
    out = df
    for i in range(int(k)):
        probe = F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(int(m_bits)))
        out = out.join(F.broadcast(positions),
                       probe == positions["p"], "left_semi")
    return out


def with_bloom_probe_bitmap(df: DataFrame, col: str, bitset: bytes,
                            m_bits: int, k: int,
                            out_col: str = "bloom_hit") -> DataFrame:
    """Bitmap probe: positions computed JVM-side, bit test in an
    Arrow-batched pandas UDF over a broadcast numpy bitset."""
    from pyspark.sql.functions import pandas_udf

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.frombuffer(bitset, dtype=np.uint8))

    @pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        buf = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        arr = np.vstack(pos.to_numpy()).astype(np.int64)
        bits = (buf[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    pos_arr = F.array(*_positions(F.col(col), m_bits, k))
    return df.withColumn(out_col, _probe(pos_arr))


def decontaminate_bloom(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                        min_shared: int = 2, text_col: str = "text",
                        m_bits: int = 1 << 20, k: int = 4,
                        probe: str = "semijoin") -> DataFrame:
    """``dedup.decontaminate`` semantics (flag docs sharing >= min_shared
    distinct n-grams with the benchmark), with a Bloom prefilter ahead of
    the exact verify join: only corpus shingles whose k bits are all set
    reach the join. False positives are removed by the exact join; false
    negatives cannot occur — output is identical to the plain operator.

    Scale: with a 10^8-gram benchmark the exact relation no longer
    broadcasts cheaply, but its Bloom bitmap (m_bits/8 bytes, FPR-sized)
    does; the prefilter drops the 10^12-row side's non-member shingles
    map-side, so the verify join's left input shrinks to (true matches +
    FPR * corpus shingles).
    """
    if probe not in ("inset", "bitmap", "semijoin"):
        raise ValueError(f"probe must be inset|bitmap|semijoin, got {probe!r}")
    train_sh = shingles(docs, n, text_col)
    # bench_sh feeds the k probe builds AND the exact verify join; the
    # eager local checkpoint pins it so the benchmark is shingled ONCE
    # (same pattern as packing.py's partition pin).
    bench_sh = (shingles(benchmark, n, text_col)
                .select("shingle").distinct()
                .localCheckpoint(eager=True))
    if probe == "semijoin":
        pos_df = (build_bloom_positions_df(bench_sh, "shingle", m_bits, k)
                  .localCheckpoint(eager=True))
        candidates = bloom_prefilter_semijoin(
            train_sh, "shingle", pos_df, m_bits, k)
    elif probe == "inset":
        positions = build_bloom_positions(bench_sh, "shingle", m_bits, k)
        candidates = train_sh.where(
            bloom_probe_inset(F.col("shingle"), positions, m_bits, k))
    else:
        positions = build_bloom_positions(bench_sh, "shingle", m_bits, k)
        candidates = (with_bloom_probe_bitmap(
            train_sh, "shingle", pack_bitset(positions, m_bits),
            m_bits, k).where(F.col("bloom_hit")).drop("bloom_hit"))
    shared = (candidates.join(F.broadcast(bench_sh), "shingle")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    base = train_sh.select("doc_id").distinct()
    return (base.join(shared, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint")
                    .alias("n_shared"))
            .withColumn("contaminated",
                        (F.col("n_shared") >= min_shared)))
