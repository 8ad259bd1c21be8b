"""Packed-bitmap set cardinalities: exact audience overlap at scale.

"How many distinct users did segments A and B share?" over every segment
pair is the query that kills naive engines: COUNT(DISTINCT) per pair
re-shuffles the full (segment, member) relation once PER PAIR.  The
production answer (roaring bitmaps in Druid/ClickHouse/Pinot) is to
aggregate each segment's member set ONCE into a bitmap and answer every
set-algebra question from the bitmaps.  This is the exact-cardinality
companion to the HLL register relation (operators/cardinality.py), for
when the report needs exact numbers, not estimates.

Spark-first encoding — a bitmap is a RELATION of 64-bit words, not a
blob, so every step is a built-in partial aggregate:

* ``segment_bitmaps``: groupBy (segment, member div 64) with
  ``bit_or(1 << (member % 64))``.  ``bit_or`` is associative/commutative
  -> map-side combine; duplicate members are absorbed by the OR, so no
  up-front DISTINCT pass is needed.  Output size is O(non-empty words),
  never O(members), and never O(id-domain) — sparse ranges cost nothing.
* sizes: sum(bit_count(word)) per segment — one pass over the word
  relation (already tiny), exact.
* ``segment_overlap``: the word relations self-join on word_idx (an
  equi-join co-partitioned by word index — each matching word pair costs
  ONE int64 AND + popcount, versus re-shuffling raw member lists), then
  sum(bit_count(a & b)) per (seg_a < seg_b).  Union/diff follow by
  inclusion-exclusion from exact sizes.  Pairs sharing no word are
  restored by a broadcast pair frame (segments relation is small) so the
  output enumerates every ordered pair with n_common = 0 included.

100 TB shape: the raw fact never moves twice — one shuffle to build the
bitmaps (keyed (seg, word_idx), AQE-coalescible), after which every
pairwise/rollup question runs on the compressed relation.  S segments ×
W words bounds the join at S·W rows in, S²/2 aggregates out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_bitmaps(df: DataFrame, seg_col: str,
                    member_col: str) -> DataFrame:
    """(seg, word_idx, word): the packed member bitmap of each segment.

    ``member_col`` must be a non-negative integer id; NULL segments or
    members are dropped (a NULL member is no member).
    """
    m = F.col(member_col).cast("bigint")
    return (df
            .where(F.col(seg_col).isNotNull() & m.isNotNull() & (m >= 0))
            .groupBy(F.col(seg_col).alias("seg"),
                     F.expr(f"CAST({member_col} AS BIGINT) div 64")
                     .alias("word_idx"))
            .agg(F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                       f"CAST(CAST({member_col} AS BIGINT) % 64 AS INT))"))
                .alias("word")))


def bitmap_sizes(bitmaps: DataFrame) -> DataFrame:
    """(seg, n): exact member cardinality per segment from its bitmap."""
    return (bitmaps.groupBy("seg")
            .agg(F.sum(F.bit_count("word")).alias("n")))


def segment_overlap(df: DataFrame, seg_col: str,
                    member_col: str) -> DataFrame:
    """Every segment pair (seg_a < seg_b) with exact n_a, n_b, n_common,
    n_union — computed from packed bitmaps, never from per-pair DISTINCT
    rescans of the fact."""
    bm = segment_bitmaps(df, seg_col, member_col)
    sizes = bitmap_sizes(bm)
    inter = (bm.alias("a")
             .join(bm.alias("b"),
                   (F.col("a.word_idx") == F.col("b.word_idx"))
                   & (F.col("a.seg") < F.col("b.seg")))
             .groupBy(F.col("a.seg").alias("seg_a"),
                      F.col("b.seg").alias("seg_b"))
             .agg(F.sum(F.bit_count(
                 F.col("a.word").bitwiseAND(F.col("b.word"))))
                 .alias("n_common")))
    pairs = (sizes.alias("sa")
             .join(F.broadcast(sizes.alias("sb")),
                   F.col("sa.seg") < F.col("sb.seg"))
             .select(F.col("sa.seg").alias("seg_a"),
                     F.col("sb.seg").alias("seg_b"),
                     F.col("sa.n").alias("n_a"),
                     F.col("sb.n").alias("n_b")))
    return (pairs.join(inter, ["seg_a", "seg_b"], "left")
            .select("seg_a", "seg_b", "n_a", "n_b",
                    F.coalesce(F.col("n_common"), F.lit(0).cast("bigint"))
                    .alias("n_common"))
            .withColumn("n_union",
                        F.col("n_a") + F.col("n_b") - F.col("n_common")))
