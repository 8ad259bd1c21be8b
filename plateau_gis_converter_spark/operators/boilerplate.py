"""Per-host boilerplate paragraph removal (CCNet / RefinedWeb line-wise
filtering).

Web pages from one host share nav bars, cookie banners, footers — whole
paragraphs repeated across most of the host's documents. CCNet (Wenzek et
al., LREC 2020, §4.1 "deduplicating paragraphs") and RefinedWeb (Penedo et
al., 2023, line-wise corrections) strip a paragraph when its document
frequency within the shard/host crosses a threshold; the document keeps its
remaining paragraphs in original order. This is the standard pre-dedup
cleanup stage of an LLM training-data pipeline, and it is expressible as
pure Catalyst:

1. ``posexplode(split(text, '\\n'))`` — one map-side explode to paragraph
   rows carrying the in-document position;
2. paragraph key = md5 of the normalized (lower+trim) paragraph — the
   shuffle key is a fixed 32-byte hash, never the paragraph text;
3. one hash aggregation (map-side partial combine) counts each key's
   document frequency per host, one tiny aggregation counts docs per host
   (broadcast back — O(hosts) rows);
4. a paragraph is boilerplate iff ``df >= min_df`` AND
   ``df * 1_000_000 >= ratio_ppm * n_docs`` (integer arithmetic — exact,
   oracle-identical);
5. surviving paragraphs reassemble per document via
   ``array_sort(collect_list(struct(pos, para)))`` — position is unique
   within a document, so the sort is total and the rebuilt text is
   deterministic regardless of partitioning.

Scale: state per host is O(distinct paragraphs), per doc O(paragraphs);
the only shuffles are the (host, pkey) aggregation/join and the final
per-doc reassembly — no window over the corpus, no self-join, nothing
driver-side. At 100 TB the paragraph relation is the same order as the
tokenized corpus the shingle dedup already processes.

Reference anchor: the reference pipeline has no web-text stage (it is a
GIS converter); this operator is part of the §2.8b training-data layer the
brief requires beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_lines(docs: DataFrame, id_col: str = "doc_id",
                    group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Explode documents to (id, group, pos, para, pkey) paragraph rows.
    ``pos`` is the 0-based in-document paragraph index; ``pkey`` is the
    md5 of the normalized paragraph (the aggregation/shuffle key)."""
    return (docs
            .select(id_col, group_col,
                    F.posexplode(F.split(F.col(text_col), "\n"))
                    .alias("pos", "para"))
            .withColumn("pkey", F.md5(F.lower(F.trim(F.col("para"))))))


def host_boilerplate_strip(docs: DataFrame, ratio_ppm: int = 500_000,
                           min_df: int = 2, id_col: str = "doc_id",
                           group_col: str = "source",
                           text_col: str = "text") -> DataFrame:
    """Strip per-host boilerplate paragraphs; returns one row per input
    document: (id, group, clean_text, n_kept, n_removed).

    A paragraph (normalized form) is boilerplate within its host iff it
    appears in at least ``min_df`` documents AND in at least
    ``ratio_ppm`` parts-per-million of the host's documents. Removed
    paragraphs vanish; survivors keep their original order. A document
    whose every paragraph is boilerplate stays in the output with
    ``clean_text = ''`` (the caller decides whether to drop empties —
    the operator is policy-free, like robots.py).
    """
    base = docs.select(id_col, group_col, F.col(text_col).alias("__text"))
    lines = paragraph_lines(base, id_col, group_col, "__text")

    # docs per host: O(hosts) rows, broadcast back to the paragraph agg
    host_docs = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n_docs"))
    # paragraph document-frequency per host (countDistinct guards against
    # a paragraph repeated inside one document inflating df)
    para_df = lines.groupBy(group_col, "pkey").agg(
        F.count_distinct(F.col(id_col)).alias("__df"))
    flagged = para_df.join(F.broadcast(host_docs), group_col).where(
        (F.col("__df") >= F.lit(int(min_df)))
        & (F.col("__df") * F.lit(1_000_000)
           >= F.lit(int(ratio_ppm)) * F.col("__n_docs"))
    ).select(group_col, "pkey")

    kept = lines.join(flagged, [group_col, "pkey"], "left_anti")
    re = (kept.groupBy(id_col)
          .agg(F.array_sort(F.collect_list(F.struct("pos", "para")))
               .alias("__ps"),
               F.count(F.lit(1)).alias("__n_kept")))
    n_total = F.size(F.split(F.col("__text"), "\n"))
    return (base.join(re, id_col, "left")
            .select(
                id_col, group_col,
                F.coalesce(
                    F.array_join(
                        F.transform("__ps", lambda s: s["para"]), "\n"),
                    F.lit("")).alias("clean_text"),
                F.coalesce(F.col("__n_kept"), F.lit(0)).cast("bigint")
                .alias("n_kept"),
                (n_total - F.coalesce(F.col("__n_kept"), F.lit(0)))
                .cast("bigint").alias("n_removed")))
