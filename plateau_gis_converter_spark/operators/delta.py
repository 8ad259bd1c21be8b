"""Crawl snapshot delta — added / removed / changed / unchanged pages.

Incremental ingest lives on this question: given last month's crawl and
this month's, which urls are new, which vanished, and which changed
content?  The delta drives everything downstream — only `added` and
`changed` pages re-enter extraction/dedup, `removed` pages tombstone
out of the index — so computing it cheaply is what makes a 10^12-page
pipeline incremental instead of full-recompute.

Shape: ONE full-outer equi-join on the url key, comparing content
fingerprints (md5 of the canonical text — the same fingerprint
``dedup.dedup_exact`` groups on).  At scale both snapshots should live
in the bucketed layout (``sources/bucketed.py``) so the join is
exchange-free — the "pay the shuffle once per snapshot" story.  Status
is a simple CASE, so Catalyst pushes a ``status = 'changed'`` filter
straight into the join output; no Python anywhere.

Reference parity: the reference converter is batch-only (one CityGML
input -> one output); snapshot deltas are an engine addition for the
recurring-crawl corpus per the brief's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tile_assign as ta


def crawl_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                fp_col: str = "fingerprint") -> DataFrame:
    """(key, status, old_fp, new_fp) with status in
    added | removed | changed | unchanged.  Fingerprints are carried
    through (NULL on the missing side) so callers can route work without
    re-reading either snapshot."""
    o = old.select(F.col(key_col).alias("key"),
                   F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("key"),
                   F.col(fp_col).alias("new_fp"))
    j = o.join(n, "key", "full_outer")
    status = (F.when(F.col("old_fp").isNull(), "added")
              .when(F.col("new_fp").isNull(), "removed")
              .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
              .otherwise("changed"))
    return j.select("key", status.alias("status"), "old_fp", "new_fp")


def scd2_history_merge(history: DataFrame, snapshot: DataFrame, ts: int,
                       key_col: str = "url", fp_col: str = "fingerprint",
                       from_col: str = "valid_from",
                       to_col: str = "valid_to") -> DataFrame:
    """Fold a crawl snapshot taken at time ``ts`` into an SCD-type-2
    page history — the storage layout that lets "what did this url say
    at time T?" be one interval predicate instead of a scan over every
    snapshot ever taken.

    ``history`` rows are (key, fp, valid_from, valid_to) with
    ``valid_to IS NULL`` marking the currently-open version; the
    invariant (held by construction — this operator is the only writer)
    is at most ONE open row per key.  ``snapshot`` is (key, fp) with
    unique keys.  The merge:

    * closed rows (``valid_to`` set) carry over untouched — they are
      immutable facts, and at scale they are the bulk of the table, so
      touching only the open slice is what keeps the merge O(current
      corpus), not O(history);
    * an open row whose key reappears with the SAME fingerprint stays
      open (no churn for the ~unchanged majority of a recrawl);
    * an open row whose key changed content or vanished closes with
      ``valid_to = ts``;
    * a new or changed key opens a fresh row ``[ts, NULL)``.

    Shape: one filter split of the history, ONE full-outer equi-join of
    the open slice vs the snapshot on the key, then a single-pass
    explode of a per-key array carrying 0..2 output rows (close-old /
    open-new) — no window, no second join, and the join is
    exchange-free when both sides live in the bucketed layout
    (``sources/bucketed.py``).  Pure Catalyst.

    Reference parity: none — the reference converts one batch; SCD2
    history is the engine's recurring-crawl storage addition (same
    layer as ``crawl_delta``).
    """
    h = history.select(F.col(key_col).alias("key"),
                       F.col(fp_col).alias("fp"),
                       F.col(from_col).cast("bigint").alias("valid_from"),
                       F.col(to_col).cast("bigint").alias("valid_to"))
    closed = h.where(F.col("valid_to").isNotNull())
    opened = h.where(F.col("valid_to").isNull()) \
        .withColumn("__h", F.lit(1))
    s = snapshot.select(F.col(key_col).alias("key"),
                        F.col(fp_col).alias("snap_fp")) \
        .withColumn("__s", F.lit(1))
    j = opened.join(s, "key", "full_outer")
    t = F.lit(int(ts)).cast("bigint")
    null_ts = F.lit(None).cast("bigint")

    def row(fp, vf, vt):
        return F.struct(fp.alias("fp"), vf.cast("bigint").alias("valid_from"),
                        vt.cast("bigint").alias("valid_to"))

    same = (F.col("__h").isNotNull() & F.col("__s").isNotNull()
            & (F.col("fp") == F.col("snap_fp")))
    rows = F.array(
        F.when(same, row(F.col("fp"), F.col("valid_from"), null_ts)),
        F.when(F.col("__h").isNotNull() & ~same,
               row(F.col("fp"), F.col("valid_from"), t)),
        F.when(F.col("__s").isNotNull() & ~same,
               row(F.col("snap_fp"), t, null_ts)))
    merged = (j.select("key", F.explode(
        F.filter(rows, lambda r: r.isNotNull())).alias("r"))
        .select("key", "r.fp", "r.valid_from", "r.valid_to"))
    return closed.unionByName(merged).select(
        F.col("key").alias(key_col), F.col("fp").alias(fp_col),
        F.col("valid_from").alias(from_col), F.col("valid_to").alias(to_col))


def dirty_tiles(old: DataFrame, new: DataFrame, min_z: int, max_z: int,
                key_col: str = "url", fp_col: str = "fingerprint",
                lng_col: str = "lng_udeg",
                lat_col: str = "lat_udeg") -> DataFrame:
    """Distinct (z, x, y) tiles that must re-render after a snapshot delta.

    The geospatial face of incremental ingest: a tile pyramid over
    10^12 pages re-renders ONLY tiles whose contents changed — a page
    dirties the tile at its NEW location when added/changed and at its
    OLD location when removed/moved (a moved page dirties both).  The
    MVT/3D-Tiles sinks then rebuild exactly this tile set; everything
    else is carried over from the previous build (reference parity:
    the converter always re-renders the full pyramid,
    nusamai/src/sink/mvt/mod.rs — full-batch by design).

    Shape: the same ONE full-outer equi-join as ``crawl_delta`` (both
    fingerprints AND coordinates decide "unchanged"), an explode of the
    two coordinate sides, then the zero-shuffle tile explode
    (``tile_assign.assign_point_tiles``) and one distinct on (z, x, y)
    — output bounded by the tile pyramid, not the page count.
    """
    o = old.select(F.col(key_col).alias("key"),
                   F.col(fp_col).alias("ofp"),
                   F.col(lng_col).alias("olng"), F.col(lat_col).alias("olat"))
    n = new.select(F.col(key_col).alias("key"),
                   F.col(fp_col).alias("nfp"),
                   F.col(lng_col).alias("nlng"), F.col(lat_col).alias("nlat"))
    j = o.join(n, "key", "full_outer")
    clean = (F.col("ofp").isNotNull() & F.col("nfp").isNotNull()
             & (F.col("ofp") == F.col("nfp"))
             & (F.col("olng") == F.col("nlng"))
             & (F.col("olat") == F.col("nlat")))
    sides = F.array(
        F.struct(F.col("olng").alias("lng"), F.col("olat").alias("lat")),
        F.struct(F.col("nlng").alias("lng"), F.col("nlat").alias("lat")))
    pts = (j.where(~clean)
           .select(F.explode(sides).alias("p"))
           .select(F.col("p.lng").alias("lng_udeg"),
                   F.col("p.lat").alias("lat_udeg"))
           .where(F.col("lng_udeg").isNotNull()
                  & F.col("lat_udeg").isNotNull())
           .distinct())
    return (ta.assign_point_tiles(pts, min_z, max_z, with_tile_id=False)
            .select("z", "x", "y").distinct())
