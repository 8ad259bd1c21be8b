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
