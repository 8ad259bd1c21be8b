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
