"""Units for operators/delta.py — crawl_delta routing and dirty_tiles."""
import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import delta as dl


@pytest.fixture()
def snap(spark):
    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, fingerprint string, "
                  "lng_udeg long, lat_udeg long")
    return mk


def test_crawl_delta_statuses(spark, snap):
    old = snap([("a", "f1", 0, 0), ("b", "f2", 0, 0), ("c", "f3", 0, 0)])
    new = snap([("a", "f1", 0, 0), ("b", "fX", 0, 0), ("d", "f4", 0, 0)])
    got = {r["key"]: r["status"] for r in
           dl.crawl_delta(old.select("url", "fingerprint"),
                          new.select("url", "fingerprint")).collect()}
    assert got == {"a": "unchanged", "b": "changed",
                   "c": "removed", "d": "added"}


def test_dirty_tiles_moved_page_dirties_both_tiles(spark, snap):
    # z12 tile ≈ 87891 µdeg wide; 300000 µdeg east = a different tile
    old = snap([("a", "f1", 139_700_000, 35_680_000)])
    new = snap([("a", "f1", 140_000_000, 35_680_000)])
    got = dl.dirty_tiles(old, new, 12, 12).collect()
    assert len(got) == 2
    assert len({r["x"] for r in got}) == 2
    assert len({r["y"] for r in got}) == 1


def test_dirty_tiles_unchanged_emits_nothing(spark, snap):
    old = snap([("a", "f1", 139_700_000, 35_680_000),
                ("b", "f2", 139_700_100, 35_680_100)])
    got = dl.dirty_tiles(old, old, 7, 15).count()
    assert got == 0


def test_dirty_tiles_content_change_same_place_dirties_once(spark, snap):
    old = snap([("a", "f1", 139_700_000, 35_680_000)])
    new = snap([("a", "f2", 139_700_000, 35_680_000)])
    got = dl.dirty_tiles(old, new, 12, 12).collect()
    assert len(got) == 1  # same tile from both sides, distinct-collapsed


def test_dirty_tiles_add_and_remove(spark, snap):
    old = snap([("gone", "f1", 139_700_000, 35_680_000)])
    new = snap([("fresh", "f2", 140_000_000, 35_680_000)])
    got = dl.dirty_tiles(old, new, 12, 12).collect()
    assert len(got) == 2  # removed page's old tile + added page's new tile
