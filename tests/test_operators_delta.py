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


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fingerprint string, valid_from long, valid_to long")


def _snap2(spark, rows):
    return spark.createDataFrame(rows, "url string, fingerprint string")


def test_scd2_merge_routes(spark):
    """unchanged stays open; changed closes + reopens; removed closes;
    added opens; closed rows carry over untouched."""
    hist = _hist(spark, [
        ("keep", "f1", 10, None),
        ("chg", "f2", 10, None),
        ("gone", "f3", 10, None),
        ("chg", "f0", 0, 10),       # closed fact, must carry over
    ])
    snap = _snap2(spark, [("keep", "f1"), ("chg", "f2b"), ("new", "f4")])
    out = dl.scd2_history_merge(hist, snap, ts=100)
    rows = {(r["url"], r["fingerprint"]): (r["valid_from"], r["valid_to"])
            for r in out.collect()}
    assert rows[("keep", "f1")] == (10, None)
    assert rows[("chg", "f2")] == (10, 100)      # closed on change
    assert rows[("chg", "f2b")] == (100, None)   # reopened
    assert rows[("gone", "f3")] == (10, 100)     # closed on remove
    assert rows[("new", "f4")] == (100, None)
    assert rows[("chg", "f0")] == (0, 10)        # carried closed row
    assert out.count() == 6


def test_scd2_merge_idempotent_and_point_in_time(spark):
    """Re-merging the same snapshot is a no-op on open rows, the
    one-open-row-per-key invariant holds after chained merges, and the
    interval predicate reconstructs each historical snapshot exactly."""
    from pyspark.sql import functions as F

    h0 = _hist(spark, [])
    s1 = _snap2(spark, [("a", "a1"), ("b", "b1")])
    h1 = dl.scd2_history_merge(h0, s1, ts=100)
    s2 = _snap2(spark, [("a", "a2"), ("c", "c1")])  # b removed, a changed
    h2 = dl.scd2_history_merge(h1, s2, ts=200).localCheckpoint()
    h2b = dl.scd2_history_merge(h2, s2, ts=300)
    # idempotent re-merge: same row multiset (open rows untouched)
    assert sorted(map(tuple, h2b.collect())) == sorted(map(tuple, h2.collect()))
    opens = h2.where(F.col("valid_to").isNull()).groupBy("url").count()
    assert opens.where(F.col("count") > 1).count() == 0
    def at(t):
        return {(r["url"], r["fingerprint"]) for r in h2.where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        ).collect()}
    assert at(150) == {("a", "a1"), ("b", "b1")}
    assert at(250) == {("a", "a2"), ("c", "c1")}


def test_scd2_no_python_stage(spark):
    hist = _hist(spark, [("a", "f", 0, None)])
    snap = _snap2(spark, [("a", "f")])
    plan = (dl.scd2_history_merge(hist, snap, ts=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
