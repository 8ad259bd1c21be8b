"""Round-5 wave 28: Morton range decomposition, golden record, lag
autocorrelation."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import zorder as zo


# ----------------------------------------------------------------- morton

def test_morton_code_reference_values(spark):
    df = spark.createDataFrame([Row(x=i, y=j) for i in range(4)
                                for j in range(4)])
    got = {(r["x"], r["y"]): r["m"] for r in df.select(
        "x", "y", zo.morton_code_col(F.col("x"), F.col("y"), bits=2)
        .alias("m")).collect()}
    # the canonical 4x4 Z curve
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1
    assert got[(0, 1)] == 2 and got[(1, 1)] == 3
    assert got[(2, 0)] == 4 and got[(3, 3)] == 15
    assert got == {(x, y): zo._interleave(x, y, 2)
                   for x in range(4) for y in range(4)}


def test_bbox_cell_ranges_merge_and_cover():
    ranges = zo.bbox_cell_ranges(0, 1, 0, 1, bits=4)
    assert ranges == [(0, 3)]  # an aligned quad folds to ONE range
    ranges = zo.bbox_cell_ranges(1, 2, 1, 2, bits=4)
    covered = set()
    for lo, hi in ranges:
        covered.update(range(lo, hi + 1))
    want = {zo._interleave(x, y, 4) for x in (1, 2) for y in (1, 2)}
    assert want <= covered  # every bbox cell is in some range
    # ranges are disjoint, sorted, maximal (no two touch)
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 + 1 < l2
    # unaligned 2x2 still beats one-range-per-cell only when mergeable;
    # it must NEVER exceed the cell count
    assert len(ranges) <= 4


def test_bbox_cell_ranges_budget_raises():
    with pytest.raises(ValueError, match="max_cells"):
        zo.bbox_cell_ranges(0, 999, 0, 999, bits=16, max_cells=100)
    with pytest.raises(ValueError, match="domain"):
        zo.bbox_cell_ranges(0, 70000, 0, 0, bits=16, max_cells=1 << 20)


def test_morton_bbox_scan_equals_plain_filter(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, x=(i * 37) % 3000, y=(i * 91) % 3000)
         for i in range(500)])
    out = zo.morton_bbox_scan(df, "x", "y", 100, 900, 200, 1100,
                              cell_shift=6, bits=8)
    want = df.where((F.col("x").between(100, 900))
                    & (F.col("y").between(200, 1100)))
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in want.collect())
    assert out.count() > 0


def test_morton_empty_bbox(spark):
    df = spark.createDataFrame([Row(doc_id=1, x=5, y=5)])
    assert zo.morton_bbox_scan(df, "x", "y", 10, 9, 0, 0,
                               cell_shift=2, bits=4).count() == 0


# ----------------------------------------------------------- golden record

def test_golden_record_majority_and_ties(spark):
    rows = [Row(cl=1, lang="en", src="cc"),
            Row(cl=1, lang="en", src="web"),
            Row(cl=1, lang="de", src="web"),
            Row(cl=2, lang=None, src="aa"),
            Row(cl=2, lang="fr", src="bb")]
    out = dd.golden_record(spark.createDataFrame(rows), "cl",
                           ["lang", "src"])
    got = {(r["cluster"], r["field"]): (r["value"], r["n_votes"])
           for r in out.collect()}
    assert got[(1, "lang")] == ("en", 2)      # majority
    assert got[(1, "src")] == ("web", 2)
    assert got[(2, "lang")] == ("fr", 1)      # nulls never vote
    assert got[(2, "src")] == ("aa", 1)       # 1-1 tie -> min value


# ------------------------------------------------------ lag autocorrelation

def test_lag_autocorr_perfect_weekly_cycle(spark):
    # 28 days of a strict period-7 pattern -> lag-7 r = +1.000
    base = 1_700_000_000_000_000  # µs epoch, day-aligned enough
    rows = []
    eid = 0
    for day in range(28):
        n = [5, 1, 1, 1, 1, 1, 1][day % 7]
        for _ in range(n):
            rows.append(Row(event_id=eid, ts=base + day * 86_400_000_000,
                            event_type="a"))
            eid += 1
    ev = spark.createDataFrame(rows).select(
        "event_id", (F.col("ts") / 1_000_000).cast("timestamp").alias("ts"),
        "event_type")
    out = st.lag_autocorrelation(ev, lag_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 28 and r["den"] > 0
    # 21 aligned pairs of a perfectly periodic series: num/den = 21/28
    assert r["r_milli"] == 750


def test_lag_autocorr_constant_series_null(spark):
    rows = [Row(event_id=i, ts=1_700_000_000 + i * 86_400, event_type="b")
            for i in range(10)]
    ev = spark.createDataFrame(rows).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = st.lag_autocorrelation(ev, lag_days=2).collect()
    assert out[0]["den"] == 0 and out[0]["r_milli"] is None
