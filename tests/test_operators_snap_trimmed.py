"""Unit tests: point->segment snap join and trimmed group stats."""
import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import geometry as gm
from plateau_gis_converter_spark.operators import stats as st


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pt_id bigint, x bigint, y bigint")


def test_snap_three_distance_cases(spark):
    """One horizontal segment (0,0)->(100,0): a point before A, past B,
    and over the interior exercise all three exact branches."""
    segs = _segs(spark, [(1, 0, 0, 100, 0)])
    pts = _pts(spark, [(1, -30, 40),   # before A: d2 = 30^2+40^2 = 2500
                       (2, 130, -40),  # past B:  d2 = 2500
                       (3, 50, 7),     # interior: d2 = 49
                       (4, 50, 9999)])  # out of radius
    out = {r["pt_id"]: (r["seg_id"], r["d2"])
           for r in gm.snap_points_to_segments(pts, segs, 60).collect()}
    assert out == {1: (1, 2500.0), 2: (1, 2500.0), 3: (1, 49.0)}


def test_snap_argmin_and_ties(spark):
    segs = _segs(spark, [(7, 0, 10, 100, 10),    # 10 above
                         (3, 0, -10, 100, -10),  # 10 below (tie)
                         (9, 0, 4, 100, 4)])     # 4 above: nearest
    pts = _pts(spark, [(1, 50, 0)])
    row = gm.snap_points_to_segments(pts, segs, 50).collect()[0]
    assert (row["seg_id"], row["d2"]) == (9, 16.0)
    # drop the near one: the remaining d2=100 tie breaks to min seg_id
    row = gm.snap_points_to_segments(
        pts, segs.where(F.col("seg_id") != 9), 50).collect()[0]
    assert (row["seg_id"], row["d2"]) == (3, 100.0)


def test_snap_zero_length_segment(spark):
    segs = _segs(spark, [(1, 5, 5, 5, 5)])
    pts = _pts(spark, [(1, 8, 9)])
    row = gm.snap_points_to_segments(pts, segs, 10).collect()[0]
    assert row["d2"] == 25.0


def test_snap_overflow_guard_raises(spark):
    segs = _segs(spark, [(1, 0, 0, 10_000_000, 0)])
    pts = _pts(spark, [(1, 0, 0)])
    with pytest.raises(ValueError, match="overflow"):
        gm.snap_points_to_segments(pts, segs, 3000)


def test_snap_cell_recall_vs_brute_force(spark):
    """Every in-radius pair must survive the covering-cell candidate
    stage: compare against a brute-force argmin on a scattered grid."""
    pts = _pts(spark, [(i, (i * 37) % 500, (i * 91) % 500)
                       for i in range(120)])
    segs = _segs(spark, [(s, (s * 53) % 450, (s * 29) % 450,
                          (s * 53) % 450 + 60, (s * 29) % 450)
                         for s in range(40)])
    got = {(r["pt_id"], r["seg_id"], r["d2"])
           for r in gm.snap_points_to_segments(pts, segs, 45,
                                               cell_udeg=32).collect()}
    brute = {}
    for p in pts.collect():
        best = None
        for s in segs.collect():
            apx, apy = p["x"] - s["x1"], p["y"] - s["y1"]
            abx, aby = s["x2"] - s["x1"], s["y2"] - s["y1"]
            dot, den = apx * abx + apy * aby, abx * abx + aby * aby
            if dot <= 0:
                d2 = float(apx * apx + apy * apy)
            elif dot >= den:
                d2 = float((p["x"] - s["x2"]) ** 2 + (p["y"] - s["y2"]) ** 2)
            else:
                crs = apx * aby - apy * abx
                d2 = float(crs * crs) / float(den)
            if d2 <= 45 * 45 and (best is None or (d2, s["seg_id"]) < best):
                best = (d2, s["seg_id"])
        if best is not None:
            brute[p["pt_id"]] = best
    want = {(k, sid, d2) for k, (d2, sid) in brute.items()}
    assert got == want


def test_trimmed_stats_exact_small(spark):
    # 10 values: k = 1 -> drop min(0) and max(1000); mean of the rest
    vals = [0, 5, 5, 5, 7, 7, 9, 9, 11, 1000]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v bigint")
    row = st.trimmed_group_stats(df, "g", "v", trim_ppm=100_000).collect()[0]
    kept = sorted(vals)[1:-1]
    assert (row["n"], row["n_trim"], row["n_kept"]) == (10, 1, 8)
    assert row["sum_kept"] == sum(kept)
    assert row["mean_milli"] == 1000 * sum(kept) // len(kept)


def test_trimmed_stats_tie_heavy_values(spark):
    """Trimming cuts INSIDE a run of equal values — the count-relation
    form must keep exactly the right number of copies."""
    vals = [3] * 7 + [8] * 3
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v bigint")
    row = st.trimmed_group_stats(df, "g", "v", trim_ppm=200_000).collect()[0]
    # k = 2: drop two 3s and two 8s -> keep five 3s + one 8 = 23
    assert (row["n_kept"], row["sum_kept"]) == (6, 23)


def test_trimmed_stats_rejects_bad_ppm(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v bigint")
    with pytest.raises(ValueError):
        st.trimmed_group_stats(df, "g", "v", trim_ppm=500_000)
