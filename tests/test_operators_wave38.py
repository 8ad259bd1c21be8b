"""Round-5 wave 38: catalog column stats, ring winding normalization,
pair-level dedup evaluation."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import geometry as gm
from plateau_gis_converter_spark.sources import layout as ly


# -------------------------------------------------------------- table_stats

def test_table_stats_counts_ndv_minmax(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x", c=None), Row(a=2, b="y", c=5.0),
         Row(a=2, b=None, c=7.5)])
    got = {r["column"]: r for r in
           ly.table_stats(df, ["a", "b", "c"]).collect()}
    assert all(got[c]["n_rows"] == 3 for c in "abc")
    assert (got["a"]["n_nonnull"], got["a"]["ndv"]) == (3, 2)
    assert (got["a"]["vmin"], got["a"]["vmax"]) == ("1", "2")
    assert (got["b"]["n_nonnull"], got["b"]["ndv"]) == (2, 2)
    assert (got["b"]["vmin"], got["b"]["vmax"]) == ("x", "y")
    assert (got["c"]["n_nonnull"], got["c"]["ndv"]) == (2, 2)


def test_table_stats_all_null_column(spark):
    df = spark.createDataFrame([Row(a=1, b=None), Row(a=2, b=None)],
                               "a int, b string")
    got = {r["column"]: r for r in ly.table_stats(df, ["b"]).collect()}
    b = got["b"]
    assert (b["n_nonnull"], b["ndv"]) == (0, 0)
    assert b["vmin"] is None and b["vmax"] is None


# -------------------------------------------------------------- orient_rings

def _ring(spark, pts, poly=1, ring=0, reverse=False):
    n = len(pts)
    rows = []
    for j, (x, y) in enumerate(pts):
        idx = (n - j) % n if reverse else j
        rows.append(Row(poly_id=poly, ring=ring, idx=idx,
                        x_udeg=x, y_udeg=y))
    return spark.createDataFrame(rows)


SQ = [(0, 0), (10, 0), (10, 10), (0, 10)]       # CCW square
TRI = [(2, 2), (6, 2), (2, 6)]                  # CCW triangle


def _order(rows):
    return [(r["x_udeg"], r["y_udeg"])
            for r in sorted(rows, key=lambda r: r["idx"])]


def test_orient_exterior_flips_cw_to_ccw(spark):
    cw = _ring(spark, SQ, reverse=True)
    out = gm.orient_rings(cw).collect()
    assert all(r["flipped"] == 1 for r in out)
    # the re-indexed ring is the CCW traversal starting at vertex 0
    assert _order(out) == SQ
    # an already-CCW exterior passes through untouched
    ccw = _ring(spark, SQ)
    out2 = gm.orient_rings(ccw).collect()
    assert all(r["flipped"] == 0 for r in out2)
    assert _order(out2) == SQ


def test_orient_hole_flips_ccw_to_cw(spark):
    # ring 1 (a hole) must be CW: a CCW hole flips, a CW hole stays
    ccw_hole = _ring(spark, TRI, ring=1)
    out = gm.orient_rings(ccw_hole).collect()
    assert all(r["flipped"] == 1 for r in out)
    cw_hole = _ring(spark, TRI, ring=1, reverse=True)
    out2 = gm.orient_rings(cw_hole).collect()
    assert all(r["flipped"] == 0 for r in out2)


def test_orient_feeds_area_positive(spark):
    # composition: normalize then measure — area must come out positive
    cw = _ring(spark, SQ, reverse=True)
    fixed = gm.orient_rings(cw).select(
        F.col("poly_id"), F.col("idx").alias("i"),
        F.col("x_udeg").alias("x"), F.col("y_udeg").alias("y"))
    r = gm.ring_area2_centroid(fixed).collect()[0]
    assert r["area2_udeg2"] == 200  # 2 * 10 * 10


# ---------------------------------------------------------------- pair_eval

def _pairs(spark, pairs):
    return spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs])


def test_pair_eval_confusion_and_ppm(spark):
    pred = _pairs(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])
    truth = _pairs(spark, [(1, 2), (3, 4), (9, 10)])
    r = dd.pair_eval(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"]) == (4, 3)
    assert (r["tp"], r["fp"], r["fn"]) == (2, 2, 1)
    assert r["precision_ppm"] == 500_000
    assert r["recall_ppm"] == 666_666
    # f1 = 2PR/(P+R) in ppm, integer div
    assert r["f1_ppm"] == (2 * 500_000 * 666_666) // (500_000 + 666_666)


def test_pair_eval_canonicalizes_and_dedups(spark):
    # reversed order and duplicates collapse to the same pair
    pred = _pairs(spark, [(2, 1), (1, 2), (4, 3)])
    truth = _pairs(spark, [(1, 2), (3, 4)])
    r = dd.pair_eval(pred, truth).collect()[0]
    assert (r["n_pred"], r["tp"], r["fp"], r["fn"]) == (2, 2, 0, 0)
    assert r["precision_ppm"] == r["recall_ppm"] == 1_000_000
    assert r["f1_ppm"] == 1_000_000


def test_pair_eval_empty_sides_null_ratios(spark):
    empty = _pairs(spark, [(1, 2)]).where(F.col("doc_a") > 99)
    truth = _pairs(spark, [(1, 2)])
    r = dd.pair_eval(empty, truth).collect()[0]
    assert (r["n_pred"], r["tp"], r["fn"]) == (0, 0, 1)
    assert r["precision_ppm"] is None and r["f1_ppm"] is None
    assert r["recall_ppm"] == 0
