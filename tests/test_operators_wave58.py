"""Round-5 wave 58: Welch's t, top-k ranking overlap, capture-recapture."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------------------- welch t

def _sides(spark, a_vals, b_vals):
    return spark.createDataFrame(
        [Row(side="a", v=v) for v in a_vals]
        + [Row(side="b", v=v) for v in b_vals])


def test_welch_t_matches_scalar(spark):
    a = [10, 12, 14, 16, 18, 20]
    b = [11, 11, 12, 13]
    r = st.welch_t(_sides(spark, a, b), "side", "v").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sea, seb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sea + seb)
    dfree = (sea + seb) ** 2 / (sea ** 2 / (na - 1)
                                + seb ** 2 / (nb - 1))
    assert r["t_milli"] == math.floor(t * 1000 + 0.5)
    assert r["df_milli"] == math.floor(dfree * 1000 + 0.5)
    assert (r["n_a"], r["n_b"]) == (na, nb)


def test_welch_t_shifted_means_reject(spark):
    a = [100 + (i % 5) for i in range(60)]
    b = [130 + (i % 5) for i in range(60)]
    r = st.welch_t(_sides(spark, a, b), "side", "v").collect()[0]
    assert r["reject"] == 1 and r["t_milli"] < 0
    r2 = st.welch_t(_sides(spark, a, a), "side", "v").collect()[0]
    assert r2["reject"] == 0 and r2["t_milli"] == 0


# -------------------------------------------------------------- topk overlap

def test_topk_overlap_known_sets(spark):
    ra = spark.createDataFrame([Row(id=i, rank=i) for i in range(1, 21)])
    # b reverses the first 10: top-5 of b = ids 10..6
    order_b = list(range(10, 0, -1)) + list(range(11, 21))
    rb = spark.createDataFrame(
        [Row(id=i, rank=r + 1) for r, i in enumerate(order_b)])
    got = {r["k"]: r for r in st.topk_overlap(
        ra, rb, ks=(5, 10)).collect()}
    # top5(a) = {1..5}, top5(b) = {10..6}: disjoint
    assert got[5]["n_common"] == 0 and got[5]["jaccard_ppm"] == 0
    # top10 of both = {1..10}: identical
    assert got[10]["n_common"] == 10
    assert got[10]["jaccard_ppm"] == 1_000_000


# -------------------------------------------------------- capture-recapture

def test_capture_recapture_exact_case(spark):
    # population 100; sample A = first 50, B = ids 25..74: overlap 25
    rows = [Row(in_a=1 if i < 50 else 0,
                in_b=1 if 25 <= i < 75 else 0) for i in range(100)]
    r = st.capture_recapture(spark.createDataFrame(rows),
                             "in_a", "in_b").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (50, 50, 25)
    assert r["n_hat"] == 100  # exact recovery
    assert r["n_hat_chapman"] == (51 * 51) // 26 - 1


def test_capture_recapture_no_overlap_null(spark):
    rows = [Row(in_a=1, in_b=0), Row(in_a=0, in_b=1)]
    r = st.capture_recapture(spark.createDataFrame(rows),
                             "in_a", "in_b").collect()[0]
    assert r["n_hat"] is None
    assert r["n_hat_chapman"] == 2 * 2 // 1 - 1
