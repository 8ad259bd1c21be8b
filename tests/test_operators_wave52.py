"""Round-5 wave 52: BH FDR correction, PR curve, correlation matrix."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st


# -------------------------------------------------------------------- FDR BH

def test_bh_textbook_example(spark):
    # classic: p = .01, .02, .03, .04, .30 at alpha=.05, m=5:
    # thresholds k*alpha/m = .01,.02,.03,.04,.05 -> k_max=4
    ps = [10_000, 20_000, 30_000, 40_000, 300_000]
    df = spark.createDataFrame(
        [Row(id=i, p=p) for i, p in enumerate(ps)])
    got = {r["id"]: r["rejected"] for r in
           st.fdr_bh(df, "id", "p", alpha_ppm=50_000).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 0}


def test_bh_step_up_rescues_earlier_failures(spark):
    # p1 = .04 > 1*alpha/2 = .025 alone, but p2 = .05 <= 2*alpha/2:
    # the step-up rejects BOTH (the property Bonferroni lacks)
    df = spark.createDataFrame([Row(id=1, p=40_000), Row(id=2, p=50_000)])
    got = {r["id"]: r["rejected"] for r in
           st.fdr_bh(df, "id", "p", alpha_ppm=50_000).collect()}
    assert got == {1: 1, 2: 1}


def test_bh_nothing_significant(spark):
    df = spark.createDataFrame([Row(id=i, p=900_000 + i)
                                for i in range(5)])
    out = st.fdr_bh(df, "id", "p", alpha_ppm=50_000).collect()
    assert all(r["rejected"] == 0 for r in out)


# ------------------------------------------------------------------ PR curve

def test_pr_curve_points(spark):
    # scores 3,2,1 with labels 1,0,1
    df = spark.createDataFrame([Row(s=3, y=1), Row(s=2, y=0),
                                Row(s=1, y=1)])
    got = {r["thr"]: r for r in st.pr_curve(df, "s", "y").collect()}
    assert (got[3]["tp"], got[3]["fp"], got[3]["fn"]) == (1, 0, 1)
    assert got[3]["precision_ppm"] == 1_000_000
    assert got[3]["recall_ppm"] == 500_000
    assert (got[1]["tp"], got[1]["fp"], got[1]["fn"]) == (2, 1, 0)
    assert got[1]["recall_ppm"] == 1_000_000


def test_pr_curve_ties_grouped(spark):
    df = spark.createDataFrame([Row(s=5, y=1), Row(s=5, y=0),
                                Row(s=4, y=1)])
    got = {r["thr"]: r for r in st.pr_curve(df, "s", "y").collect()}
    assert len(got) == 2  # one point per DISTINCT threshold
    assert (got[5]["tp"], got[5]["fp"]) == (1, 1)


# ------------------------------------------------------------- corr matrix

def test_corr_matrix_known_pairs(spark):
    rows = [Row(a=i, b=2 * i + 3, c=-i, d=7) for i in range(20)]
    out = {(r["col_a"], r["col_b"]): r["r_milli"] for r in
           st.corr_matrix(spark.createDataFrame(rows),
                          ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == 1000    # perfect linear
    assert out[("a", "c")] == -1000   # perfect inverse
    assert out[("a", "d")] is None    # constant column
    assert len(out) == 6


def test_corr_matrix_matches_scalar(spark):
    data = [((i * 7) % 13, (i * 5) % 11) for i in range(50)]
    rows = [Row(a=a, b=b) for a, b in data]
    r = st.corr_matrix(spark.createDataFrame(rows),
                       ["a", "b"]).collect()[0]
    n = len(data)
    sa = sum(a for a, _ in data)
    sb = sum(b for _, b in data)
    qa = sum(a * a for a, _ in data)
    qb = sum(b * b for _, b in data)
    x = sum(a * b for a, b in data)
    want = math.floor((n * x - sa * sb)
                      / math.sqrt((n * qa - sa * sa)
                                  * (n * qb - sb * sb)) * 1000 + 0.5)
    assert r["r_milli"] == want and r["n"] == n
