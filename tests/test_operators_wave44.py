"""Round-5 wave 44: Simpson diversity, MAD outliers, median imputation."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------------- simpson

def test_simpson_monoculture_vs_even_mix(spark):
    rows = [Row(g=1, cat="a")] * 10 \
        + [Row(g=2, cat=c) for c in "ab" * 5]
    got = {r["g"]: r for r in st.simpson_diversity(
        spark.createDataFrame(rows), "g", "cat").collect()}
    # monoculture: concentration exactly 1
    assert got[1]["concentration_ppm"] == 1_000_000
    assert got[1]["diversity_ppm"] == 0
    # even 5/5 mix: P(same) = 2 * 5*4 / (10*9) = 40/90
    assert got[2]["concentration_ppm"] == 1_000_000 * 40 // 90
    assert got[2]["n_cats"] == 2


def test_simpson_singleton_group_null(spark):
    rows = [Row(g=1, cat="a")]
    r = st.simpson_diversity(spark.createDataFrame(rows),
                             "g", "cat").collect()[0]
    assert r["concentration_ppm"] is None and r["diversity_ppm"] is None


# ------------------------------------------------------------ MAD outliers

def test_mad_flags_known_values(spark):
    # group: values 10,10,10,10,100 -> med 10, deviations 0,0,0,0,90
    # -> MAD 0 (degenerate): every x != med flags
    rows = [Row(k=i, g="a", v=10) for i in range(4)] \
        + [Row(k=9, g="a", v=100)]
    got = {r["k"]: r for r in st.mad_outlier_flags(
        spark.createDataFrame(rows), "g", "v", key_col="k").collect()}
    assert got[9]["outlier"] == 1 and got[9]["mad"] == 0
    assert all(got[i]["outlier"] == 0 for i in range(4))


def test_mad_normal_spread(spark):
    # 1..9 plus a 50: med 5 (of 10 values: type-1 -> 5), MAD over
    # deviations; only the 50 crosses 3*MAD
    rows = [Row(k=i, g="a", v=i) for i in range(1, 10)] \
        + [Row(k=50, g="a", v=50)]
    got = {r["k"]: r["outlier"] for r in st.mad_outlier_flags(
        spark.createDataFrame(rows), "g", "v", key_col="k",
        k_milli=3000).collect()}
    assert got[50] == 1
    assert sum(got.values()) == 1


def test_mad_groups_isolated(spark):
    rows = [Row(k=1, g="a", v=5), Row(k=2, g="a", v=5),
            Row(k=3, g="b", v=500), Row(k=4, g="b", v=500)]
    out = st.mad_outlier_flags(spark.createDataFrame(rows),
                               "g", "v", key_col="k").collect()
    assert all(r["outlier"] == 0 for r in out)
    meds = {r["g"]: r["med"] for r in out}
    assert meds == {"a": 5, "b": 500}


# --------------------------------------------------------- impute median

def test_impute_fills_with_group_median_and_flags(spark):
    rows = [Row(id=1, g="a", v=10), Row(id=2, g="a", v=20),
            Row(id=3, g="a", v=30), Row(id=4, g="a", v=None),
            Row(id=5, g="b", v=None)]
    got = {r["id"]: (r["v"], r["imputed"])
           for r in st.impute_group_median(
               spark.createDataFrame(rows), "g", "v").collect()}
    assert got[4] == (20, 1)          # type-1 median of {10,20,30}
    assert got[1] == (10, 0)
    # group b has no observed value: stays null, imputed 0
    assert got[5] == (None, 0)


def test_impute_even_group_uses_lower_median(spark):
    rows = [Row(id=1, g="a", v=10), Row(id=2, g="a", v=20),
            Row(id=3, g="a", v=None)]
    got = {r["id"]: r["v"] for r in st.impute_group_median(
        spark.createDataFrame(rows), "g", "v").collect()}
    assert got[3] == 10  # ceil(2/2)=1st value: type-1 lower median
