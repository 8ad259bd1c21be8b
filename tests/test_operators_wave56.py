"""Round-5 wave 56: Cramér's V, Gini coefficient, Zipf fit (via the
shared loglog machinery)."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st


# ---------------------------------------------------------------- cramers v

def test_cramers_v_perfect_and_independent(spark):
    # perfect association: b fully determined by a -> V = 1
    rows = [Row(a="x", b=0)] * 20 + [Row(a="y", b=1)] * 20
    r = st.cramers_v(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert r["v_milli"] == 1000
    # perfectly balanced independence -> chi2 = 0, V = 0
    rows2 = [Row(a=a, b=b) for a in "xy" for b in (0, 1)
             for _ in range(10)]
    r2 = st.cramers_v(spark.createDataFrame(rows2),
                      "a", "b").collect()[0]
    assert r2["chi2_micro"] <= 4  # quantization residue only
    assert r2["v_milli"] <= 10


def test_cramers_v_zero_cells_counted(spark):
    # 2x3 with an empty cell: chi2 must include the zero cell's E
    rows = ([Row(a="x", b=0)] * 6 + [Row(a="x", b=1)] * 3
            + [Row(a="y", b=1)] * 4 + [Row(a="y", b=2)] * 5)
    r = st.cramers_v(spark.createDataFrame(rows), "a", "b").collect()[0]
    import collections
    data = [("x", 0)] * 6 + [("x", 1)] * 3 + [("y", 1)] * 4 \
        + [("y", 2)] * 5
    n = len(data)
    ra = collections.Counter(a for a, _ in data)
    cb = collections.Counter(b for _, b in data)
    cells = collections.Counter(data)
    chi = sum(math.floor((cells[(a, b)] * n - ra[a] * cb[b]) ** 2
                         / (n * ra[a] * cb[b]) * 1e6 + 0.5)
              for (a, b) in cells)
    src = sum(ra[a] * cb[b] for (a, b) in cells)
    chi += math.floor((n - src / n) * 1e6 + 0.5)
    assert r["chi2_micro"] == chi
    want_v = math.floor(math.sqrt(chi / 1e6 / (n * 1)) * 1000 + 0.5)
    assert r["v_milli"] == want_v


# --------------------------------------------------------------------- gini

def test_gini_extremes(spark):
    even = spark.createDataFrame([Row(v=10)] * 8)
    r = st.gini_inequality(even, "v").collect()[0]
    assert r["gini_milli"] == 0
    # one holder of everything: G = (n-1)/n = 0.875
    skew = spark.createDataFrame([Row(v=0)] * 7 + [Row(v=100)])
    r2 = st.gini_inequality(skew, "v").collect()[0]
    assert r2["gini_milli"] == 875


def test_gini_matches_scalar(spark):
    vals = [(i * 7) % 23 + 1 for i in range(40)]
    r = st.gini_inequality(
        spark.createDataFrame([Row(v=v) for v in vals]),
        "v").collect()[0]
    xs = sorted(vals)
    n, s = len(xs), sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    want = math.floor((2 * s1 / (n * s) - (n + 1) / n) * 1000 + 0.5)
    assert (r["n"], r["total"], r["s1"]) == (n, s, s1)
    assert r["gini_milli"] == want


def test_gini_empty_null(spark):
    df = spark.createDataFrame([Row(v=0)] * 3)
    r = st.gini_inequality(df, "v").collect()[0]
    assert r["gini_milli"] is None  # all-zero: undefined
