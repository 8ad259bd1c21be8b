"""Round-5 wave 32: local clustering coefficients, Pettitt change-point
test, AMS tug-of-war F2 sketch."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import cms
from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------- clustering coef

def test_clustering_coefficients_triangle_with_pendant(spark):
    # triangle a-b-c plus pendant c-d
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=1),
         Row(src=3, dst=4)])
    got = {r["id"]: (r["degree"], r["n_tri"], r["cc_ppm"])
           for r in gr.clustering_coefficients(edges).collect()}
    assert got[1] == (2, 1, 1_000_000)
    assert got[2] == (2, 1, 1_000_000)
    assert got[3] == (3, 1, 333_333)      # 2*1e6 // (3*2)
    assert got[4] == (1, 0, None)         # undefined below degree 2


def test_clustering_coefficients_star_is_zero_and_direction_free(spark):
    # star center has no linked neighbor pair; reversed/duplicate edges
    # collapse to the same simple undirected graph
    edges = spark.createDataFrame(
        [Row(src=0, dst=i) for i in (1, 2, 3)]
        + [Row(src=2, dst=0), Row(src=0, dst=0)])
    got = {r["id"]: (r["degree"], r["n_tri"], r["cc_ppm"])
           for r in gr.clustering_coefficients(edges).collect()}
    assert got[0] == (3, 0, 0)
    assert all(got[i] == (1, 0, None) for i in (1, 2, 3))


def test_clustering_coefficients_match_brute_force(spark):
    edges = [(i, (i * i + 3) % 11) for i in range(11)] \
        + [(i, (i * 5 + 1) % 11) for i in range(11)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["id"]: (r["degree"], r["n_tri"])
           for r in gr.clustering_coefficients(df).collect()}
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    import itertools
    nodes = {v for e in und for v in e}
    for v in nodes:
        nbr = sorted({next(iter(e - {v})) for e in und if v in e})
        tri = sum(1 for p, q in itertools.combinations(nbr, 2)
                  if frozenset((p, q)) in und)
        assert got[v] == (len(nbr), tri), f"node {v}"


# ---------------------------------------------------------- pettitt_shift

def _series(spark, counts, key="k"):
    rows, eid = [], 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append(Row(k=key, ts=dt.datetime(2024, 1, day, 0, 0,
                                                  eid % 60),
                            event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def _epoch_day(day_of_jan_2024):
    return (dt.date(2024, 1, day_of_jan_2024)
            - dt.date(1970, 1, 1)).days


def test_pettitt_step_series_statistics(spark):
    # (1,1,1,10,10,10): the split after day 3 has all 9 cross pairs
    # discordant -> U_3 = -9; n=6 is too short for 95% significance
    ev = _series(spark, [1, 1, 1, 10, 10, 10])
    r = st.pettitt_shift(ev, key_col="k").collect()[0]
    assert r["n_days"] == 6
    assert r["u_stat"] == -9 and r["k_stat"] == 9
    assert r["change_day"] == _epoch_day(3)  # last day of the low regime
    assert r["shifted"] == 0


def test_pettitt_long_shift_fires_and_picks_the_boundary(spark):
    ev = _series(spark, [1] * 15 + [5] * 15)
    r = st.pettitt_shift(ev, key_col="k").collect()[0]
    assert r["n_days"] == 30
    assert r["u_stat"] == -225 and r["k_stat"] == 225
    assert r["shifted"] == 1
    # the maximizing split is exactly the regime boundary (day 15)
    assert r["change_day"] == _epoch_day(15)


def test_pettitt_constant_series_no_shift(spark):
    ev = _series(spark, [4] * 8)
    r = st.pettitt_shift(ev, key_col="k").collect()[0]
    assert r["k_stat"] == 0 and r["shifted"] == 0
    # tie on |U|=0 resolves to the EARLIEST split day
    assert r["change_day"] == _epoch_day(1)


def test_pettitt_recurrence_matches_definition(spark):
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    ev = _series(spark, counts)
    r = st.pettitt_shift(ev, key_col="k").collect()[0]
    n = len(counts)
    import itertools
    best = None
    for t in range(n - 1):
        u = sum((counts[i] > counts[j]) - (counts[i] < counts[j])
                for i, j in itertools.product(range(t + 1), range(t + 1, n)))
        if best is None or abs(u) > best[0]:
            best = (abs(u), t, u)
    assert (r["k_stat"], r["u_stat"]) == (best[0], best[2])


# ----------------------------------------------------------------- ams_f2

def test_ams_registers_merge_equals_whole(spark):
    df = spark.createDataFrame([Row(u=i % 7) for i in range(200)])
    whole = {r["reg"]: r["z"]
             for r in cms.ams_f2_registers(df, "u", n_reg=16).collect()}
    s1 = cms.ams_f2_registers(df.where(F.col("u") < 3), "u", n_reg=16)
    s2 = cms.ams_f2_registers(df.where(F.col("u") >= 3), "u", n_reg=16)
    merged = {r["reg"]: r["z"] for r in cms.ams_merge(s1, s2).collect()}
    assert merged == whole


def test_ams_estimate_close_to_exact_f2(spark):
    # skewed frequencies: key k appears k+1 times, F2 = sum (k+1)^2
    rows = [Row(u=k) for k in range(40) for _ in range(k + 1)]
    df = spark.createDataFrame(rows)
    exact = sum((k + 1) ** 2 for k in range(40))
    regs = cms.ams_f2_registers(df, "u", n_reg=64)
    est = cms.ams_f2_estimate(regs, n_reg=64).collect()[0]["f2_est"]
    assert abs(est - exact) / exact < 0.5  # sqrt(2/64) ~ 18% expected


def test_ams_weighted_equals_exploded(spark):
    w = spark.createDataFrame([Row(u=1, c=5), Row(u=2, c=3), Row(u=3, c=1)])
    flat = spark.createDataFrame(
        [Row(u=1)] * 5 + [Row(u=2)] * 3 + [Row(u=3)])
    a = {r["reg"]: r["z"] for r in
         cms.ams_f2_registers(w, "u", n_reg=8, weight_col="c").collect()}
    b = {r["reg"]: r["z"] for r in
         cms.ams_f2_registers(flat, "u", n_reg=8).collect()}
    assert a == b
