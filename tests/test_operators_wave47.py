"""Round-5 wave 47: degree assortativity, power-law fit, attribution."""
import datetime as dt
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


# ----------------------------------------------------------- assortativity

def test_assortativity_regular_graph_null(spark):
    # a 4-cycle: every degree 2 -> zero variance -> NULL r
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i + 1) % 4) for i in range(4)])
    r = gr.degree_assortativity(edges).collect()[0]
    assert r["m_edges"] == 4 and r["r_milli"] is None


def test_assortativity_star_is_negative(spark):
    # star: hub degree n, leaves degree 1 -> perfectly disassortative
    edges = spark.createDataFrame([Row(src=0, dst=i)
                                   for i in range(1, 6)])
    r = gr.degree_assortativity(edges).collect()[0]
    assert r["r_milli"] == -1000


def test_assortativity_matches_scalar(spark):
    pairs = sorted({(min(a, b), max(a, b)) for a, b in
                    [((i * 3) % 9, (i * 5 + 1) % 9) for i in range(20)]
                    if a != b})
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    r = gr.degree_assortativity(edges).collect()[0]
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(pairs)
    s1 = sum(deg[a] + deg[b] for a, b in pairs)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in pairs)
    sjk = sum(deg[a] * deg[b] for a, b in pairs)
    num, den = 4 * m * sjk - s1 * s1, 2 * m * s2 - s1 * s1
    assert (r["m_edges"], r["s1"], r["s2"], r["sjk"]) == (m, s1, s2, sjk)
    assert r["r_milli"] == math.floor(num / den * 1000 + 0.5)


# ------------------------------------------------------------ power-law fit

def test_loglog_fit_exact_powerlaw(spark):
    # cnt = 1000 * x^-2: slope exactly -2 (up to micro quantization)
    hist = spark.createDataFrame(
        [Row(x=x, cnt=1000 // (x * x)) for x in (1, 2, 5, 10)])
    r = st.loglog_ols_fit(hist).collect()[0]
    assert r["n_points"] == 4
    assert abs(r["slope_milli"] + 2000) <= 2


def test_loglog_fit_degenerate_null(spark):
    hist = spark.createDataFrame([Row(x=3, cnt=7)])
    r = st.loglog_ols_fit(hist).collect()[0]
    assert r["slope_milli"] is None and r["intercept_milli"] is None


# -------------------------------------------------------------- attribution

def _e(u, minute, t, eid):
    return Row(user_id=u, ts=dt.datetime(2024, 5, 1, 10, minute),
               event_type=t, event_id=eid)


def test_attribution_last_and_first_touch(spark):
    ev = spark.createDataFrame([
        _e(1, 0, "ad", 1), _e(1, 5, "search", 2), _e(1, 9, "purchase", 3),
        _e(2, 0, "purchase", 4),                     # no touch: direct
        _e(3, 0, "search", 5), _e(3, 2, "purchase", 6),
        _e(3, 4, "purchase", 7),                     # search carries on
    ])
    last = {r["channel"]: r["n_conversions"] for r in
            tp.conversion_attribution(ev, "purchase").collect()}
    assert last == {"search": 3, "direct": 1}
    first = {r["channel"]: r["n_conversions"] for r in
             tp.conversion_attribution(ev, "purchase",
                                       model="first").collect()}
    # user 1's FIRST touch is the ad
    assert first == {"ad": 1, "search": 2, "direct": 1}


def test_attribution_shares_sum_to_one(spark):
    ev = spark.createDataFrame([
        _e(1, 0, "a", 1), _e(1, 1, "purchase", 2),
        _e(2, 0, "b", 3), _e(2, 1, "purchase", 4),
        _e(3, 0, "b", 5), _e(3, 1, "purchase", 6),
    ])
    rows = tp.conversion_attribution(ev, "purchase").collect()
    shares = {r["channel"]: r["share_ppm"] for r in rows}
    assert shares == {"a": 333_333, "b": 666_666}
