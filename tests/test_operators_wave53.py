"""Round-5 wave 53: tracking-param detection, activity streaks,
dispersion index."""
import datetime as dt

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp
from plateau_gis_converter_spark.operators import urls as ur


# ------------------------------------------------------------ tracking params

def test_tracking_param_rules(spark):
    pages = spark.createDataFrame(
        [Row(url=f"https://h{i % 5}.com/x?sid=u{i}&page={i % 3}"
             + ("&one=1" if i == 0 else ""))
         for i in range(30)])
    got = {r["param"]: r for r in ur.query_param_stats(
        pages, min_hosts=3, min_ndv=10).collect()}
    # sid: 30 distinct values across 5 hosts -> tracking
    assert got["sid"]["tracking"] == 1 and got["sid"]["n_values"] == 30
    # page: only 3 values -> content-bearing
    assert got["page"]["tracking"] == 0
    # one: single host, single value
    assert got["one"]["n_occurrences"] == 1 and got["one"]["tracking"] == 0


def test_tracking_param_no_query_urls_ignored(spark):
    pages = spark.createDataFrame(
        [Row(url="https://a.com/plain"), Row(url="https://b.com/x?k=v")])
    out = ur.query_param_stats(pages, min_hosts=1, min_ndv=1).collect()
    assert len(out) == 1 and out[0]["param"] == "k"


# -------------------------------------------------------------------- streaks

def _d(u, day):
    return Row(user_id=u, ts=dt.datetime(2024, 8, 1)
               + dt.timedelta(days=day, hours=u % 5))


def test_streaks_islands_and_current(spark):
    # user 1: days 0,1,2, 5,6, 10 -> streaks 3,2,1; current = 1
    ev = spark.createDataFrame(
        [_d(1, d) for d in (0, 1, 2, 5, 6, 10)]
        + [_d(1, 1)])  # duplicate day collapses
    r = tp.activity_streaks(ev).collect()[0]
    assert (r["n_active_days"], r["n_streaks"]) == (6, 3)
    assert r["max_streak"] == 3 and r["current_streak"] == 1


def test_streaks_current_equals_max_when_ending_hot(spark):
    ev = spark.createDataFrame([_d(2, d) for d in (0, 3, 4, 5, 6)])
    r = tp.activity_streaks(ev).collect()[0]
    assert r["max_streak"] == 4 and r["current_streak"] == 4


# ----------------------------------------------------------------- dispersion

def _series(spark, counts, key="k"):
    rows, eid = [], 0
    base = dt.datetime(2024, 8, 1)
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(Row(event_type=key,
                            ts=base + dt.timedelta(days=day,
                                                   minutes=eid % 60)))
            eid += 1
    return spark.createDataFrame(rows)


def test_dispersion_constant_zero_bursty_high(spark):
    r = st.dispersion_index(_series(spark, [5] * 10)).collect()[0]
    assert r["d_milli"] == 0 and r["overdispersed"] == 0
    # one 50-burst among zeros: heavily overdispersed
    r2 = st.dispersion_index(
        _series(spark, [0, 0, 50, 0, 0] + [1, 0, 0, 0, 1])).collect()[0]
    assert r2["d_milli"] > 10_000 and r2["overdispersed"] == 1


def test_dispersion_matches_scalar(spark):
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    r = st.dispersion_index(_series(spark, counts)).collect()[0]
    n, s = len(counts), sum(counts)
    q = sum(c * c for c in counts)
    import math
    want = math.floor((n * q - s * s) / (n * s) * 1000 + 0.5)
    assert r["d_milli"] == want
    assert r["s_total"] == s and r["n_days"] == n
