"""Round-5 wave 55: entry/exit pages, daily interpolation, odds ratio."""
import datetime as dt
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


def _e(u, minute, item, eid):
    return Row(user_id=u, ts=dt.datetime(2024, 10, 1, 9, minute),
               event_type=item, event_id=eid)


def test_entry_exit_flow_matrix(spark):
    ev = spark.createDataFrame([
        _e(1, 0, "home", 1), _e(1, 2, "search", 2), _e(1, 4, "buy", 3),
        _e(2, 0, "home", 4), _e(2, 1, "buy", 5),
        _e(3, 0, "search", 6),                      # singleton session
    ])
    got = {(r["entry_type"], r["exit_type"]): r["n_sessions"]
           for r in tp.entry_exit_pages(ev).collect()}
    assert got == {("home", "buy"): 2, ("search", "search"): 1}


def test_entry_exit_gap_splits_sessions(spark):
    ev = spark.createDataFrame([
        _e(1, 0, "a", 1),
        Row(user_id=1, ts=dt.datetime(2024, 10, 1, 11, 0),
            event_type="b", event_id=2),  # 2h gap: new session
    ])
    got = {(r["entry_type"], r["exit_type"]): r["n_sessions"]
           for r in tp.entry_exit_pages(ev).collect()}
    assert got == {("a", "a"): 1, ("b", "b"): 1}


# ----------------------------------------------------------- interpolation

def _daily(spark, day_values, key="k"):
    rows = []
    base = dt.datetime(2024, 10, 1)
    for day, v in day_values:
        rows.append(Row(event_type=key,
                        ts=base + dt.timedelta(days=day), value=v))
    return spark.createDataFrame(rows)


def test_interpolate_exact_lerp(spark):
    # observed day0=10, day3=40: days 1,2 lerp to 20, 30
    ev = _daily(spark, [(0, 10), (3, 40)])
    got = {r["day"]: (r["observed"], r["value"]) for r in
           tp.interpolate_daily(ev, value_col="value").collect()}
    d0 = min(got)
    assert got[d0] == (1, 10) and got[d0 + 3] == (1, 40)
    assert got[d0 + 1] == (0, 20) and got[d0 + 2] == (0, 30)


def test_interpolate_integer_division_and_sums(spark):
    # two rows on day0 SUM to 10; day2 = 17: midpoint floor((17-10)/2)
    ev = _daily(spark, [(0, 4), (0, 6), (2, 17)])
    got = {r["day"]: r["value"] for r in
           tp.interpolate_daily(ev, value_col="value").collect()}
    d0 = min(got)
    assert got[d0] == 10 and got[d0 + 2] == 17
    assert got[d0 + 1] == 10 + (17 - 10) * 1 // 2


# ------------------------------------------------------------- odds ratio

def test_odds_ratio_known_table(spark):
    # a=30, b=10, c=10, d=30: OR = 9
    rows = ([Row(e=1, y=1)] * 30 + [Row(e=1, y=0)] * 10
            + [Row(e=0, y=1)] * 10 + [Row(e=0, y=0)] * 30)
    r = st.odds_ratio(spark.createDataFrame(rows), "e", "y").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (30, 10, 10, 30)
    assert r["or_milli"] == 9000
    se = math.sqrt(1 / 30 + 1 / 10 + 1 / 10 + 1 / 30)
    assert r["lo_micro"] == math.floor(
        (math.log(9) - 1.96 * se) * 1e6 + 0.5)
    assert r["hi_micro"] == math.floor(
        (math.log(9) + 1.96 * se) * 1e6 + 0.5)
    # CI excludes 0 (ln OR = 0 <=> OR = 1): association is real
    assert r["lo_micro"] > 0


def test_odds_ratio_zero_cell_null(spark):
    rows = [Row(e=1, y=1), Row(e=0, y=0)]
    r = st.odds_ratio(spark.createDataFrame(rows), "e", "y").collect()[0]
    assert r["or_milli"] is None and r["lo_micro"] is None
