"""Round-5 wave 22: daily LOCF snapshot grid, sweep-line peak
concurrency (k-means is covered in wave 21's tests + the kmeans_geo
gate)."""
import datetime as dt

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import temporal as tp


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=dt.datetime.fromisoformat(t), event_id=i,
             event_type=s) for i, (u, t, s) in enumerate(rows)])


def test_daily_locf_fills_gaps_and_keeps_day_last(spark):
    ev = _ev(spark, [
        (1, "2026-01-01 09:00", "view"),
        (1, "2026-01-01 17:00", "buy"),      # day-last wins
        (1, "2026-01-04 08:00", "view"),     # 2 gap days before
        (2, "2026-01-02 12:00", "view"),     # single-day user
    ])
    out = {(r["key"], r["day"].day): (r["state"], r["is_gap"])
           for r in tp.daily_state_locf(ev).collect()}
    assert out == {
        (1, 1): ("buy", False),
        (1, 2): ("buy", True),
        (1, 3): ("buy", True),
        (1, 4): ("view", False),
        (2, 2): ("view", False),
    }


def test_daily_locf_tiebreak_by_event_id(spark):
    # same ts twice -> higher event_id (later row) wins
    ev = _ev(spark, [(1, "2026-01-01 09:00", "a"),
                     (1, "2026-01-01 09:00", "b")])
    [r] = tp.daily_state_locf(ev).collect()
    assert r["state"] == "b" and not r["is_gap"]


def _iv(spark, rows):
    return spark.createDataFrame(
        [Row(key=k, s=dt.datetime.fromisoformat(a),
             e=dt.datetime.fromisoformat(b)) for k, a, b in rows])


def test_peak_concurrency_sweep_and_boundary(spark):
    iv = _iv(spark, [
        ("h", "2026-01-01 09:00", "2026-01-01 10:00"),
        ("h", "2026-01-01 09:30", "2026-01-01 10:30"),  # overlaps -> 2
        ("h", "2026-01-01 10:00", "2026-01-01 11:00"),  # starts AT an end:
                                                        # -1 first -> still 2
        ("q", "2026-01-01 09:00", "2026-01-01 09:10"),
    ])
    out = {r["key"]: (r["peak"], r["first_peak_ts"])
           for r in tp.peak_concurrency(iv, "key", "s", "e").collect()}
    assert out["h"] == (2, dt.datetime.fromisoformat("2026-01-01 09:30"))
    assert out["q"][0] == 1


def test_peak_concurrency_triple_overlap(spark):
    iv = _iv(spark, [("h", "2026-01-01 09:00", "2026-01-01 12:00"),
                     ("h", "2026-01-01 10:00", "2026-01-01 11:00"),
                     ("h", "2026-01-01 10:30", "2026-01-01 10:45")])
    [r] = tp.peak_concurrency(iv, "key", "s", "e").collect()
    assert (r["peak"], r["first_peak_ts"].minute) == (3, 30)
