"""Unit tests for operators/temporal.py: as-of join directions, tie
inclusivity, tolerance, and interval-join binning edges (end exclusivity,
bin-straddling intervals, oversize-interval guard, keyed variant)."""
import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import temporal as tp

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts(5), tag="a"),
        Row(k=1, ts=_ts(10), tag="b"),   # exact tie with right @10
        Row(k=1, ts=_ts(11), tag="c"),
        Row(k=1, ts=_ts(100), tag="d"),
        Row(k=2, ts=_ts(7), tag="e"),    # key with no right rows at all
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts(3), v=30),
        Row(k=1, ts=_ts(10), v=100),
        Row(k=1, ts=_ts(50), v=500),
    ])
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {r["tag"]: (r["v_asof"], r["matched_ts_asof"])
           for r in tp.asof_join(left, right, on=["k"], values=["v"]).collect()}
    assert out["a"] == (30, _ts(3))
    assert out["b"] == (100, _ts(10))     # tie matches (inclusive)
    assert out["c"] == (100, _ts(10))
    assert out["d"] == (500, _ts(50))
    assert out["e"] == (None, None)       # no right rows for k=2


def test_asof_forward(spark, frames):
    left, right = frames
    out = {r["tag"]: r["v_asof"] for r in tp.asof_join(
        left, right, on=["k"], values=["v"], direction="forward").collect()}
    assert out["a"] == 100   # next right at/after t=5 is t=10
    assert out["b"] == 100   # inclusive tie
    assert out["c"] == 500
    assert out["d"] is None  # nothing after t=100
    assert out["e"] is None


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {r["tag"]: r["v_asof"] for r in tp.asof_join(
        left, right, on=["k"], values=["v"],
        tolerance_us=1_000_000).collect()}
    assert out["a"] is None          # 2s gap > 1s tolerance
    assert out["b"] == 100           # 0s gap
    assert out["c"] == 100           # 1s gap == tolerance
    assert out["d"] is None          # 50s gap


def test_asof_tolerance_boundary_inclusive(spark, frames):
    left, right = frames
    out = {r["tag"]: r["v_asof"] for r in tp.asof_join(
        left, right, on=["k"], values=["v"],
        tolerance_us=2_000_000).collect()}
    assert out["a"] == 30            # 2s gap == 2s tolerance -> kept


def test_asof_rejects_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        tp.asof_join(left, right, on=["k"], values=["v"], direction="up")


def test_interval_join_end_exclusive_and_straddle(spark):
    # bin width 10s; interval [5, 15) straddles bins 0 and 1
    iv = spark.createDataFrame(
        [Row(iid=1, start_ts=_ts(5), end_ts=_ts(15))])
    pts = spark.createDataFrame([
        Row(pid=1, ts=_ts(4)),    # before -> no
        Row(pid=2, ts=_ts(5)),    # start inclusive
        Row(pid=3, ts=_ts(9)),    # bin 0
        Row(pid=4, ts=_ts(12)),   # bin 1 (straddle side)
        Row(pid=5, ts=_ts(15)),   # end exclusive -> no
    ])
    got = sorted(r["pid"] for r in tp.interval_join_points(
        pts, iv, bin_width_us=10_000_000).collect())
    assert got == [2, 3, 4]


def test_interval_join_no_duplicate_matches(spark):
    # interval exactly one bin wide, aligned: must still match each point once
    iv = spark.createDataFrame(
        [Row(iid=1, start_ts=_ts(10), end_ts=_ts(20))])
    pts = spark.createDataFrame(
        [Row(pid=i, ts=_ts(10 + i)) for i in range(10)])
    rows = tp.interval_join_points(pts, iv, bin_width_us=10_000_000).collect()
    assert sorted(r["pid"] for r in rows) == list(range(10))


def test_interval_join_keyed(spark):
    iv = spark.createDataFrame([
        Row(u=1, iid=1, start_ts=_ts(0), end_ts=_ts(10)),
        Row(u=2, iid=2, start_ts=_ts(0), end_ts=_ts(10)),
    ])
    pts = spark.createDataFrame([
        Row(u=1, pid=1, ts=_ts(5)),
        Row(u=2, pid=2, ts=_ts(5)),
        Row(u=3, pid=3, ts=_ts(5)),
    ])
    rows = tp.interval_join_points(
        pts, iv, bin_width_us=10_000_000, keys=["u"]).collect()
    assert sorted((r["iid"], r["pid"]) for r in rows) == [(1, 1), (2, 2)]


def test_interval_longer_than_bin_raises(spark):
    iv = spark.createDataFrame(
        [Row(iid=1, start_ts=_ts(0), end_ts=_ts(25))])
    pts = spark.createDataFrame([Row(pid=1, ts=_ts(1))])
    with pytest.raises(Exception, match="interval longer"):
        tp.interval_join_points(pts, iv, bin_width_us=10_000_000).collect()


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas' independent merge_asof implementation
    on a randomized-but-deterministic fixture."""
    import pandas as pd

    rng = [(k, 1000 + 37 * i * i % 977, i) for k in (1, 2, 3)
           for i in range(40)]
    lpdf = pd.DataFrame(
        [{"k": k, "ts": pd.Timestamp(T0) + pd.Timedelta(seconds=s),
          "lid": 100 * k + i} for (k, s, i) in rng])
    rpdf = pd.DataFrame(
        [{"k": k, "ts": pd.Timestamp(T0) + pd.Timedelta(seconds=s + 3),
          "v": 10 * k + i} for (k, s, i) in rng if i % 3 == 0])
    # unique (k, ts) on the right: drop dup timestamps per key
    rpdf = (rpdf.sort_values(["k", "ts", "v"])
            .drop_duplicates(["k", "ts"], keep="last"))
    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward", allow_exact_matches=True)
    exp = {int(r.lid): (None if pd.isna(r.v) else int(r.v))
           for r in expected.itertuples()}
    out = tp.asof_join(spark.createDataFrame(lpdf),
                       spark.createDataFrame(rpdf),
                       on=["k"], values=["v"])
    got = {r["lid"]: r["v_asof"] for r in out.collect()}
    assert got == exp


def test_funnel_stages_semantics(spark):
    from datetime import datetime as DT

    from plateau_gis_converter_spark.operators import temporal as tp

    def t(s):
        return DT(2024, 1, 1, 0, 0, s)

    rows = [
        # u1 completes in order
        (1, t(1), "view"), (1, t(2), "noise"), (1, t(3), "signup"),
        (1, t(4), "purchase"),
        # u2: purchase BEFORE signup -> stage 2 only... view@1 signup@5
        # purchase@3 (before signup) then nothing -> stage 2
        (2, t(1), "view"), (2, t(3), "purchase"), (2, t(5), "signup"),
        # u3: signup first, view later, no purchase: view@4 -> signup
        # must be AFTER view -> signup@2 doesn't count -> stage 1
        (3, t(2), "signup"), (3, t(4), "view"),
        # u4: only noise -> stage 0
        (4, t(1), "noise"),
        # u5: same-second view+signup (strictly-greater rule) -> stage 1
        (5, t(1), "view"), (5, t(1), "signup"),
        # u6: greedy-earliest still finds later chain: view@1 signup@2
        # purchase@3 plus an earlier decoy purchase@0
        (6, t(0), "purchase"), (6, t(1), "view"), (6, t(2), "signup"),
        (6, t(3), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["user_id"]: r["stage"]
           for r in tp.funnel_stages(
               ev, ["view", "signup", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1, 6: 3}


def test_funnel_completed_ts_is_last_step(spark):
    from datetime import datetime as DT

    from plateau_gis_converter_spark.operators import temporal as tp

    ev = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 0, 0, 1), "view"),
         (1, DT(2024, 1, 1, 0, 0, 9), "signup")],
        ["user_id", "ts", "event_type"])
    r = tp.funnel_stages(ev, ["view", "signup", "purchase"]).collect()[0]
    assert r["stage"] == 2
    assert r["completed_ts_us"] == int(
        DT(2024, 1, 1, 0, 0, 9).timestamp() * 1_000_000)


def test_cohort_retention_matrix(spark):
    """Hand-checkable cohort matrix: u1 first week W0 active W0+W2,
    u2 first W0 active W0 only, u3 first W1 active W1+W2; NULL user
    dropped; multiple events in one week count once."""
    from pyspark.sql import functions as F

    from plateau_gis_converter_spark.operators import temporal as tp

    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-02 10:00:00", 1),  # W0 twice
        ("2024-01-15 10:00:00", 1),                              # W2
        ("2024-01-03 10:00:00", 2),                              # W0
        ("2024-01-08 10:00:00", 3), ("2024-01-16 10:00:00", 3),  # W1, W2
        ("2024-01-05 10:00:00", None),                           # dropped
    ]
    ev = (spark.createDataFrame(rows, "tss string, user_id long")
          .select(F.to_timestamp("tss").alias("ts"), "user_id"))
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in tp.cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01 00:00:00", 0): 2,   # u1, u2
        ("2024-01-01 00:00:00", 2): 1,   # u1
        ("2024-01-08 00:00:00", 0): 1,   # u3
        ("2024-01-08 00:00:00", 1): 1,   # u3
    }
