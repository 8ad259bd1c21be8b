"""Round-5 wave 31: OD flow matrix, Resource-Allocation link prediction,
Mann-Kendall trend test."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


# --------------------------------------------------------------- od_matrix

def test_od_matrix_counts_consecutive_hops(spark):
    rows = [
        # user 1 walks A -> B -> B -> C: trips A->B (B->B stationary,
        # dropped), B->C
        Row(user_id=1, ts=_ts(1, 0), event_id=10, cx=0, cy=0),
        Row(user_id=1, ts=_ts(1, 1), event_id=11, cx=1, cy=0),
        Row(user_id=1, ts=_ts(1, 2), event_id=12, cx=1, cy=0),
        Row(user_id=1, ts=_ts(1, 3), event_id=13, cx=2, cy=5),
        # user 2 also goes A -> B (flow aggregates across users)
        Row(user_id=2, ts=_ts(2, 0), event_id=20, cx=0, cy=0),
        Row(user_id=2, ts=_ts(2, 9), event_id=21, cx=1, cy=0),
        # user 3 has one event: no trips
        Row(user_id=3, ts=_ts(3, 0), event_id=30, cx=9, cy=9),
    ]
    out = tp.od_matrix(spark.createDataFrame(rows))
    got = {(r["o_cx"], r["o_cy"], r["d_cx"], r["d_cy"]): r["n_trips"]
           for r in out.collect()}
    assert got == {(0, 0, 1, 0): 2, (1, 0, 2, 5): 1}


def test_od_matrix_tie_order_and_stationary_flag(spark):
    # same-ts events order by the tiebreak column; keep_stationary keeps
    # the dwell pair
    rows = [
        Row(user_id=1, ts=_ts(1), event_id=2, cx=5, cy=0),
        Row(user_id=1, ts=_ts(1), event_id=1, cx=4, cy=0),
        Row(user_id=1, ts=_ts(2), event_id=3, cx=5, cy=0),
    ]
    out = tp.od_matrix(spark.createDataFrame(rows), drop_stationary=False)
    got = {(r["o_cx"], r["d_cx"]): r["n_trips"] for r in out.collect()}
    # order is (ts, event_id): 4 -> 5 -> 5
    assert got == {(4, 5): 1, (5, 5): 1}


# ----------------------------------------------------------- resource_alloc

def test_resource_allocation_weights_by_source_degree(spark):
    # sources: s1 links {a, b}        (deg 2, weight 500000)
    #          s2 links {a, b, c, d}  (deg 4, weight 250000)
    edges = spark.createDataFrame(
        [Row(src="s1", dst="a"), Row(src="s1", dst="b"),
         Row(src="s2", dst="a"), Row(src="s2", dst="b"),
         Row(src="s2", dst="c"), Row(src="s2", dst="d")])
    out = gr.resource_allocation_pairs(edges, min_count=1)
    got = {(r["page_a"], r["page_b"]): (r["n_common"], r["ra_e6"])
           for r in out.collect()}
    assert got[("a", "b")] == (2, 750000)   # both sources
    assert got[("a", "c")] == (1, 250000)   # only the hub
    assert got[("c", "d")] == (1, 250000)
    assert len(got) == 6


def test_resource_allocation_fanout_guard_and_min_count(spark):
    edges = spark.createDataFrame(
        [Row(src="hub", dst=f"p{i}") for i in range(10)]
        + [Row(src="s", dst="p0"), Row(src="s", dst="p1"),
           Row(src="t", dst="p0"), Row(src="t", dst="p1")])
    out = gr.resource_allocation_pairs(edges, min_count=2, max_fanout=5)
    got = {(r["page_a"], r["page_b"]): (r["n_common"], r["ra_e6"])
           for r in out.collect()}
    # the 10-fanout hub is dropped BEFORE the join; only (p0, p1) keeps
    # >= 2 common sources, each weight 500000
    assert got == {("p0", "p1"): (2, 1000000)}


def test_resource_allocation_matches_float_reference(spark):
    # deterministic graph; compare against a scalar recomputation
    edges = [(f"s{i}", f"p{(i * j) % 7}") for i in range(9)
             for j in (1, 2, 3)]
    df = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edges]).distinct()
    out = {(r["page_a"], r["page_b"]): r["ra_e6"]
           for r in gr.resource_allocation_pairs(df, min_count=1).collect()}
    from collections import defaultdict
    adj = defaultdict(set)
    for s, d in set(edges):
        adj[s].add(d)
    want = defaultdict(int)
    for s, ds in adj.items():
        w = 1_000_000 // len(ds)
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                want[(ds[i], ds[j])] += w
    assert out == dict(want)


# ------------------------------------------------------------- mann_kendall

def _mk(spark, counts_by_day, key="k"):
    rows = []
    eid = 0
    for day, c in counts_by_day.items():
        for _ in range(c):
            rows.append(Row(k=key, ts=_ts(day, eid % 60), event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_mann_kendall_monotone_series_flags_trend(spark):
    # strictly increasing daily counts over 10 days: S = 45 (all pairs
    # concordant), no ties, significant upward trend
    ev = _mk(spark, {d: d for d in range(1, 11)})
    r = st.mann_kendall(ev, key_col="k").collect()[0]
    n = 10
    assert r["n_days"] == n
    assert r["s_stat"] == n * (n - 1) // 2
    assert r["var18"] == n * (n - 1) * (2 * n + 5)
    assert r["trend"] == 1


def test_mann_kendall_gap_days_count_as_zeros(spark):
    # days 1 and 5 active, 2..4 silent: the zero days are real series
    # points (n_days = 5) and create ties among themselves
    ev = _mk(spark, {1: 2, 5: 3})
    r = st.mann_kendall(ev, key_col="k").collect()[0]
    assert r["n_days"] == 5
    # series (2, 0, 0, 0, 3): pairs with sign: 2 vs zeros = -3, 2 vs 3 =
    # +1, zeros vs 3 = +3, zeros vs zeros = 0  ->  S = 1
    assert r["s_stat"] == 1
    # tie group of three zeros: correction 3*2*11 = 66
    n = 5
    assert r["var18"] == n * (n - 1) * (2 * n + 5) - 66
    assert r["trend"] == 0


def test_mann_kendall_constant_series_s_zero(spark):
    ev = _mk(spark, {d: 4 for d in range(1, 8)})
    r = st.mann_kendall(ev, key_col="k").collect()[0]
    assert r["s_stat"] == 0 and r["trend"] == 0
    # all 7 days tied: var18 collapses to zero
    assert r["var18"] == 0


def test_mann_kendall_downward_and_multi_key(spark):
    up = _mk(spark, {d: d * 2 for d in range(1, 12)}, key="up")
    down = _mk(spark, {d: 24 - 2 * d for d in range(1, 12)}, key="down")
    out = {r["k"]: r for r in
           st.mann_kendall(up.unionAll(down), key_col="k").collect()}
    assert out["up"]["trend"] == 1
    assert out["down"]["trend"] == -1
    assert out["down"]["s_stat"] == -out["up"]["s_stat"]
