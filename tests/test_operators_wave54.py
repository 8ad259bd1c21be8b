"""Round-5 wave 54: association rules, cluster purity, smoothed rates."""
import datetime as dt

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


def _e(u, minute, item, eid):
    return Row(user_id=u, ts=dt.datetime(2024, 9, 1, 10, minute),
               event_type=item, event_id=eid)


def test_assoc_rules_confidence_and_lift(spark):
    # sessions: {a,b}, {a,b}, {a}, {b,c}  (4 sessions)
    ev = spark.createDataFrame([
        _e(1, 0, "a", 1), _e(1, 1, "b", 2),
        _e(2, 0, "a", 3), _e(2, 1, "b", 4),
        _e(3, 0, "a", 5),
        _e(4, 0, "b", 6), _e(4, 1, "c", 7),
    ])
    got = {(r["antecedent"], r["consequent"]): r for r in
           tp.association_rules(ev, min_sessions=2).collect()}
    ab = got[("a", "b")]
    # conf(a->b) = 2/3; lift = (2/4)/((3/4)(3/4)) = 8/9
    assert ab["confidence_ppm"] == 666_666
    assert ab["lift_milli"] == 1000 * 2 * 4 // (3 * 3)
    ba = got[("b", "a")]
    assert ba["confidence_ppm"] == 666_666  # 2 of 3 b-sessions
    # (b, c) has only 1 co-session: filtered by min_sessions
    assert ("b", "c") not in got


def test_assoc_rules_directed_pairs_differ(spark):
    # x in 4 sessions, y in 2, together 2: conf(x->y)=.5, conf(y->x)=1
    rows = []
    eid = 0
    for s in range(4):
        rows.append(_e(10 + s, 0, "x", eid)); eid += 1
        if s < 2:
            rows.append(_e(10 + s, 1, "y", eid)); eid += 1
    got = {(r["antecedent"], r["consequent"]): r["confidence_ppm"]
           for r in tp.association_rules(
               spark.createDataFrame(rows), min_sessions=2).collect()}
    assert got[("x", "y")] == 500_000
    assert got[("y", "x")] == 1_000_000


# ---------------------------------------------------------------- purity

def test_cluster_purity_known(spark):
    rows = ([Row(g=1, cl="en")] * 4 + [Row(g=1, cl="fr")]
            + [Row(g=2, cl="fr")] * 3)
    r = st.cluster_purity(spark.createDataFrame(rows),
                          "g", "cl").collect()[0]
    assert (r["n"], r["n_clusters"]) == (8, 2)
    assert r["n_majority"] == 4 + 3
    assert r["purity_ppm"] == 1_000_000 * 7 // 8


def test_cluster_purity_tie_breaks_to_smaller_class(spark):
    rows = [Row(g=1, cl="b"), Row(g=1, cl="a")]
    r = st.cluster_purity(spark.createDataFrame(rows),
                          "g", "cl").collect()[0]
    # tie: majority count is 1 either way; purity 1/2
    assert r["n_majority"] == 1 and r["purity_ppm"] == 500_000


# ------------------------------------------------------------ smoothed rates

def test_smoothed_rates_shrinkage(spark):
    rows = [Row(g="tiny", pos=1)] \
        + [Row(g="big", pos=1)] * 980 + [Row(g="big", pos=0)] * 20
    got = {r["g"]: r for r in st.smoothed_rates(
        spark.createDataFrame(rows), "g", "pos",
        alpha=5, beta=5).collect()}
    # tiny: raw 100% but smoothed (1+5)/(1+10) = 54.5%
    assert got["tiny"]["raw_ppm"] == 1_000_000
    assert got["tiny"]["smoothed_ppm"] == 1_000_000 * 6 // 11
    # big barely moves: (980+5)/(1000+10)
    assert got["big"]["smoothed_ppm"] == 1_000_000 * 985 // 1010
    assert got["big"]["smoothed_ppm"] < got["big"]["raw_ppm"]
    # the smoothed ORDER flips: big now outranks tiny
    assert got["big"]["smoothed_ppm"] > got["tiny"]["smoothed_ppm"]
