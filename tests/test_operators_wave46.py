"""Round-5 wave 46: TextRank keywords, SPRT monitor, FK discovery."""
import datetime as dt

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import text as tx
from plateau_gis_converter_spark.sources import layout as ly


# ----------------------------------------------------------------- textrank

def test_textrank_hub_term_wins(spark):
    # 'spark' is adjacent to everything; leaf terms point only at it
    docs = spark.createDataFrame([
        Row(text="spark joins spark windows spark aggs"),
        Row(text="fast spark"),
    ])
    out = tx.textrank_terms(docs, iters=2, k=3).collect()
    ranked = [r["term"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == "spark"
    assert all(r["score_e6"] > 0 for r in out)


def test_textrank_deterministic_and_capped(spark):
    docs = spark.createDataFrame(
        [Row(text=f"w{i} w{(i * 3) % 7} w{(i * 5) % 7}")
         for i in range(20)])
    a = sorted((r["rank"], r["term"], r["score_e6"])
               for r in tx.textrank_terms(docs, k=5).collect())
    b = sorted((r["rank"], r["term"], r["score_e6"])
               for r in tx.textrank_terms(docs, k=5).collect())
    assert a == b and len(a) == 5


# --------------------------------------------------------------------- SPRT

def _ev(spark, key, day_outcomes):
    rows, eid = [], 0
    for day, outcomes in day_outcomes:
        for y in outcomes:
            rows.append(Row(k=key, ts=dt.datetime(2024, 4, day), y=y,
                            event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_sprt_crosses_up_at_first_boundary_day(spark):
    # +100 per pos, -100 per neg, boundary 250: day1 +200, day2 +400
    ev = _ev(spark, "x", [(1, [1, 1]), (2, [1, 1]), (3, [0, 0, 0])])
    r = st.sprt_monitor(ev, "k", "ts", "y", 100, -100, 250).collect()[0]
    d2 = (dt.date(2024, 4, 2) - dt.date(1970, 1, 1)).days
    assert r["decision"] == 1 and r["decided_day"] == d2
    # the monitor reports the FINAL llr even after crossing
    assert r["llr_final_micro"] == 2 * 100 + 2 * 100 - 3 * 100


def test_sprt_undecided_and_down(spark):
    ev = _ev(spark, "flat", [(1, [1, 0]), (2, [0, 1])])
    r = st.sprt_monitor(ev, "k", "ts", "y", 100, -100, 250).collect()[0]
    assert r["decision"] == 0 and r["decided_day"] is None
    ev2 = _ev(spark, "down", [(1, [0, 0, 0])])
    r2 = st.sprt_monitor(ev2, "k", "ts", "y", 100, -100,
                         250).collect()[0]
    assert r2["decision"] == -1


# ----------------------------------------------------------- FK candidates

def test_inclusion_coefficients_directional(spark):
    tagged = spark.createDataFrame(
        [Row(set_name="small", v=v) for v in (1, 2, 3)]
        + [Row(set_name="big", v=v) for v in range(1, 11)]
        + [Row(set_name="small", v=2)])  # duplicates collapse
    got = {(r["set_a"], r["set_b"]):
           (r["n_a"], r["n_common"], r["containment_ppm"])
           for r in ly.inclusion_coefficients(tagged).collect()}
    assert got[("small", "big")] == (3, 3, 1_000_000)  # FK candidate
    assert got[("big", "small")] == (10, 3, 300_000)


def test_inclusion_disjoint_sets_absent(spark):
    tagged = spark.createDataFrame(
        [Row(set_name="a", v=1), Row(set_name="b", v=99)])
    assert ly.inclusion_coefficients(tagged).count() == 0
