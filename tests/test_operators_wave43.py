"""Round-5 wave 43: exact AUC, Kaplan-Meier survival, viewport top-k."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


# --------------------------------------------------------------------- AUC

def test_auc_perfect_and_reversed(spark):
    rows = [Row(s=i, y=1 if i >= 5 else 0) for i in range(10)]
    r = st.auc_roc(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert r["auc_micro"] == 1_000_000
    rows2 = [Row(s=i, y=0 if i >= 5 else 1) for i in range(10)]
    r2 = st.auc_roc(spark.createDataFrame(rows2), "s", "y").collect()[0]
    assert r2["auc_micro"] == 0


def test_auc_ties_count_half(spark):
    # all scores equal: AUC exactly 0.5 regardless of labels
    rows = [Row(s=7, y=i % 2) for i in range(20)]
    r = st.auc_roc(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert r["auc_micro"] == 500_000


def test_auc_single_class_null(spark):
    rows = [Row(s=i, y=1) for i in range(5)]
    r = st.auc_roc(spark.createDataFrame(rows), "s", "y").collect()[0]
    assert r["auc_micro"] is None and r["den"] == 0


def test_auc_matches_scalar(spark):
    data = [((i * 13) % 30, 1 if (i * 7) % 3 == 0 else 0)
            for i in range(90)]
    r = st.auc_roc(spark.createDataFrame(
        [Row(s=s, y=y) for s, y in data]), "s", "y").collect()[0]
    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    u = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
    want = math.floor(u / (len(pos) * len(neg)) * 1e6 + 0.5)
    assert r["auc_micro"] == want


# ----------------------------------------------------------- Kaplan-Meier

def test_km_textbook_curve(spark):
    # classic: events at t=1 (n=5), t=3 (n=3, after a censor at 2)
    rows = [Row(duration=1, event=1), Row(duration=2, event=0),
            Row(duration=3, event=1), Row(duration=4, event=0),
            Row(duration=5, event=0)]
    out = {r["t"]: r for r in tp.survival_km(
        spark.createDataFrame(rows)).collect()}
    assert sorted(out) == [1, 3]
    assert out[1]["n_at_risk"] == 5 and out[1]["d_events"] == 1
    assert out[3]["n_at_risk"] == 3
    # S(1) = 4/5, S(3) = 4/5 * 2/3
    s1 = math.floor(math.exp(
        math.floor(math.log(1 - 1 / 5) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5)
    assert out[1]["s_micro"] == s1
    ln3 = (math.floor(math.log(1 - 1 / 5) * 1e6 + 0.5)
           + math.floor(math.log(1 - 1 / 3) * 1e6 + 0.5))
    assert out[3]["ln_s_micro"] == ln3


def test_km_risk_exhaustion_is_zero(spark):
    rows = [Row(duration=1, event=1), Row(duration=2, event=1)]
    out = {r["t"]: r for r in tp.survival_km(
        spark.createDataFrame(rows)).collect()}
    assert out[2]["s_micro"] == 0 and out[2]["ln_s_micro"] is None
    assert out[1]["s_micro"] > 0


def test_km_grouped_curves_independent(spark):
    rows = ([Row(g="a", duration=1, event=1),
             Row(g="a", duration=2, event=0)]
            + [Row(g="b", duration=1, event=0),
               Row(g="b", duration=3, event=1)])
    out = {(r["g"], r["t"]): r for r in tp.survival_km(
        spark.createDataFrame(rows), group_col="g").collect()}
    assert set(out) == {("a", 1), ("b", 3)}
    assert out[("a", 1)]["n_at_risk"] == 2
    assert out[("b", 3)]["n_at_risk"] == 1
    assert out[("b", 3)]["s_micro"] == 0  # sole survivor churns


def test_km_censored_only_emits_nothing(spark):
    rows = [Row(duration=5, event=0), Row(duration=9, event=0)]
    assert tp.survival_km(spark.createDataFrame(rows)).count() == 0
