"""Round-5 wave 40: JSON key profiling, sliding token windows, Poisson
bootstrap CI."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import text as tx
from plateau_gis_converter_spark.sources import layout as ly


# ------------------------------------------------------------ json_key_stats

def test_json_key_stats_types_and_share(spark):
    df = spark.createDataFrame([
        Row(props='{"a": 1, "b": "x"}'),
        Row(props='{"a": -2.5, "b": "y", "c": true}'),
        Row(props='{"a": null}'),
        Row(props="not json at all"),
    ])
    got = {(r["key"], r["vtype"]): (r["n"], r["share_ppm"])
           for r in ly.json_key_stats(df).collect()}
    # key a appears in 3 of 4 rows with three different types
    assert got[("a", "int")] == (1, 750_000)
    assert got[("a", "float")] == (1, 750_000)
    assert got[("a", "null")] == (1, 750_000)
    assert got[("b", "string")] == (2, 500_000)
    assert got[("c", "bool")] == (1, 250_000)
    assert len(got) == 5  # malformed row contributes nothing


# ------------------------------------------------------------- token_windows

def test_token_windows_geometry(spark):
    # 10 tokens, window 4, stride 3: starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    out = {r["win_id"]: r for r in tx.token_windows(
        spark.createDataFrame([Row(doc_id=1, text=text)]),
        window=4, stride=3).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0]["window_text"] == "t0 t1 t2 t3"
    assert out[1]["window_text"] == "t3 t4 t5 t6"
    assert (out[3]["start_tok"], out[3]["n_tokens"]) == (9, 1)
    assert out[3]["window_text"] == "t9"


def test_token_windows_overlap_covers_everything(spark):
    text = " ".join(f"w{i}" for i in range(57))
    rows = tx.token_windows(
        spark.createDataFrame([Row(doc_id=1, text=text)]),
        window=16, stride=8).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["start_tok"],
                             r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(57))
    # empty docs emit nothing
    assert tx.token_windows(
        spark.createDataFrame([Row(doc_id=2, text="  ")]),
        window=4, stride=2).count() == 0


# --------------------------------------------------------------- bootstrap CI

def test_bootstrap_ci_brackets_the_mean_and_is_deterministic(spark):
    rows = [Row(doc_id=i, v=(i * 37) % 100) for i in range(400)]
    df = spark.createDataFrame(rows)
    r1 = st.bootstrap_mean_ci(df, "v", n_resamples=40).collect()[0]
    r2 = st.bootstrap_mean_ci(df, "v", n_resamples=40).collect()[0]
    assert r1 == r2  # fully deterministic
    assert r1["n"] == 400 and r1["n_resamples"] == 40
    # CI must bracket the full-sample mean and be a sane width
    assert r1["lo_milli"] <= r1["mean_milli"] <= r1["hi_milli"]
    width = r1["hi_milli"] - r1["lo_milli"]
    # sd ~ 29, se ~ 1.45 -> 95% CI width ~ 5.7 in value = 5700 milli;
    # allow generous slack for the 40-replicate quantile noise
    assert 1000 < width < 15000


def test_bootstrap_weights_mean_one(spark):
    # the Poisson(1) thresholds: weights over many draws average ~1
    import hashlib

    from plateau_gis_converter_spark.operators.stats import POISSON1_T60
    total = 0
    n = 3000
    for i in range(n):
        h = int(hashlib.md5(f"{i}:bs0".encode()).hexdigest()[:15], 16)
        w = 5
        for k, t in enumerate(POISSON1_T60):
            if h < t:
                w = k
                break
        total += w
    assert abs(total / n - 1.0) < 0.08


def test_bootstrap_ci_nulls_dropped(spark):
    rows = [Row(doc_id=i, v=10) for i in range(50)] \
        + [Row(doc_id=99, v=None)]
    r = st.bootstrap_mean_ci(spark.createDataFrame(rows), "v",
                             n_resamples=10).collect()[0]
    assert r["n"] == 50
    # constant values: every replicate mean is exactly 10000 milli
    assert r["lo_milli"] == r["hi_milli"] == r["mean_milli"] == 10_000
