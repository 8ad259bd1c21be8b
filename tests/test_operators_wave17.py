"""Round-5 wave 17: integer-exact trend slope, merge-on-read deletes,
watermarked stream-stream interval join."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.sources import layout as ly


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_type=k, ts=dt.datetime(2024, 3, 1 + d, 12, 0, 0),
             event_id=i, user_id=1)
         for i, (k, d) in enumerate(rows)])


def test_trend_slope_exact_positive_negative_and_singleton(spark):
    rows = []
    # "up": counts 1,2,3 on days 0,1,2 -> slope exactly +1/day
    for d, c in [(0, 1), (1, 2), (2, 3)]:
        rows += [("up", d)] * c
    # "down": counts 5,3,1 -> slope exactly -2/day
    for d, c in [(0, 5), (1, 3), (2, 1)]:
        rows += [("down", d)] * c
    # "one": single active day -> NULL slope, kept
    rows += [("one", 1)] * 4
    out = {r["event_type"]: r
           for r in st.trend_slope(_ev(spark, rows)).collect()}
    assert out["up"]["slope_uday"] == 1_000_000
    assert out["down"]["slope_uday"] == -2_000_000
    assert out["one"]["slope_uday"] is None
    assert out["one"]["n_days"] == 1 and out["one"]["total_events"] == 4
    assert out["up"]["total_events"] == 6


def test_trend_slope_truncates_like_duckdb(spark):
    # counts 2,1 on days 0,1 -> slope -1; counts 1,2,2 -> num=+1e6*? check
    # a non-integer slope: counts 1,1,2 -> slope = +1/2 -> 500000 exact;
    # counts 2,1,1 -> slope = -1/2 -> div truncation gives -500000
    rows = []
    for d, c in [(0, 1), (1, 1), (2, 2)]:
        rows += [("a", d)] * c
    for d, c in [(0, 2), (1, 1), (2, 1)]:
        rows += [("b", d)] * c
    out = {r["event_type"]: r["slope_uday"]
           for r in st.trend_slope(_ev(spark, rows)).collect()}
    assert out["a"] == 500_000
    assert out["b"] == -500_000


def test_merge_on_read_sequence_rules(spark):
    data = spark.createDataFrame(
        [Row(doc_id=i, lang=lang, file_path="f0", pos=i, data_seq=seq)
         for i, (lang, seq) in enumerate(
             [("en", 1), ("en", 3), ("de", 1), ("de", 3), ("fr", 2)])])
    # positional deletes: pos 0 at seq 2 (applies: 2>=1), pos 1 at seq 2
    # (does NOT apply: 2 < 3)
    pos_del = spark.createDataFrame(
        [Row(file_path="f0", pos=0, delete_seq=2),
         Row(file_path="f0", pos=1, delete_seq=2)])
    # equality deletes: de@2 kills data_seq<2 only (strict >); fr@2 does
    # NOT kill the fr row at data_seq=2 (equal, same-commit rule)
    eq_del = spark.createDataFrame(
        [Row(lang="de", delete_seq=2), Row(lang="fr", delete_seq=2)])
    out = sorted(r["doc_id"] for r in
                 ly.merge_on_read(data, pos_del, eq_del,
                                  eq_cols=["lang"]).collect())
    # doc 0 removed (positional), doc 2 removed (equality de seq1<2);
    # docs 1 (pos delete too old), 3 (de seq3>2), 4 (fr equal seq) stay
    assert out == [1, 3, 4]


def test_merge_on_read_requires_eq_cols(spark):
    import pytest
    d = spark.createDataFrame([Row(file_path="f", pos=0, data_seq=1)])
    p = spark.createDataFrame([Row(file_path="f", pos=9, delete_seq=1)])
    with pytest.raises(ValueError):
        ly.merge_on_read(d, p, eq_deletes=p, eq_cols=[])


def test_merge_on_read_broadcasts_both_delete_sides(spark):
    d = spark.createDataFrame(
        [Row(file_path="f", pos=i, data_seq=1, lang="en")
         for i in range(10)])
    p = spark.createDataFrame([Row(file_path="f", pos=0, delete_seq=5)])
    e = spark.createDataFrame([Row(lang="de", delete_seq=5)])
    plan = (ly.merge_on_read(d, p, e, eq_cols=["lang"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin") >= 2


def test_stream_followup_join_matches_static_interval_join(spark):
    from plateau_gis_converter_spark.plans import entry_queries as eq

    sf = "/root/testdata/sf0.001"
    got = eq.QUERIES["stream_followup"](spark, sf)
    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    a = ev.where(F.col("event_type") == "view").alias("a")
    b = ev.where(F.col("event_type") == "purchase").alias("b")
    want = a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                  & (F.col("b.ts") >= F.col("a.ts"))
                  & (F.col("b.ts") <= F.col("a.ts")
                     + F.expr("INTERVAL 2 HOURS")))
    key = lambda r: (r["l_event_id"], r["r_event_id"])
    gotset = {key(r): r["lag_us"] for r in got.collect()}
    wrows = want.select(F.col("a.event_id").alias("l"),
                        F.col("b.event_id").alias("r"),
                        (F.unix_micros(F.col("b.ts"))
                         - F.unix_micros(F.col("a.ts"))).alias("lag_us")
                        ).collect()
    assert gotset == {(r["l"], r["r"]): r["lag_us"] for r in wrows}
    assert len(gotset) > 0
