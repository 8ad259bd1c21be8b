"""Round-5 wave 51: gravity decay composition, vocab overlap reuse,
gap-entropy bot detection."""
import datetime as dt
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import temporal as tp


def _e(u, sec, eid):
    return Row(user_id=u, ts=dt.datetime(2024, 7, 1, 0, 0, 0)
               + dt.timedelta(seconds=sec), event_id=eid)


def test_bot_perfectly_regular_entropy_zero(spark):
    ev = spark.createDataFrame([_e(1, 30 * i, i) for i in range(25)])
    r = tp.bot_scores(ev, min_events=20).collect()[0]
    assert (r["n_events"], r["distinct_gaps"]) == (25, 1)
    assert r["entropy_micro"] <= 1 and r["bot"] == 1  # ±1 micro-nat quantization residue


def test_bot_irregular_high_entropy_not_flagged(spark):
    secs, t = [], 0
    for i in range(25):
        t += 7 + (i * 13) % 97  # scrambled gaps, mostly distinct
        secs.append(t)
    ev = spark.createDataFrame([_e(2, s, i) for i, s in enumerate(secs)])
    r = tp.bot_scores(ev, min_events=20).collect()[0]
    assert r["bot"] == 0
    assert r["entropy_micro"] > 2_000_000  # >2 nats


def test_bot_small_user_never_flagged(spark):
    ev = spark.createDataFrame([_e(3, 10 * i, i) for i in range(5)])
    r = tp.bot_scores(ev, min_events=20).collect()[0]
    assert r["entropy_micro"] <= 1 and r["bot"] == 0  # too few events


def test_bot_entropy_matches_scalar(spark):
    gaps = [10, 10, 20, 30, 30, 30]
    secs = [0]
    for g in gaps:
        secs.append(secs[-1] + g)
    ev = spark.createDataFrame([_e(4, s, i) for i, s in enumerate(secs)])
    r = tp.bot_scores(ev, min_events=3).collect()[0]
    n = len(gaps)
    s = sum(math.floor(math.log(c) * c * 1e6 + 0.5)
            for c in (2, 1, 3))  # counts of 10s, 20s, 30s
    want = math.floor(math.log(n) * 1e6 + 0.5) - s // n
    assert r["entropy_micro"] == want
    assert r["distinct_gaps"] == 3
