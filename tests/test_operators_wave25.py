"""Round-5 wave 25: frame-sample digest contract, Fellegi-Sunter
scoring, shingle novelty."""
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import multimodal as mm


def test_frame_sample_digest_and_stride(spark):
    blob = b"x" * 200  # 3 fake frames, every 2nd sampled -> idx 0, 2
    df = spark.createDataFrame([Row(url="u", html=bytearray(blob))])
    out = {r["frame_idx"]: r["frame_digest"]
           for r in mm.frame_sample_stub(df, every_n=2).collect()}
    assert set(out) == {0, 2}
    assert out[0] == hashlib.md5(blob + b"0").hexdigest()
    assert out[2] == hashlib.md5(blob + b"2").hexdigest()


def test_frame_sample_short_blob_one_frame(spark):
    df = spark.createDataFrame([Row(url="u", html=bytearray(b"tiny"))])
    out = mm.frame_sample_stub(df).collect()
    assert len(out) == 1 and out[0]["frame_idx"] == 0


def _recs(spark):
    return spark.createDataFrame([
        Row(k=1, lang="en", src="a", band=3),
        Row(k=2, lang="en", src="a", band=3),   # all agree with 1
        Row(k=3, lang="en", src="b", band=3),   # 2 agree with 1
        Row(k=4, lang="fr", src="c", band=9),   # none agree with 1
    ])


def test_er_scores_three_classes_and_null_safe(spark):
    pairs = spark.createDataFrame([Row(key_a=1, key_b=2),
                                   Row(key_a=1, key_b=3),
                                   Row(key_a=1, key_b=4)])
    out = {(r["key_a"], r["key_b"]): (r["score"], r["match_class"])
           for r in dd.er_match_scores(
               pairs, _recs(spark), "k",
               [("lang", 15, -10), ("src", 12, -8), ("band", 8, -5)],
               upper=30, lower=5).collect()}
    assert out[(1, 2)] == (35, "match")
    assert out[(1, 3)] == (15, "possible")
    assert out[(1, 4)] == (-23, "nonmatch")
    # null-safe: two NULL fields agree
    recs = spark.createDataFrame([Row(k=1, lang=None), Row(k=2, lang=None)],
                                 schema="k bigint, lang string")
    pairs = spark.createDataFrame([Row(key_a=1, key_b=2)])
    [r] = dd.er_match_scores(pairs, recs, "k", [("lang", 7, -3)],
                             upper=7, lower=0).collect()
    assert (r["score"], r["match_class"]) == (7, "match")
    with pytest.raises(ValueError):
        dd.er_match_scores(pairs, recs, "k", [("lang", 7, -3)],
                           upper=0, lower=5)


def test_shingle_novelty_first_seen_wins(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta"),        # 2 shingles
        Row(doc_id=2, text="alpha beta gamma epsilon zeta"), # 1 of 3 reused
        Row(doc_id=3, text="alpha beta gamma delta"),        # exact dup
    ])
    out = {r["doc_id"]: (r["n_shingles"], r["n_first"], r["novelty_ppm"])
           for r in dd.shingle_novelty(docs).collect()}
    assert out[1] == (2, 2, 1_000_000)
    assert out[2] == (3, 2, 666_666)
    assert out[3] == (2, 0, 0)
