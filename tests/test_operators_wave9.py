"""Round-5 wave 9: KMV set operations, decayed activity counters,
within-group rank normalization, bigram collocations, label propagation."""
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import sampling as sp
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import text as tx


# ------------------------------------------------------------- kmv_set_ops

def _h60(key: str, salt: str = "bk0") -> int:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:15], 16)


def test_kmv_exact_when_union_fits(spark):
    """Union smaller than k: the sketch IS the distinct set, so both
    estimates are exact."""
    rows = ([Row(g="a", key=f"k{i}") for i in range(30)]
            + [Row(g="b", key=f"k{i}") for i in range(20, 50)])
    sk = sp.bottom_k_sketch(spark.createDataFrame(rows), "key", 64, ["g"])
    out = sp.kmv_set_ops(sk, "g", 64).collect()[0]
    assert out["union_est"] == 50 and out["inter_est"] == 10


def test_kmv_estimates_match_reference_formula(spark):
    """Full-sketch path: estimates equal a straight Python re-derivation
    of the KMV rule from the same md5 hashes, and land within the
    ~1/sqrt(k) band of truth."""
    k = 64
    rows = ([Row(g="a", key=f"k{i}") for i in range(0, 1000)]
            + [Row(g="b", key=f"k{i}") for i in range(500, 1500)])
    sk = sp.bottom_k_sketch(spark.createDataFrame(rows), "key", k, ["g"])
    out = sp.kmv_set_ops(sk, "g", k).collect()[0]
    ha = sorted(_h60(f"k{i}") for i in range(0, 1000))[:k]
    hb = sorted(_h60(f"k{i}") for i in range(500, 1500))[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    kth = merged[-1]
    exp_union = (k - 1) * (1 << 40) // max(kth >> 20, 1)
    m = len(set(merged) & set(ha) & set(hb))
    assert out["union_est"] == exp_union
    assert out["inter_est"] == m * exp_union // k
    assert abs(out["union_est"] - 1500) < 1500 * 3 / (k ** 0.5)
    assert abs(out["inter_est"] - 500) < 1500 * 3 / (k ** 0.5)


def test_kmv_disjoint_groups(spark):
    rows = ([Row(g="a", key=f"x{i}") for i in range(300)]
            + [Row(g="b", key=f"y{i}") for i in range(300)])
    sk = sp.bottom_k_sketch(spark.createDataFrame(rows), "key", 32, ["g"])
    out = sp.kmv_set_ops(sk, "g", 32).collect()[0]
    assert out["inter_est"] == 0


# ----------------------------------------------------------- decayed_counts

def test_decayed_counts_hand_check(spark):
    """3 events in the latest bucket, 2 one bucket back, 4 ancient."""
    us = 3_600_000_000
    rows = ([Row(k="h", ts_us=10 * us + i) for i in range(3)]
            + [Row(k="h", ts_us=9 * us + i) for i in range(2)]
            + [Row(k="h", ts_us=0 * us + i) for i in range(4)]
            + [Row(k="q", ts_us=10 * us)])
    df = spark.createDataFrame(rows).select(
        "k", F.timestamp_micros(F.col("ts_us")).alias("ts"))
    out = {r["k"]: r for r in st.decayed_counts(df, "k").collect()}
    assert out["h"]["n_events"] == 9
    assert out["h"]["last_bucket"] == 10
    # 3*1e6/2^0 + 2*1e6/2^1 + 4*1e6/2^10
    assert out["h"]["decayed_micro"] == 3_000_000 + 1_000_000 + 3906
    assert out["q"]["decayed_micro"] == 1_000_000


def test_decayed_counts_shift_cap(spark):
    us = 3_600_000_000
    df = spark.createDataFrame(
        [Row(k="h", ts_us=100 * us), Row(k="h", ts_us=0)]).select(
        "k", F.timestamp_micros(F.col("ts_us")).alias("ts"))
    out = st.decayed_counts(df, "k").collect()[0]
    assert out["decayed_micro"] == 1_000_000   # ancient bucket contributes 0


# ----------------------------------------------------- group_rank_normalize

def test_rank_normalize_bounds_ties_singletons(spark):
    df = spark.createDataFrame(
        [Row(g="x", k=i, v=(i * i) % 7) for i in range(5)]
        + [Row(g="y", k=1, v=9)])
    out = {(r["g"], r["k"]): r["pct_micro"]
           for r in st.group_rank_normalize(df, "g", "v", "k").collect()}
    assert out[("x", 0)] == 0 and out[("x", 2)] == 1_000_000
    assert out[("x", 3)] == 500_000 and out[("x", 4)] == 750_000  # tie by key
    assert out[("y", 1)] == 0                                     # singleton
    desc = {(r["g"], r["k"]): r["pct_micro"]
            for r in st.group_rank_normalize(
                df, "g", "v", "k", descending=True).collect()}
    assert desc[("x", 2)] == 0 and desc[("x", 0)] == 1_000_000


# ----------------------------------------------------- bigram_collocations

def test_collocations_hand_corpus(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="new york is big and new york is old")
         for i in range(5)])
    out = {(r["w_a"], r["w_b"]): r
           for r in tx.bigram_collocations(docs, min_count=5).collect()}
    # "new york": n_ab=10, n_a=n_b=10, N=45  ->  10*45*1e6/(10*10)
    assert out[("new", "york")]["lift_micro"] == 4_500_000
    assert out[("new", "york")]["n_ab"] == 10
    # "is" follows york 10x: 10*45*1e6/(10*10)
    assert out[("york", "is")]["lift_micro"] == 4_500_000
    assert ("big", "and") in out            # n_ab=5 passes min_count


def test_collocations_beat_independence_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tx.bigram_collocations(docs, min_count=5)
    top = out.orderBy(F.desc("lift_micro")).limit(5).collect()
    assert all(r["lift_micro"] > 1_000_000 for r in top)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ------------------------------------------------------- label_propagation

def test_lpa_separates_bridged_triangles(spark):
    e = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3),
         Row(src=4, dst=5), Row(src=5, dst=6), Row(src=4, dst=6),
         Row(src=3, dst=4)])
    lab = {r["id"]: r["community"]
           for r in gr.label_propagation(e, rounds=3).collect()}
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]
    assert lab[1] != lab[4]                  # CC would merge these
    cc = gr.connected_components(
        e.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")))
    assert cc.select("component_id").distinct().count() == 1


def test_lpa_deterministic_under_shuffle(spark):
    import random
    edges = [Row(src=random.Random(7).randrange(40),
                 dst=(i * 13) % 40) for i in range(120)]
    edges = [e for e in edges if e.src != e.dst]
    df = spark.createDataFrame(edges)
    a = sorted(map(tuple, gr.label_propagation(df, 3).collect()))
    b = sorted(map(tuple, gr.label_propagation(
        df.repartition(7).orderBy(F.rand(3)), 3).collect()))
    assert a == b
