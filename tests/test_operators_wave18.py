"""Round-5 wave 18: redirect-chain resolution (pointer doubling),
generic hamming near-pairs, built-in streaming distinct."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import links as lk


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_resolve_redirects_chain_cycle_and_feeder(spark):
    # chain 10 -> 11 -> 12 (terminal); 2-cycle 20 <-> 21; feeder
    # 30 -> 20 (leads INTO the cycle); self-loop 40 -> 40
    e = _edges(spark, [(10, 11), (11, 12), (20, 21), (21, 20),
                       (30, 20), (40, 40)])
    out = {r["src"]: r for r in lk.resolve_redirects(e).collect()}
    assert out[10]["final"] == 12 and out[10]["hops"] == 2
    assert out[10]["status"] == "ok"
    assert out[11]["final"] == 12 and out[11]["hops"] == 1
    for s in (20, 21, 30, 40):
        assert out[s]["status"] == "cycle"
        assert out[s]["final"] is None and out[s]["hops"] is None
    assert len(out) == 6


def test_resolve_redirects_long_chain_exact_hops(spark):
    # a 40-hop chain needs > 5 doubling rounds on n=40 edges
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    out = {r["src"]: r for r in lk.resolve_redirects(e).collect()}
    assert out[0]["final"] == 40 and out[0]["hops"] == 40
    assert out[39]["final"] == 40 and out[39]["hops"] == 1
    assert all(r["status"] == "ok" for r in out.values())


def test_resolve_redirects_enforces_functional_min_dst(spark):
    e = _edges(spark, [(1, 5), (1, 3)])  # non-functional input
    out = lk.resolve_redirects(e).collect()
    assert len(out) == 1 and out[0]["final"] == 3


def test_hamming_near_pairs_exact_recall_vs_allpairs(spark):
    import hashlib

    def fp(i):
        base = int(hashlib.md5(f"g{i // 3}".encode()).hexdigest()[:15], 16)
        m = 0
        for j in range(i % 3):
            p = int(hashlib.md5(f"f{i}_{j}".encode()).hexdigest()[:2],
                    16) % 60
            m ^= 1 << p
        return base ^ m

    rows = [Row(k=i, fp=fp(i)) for i in range(60)]
    df = spark.createDataFrame(rows)
    got = {(r["key_a"], r["key_b"]): r["hamming"]
           for r in dd.hamming_near_pairs(df, "k", "fp", max_hamming=3,
                                          bits=60).collect()}
    want = {}
    for a in range(60):
        for b in range(a + 1, 60):
            h = bin(fp(a) ^ fp(b)).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want and len(want) > 0


def test_hamming_near_pairs_rejects_bad_radius(spark):
    import pytest
    df = spark.createDataFrame([Row(k=1, fp=0)])
    with pytest.raises(ValueError):
        dd.hamming_near_pairs(df, "k", "fp", max_hamming=4, bits=4)


def test_stream_distinct_matches_batch_distinct(spark):
    from plateau_gis_converter_spark.plans import entry_queries as eq

    sf = "/root/testdata/sf0.001"
    got = {(r["user_id"], r["event_type"])
           for r in eq.QUERIES["stream_distinct"](spark, sf).collect()}
    want = {(r["user_id"], r["event_type"])
            for r in spark.read.parquet(f"{sf}/events.parquet")
            .select("user_id", "event_type").distinct().collect()}
    assert got == want and len(want) > 0
