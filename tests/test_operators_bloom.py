"""Unit tests for operators/bloom.py: bitset packing, no-false-negatives
invariant, inset-vs-bitmap probe parity, prefilter selectivity, and
decontaminate_bloom == decontaminate end-to-end."""
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import bloom as bl
from plateau_gis_converter_spark.operators import dedup as dd

M, K = 1 << 14, 4


def test_pack_bitset_round_trip():
    pos = [0, 1, 7, 8, 13, 4095]
    buf = np.frombuffer(bl.pack_bitset(pos, 4096), dtype=np.uint8)
    got = [p for p in range(4096) if (buf[p >> 3] >> (p & 7)) & 1]
    assert got == sorted(pos)
    assert len(buf) == 512


@pytest.fixture(scope="module")
def member_df(spark):
    return spark.createDataFrame(
        [Row(w=f"member_{i}") for i in range(200)])


def test_no_false_negatives(spark, member_df):
    """Every member must probe True — the property decontaminate_bloom's
    result-identity rests on."""
    pos = bl.build_bloom_positions(member_df, "w", M, K)
    hits = member_df.where(
        bl.bloom_probe_inset(F.col("w"), pos, M, K)).count()
    assert hits == member_df.count()


def test_probe_parity_inset_vs_bitmap_vs_semijoin(spark, member_df):
    pos = bl.build_bloom_positions(member_df, "w", M, K)
    pos_df = bl.build_bloom_positions_df(member_df, "w", M, K)
    others = spark.createDataFrame(
        [Row(w=f"member_{i}") for i in range(100, 400)] +
        [Row(w=f"other_{i}") for i in range(300)])
    inset = {r["w"] for r in others.where(
        bl.bloom_probe_inset(F.col("w"), pos, M, K)).collect()}
    bitmap = {r["w"] for r in bl.with_bloom_probe_bitmap(
        others, "w", bl.pack_bitset(pos, M), M, K)
        .where(F.col("bloom_hit")).collect()}
    semijoin = {r["w"] for r in bl.bloom_prefilter_semijoin(
        others, "w", pos_df, M, K).collect()}
    assert inset == bitmap == semijoin
    assert {f"member_{i}" for i in range(100, 200)} <= inset


def test_semijoin_probe_plan_is_broadcast_map_side(spark, member_df):
    """The semi-join probe must compile to k broadcast LEFT SEMI hash
    joins with NO shuffle on the probed side and no Python stage."""
    pos_df = bl.build_bloom_positions_df(member_df, "w", M, K)
    out = bl.bloom_prefilter_semijoin(member_df, "w", pos_df, M, K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # the probed side must never shuffle (the only exchanges allowed are
    # the broadcast builds' internal distinct over the positions column)
    assert "hashpartitioning(w" not in plan
    assert "pythonUDF" not in plan.lower()


def test_empty_member_set_matches_nothing(spark, member_df):
    assert member_df.where(
        bl.bloom_probe_inset(F.col("w"), [], M, K)).count() == 0


def test_decontaminate_bloom_identical_to_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 89 == 0)
    exact = {(r["doc_id"], r["n_shared"], r["contaminated"])
             for r in dd.decontaminate(docs, bench, n=3,
                                       min_shared=2).collect()}
    for probe in ("inset", "bitmap", "semijoin"):
        got = {(r["doc_id"], r["n_shared"], r["contaminated"])
               for r in bl.decontaminate_bloom(
                   docs, bench, n=3, min_shared=2, m_bits=1 << 18, k=4,
                   probe=probe).collect()}
        assert got == exact, probe


def test_prefilter_actually_prunes(spark):
    """The bloom must reject most non-member shingles (otherwise it is a
    no-op tax): with m=2^18 and k=4 on a few thousand member bits the FPR
    is well under 1%, so candidate count should be far below the corpus
    shingle count and barely above the true-match count."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 89 == 0)
    train_sh = dd.shingles(docs, 3)
    bench_sh = dd.shingles(bench, 3).select("shingle").distinct()
    pos = bl.build_bloom_positions(bench_sh, "shingle", 1 << 18, 4)
    total = train_sh.count()
    true_matches = train_sh.join(bench_sh, "shingle").count()
    candidates = train_sh.where(
        bl.bloom_probe_inset(F.col("shingle"), pos, 1 << 18, 4)).count()
    assert candidates >= true_matches          # no false negatives
    assert candidates <= true_matches + max(10, int(0.01 * total))
    assert candidates < total // 2             # really prunes


def test_rejects_bad_probe(spark):
    docs = spark.range(1).select(F.lit("x").alias("text"),
                                 F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        bl.decontaminate_bloom(docs, docs, probe="nope")
