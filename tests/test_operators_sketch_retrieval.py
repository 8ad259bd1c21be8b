"""Unit tests for the round-5 sketch/sampling/clustering/retrieval
operators: Misra-Gries heavy hitters (adversarial skew + losslessness),
weighted Bernoulli sampling (determinism + rate), grid-density
clustering (cluster shapes, noise, determinism), integer-exact BM25
(broadcast probe, monotonicity, float-path agreement)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import frequent as fq
from plateau_gis_converter_spark.operators import retrieval as rt
from plateau_gis_converter_spark.operators import sampling as sp
from plateau_gis_converter_spark.operators import spatial_cluster as sc


# ---------------------------------------------------------------- frequent

def _skewed_df(spark, n_hot=900, n_tail=600):
    """Zipf-ish stream: 3 hot keys + a long unique tail, shuffled across
    partitions (the adversarial case for per-partition sketches)."""
    rows = ([("hot_a",)] * n_hot + [("hot_b",)] * (n_hot // 2)
            + [("hot_c",)] * (n_hot // 3)
            + [(f"tail_{i}",) for i in range(n_tail)])
    return (spark.createDataFrame(rows, "k string")
            .repartition(8))  # round-robin: hot keys spread over partitions


def test_mg_merge_bound():
    # weighted MG never keeps more than k counters and never evicts a key
    # holding > total/(k+1)
    counters = {}
    fq._mg_merge(counters, {"a": 100, "b": 3, "c": 2, "d": 1}, k=2)
    assert len(counters) <= 2
    assert "a" in counters


def test_heavy_hitters_exact_equals_prefiltered(spark):
    df = _skewed_df(spark)
    k = 5
    got = sorted(map(tuple, fq.heavy_hitters(df, "k", k).collect()))
    exact = sorted(map(tuple,
                       fq.heavy_hitters(df, "k", k,
                                        prefilter=False).collect()))
    assert got == exact
    keys = [g[0] for g in got]
    assert "hot_a" in keys and "hot_b" in keys
    assert not any(key.startswith("tail_") for key in keys)


def test_heavy_hitters_threshold_is_strict(spark):
    # 4 keys x 25 each = 100 rows, k=3 => need cnt*4 > 100 i.e. cnt >= 26:
    # nobody qualifies (boundary: cnt == N/(k+1) exactly is NOT heavy)
    rows = [(f"k{i % 4}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    assert fq.heavy_hitters(df, "k", 3).count() == 0


def test_mg_candidates_bounded(spark):
    df = _skewed_df(spark)
    rows = fq.mg_candidates(df, "k", 5).collect()
    nparts = df.rdd.getNumPartitions()
    cands = [r for r in rows if r["k"] is not None]
    totals = [r["n"] for r in rows if r["k"] is None]
    assert len(cands) <= 5 * nparts          # <= k per partition
    assert len(totals) <= nparts
    assert sum(totals) == df.count()         # N piggybacks on the scan


def test_heavy_hitters_rejects_bad_k(spark):
    df = _skewed_df(spark, 10, 10)
    with pytest.raises(ValueError):
        fq.mg_candidates(df, "k", 0)


# ---------------------------------------------------------------- sampling

def test_weighted_sample_deterministic_and_monotone(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100).alias("w"))
    kept1 = {r["doc_id"] for r in
             sp.weighted_sample(df, "w", 100).collect()}
    kept2 = {r["doc_id"] for r in
             sp.weighted_sample(df.repartition(7), "w", 100).collect()}
    assert kept1 == kept2  # partitioning-independent
    # empirical rate tracks w/maxw: mean weight 49.5 => ~49.5% +- slack
    assert 0.40 * 4000 < len(kept1) < 0.60 * 4000
    # weight 0 rows never survive
    zeros = {r["doc_id"] for r in
             df.where(F.col("w") == 0).collect()}
    assert not (kept1 & zeros)


def test_weighted_sample_clamps(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit(10_000).alias("w"))  # >> max_weight: always keep
    assert sp.weighted_sample(df, "w", 100).count() == 50
    with pytest.raises(ValueError):
        sp.weighted_sample(df, "w", 0)


# ---------------------------------------------------------- spatial_cluster

def _pts(spark, coords):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)],
        "doc_id long, lng_udeg long, lat_udeg long")


def test_grid_cluster_merges_adjacent_cells(spark):
    # two dense blobs in cells (0,0)+(1,1) (diagonal-adjacent -> one
    # cluster) and a far blob; plus one isolated noise point
    blob1 = [(10 + i, 10) for i in range(3)]          # cell (0,0)
    blob2 = [(110 + i, 110) for i in range(3)]        # cell (1,1)
    far = [(9010 + i, 9010) for i in range(3)]        # cell (90,90)
    noise = [(5000, 5000)]
    out = sc.grid_cluster(_pts(spark, blob1 + blob2 + far + noise),
                          eps_udeg=100, min_count=3).collect()
    lab = {r["doc_id"]: r["cluster"] for r in out}
    c1 = {lab[i] for i in range(6)}           # blob1+blob2 merged
    assert len(c1) == 1 and -1 not in c1
    c2 = {lab[i] for i in range(6, 9)}
    assert len(c2) == 1 and c2 != c1
    assert lab[9] == -1                        # noise


def test_grid_cluster_label_is_min_cell_key(spark):
    pts = [(10 + i, 10) for i in range(3)] + [(110 + i, 110) for i in range(3)]
    out = sc.grid_cluster(_pts(spark, pts), eps_udeg=100, min_count=3)
    labels = {r["cluster"] for r in out.collect()}
    key00 = (0 + sc._OFF) * sc._SHIFT + (0 + sc._OFF)
    assert labels == {key00}


def test_grid_cluster_negative_coords(spark):
    # west/south hemisphere: floor (not trunc) cell indices
    pts = [(-10 - i, -10) for i in range(3)]
    out = sc.grid_cluster(_pts(spark, pts), eps_udeg=100, min_count=3)
    rows = out.collect()
    assert all(r["cluster"] != -1 for r in rows)
    key = (-1 + sc._OFF) * sc._SHIFT + (-1 + sc._OFF)
    assert {r["cluster"] for r in rows} == {key}


def test_grid_cluster_eps_validation(spark):
    with pytest.raises(ValueError):
        sc.assign_cells(_pts(spark, [(0, 0)]), eps_udeg=0)


# --------------------------------------------------------------- retrieval

def _docs(spark):
    rows = [
        (0, "apple pie apple pie apple pie"),
        (1, "apple pie cherry tart cherry tart"),
        (2, "cherry tart cherry tart cherry tart cherry tart"),
        (3, "grape jam grape jam"),
        (4, "apple pie grape jam cherry tart"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_rarity(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame([(0, "apple pie"), (1, "grape jam")],
                               "query_id long, term string")
    top = rt.bm25_topk(docs, qs, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    # 'apple pie': doc 0 has the highest tf of the term
    assert by_q[0][0] == 0
    # 'grape jam': doc 3 (tf=2) over doc 4 (tf=1)
    assert by_q[1][0] == 3
    # docs without the term never appear
    assert 2 not in by_q[1] and 3 not in by_q[0]


def test_bm25_rank_contiguous_and_bounded(spark):
    docs = _docs(spark)
    qs = rt.corpus_queries(docs, n_queries=2, skip=0)
    out = rt.bm25_topk(docs, qs, k=10).toPandas()
    for _, grp in out.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))


def test_bm25_float_path_agrees_on_ranking(spark):
    # single-term queries: both scorings are (positive idf) x the same
    # monotone tf-saturation, so the per-query ranking must be identical
    # (multi-term rankings may legitimately differ between the rational
    # idf surrogate and the ln idf — that trade-off is documented)
    docs = _docs(spark)
    qs = spark.createDataFrame(
        [(0, "apple pie"), (1, "cherry tart"), (2, "grape jam")],
        "query_id long, term string")
    a = rt.bm25_topk(docs, qs, k=5).toPandas()
    b = rt.bm25_topk(docs, qs, k=5, exact=False).toPandas()
    cols = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True))


def test_bm25_query_side_broadcast(spark):
    docs = _docs(spark)
    qs = rt.corpus_queries(docs, n_queries=2, skip=0)
    plan = (rt.bm25_topk(docs, qs, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_phrase_match_semantics(spark):
    from plateau_gis_converter_spark.operators import retrieval as rt

    docs = spark.createDataFrame(
        [(1, "the cat sat on the cat sat mat"),
         (2, "cat sat elsewhere the cat sat"),
         (3, "sat cat the")],
        ["doc_id", "text"])
    phrases = spark.createDataFrame(
        [(10, "cat sat"), (11, "the cat sat"), (12, "cat cat")],
        ["query_id", "phrase"])
    got = {(r["query_id"], r["doc_id"]): (r["n_hits"], r["first_pos"])
           for r in rt.phrase_match(docs, phrases).collect()}
    # doc1 tokens: the cat sat on the cat sat mat -> "cat sat" at 1 and 5
    assert got[(10, 1)] == (2, 1)
    assert got[(10, 2)] == (2, 0)
    # "the cat sat": doc1 at 0 and 4; doc2 at 3 only
    assert got[(11, 1)] == (2, 0)
    assert got[(11, 2)] == (1, 3)
    # scrambled tokens (doc3) never match; "cat cat" matches nowhere
    assert (12, 1) not in got and (12, 2) not in got and (12, 3) not in got
    assert not any(d == 3 for (_, d) in got)


def test_corpus_phrases_hit_source_doc(spark):
    from plateau_gis_converter_spark.operators import retrieval as rt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    phrases = rt.corpus_phrases(docs, every=97, start=3, length=4)
    n_q = phrases.count()
    assert n_q > 0
    hits = rt.phrase_match(docs, phrases)
    # every probe phrase must at minimum hit the doc it was cut from,
    # at exactly first position <= 3 (the cut offset)
    self_hits = hits.where(F.col("query_id") == F.col("doc_id")).collect()
    assert len(self_hits) == n_q
    for r in self_hits:
        assert r["n_hits"] >= 1 and r["first_pos"] <= 3
