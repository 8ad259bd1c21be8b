"""Round-5 curation wave 8: LM rarity scoring, C4 paragraph dedup,
content-defined chunking, exact-count stratified splits, recrawl
prioritization."""
import itertools
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import frontier as fr
from plateau_gis_converter_spark.operators import lm
from plateau_gis_converter_spark.operators import sampling as sp


# ---------------------------------------------------------------- lm_rarity

@pytest.fixture(scope="module")
def lm_docs(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="THE QUICK BROWN FOX jumps over the lazy dog"),
        Row(doc_id=3, text="zz"),                       # < n chars
        Row(doc_id=4, text="qxq zzq jxq qqq vvv wwpq"),  # garbage
    ])


def test_lm_rarity_case_insensitive_and_ranks_garbage(spark, lm_docs):
    model = lm.char_ngram_model(lm_docs.where("doc_id <= 2"))
    out = {r["doc_id"]: r for r in lm.lm_rarity(lm_docs, model).collect()}
    assert out[1]["rarity_micro"] == out[2]["rarity_micro"]  # lower() folds
    assert out[4]["rarity_micro"] > 2 * out[1]["rarity_micro"]
    assert out[3] == Row(doc_id=3, n_grams=0, rarity_micro=0)


def test_lm_rarity_hand_check(spark):
    # model: "aaaa" -> grams aaa,aaa -> cnt(aaa)=2, T=2
    ref = spark.createDataFrame([Row(doc_id=0, text="aaaa")])
    model = lm.char_ngram_model(ref)
    docs = spark.createDataFrame([Row(doc_id=1, text="aaa"),
                                  Row(doc_id=2, text="bbb")])
    out = {r["doc_id"]: r["rarity_micro"]
           for r in lm.lm_rarity(docs, model).collect()}
    # known gram: (2*1e6) div (2+1); unknown: (2*1e6) div 1
    assert out[1] == 666_666
    assert out[2] == 2_000_000


def test_lm_model_bounded_and_plan_broadcasts(spark, lm_docs):
    model = lm.char_ngram_model(lm_docs)
    assert model.count() <= 26 ** 3 + 100
    plan = (lm.lm_rarity(lm_docs, model)
            ._jdf.queryExecution().executedPlan().toString())
    # the gram-keyed model probe must broadcast (the corpus side never
    # shuffles on gram); the final doc_id base join may legitimately
    # shuffle — both sides are corpus-sized
    assert "BroadcastHashJoin [gram" in plan
    assert "SortMergeJoin [gram" not in plan


def test_nll_score_orders_like_rarity(spark, lm_docs):
    model = lm.char_ngram_model(lm_docs.where("doc_id <= 2"))
    rar = {r["doc_id"]: r["rarity_micro"]
           for r in lm.lm_rarity(lm_docs, model).collect()}
    nll = {r["doc_id"]: r["nll_per_gram"]
           for r in lm.nll_score(lm_docs, model).collect()}
    assert (rar[4] > rar[1]) == (nll[4] > nll[1])


# ---------------------------------------------------------- paragraph_dedup

@pytest.fixture(scope="module")
def para_docs(spark):
    return spark.createDataFrame([
        Row(doc_id=10, text="alpha\nbeta\ngamma"),
        Row(doc_id=11, text="beta\ndelta"),
        Row(doc_id=12, text="alpha\n\nbeta"),
        Row(doc_id=13, text="beta"),
    ])


def test_paragraph_dedup_keeps_first_occurrence(spark, para_docs):
    out = {r["doc_id"]: r for r in dd.paragraph_dedup(para_docs).collect()}
    assert out[10]["text"] == "alpha\nbeta\ngamma"      # all first
    assert out[11]["text"] == "delta"                   # beta seen in 10
    assert out[12]["text"] == ""                        # only the empty para
    assert out[13]["text"] == ""
    assert out[12]["n_paras"] == 3 and out[12]["n_removed"] == 2
    assert out[13]["n_removed"] == 1
    assert len(out) == 4                                # every doc kept


def test_paragraph_dedup_within_doc_repeat(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x\ny\nx")])
    out = dd.paragraph_dedup(docs).collect()[0]
    assert out["text"] == "x\ny" and out["n_removed"] == 1


def test_paragraph_dedup_total_paragraph_conservation(spark, para_docs):
    """Every distinct non-empty paragraph survives exactly once."""
    out = dd.paragraph_dedup(para_docs)
    kept = (out.select(F.explode(F.split("text", "\n", -1)).alias("p"))
            .where(F.col("p") != "").groupBy("p").count().collect())
    assert all(r["count"] == 1 for r in kept)
    assert {r["p"] for r in kept} == {"alpha", "beta", "gamma", "delta"}


# --------------------------------------------------------------- CDC chunks

@pytest.fixture(scope="module")
def cdc_docs(spark):
    base = " ".join(f"w{i % 23}x{i % 7}" for i in range(120))
    return spark.createDataFrame([
        Row(doc_id=1, text=base),
        Row(doc_id=2, text="inserted " + base),   # one-word shift
        Row(doc_id=3, text="tiny"),
        Row(doc_id=4, text=""),
    ])


def test_cdc_chunks_tile_exactly(spark, cdc_docs):
    rows = dd.cdc_chunks(cdc_docs).orderBy("doc_id", "chunk_idx").collect()
    texts = {r["doc_id"]: r["text"] for r in cdc_docs.collect()}
    for did, grp in itertools.groupby(rows, key=lambda r: r["doc_id"]):
        g = list(grp)
        toks = [t for t in re.split(r"[^A-Za-z0-9_]+", texts[did]) if t]
        assert " ".join(r["chunk"] for r in g) == " ".join(toks)
        assert [r["chunk_idx"] for r in g] == list(range(len(g)))
        assert sum(r["n_words"] for r in g) == len(toks)
    assert not [r for r in rows if r["doc_id"] == 4]   # empty doc: no chunks
    assert [r["chunk"] for r in rows if r["doc_id"] == 3] == ["tiny"]


def test_cdc_resyncs_where_fixed_stride_cannot(spark, cdc_docs):
    """The one-word insertion must leave most CDC chunks shared with the
    original, while fixed-stride chunking loses almost all of them."""
    cdc = {r["doc_id"]: r for r in dd.cdc_dedup_ratio(cdc_docs).collect()}
    fixed = {r["doc_id"]: r
             for r in dd.chunk_dedup_ratio(cdc_docs, chunk_words=8).collect()}
    assert cdc[2]["dup_ratio_e6"] > 800_000
    assert fixed[2]["dup_ratio_e6"] < 300_000
    assert cdc[2]["dup_ratio_e6"] > 2 * fixed[2]["dup_ratio_e6"]


def test_cdc_boundaries_are_content_local(spark):
    """Appending a suffix must not change any chunk before the suffix."""
    a = " ".join(f"t{i % 13}" for i in range(80))
    docs = spark.createDataFrame([Row(doc_id=1, text=a),
                                  Row(doc_id=2, text=a + " zz1 zz2 zz3")])
    ch = dd.cdc_chunks(docs).orderBy("doc_id", "chunk_idx").collect()
    c1 = [r["chunk"] for r in ch if r["doc_id"] == 1]
    c2 = [r["chunk"] for r in ch if r["doc_id"] == 2]
    assert c2[:len(c1) - 1] == c1[:-1]   # all but the tail chunk identical


# ------------------------------------------------- stratified_exact_split

def test_exact_split_quotas(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "ja").otherwise("en").alias("lang"))
    out = sp.stratified_exact_split(
        df, {"val": 100_000, "test": 50_000}, "lang", "doc_id")
    got = {(r["lang"], r["split"]): r["count"]
           for r in out.groupBy("lang", "split").count().collect()}
    assert got[("en", "val")] == 90 and got[("en", "test")] == 45
    assert got[("ja", "val")] == 10 and got[("ja", "test")] == 5
    assert got[("en", "train")] == 765 and got[("ja", "train")] == 85
    assert out.count() == 1000


def test_exact_split_deterministic_and_disjoint(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"),
                                 F.lit("en").alias("lang"))
    a = {r["doc_id"]: r["split"] for r in sp.stratified_exact_split(
        df, {"val": 200_000}, "lang", "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in sp.stratified_exact_split(
        df.orderBy(F.rand(7)), {"val": 200_000}, "lang", "doc_id").collect()}
    assert a == b                       # physical row order irrelevant
    salted = {r["doc_id"]: r["split"] for r in sp.stratified_exact_split(
        df, {"val": 200_000}, "lang", "doc_id", salt="other").collect()}
    assert salted != a                  # salt actually matters


def test_exact_split_rejects_over_unity(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"),
                                F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        sp.stratified_exact_split(df, {"a": 600_000, "b": 600_000},
                                  "lang", "doc_id")


# ------------------------------------------------------- recrawl_priority

def test_recrawl_priority_hand_check(spark):
    hist = spark.createDataFrame([
        Row(url="a", fingerprint="f1", valid_from=0, valid_to=10),
        Row(url="a", fingerprint="f2", valid_from=10, valid_to=50),
        Row(url="a", fingerprint="f3", valid_from=50, valid_to=None),
        Row(url="b", fingerprint="g1", valid_from=0, valid_to=None),
        Row(url="c", fingerprint="h1", valid_from=0, valid_to=60),
    ])
    out = {r["url"]: r for r in fr.recrawl_priority(hist, now=100).collect()}
    assert out["a"]["priority_micro"] == 2 * 50 * 1_000_000 // 100
    assert out["a"]["n_versions"] == 3
    assert out["b"]["priority_micro"] == 0      # never observed changing
    assert "c" not in out                       # dead page left the frontier


def test_recrawl_priority_composes_with_scd2(spark):
    """Feed scd2_history_merge output straight in: a page that changes
    every snapshot outranks one that never changed."""
    from plateau_gis_converter_spark.operators import delta as dl
    hist = spark.createDataFrame(
        [], "url string, fingerprint string, valid_from bigint, valid_to bigint")
    for ts, fps in [(0, {"u1": "a", "u2": "x"}),
                    (10, {"u1": "b", "u2": "x"}),
                    (20, {"u1": "c", "u2": "x"})]:
        snap = spark.createDataFrame(
            [Row(url=u, fingerprint=f) for u, f in fps.items()])
        hist = dl.scd2_history_merge(hist, snap, ts)
    out = {r["url"]: r["priority_micro"]
           for r in fr.recrawl_priority(hist, now=30).collect()}
    assert out["u1"] > out["u2"] == 0
