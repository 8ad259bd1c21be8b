"""Round-5 wave 10: raster hotspot regions, exact cosine all-pairs,
copy-on-write merge planning."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import raster as ra
from plateau_gis_converter_spark.sources import layout as ly


def _raster(spark, cells):
    return spark.createDataFrame(
        [Row(z=12, x=gx // 256, y=gy // 256, px=gx % 256, py=gy % 256,
             n_points=n) for gx, gy, n in cells])


# ------------------------------------------------------------- hotspots

def test_hotspot_regions_labels_and_threshold(spark):
    r = _raster(spark, [(10, 10, 5), (11, 10, 6), (11, 11, 7),
                        (20, 20, 9), (30, 5, 2), (40, 40, 5)])
    out = {(x["gx"], x["gy"]): x["region_id"]
           for x in ra.hotspot_regions(r, min_count=5).collect()}
    assert (30, 5) not in out                       # below threshold
    assert out[(10, 10)] == out[(11, 10)] == out[(11, 11)]  # L-shaped blob
    assert out[(20, 20)] != out[(10, 10)]           # isolated cells
    assert out[(40, 40)] != out[(20, 20)]
    assert len(out) == 5


def test_hotspot_diagonal_cells_are_separate(spark):
    """4-adjacency: diagonal neighbors do NOT merge."""
    r = _raster(spark, [(0, 0, 9), (1, 1, 9)])
    out = ra.hotspot_regions(r, 5).collect()
    assert out[0]["region_id"] != out[1]["region_id"]


def test_hotspot_crosses_tile_border(spark):
    """Adjacency works across the 256px tile boundary (gx is global)."""
    r = _raster(spark, [(255, 7, 9), (256, 7, 9)])
    out = ra.hotspot_regions(r, 5).collect()
    assert out[0]["region_id"] == out[1]["region_id"]


# ---------------------------------------------------------- cosine_pairs

def test_cosine_hand_check(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="spark spark spark fast table"),
        Row(doc_id=2, text="spark spark fast fast table table"),
        Row(doc_id=3, text="unrelated words entirely different"),
    ])
    out = dd.cosine_pairs(docs, threshold_pct=60).collect()
    assert len(out) == 1
    r = out[0]
    # tf1={spark:3,fast:1,table:1} ss=11; tf2={2,2,2} ss=12; dot=10
    assert (r["doc_a"], r["doc_b"], r["dot"]) == (1, 2, 10)
    assert r["cos2_micro"] == 10 * 10 * 1_000_000 // (11 * 12)


def test_cosine_threshold_is_exact_boundary(spark):
    """cos == exactly 0.6 must pass a 60% threshold (>=, integer exact):
    vectors (3,4) and (4,3): dot=24, ss=25 each -> cos = 24/25 = .96;
    build a .6 case: (1,0) vs (3,4): dot=3, ss=1,25, cos=3/5=.6."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a a a b b b b"),      # tf a=3 b=4
        Row(doc_id=2, text="a"),                  # tf a=1
    ])
    out = dd.cosine_pairs(docs, threshold_pct=60).collect()
    assert len(out) == 1 and out[0]["dot"] == 3
    assert dd.cosine_pairs(docs, threshold_pct=61).count() == 0


def test_cosine_matches_float_oracle_on_fixture(spark):
    import itertools
    import math
    import re
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in
           dd.cosine_pairs(docs, threshold_pct=80).collect()}
    exp = set()
    tfs = {}
    for did, text in rows.items():
        toks = [t for t in re.split(r"[^A-Za-z0-9_]+", text) if t]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        tfs[did] = tf
    for a, b in itertools.combinations(sorted(tfs), 2):
        dot = sum(v * tfs[b].get(k, 0) for k, v in tfs[a].items())
        na = math.sqrt(sum(v * v for v in tfs[a].values()))
        nb = math.sqrt(sum(v * v for v in tfs[b].values()))
        if na and nb and dot / (na * nb) >= 0.8:
            exp.add((a, b))
    assert got == exp


def test_cosine_max_df_prunes_hot_terms(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"common uniq{i}") for i in range(10)])
    # every pair shares only 'common'; with the cap the index drops it
    assert dd.cosine_pairs(docs, 10).count() == 45
    assert dd.cosine_pairs(docs, 10, max_df=5).count() == 0


# ------------------------------------------------------------ merge_plan

def test_merge_plan_hand_check(spark):
    fs = spark.createDataFrame(
        [Row(file_id=i, min_key=i * 100, max_key=i * 100 + 99,
             bytes=1000 + i) for i in range(5)])
    up = spark.createDataFrame(
        [Row(key=k) for k in [5, 7, 205, 499, 499]])   # dup key counted once
    out = {r["file_id"]: r for r in ly.merge_plan(fs, up).collect()}
    assert out[0]["n_hits"] == 2 and out[0]["rewrite"]
    assert out[1]["n_hits"] == 0 and not out[1]["rewrite"]
    assert out[4]["n_hits"] == 1
    assert len(out) == 5                   # untouched files still listed


def test_merge_plan_broadcasts_file_stats(spark):
    fs = spark.createDataFrame(
        [Row(file_id=i, min_key=i * 10, max_key=i * 10 + 9, bytes=1)
         for i in range(8)])
    up = spark.range(100).select(F.col("id").alias("key"))
    plan = (ly.merge_plan(fs, up)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # hilbert locality: updates clustered in one range touch one file
    local = spark.createDataFrame([Row(key=k) for k in (31, 33, 35)])
    touched = (ly.merge_plan(fs, local)
               .where("rewrite").select("file_id").collect())
    assert [r["file_id"] for r in touched] == [3]
