"""Round-5 wave 26: MaxScore pruning losslessness, Moran's I,
range-frame rolling stats, HTML tag depth."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import html as ht
from plateau_gis_converter_spark.operators import raster as ra
from plateau_gis_converter_spark.operators import retrieval as rt
from plateau_gis_converter_spark.operators import temporal as tp


# ---------------------------------------------------------------- maxscore

def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        words = ["alpha", "beta"] if i % 2 else ["gamma", "delta"]
        body = " ".join(words * (1 + i % 5)) + f" tail{i % 7} common word"
        rows.append(Row(doc_id=i, text=body))
    return spark.createDataFrame(rows)


def test_maxscore_equals_exact_bm25(spark):
    docs = _corpus(spark)
    qs = rt.corpus_queries(docs, n_queries=3, skip=2)
    exact = {(r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
             for r in rt.bm25_topk(docs, qs, k=5).collect()}
    pruned = {(r["query_id"], r["rank"]): (r["doc_id"], r["score_micro"])
              for r in rt.maxscore_topk(docs, qs, k=5).collect()}
    assert exact == pruned and exact


def test_maxscore_fewer_than_k_no_theta_fallback(spark):
    # only 4 docs match each query < k=50 -> no conjunctive k-th ->
    # theta null -> every term essential -> still exact
    docs = _corpus(spark, n=8)
    qs = rt.corpus_queries(docs, n_queries=2, skip=0)
    exact = rt.bm25_topk(docs, qs, k=50).collect()
    pruned = rt.maxscore_topk(docs, qs, k=50).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, pruned))


def test_maxscore_actually_prunes(spark):
    """On a skewed corpus (one stop-ish term in every doc, one rare
    term), the candidate set must be smaller than the matching set —
    i.e. the non-essential classification fires."""
    rows = [Row(doc_id=i,
                text=("needle special " if i < 3 else "")
                + "stopword filler " * 3) for i in range(30)]
    docs = spark.createDataFrame(rows)
    qs = spark.createDataFrame(
        [Row(query_id=0, term="needle special"),
         Row(query_id=0, term="stopword filler")])
    exact = rt.bm25_topk(docs, qs, k=2).collect()
    pruned = rt.maxscore_topk(docs, qs, k=2).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, pruned))
    # top-2 must be needle docs (they carry the high-idf term)
    assert all(r["doc_id"] < 3 for r in pruned)


# ---------------------------------------------------------------- morans_i

def _raster(spark, cells):
    return spark.createDataFrame(
        [Row(z=8, x=0, y=0, px=px, py=py, n_points=v)
         for (px, py, v) in cells])


def test_morans_clustered_positive_dispersed_negative(spark):
    # 2x2 block of highs next to a 2x2 block of lows -> positive I
    clustered = _raster(spark, [(0, 0, 9), (1, 0, 9), (0, 1, 9), (1, 1, 9),
                                (2, 0, 1), (3, 0, 1), (2, 1, 1), (3, 1, 1)])
    hi = clustered and ra.morans_i(clustered, tile_px=16).collect()[0]
    assert hi["i_milli"] > 0
    # checkerboard -> negative I
    checker = _raster(spark, [(px, py, 9 if (px + py) % 2 == 0 else 1)
                              for px in range(4) for py in range(2)])
    lo = ra.morans_i(checker, tile_px=16).collect()[0]
    assert lo["i_milli"] < 0
    assert hi["n"] == lo["n"] == 8


def test_morans_constant_field_null(spark):
    flat = _raster(spark, [(px, 0, 5) for px in range(4)])
    row = ra.morans_i(flat, tile_px=16).collect()[0]
    assert row["den"] == 0 and row["i_milli"] is None


def test_morans_no_neighbors_null(spark):
    # two isolated pixels (distance > 1) -> w_sum 0 -> null
    iso = _raster(spark, [(0, 0, 1), (5, 5, 9)])
    row = ra.morans_i(iso, tile_px=16).collect()[0]
    assert row["w_sum"] == 0 and row["i_milli"] is None


def test_morans_crosses_tile_boundary(spark):
    # px=15 in tile x=0 is adjacent to px=0 in tile x=1 (global pixel)
    df = spark.createDataFrame(
        [Row(z=8, x=0, y=0, px=15, py=0, n_points=4),
         Row(z=8, x=1, y=0, px=0, py=0, n_points=8)])
    row = ra.morans_i(df, tile_px=16).collect()[0]
    assert row["w_sum"] == 2  # directed both ways


# ---------------------------------------------------------------- rolling

def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_type=k, ts=f"2025-01-{d:02d} 00:00:0{h}",
             value=float(v)) for (k, d, h, v) in rows]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_rolling_range_frame_skips_calendar_gaps(spark):
    # days 1 and 10 for key a: windows must NOT bridge the 9-day gap
    ev = _ev(spark, [("a", 1, 0, 2.0), ("a", 1, 1, 4.0), ("a", 10, 0, 6.0)])
    out = {r["day_num"] % 100: r for r in
           tp.rolling_daily_stats(ev, days=7).collect()}
    d1, d10 = sorted(out)
    assert out[d1]["n_win"] == 2 and out[d1]["v_milli_win"] == 6000
    assert out[d10]["n_win"] == 1 and out[d10]["v_milli_win"] == 6000
    assert out[d10]["mean_milli_win"] == 6000


def test_rolling_window_accumulates_within_range(spark):
    ev = _ev(spark, [("a", d, 0, 1.5) for d in range(1, 9)])  # 8 days
    out = sorted(tp.rolling_daily_stats(ev, days=7).collect(),
                 key=lambda r: r["day_num"])
    assert [r["n_win"] for r in out] == [1, 2, 3, 4, 5, 6, 7, 7]
    assert out[-1]["v_milli_win"] == 7 * 1500


def test_rolling_keys_independent(spark):
    ev = _ev(spark, [("a", 1, 0, 1.0), ("b", 1, 0, 9.0)])
    out = {r["event_type"]: r for r in
           tp.rolling_daily_stats(ev, days=7).collect()}
    assert out["a"]["v_milli_win"] == 1000
    assert out["b"]["v_milli_win"] == 9000


# ---------------------------------------------------------------- html depth

def _depth(spark, page):
    df = spark.createDataFrame([Row(doc_id=0, html=page)])
    r = ht.html_tag_depth(df).collect()[0]
    return r["n_tags"], r["max_depth"]


def test_tag_depth_nested_and_flat(spark):
    assert _depth(spark, "<html><body><div><p>x</p></div></body></html>") \
        == (8, 4)
    assert _depth(spark, "<a>x</a><b>y</b><c>z</c>") == (6, 1)


def test_tag_depth_no_tags_and_unbalanced(spark):
    assert _depth(spark, "plain text only") == (0, 0)
    # stray close first: prefix dips negative, max stays at the 0 floor
    assert _depth(spark, "</div>text") == (1, 0)
    # unclosed opens still count depth
    assert _depth(spark, "<a><b><c>deep") == (3, 3)


def test_tag_depth_attributes_and_case(spark):
    # attributes allowed; uppercase tags are NOT matched (documented
    # lowercase fixture contract)
    assert _depth(spark, '<div class="x"><span id=1>y</span></div>') \
        == (4, 2)
    assert _depth(spark, "<DIV>x</DIV>") == (0, 0)
