"""Round-5 wave 11: PII redaction, raster focal statistics, triangle
listing, session transition mining, TF-IDF top terms."""
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import pii
from plateau_gis_converter_spark.operators import raster as ra
from plateau_gis_converter_spark.operators import retrieval as rt
from plateau_gis_converter_spark.operators import temporal as tp


# ------------------------------------------------------------- pii

def test_pii_redaction_kinds_and_order(spark):
    df = spark.createDataFrame([Row(
        doc_id=1,
        text="mail bob.smith+x@sub.example.co.jp or 192.168.0.1 "
             "tel 03-1234-5678 end")])
    out = pii.redact_pii(df).collect()[0]
    assert out["n_email"] == 1 and out["n_ipv4"] == 1 and out["n_phone"] == 1
    assert out["redacted"] == "mail <EMAIL> or <IP> tel <PHONE> end"


def test_pii_email_digits_not_double_counted(spark):
    """Digits inside an email host must not survive into the IP/phone
    counts — the staged order handles it."""
    df = spark.createDataFrame([Row(doc_id=1, text="a1@10.0.0.1.example.com")])
    out = pii.redact_pii(df).collect()[0]
    assert out["n_email"] == 1
    assert out["n_ipv4"] == 0 and out["n_phone"] == 0
    assert out["redacted"] == "<EMAIL>"


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="no pii here at all")])
    out = pii.redact_pii(df).collect()[0]
    assert out["redacted"] == "no pii here at all"
    assert out["n_email"] == out["n_ipv4"] == out["n_phone"] == 0


def test_pii_multiple_matches_counted(spark):
    df = spark.createDataFrame([Row(
        doc_id=1, text="a@b.com c@d.org 1.2.3.4 5.6.7.8 03-111-2222")])
    out = pii.pii_document_summary(df).collect()[0]
    assert out["n_email"] == 2 and out["n_ipv4"] == 2 and out["n_phone"] == 1
    assert out["n_chars_red"] == len("<EMAIL> <EMAIL> <IP> <IP> <PHONE>")


# ------------------------------------------------------------- focal

def _raster(spark, cells, tile_px=16):
    return spark.createDataFrame(
        [Row(z=8, x=gx // tile_px, y=gy // tile_px, px=gx % tile_px,
             py=gy % tile_px, n_points=n) for gx, gy, n in cells])


def test_focal_sum_overlapping_neighborhoods(spark):
    r = _raster(spark, [(10, 10, 3), (11, 10, 5)])
    out = {(row["x"] * 16 + row["px"], row["y"] * 16 + row["py"]):
           row["focal_sum"]
           for row in ra.focal_stats(r, zoom=8, tile_px=16).collect()}
    assert out[(10, 10)] == 8 and out[(11, 10)] == 8   # both neighborhoods
    assert out[(9, 10)] == 3                            # only left source
    assert out[(12, 10)] == 5                           # only right source
    assert out[(10, 9)] == 8 and out[(11, 11)] == 8
    # domain = pixels within 1 of a source: 3x4 block
    assert len(out) == 12


def test_focal_wraps_x_and_clamps_y(spark):
    world = 256 * 16  # z8, 16 px/tile
    r = _raster(spark, [(0, 0, 7)])
    out = {(row["x"] * 16 + row["px"], row["y"] * 16 + row["py"]):
           row["focal_sum"]
           for row in ra.focal_stats(r, zoom=8, tile_px=16).collect()}
    assert out[(world - 1, 0)] == 7      # antimeridian wrap on x
    assert (0, -1) not in out            # past-pole rows dropped
    assert len(out) == 6                 # 3 x-targets * 2 valid y rows


def test_focal_conserves_mass_times_kernel(spark):
    """Away from edges, sum(focal) == 9 * sum(input)."""
    cells = [(100 + i, 50 + j, i + j + 1) for i in range(3)
             for j in range(2)]
    r = _raster(spark, cells)
    total = sum(n for _, _, n in cells)
    got = (ra.focal_stats(r, zoom=8, tile_px=16)
           .agg(F.sum("focal_sum")).collect()[0][0])
    assert got == 9 * total


# ---------------------------------------------------------- triangles

def test_triangle_listing_hand_graph(spark):
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(1, 2), (2, 3), (3, 1),          # triangle 1-2-3
          (3, 4), (4, 5),                  # path, no triangle
          (5, 6), (6, 7), (7, 5),          # triangle 5-6-7
          (2, 1), (1, 3),                  # reverse/dup edges ignored
          (4, 4)]])                        # self loop ignored
    out = sorted((r["ta"], r["tb"], r["tc"])
                 for r in gr.triangle_listing(edges).collect())
    assert out == [(1, 2, 3), (5, 6, 7)]


def test_triangle_listing_k4_counts_four(spark):
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a in range(4) for b in range(4) if a < b])
    out = gr.triangle_listing(edges).collect()
    assert len(out) == 4  # C(4,3)
    assert len({(r["ta"], r["tb"], r["tc"]) for r in out}) == 4


def test_triangle_listing_hub_no_false_positives(spark):
    """A star (hub + leaves, no leaf-leaf edges) has zero triangles."""
    edges = spark.createDataFrame(
        [Row(src=0, dst=i) for i in range(1, 20)])
    assert gr.triangle_listing(edges).count() == 0


# ------------------------------------------------------- transitions

def test_session_transitions_counts_and_ppm(spark):
    rows = []
    base = "2024-01-01 00:{m:02d}:00"
    # user 1, one session: view -> click -> view -> click
    for i, et in enumerate(["view", "click", "view", "click"]):
        rows.append(Row(event_id=i, ts=base.format(m=i),
                        user_id=1, event_type=et))
    # user 1, second session (2h later): view -> buy
    rows.append(Row(event_id=10, ts="2024-01-01 03:00:00",
                    user_id=1, event_type="view"))
    rows.append(Row(event_id=11, ts="2024-01-01 03:01:00",
                    user_id=1, event_type="buy"))
    ev = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = {(r["prev_state"], r["next_state"]): (r["n"], r["prob_ppm"])
           for r in tp.session_transitions(ev).collect()}
    # session break means NO view->view transition across the gap
    assert out[("view", "click")] == (2, 666666)  # 2 of 3 view-exits
    assert out[("view", "buy")] == (1, 333333)
    assert out[("click", "view")] == (1, 1000000)
    assert ("click", "buy") not in out


def test_session_transitions_tiebreak_deterministic(spark):
    """Same-ts events order by event_id."""
    ev = spark.createDataFrame([
        Row(event_id=2, ts="2024-01-01 00:00:00", user_id=1,
            event_type="b"),
        Row(event_id=1, ts="2024-01-01 00:00:00", user_id=1,
            event_type="a"),
    ]).withColumn("ts", F.col("ts").cast("timestamp"))
    out = tp.session_transitions(ev).collect()
    assert [(r["prev_state"], r["next_state"]) for r in out] == [("a", "b")]


# ------------------------------------------------------------- tfidf

def test_tfidf_rare_terms_outrank_common(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="common phrase common phrase rare gem"),
        Row(doc_id=2, text="common phrase something else"),
        Row(doc_id=3, text="common phrase another body"),
    ])
    out = rt.tfidf_topk_terms(docs, k=1).collect()
    top1 = {r["doc_id"]: r["term"] for r in out}
    # 'common phrase' appears in every doc (idf = ln(4/4) = 0); the doc-1
    # winner must be one of its unique bigrams (tf=1, df=1 — the tie
    # breaks alphabetically among them)
    assert top1[1] in {"phrase common", "phrase rare", "rare gem"}


def test_tfidf_scores_match_reference_math(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta alpha beta gamma"),
        Row(doc_id=2, text="alpha beta delta"),
    ])
    out = rt.tfidf_topk_terms(docs, k=10).collect()
    n = 2
    for r in out:
        idf_e6 = math.floor(
            math.log((n + 1.0) / (r["df"] + 1.0)) * 1e6 + 0.5)
        assert r["score_e6"] == r["tf"] * idf_e6
    # ranks are 1..k, unique per doc, ordered by (score desc, term)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["score_e6"], r["term"]) for r in rows]
        assert keys == sorted(keys)
