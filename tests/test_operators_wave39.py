"""Round-5 wave 39: sentence-boundary chunking, grid-cell occupancy
advisor, mutual information."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import skew as sk
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import text as tx


# ----------------------------------------------------------- sentence_chunks

def test_sentence_chunks_packing_rule(spark):
    # sentences of 3/3/3/3 tokens, budget 6: cum = 3,6,9,12 ->
    # chunks (cum-1)//6 = 0,0,1,1
    text = "a b c. d e f. g h i! j k l?"
    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = {r["chunk_id"]: r for r in
           tx.sentence_chunks(docs, chunk_tokens=6).collect()}
    assert sorted(out) == [0, 1]
    assert out[0]["chunk_text"] == "a b c. d e f."
    assert out[1]["chunk_text"] == "g h i! j k l?"
    assert out[0]["n_sentences"] == 2 and out[0]["n_tokens"] == 6


def test_sentence_chunks_never_splits_a_sentence(spark):
    # an 8-token sentence with budget 3 occupies exactly one chunk
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="one two three four five six seven eight. x y")])
    out = {r["chunk_id"]: r for r in
           tx.sentence_chunks(docs, chunk_tokens=3).collect()}
    big = [r for r in out.values() if r["n_tokens"] == 8]
    assert len(big) == 1 and big[0]["n_sentences"] == 1
    assert big[0]["chunk_text"].startswith("one") \
        and big[0]["chunk_text"].endswith("eight.")


def test_sentence_chunks_multiple_terminators_and_empty(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hi!! ... ok?"), Row(doc_id=2, text="")])
    rows = tx.sentence_chunks(docs, chunk_tokens=10).collect()
    assert {r["doc_id"] for r in rows} == {1}
    joined = " ".join(r["chunk_text"] for r in rows)
    assert "hi!!" in joined and "ok?" in joined


# ------------------------------------------------------- cell occupancy

def test_cell_occupancy_exact_stats(spark):
    # 10 points in one cell at size 100, spread at size 10
    pts = spark.createDataFrame(
        [Row(lng_udeg=i * 10, lat_udeg=0) for i in range(10)])
    out = {r["cell_udeg"]: r for r in
           sk.cell_occupancy_stats(pts, [10, 100]).collect()}
    assert out[100]["n_cells"] == 1 and out[100]["max_occ"] == 10
    assert out[100]["mean_milli"] == 10_000 and out[100]["p95_occ"] == 10
    assert out[10]["n_cells"] == 10 and out[10]["max_occ"] == 1
    assert out[10]["mean_milli"] == 1_000 and out[10]["p95_occ"] == 1


def test_cell_occupancy_p95_rule(spark):
    # 19 singleton cells + one 50-point cell: p95 over 20 cells =
    # the ceil(0.95*20)=19th smallest occupancy = 1; max = 50
    rows = [Row(lng_udeg=1000 * i, lat_udeg=0) for i in range(1, 20)]
    rows += [Row(lng_udeg=5, lat_udeg=0)] * 50
    out = sk.cell_occupancy_stats(spark.createDataFrame(rows),
                                  [1000]).collect()[0]
    assert out["n_cells"] == 20 and out["max_occ"] == 50
    assert out["p95_occ"] == 1
    assert out["n_points"] == 69


# --------------------------------------------------------------------- MI

def test_mutual_information_independent_is_zero(spark):
    # perfectly independent 2x2 with equal counts: MI = 0 exactly
    rows = [Row(a=a, b=b) for a in ("x", "y") for b in (0, 1)
            for _ in range(25)]
    r = st.mutual_information(spark.createDataFrame(rows),
                              "a", "b").collect()[0]
    assert r["n"] == 100 and r["n_cells"] == 4
    assert r["mi_micro_nats"] == 0


def test_mutual_information_deterministic_equals_entropy(spark):
    # b fully determined by a: MI = H(b) = ln 2 for a 50/50 split
    rows = [Row(a="x", b=0)] * 30 + [Row(a="y", b=1)] * 30
    r = st.mutual_information(spark.createDataFrame(rows),
                              "a", "b").collect()[0]
    want = int(math.log(2) * 1e6)  # 693147
    assert abs(r["mi_micro_nats"] - want) <= 1


def test_mutual_information_matches_scalar(spark):
    import collections
    pairs = [((i * 3) % 4, (i * 5) % 3) for i in range(200)] \
        + [(0, 0)] * 40
    rows = [Row(a=a, b=b) for a, b in pairs]
    r = st.mutual_information(spark.createDataFrame(rows),
                              "a", "b").collect()[0]
    n = len(pairs)
    cells = collections.Counter(pairs)
    ra = collections.Counter(a for a, _ in pairs)
    cb = collections.Counter(b for _, b in pairs)
    s = sum(math.floor(c * math.log(c * n / (ra[a] * cb[b])) * 1e6 + 0.5)
            for (a, b), c in cells.items())
    assert r["mi_sum_micro"] == s
    assert r["mi_micro_nats"] == s // n if s >= 0 else r["mi_micro_nats"]
