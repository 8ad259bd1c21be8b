"""Round-5 wave 15: degree histogram, link reciprocity, token entropy."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import text as tx


def test_degree_histogram_hand_graph(spark):
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)]])
    out = {(r["direction"], r["degree"]): r["n_nodes"]
           for r in gr.degree_histogram(edges).collect()}
    # out-degrees: 1->3, 2->1, 3->1 ; in-degrees: 2->1, 3->2, 4->2
    assert out[("out", 3)] == 1 and out[("out", 1)] == 2
    assert out[("in", 1)] == 1 and out[("in", 2)] == 2
    assert len(out) == 4


def test_reciprocity_counts_each_direction(spark):
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(1, 2), (2, 1),          # reciprocal pair -> 2 edges counted
          (2, 3), (3, 4), (4, 4)]])  # one-way + self loop (dropped)
    r = gr.reciprocity(edges).collect()[0]
    assert r["n_edges"] == 4
    assert r["n_reciprocal"] == 2
    assert r["reciprocity_ppm"] == 500_000


def test_token_entropy_uniform_vs_repeated(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d"),          # uniform: H = ln 4
        Row(doc_id=2, text="a a a a"),          # constant: H = 0
        Row(doc_id=3, text="a a b b"),          # H = ln 2
    ])
    out = {r["doc_id"]: r for r in tx.token_entropy(docs).collect()}
    assert out[1]["entropy_e6_nats"] == math.floor(math.log(4) * 1e6 + 0.5)
    # c=4: ln(4)*4e6 quantized, then DIV 4 — reproduce exactly
    s2 = math.floor(math.log(4) * 4 * 1e6 + 0.5)
    assert out[2]["entropy_e6_nats"] == (
        math.floor(math.log(4) * 1e6 + 0.5) - s2 // 4)
    s3 = 2 * math.floor(math.log(2) * 2 * 1e6 + 0.5)
    assert out[3]["entropy_e6_nats"] == (
        math.floor(math.log(4) * 1e6 + 0.5) - s3 // 4)
    assert out[1]["n_distinct"] == 4 and out[2]["n_distinct"] == 1
    # ordering sanity: uniform > mixed > constant
    assert (out[1]["entropy_e6_nats"] > out[3]["entropy_e6_nats"]
            > out[2]["entropy_e6_nats"])
