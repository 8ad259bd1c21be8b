"""Round-5 wave 24: modularity decomposition, readability, chi-squared
association."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import text as tx


def test_modularity_two_cliques_one_bridge(spark):
    # triangles {0,1,2} and {3,4,5} + bridge 2-3: m=7
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3),
          (1, 0)]])  # (1,0) duplicates (0,1) -> normalized away
    labels = spark.createDataFrame(
        [Row(id=i, scc_id=0 if i < 3 else 1) for i in range(6)])
    out = {r["community"]: (r["intra_edges"], r["degree_sum"], r["q_num"])
           for r in gr.modularity_contrib(edges, labels).collect()}
    # m=7; community 0: e=3, d=7 -> 4*7*3 - 49 = 35; same for 1
    assert out == {0: (3, 7, 35), 1: (3, 7, 35)}
    # Q = 70/196 ~ 0.357, the textbook two-clique value
    assert sum(q for _, _, q in out.values()) == 70


def test_modularity_inter_edges_excluded(spark):
    # star 0-1, 0-2, 0-3 with each node its own community: e_c = 0
    edges = spark.createDataFrame(
        [Row(src=0, dst=i) for i in (1, 2, 3)])
    labels = spark.createDataFrame(
        [Row(id=i, scc_id=i) for i in range(4)])
    out = {r["community"]: r["q_num"]
           for r in gr.modularity_contrib(edges, labels).collect()}
    assert out == {0: -9, 1: -1, 2: -1, 3: -1}


def test_readability_counts_and_score(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="The cat sat. The dog ran!"),
        Row(doc_id=1, text="no sentence terminator here"),
        Row(doc_id=2, text=""),
    ])
    out = {r["doc_id"]: r for r in tx.readability_milli(docs).collect()}
    r0 = out[0]
    # words: the,cat,sat,the,dog,ran = 6; sentences 2; vowel groups:
    # e,a,a,e,o,a = 6
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (6, 2, 6)
    # a = 3000, b = 1000 -> 206835 - 3045 - 84600 = 119190
    assert r0["fre_milli"] == 119190
    assert out[1]["n_sentences"] == 1          # floor at one sentence
    assert out[2]["fre_milli"] is None         # wordless -> NULL


def test_readability_vowel_floor_per_word(spark):
    # "why" has no aeiouy-run vowels... y counts; "brr grr" has none ->
    # syllables floored at word count
    docs = spark.createDataFrame([Row(doc_id=0, text="brr grr.")])
    [r] = tx.readability_milli(docs).collect()
    assert (r["n_words"], r["n_syllables"]) == (2, 2)


def test_chi2_flags_exact_decision(spark):
    # 2x2 with a strong diagonal: O*N-R*C big on all four cells
    rows = ([Row(a="x", b="p")] * 40 + [Row(a="x", b="q")] * 10
            + [Row(a="y", b="p")] * 10 + [Row(a="y", b="q")] * 40)
    df = spark.createDataFrame(rows)
    out = {(r["row_key"], r["col_key"]): (r["o"], r["flagged"])
           for r in st.chi2_flags(df, "a", "b", threshold=4).collect()}
    # each cell: (O*100 - 50*50)^2 = 1500^2*... = (4000-2500)^2 = 2.25e6
    # threshold: 4*100*50*50 = 1e6 -> all flagged
    assert all(f for _, f in out.values()) and len(out) == 4
    # weak association at high threshold -> nothing flags
    out2 = {k: v[1] for k, v in
            {(r["row_key"], r["col_key"]): (r["o"], r["flagged"])
             for r in st.chi2_flags(df, "a", "b",
                                    threshold=10).collect()}.items()}
    assert not any(out2.values())
