"""Round-5 wave 45: classification report, deterministic random walks,
1-D earth-mover distance."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------------ class report

def test_class_report_known_confusion(spark):
    # true:  a a a b b c ; pred: a a b b b c
    rows = [Row(t="a", p="a"), Row(t="a", p="a"), Row(t="a", p="b"),
            Row(t="b", p="b"), Row(t="b", p="b"), Row(t="c", p="c")]
    got = {r["label"]: r for r in st.classification_report(
        spark.createDataFrame(rows), "t", "p").collect()}
    assert (got["a"]["tp"], got["a"]["n_true"], got["a"]["n_pred"]) \
        == (2, 3, 2)
    assert got["a"]["precision_ppm"] == 1_000_000
    assert got["a"]["recall_ppm"] == 666_666
    assert (got["b"]["precision_ppm"], got["b"]["recall_ppm"]) \
        == (666_666, 1_000_000)
    assert got["c"]["f1_ppm"] == 1_000_000


def test_class_report_label_only_predicted(spark):
    rows = [Row(t="a", p="z"), Row(t="a", p="a")]
    got = {r["label"]: r for r in st.classification_report(
        spark.createDataFrame(rows), "t", "p").collect()}
    # z never occurs as a true label: recall NULL, precision 0
    assert got["z"]["n_true"] == 0 and got["z"]["recall_ppm"] is None
    assert got["z"]["precision_ppm"] == 0 and got["z"]["f1_ppm"] is None


# ------------------------------------------------------------ random walks

def test_random_walks_deterministic_and_edge_following(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=3), Row(src=2, dst=4),
         Row(src=3, dst=4), Row(src=4, dst=1)])
    seeds = spark.createDataFrame([Row(walk_id=10, node=1),
                                   Row(walk_id=11, node=1)])
    a = sorted((r["walk_id"], r["step"], r["node"]) for r in
               gr.random_walks(seeds, edges, steps=4).collect())
    b = sorted((r["walk_id"], r["step"], r["node"]) for r in
               gr.random_walks(seeds, edges, steps=4).collect())
    assert a == b
    # every transition is a real edge
    eset = {(1, 2), (1, 3), (2, 4), (3, 4), (4, 1)}
    walks = {}
    for w, s, n in a:
        walks.setdefault(w, {})[s] = n
    for w, path in walks.items():
        assert path[0] == 1 and len(path) == 5
        for s in range(1, 5):
            assert (path[s - 1], path[s]) in eset
    # different walk ids may diverge (hash includes the walk id)
    assert len(walks) == 2


def test_random_walks_dead_end_stops(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2)])  # 2 is a sink
    seeds = spark.createDataFrame([Row(walk_id=7, node=1)])
    out = sorted((r["step"], r["node"]) for r in
                 gr.random_walks(seeds, edges, steps=5).collect())
    assert out == [(0, 1), (1, 2)]  # stops at the sink


def test_random_walks_zero_steps_seeds_only(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    seeds = spark.createDataFrame([Row(walk_id=1, node=9)])
    out = gr.random_walks(seeds, edges, steps=0).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 9)]


# ---------------------------------------------------------------- EMD 1-D

def _sides(spark, a_vals, b_vals):
    return spark.createDataFrame(
        [Row(side="a", v=v) for v in a_vals]
        + [Row(side="b", v=v) for v in b_vals])


def test_emd_identical_is_zero_and_shift_is_exact(spark):
    r = st.emd_1d(_sides(spark, [1, 2, 3], [1, 2, 3]),
                  "side", "v").collect()[0]
    assert r["emd_num"] == 0 and r["emd_milli"] == 0
    # b = a + 10 everywhere: EMD exactly 10 (10000 milli)
    r2 = st.emd_1d(_sides(spark, [1, 2, 3], [11, 12, 13]),
                   "side", "v").collect()[0]
    assert r2["emd_milli"] == 10_000


def test_emd_matches_scalar(spark):
    a = [(i * 7) % 23 for i in range(40)]
    b = [(i * 11) % 29 for i in range(50)]
    r = st.emd_1d(_sides(spark, a, b), "side", "v").collect()[0]
    # scalar reference: integral of |Fa - Fb|
    import math
    grid = sorted(set(a) | set(b))
    num = 0
    for v, nxt in zip(grid, grid[1:]):
        cuma = sum(1 for x in a if x <= v)
        cumb = sum(1 for x in b if x <= v)
        num += abs(cuma * len(b) - cumb * len(a)) * (nxt - v)
    assert r["emd_num"] == num
    assert r["emd_milli"] == math.floor(
        num / (len(a) * len(b)) * 1000 + 0.5)


def test_emd_unbalanced_sizes_ok(spark):
    r = st.emd_1d(_sides(spark, [0] * 10, [100]), "side", "v") \
        .collect()[0]
    assert (r["n_a"], r["n_b"]) == (10, 1)
    assert r["emd_milli"] == 100_000  # all mass moves 100
