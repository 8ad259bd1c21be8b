"""BFS seed-distance labeling (crawl depth) on the link graph."""
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_bfs_shortest_distance_and_cap(spark):
    """Chain 0->1->2->3->4->5 plus shortcut 0->3: dist is the SHORTEST
    path (3 at dist 1), cap at max_depth=3 leaves 5 unreached."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)])
    got = {r["id"]: r["dist"]
           for r in gr.bfs_distances(_seeds(spark, [0]), e, 3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}


def test_bfs_cycle_terminates_and_multi_seed(spark):
    """A cycle must not loop (visited anti-join), and multiple seeds
    take the min over seeds; early exit fires when the frontier dries
    up before max_depth."""
    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (9, 2)])
    got = {r["id"]: r["dist"]
           for r in gr.bfs_distances(_seeds(spark, [0, 9]), e, 50).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 2: 1}


def test_bfs_seed_dist_zero_beats_edges_into_seed(spark):
    e = _edges(spark, [(0, 1), (1, 0)])
    got = {r["id"]: r["dist"]
           for r in gr.bfs_distances(_seeds(spark, [0, 1]), e, 5).collect()}
    assert got == {0: 0, 1: 0}
