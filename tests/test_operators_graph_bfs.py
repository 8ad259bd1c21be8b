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


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_hits_star_separates_hubs_from_authorities(spark):
    """Pure star 1,2,3 -> 0: node 0 is THE authority (auth = scale,
    hub = 0); 1..3 are pure equal hubs (hub = scale, auth = 0). This is
    the structural case PageRank cannot express — the hubs all rank
    identically low there, and nothing distinguishes 'points at the
    authority' from 'is pointed at'."""
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    got = {r["id"]: (r["auth_e6"], r["hub_e6"])
           for r in gr.hits_scores(_nodes(spark, [0, 1, 2, 3]), e,
                                   iters=3).collect()}
    assert got[0] == (1_000_000, 0)
    assert got[1] == got[2] == got[3] == (0, 1_000_000)


def test_hits_indegree_orders_authority(spark):
    """Two authorities, one with 3 hub in-links vs one with 1: the
    3-link authority maxes (scale), the 1-link one stays strictly
    below; the hub linking both authorities out-scores the single-link
    hubs."""
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (3, 9)])
    # hub 3 links both authorities, so hub(3) > hub(1) = hub(2) too
    got = {r["id"]: (r["auth_e6"], r["hub_e6"])
           for r in gr.hits_scores(_nodes(spark, [0, 1, 2, 3, 9]), e,
                                   iters=2).collect()}
    assert got[0][0] == 1_000_000
    assert 0 < got[9][0] < got[0][0]
    assert got[3][1] == 1_000_000          # best hub
    assert got[1][1] == got[2][1] < got[3][1]
    assert got[0][1] == got[9][1] == 0     # authorities are not hubs


def test_hits_integer_exact_and_partition_invariant(spark):
    """Same graph, 1 vs 13 shuffle partitions: bit-identical scores —
    the integer-arithmetic determinism claim."""
    pairs = [(i % 23, (i * 7 + 3) % 23) for i in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, sorted(set(pairs)))
    n = _nodes(spark, list(range(23)))
    a = sorted(map(tuple, gr.hits_scores(n, e, iters=3).collect()))
    b = sorted(map(tuple, gr.hits_scores(n.repartition(13),
                                         e.repartition(7),
                                         iters=3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# TrustRank (seed-restricted teleport) and co-citation
# ---------------------------------------------------------------------------

def test_trustrank_unreachable_pages_decay_to_zero(spark):
    """Seeds {0}; chain 0->1->2; node 9 links INTO the chain but is
    unreachable from seeds — its trust must be exactly 0 while every
    chain node holds positive trust; plain PageRank gives 9 its base
    mass (the spam-demotion difference)."""
    e = _edges(spark, [(0, 1), (1, 2), (9, 1)])
    n = _nodes(spark, [0, 1, 2, 9])
    seeds = _nodes(spark, [0])
    tr = {r["id"]: r["score_e6"]
          for r in gr.pagerank_int(n, e, iters=3, teleport=seeds)
          .collect()}
    pr = {r["id"]: r["score_e6"]
          for r in gr.pagerank_int(n, e, iters=3).collect()}
    assert tr[9] == 0
    assert tr[0] > 0 and tr[1] > 0 and tr[2] > 0
    assert pr[9] > 0   # vanilla PageRank cannot tell 9 apart


def test_cocitation_counts_and_fanout_guard(spark):
    """Sources 10,11 both cite (1,2): n_common=2; source 12 adds (1,3)
    only once -> below min_count. A hub source citing everything is
    dropped by max_fanout and stops inflating pair counts."""
    base = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)]
    got = {(r["page_a"], r["page_b"]): r["n_common"]
           for r in gr.cocitation_pairs(_edges(spark, base),
                                        min_count=2).collect()}
    assert got == {(1, 2): 2}
    hub = [(99, d) for d in range(1, 6)]   # fanout 5
    with_hub = gr.cocitation_pairs(_edges(spark, base + hub),
                                   min_count=2, max_fanout=4)
    got2 = {(r["page_a"], r["page_b"]): r["n_common"]
            for r in with_hub.collect()}
    assert got2 == {(1, 2): 2}   # hub dropped, counts unchanged
