"""Link-graph operators for the web-pages corpus: out-link degree and an
integer-exact PageRank.

Web-scale training pipelines use link authority as a document-quality
signal (seed-and-expand crawls, harmonic/PageRank centrality filtering a la
Common Crawl's host-level ranks). The engine's variant here is
deliberately **integer-exact**: scores live in parts-per-million units and
every update uses only integer add/multiply/floor-divide, so results are
bit-identical across engines (the driver's DuckDB oracle replicates it in
SQL) AND across Spark's nondeterministic aggregation orders — float
PageRank sums would differ in the last ulp depending on partial-agg merge
order; integer sums are associative.

Update rule per iteration (damping d expressed as a percentage):

    contrib(e) = score(src(e)) div out_degree(src(e))      [per edge]
    score'(v)  = (100-d)% * BASE + (d * sum contrib) div 100

with BASE = 1_000_000 ppm. Dangling mass is dropped (deterministically) —
acceptable for a quality signal, documented here.

Scale: each iteration is one equi-join of the O(1)-per-node score relation
to the edge list on src (shuffle keyed by src, or map-side if edges are
pre-bucketed by src) plus one partial-combine hash aggregation keyed by
dst. State per node is a single long. The iteration count is a small
constant (quality filtering uses 2-5 iterations, not convergence), so the
lineage stays shallow; for long chains localCheckpoint per K iterations
caps plan growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_PPM = 1_000_000


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, out_degree) from a distinct edge list."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))


def pagerank_int(nodes: DataFrame, edges: DataFrame, iters: int = 3,
                 damping_pct: int = 85,
                 checkpoint_every: int = 8) -> DataFrame:
    """Integer-exact PageRank.

    nodes: DataFrame with one ``id`` column (every rankable vertex).
    edges: DataFrame (src, dst); must be distinct pairs.
    Returns (id, score_e6) after ``iters`` synchronous iterations starting
    from BASE_PPM everywhere.
    """
    deg = out_degrees(edges)
    scored_edges = edges.join(deg, "src")
    base = F.lit((100 - damping_pct) * BASE_PPM // 100)
    scores = nodes.select("id", F.lit(BASE_PPM).cast("long")
                          .alias("score_e6"))
    for i in range(iters):
        contrib = (scored_edges
                   .join(scores, scored_edges["src"] == scores["id"])
                   .select(F.col("dst"),
                           F.expr("score_e6 div out_degree")
                           .alias("contrib")))
        summed = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        scores = (nodes.join(summed, nodes["id"] == summed["dst"], "left")
                  .select("id",
                          (base + F.expr(
                              f"({damping_pct} * coalesce(s, 0)) div 100"))
                          .cast("long").alias("score_e6")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            scores = scores.localCheckpoint()
    return scores


def synthetic_link_edges(docs: DataFrame, n: int) -> DataFrame:
    """Deterministic link graph over the documents table: doc i links to
    (7i+1) mod n always, (13i+5) mod n when i is even, (29i+11) mod n when
    3 | i (distinct pairs, self-loops removed) — varied out-degrees 1..3 so
    rank mass actually differentiates; a real corpus would extract hrefs
    in the geocode/parse stage instead. ``n`` is passed explicitly (no
    plan-time action inside the operator)."""
    i = F.col("doc_id")
    e = None
    for a, b, mod in ((7, 1, 1), (13, 5, 2), (29, 11, 3)):
        part = (docs.where((i % mod) == 0)
                .select(i.alias("src"),
                        ((i * a + b) % F.lit(n)).alias("dst")))
        e = part if e is None else e.unionAll(part)
    return e.where(F.col("src") != F.col("dst")).distinct()


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iters: int = 50) -> DataFrame:
    """Resolve near-duplicate PAIRS into clusters: connected components by
    synchronous min-label propagation. Output (id, component_id) for every
    node that appears in a pair; component_id = the smallest node id in the
    component (the canonical representative a dedup pipeline keeps).

    This is the missing stage between pair generation (MinHash-LSH /
    SimHash / embedding near-dup) and an actually deduplicated corpus.

    Convergence: labels only decrease and propagate one hop per iteration,
    so the loop terminates in O(component diameter) rounds — near-dup
    clusters are shallow (diameter <= a few hops), so the per-round driver
    convergence check (`changed == 0`, an O(1) count) runs a handful of
    times. Each round is one shuffle keyed by node id; labels are
    localCheckpoint'ed per round so the plan/lineage stays flat. At
    trillion-edge scale the same loop is usually run with the
    large-star/small-star optimization (Kiveris et al. 2014) to cut round
    count; the semantics here are identical.
    """
    und = (pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
           .unionAll(pairs.select(F.col(b_col).alias("a"),
                                  F.col(a_col).alias("b")))
           .distinct()
           .localCheckpoint())
    labels = (und.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id"))
              .localCheckpoint())
    # convergence via the label-mass invariant: labels are non-increasing
    # per node, so sum(label) is strictly decreasing until the fixpoint —
    # one cheap aggregate per round instead of an old⋈new change-count join
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        neigh = (und.join(labels, und["b"] == labels["id"])
                 .groupBy("a").agg(F.min("label").alias("nmin")))
        labels = (labels.join(neigh, labels["id"] == neigh["a"], "left")
                  .select("id",
                          F.least(F.col("label"),
                                  F.coalesce(F.col("nmin"), F.col("label")))
                          .alias("label"))
                  .localCheckpoint())
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component_id"))
