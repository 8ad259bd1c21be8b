"""Spatial clustering operators: deterministic DBSCAN over the geodesic
distance band, and integer-exact k-means (Lloyd) on the µdeg plane.

Reference parity: the reference's tiling stack groups features by spatial
proximity implicitly (tile cells, `nusamai/src/sink/mvt` slicing); a
curation pipeline additionally needs EXPLICIT density clustering — POI
conflation, duplicate-listing collapse, crawl-target region discovery —
and a coarse quantizer trainer for the IVF ANN index
(`operators/similarity.py`). Both are built as compositions of engine
primitives that are already scale-proven:

* ``dbscan_clusters`` = ``geodesy.distance_band_pairs`` (3x3 covering-cell
  equi-join, never all-pairs) -> neighbor-count partial agg -> core
  filter -> alternating-CC over core-core edges (O(log^2 n) rounds) ->
  one min-agg join assigning borders. Every stage is a hash
  join/aggregation on bounded keys; no stage is quadratic in the corpus.
* ``kmeans_lloyd_int`` = per-iteration broadcast of the O(k) centroid
  relation against the point set (map-side argmin, ties -> smaller
  centroid id) + one partial-agg mean floor-divided back to integers.
  Deterministic: integer coords, integer squared distances, integer DIV
  means — bit-identical across engines and partitionings, so the DuckDB
  oracle unrolls the same iterations exactly.

Determinism note on DBSCAN borders: classic DBSCAN assigns a border point
to the cluster of whichever core point claims it FIRST (scan-order
dependent). Distributed engines must pick an order-free rule; ours is
"smallest cluster id among core neighbors" — the same canonical-min
convention the dedup keep-list uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import geodesy
from .graph import connected_components


def dbscan_clusters(pts: DataFrame, radius_m: float, min_pts: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic DBSCAN (Ester et al. KDD'96) over geodesic distance.

    pts: (id_col, lng_udeg, lat_udeg). A point is CORE when its
    eps-neighborhood (haversine <= radius_m, self included — the
    classic |N_eps(p)| >= minPts rule) has at least ``min_pts`` points.
    Clusters = connected components of core points under eps-adjacency;
    border points (non-core within eps of >= 1 core) join the smallest
    cluster id among their core neighbors; everything else is noise and
    is NOT returned.

    Output: (id, cluster_id, role) with role in ('core', 'border') and
    cluster_id = the smallest core-point id of the cluster.

    Scale: pairs come from the radius-covering cell grid (one equi-join,
    lossless — gate-proven in `distance_band`), counts are one partial
    agg, the CC runs over CORE-CORE edges only (dense regions collapse
    to few components in O(log^2 n) rounds), border assignment is one
    min-agg + join. Nothing is all-pairs, nothing loops per point.
    """
    pairs = geodesy.distance_band_pairs(pts, radius_m, id_col=id_col)
    pairs = pairs.localCheckpoint(eager=True)
    both = pairs.select(F.col("id_a").alias("id")).unionAll(
        pairs.select(F.col("id_b").alias("id")))
    # |N_eps| includes the point itself: neighbor count + 1
    counts = both.groupBy("id").agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("n_eps"))
    core = (counts.where(F.col("n_eps") >= min_pts)
            .select("id").localCheckpoint(eager=True))
    core_a = core.select(F.col("id").alias("id_a"))
    core_b = core.select(F.col("id").alias("id_b"))
    cc_edges = (pairs.join(core_a, "id_a", "left_semi")
                .join(core_b, "id_b", "left_semi"))
    # isolated cores (no core neighbor) are their own single-point
    # cluster: seed them as self-loops so CC labels them too
    clusters = (connected_components(
        cc_edges.select("id_a", "id_b")
        .unionByName(core.select(F.col("id").alias("id_a"),
                                 F.col("id").alias("id_b"))),
        a_col="id_a", b_col="id_b")
        .withColumnRenamed("component_id", "cluster_id"))
    core_lbl = clusters.join(core, "id", "left_semi")
    # border: non-core endpoint of a pair whose other endpoint is core ->
    # min cluster id among its core neighbors
    adj = (pairs.select(F.col("id_a").alias("id"),
                        F.col("id_b").alias("nb"))
           .unionAll(pairs.select(F.col("id_b").alias("id"),
                                  F.col("id_a").alias("nb"))))
    border = (adj.join(core.select(F.col("id").alias("nb")), "nb",
                       "left_semi")
              .join(core, "id", "left_anti")
              .join(core_lbl.select(F.col("id").alias("nb"),
                                    "cluster_id"), "nb")
              .groupBy("id").agg(F.min("cluster_id").alias("cluster_id")))
    return (core_lbl.withColumn("role", F.lit("core"))
            .unionByName(border.withColumn("role", F.lit("border")))
            .select("id", "cluster_id", "role"))


def kmeans_lloyd_int(pts: DataFrame, k: int, iters: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Integer-exact k-means on the µdeg plane: ``iters`` Lloyd rounds
    from a deterministic seed (the k smallest-id points), returning the
    final assignment (id, cluster, cx, cy) where (cx, cy) is the
    point's final centroid.

    Exactness rules (the reason a SQL oracle can unroll this
    bit-for-bit): coordinates stay integers; the assignment metric is
    integer squared euclidean on µdeg deltas (i64-safe: |delta| <
    4*10^8 -> delta^2 < 1.6*10^17, and the two-term sum < 2^58); ties
    break to the SMALLER centroid id; the centroid update is
    floor-division (sum DIV count) per axis — deterministic regardless
    of Spark's aggregation order.

    Scale: the centroid relation is O(k) rows, broadcast each round; the
    assignment is a map-side argmin (one broadcast nested-loop over k
    per point, k small); the update one partial-agg groupBy. This IS the
    trainer shape behind `similarity.ivf_kmeans_refine`, reduced to an
    oracle-checkable integer form.

    Classic Lloyd caveat kept as-is: a centroid that attracts no points
    in a round simply drops out (the groupBy emits no row for it), so k
    may shrink — deterministic, and the oracle's unrolled SQL reproduces
    it because the dead centroid is absent from its next CTE too.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1, iters >= 0; got k={k}, "
                         f"iters={iters}")
    p = pts.select(F.col(id_col).alias("id"),
                   F.col("lng_udeg").cast("bigint").alias("x"),
                   F.col("lat_udeg").cast("bigint").alias("y"))
    p = p.localCheckpoint(eager=True)
    # seed: the k smallest-id points, numbered 0..k-1 in id order. The
    # k-row limit makes the single-reducer window free (k rows, not the
    # corpus).
    cents = (p.orderBy("id").limit(k)
             .select((F.row_number().over(Window.orderBy("id")) - 1)
                     .cast("bigint").alias("c"),
                     F.col("x").alias("cx"), F.col("y").alias("cy")))

    def assign(points, centroids):
        d2 = ((points["x"] - F.col("cx")) * (points["x"] - F.col("cx"))
              + (points["y"] - F.col("cy")) * (points["y"] - F.col("cy")))
        scored = points.join(F.broadcast(centroids), how="cross") \
            .select("id", "x", "y", "c", "cx", "cy", d2.alias("d2"))
        best = scored.groupBy("id").agg(
            F.min(F.struct("d2", "c", "cx", "cy")).alias("b"))
        return best.select(
            "id", F.col("b.c").alias("cluster"),
            F.col("b.cx").alias("cx"), F.col("b.cy").alias("cy"))

    for _ in range(iters):
        a = (p.join(assign(p, cents).select("id", "cluster"), "id"))
        cents = (a.groupBy("cluster")
                 .agg(F.expr("CAST(sum(x) DIV count(1) AS BIGINT)")
                      .alias("cx"),
                      F.expr("CAST(sum(y) DIV count(1) AS BIGINT)")
                      .alias("cy"))
                 .select(F.col("cluster").alias("c"), "cx", "cy")
                 .localCheckpoint(eager=True))
    return (p.join(assign(p, cents), "id")
            .select("id", "cluster", "cx", "cy"))
