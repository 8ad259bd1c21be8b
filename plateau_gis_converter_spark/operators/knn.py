"""k-nearest-neighbors via tile ring expansion (SURVEY §7.1 M4).

For each query point, candidates are the points in the query's index cell
and its expanding rings of neighboring cells; exact haversine re-rank picks
the top-k. The ring radius doubles until every query has >= k candidates —
each round is a broadcast-able equi-join on cell ids, never a cross join.

At 100 TB: the point side is cell-partitioned; ring-expansion touches only
the cells adjacent to query cells (partition pruning on the cell column);
the iteration count is bounded (log of the sparsest region's radius).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geo

INDEX_ZOOM = 12


def _with_cell(df: DataFrame, lng_col: str, lat_col: str, zoom: int) -> DataFrame:
    z = F.lit(zoom)
    mx = geo.mercator_mx(geo.udeg_to_deg(F.col(lng_col)))
    my = geo.mercator_my(geo.udeg_to_deg(F.col(lat_col)))
    return (df.withColumn("cell_x", geo.tile_x(z, mx))
              .withColumn("cell_y", geo.tile_y(z, my)))


def _haversine_m(lng1, lat1, lng2, lat2):
    """Great-circle distance in meters (pure Catalyst trig)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng) * F.sin(dlng))
    return F.lit(2.0 * 6371000.0) * F.asin(F.sqrt(a))


def knn_ring_expansion(spark: SparkSession, points: DataFrame,
                       queries: DataFrame, k: int = 5,
                       zoom: int = INDEX_ZOOM, max_rings: int = 4) -> DataFrame:
    """points(point_id, lng_udeg, lat_udeg) x queries(query_id, lng_udeg,
    lat_udeg) -> top-k nearest points per query.

    Ring r candidates: |cell_x_p - cell_x_q| <= r and |cell_y_p - cell_y_q|
    <= r, built as an explode of the query's (2r+1)^2 neighbor cells followed
    by an equi-join (hash join, broadcast when queries are small).
    """
    pts = _with_cell(points, "lng_udeg", "lat_udeg", zoom)
    qs = _with_cell(queries, "lng_udeg", "lat_udeg", zoom).select(
        "query_id",
        F.col("lng_udeg").alias("q_lng"), F.col("lat_udeg").alias("q_lat"),
        F.col("cell_x").alias("q_cx"), F.col("cell_y").alias("q_cy"))

    result = None
    remaining = qs
    r = 1
    for _ in range(max_rings):
        offs = F.sequence(F.lit(-r), F.lit(r))
        neigh = (remaining
                 .withColumn("dx", F.explode(offs))
                 .withColumn("dy", F.explode(offs))
                 .withColumn("cell_x", F.col("q_cx") + F.col("dx"))
                 .withColumn("cell_y", F.col("q_cy") + F.col("dy"))
                 .drop("dx", "dy"))
        cand = neigh.join(pts, ["cell_x", "cell_y"])
        cand = cand.withColumn(
            "dist_m", _haversine_m(geo.udeg_to_deg(F.col("q_lng")),
                                   geo.udeg_to_deg(F.col("q_lat")),
                                   geo.udeg_to_deg(F.col("lng_udeg")),
                                   geo.udeg_to_deg(F.col("lat_udeg"))))
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist_m").asc(), F.col("point_id").asc())
        ranked = (cand.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "point_id", "rank", "dist_m"))
        counts = ranked.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
        done_ids = counts.where(F.col("n") >= k).select("query_id")
        done = ranked.join(done_ids, "query_id", "left_semi")
        result = done if result is None else result.unionByName(done)
        remaining = remaining.join(done_ids, "query_id", "left_anti")
        if not remaining.take(1):
            break
        r *= 2
    if remaining.take(1):
        # sparse stragglers: final pass keeps whatever was found in the last ring
        leftover = (qs.join(remaining.select("query_id"), "query_id", "left_semi"))
        neigh = (leftover
                 .withColumn("dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
                 .withColumn("dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
                 .withColumn("cell_x", F.col("q_cx") + F.col("dx"))
                 .withColumn("cell_y", F.col("q_cy") + F.col("dy")))
        cand = neigh.join(pts, ["cell_x", "cell_y"]).withColumn(
            "dist_m", _haversine_m(geo.udeg_to_deg(F.col("q_lng")),
                                   geo.udeg_to_deg(F.col("q_lat")),
                                   geo.udeg_to_deg(F.col("lng_udeg")),
                                   geo.udeg_to_deg(F.col("lat_udeg"))))
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist_m").asc(), F.col("point_id").asc())
        last = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "point_id", "rank", "dist_m"))
        result = last if result is None else result.unionByName(last)
    return result
