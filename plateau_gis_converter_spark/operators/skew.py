"""Skew handling for dense urban cells (north_rule requirement).

The reference has NO skew mitigation — it just warns past 200,000 features
per tile (nusamai/src/sink/mvt/mod.rs:296-301) and degrades detail (O4).
At 10^12 pages, Tokyo hot-spot cells would stall single shuffle partitions,
so the engine adds:

* ``salted_aggregate`` — two-phase aggregation: partial agg on
  (key, salt=hash(row)%k), final agg on key. Spark's partial hash agg
  already does map-side combine; explicit salting additionally splits a hot
  REDUCE key across k reducers — needed when one key's partials alone
  overwhelm a partition.
* ``adaptive_cell_split`` — reassigns cells whose row count exceeds a cap to
  their z+1 children (re-derived from the point coords), recursively
  bounding per-cell cardinality — the spatial analog of AQE skew-split,
  applied at the *logical* cell level so downstream per-cell state (encode
  buffers, kNN rings) stays bounded too.
* AQE (`spark.sql.adaptive.skewJoin.enabled`) handles residual physical
  skew at runtime (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo


def salted_aggregate(df: DataFrame, key_cols: list[str], agg_exprs: dict,
                     salt_col: str, buckets: int = 16) -> DataFrame:
    """Two-phase agg with an explicit salt on the hot key.

    agg_exprs: {out_name: ("sum"|"count"|"min"|"max", col)} — mergeable aggs
    only (the partial of a sum is a sum, etc.).
    """
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)).alias("_salt")
    partial_aggs = []
    for out, (fn, col) in agg_exprs.items():
        if fn == "count":
            partial_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        else:
            partial_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    final_aggs = []
    for out, (fn, _) in agg_exprs.items():
        merge_fn = "sum" if fn in ("count", "sum") else fn
        final_aggs.append(getattr(F, merge_fn)(f"_p_{out}").alias(out))
    return partial.groupBy(*key_cols).agg(*final_aggs)


def with_cell(df: DataFrame, zoom: int, lng_col: str = "lng_udeg",
              lat_col: str = "lat_udeg") -> DataFrame:
    z = F.lit(zoom)
    mx = geo.mercator_mx(geo.udeg_to_deg(F.col(lng_col)))
    my = geo.mercator_my(geo.udeg_to_deg(F.col(lat_col)))
    return (df.withColumn("cell_z", z)
              .withColumn("cell_x", geo.tile_x(z, mx))
              .withColumn("cell_y", geo.tile_y(z, my)))


def adaptive_cell_split(df: DataFrame, base_zoom: int = 12,
                        max_rows_per_cell: int = 100_000,
                        max_extra_levels: int = 4) -> DataFrame:
    """Assign each point the deepest cell needed to keep every cell under
    ``max_rows_per_cell`` rows: overflowing cells are re-assigned to their
    z+1 children, up to ``max_extra_levels`` deeper.

    Implementation: one count per level (small aggregates — cells, not
    rows, flow to the driver-side loop condition; the row-level reassign is
    a join + column swap, no collect of data rows).
    """
    out = with_cell(df, base_zoom).persist()
    cached = [out]
    for zoom in range(base_zoom, base_zoom + max_extra_levels):
        counts = (out.where(F.col("cell_z") == zoom)
                  .groupBy("cell_z", "cell_x", "cell_y")
                  .agg(F.count(F.lit(1)).alias("n")))
        hot = counts.where(F.col("n") > max_rows_per_cell)
        if not hot.take(1):
            break
        hot_cells = hot.select("cell_z", "cell_x", "cell_y")
        z_next = F.lit(zoom + 1)
        mx = geo.mercator_mx(geo.udeg_to_deg(F.col("lng_udeg")))
        my = geo.mercator_my(geo.udeg_to_deg(F.col("lat_udeg")))
        flagged = out.join(F.broadcast(hot_cells),
                           ["cell_z", "cell_x", "cell_y"], "left_semi")
        rest = out.join(F.broadcast(hot_cells),
                        ["cell_z", "cell_x", "cell_y"], "left_anti")
        resplit = (flagged
                   .withColumn("cell_z", z_next)
                   .withColumn("cell_x", geo.tile_x(z_next, mx))
                   .withColumn("cell_y", geo.tile_y(z_next, my)))
        out = rest.unionByName(resplit).persist()
        cached.append(out)
    # each level's loop condition + joins read the persisted previous level,
    # never the full re-derived lineage; caches release lazily downstream
    for c in cached[:-1]:
        c.unpersist()
    return out


def salted_replicated_join(fact: DataFrame, dim: DataFrame, key: str,
                           row_col: str, buckets: int = 16) -> DataFrame:
    """Hot-key SHUFFLE-join mitigation: fragment-replicate (skew) join.

    ``salted_aggregate`` fixes hot reduce keys in aggregations; this is the
    join-side counterpart for when the dim side is too big to broadcast and
    a handful of fact keys dominate (Tokyo hot-spot cells, bot user-ids):
    a plain shuffle join sends EVERY row of a hot key to one reducer.

    Technique (Pig's "skewed join" / fragment-replicate): replicate each
    dim row ``buckets`` times with salt 0..buckets-1 (map-side explode, no
    shuffle on the replicate itself), salt each fact row deterministically
    from a row-unique column, then equi-join on (key, salt) — the hot key's
    rows spread over ``buckets`` reducers, each holding a full dim copy for
    that key. Dim shuffle volume grows buckets×; choose buckets ≈ the skew
    factor. Result-identical to the plain join for ANY join keys because
    every (fact row, dim row) pair meets at exactly one salt value — the
    ``skew_salted_join`` gate proves that against the plain-join oracle.

    The join is hinted ``shuffle_hash`` so the mitigation path (and not a
    broadcast) is what actually executes — plan-asserted in tests. AQE's
    skewJoin handles residual physical skew; this operator is the explicit
    logical-level variant for engines/pipelines that need deterministic
    partition bounds (state sizing, spill budgets).
    """
    fsalt = F.pmod(F.hash(F.col(row_col)), F.lit(buckets))
    f2 = fact.withColumn("_salt", fsalt)
    d2 = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    return (f2.join(d2.hint("shuffle_hash"), [key, "_salt"])
            .drop("_salt"))


def cell_occupancy_stats(points: DataFrame, sizes_udeg: list[int],
                         x_col: str = "lng_udeg",
                         y_col: str = "lat_udeg") -> DataFrame:
    """Grid-index tuning advisor: for each candidate cell size, the
    occupancy distribution (cell count, max, mean, exact p95) of the
    point set — the number every covering-cell operator here
    (spatial_join, distance_band, snap_points, dbscan, segment
    intersections) needs BEFORE choosing its cell size: too coarse and
    one cell carries a quadratic hot key, too fine and long objects
    scatter wide. ``adaptive_cell_split`` fixes hot cells after the
    fact; this measures the trade before.

    One bounded explode (|sizes| rows per point), ONE partial-agg count
    per (size, cell), then per-size stats on the small cell relation —
    p95 exactly via the count-of-counts cumulative rule
    (``value_quantiles`` discipline), never a row sort.

    Output: (cell_udeg, n_points, n_cells, max_occ, mean_milli,
    p95_occ).
    """
    if not sizes_udeg or any(s < 1 for s in sizes_udeg):
        raise ValueError(f"sizes_udeg must be positive, got {sizes_udeg}")
    cells = F.array(*[
        F.struct(F.lit(int(s)).cast("bigint").alias("sz"),
                 F.floor(F.col(x_col) / F.lit(int(s))).cast("bigint")
                 .alias("cx"),
                 F.floor(F.col(y_col) / F.lit(int(s))).cast("bigint")
                 .alias("cy"))
        for s in sizes_udeg])
    occ = (points.select(F.explode(cells).alias("c"))
           .groupBy(F.col("c.sz").alias("sz"), F.col("c.cx").alias("cx"),
                    F.col("c.cy").alias("cy"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("occ")))
    # count-of-counts: how many cells hold exactly `occ` points
    coc = occ.groupBy("sz", "occ").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"))
    wc = (Window.partitionBy("sz").orderBy("occ")
          .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("sz")
    cum = (coc.withColumn("cum", F.sum("nc").over(wc))
           .withColumn("n_cells", F.sum("nc").over(wall))
           .withColumn("n_points",
                       F.sum(F.col("nc") * F.col("occ")).over(wall))
           .withColumn("max_occ", F.max("occ").over(wall)))
    tgt = F.expr("(95 * n_cells + 99) div 100")  # ceil(0.95 * n_cells)
    p95 = (cum.where(F.col("cum") >= tgt)
           .groupBy("sz", "n_cells", "n_points", "max_occ")
           .agg(F.min("occ").alias("p95_occ")))
    return p95.select(
        F.col("sz").alias("cell_udeg"), "n_points", "n_cells", "max_occ",
        F.expr("1000 * n_points div n_cells").cast("bigint")
        .alias("mean_milli"),
        F.col("p95_occ").cast("bigint").alias("p95_occ"))
