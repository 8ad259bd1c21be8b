"""Grid-density spatial clustering (DBSCAN-lite) over page points.

"Where are the page hot-spots?" — the density question behind the
reference's adaptive tile handling (its MVT writer warns at 200k
features/tile, ``sinks/mvt.rs`` warn path; our ``operators/skew.py``
splits hot cells adaptively).  Full DBSCAN needs an eps-neighborhood
search per POINT — a self-join that is quadratic in hot spots, exactly
where it hurts.  The grid variant snaps points to an eps-sized integer
grid and clusters CELLS:

* **cell assign (map-only)**: ``(floor(lng/eps), floor(lat/eps))`` in
  integer micro-degrees — all-integer, so cell boundaries are exact in
  every engine (same discipline as ``functions/geo.geohash_udeg``).
* **core cells**: one partial-agg groupBy — cells with >= ``min_count``
  points.  Everything after runs on CELLS, whose count is bounded by
  the geographic extent / eps², not by the 10^12 page count.
* **cell adjacency**: core cells 8-adjacent to each other get an edge —
  an explode of the 8 neighbor offsets + ONE equi-join on the packed
  cell key (never an inequality join).
* **components**: ``graph.connected_components`` (alternating
  large-star/small-star, the trillion-edge path) labels each core cell
  with the min packed cell key of its cluster; isolated core cells
  keep their own key as the label.
* **point labels**: points join their cell's label (broadcast — the
  core-cell relation is small); points in non-core cells are noise
  (``cluster = -1``).

Equivalent semantics: two points cluster together iff their cells chain
through 8-adjacent core cells — the standard grid relaxation of DBSCAN
(cell diagonal <= eps·sqrt(2), so chained cells are within ~1.5 eps).
Deterministic: labels are min-cell-key, independent of partitioning.

The gate's oracle recomputes the closure as a DuckDB recursive CTE over
the same integer cells — an independent fixpoint formulation (transitive
closure by label reachability) rather than a port of the star-contraction
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import graph

# packed key offset: grid indices can be negative (west/south hemisphere)
_OFF = 1 << 20
_SHIFT = 1 << 21


def cell_key(cx, cy):
    """Pack a (cx, cy) grid cell into one bigint (all-integer, exact)."""
    return ((cx + F.lit(_OFF)) * F.lit(_SHIFT) + (cy + F.lit(_OFF))) \
        .cast("bigint")


def assign_cells(points: DataFrame, eps_udeg: int,
                 lng_col: str = "lng_udeg",
                 lat_col: str = "lat_udeg") -> DataFrame:
    """points + (cx, cy, cell) — floor-divide in integer micro-degrees."""
    if eps_udeg < 1:
        raise ValueError(f"eps_udeg must be >= 1, got {eps_udeg}")
    cx = F.floor(F.col(lng_col) / eps_udeg).cast("bigint")
    cy = F.floor(F.col(lat_col) / eps_udeg).cast("bigint")
    return points.withColumn("cx", cx).withColumn("cy", cy) \
                 .withColumn("cell", cell_key(F.col("cx"), F.col("cy")))


def grid_cluster(points: DataFrame, eps_udeg: int, min_count: int,
                 lng_col: str = "lng_udeg", lat_col: str = "lat_udeg",
                 max_iters: int = 50) -> DataFrame:
    """Label every point: ``(point columns..., cell, cluster)`` where
    ``cluster`` is the min packed cell key of the point's core-cell
    component, or -1 for noise (point in a cell with < min_count
    points)."""
    pts = assign_cells(points, eps_udeg, lng_col, lat_col)
    # the core-cell relation is tiny (bounded by extent/eps^2) but is
    # consumed three times (both edge sides + the label join); pin it so
    # the full point scan + partial agg runs once
    core = (pts.groupBy("cx", "cy", "cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= min_count)
            .select("cx", "cy", "cell")
            .localCheckpoint(eager=True))

    # 8-neighbor edges between core cells: explode offsets, one equi-join
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    nbr = core.select(
        F.col("cell").alias("cell_a"),
        F.explode(F.array(*[
            cell_key(F.col("cx") + F.lit(dx), F.col("cy") + F.lit(dy))
            for dx, dy in offs])).alias("cell_b"))
    edges = (nbr.join(core.select(F.col("cell").alias("cell_b")), "cell_b")
             .where(F.col("cell_a") < F.col("cell_b")))

    labels = graph.connected_components(
        edges, a_col="cell_a", b_col="cell_b", max_iters=max_iters)
    # isolated core cells (no adjacent core cell) label themselves
    cell_label = (core.join(
        labels.withColumnRenamed("id", "cell"), "cell", "left")
        .select("cell",
                F.coalesce("component_id", "cell").alias("cluster")))
    return (pts.join(F.broadcast(cell_label), "cell", "left")
            .withColumn("cluster",
                        F.coalesce("cluster", F.lit(-1)).cast("bigint"))
            .drop("cx", "cy"))
