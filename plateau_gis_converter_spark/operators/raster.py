"""Raster <-> vector bridge: point rasterization onto the web-mercator
pixel grid, and the inverse pixel -> lng/lat cell geometry.

north_star: "raster<->vector tiling that reproduces the reference's
implicit-quadtree tile scheme and zoom-level MVT clipping rules". The
vector side (tile assignment, MVT slicing, quadtree rollup) ships in
operators/tile_assign.py + sinks/mvt.py; this module adds the RASTER
side the same way a density/heatmap tile layer is produced at scale:

* ``rasterize_points`` — each point lands on a global pixel at zoom z
  with ``tile_px`` pixels per tile axis (the MVT extent analog; the
  reference's slicer works in exactly this normalized mercator pixel
  space, nusamai-mvt/src/webmercator.rs:11-16 + sink/mvt/slice.rs),
  then one partial-agg groupBy counts points per pixel. Output one row
  per NON-EMPTY pixel: (z, x, y, px, py, n_points) — the sparse raster
  representation (dense 256x256 arrays would carry ~65k zeros per tile
  at web-scale sparsity).
* ``raster_cell_bounds`` — the inverse map back to vector space: each
  pixel's lng/lat bounding box in micro-degrees (exact inverse-mercator,
  the same formula chain both engines evaluate in identical op order so
  the gate hash-matches).

Scale: rasterize is ONE shuffle (the pixel groupBy, partial-combined
map-side); everything else is codegen'd arithmetic on the scan. The
pixel key (z,x,y,px,py) is the natural partition key for a downstream
per-tile raster sink — repartition by (x,y) and each task emits whole
tiles. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo


def _global_pixel(mx, my, zoom: int, tile_px: int):
    """Global pixel indices at zoom: floor(m * 2^z * P) with the slicer's
    rem_euclid wrap on x and clamp on y (slice.rs:107-195 semantics,
    applied at pixel rather than tile granularity)."""
    n = 1 << zoom
    world = float(n * tile_px)
    gx = F.floor(mx * F.lit(world)).cast("bigint")
    gx = ((gx % int(world)) + int(world)) % int(world)
    gy = F.floor(my * F.lit(world)).cast("bigint")
    gy = F.greatest(F.lit(0).cast("bigint"),
                    F.least(gy, F.lit(int(world) - 1)))
    return gx, gy


def rasterize_points(pts: DataFrame, zoom: int, tile_px: int = 256,
                     lng_col: str = "lng_udeg",
                     lat_col: str = "lat_udeg") -> DataFrame:
    """Sparse point-density raster at ``zoom``: one row per non-empty
    pixel with (z, x, y, px, py, n_points)."""
    mx = geo.mercator_mx(geo.udeg_to_deg(F.col(lng_col)))
    my = geo.mercator_my(geo.udeg_to_deg(F.col(lat_col)))
    gx, gy = _global_pixel(mx, my, zoom, tile_px)
    p = F.lit(tile_px).cast("bigint")
    return (pts.select((gx / p).cast("bigint").alias("x"),
                       (gy / p).cast("bigint").alias("y"),
                       (gx % p).alias("px"), (gy % p).alias("py"))
            .groupBy("x", "y", "px", "py")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .select(F.lit(zoom).cast("int").alias("z"),
                    "x", "y", "px", "py", "n_points"))


def raster_cell_bounds(raster: DataFrame, zoom: int,
                       tile_px: int = 256) -> DataFrame:
    """Vector geometry back from raster space: per pixel the lng/lat
    bounding box in micro-degrees (lng from the linear mercator x,
    lat via exact inverse mercator). Appends lng_min_udeg / lat_min_udeg
    / lng_max_udeg / lat_max_udeg."""
    world = float((1 << zoom) * tile_px)
    p = F.lit(tile_px).cast("bigint")
    gx = F.col("x") * p + F.col("px")
    gy = F.col("y") * p + F.col("py")

    def lng_udeg(g):
        return F.floor((g.cast("double") / F.lit(world) * F.lit(360.0)
                        - F.lit(180.0)) * F.lit(1e6) + F.lit(0.5)) \
            .cast("bigint")

    def lat_udeg(g):
        # inverse of mercator_my: lat = degrees(2*atan(exp(radians(
        #   180 - 360*my)))) - 90, my = g / world
        my = g.cast("double") / F.lit(world)
        lat = (F.degrees(F.lit(2.0) * F.atan(F.exp(F.radians(
            F.lit(180.0) - F.lit(360.0) * my)))) - F.lit(90.0))
        return F.floor(lat * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    return (raster
            .withColumn("lng_min_udeg", lng_udeg(gx))
            .withColumn("lng_max_udeg", lng_udeg(gx + F.lit(1)))
            # gy grows SOUTH (mercator y down): the cell's min latitude
            # is its bottom edge gy+1
            .withColumn("lat_min_udeg", lat_udeg(gy + F.lit(1)))
            .withColumn("lat_max_udeg", lat_udeg(gy)))


def apply_raster_delta(prev_raster: DataFrame, added_pts: DataFrame,
                       removed_pts: DataFrame, zoom: int,
                       tile_px: int = 256,
                       lng_col: str = "lng_udeg",
                       lat_col: str = "lat_udeg") -> DataFrame:
    """Incremental raster maintenance: fold a snapshot delta into a
    STORED density raster instead of re-rasterizing the corpus.

    ``new_raster = prev_raster + rasterize(added) - rasterize(removed)``,
    pixels whose count reaches 0 drop out. Lossless by linearity of the
    count aggregate: if ``prev_raster == rasterize(old points)`` and
    (added, removed) are the point-multiset delta (a moved/changed page
    contributes its old location to ``removed`` and its new location to
    ``added`` — exactly the two sides ``delta.crawl_delta`` routes),
    the result is bit-identical to ``rasterize_points(new points)``;
    the gate proves it against a full-recompute oracle.

    Scale: the two delta rasters aggregate only the DELTA points
    (partial-agg), the merge is one unionAll + one groupBy keyed by
    pixel — O(changed pixels + stored pixels), never O(corpus). This is
    the raster face of the incremental layer (crawl_delta -> dirty_tiles
    for vector tiles, this for heatmap tiles). A negative pixel count
    means the caller's delta is inconsistent with the stored raster;
    those rows are dropped with the zeros (both are "pixel is gone"),
    so a stale prev_raster cannot fabricate phantom pixels.
    """
    cols = ["z", "x", "y", "px", "py"]
    ra = rasterize_points(added_pts, zoom, tile_px, lng_col, lat_col)
    rr = rasterize_points(removed_pts, zoom, tile_px, lng_col, lat_col)
    signed = (prev_raster.select(*cols, F.col("n_points").alias("d"))
              .unionAll(ra.select(*cols, F.col("n_points").alias("d")))
              .unionAll(rr.select(*cols, (-F.col("n_points")).alias("d"))))
    return (signed.groupBy(*cols)
            .agg(F.sum("d").alias("n_points"))
            .where(F.col("n_points") > 0))


def zonal_stats(raster: DataFrame, zones: DataFrame, zoom: int,
                tile_px: int = 256) -> DataFrame:
    """Zonal statistics — the map-algebra operation that joins the raster
    face back to vector zones: per zone, aggregate the density-raster
    cells whose pixel index falls inside the zone's pixel bbox
    (inclusive corners: gx in [floor(mx_min*W), floor(mx_max*W)], gy in
    [floor(my(lat_max)*W), floor(my(lat_min)*W)] — mercator y grows
    SOUTH, so the zone's north edge is its smallest gy). Zones must not
    cross the antimeridian (corner x is clamped, not wrapped).

    zones: (zone_id, lng_min_udeg, lng_max_udeg, lat_min_udeg,
    lat_max_udeg). Returns per zone with >=1 covered non-empty cell:
    (zone_id, n_cells, n_points, max_density).

    Scale shape: NOT a nested-loop range join — each zone explodes into
    its covering TILE keys (sequence over the x/y tile ranges, map-side),
    then an equi-join on (x, y) against the raster co-partitions zone
    fragments with exactly the raster cells that can match, and the
    pixel-range predicate filters within the tile. Zone relations are
    small (admin boundaries, AOIs) so the exploded side broadcasts; the
    raster side never re-shuffles. One partial-agg groupBy per zone ends
    it. All-integer join keys and aggregates -> gate-exact.
    """
    world = float((1 << zoom) * tile_px)
    wmax = int(world) - 1
    p = F.lit(tile_px).cast("bigint")

    def _gx(lng_udeg):
        g = F.floor(geo.mercator_mx(geo.udeg_to_deg(lng_udeg))
                    * F.lit(world)).cast("bigint")
        return F.greatest(F.lit(0).cast("bigint"),
                          F.least(g, F.lit(wmax).cast("bigint")))

    def _gy(lat_udeg):
        g = F.floor(geo.mercator_my(geo.udeg_to_deg(lat_udeg))
                    * F.lit(world)).cast("bigint")
        return F.greatest(F.lit(0).cast("bigint"),
                          F.least(g, F.lit(wmax).cast("bigint")))

    z = (zones.select(
            "zone_id",
            _gx(F.col("lng_min_udeg")).alias("gx0"),
            _gx(F.col("lng_max_udeg")).alias("gx1"),
            _gy(F.col("lat_max_udeg")).alias("gy0"),
            _gy(F.col("lat_min_udeg")).alias("gy1"))
         .select("zone_id", "gx0", "gx1", "gy0", "gy1",
                 F.explode(F.sequence(F.expr("gx0 div " + str(tile_px)),
                                      F.expr("gx1 div " + str(tile_px))))
                 .alias("x"))
         .select("zone_id", "gx0", "gx1", "gy0", "gy1", "x",
                 F.explode(F.sequence(F.expr("gy0 div " + str(tile_px)),
                                      F.expr("gy1 div " + str(tile_px))))
                 .alias("y")))
    gx = F.col("x") * p + F.col("px")
    gy = F.col("y") * p + F.col("py")
    return (raster.join(F.broadcast(z), ["x", "y"])
            .where(gx.between(F.col("gx0"), F.col("gx1"))
                   & gy.between(F.col("gy0"), F.col("gy1")))
            .groupBy("zone_id")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("n_points").alias("n_points"),
                 F.max("n_points").alias("max_density")))


def raster_downsample(raster: DataFrame, levels: int,
                      tile_px: int = 256) -> DataFrame:
    """Roll a density raster up the pyramid by ``levels`` zooms: parent
    global pixel = child global pixel // 2^levels, counts sum. Because
    the pixel index is floor(m * 2^z * P), floor-dividing indices is
    EXACTLY equivalent to rasterizing the original points at the lower
    zoom (floor(floor(a*4)/4) == floor(a); the wrap modulus and the gy
    clamp commute with the division since world widths scale by the
    same power of two) — so a production heatmap pyramid rasterizes the
    corpus ONCE at max zoom and derives every other level with one
    partial-agg groupBy per level, never re-reading the points. The
    gate proves the equivalence: Spark downsamples z11->z9, the oracle
    rasterizes directly at z9.
    """
    p = F.lit(tile_px).cast("bigint")
    d = F.lit(1 << levels).cast("bigint")
    gx = F.floor((F.col("x") * p + F.col("px")) / d).cast("bigint")
    gy = F.floor((F.col("y") * p + F.col("py")) / d).cast("bigint")
    return (raster.select(
                (F.col("z") - F.lit(levels)).cast("int").alias("z"),
                F.floor(gx / p).cast("bigint").alias("x"),
                F.floor(gy / p).cast("bigint").alias("y"),
                (gx % p).alias("px"), (gy % p).alias("py"),
                F.col("n_points"))
            .groupBy("z", "x", "y", "px", "py")
            .agg(F.sum("n_points").alias("n_points")))


def hotspot_regions(raster: DataFrame, min_count: int,
                    tile_px: int = 256) -> DataFrame:
    """Density hotspot labeling over the sparse raster — the map-algebra
    "region group" operation (contiguous cells above a threshold share a
    region id): threshold the raster at ``min_count`` points, then label
    4-adjacent qualifying pixels with connected components.  The vector
    face of "where are the dense areas?" that a heatmap only shows —
    downstream consumers (per-region stats, region-aware sampling caps)
    need the LABELS.

    Global pixel key = (x * tile_px + px) * 2^32 + (y * tile_px + py) —
    collision-free for any zoom <= 24.  Adjacency is TWO map-side
    self-equi-joins (right neighbor, down neighbor — each a join on the
    shifted pixel key, no inequality/range join), then the alternating
    large-star/small-star CC over the edge set; isolated hot pixels
    (no hot neighbor) keep their own key as region id via the final
    left join.  Region id = min pixel key in the region (deterministic).

    Output: (gx, gy, n_points, region_id).  Scale: the thresholded
    relation is far smaller than the raster (hotspots are rare by
    definition); both neighbor joins key on exact integers, and CC is
    the O(log^2) alternating implementation.
    """
    from . import graph as gr

    p = int(tile_px)
    hot = (raster.where(F.col("n_points") >= int(min_count))
           .select((F.col("x") * p + F.col("px")).alias("gx"),
                   (F.col("y") * p + F.col("py")).alias("gy"),
                   F.col("n_points").cast("bigint").alias("n_points")))
    key = (F.col("gx") * F.lit(1 << 32) + F.col("gy"))
    cells = hot.select("gx", "gy", "n_points", key.alias("k"))
    right = (cells.alias("a").join(
        cells.alias("b"),
        (F.col("b.gx") == F.col("a.gx") + 1)
        & (F.col("b.gy") == F.col("a.gy")))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b")))
    down = (cells.alias("a").join(
        cells.alias("b"),
        (F.col("b.gx") == F.col("a.gx"))
        & (F.col("b.gy") == F.col("a.gy") + 1))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b")))
    labels = gr.connected_components(right.unionByName(down))
    return (cells.join(labels.withColumnRenamed("id", "k"), "k", "left")
            .select("gx", "gy", "n_points",
                    F.coalesce(F.col("component_id"), F.col("k"))
                    .cast("bigint").alias("region_id")))


def focal_stats(raster: DataFrame, zoom: int, tile_px: int = 256,
                radius: int = 1) -> DataFrame:
    """Focal (moving-window) sum over the sparse raster — the map-algebra
    convolution/box-filter every raster engine ships next to zonal stats
    and region grouping: each output pixel holds the sum of input counts
    in its (2r+1)^2 neighborhood (the smoothing pass a heatmap tile
    renderer applies before color-mapping).

    Dense rasters convolve row-by-row; the sparse-relational form is the
    SCATTER dual: every non-empty input pixel contributes its count to
    each of its (2r+1)^2 neighbors (two map-side ``explode(sequence)``s,
    no join), then ONE partial-agg groupBy sums per target pixel. The
    output domain is exactly the pixels within ``radius`` of a non-empty
    pixel — everything else is zero and stays unmaterialized, so cost is
    O(nnz * (2r+1)^2) regardless of raster extent. Edge handling matches
    ``rasterize_points``: x wraps around the antimeridian, y clamps —
    contributions past the poles are dropped.

    Output: (z, x, y, px, py, focal_sum).
    """
    world = (1 << int(zoom)) * int(tile_px)
    p = F.lit(int(tile_px)).cast("bigint")
    gx = F.col("x") * p + F.col("px")
    gy = F.col("y") * p + F.col("py")
    off = f"explode(sequence({-int(radius)}, {int(radius)}))"
    contrib = (raster
               .select(gx.alias("gx"), gy.alias("gy"), "n_points")
               .select("*", F.expr(off).alias("dx"))
               .select("*", F.expr(off).alias("dy")))
    tx = ((F.col("gx") + F.col("dx")) % world + world) % world
    ty = F.col("gy") + F.col("dy")
    summed = (contrib
              .where((ty >= 0) & (ty < world))
              .select(tx.alias("tx"), ty.alias("ty"), "n_points")
              .groupBy("tx", "ty")
              .agg(F.sum("n_points").cast("bigint").alias("focal_sum")))
    return summed.select(
        F.lit(int(zoom)).cast("int").alias("z"),
        (F.col("tx") / p).cast("bigint").alias("x"),
        (F.col("ty") / p).cast("bigint").alias("y"),
        (F.col("tx") % p).alias("px"), (F.col("ty") % p).alias("py"),
        "focal_sum")


def idw_surface(samples: DataFrame, cell_udeg: int,
                value_col: str = "value",
                lng_col: str = "lng_udeg", lat_col: str = "lat_udeg",
                w_scale: int = 10**9, d_scale: int = 10**6) -> DataFrame:
    """Inverse-distance-weighted interpolation onto a µdeg grid — the
    classic scattered-points -> continuous-surface raster operation
    (Shepard 1968), here with a 3x3-cell support window and EXACT
    integer arithmetic so the surface is engine-reproducible.

    Each sample scatters to its 3x3 neighbor cells (two map-side
    explodes, the focal_stats shape); weight against a target cell's
    CENTER is w = w_scale div (1 + (dx^2 + dy^2) div d_scale) — the
    1/(1+d^2) inverse-quadratic kernel with integer division at both
    steps. One partial-agg groupBy accumulates (sum v*w, sum w, n) and
    the surface value is the integer quotient. Output domain = cells
    within one cell of a sample (sparse, like the focal operator).

    Magnitude guard: |dx|,|dy| <= 1.5*cell_udeg, so with the defaults
    and cell_udeg <= ~10^6 every product stays far inside i64.

    Output: (cx, cy, n_samples, idw_value).
    """
    c = int(cell_udeg)
    cx = F.floor(F.col(lng_col) / F.lit(c)).cast("bigint")
    cy = F.floor(F.col(lat_col) / F.lit(c)).cast("bigint")
    off = "explode(sequence(-1, 1))"
    sc = (samples.select(F.col(lng_col).alias("lng"),
                         F.col(lat_col).alias("lat"),
                         F.col(value_col).cast("bigint").alias("v"),
                         cx.alias("cx0"), cy.alias("cy0"))
          .select("*", F.expr(off).alias("dxc"))
          .select("*", F.expr(off).alias("dyc"))
          .select("lng", "lat", "v",
                  (F.col("cx0") + F.col("dxc")).alias("cx"),
                  (F.col("cy0") + F.col("dyc")).alias("cy")))
    # integer DIV twice: d2s = (dx^2 + dy^2) div d_scale, w = w_scale
    # div (1 + d2s) — Column algebra has no integer-division operator,
    # so the two DIVs go through expr() on materialized columns
    sc = (sc.withColumn("dx", F.col("lng") - (F.col("cx") * c + c // 2))
          .withColumn("dy", F.col("lat") - (F.col("cy") * c + c // 2))
          .withColumn("w", F.expr(
              f"CAST({int(w_scale)} AS BIGINT) "
              f"DIV (1 + (dx * dx + dy * dy) DIV {int(d_scale)})")))
    agg = (sc.groupBy("cx", "cy")
           .agg(F.sum(F.col("v") * F.col("w")).alias("num"),
                F.sum("w").alias("den"),
                F.count(F.lit(1)).cast("bigint").alias("n_samples")))
    return agg.select("cx", "cy", "n_samples",
                      F.expr("CAST(num DIV den AS BIGINT)")
                      .alias("idw_value"))


def apply_focal_delta(prev_focal: DataFrame, added_pts: DataFrame,
                      removed_pts: DataFrame, zoom: int,
                      tile_px: int = 256, radius: int = 1,
                      lng_col: str = "lng_udeg",
                      lat_col: str = "lat_udeg") -> DataFrame:
    """Incremental FOCAL-raster maintenance: the box-filter is linear in
    the input raster (focal(R + D) = focal(R) + focal(D)), so a stored
    smoothed heatmap updates from the snapshot delta alone:

        new_focal = prev_focal + focal(rasterize(added))
                               - focal(rasterize(removed))

    pixels whose smoothed count reaches 0 drop out (and negatives from a
    stale prev_focal drop with them — same consistency discipline as
    ``apply_raster_delta``). Lossless against a full
    rasterize-then-focal recompute of the new snapshot; the gate proves
    it. Cost: two delta rasters + their (2r+1)^2 scatters + ONE merge
    groupBy — O(changed pixels), never O(corpus). Completes the
    incremental family across derived rasters, not just the base one.
    """
    cols = ["z", "x", "y", "px", "py"]
    fa = focal_stats(rasterize_points(added_pts, zoom, tile_px,
                                      lng_col, lat_col),
                     zoom, tile_px, radius)
    fr = focal_stats(rasterize_points(removed_pts, zoom, tile_px,
                                      lng_col, lat_col),
                     zoom, tile_px, radius)
    signed = (prev_focal.select(*cols, F.col("focal_sum").alias("d"))
              .unionAll(fa.select(*cols, F.col("focal_sum").alias("d")))
              .unionAll(fr.select(*cols, (-F.col("focal_sum")).alias("d"))))
    return (signed.groupBy(*cols)
            .agg(F.sum("d").alias("focal_sum"))
            .where(F.col("focal_sum") > 0))


def morans_i(raster: DataFrame, value_col: str = "n_points",
             tile_px: int = 256) -> DataFrame:
    """Global Moran's I spatial autocorrelation of the sparse density
    raster (Moran 1950; the standard clustered-vs-dispersed diagnostic a
    geo pipeline reports next to hotspot maps).  Cells are the raster's
    NON-EMPTY pixels (the sparse-representation convention, documented:
    empty pixels are outside the study region, as in `hotspot_regions`);
    the weight matrix is binary rook adjacency (|dgx|+|dgy| = 1, no
    x wrap) between those cells.

        I = (n / W) * Σ_ij w_ij (x_i − x̄)(x_j − x̄) / Σ_i (x_i − x̄)²

    INTEGER-EXACT moments: multiply the centered terms through by n —
    d_i = n·x_i − S (S = Σx) is a pure int64, so num = Σ_directed
    d_i·d_j, den = Σ d_i², W = directed-pair count, and n are all
    exact, associative, merge-order-free aggregates (the house
    discipline).  I = n·num / (W·den) is emitted both as the four exact
    integers AND as i_milli via ONE fixed-order scalar double chain
    (same op order in the oracle — the `hll_estimate_grouped` pattern).
    Overflow ceiling (documented like bm25's): |d_i| ≤ n·max_x + S, so
    num needs (n·max_x + S)² < 2^63 — holds whenever n·max_x < 3e9,
    i.e. any realistic zoom at the fixture scales; a planetary-scale
    raster runs the same plan per-region.

    Plan shape: one 1-row stats agg (broadcast back via cross join),
    one map-side 4-offset explode + equi-join on the neighbor key
    (never an all-pairs/inequality join), two partial aggs.  Zero
    Python, zero driver data beyond the single output row.
    """
    p = F.lit(int(tile_px)).cast("bigint")
    cells = raster.select(
        (F.col("x") * p + F.col("px")).alias("gx"),
        (F.col("y") * p + F.col("py")).alias("gy"),
        F.col(value_col).cast("bigint").alias("v"))
    stats = cells.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"))
    d = (cells.crossJoin(F.broadcast(stats))
         .select("gx", "gy", "n", "s",
                 (F.col("n") * F.col("v") - F.col("s")).alias("d")))
    offsets = F.expr("array(struct(1L as dx, 0L as dy),"
                     " struct(-1L as dx, 0L as dy),"
                     " struct(0L as dx, 1L as dy),"
                     " struct(0L as dx, -1L as dy))")
    probes = (d.select("gx", "gy", "d", F.explode(offsets).alias("o"))
              .select((F.col("gx") + F.col("o.dx")).alias("gx"),
                      (F.col("gy") + F.col("o.dy")).alias("gy"),
                      F.col("d").alias("da")))
    pairs = probes.join(d.select("gx", "gy", F.col("d").alias("db")),
                        ["gx", "gy"])
    nm = pairs.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("w_sum"),
        F.coalesce(F.sum(F.col("da") * F.col("db")), F.lit(0))
        .cast("bigint").alias("num"))
    dn = d.groupBy().agg(F.max("n").alias("n"),
                         F.sum(F.col("d") * F.col("d"))
                         .cast("bigint").alias("den"))
    out = dn.crossJoin(nm)
    i_milli = F.floor(
        F.col("num").cast("double") / F.col("den").cast("double")
        * F.col("n").cast("double") / F.col("w_sum").cast("double")
        * F.lit(1000.0) + F.lit(0.5)).cast("bigint")
    return out.select(
        "n", "w_sum", "num", "den",
        F.when((F.col("den") > 0) & (F.col("w_sum") > 0), i_milli)
        .otherwise(F.lit(None).cast("bigint")).alias("i_milli"))


def contour_cases(raster: DataFrame, thr: int,
                  tile_px: int = 256) -> DataFrame:
    """Marching-squares cell classification of the sparse density raster
    at iso-level ``thr`` — the raster -> vector bridge in the OTHER
    direction from ``rasterize_points`` (the reference vectorizes
    derived surfaces the same way its tiling stage polygonizes
    coverage; contour extraction is the standard cartographic move on
    a density heatmap before it ships as an MVT overlay layer).

    Every 2x2 pixel block whose corners straddle the threshold yields a
    marching-squares case id: bit 1 = (bx, by) set, bit 2 = (bx+1, by),
    bit 4 = (bx, by+1), bit 8 = (bx+1, by+1), where "set" means the
    pixel's count >= thr (absent sparse pixels are 0, the documented
    sparse-raster convention). Cases 0 and 15 emit no contour; the two
    saddle cases (6 and 9 — diagonal corners set) emit 2 segments, all
    other non-trivial cases 1.

    Output: (bx, by, case_id, n_segments) per contour-carrying block in
    GLOBAL pixel coords (gx = x*tile_px + px, as morans_i).

    Plan: set pixels scatter to their <= 4 containing blocks with the
    corner's bit weight (a map-side 4-element explode), ONE sum
    aggregation keyed by block — O(set pixels), never O(raster area);
    blocks no set pixel touches are case 0 by construction and never
    materialize. Zero Python, zero floats; the oracle recomputes blocks
    by four LEFT JOIN corner probes (an independent formulation of the
    same classification).
    """
    p = F.lit(int(tile_px)).cast("bigint")
    px = (raster.where(F.col("n_points") >= F.lit(int(thr)))
          .select((F.col("x") * p + F.col("px")).alias("gx"),
                  (F.col("y") * p + F.col("py")).alias("gy")))
    corners = F.expr("array(struct(0L as dx, 0L as dy, 1L as w),"
                     " struct(1L as dx, 0L as dy, 2L as w),"
                     " struct(0L as dx, 1L as dy, 4L as w),"
                     " struct(1L as dx, 1L as dy, 8L as w))")
    scattered = (px.select("gx", "gy", F.explode(corners).alias("o"))
                 .select((F.col("gx") - F.col("o.dx")).alias("bx"),
                         (F.col("gy") - F.col("o.dy")).alias("by"),
                         F.col("o.w").alias("w")))
    cases = (scattered.groupBy("bx", "by")
             .agg(F.sum("w").cast("bigint").alias("case_id"))
             .where(F.col("case_id") != 15))
    return cases.select(
        "bx", "by", "case_id",
        F.when(F.col("case_id").isin(6, 9), F.lit(2)).otherwise(F.lit(1))
        .cast("bigint").alias("n_segments"))
