"""Exact integer polygon geometry: shoelace area and centroid over
vertex relations.

The reference computes per-feature bboxes and geometric error from
polygon rings (nusamai's geometry stats / tiling stages); the metric a
boundary TABLE needs beyond bbox is area and centroid — zone
normalization (pages per km^2), label placement, ward-level density.
With µdeg integer vertices the shoelace sum and the centroid NUMERATORS
are exact int64 (cross products of <= 2^28-scale coords), so the result
is engine-reproducible with no epsilon anywhere.

Relational form: one row per (polygon, vertex index) — any ring length,
not a fixed arity. The wrap (last vertex -> first) is an equi-join on
(poly, (i+1) mod n) with n from a count window over the same key: one
Exchange on the polygon id, never a cross join. Rings must be CCW in
(lng, lat) for positive area (the fixture convention; CW rings yield
the negated sum — callers can abs() or assert sign).

Centroid: Cx = sum((x_i + x_{i+1}) * cross_i) / (3 * sum(cross_i)),
kept as integer numerator DIV denominator (exact floor for the positive
Tokyo-quadrant coords; a global corpus would carry the sign through).

Overflow discipline: at raw µdeg the centroid numerator reaches
(x_i + x_{i+1}) * cross_i ~ 2.8e8 * 2.6e12 = 7e20 — past i64 (observed
as a DuckDB range error; Spark would WRAP silently). The shoelace sum
and centroid are translation-invariant, so vertices are first shifted
to a per-polygon local origin (min x / min y via one window over the
same key) where coords are ring-extent-sized; the centroid shifts back
by the origin after the division. Exact for any ring whose EXTENT stays
under ~2^21 µdeg (a ward is ~10^5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ring_area2_centroid(vertices: DataFrame, poly_col: str = "poly_id",
                        idx_col: str = "i", x_col: str = "x",
                        y_col: str = "y") -> DataFrame:
    """Per polygon: twice the signed shoelace area (µdeg^2, exact
    BIGINT) and the integer-DIV centroid. Input: one row per vertex,
    ``idx_col`` 0..n-1 in ring order.

    Output: (poly_id, n_vertices, area2_udeg2, cx_udeg, cy_udeg).
    """
    wp = Window.partitionBy("p")
    v = (vertices.select(F.col(poly_col).alias("p"),
                         F.col(idx_col).cast("bigint").alias("i"),
                         F.col(x_col).cast("bigint").alias("x"),
                         F.col(y_col).cast("bigint").alias("y"))
         .withColumn("n", F.count(F.lit(1)).over(wp))
         .withColumn("x0", F.min("x").over(wp))
         .withColumn("y0", F.min("y").over(wp))
         .withColumn("x", F.col("x") - F.col("x0"))
         .withColumn("y", F.col("y") - F.col("y0")))
    nxt = v.select(F.col("p").alias("p2"),
                   F.col("i").alias("i2"),
                   F.col("x").alias("x2"), F.col("y").alias("y2"))
    edges = v.join(nxt, (F.col("p") == F.col("p2"))
                   & (F.col("i2") == (F.col("i") + 1) % F.col("n")))
    cross = F.col("x") * F.col("y2") - F.col("x2") * F.col("y")
    agg = (edges.groupBy("p", "x0", "y0")
           .agg(F.max("n").alias("n_vertices"),
                F.sum(cross).alias("area2"),
                F.sum((F.col("x") + F.col("x2")) * cross).alias("cxn"),
                F.sum((F.col("y") + F.col("y2")) * cross).alias("cyn")))
    return agg.select(
        F.col("p").alias(poly_col),
        F.col("n_vertices").cast("bigint").alias("n_vertices"),
        F.col("area2").cast("bigint").alias("area2_udeg2"),
        F.expr("CAST(x0 + cxn DIV (3 * area2) AS BIGINT)")
        .alias("cx_udeg"),
        F.expr("CAST(y0 + cyn DIV (3 * area2) AS BIGINT)")
        .alias("cy_udeg"))


def convex_hull_vertices(pts: DataFrame, key_col: str = "cell",
                         x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-group 2-D convex hull VERTEX set (strict corners) over integer
    coordinates — coverage-extent summarization: the minimal polygon
    enclosing a cell's pages for footprint display, spatial-index MBR
    refinement, cluster outline export.

    Kernel: Andrew's monotone chain per group via ``applyInPandas`` —
    the deliberate Python-by-design path (a data-dependent stack has no
    Catalyst form), with EXACT Python-int cross products (no float ever
    enters, so the result is bit-deterministic and an independent SQL
    characterization can gate it). Strict-turn popping (pop on
    cross <= 0) drops collinear edge-interior points, so the emitted
    set is exactly the EXTREME points: p is emitted iff p is NOT in the
    convex hull of the other points — the property the gate's oracle
    states directly via Caratheodory (p inside-or-on a non-degenerate
    triangle of others, or strictly within a segment of two others).

    Scale: one shuffle keyed by group; per-group work O(n log n); group
    size is a cell's population (bounded by the gridding, same contract
    as every cell-keyed operator here). Duplicate points collapse
    first. Output: (key, x, y), one row per hull vertex; singleton
    groups emit their point, collinear groups their two endpoints.
    """
    import pandas as pd

    out_schema = f"{key_col} bigint, {x_col} bigint, {y_col} bigint"

    def _hull(pdf: "pd.DataFrame") -> "pd.DataFrame":
        key = int(pdf[key_col].iloc[0])
        p = sorted({(int(a), int(b))
                    for a, b in zip(pdf[x_col], pdf[y_col])})
        if len(p) <= 2:
            hull = p
        else:
            def cross(o, a, b):
                return ((a[0] - o[0]) * (b[1] - o[1])
                        - (a[1] - o[1]) * (b[0] - o[0]))

            def half(seq):
                h: list = []
                for q in seq:
                    while len(h) >= 2 and cross(h[-2], h[-1], q) <= 0:
                        h.pop()
                    h.append(q)
                return h

            hull = half(p)[:-1] + half(reversed(p))[:-1]
        return pd.DataFrame([(key, x, y) for x, y in hull],
                            columns=[key_col, x_col, y_col])

    return (pts.select(F.col(key_col).cast("bigint").alias(key_col),
                       F.col(x_col).cast("bigint").alias(x_col),
                       F.col(y_col).cast("bigint").alias(y_col))
            .groupBy(key_col).applyInPandas(_hull, out_schema))


def segment_intersections(a: DataFrame, b: DataFrame,
                          cell_udeg: int = 32768) -> DataFrame:
    """Exact integer segment-intersection join between two segment sets
    (road/boundary overlay — the line-line companion of the point-in-
    polygon spatial join; the reference's slicing stages clip segments
    against tile edges with the same orientation tests,
    nusamai/src/sink/mvt/slice.rs).

    Inputs: (seg_id, x1, y1, x2, y2) integer µdeg endpoints per side.
    Output: (a_id, b_id, proper) for every intersecting pair — proper=1
    for a transversal crossing, 0 for touches (shared endpoint,
    endpoint-on-interior, collinear overlap).

    Candidates come from a covering-grid index: each segment scatters to
    every ``cell_udeg``-sized cell its bbox overlaps (a map-side
    2-D sequence explode), pairs meet by cell equi-join. LOSSLESS: two
    intersecting segments have overlapping bboxes, and overlapping
    real intervals have overlapping floor-quantized cell ranges, so an
    intersecting pair always shares >= 1 cell — the gate proves this
    against a brute-force all-pairs oracle. Pick ``cell_udeg`` near the
    ~p95 segment extent: too small scatters long segments wide, too
    large packs unrelated segments together (same tuning contract as
    the z12 covering-cell polygon index).

    The predicate is the CLRS SEGMENTS-INTERSECT exact integer test —
    four cross-product orientations d1..d4, proper iff d1·d2 < 0 and
    d3·d4 < 0, else the four collinear/on-segment bbox probes. All
    int64 (differences of same-quadrant µdeg coords are < 2^31, their
    products < 2^62); zero floats, zero Python. Pairs sharing several
    cells collapse by one distinct AFTER the cheap map-side predicate,
    so the shuffle carries only true hits.

    Scale: one shuffle per side keyed by cell, one equi-join, one
    distinct over hits. Skewed cells (a downtown) are AQE-splittable —
    the join key is the cell, the classic salt target.
    """
    c = int(cell_udeg)
    shift = 1 << 31  # keep floor-division exact for negative coords

    def cells(df: DataFrame, tag: str) -> DataFrame:
        # `div` (integer division) on the shift-positive coords keeps the
        # cell index exact for ANY cell size (a double `/` would only be
        # exact for power-of-two cells).
        base = df.select(
            F.col("seg_id").alias(f"{tag}_id"),
            F.col("x1").cast("bigint").alias(f"{tag}x1"),
            F.col("y1").cast("bigint").alias(f"{tag}y1"),
            F.col("x2").cast("bigint").alias(f"{tag}x2"),
            F.col("y2").cast("bigint").alias(f"{tag}y2"))
        x1, y1 = f"{tag}x1", f"{tag}y1"
        x2, y2 = f"{tag}x2", f"{tag}y2"
        return (base.select(
            "*",
            F.explode(F.expr(
                f"sequence((least({x1}, {x2}) + {shift}L) div {c}L, "
                f"(greatest({x1}, {x2}) + {shift}L) div {c}L)"))
            .alias("cx"),
            F.expr(
                f"sequence((least({y1}, {y2}) + {shift}L) div {c}L, "
                f"(greatest({y1}, {y2}) + {shift}L) div {c}L)")
            .alias("cys"))
            .select(f"{tag}_id", x1, y1, x2, y2, "cx",
                    F.explode("cys").alias("cy")))

    ca = cells(a, "a")
    cb = cells(b, "b")
    cand = ca.join(cb, ["cx", "cy"]).drop("cx", "cy")

    def d(px, py, qx, qy, rx, ry):
        """orientation of r relative to directed segment p->q (cross)."""
        return ((F.col(qx) - F.col(px)) * (F.col(ry) - F.col(py))
                - (F.col(qy) - F.col(py)) * (F.col(rx) - F.col(px)))

    d1 = d("bx1", "by1", "bx2", "by2", "ax1", "ay1")
    d2 = d("bx1", "by1", "bx2", "by2", "ax2", "ay2")
    d3 = d("ax1", "ay1", "ax2", "ay2", "bx1", "by1")
    d4 = d("ax1", "ay1", "ax2", "ay2", "bx2", "by2")

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return (F.col(px).between(F.least(sx1, sx2), F.greatest(sx1, sx2))
                & F.col(py).between(F.least(sy1, sy2),
                                    F.greatest(sy1, sy2)))

    e = cand.withColumn("d1", d1).withColumn("d2", d2) \
            .withColumn("d3", d3).withColumn("d4", d4)
    proper = (((F.col("d1") > 0) & (F.col("d2") < 0))
              | ((F.col("d1") < 0) & (F.col("d2") > 0))) & \
             (((F.col("d3") > 0) & (F.col("d4") < 0))
              | ((F.col("d3") < 0) & (F.col("d4") > 0)))
    touch = (((F.col("d1") == 0) & on_seg("bx1", "by1", "bx2", "by2",
                                          "ax1", "ay1"))
             | ((F.col("d2") == 0) & on_seg("bx1", "by1", "bx2", "by2",
                                            "ax2", "ay2"))
             | ((F.col("d3") == 0) & on_seg("ax1", "ay1", "ax2", "ay2",
                                            "bx1", "by1"))
             | ((F.col("d4") == 0) & on_seg("ax1", "ay1", "ax2", "ay2",
                                            "bx2", "by2")))
    return (e.where(proper | touch)
            .select("a_id", "b_id",
                    F.when(proper, F.lit(1)).otherwise(F.lit(0))
                    .cast("bigint").alias("proper"))
            .distinct())


def snap_points_to_segments(points: DataFrame, segments: DataFrame,
                            radius_udeg: int,
                            cell_udeg: int | None = None) -> DataFrame:
    """Map-matching snap: each point's NEAREST segment within a radius
    (GPS trace -> road network, address point -> street centerline).
    The point-to-line companion of `segment_intersections`, and the
    third member of the covering-cell family (point-in-polygon join,
    line-line join, now point-to-line distance join).

    Inputs: points (pt_id, x, y), segments (seg_id, x1, y1, x2, y2) —
    integer µdeg. Output: (pt_id, seg_id, d2) for each point with >= 1
    segment within ``radius_udeg``: the arg-min segment (ties by
    smallest seg_id) and the squared distance.

    Candidates: points scatter to their ONE covering cell; segments
    scatter to every cell of their bbox EXPANDED by the radius.
    LOSSLESS (the gate proves it vs a brute-force all-pairs oracle):
    euclid(P, seg) <= r implies per-axis chebyshev(P, bbox(seg)) <= r,
    so an in-radius pair always shares the point's cell.

    Exact arithmetic: the three-case squared point-segment distance —
    t = dot(AP,AB)/|AB|^2 clamped — is decided entirely in int64 using
    the single-fraction forms (before-A: |AP|^2; past-B: |BP|^2;
    interior: cross(AB,AP)^2 / |AB|^2), and the radius test cross^2 <=
    r^2*|AB|^2 cross-multiplies the denominator away. Zero-length
    segments degrade to the point distance through the dot<=0 branch
    (dot = den = 0). d2 itself is ONE double division of exact int64s
    (identical bits on any IEEE engine — the computed-double rule), and
    the arg-min is a partial-aggregable min(struct(d2, seg_id)) — no
    window over the candidate relation.

    Overflow discipline: |cross| <= 2 * AP_max * extent_max where
    AP_max <= extent_max + radius + 2*cell (candidates share a cell).
    The plan-time guard raises when cross^2 could exceed int64 — use
    shorter segment pieces (real road networks are piecewise short) or
    a local coordinate frame.
    """
    r = int(radius_udeg)
    if r <= 0:
        raise ValueError(f"radius_udeg must be positive, got {r}")
    c = int(cell_udeg) if cell_udeg is not None else r
    if c <= 0:
        raise ValueError(f"cell_udeg must be positive, got {c}")
    ext_row = segments.agg(F.max(F.greatest(
        F.abs(F.col("x2") - F.col("x1")),
        F.abs(F.col("y2") - F.col("y1")))).alias("ext")).collect()[0]
    ext = int(ext_row["ext"] or 0)
    ap_max = ext + r + 2 * c
    if 2 * ap_max * max(ext, 1) >= (1 << 31):
        raise ValueError(
            f"segment extent {ext} with radius {r} risks int64 overflow "
            f"in the cross product (2*{ap_max}*{ext} >= 2^31); split "
            "segments into shorter pieces or shrink the radius")
    shift = 1 << 31

    seg_cells = (segments.select(
        F.col("seg_id").cast("bigint").alias("seg_id"),
        F.col("x1").cast("bigint").alias("sx1"),
        F.col("y1").cast("bigint").alias("sy1"),
        F.col("x2").cast("bigint").alias("sx2"),
        F.col("y2").cast("bigint").alias("sy2"))
        .select("*",
                F.explode(F.expr(
                    f"sequence((least(sx1, sx2) - {r} + {shift}L) div {c}L,"
                    f" (greatest(sx1, sx2) + {r} + {shift}L) div {c}L)"))
                .alias("cx"),
                F.expr(
                    f"sequence((least(sy1, sy2) - {r} + {shift}L) div {c}L,"
                    f" (greatest(sy1, sy2) + {r} + {shift}L) div {c}L)")
                .alias("cys"))
        .select("seg_id", "sx1", "sy1", "sx2", "sy2", "cx",
                F.explode("cys").alias("cy")))
    pt_cells = points.select(
        F.col("pt_id").cast("bigint").alias("pt_id"),
        F.col("x").cast("bigint").alias("px"),
        F.col("y").cast("bigint").alias("py"),
        F.expr(f"(CAST(x AS BIGINT) + {shift}L) div {c}L").alias("cx"),
        F.expr(f"(CAST(y AS BIGINT) + {shift}L) div {c}L").alias("cy"))

    cand = pt_cells.join(seg_cells, ["cx", "cy"]).drop("cx", "cy")
    apx = F.col("px") - F.col("sx1")
    apy = F.col("py") - F.col("sy1")
    abx = F.col("sx2") - F.col("sx1")
    aby = F.col("sy2") - F.col("sy1")
    dot = apx * abx + apy * aby
    den = abx * abx + aby * aby
    ap2 = apx * apx + apy * apy
    bp2 = ((F.col("px") - F.col("sx2")) * (F.col("px") - F.col("sx2"))
           + (F.col("py") - F.col("sy2")) * (F.col("py") - F.col("sy2")))
    cross = apx * aby - apy * abx
    r2 = F.lit(r * r)
    within = (F.when(dot <= 0, ap2 <= r2)
              .when(dot >= den, bp2 <= r2)
              .otherwise(cross * cross <= r2 * den))
    d2 = (F.when(dot <= 0, ap2.cast("double"))
          .when(dot >= den, bp2.cast("double"))
          .otherwise((cross * cross).cast("double") / den.cast("double")))
    # each (pt, seg) candidate appears exactly once — the point scatters
    # to ONE cell, so no dedup pass is needed before the arg-min
    hits = cand.where(within).select("pt_id", "seg_id", d2.alias("d2"))
    best = (hits.groupBy("pt_id")
            .agg(F.min(F.struct("d2", "seg_id")).alias("m"))
            .select("pt_id", F.col("m.seg_id").alias("seg_id"),
                    F.col("m.d2").alias("d2")))
    return best


# WKT parsing — lookaround-free patterns shared verbatim by Java regex
# (Spark) and RE2 (DuckDB oracle).  Innermost paren groups are exactly
# the coordinate lists for POINT / LINESTRING / POLYGON-with-holes.
WKT_TYPE_RE = r"^\s*([A-Za-z]+)"
WKT_RING_RE = r"\(([^()]+)\)"


def wkt_vertices(df: DataFrame, wkt_col: str = "wkt",
                 id_col: str = "geom_id",
                 scale: int = 1_000_000) -> DataFrame:
    """Parse WKT geometry text (POINT / LINESTRING / POLYGON with
    interior rings) into the integer vertex relation every geometry
    operator here consumes (``ring_area2_centroid``,
    ``points_in_polygon_int``, ``segment_intersections``, ...) — the
    ingestion bridge for the format GIS systems actually exchange
    (PostGIS dumps, GeoPackage exports, OGC services).

    Coordinates quantize to µdeg (``scale`` = 1e6) with the
    engine-shared floor(x * scale + 0.5) — one double parse + one fixed
    op order, so both engines produce the identical integer (the
    sitemap-priority rule). Pure map-side Catalyst: one type extract,
    one innermost-paren ring extract + posexplode, one comma split +
    posexplode, one whitespace split — zero Python, zero shuffle; at
    100 TB the parse is embarrassingly parallel over geometry rows.

    Output: (<id_col>, gtype, ring, idx, x_udeg, y_udeg) — ``ring`` 0
    is the exterior, ``idx`` preserves vertex order within the ring.
    Rows whose coordinate pair fails to parse are dropped (WKT EMPTY
    and malformed vertices); Z/M extra ordinates are ignored.
    """
    gtype = F.upper(F.regexp_extract(F.col(wkt_col), WKT_TYPE_RE, 1))
    rings = F.regexp_extract_all(F.col(wkt_col), F.lit(WKT_RING_RE), 1)
    ringed = (df.select(F.col(id_col), gtype.alias("gtype"),
                        F.posexplode(rings).alias("ring", "_txt")))
    pts = (ringed.select(
        id_col, "gtype", "ring",
        F.posexplode(F.split(F.col("_txt"), ",")).alias("idx", "_pt")))
    toks = F.split(F.trim(F.col("_pt")), r"\s+")

    def udeg(tok):
        # try_cast: malformed ordinates become NULL (then drop) instead
        # of failing the whole scan under ANSI mode
        return (F.floor(tok.try_cast("double") * F.lit(float(scale))
                        + F.lit(0.5)).cast("bigint"))

    return (pts.withColumn("x_udeg", udeg(toks.getItem(0)))
            .withColumn("y_udeg", udeg(toks.getItem(1)))
            .where(F.col("x_udeg").isNotNull()
                   & F.col("y_udeg").isNotNull())
            .select(F.col(id_col), "gtype",
                    F.col("ring").cast("bigint").alias("ring"),
                    F.col("idx").cast("bigint").alias("idx"),
                    "x_udeg", "y_udeg"))


def thin_ring_vertices(vertices: DataFrame, area2_min: int,
                       poly_col: str = "poly_id",
                       ring_col: str = "ring", idx_col: str = "idx",
                       x_col: str = "x_udeg",
                       y_col: str = "y_udeg") -> DataFrame:
    """One-pass Visvalingam-Whyatt vertex thinning over closed rings —
    map generalization for lower-zoom tiles (the MVT sink's
    ring-simplification sibling, but area-driven instead of
    grid-truncation-driven): a vertex whose triangle with its ring
    neighbors spans less than ``area2_min`` (TWICE the area, µdeg²,
    exact |cross| int64) is visual noise at the target zoom and drops.

    This is deliberately the SINGLE-pass variant (areas measured on the
    ORIGINAL ring, all drops simultaneous) — deterministic, relational,
    and order-free, where true iterative VW re-measures after every
    removal (a sequential per-ring loop; run the pass k times for a
    k-step approximation). Degeneracy guard: a ring whose kept count
    would fall below 3 keeps ALL its vertices (a window count over the
    ring key — same discipline as the MVT tiny-polygon skip, which
    drops instead because a sub-pixel ring has no lower zoom to serve).

    Shape: neighbors via two (i±1 mod n) equi-joins on the ring key
    (one Exchange), cross product in int64 after the
    ``ring_area2_centroid`` local-origin shift (same overflow
    discipline), one window count for the guard. Exact for ring
    extents under ~2^21 µdeg.

    Output: the kept vertex rows (same columns), plus ``area2_tri``.
    """
    if area2_min < 0:
        raise ValueError(f"area2_min must be >= 0, got {area2_min}")
    wr = Window.partitionBy("p", "g")
    v = (vertices.select(
        F.col(poly_col).alias("p"), F.col(ring_col).alias("g"),
        F.col(idx_col).cast("bigint").alias("i"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"))
        .withColumn("n", F.count(F.lit(1)).over(wr))
        .withColumn("x0", F.min("x").over(wr))
        .withColumn("y0", F.min("y").over(wr))
        .withColumn("xl", F.col("x") - F.col("x0"))
        .withColumn("yl", F.col("y") - F.col("y0")))
    prv = v.select(F.col("p").alias("p1"), F.col("g").alias("g1"),
                   F.col("i").alias("ip"), F.col("xl").alias("xp"),
                   F.col("yl").alias("yp"))
    nxt = v.select(F.col("p").alias("p2"), F.col("g").alias("g2"),
                   F.col("i").alias("inx"), F.col("xl").alias("xn"),
                   F.col("yl").alias("yn"))
    j = (v.join(prv, (F.col("p") == F.col("p1"))
                & (F.col("g") == F.col("g1"))
                & (F.col("ip") == (F.col("i") - 1 + F.col("n"))
                   % F.col("n")))
         .join(nxt, (F.col("p") == F.col("p2"))
               & (F.col("g") == F.col("g2"))
               & (F.col("inx") == (F.col("i") + 1) % F.col("n"))))
    cross = ((F.col("xl") - F.col("xp")) * (F.col("yn") - F.col("yp"))
             - (F.col("xn") - F.col("xp")) * (F.col("yl") - F.col("yp")))
    flagged = (j.select("p", "g", "i", "x", "y", "n",
                        F.abs(cross).alias("area2_tri"))
               .withColumn("keep",
                           (F.col("area2_tri") >= int(area2_min))
                           .cast("int")))
    guard = (flagged
             .withColumn("n_keep", F.sum("keep").over(
                 Window.partitionBy("p", "g")))
             .where((F.col("keep") == 1) | (F.col("n_keep") < 3)))
    return guard.select(F.col("p").alias(poly_col),
                        F.col("g").alias(ring_col),
                        F.col("i").alias(idx_col),
                        F.col("x").alias(x_col), F.col("y").alias(y_col),
                        F.col("area2_tri").cast("bigint")
                        .alias("area2_tri"))


def orient_rings(vertices: DataFrame, poly_col: str = "poly_id",
                 ring_col: str = "ring", idx_col: str = "idx",
                 x_col: str = "x_udeg",
                 y_col: str = "y_udeg") -> DataFrame:
    """Normalize ring winding to the OGC/GeoJSON convention — exterior
    rings (ring 0) counter-clockwise, interior rings clockwise — by
    computing each ring's signed shoelace area and re-indexing the
    rings that wind the wrong way (idx' = (n - idx) mod n reverses the
    cycle keeping vertex 0 first). The normalization pass between
    ``wkt_vertices`` (WKT carries NO orientation guarantee) and every
    consumer that assumes a winding: ``ring_area2_centroid`` (requires
    CCW for positive area), the MVT slicer's front-face cull, earcut.

    Same relational shape and local-origin overflow discipline as
    ``ring_area2_centroid``: one (i+1 mod n) equi-join for the cross
    sum, one partial agg per ring, one join back — degenerate rings
    (area exactly 0) pass through unflipped.

    Output: (poly, ring, idx, x, y, flipped).
    """
    wr = Window.partitionBy("p", "g")
    v = (vertices.select(
        F.col(poly_col).alias("p"), F.col(ring_col).alias("g"),
        F.col(idx_col).cast("bigint").alias("i"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"))
        .withColumn("n", F.count(F.lit(1)).over(wr))
        .withColumn("xl", F.col("x") - F.min("x").over(wr))
        .withColumn("yl", F.col("y") - F.min("y").over(wr)))
    nxt = v.select(F.col("p").alias("p2"), F.col("g").alias("g2"),
                   F.col("i").alias("i2"),
                   F.col("xl").alias("x2"), F.col("yl").alias("y2"))
    cross = F.col("xl") * F.col("y2") - F.col("x2") * F.col("yl")
    area = (v.join(nxt, (F.col("p") == F.col("p2"))
                   & (F.col("g") == F.col("g2"))
                   & (F.col("i2") == (F.col("i") + 1) % F.col("n")))
            .groupBy("p", "g")
            .agg(F.sum(cross).alias("area2")))
    flip = (F.when(F.col("g") == 0, F.col("area2") < 0)
            .otherwise(F.col("area2") > 0))
    out = (v.join(area, ["p", "g"])
           .withColumn("flipped", flip)
           .withColumn("i_new",
                       F.when(F.col("flipped"),
                              (F.col("n") - F.col("i")) % F.col("n"))
                       .otherwise(F.col("i"))))
    return out.select(F.col("p").alias(poly_col),
                      F.col("g").alias(ring_col),
                      F.col("i_new").cast("bigint").alias(idx_col),
                      F.col("x").alias(x_col), F.col("y").alias(y_col),
                      F.col("flipped").cast("int").alias("flipped"))
