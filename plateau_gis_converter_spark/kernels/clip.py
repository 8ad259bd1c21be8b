"""geojson-vt-style polygon -> tile slicing.

Semantics-parity reimplementation of ``nusamai/src/sink/mvt/slice.rs`` :

* ``slice_polygon_to_tiles`` == ``slice_polygon`` (slice.rs:95-270): two-pass
  clip (Y rows then X columns) with a buffer of ``buffer/extent`` around each
  tile, interpolation ``x = (b0-a0)*(k1-a1)/(b1-a1) + a0`` kept op-for-op in
  f64 so results are bit-identical (SURVEY §7.4.1), tile-local normalization
  ``tx = x*z_scale - xi`` (slice.rs:242-246), closing-point removal and <3
  vertex rejection (slice.rs:249-257), ring reversal (slice.rs:260-261), and
  antimeridian wrap ``xi.rem_euclid(1 << z)`` (slice.rs:192-195).
* ``slice_multipolygon`` == the per-entity driver ``slice_cityobj_geoms``
  (slice.rs:12-93): front-face cull of non-CW exteriors (slice.rs:54-57),
  tiny-polygon skip ``area * 4^(z+max_detail) < 4`` (slice.rs:63-69), zoom
  loop min_z..=max_z.

Rings are plain ``list[list[[x, y]]]`` in *normalized web-mercator* [0,1]^2
coordinates. Geometry here is the small side (boundary polygons, e.g. 23 ward
polygons), so a scalar-Python inner loop inside the ``mapInPandas`` flatMap is
not the bottleneck; the 10^12-row point side never enters this code path.
"""

from __future__ import annotations

from collections import defaultdict

__all__ = [
    "signed_ring_area",
    "ring_is_cw",
    "polygon_area",
    "slice_polygon_to_tiles",
    "slice_multipolygon",
]


def signed_ring_area(ring) -> float:
    """Shoelace area over the closed ring
    (nusamai-geometry/src/compact/linestring.rs:116-140: sum of cross products
    around the first vertex; positive = clockwise in screen coords)."""
    n = len(ring)
    if n < 3:
        return 0.0
    x0, y0 = ring[0][0], ring[0][1]
    area = 0.0
    for i in range(1, n - 1):
        ax = ring[i][0] - x0
        ay = ring[i][1] - y0
        bx = ring[i + 1][0] - x0
        by = ring[i + 1][1] - y0
        area += ax * by - bx * ay
    return area / 2.0


def ring_is_cw(ring) -> bool:
    """Reference `is_cw()` == signed_ring_area() < 0 (standard shoelace,
    nusamai-geometry/src/compact/linestring.rs:116-118). The front-face cull
    (slice.rs:54-57) KEEPS exteriors with negative signed area; the
    debug_assert uses ring_area() which is the absolute value."""
    return signed_ring_area(ring) < 0.0


def polygon_area(rings) -> float:
    """Exterior area minus hole areas
    (nusamai-geometry/src/compact/polygon.rs:118-126)."""
    if not rings:
        return 0.0
    area = abs(signed_ring_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(signed_ring_area(hole))
    return area


def _iter_closed(ring):
    """Iterate ring vertices with the first vertex repeated at the end
    (LineString::iter_closed)."""
    for c in ring:
        yield c
    if ring:
        yield ring[0]


def _clip_ring_axis(ring_closed_iter, axis: int, k1: float, k2: float):
    """One fold pass of the reference's axis clip (slice.rs:132-164 for Y,
    :205-237 for X). `axis` is the clipped coordinate index; the other
    coordinate is interpolated. Returns an open ring (list of [x, y])."""
    out = []
    o = 1 - axis
    a = None
    for b in ring_closed_iter:
        if a is None:
            a = b
            continue
        aa, ao = a[axis], a[o]
        ba, bo = b[axis], b[o]
        if aa < k1:
            if ba > k1:
                v = (bo - ao) * (k1 - aa) / (ba - aa) + ao
                out.append([v, k1] if o == 0 else [k1, v])
        elif aa > k2:
            if ba < k2:
                v = (bo - ao) * (k2 - aa) / (ba - aa) + ao
                out.append([v, k2] if o == 0 else [k2, v])
        else:
            out.append(a)
        if ba < k1 and aa > k1:
            v = (bo - ao) * (k1 - aa) / (ba - aa) + ao
            out.append([v, k1] if o == 0 else [k1, v])
        elif ba > k2 and aa < k2:
            v = (bo - ao) * (k2 - aa) / (ba - aa) + ao
            out.append([v, k2] if o == 0 else [k2, v])
        a = b
    return out


def slice_polygon_to_tiles(zoom: int, extent: int, buffer: int, rings, out=None):
    """Slice one polygon (list of rings, exterior first) into tiles at `zoom`.

    Appends tile-local rings into ``out[(zoom, x, y)]`` which maps to a
    multipolygon structured as list-of-polygons, each polygon a list of rings
    (exterior first) — mirroring MultiPolygon2::add_exterior/add_interior.
    """
    if out is None:
        out = defaultdict(list)
    z_scale = float(1 << zoom)
    buf_width = float(buffer) / float(extent)

    ext = rings[0]
    if not ext:
        return out

    # --- Y-axis pass (slice.rs:107-170)
    min_y = min(c[1] for c in ext)
    max_y = max(c[1] for c in ext)
    import math
    y_lo = int(math.floor(min_y * z_scale))
    y_hi = int(math.ceil(max_y * z_scale))
    y_range = range(max(y_lo, 0), max(y_hi, 0))  # u32 cast clamps negatives to 0 only
    # Rust `as u32` saturates negatives to 0 in release? No — `as` truncates
    # toward zero then wraps; for f64->u32 Rust saturates (min 0). Replicate:
    y_lo = max(y_lo, 0)
    y_hi = max(y_hi, 0)
    y_range = range(y_lo, y_hi)

    y_sliced_polys = []
    for yi in y_range:
        k1 = (float(yi) - buf_width) / z_scale
        k2 = (float(yi + 1) + buf_width) / z_scale
        y_sliced = []
        for ring in rings:
            if not ring:
                continue
            y_sliced.append(_clip_ring_axis(_iter_closed(ring), axis=1, k1=k1, k2=k2))
        y_sliced_polys.append(y_sliced)

    # --- X-axis pass (slice.rs:174-269)
    for yi, y_poly in zip(y_range, y_sliced_polys):
        ext_r = y_poly[0] if y_poly else []
        if ext_r:
            min_x = min(c[0] for c in ext_r)
            max_x = max(c[0] for c in ext_r)
        else:
            min_x, max_x = float("inf"), float("-inf")
        if not ext_r:
            continue
        x_lo = int(math.floor(min_x * z_scale))
        x_hi = int(math.ceil(max_x * z_scale))
        for xi in range(x_lo, x_hi):
            k1 = (float(xi) - buf_width) / z_scale
            k2 = (float(xi + 1) + buf_width) / z_scale
            key = (zoom, xi % (1 << zoom), yi)  # rem_euclid antimeridian wrap
            tile_mpoly = out[key]
            for ri, ring in enumerate(y_poly):
                if not ring:
                    continue
                clipped = _clip_ring_axis(_iter_closed(ring), axis=0, k1=k1, k2=k2)
                # tile-local normalization + closing-point removal (slice.rs:240-258)
                norm = [[x * z_scale - float(xi), y * z_scale - float(yi)] for x, y in clipped]
                if len(norm) >= 2 and norm[0] == norm[-1]:
                    norm.pop()
                if len(norm) < 3:
                    continue
                norm.reverse()  # LineString2::reverse_inplace (slice.rs:260-261)
                if ri == 0:
                    tile_mpoly.append([norm])  # add_exterior: new polygon
                else:
                    if tile_mpoly:
                        tile_mpoly[-1].append(norm)  # add_interior
                    else:
                        tile_mpoly.append([norm])
    return out


def slice_multipolygon(multipolygon, min_z: int, max_z: int,
                       max_detail: int = 12, buffer_pixels: int = 5):
    """Slice a multipolygon (list of polygons, each list-of-rings, normalized
    mercator coords) across zooms; returns {(z,x,y): multipolygon}.

    Mirrors slice_cityobj_geoms (slice.rs:12-93): extent = 1<<max_detail,
    buffer = extent*buffer_pixels/256, CW-exterior cull, tiny-polygon skip.
    """
    assert max_z >= min_z
    extent = 1 << max_detail
    buffer = extent * buffer_pixels // 256
    out = defaultdict(list)
    for rings in multipolygon:
        if not rings or not rings[0]:
            continue
        if not ring_is_cw(rings[0]):
            continue  # front-face cull (slice.rs:54-57)
        area = polygon_area(rings)
        for zoom in range(min_z, max_z + 1):
            if area * float(4 ** (zoom + max_detail)) < 4.0:
                continue  # tiny-polygon skip (slice.rs:63-69)
            slice_polygon_to_tiles(zoom, extent, buffer, rings, out)
    return {k: v for k, v in out.items() if v}
