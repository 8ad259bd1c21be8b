"""Clipping (geojson-vt two-pass, slice.rs semantics) + PIP kernels."""
import math

import numpy as np

from plateau_gis_converter_spark.kernels import clip, pip
from plateau_gis_converter_spark.kernels.mercator import lnglat_to_web_mercator


def _square(cx, cy, half, cw=True):
    """Axis-aligned square ring around (cx, cy). cw=True gives NEGATIVE
    signed shoelace area — the reference's front-facing orientation
    (is_cw() == signed_ring_area() < 0, linestring.rs:116-118)."""
    pts = [[cx - half, cy - half], [cx + half, cy - half],
           [cx + half, cy + half], [cx - half, cy + half]]
    ring = pts if clip.signed_ring_area(pts) < 0 else pts[::-1]
    return ring if cw else ring[::-1]


def test_signed_area_square():
    ring = [[0, 0], [1, 0], [1, 1], [0, 1]]
    a = clip.signed_ring_area(ring)
    assert abs(abs(a) - 1.0) < 1e-12


def test_slice_single_tile():
    # Small CW square inside one z2 tile (tile x=1, y=1 spans [0.25,0.5)^2)
    ring = _square(0.3, 0.3, 0.01)
    out = clip.slice_multipolygon([[ring]], 2, 2)
    assert set(out.keys()) == {(2, 1, 1)}
    mpoly = out[(2, 1, 1)]
    assert len(mpoly) == 1
    # tile-local coords should be around (0.3-0.25)*4 = 0.2 ± 0.04
    pts = np.array(mpoly[0][0])
    assert pts.min() > 0.1 and pts.max() < 0.3


def test_slice_crossing_boundary():
    # Square straddling the x boundary at mx=0.5 at z=1 → two tiles
    ring = _square(0.5, 0.3, 0.02)
    out = clip.slice_multipolygon([[ring]], 1, 1)
    assert set(out.keys()) == {(1, 0, 0), (1, 1, 0)}


def test_ccw_exterior_culled():
    ring = _square(0.3, 0.3, 0.01, cw=False)
    out = clip.slice_multipolygon([[ring]], 2, 2)
    assert out == {}


def test_tiny_polygon_skipped():
    # area * 4^(z+12) < 4 → skip; at z=2, threshold area = 4 / 4^14
    tiny_half = math.sqrt(4.0 / (4 ** 14)) / 2 * 0.9
    ring = _square(0.3, 0.3, tiny_half)
    out = clip.slice_multipolygon([[ring]], 2, 2)
    assert out == {}


def test_hole_preserved():
    outer = _square(0.3, 0.3, 0.02)
    hole = _square(0.3, 0.3, 0.005)  # same winding; slicing keeps ring index
    out = clip.slice_multipolygon([[outer, hole]], 2, 2)
    mpoly = out[(2, 1, 1)]
    assert len(mpoly[0]) == 2  # exterior + interior


def test_buffer_produces_overlap():
    """Clip buffer (5px of 256) means geometry near the edge appears in both
    adjacent tiles with coords slightly outside [0,1]."""
    ring = _square(0.5, 0.3, 0.04)
    out = clip.slice_multipolygon([[ring]], 1, 1)
    left = np.array(out[(1, 0, 0)][0][0])
    assert left[:, 0].max() > 1.0  # extends into buffer beyond tile edge


def test_pip_ray_casting():
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    px = np.array([5.0, 15.0, -1.0, 9.999])
    py = np.array([5.0, 5.0, 5.0, 9.999])
    got = pip.points_in_ring(px, py, ring)
    assert got.tolist() == [True, False, False, True]


def test_pip_with_hole():
    rings = [np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]]),
             np.array([[4., 4.], [6., 4.], [6., 6.], [4., 6.]])]
    px = np.array([5.0, 2.0])
    py = np.array([5.0, 2.0])
    got = pip.points_in_polygon(px, py, rings)
    assert got.tolist() == [False, True]  # 5,5 is inside the hole


def test_pip_convex_int_inclusive_boundary():
    ring = np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]], dtype=np.int64)
    px = np.array([500, 0, 1000, 1001], dtype=np.int64)
    py = np.array([500, 500, 1000, 500], dtype=np.int64)
    got = pip.points_in_convex_polygon_int(px, py, ring)
    assert got.tolist() == [True, True, True, False]


def test_pip_matches_tile_assignment():
    """A point inside a polygon must land in a tile that the sliced polygon
    covers — consistency between the point path (mvt_tile_at) and the polygon
    path (slice_multipolygon)."""
    from plateau_gis_converter_spark.kernels.tiling import mvt_tile_at
    rng = np.random.default_rng(42)
    lng = rng.uniform(139.6, 139.9, 50)
    lat = rng.uniform(35.55, 35.8, 50)
    mx, my = lnglat_to_web_mercator(lng, lat)
    # polygon covering the whole bbox, CW in mercator
    blng = [139.5, 139.95, 139.95, 139.5]
    blat = [35.5, 35.5, 35.85, 35.85]
    bx, by = lnglat_to_web_mercator(np.array(blng), np.array(blat))
    ring = [[x, y] for x, y in zip(bx, by)]
    if clip.signed_ring_area(ring) > 0:
        ring = ring[::-1]  # front-facing = negative signed area
    z = 12
    out = clip.slice_multipolygon([[ring]], z, z)
    tiles = set((x, y) for (_, x, y) in out.keys())
    tx, ty = mvt_tile_at(np.array([z]), lng, lat)
    for xi, yi in zip(tx, ty):
        assert (int(xi), int(yi)) in tiles
