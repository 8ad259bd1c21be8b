"""Property-based kernel tests (hypothesis) — beyond the reference's own
golden fixtures (the reference has no property tests, SURVEY §5)."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from plateau_gis_converter_spark.kernels import clip, hilbert, mercator, mvt


@given(st.integers(0, 24),
       st.integers(0, 2**24 - 1), st.integers(0, 2**24 - 1))
@settings(max_examples=200, deadline=None)
def test_hilbert_roundtrip_property(z, x, y):
    n = 1 << z
    x, y = x % n, y % n
    tid = hilbert.zxy_to_id_scalar(z, x, y)
    assert hilbert.id_to_zxy_scalar(tid) == (z, x, y)
    # ids of a zoom form the contiguous block starting at (4^z - 1)/3
    lo = ((1 << (2 * z)) - 1) // 3
    assert lo <= tid < lo + n * n


@given(st.floats(-180, 180), st.floats(-85, 85))
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip_property(lng, lat):
    mx, my = mercator.lnglat_to_web_mercator(lng, lat)
    assert 0.0 <= float(mx) <= 1.0
    lng2, lat2 = mercator.web_mercator_to_lnglat(mx, my)
    assert abs(float(lng2) - lng) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(st.integers(-(2**30), 2**30))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip_property(v):
    assert mvt.unzigzag(mvt.zigzag(v)) == v


@given(st.lists(st.tuples(st.floats(0.01, 0.99), st.floats(0.01, 0.99)),
                min_size=3, max_size=12, unique=True),
       st.integers(1, 6))
@settings(max_examples=60, deadline=None)
def test_clip_preserves_containment(points, zoom):
    """Every sliced tile key must intersect the polygon bbox; all clipped
    coords stay within the buffered tile bounds."""
    ring = points + []
    if clip.signed_ring_area(ring) > 0:
        ring = ring[::-1]  # front-facing
    if abs(clip.signed_ring_area(ring)) < 1e-9:
        return
    out = clip.slice_multipolygon([[list(map(list, ring))]], zoom, zoom)
    scale = 1 << zoom
    buf = (1 << 12) * 5 / 256 / (1 << 12)  # buffer fraction of a tile
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    for (z, x, y), mpoly in out.items():
        assert z == zoom
        # tile must overlap the (buffered) bbox of the source polygon
        assert (x + 1) / scale >= min(xs) - buf / scale - 1e-12
        assert x / scale <= max(xs) + buf / scale + 1e-12
        for poly in mpoly:
            for r in poly:
                arr = np.asarray(r)
                assert arr[:, 0].min() >= -buf - 1e-9
                assert arr[:, 0].max() <= 1 + buf + 1e-9


@given(st.lists(st.tuples(st.integers(0, 4096), st.integers(0, 4096)),
                min_size=4, max_size=40))
@settings(max_examples=100, deadline=None)
def test_simplify_keeps_endpoints(pts):
    ring = np.array(pts, dtype=np.int16)
    s = mvt.simplify_ring(ring)
    assert (s[0] == ring[0]).all()
    assert (s[-1] == ring[-1]).all()
    assert len(s) <= len(ring)


# --- earcut + geoid (round 2 kernels) ----------------------------------------

def _tri_area(pts, tris):
    area = 0.0
    for k in range(0, len(tris), 3):
        a, b, c = pts[tris[k]], pts[tris[k + 1]], pts[tris[k + 2]]
        area += abs((b[0] - a[0]) * (c[1] - a[1])
                    - (b[1] - a[1]) * (c[0] - a[0])) / 2
    return area


def _poly_area(pts):
    s = 0.0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2


@given(st.lists(st.tuples(st.floats(0.01, 0.99), st.floats(0.01, 0.99)),
                min_size=5, max_size=24))
@settings(max_examples=80, deadline=None)
def test_earcut_convex_polygon_area_property(raw):
    """Convex hull of random points: earcut must produce exactly n-2
    triangles whose areas sum to the polygon area, with valid indices."""
    from plateau_gis_converter_spark.kernels import gltf as g

    pts = sorted(set(raw))
    if len(pts) < 4:
        return
    # convex hull (monotone chain)
    def cross(o, a, b):
        return (a[0]-o[0])*(b[1]-o[1]) - (a[1]-o[1])*(b[0]-o[0])
    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 4:
        return
    tris = g.earcut(hull, [])
    assert len(tris) == 3 * (len(hull) - 2)
    assert all(0 <= i < len(hull) for i in tris)
    assert abs(_tri_area(hull, tris) - _poly_area(hull)) < 1e-9


@given(st.floats(0.15, 0.45), st.floats(0.15, 0.45),
       st.floats(0.02, 0.12), st.floats(0.02, 0.12))
@settings(max_examples=60, deadline=None)
def test_earcut_hole_area_property(cx, cy, hw, hh):
    """Unit square with a random rectangular hole: triangulated area equals
    square minus hole."""
    from plateau_gis_converter_spark.kernels import gltf as g

    outer = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    hole = [(cx - hw, cy - hh), (cx + hw, cy - hh),
            (cx + hw, cy + hh), (cx - hw, cy + hh)]
    pts = outer + hole
    tris = g.earcut(pts, [4])
    assert abs(_tri_area(pts, tris) - (1.0 - 4 * hw * hh)) < 1e-9


@given(st.floats(30.0, 45.0), st.floats(-2.0, 2.0), st.floats(-2.0, 2.0),
       st.floats(-1.0, 1.0),
       st.lists(st.tuples(st.floats(0.001, 0.999), st.floats(0.001, 0.999)),
                min_size=1, max_size=8))
@settings(max_examples=80, deadline=None)
def test_geoid_bilinear_exactness_property(a, b, c, d, queries):
    """Bilinear interpolation reproduces any bilinear function exactly at
    arbitrary in-grid query points."""
    from plateau_gis_converter_spark.kernels.geoid import GeoidGrid

    lng0, lat0, dlng, dlat, nx, ny = 139.0, 35.0, 0.05, 0.04, 13, 11
    jj, ii = np.meshgrid(np.arange(nx), np.arange(ny))
    lngs = lng0 + jj * dlng
    lats = lat0 + ii * dlat
    f = lambda lng, lat: a + b * (lng - lng0) + c * (lat - lat0) \
        + d * (lng - lng0) * (lat - lat0)
    g = GeoidGrid(lng0, lat0, dlng, dlat, f(lngs, lats))
    for fx, fy in queries:
        qlng = lng0 + fx * (nx - 1) * dlng
        qlat = lat0 + fy * (ny - 1) * dlat
        assert abs(float(g.height(qlng, qlat)) - f(qlng, qlat)) < 1e-9
