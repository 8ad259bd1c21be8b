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
