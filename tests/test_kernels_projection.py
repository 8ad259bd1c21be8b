"""Projection kernel goldens from the reference tests:
ECEF (cartesian.rs:164-243), etmerc round-trip (etmerc.rs:373-402)."""
import numpy as np

from plateau_gis_converter_spark.kernels import projection as pj


def test_geodetic_to_geocentric_golden():
    wgs = pj.wgs84()
    x, y, z = pj.geodetic_to_geocentric(wgs, 140.0, 37.0, 50.0)
    assert abs(float(x) - -3906851.9770472576) < 1e-10
    assert abs(float(y) - 3278238.0530045824) < 1e-10
    assert abs(float(z) - 3817423.251099322) < 1e-10
    # north pole
    x, y, z = pj.geodetic_to_geocentric(wgs, 123.0, 90.0, 150.0)
    assert abs(float(x)) < 1e-9 and abs(float(y)) < 1e-9
    assert abs(float(z) - (wgs.b + 150.0)) < 1e-9
    # null island
    x, y, z = pj.geodetic_to_geocentric(wgs, 0.0, 0.0, 100.0)
    assert abs(float(x) - (wgs.a + 100.0)) < 1e-9


def test_ecef_roundtrip():
    wgs = pj.wgs84()
    # outside the evolute
    lng, lat, h = 140.0, 37.0, 50.0
    x, y, z = pj.geodetic_to_geocentric(wgs, lng, lat, h)
    lng2, lat2, h2 = pj.geocentric_to_geodetic(wgs, x, y, z)
    assert abs(float(lng2) - lng) < 1e-10
    assert abs(float(lat2) - lat) < 1e-10
    assert abs(float(h2) - h) < 1e-7
    # inside the evolute
    lng, lat, h = 45.0, 74.58501644931525, -6344866.234164982
    x, y, z = pj.geodetic_to_geocentric(wgs, lng, lat, h)
    lng2, lat2, h2 = pj.geocentric_to_geodetic(wgs, x, y, z)
    assert abs(float(lng2) - lng) < 1e-10
    assert abs(float(lat2) - lat) < 1e-10
    assert abs(float(h2) - h) < 1e-7


def test_ecef_vectorized():
    wgs = pj.wgs84()
    rng = np.random.default_rng(42)
    lng = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)
    h = rng.uniform(-100, 5000, 200)
    x, y, z = pj.geodetic_to_geocentric(wgs, lng, lat, h)
    l2, t2, h2 = pj.geocentric_to_geodetic(wgs, x, y, z)
    np.testing.assert_allclose(l2, lng, atol=1e-10)
    np.testing.assert_allclose(t2, lat, atol=1e-10)
    np.testing.assert_allclose(h2, h, atol=1e-6)


def test_etmerc_jprect_viii_golden():
    """Japan Plane Rectangular CS VIII golden (etmerc.rs:379-401):
    cs2cs epsg:6668 -> epsg:6676."""
    tm = pj.ExtendedTransverseMercator(138.5, 36.0, 0.9999, pj.grs80())
    x, y, _ = tm.forward(138.19318970050347, 36.65209371778363, 0.0)
    assert abs(float(x) - -27430.911753676937) < 1e-9
    assert abs(float(y) - 72396.2255270589) < 1e-9
    lng2, lat2, _ = tm.inverse(x, y, 0.0)
    assert abs(float(lng2) - 138.19318970050347) < 1e-10
    assert abs(float(lat2) - 36.65209371778363) < 1e-10


def test_jpr_zone_roundtrip_vectorized():
    tm = pj.jpr_zone_projection(9)  # Tokyo zone
    rng = np.random.default_rng(0)
    lng = rng.uniform(139.0, 140.5, 100)
    lat = rng.uniform(35.0, 36.5, 100)
    x, y, _ = tm.forward(lng, lat, np.zeros(100))
    l2, t2, _ = tm.inverse(x, y, np.zeros(100))
    np.testing.assert_allclose(l2, lng, atol=1e-10)
    np.testing.assert_allclose(t2, lat, atol=1e-10)
