"""Golden fixtures from nusamai-mvt/src/webmercator.rs:46-115."""
import numpy as np

from plateau_gis_converter_spark.kernels import mercator


def test_roundtrip_normalized():
    for lng, lat in [(136.08, 37.39), (0.3, 0.2)]:
        mx, my = mercator.lnglat_to_web_mercator(lng, lat)
        lng2, lat2 = mercator.web_mercator_to_lnglat(mx, my)
        assert abs(lng - lng2) < 1e-13
        assert abs(lat - lat2) < 1e-13


def test_roundtrip_in_meters():
    for lng, lat in [(136.08, 37.39), (0.3, 0.2)]:
        mx, my = mercator.lnglat_to_web_mercator_meters(lng, lat)
        lng2, lat2 = mercator.web_mercator_meters_to_lnglat(mx, my)
        assert abs(lng - lng2) < 1e-9
        assert abs(lat - lat2) < 1e-9


def test_null_island():
    mx, my = mercator.lnglat_to_web_mercator(0.0, 0.0)
    assert abs(mx - 0.5) < 1e-10
    assert abs(my - 0.5) < 1e-10


def test_null_island_in_meters():
    mx, my = mercator.lnglat_to_web_mercator_meters(0.0, 0.0)
    assert abs(mx) < 1e-9
    assert abs(my) < 1e-9


def test_bound_in_meters():
    mx, my = mercator.lnglat_to_web_mercator_meters(180.0, 85.0511287798066)
    assert abs(mx - mercator.CIRCUMFERENCE / 2) < 1e-7
    assert abs(my - mercator.CIRCUMFERENCE / 2) < 1e-7


def test_vectorized_shape():
    lng = np.linspace(-179, 179, 1000)
    lat = np.linspace(-84, 84, 1000)
    mx, my = mercator.lnglat_to_web_mercator(lng, lat)
    l2, t2 = mercator.web_mercator_to_lnglat(mx, my)
    np.testing.assert_allclose(l2, lng, atol=1e-12)
    np.testing.assert_allclose(t2, lat, atol=1e-12)
