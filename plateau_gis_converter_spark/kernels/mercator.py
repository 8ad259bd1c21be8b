"""Web Mercator projection kernels (vectorized).

Same formulas as the reference's ``nusamai-mvt/src/webmercator.rs:11-44``
(normalized [0,1]^2 form used by tile slicing, and the meters form).
Roundtrip/null-island/bounds goldens from ``webmercator.rs:46-115`` are in
``tests/test_kernels_mercator.py``.

These are also exposed as Catalyst column expressions in
``plateau_gis_converter_spark.functions.geo`` so the hot path (point tile
assignment over 10^12 pages) stays JVM-side; the NumPy versions serve the
polygon-slicing pandas UDF and the unit tests.
"""

from __future__ import annotations

import numpy as np

A = 6378137.0
CIRCUMFERENCE = A * 2.0 * np.pi


def lnglat_to_web_mercator(lng, lat):
    """(lng, lat) degrees -> normalized (mx, my) in [0,1]^2."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = (lng + 180.0) / 360.0
    my = np.degrees(np.log(np.tan(np.radians(90.0 + lat) / 2.0)))
    my = (-my + 180.0) / 360.0
    return mx, my


def web_mercator_to_lnglat(mx, my):
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lng = mx * 360.0 - 180.0
    lat = my * 360.0 - 180.0
    lat = -np.degrees(2.0 * np.arctan(np.exp(np.radians(lat))) - np.pi / 2.0)
    return lng, lat


def lnglat_to_web_mercator_meters(lng, lat):
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lng / 360.0 * CIRCUMFERENCE
    my = np.log(np.tan(np.radians(90.0 + lat) / 2.0)) * A
    return mx, my


def web_mercator_meters_to_lnglat(mx, my):
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lng = mx / CIRCUMFERENCE * 360.0
    lat = np.degrees(2.0 * np.arctan(np.exp(my / A))) - 90.0
    return lng, lat
