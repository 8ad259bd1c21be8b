"""Golden fixtures from nusamai/src/sink/cesiumtiles/tiling/scheme.rs:100-261."""
import numpy as np
import pytest

from plateau_gis_converter_spark.kernels import tiling

X_STEP_GOLDEN = [
    ((0, 0), 1), ((1, 0), 1), ((1, 1), 1),
    ((2, 0), 1), ((2, 1), 1),
    ((3, 0), 2), ((3, 1), 1), ((3, 2), 1), ((3, 3), 2),
    ((4, 0), 4), ((4, 1), 2), ((4, 2), 1), ((4, 3), 1),
    ((4, 4), 1), ((4, 5), 1), ((4, 6), 2), ((4, 7), 4),
    ((5, 0), 8), ((5, 1), 4),
]


@pytest.mark.parametrize("zy,expected", X_STEP_GOLDEN)
def test_x_step(zy, expected):
    z, y = zy
    assert int(tiling.x_step(z, y)[0]) == expected


def test_size_for_z():
    for z, exp in [(0, (1, 1)), (1, (2, 2)), (2, (4, 2)), (3, (8, 4))]:
        xs, ys = tiling.size_for_z(z)
        assert (int(xs[0]), int(ys[0])) == exp


def _is_valid_zxy(z, x, y):
    if z == 0:
        return x == 0 and y == 0
    if z == 1:
        return 0 <= x < 2 and 0 <= y < 2
    return x < (1 << z) and y < (1 << (z - 1)) and x % int(tiling.x_step(z, y)[0]) == 0


def test_is_valid_zxy():
    assert _is_valid_zxy(0, 0, 0)
    assert _is_valid_zxy(1, 0, 0)
    assert _is_valid_zxy(1, 1, 1)
    assert _is_valid_zxy(3, 0, 0)
    assert not _is_valid_zxy(3, 1, 0)
    assert _is_valid_zxy(3, 2, 0)
    assert not _is_valid_zxy(3, 3, 0)
    assert not _is_valid_zxy(4, 1, 1)
    assert not _is_valid_zxy(4, 3, 0)
    assert not _is_valid_zxy(4, 3, 1)
    assert _is_valid_zxy(4, 4, 1)
    assert _is_valid_zxy(4, 0, 6)
    assert not _is_valid_zxy(4, 1, 6)
    assert _is_valid_zxy(4, 2, 6)
    assert _is_valid_zxy(4, 0, 7)
    assert not _is_valid_zxy(4, 7, 7)
    assert _is_valid_zxy(4, 8, 7)


def test_iter_y_slice():
    assert list(tiling.iter_y_slice(1, -25.0, 60.0)) == [0, 1]
    assert list(tiling.iter_y_slice(3, -25.0, 60.0)) == [0, 1, 2]
    assert list(tiling.iter_y_slice(4, -25.0, 60.0)) == [1, 2, 3, 4, 5]


def test_iter_x_slice():
    assert list(tiling.iter_x_slice(4, 0, -24.0, 46.0)) == [(4, 4)]
    assert list(tiling.iter_x_slice(4, 1, -24.0, 46.0)) == [(6, 2), (8, 2)]
    assert list(tiling.iter_x_slice(4, 2, -24.0, 46.0)) == [
        (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)]
    assert list(tiling.iter_x_slice(4, 3, -24.0, 46.0)) == [
        (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)]
    assert list(tiling.iter_x_slice(4, 7, -24.0, 46.0)) == [(4, 4)]


def test_geometric_error():
    assert abs(float(tiling.geometric_error(1, 1)[0]) - 1e100) < 1e93
    assert abs(float(tiling.geometric_error(2, 1)[0]) - 525957.5361033019) < 1e-7
    for y in range(4):
        assert abs(float(tiling.geometric_error(3, y)[0]) - 262978.76805165096) < 1e-7
    for (z, y), exp in [
        ((4, 0), 131489.38402582548), ((4, 1), 146103.17544566366),
        ((4, 2), 131489.38402582548), ((4, 3), 131489.38402582548),
        ((4, 6), 146103.17544566366), ((4, 7), 131489.38402582548),
        ((5, 0), 65744.69201291274), ((5, 1), 76338.70680864961),
        ((5, 2), 65744.69201291274), ((5, 3), 83415.98216479822),
        ((5, 4), 65744.69201291274),
    ]:
        assert abs(float(tiling.geometric_error(z, y)[0]) - exp) < 1e-7


def test_slice_range():
    z, x, y = 4, 4, 1
    xs = int(tiling.x_step(z, y)[0])
    south, north = tiling.y_slice_range(z, y)
    west, east = tiling.x_slice_range(z, x, xs)
    assert (float(south), float(north), float(west), float(east)) == (
        45.0, 67.5, -90.0, -45.0)


def test_calc_parent_zxy():
    cases = [
        ((2, 0, 0), (1, 0, 0)), ((2, 2, 0), (1, 1, 0)),
        ((2, 2, 1), (1, 1, 1)), ((2, 1, 1), (1, 0, 1)),
        ((3, 0, 0), (2, 0, 0)), ((3, 2, 0), (2, 1, 0)),
        ((3, 1, 1), (2, 0, 0)), ((3, 2, 1), (2, 1, 0)),
        ((4, 4, 1), (3, 2, 0)), ((4, 4, 2), (3, 2, 1)),
        ((4, 0, 2), (3, 0, 1)),
    ]
    for (z, x, y), exp in cases:
        pz, px, py = tiling.calc_parent_zxy(z, x, y)
        assert (int(pz[0]), int(px[0]), int(py[0])) == exp


def test_zxy_from_lng_lat_valid():
    rng = np.random.default_rng(42)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    for zz in (2, 5, 12, 15):
        z, x, y = tiling.zxy_from_lng_lat(zz, lng, lat)
        for xi, yi in zip(x, y):
            assert _is_valid_zxy(zz, int(xi), int(yi))


def test_mvt_tile_at_tokyo():
    # Tokyo Tower approx (139.7454, 35.6586): standard slippy tile z=12 is
    # (3637, 1613) — cross-checked against the slippy-map formula
    # floor((1 - ln(tan φ + sec φ)/π)/2 · 2^z) = 1613.23 → 1613.
    x, y = tiling.mvt_tile_at(np.array([12]), 139.7454, 35.6586)
    assert (int(x[0]), int(y[0])) == (3637, 1613)
