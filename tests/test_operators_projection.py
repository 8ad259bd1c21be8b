"""T1 projection operator over vertex arrays (Spark side)."""
import numpy as np
from pyspark.sql import types as T

from plateau_gis_converter_spark.kernels import projection as pj
from plateau_gis_converter_spark.operators import projection as op

SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("vertices", T.ArrayType(T.ArrayType(T.DoubleType()))),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_swap_and_mercator(spark):
    df = _df(spark, [(1, [[35.6586, 139.7454, 10.0]])])
    out = op.swap_lnglat(df).collect()[0]["vertices"][0]
    assert out == [139.7454, 35.6586, 10.0]
    df2 = _df(spark, [(1, [[139.7454, 35.6586, 10.0]])])
    m = op.to_webmercator_meters(df2).collect()[0]["vertices"][0]
    from plateau_gis_converter_spark.kernels.mercator import (
        lnglat_to_web_mercator_meters)
    ex, ey = lnglat_to_web_mercator_meters(139.7454, 35.6586)
    assert abs(m[0] - float(ex)) < 1e-9
    assert abs(m[1] - float(ey)) < 1e-9
    assert m[2] == 10.0


def test_jprect_operator_matches_kernel(spark):
    pts = [[138.19318970050347, 36.65209371778363, 0.0],
           [138.5, 36.0, 5.0]]
    df = _df(spark, [(1, pts)])
    out = op.to_jprect(df, zone_no=8).collect()[0]["vertices"]
    tm = pj.jpr_zone_projection(8)
    arr = np.asarray(pts)
    x, y, z = tm.forward(arr[:, 0], arr[:, 1], arr[:, 2])
    for got, ex, ey, ez in zip(out, x, y, z):
        assert abs(got[0] - ex) < 1e-9
        assert abs(got[1] - ey) < 1e-9
        assert got[2] == ez
    # the reference golden point (etmerc.rs:396-397)
    assert abs(out[0][0] - -27430.911753676937) < 1e-6
    assert abs(out[0][1] - 72396.2255270589) < 1e-6


def test_ecef_operator(spark):
    df = _df(spark, [(1, [[140.0, 37.0, 50.0]])])
    out = op.to_ecef(df).collect()[0]["vertices"][0]
    assert abs(out[0] - -3906851.9770472576) < 1e-7
    assert abs(out[1] - 3278238.0530045824) < 1e-7
    assert abs(out[2] - 3817423.251099322) < 1e-7


# --- T1 vshift (vshift.rs:16-21, fixture style of :29-43) --------------------

def test_geoid_bilinear_reproduces_bilinear_function():
    import numpy as np

    from plateau_gis_converter_spark.kernels.geoid import GeoidGrid

    # a bilinear function is reproduced EXACTLY by bilinear interpolation
    lng0, lat0, dlng, dlat, nx, ny = 139.0, 35.0, 0.05, 0.04, 21, 16
    jj, ii = np.meshgrid(np.arange(nx), np.arange(ny))
    lngs = lng0 + jj * dlng
    lats = lat0 + ii * dlat
    f = lambda lng, lat: 30.0 + 2.0 * (lng - 139.0) + 3.0 * (lat - 35.0) \
        + 1.5 * (lng - 139.0) * (lat - 35.0)
    g = GeoidGrid(lng0, lat0, dlng, dlat, f(lngs, lats))
    qlng = np.array([139.123, 139.777, 139.0, 140.0])
    qlat = np.array([35.111, 35.599, 35.0, 35.6])
    got = g.height(qlng, qlat)
    assert np.allclose(got, f(qlng, qlat), rtol=0, atol=1e-9)
    # outside the grid -> NaN (the reference's grid covers Japan only)
    assert np.isnan(g.height(138.0, 35.1))
    assert np.isnan(g.height(139.1, 90.0))


def test_jgd2011_to_wgs84_contract(spark):
    """vshift.rs:29-43 contract: lng/lat unchanged; height becomes geoid
    undulation + input elevation."""
    import numpy as np

    from plateau_gis_converter_spark.kernels.geoid import synthetic_tokyo_grid
    from plateau_gis_converter_spark.operators import projection as prj

    grid = synthetic_tokyo_grid()
    rows = [("f1", [[139.70, 35.69, 0.0], [139.75, 35.66, 12.5]])]
    df = spark.createDataFrame(rows, ["feature_id", "vertices"])
    out = prj.jgd2011_to_wgs84(df, grid).collect()[0]["vertices"]
    for (lng, lat, h), (olng, olat, oh) in zip(rows[0][1], out):
        assert olng == lng and olat == lat  # (lng, lat) must not change
        expect = float(grid.height(lng, lat)) + h
        assert abs(oh - expect) < 1e-9
        assert 35.0 < oh - h < 41.0  # Kanto-magnitude undulation
