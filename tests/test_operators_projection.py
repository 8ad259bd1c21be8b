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
