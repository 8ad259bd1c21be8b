"""T1 — ProjectionTransform as a Spark operator
(nusamai/src/transformer/transform/projection.rs:19-185).

The reference converts the per-entity vertex buffer between CRSs; modes:

* ``lnglat_swap``   — (lat,lng)->(lng,lat) axis swap (projection.rs's
  EPSG 6697->WGS84-ish path) — pure Catalyst ``transform``.
* ``webmercator_m`` — lnglat -> WebMercator meters (G1 meters form) —
  pure Catalyst trig.
* ``jprect``        — Japan Plane Rectangular zone N (extended transverse
  Mercator, kernels/projection.py) — Arrow-batched pandas UDF (NumPy math,
  no per-row Python).
* ``ecef``          — geodetic -> geocentric (G10) — Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels import projection as pj

POINT3 = T.ArrayType(T.ArrayType(T.DoubleType()))


def swap_lnglat(df: DataFrame, col: str = "vertices") -> DataFrame:
    """(lat,lng,z) -> (lng,lat,z), Catalyst-only."""
    return df.withColumn(col, F.transform(
        F.col(col), lambda v: F.array(v[1], v[0], v[2])))


def to_webmercator_meters(df: DataFrame, col: str = "vertices") -> DataFrame:
    """lnglat -> mercator meters (webmercator.rs:31-35), Catalyst-only."""
    A = 6378137.0
    circ = A * 2.0 * float(np.pi)
    return df.withColumn(col, F.transform(
        F.col(col),
        lambda v: F.array(
            v[0] / F.lit(360.0) * F.lit(circ),
            F.log(F.tan(F.radians(F.lit(90.0) + v[1]) / F.lit(2.0))) * F.lit(A),
            v[2])))


def _vertices_udf(fn):
    @pandas_udf(POINT3)
    def udf(vertices: pd.Series) -> pd.Series:
        out = []
        for verts in vertices:
            if verts is None or len(verts) == 0:
                out.append([])
                continue
            arr = np.stack([np.asarray(v, dtype=np.float64) for v in verts])
            out.append(fn(arr).tolist())
        return pd.Series(out)

    return udf


def to_jprect(df: DataFrame, zone_no: int, col: str = "vertices") -> DataFrame:
    """lnglat(+h) -> Japan Plane Rectangular zone meters (x=easting,
    y=northing, matching projection.rs's (y, x) emission order being handled
    by the caller)."""
    tm = pj.jpr_zone_projection(zone_no)

    def fn(arr):
        x, y, z = tm.forward(arr[:, 0], arr[:, 1], arr[:, 2])
        return np.stack([x, y, z], axis=1)

    return df.withColumn(col, _vertices_udf(fn)(F.col(col)))


def to_ecef(df: DataFrame, col: str = "vertices") -> DataFrame:
    """lnglat+h -> geocentric ECEF (cartesian.rs:8-24)."""
    wgs = pj.wgs84()

    def fn(arr):
        x, y, z = pj.geodetic_to_geocentric(wgs, arr[:, 0], arr[:, 1], arr[:, 2])
        return np.stack([x, y, z], axis=1)

    return df.withColumn(col, _vertices_udf(fn)(F.col(col)))


def jgd2011_to_wgs84(df: DataFrame, grid, col: str = "vertices") -> DataFrame:
    """T1 vertical shift (vshift): JGD2011 Geographic 3D (EPSG:6697) ->
    WGS84 Geographic 3D (EPSG:4979) — lng/lat unchanged, ellipsoidal height
    = geoid undulation + input height (nusamai-projection/src/vshift.rs:
    16-21). ``grid`` is a kernels.geoid.GeoidGrid (bilinear sampler; the
    production GSIGEO2011 asset loads at runtime — licensed data, not
    embedded). The grid ships to executors once via plain-dict broadcast."""
    from ..kernels.geoid import GeoidGrid

    bc = df.sparkSession.sparkContext.broadcast(grid.to_broadcastable())

    def fn(arr):
        g = GeoidGrid.from_broadcastable(bc.value)
        h = g.height(arr[:, 0], arr[:, 1])
        return np.stack([arr[:, 0], arr[:, 1], h + arr[:, 2]], axis=1)

    return df.withColumn(col, _vertices_udf(fn)(F.col(col)))
