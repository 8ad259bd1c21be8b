"""Round-5 wave 14: exact polygon geometry (shoelace area + centroid)."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import geometry as gm


def _verts(spark, polys):
    rows = [Row(poly_id=p, i=i, x=x, y=y)
            for p, ring in polys.items() for i, (x, y) in enumerate(ring)]
    return spark.createDataFrame(rows)


def test_unit_square_area_and_centroid(spark):
    sq = {"s": [(0, 0), (1000, 0), (1000, 1000), (0, 1000)]}  # CCW
    out = gm.ring_area2_centroid(_verts(spark, sq)).collect()[0]
    assert out["area2_udeg2"] == 2 * 1000 * 1000
    assert (out["cx_udeg"], out["cy_udeg"]) == (500, 500)
    assert out["n_vertices"] == 4


def test_triangle_and_translation_invariance(spark):
    # right triangle, legs 3000/3000 -> area2 = 9e6, centroid (1000,1000)
    base = [(0, 0), (3000, 0), (0, 3000)]
    off = 139_000_000
    polys = {"t0": base,
             "t1": [(x + off, y + off) for x, y in base]}
    out = {r["poly_id"]: r for r in
           gm.ring_area2_centroid(_verts(spark, polys)).collect()}
    assert out["t0"]["area2_udeg2"] == out["t1"]["area2_udeg2"] == 9_000_000
    assert (out["t0"]["cx_udeg"], out["t0"]["cy_udeg"]) == (1000, 1000)
    assert (out["t1"]["cx_udeg"], out["t1"]["cy_udeg"]) == (off + 1000,
                                                            off + 1000)


def test_concave_pentagon_matches_scalar_shoelace(spark):
    ring = [(0, 0), (4000, 0), (4000, 3000), (2000, 1000), (0, 3000)]
    out = gm.ring_area2_centroid(_verts(spark, {"c": ring})).collect()[0]
    a2 = sum(ring[i][0] * ring[(i + 1) % 5][1]
             - ring[(i + 1) % 5][0] * ring[i][1] for i in range(5))
    cxn = sum((ring[i][0] + ring[(i + 1) % 5][0])
              * (ring[i][0] * ring[(i + 1) % 5][1]
                 - ring[(i + 1) % 5][0] * ring[i][1]) for i in range(5))
    assert out["area2_udeg2"] == a2
    assert out["cx_udeg"] == cxn // (3 * a2)
    assert out["n_vertices"] == 5


def test_raw_udeg_quad_no_overflow(spark):
    """A Tokyo-extent quad at raw µdeg coordinates — the case whose
    centroid numerator overflows i64 WITHOUT the local-origin shift."""
    ring = [(139_560_000, 35_520_000), (139_920_000, 35_520_000),
            (139_920_000, 35_820_000), (139_560_000, 35_820_000)]
    out = gm.ring_area2_centroid(_verts(spark, {"w": ring})).collect()[0]
    assert out["area2_udeg2"] == 2 * 360_000 * 300_000
    assert out["cx_udeg"] == 139_740_000
    assert out["cy_udeg"] == 35_670_000
