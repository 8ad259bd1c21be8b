"""Round-5 wave 34: WKT parsing, HyperBall neighborhood registers,
Theil-Sen robust slope."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import cardinality as cd
from plateau_gis_converter_spark.operators import geometry as gm
from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------------ wkt_vertices

def test_wkt_point_line_z_ignored(spark):
    df = spark.createDataFrame([
        Row(geom_id=1, wkt="POINT (139.5 35.25)"),
        Row(geom_id=2, wkt="linestring (0.1 0.2 99.9,  -0.5 -1.25)"),
    ])
    got = {(r["geom_id"], r["ring"], r["idx"]):
           (r["gtype"], r["x_udeg"], r["y_udeg"])
           for r in gm.wkt_vertices(df).collect()}
    assert got[(1, 0, 0)] == ("POINT", 139_500_000, 35_250_000)
    # lowercase type upper-cased; Z ordinate ignored; negatives exact
    assert got[(2, 0, 0)] == ("LINESTRING", 100_000, 200_000)
    assert got[(2, 0, 1)] == ("LINESTRING", -500_000, -1_250_000)


def test_wkt_polygon_hole_ring_numbering(spark):
    wkt = ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), "
           "(0.5 0.5, 1 0.5, 1 1, 0.5 0.5))")
    df = spark.createDataFrame([Row(geom_id=7, wkt=wkt)])
    rows = gm.wkt_vertices(df).collect()
    rings = {}
    for r in rows:
        rings.setdefault(r["ring"], []).append(
            (r["idx"], r["x_udeg"], r["y_udeg"]))
    assert sorted(rings) == [0, 1]
    assert len(rings[0]) == 5 and len(rings[1]) == 4
    assert sorted(rings[1])[0] == (0, 500_000, 500_000)


def test_wkt_feeds_shoelace_area(spark):
    # a ward-sized 0.002-degree square (inside the operator's documented
    # ~2^21 µdeg extent bound) -> exact shoelace 2*area via the existing
    # geometry operator: composition proof for the ingestion bridge
    wkt = "POLYGON ((139.7 35.6, 139.702 35.6, 139.702 35.602, 139.7 35.602))"
    df = spark.createDataFrame([Row(geom_id=1, wkt=wkt)])
    v = gm.wkt_vertices(df).select(
        F.col("geom_id").alias("poly_id"), F.col("idx").alias("i"),
        F.col("x_udeg").alias("x"), F.col("y_udeg").alias("y"))
    r = gm.ring_area2_centroid(v).collect()[0]
    assert r["area2_udeg2"] == 2 * (2_000 * 2_000)
    assert (r["cx_udeg"], r["cy_udeg"]) == (139_701_000, 35_601_000)


def test_wkt_malformed_vertex_dropped(spark):
    df = spark.createDataFrame([
        Row(geom_id=1, wkt="LINESTRING (1 1, garbage, 2 2)")])
    got = sorted((r["idx"], r["x_udeg"])
                 for r in gm.wkt_vertices(df).collect())
    # the bad middle vertex drops; indices of kept vertices preserved
    assert got == [(0, 1_000_000), (2, 2_000_000)]


# -------------------------------------------------------------- hyperball

def test_hyperball_matches_direct_ball_sketch(spark):
    # chain 0->1->2->3 plus 0->2: ball2(0)={0,1,2,3}, ball2(1)={1,2,3},
    # ball2(2)={2,3}, ball2(3)={3}
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=3),
         Row(src=0, dst=2)])
    nodes = spark.createDataFrame([Row(id=i) for i in range(4)])
    got = {(r["id"], r["bucket"]): r["r"]
           for r in gr.hyperball_registers(nodes, edges, radius=2,
                                           p=6).collect()}
    balls = {0: [0, 1, 2, 3], 1: [1, 2, 3], 2: [2, 3], 3: [3]}
    members = spark.createDataFrame(
        [Row(id=v, member=u) for v, us in balls.items() for u in us])
    want = {(r["id"], r["bucket"]): r["r"]
            for r in cd.hll_registers_grouped(members, "member", ["id"],
                                              p=6).collect()}
    assert got == want


def test_hyperball_radius_zero_is_self_sketch(spark):
    edges = spark.createDataFrame([Row(src=0, dst=1)])
    nodes = spark.createDataFrame([Row(id=0), Row(id=1)])
    out = gr.hyperball_registers(nodes, edges, radius=0, p=6).collect()
    # one register per node (its own hash), nothing propagated
    assert len(out) == 2
    assert {r["id"] for r in out} == {0, 1}


def test_hyperball_estimates_ball_sizes(spark):
    # star: hub 0 -> 1..40; ball1(0) = 41 nodes, ball1(leaf) = 1
    edges = spark.createDataFrame([Row(src=0, dst=i)
                                   for i in range(1, 41)])
    nodes = spark.createDataFrame([Row(id=i) for i in range(41)])
    regs = gr.hyperball_registers(nodes, edges, radius=1, p=8)
    hub = [(r["bucket"], r["r"]) for r in
           regs.where(F.col("id") == 0).collect()]
    est = cd.hll_estimate(hub, p=8)
    assert abs(est - 41) / 41 < 0.35


# -------------------------------------------------------------- theil_sen

def _series(spark, counts, key="k"):
    rows, eid = [], 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append(Row(k=key,
                            ts=dt.datetime(2024, 2, day, 0, 0, eid % 60),
                            event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_theil_sen_linear_series_exact_slope(spark):
    ev = _series(spark, [2, 4, 6, 8, 10])
    r = st.theil_sen_slope(ev, key_col="k").collect()[0]
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["med_num"] / r["med_den"] == 2.0
    assert r["slope_milli"] == 2000


def test_theil_sen_outlier_robust_vs_even_pair_count(spark):
    # 4 days -> 6 pairs (EVEN count: lower median = rank 3); day 3
    # spikes 100x but the median pairwise slope ignores it
    ev = _series(spark, [10, 11, 100, 13])
    r = st.theil_sen_slope(ev, key_col="k").collect()[0]
    slopes = sorted([(11 - 10) / 1, (100 - 10) / 2, (13 - 10) / 3,
                     (100 - 11) / 1, (13 - 11) / 2, (13 - 100) / 1])
    want = slopes[(6 + 1) // 2 - 1]
    assert r["med_num"] / r["med_den"] == want
    assert r["slope_milli"] == 1000  # slope 1/day, not ~30/day OLS


def test_theil_sen_matches_scalar_reference(spark):
    counts = [5, 3, 8, 1, 9, 2, 7, 4]
    ev = _series(spark, counts)
    r = st.theil_sen_slope(ev, key_col="k").collect()[0]
    pairs = []
    for i in range(len(counts)):
        for j in range(i + 1, len(counts)):
            pairs.append(((counts[j] - counts[i]) / (j - i), i, j,
                          counts[j] - counts[i], j - i))
    pairs.sort()
    m = len(pairs)
    med = pairs[(m + 1) // 2 - 1]
    assert (r["med_num"], r["med_den"]) == (med[3], med[4])
