"""Round-5 wave 35: quadkeys, one-pass ring thinning, Pareto front."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.functions import geo
from plateau_gis_converter_spark.operators import geometry as gm
from plateau_gis_converter_spark.operators import stats as st


# ---------------------------------------------------------------- quadkey

def test_quadkey_bing_reference_values(spark):
    # the worked example from the Bing tile-system docs: tile
    # (z=3, x=3, y=5) -> "213"
    df = spark.createDataFrame([Row(x=3, y=5)])
    got = df.select(geo.quadkey_col(3, F.col("x"), F.col("y"))
                    .alias("qk")).collect()[0]["qk"]
    assert got == "213"
    # z=1 quadrants
    quads = spark.createDataFrame(
        [Row(x=x, y=y) for x in (0, 1) for y in (0, 1)])
    got = {(r["x"], r["y"]): r["qk"] for r in quads.select(
        "x", "y", geo.quadkey_col(1, F.col("x"), F.col("y"))
        .alias("qk")).collect()}
    assert got == {(0, 0): "0", (1, 0): "1", (0, 1): "2", (1, 1): "3"}


def test_quadkey_parent_is_prefix(spark):
    rows = [Row(x=(i * 37) % 4096, y=(i * 91) % 4096) for i in range(50)]
    df = spark.createDataFrame(rows)
    out = df.select(
        geo.quadkey_col(12, F.col("x"), F.col("y")).alias("qk"),
        geo.quadkey_col(11, (F.col("x") / 2).cast("bigint"),
                        (F.col("y") / 2).cast("bigint")).alias("pqk"))
    for r in out.collect():
        assert r["qk"].startswith(r["pqk"])
        assert len(r["qk"]) == 12 and len(r["pqk"]) == 11


# -------------------------------------------------------------- ring_thin

def _octagon(spark, r=2000, b=3, cx=0, cy=0, poly=1):
    xs = [cx - r, cx, cx + r, cx + r + b, cx + r, cx, cx - r, cx - r - b]
    ys = [cy - r, cy - r - b, cy - r, cy, cy + r, cy + r + b, cy + r, cy]
    return spark.createDataFrame(
        [Row(poly_id=poly, ring=0, idx=j, x_udeg=xs[j], y_udeg=ys[j])
         for j in range(8)])


def test_ring_thin_drops_small_bumps_keeps_corners(spark):
    out = gm.thin_ring_vertices(_octagon(spark), area2_min=100_000)
    rows = out.collect()
    kept = sorted(r["idx"] for r in rows)
    assert kept == [0, 2, 4, 6]  # corners only; 3-µdeg bumps dropped
    # corner triangle 2*area = r^2 - b^2
    areas = {r["idx"]: r["area2_tri"] for r in rows}
    assert areas[0] == 2000 * 2000 - 3 * 3
    # bump triangle 2*area would be 2*r*b = 12000 < 100000


def test_ring_thin_big_bumps_survive(spark):
    out = gm.thin_ring_vertices(_octagon(spark, b=500), area2_min=100_000)
    assert sorted(r["idx"] for r in out.collect()) == list(range(8))


def test_ring_thin_degeneracy_guard_keeps_all(spark):
    # micro-ring: every triangle under threshold -> keep-all guard
    out = gm.thin_ring_vertices(_octagon(spark, r=4, b=2),
                                area2_min=100_000)
    assert sorted(r["idx"] for r in out.collect()) == list(range(8))


def test_ring_thin_rings_independent(spark):
    big = _octagon(spark, poly=1)
    tiny = _octagon(spark, r=4, b=2, poly=2)
    out = gm.thin_ring_vertices(big.unionAll(tiny), area2_min=100_000)
    got = {}
    for r in out.collect():
        got.setdefault(r["poly_id"], []).append(r["idx"])
    assert sorted(got[1]) == [0, 2, 4, 6]
    assert sorted(got[2]) == list(range(8))


# ------------------------------------------------------------ pareto front

def test_pareto_front_basic_dominance(spark):
    rows = [Row(g="a", id=1, x=10, y=10),   # dominated by (20, 20)
            Row(g="a", id=2, x=20, y=20),   # frontier
            Row(g="a", id=3, x=30, y=5),    # frontier (best x)
            Row(g="a", id=4, x=5, y=30),    # frontier (best y)
            Row(g="a", id=5, x=20, y=5)]    # dominated by (20,20)&(30,5)
    out = {r["id"] for r in st.pareto_front(
        spark.createDataFrame(rows), "g", "x", "y").collect()}
    assert out == {2, 3, 4}


def test_pareto_front_ties_and_duplicates(spark):
    rows = [Row(g="a", id=1, x=10, y=10),
            Row(g="a", id=2, x=10, y=10),   # duplicate point: both stay
            Row(g="a", id=3, x=10, y=9),    # same x, worse y: dominated
            Row(g="a", id=4, x=9, y=10)]    # worse x, same y: dominated
    out = {r["id"] for r in st.pareto_front(
        spark.createDataFrame(rows), "g", "x", "y").collect()}
    assert out == {1, 2}


def test_pareto_front_groups_isolated_and_matches_bruteforce(spark):
    import itertools
    pts = [(g, i, (i * 7) % 50, (i * 13) % 50)
           for g in ("a", "b") for i in range(60)]
    df = spark.createDataFrame(
        [Row(g=g, id=i, x=x, y=y) for g, i, x, y in pts])
    got = {(r["g"], r["id"]) for r in
           st.pareto_front(df, "g", "x", "y").collect()}
    want = set()
    for g, i, x, y in pts:
        dominated = any(
            qg == g and qx >= x and qy >= y and (qx > x or qy > y)
            for qg, _, qx, qy in pts)
        if not dominated:
            want.add((g, i))
    assert got == want
