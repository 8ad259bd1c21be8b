"""Round-5 wave 16: incremental focal maintenance, distributed HLL
estimate read."""
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import cardinality as cd
from plateau_gis_converter_spark.operators import raster as ra


def _pts(spark, coords):
    return spark.createDataFrame(
        [Row(lng_udeg=lng, lat_udeg=lat) for lng, lat in coords])


def test_apply_focal_delta_matches_full_recompute(spark):
    old = [(139_700_000 + i * 3000, 35_600_000) for i in range(8)]
    removed = old[:3]
    added = [(139_705_000, 35_610_000), (139_706_000, 35_610_000)]
    new = old[3:] + added
    prev = ra.focal_stats(
        ra.rasterize_points(_pts(spark, old), zoom=8, tile_px=16),
        zoom=8, tile_px=16)
    inc = ra.apply_focal_delta(prev, _pts(spark, added),
                               _pts(spark, removed), zoom=8, tile_px=16)
    full = ra.focal_stats(
        ra.rasterize_points(_pts(spark, new), zoom=8, tile_px=16),
        zoom=8, tile_px=16)
    key = lambda r: (r["x"], r["y"], r["px"], r["py"])
    a = {key(r): r["focal_sum"] for r in inc.collect()}
    b = {key(r): r["focal_sum"] for r in full.collect()}
    assert a == b and len(b) > 0


def test_apply_focal_delta_drops_zeroed_pixels(spark):
    pts = [(139_700_000, 35_600_000)]
    prev = ra.focal_stats(
        ra.rasterize_points(_pts(spark, pts), zoom=8, tile_px=16),
        zoom=8, tile_px=16)
    empty = spark.createDataFrame([], "lng_udeg bigint, lat_udeg bigint")
    out = ra.apply_focal_delta(prev, empty, _pts(spark, pts),
                               zoom=8, tile_px=16)
    assert out.count() == 0


def test_hll_estimate_grouped_accuracy_and_branches(spark):
    rows = ([Row(g="big", k=f"u{i}") for i in range(3000)]
            + [Row(g="small", k=f"v{i}") for i in range(10)])
    df = spark.createDataFrame(rows)
    regs = cd.hll_registers_grouped(df, "k", ["g"], p=6)
    out = {r["g"]: r for r in
           cd.hll_estimate_grouped(regs, ["g"], p=6).collect()}
    # big group: raw harmonic branch, within the ~1.04/sqrt(64) bound x4
    assert abs(out["big"]["est_distinct"] - 3000) < 3000 * 0.52
    # small group: linear-counting branch is near-exact at this load
    assert abs(out["small"]["est_distinct"] - 10) <= 3
    # matches the scalar reference estimator on the same registers
    for g, n in (("big", None), ("small", None)):
        pairs = [(r["bucket"], r["r"])
                 for r in regs.where(F.col("g") == g).collect()]
        ref = cd.hll_estimate(pairs, p=6)
        assert out[g]["est_distinct"] == math.floor(ref + 0.5)


def test_hll_estimate_grouped_validates_p(spark):
    import pytest
    df = spark.createDataFrame([Row(g="a", bucket=0, r=1)])
    with pytest.raises(ValueError):
        cd.hll_estimate_grouped(df, ["g"], p=3)
