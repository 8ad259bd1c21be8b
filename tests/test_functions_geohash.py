"""geohash_udeg vs an exact-rational interval-bisection reference (the
classic public geohash algorithm, run in Fractions so the reference itself
has no float error), plus known published cell values and boundary
clamping."""
from fractions import Fraction

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.functions import geo


def ref_geohash(lat_udeg: int, lng_udeg: int, chars: int) -> str:
    """Interval bisection in exact rationals; bit -> base32."""
    lat = Fraction(lat_udeg, 1_000_000)
    lng = Fraction(lng_udeg, 1_000_000)
    lat_lo, lat_hi = Fraction(-90), Fraction(90)
    lng_lo, lng_hi = Fraction(-180), Fraction(180)
    bits = []
    for j in range(5 * chars):
        # plain >= bisection: +180/+90 exactly always take the 1-branch,
        # which IS the clamp-to-last-cell behavior of the integer encoder
        if j % 2 == 0:
            mid = (lng_lo + lng_hi) / 2
            if lng >= mid:
                bits.append(1); lng_lo = mid
            else:
                bits.append(0); lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1); lat_lo = mid
            else:
                bits.append(0); lat_hi = mid
    out = []
    for c in range(chars):
        v = 0
        for k in range(5):
            v = (v << 1) | bits[5 * c + k]
        out.append(geo.GEOHASH_ALPHABET[v])
    return "".join(out)


def _spark_geohash(spark, pts, chars=7):
    df = spark.createDataFrame(
        [Row(i=i, lng=lng, lat=lat) for i, (lat, lng) in enumerate(pts)])
    rows = df.select("i", geo.geohash_udeg(
        F.col("lng"), F.col("lat"), chars).alias("gh")).collect()
    return [r["gh"] for r in sorted(rows, key=lambda r: r["i"])]


def test_known_published_values(spark):
    # (lat, lng) in micro-degrees -> published geohash prefixes
    got = _spark_geohash(spark, [
        (57_649_110, 10_407_440),   # Jutland example -> u4pruyd
        (0, 0),                     # s000000
    ], chars=7)
    assert got[0] == "u4pruyd"
    assert got[1] == "s0000000"[:7]


def test_matches_bisection_reference_grid(spark):
    pts = []
    for a in range(-3, 4):
        for b in range(-3, 4):
            pts.append((a * 29_123_457 % 90_000_000 * (1 if b % 2 else -1),
                        b * 53_917_331 % 180_000_000 * (1 if a % 2 else -1)))
    # plus exact cell-boundary points (the float-risk cases)
    pts += [(45_000_000, 90_000_000), (-45_000_000, -90_000_000),
            (0, 180_000_000), (0, -180_000_000), (90_000_000, 0),
            (-90_000_000, 0), (2_812_500, 5_625_000)]
    got = _spark_geohash(spark, pts, chars=7)
    exp = [ref_geohash(lat, lng, 7) for (lat, lng) in pts]
    assert got == exp


def test_prefix_containment(spark):
    """precision-p cell is the prefix of every finer cell inside it."""
    pts = [(35_689_500, 139_691_700), (35_689_501, 139_691_701)]
    gh5 = _spark_geohash(spark, pts, chars=5)
    gh9 = _spark_geohash(spark, pts, chars=9)
    for a, b in zip(gh5, gh9):
        assert b.startswith(a)


def test_rejects_bad_precision(spark):
    with pytest.raises(ValueError):
        geo.geohash_udeg(F.lit(0), F.lit(0), 0)
    with pytest.raises(ValueError):
        geo.geohash_udeg(F.lit(0), F.lit(0), 13)
