"""Round-5 wave 12: geodesic distance-band pairs, stay-point detection,
integer-exact anomalous bins."""
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import geodesy as gd
from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


# ----------------------------------------------------------- geodesy

def test_haversine_known_distance(spark):
    """1000 µdeg of latitude = ~111.19 m everywhere (meridian arc)."""
    df = spark.createDataFrame([Row(a=1)])
    mm = df.select(gd.haversine_mm(
        F.lit(139_700_000), F.lit(35_600_000),
        F.lit(139_700_000), F.lit(35_601_000)).alias("d")).collect()[0]["d"]
    expect = math.radians(1000 / 1e6) * gd.EARTH_RADIUS_M * 1000
    assert abs(mm - expect) < 2  # mm


def test_distance_band_pairs_exact_vs_brute(spark):
    """Cell-bucketed candidates lose nothing vs brute force."""
    import itertools
    pts = [(i, 139_700_000 + (i * 1357) % 9000,
            35_600_000 + (i * 2471) % 9000) for i in range(60)]
    df = spark.createDataFrame(
        [Row(doc_id=i, lng_udeg=lng, lat_udeg=lat) for i, lng, lat in pts])
    got = {(r["id_a"], r["id_b"]): r["dist_mm"]
           for r in gd.distance_band_pairs(df, radius_m=300.0).collect()}

    def hav_mm(p, q):
        phi1, phi2 = math.radians(p[2] / 1e6), math.radians(q[2] / 1e6)
        dphi = math.radians((q[2] - p[2]) / 1e6)
        dlmb = math.radians((q[1] - p[1]) / 1e6)
        h = (math.sin(dphi / 2) ** 2
             + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2)
        return math.floor(2 * gd.EARTH_RADIUS_M * math.asin(math.sqrt(h))
                          * 1000 + 0.5)

    want = {}
    for p, q in itertools.combinations(pts, 2):
        d = hav_mm(p, q)
        if d <= 300_000:
            want[(min(p[0], q[0]), max(p[0], q[0]))] = d
    assert got == want
    assert len(want) > 0  # the fixture actually exercises the band


def test_distance_band_no_duplicate_pairs(spark):
    """A pair whose cells are adjacent is found exactly once."""
    cell = gd.band_cell_udeg(500.0)
    df = spark.createDataFrame([
        Row(doc_id=1, lng_udeg=139_700_000, lat_udeg=35_600_000),
        Row(doc_id=2, lng_udeg=139_700_000 + cell, lat_udeg=35_600_000),
    ])
    out = gd.distance_band_pairs(df, radius_m=500.0).collect()
    assert len(out) <= 1
    if out:
        assert (out[0]["id_a"], out[0]["id_b"]) == (1, 2)


# -------------------------------------------------------- stay points

def _track(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_id=k, cx=cx, cy=cy)
         for u, ts, k, cx, cy in rows]).withColumn(
        "ts", F.col("ts").cast("timestamp"))


def test_stay_points_detects_dwell_and_splits_moves(spark):
    rows = [
        # user 1 dwells in cell (5,5) for 20 min, then moves
        (1, "2024-01-01 00:00:00", 1, 5, 5),
        (1, "2024-01-01 00:10:00", 2, 5, 5),
        (1, "2024-01-01 00:20:00", 3, 5, 5),
        (1, "2024-01-01 00:25:00", 4, 6, 5),   # moved: run of 1, dropped
        # back to (5,5): a NEW run (not merged with the first)
        (1, "2024-01-01 00:30:00", 5, 5, 5),
        (1, "2024-01-01 00:45:00", 6, 5, 5),
    ]
    out = tp.stay_points(_track(spark, rows), min_events=2,
                         min_duration_us=600_000_000).collect()
    assert len(out) == 2
    out.sort(key=lambda r: r["t_start"])
    assert out[0]["n_events"] == 3 and out[0]["duration_us"] == 1200_000_000
    assert out[1]["n_events"] == 2 and out[1]["duration_us"] == 900_000_000
    assert all(r["cx"] == 5 and r["cy"] == 5 for r in out)


def test_stay_points_thresholds(spark):
    rows = [
        # 2 events but only 5 min -> below duration threshold
        (2, "2024-01-01 01:00:00", 1, 7, 7),
        (2, "2024-01-01 01:05:00", 2, 7, 7),
        # single event -> below count threshold
        (2, "2024-01-01 02:00:00", 3, 8, 8),
    ]
    out = tp.stay_points(_track(spark, rows), min_events=2,
                         min_duration_us=600_000_000).collect()
    assert out == []


# ----------------------------------------------------------- anomaly

def test_anomalous_bins_flags_spike_only(spark):
    """Population-stat masking bounds a single spike's z^2 by D-1, so
    z^2 > 9 needs >= 11 bins — 30 days here (the operator docstring's
    threshold-selection rule)."""
    rows = []
    # type 'a': 10 events/day for 29 days, 100 on day 30 (spike)
    for day in range(1, 31):
        n = 100 if day == 30 else 10
        for _ in range(n):
            rows.append(Row(event_type="a",
                            ts=f"2024-03-{day:02d} 12:00:00"))
    # type 'b': flat 5/day -> zero variance, nothing flagged
    for day in range(1, 31):
        for _ in range(5):
            rows.append(Row(event_type="b",
                            ts=f"2024-03-{day:02d} 12:00:00"))
    ev = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = st.anomalous_bins(ev)  # default z^2 = 9
    flagged = [(r["event_type"], r["bin_ts"].day)
               for r in out.where("is_anomaly").collect()]
    assert flagged == [("a", 30)]
    # integer math cross-check: (D*x-S)^2 > 9*(D*Q-S^2) for the spike,
    # not for a baseline day
    d, s, q = 30, 29 * 10 + 100, 29 * 100 + 10000
    assert (d * 100 - s) ** 2 > 9 * (d * q - s * s)
    assert not (d * 10 - s) ** 2 > 9 * (d * q - s * s)


def test_anomalous_bins_zero_variance_never_flags(spark):
    rows = [Row(event_type="c", ts=f"2024-03-0{d} 00:00:00")
            for d in range(1, 6)]
    ev = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = st.anomalous_bins(ev).collect()
    assert len(out) == 5
    assert not any(r["is_anomaly"] for r in out)
