"""Round-5 wave 49: Hurst exponent, embedding anisotropy, rich club."""
import datetime as dt
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import similarity as sim
from plateau_gis_converter_spark.operators import stats as st


# -------------------------------------------------------------------- hurst

def _daily(spark, counts, key="k"):
    rows, eid = [], 0
    base = dt.datetime(2024, 6, 1)
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(Row(event_type=key,
                            ts=base + dt.timedelta(days=day,
                                                   hours=eid % 24),
                            event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_hurst_iid_series_near_half(spark):
    # alternating 2/4 counts: bucket sums at scale 2 are CONSTANT 6 ->
    # that point drops (var 0); remaining scales still fit. Use a less
    # degenerate series: period-3 pattern
    ev = _daily(spark, [1, 3, 2] * 10 + [1, 3])
    r = st.hurst_variance_scaling(ev, scales=(1, 2, 4, 8)).collect()[0]
    assert r["n_scales"] >= 3
    # anti-persistent / short-memory series: H well under 1
    assert r["h_milli"] < 900


def test_hurst_matches_scalar(spark):
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]
    ev = _daily(spark, counts)
    r = st.hurst_variance_scaling(ev, scales=(1, 2, 4)).collect()[0]
    pts = []
    for m in (1, 2, 4):
        sums = [sum(counts[i:i + m]) for i in range(0, len(counts), m)]
        nb = len(sums)
        s, ss = sum(sums), sum(x * x for x in sums)
        if nb * ss - s * s > 0:
            var = (nb * ss - s * s) / (nb * nb)
            pts.append((math.floor(math.log(m) * 1e6 + 0.5),
                        math.floor(math.log(var) * 1e6 + 0.5)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["slope_milli"] == math.floor(slope * 1000 + 0.5)
    assert r["h_milli"] == math.floor(slope * 500 + 0.5)


# ----------------------------------------------------------------- isotropy

def test_isotropy_identical_vectors_milli_1000(spark):
    rows = [Row(vec_id=i, embedding=[0.5, -0.25, 0.125])
            for i in range(10)]
    r = sim.isotropy_score(spark.createDataFrame(rows),
                           dim=3).collect()[0]
    assert r["n"] == 10
    assert r["anisotropy_milli"] == 1000  # perfect cone


def test_isotropy_symmetric_cloud_near_zero(spark):
    # +v and -v in equal numbers: pairwise dots cancel
    rows = [Row(vec_id=i, embedding=[1.0, 2.0]) for i in range(10)] \
        + [Row(vec_id=100 + i, embedding=[-1.0, -2.0])
           for i in range(10)]
    r = sim.isotropy_score(spark.createDataFrame(rows),
                           dim=2).collect()[0]
    # sum vector is exactly 0 -> pair_dot_num = -self_dot_sum
    assert r["pair_dot_num"] == -r["self_dot_sum"]
    assert r["anisotropy_milli"] < 0


def test_isotropy_identity_matches_bruteforce(spark):
    import itertools
    emb = [[((i * 3 + d) % 7 - 3) / 4.0 for d in range(4)]
           for i in range(12)]
    q = [[math.floor(x * 1000 + 0.5) for x in row] for row in emb]
    rows = [Row(vec_id=i, embedding=row) for i, row in enumerate(emb)]
    r = sim.isotropy_score(spark.createDataFrame(rows),
                           dim=4).collect()[0]
    brute = sum(sum(a * b for a, b in zip(q[i], q[j]))
                for i, j in itertools.permutations(range(12), 2))
    assert r["pair_dot_num"] == brute


# ---------------------------------------------------------------- rich club

def test_rich_club_core_plus_leaves(spark):
    # triangle core 0-1-2 (degrees 3,3,2 with leaves) + leaves on 0,1
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=0, dst=2),
         Row(src=0, dst=10), Row(src=1, dst=11)])
    got = {r["k"]: r for r in gr.rich_club(edges, ks=(1, 2)).collect()}
    # k=1: nodes {0,1,2} (degrees 3,3,2), all 3 core edges inside
    assert got[1]["n_nodes"] == 3 and got[1]["n_edges"] == 3
    assert got[1]["phi_ppm"] == 1_000_000
    # k=2: nodes {0,1} (degree 3), 1 edge between them
    assert got[2]["n_nodes"] == 2 and got[2]["n_edges"] == 1
    assert got[2]["phi_ppm"] == 1_000_000


def test_rich_club_empty_club_null(spark):
    edges = spark.createDataFrame([Row(src=0, dst=1)])
    got = {r["k"]: r for r in gr.rich_club(edges, ks=(0, 5)).collect()}
    assert got[0]["phi_ppm"] == 1_000_000
    assert 5 not in got  # nobody exceeds degree 5: no row
