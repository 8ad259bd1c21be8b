"""Round-5 wave 57: Lorenz curve, new-vs-returning, rank movers."""
import datetime as dt

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import stats as st
from plateau_gis_converter_spark.operators import temporal as tp


# ------------------------------------------------------------ lorenz points

def test_lorenz_even_distribution_is_diagonal(spark):
    df = spark.createDataFrame([Row(v=10)] * 20)
    got = {r["point"]: (r["pop_ppm"], r["mass_ppm"])
           for r in st.lorenz_points(df, "v", n_points=10).collect()}
    # everyone equal: one value block absorbs all deciles; the block
    # boundary is the full population, shares equal
    for p, (pop, mass) in got.items():
        assert pop == mass


def test_lorenz_concentrated_tail(spark):
    # 9 users with 1 event, 1 user with 91: bottom 90% hold 9%
    df = spark.createDataFrame([Row(v=1)] * 9 + [Row(v=91)])
    got = {r["point"]: r for r in
           st.lorenz_points(df, "v", n_points=10).collect()}
    assert got[9]["pop_ppm"] == 900_000
    assert got[9]["mass_ppm"] == 1_000_000 * 9 // 100
    assert got[10]["mass_ppm"] == 1_000_000


# ---------------------------------------------------------- new vs returning

def _e(u, day):
    return Row(user_id=u, ts=dt.datetime(2024, 11, 1)
               + dt.timedelta(days=day))


def test_new_vs_returning_split(spark):
    ev = spark.createDataFrame(
        [_e(1, 0), _e(2, 0),                 # day0: both new
         _e(1, 1), _e(3, 1),                 # day1: 1 returning, 3 new
         _e(1, 2), _e(2, 2), _e(3, 2)])      # day2: all returning
    got = {r["day"]: r for r in tp.new_vs_returning(ev).collect()}
    d0 = min(got)
    assert (got[d0]["n_new"], got[d0]["n_returning"]) == (2, 0)
    assert (got[d0 + 1]["n_new"], got[d0 + 1]["n_returning"]) == (1, 1)
    assert (got[d0 + 2]["n_new"], got[d0 + 2]["n_returning"]) == (0, 3)
    assert got[d0 + 1]["new_share_ppm"] == 500_000


# --------------------------------------------------------------- rank movers

def test_rank_movers_deltas_and_entrants(spark):
    rows = []
    base = dt.datetime(2024, 11, 1)
    # prev week: a x5, b x3, c x1 ; last week: b x6, a x2, d x1
    def add(k, n, day):
        for i in range(n):
            rows.append(Row(event_type=k,
                            ts=base + dt.timedelta(days=day, hours=i)))
    for k, n in (("a", 5), ("b", 3), ("c", 1)):
        add(k, n, 0)      # days 0..  (prev period)
    for k, n in (("b", 6), ("a", 2), ("d", 1)):
        add(k, n, 8)      # last period (anchored at max day)
    got = {r["event_type"]: r for r in tp.rank_movers(
        spark.createDataFrame(rows), period_days=7).collect()}
    assert got["b"]["rank_prev"] == 2 and got["b"]["rank_last"] == 1
    assert got["b"]["rank_delta"] == 1          # climbed
    assert got["a"]["rank_delta"] == -1         # fell 1 -> 2
    assert got["c"]["rank_last"] is None        # dropped out
    assert got["c"]["rank_delta"] is None
    assert got["d"]["rank_prev"] is None        # new entrant
    assert got["d"]["n_last"] == 1 and got["d"]["n_prev"] == 0
