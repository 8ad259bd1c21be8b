"""Round-5 wave 37: Soundex phonetic blocking, session co-visitation,
exact rolling distinct users."""
import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import temporal as tp


# ----------------------------------------------------------------- soundex

ARCHIVES_CASES = {
    # the canonical National Archives examples
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
    "Gutierrez": "G362", "Jackson": "J250", "VanDeusen": "V532",
    "Deusen": "D250", "Smith": "S530", "Smyth": "S530",
}


def test_soundex_archives_reference_values(spark):
    df = spark.createDataFrame([Row(name=n) for n in ARCHIVES_CASES])
    got = {r["name"]: r["sdx"] for r in df.select(
        "name", dd.soundex_col(F.col("name")).alias("sdx")).collect()}
    assert got == ARCHIVES_CASES


def test_soundex_matches_spark_builtin(spark):
    names = list(ARCHIVES_CASES) + ["Euler", "Gauss", "Hilbert",
                                    "Knuth", "Lloyd", "Lukasiewicz",
                                    "Wachs", "Ellery", "Ghosh",
                                    "Czarkowska", "Hu", "W"]
    df = spark.createDataFrame([Row(name=n) for n in names])
    out = df.select(
        "name", dd.soundex_col(F.col("name")).alias("mine"),
        F.soundex(F.col("name")).alias("builtin")).collect()
    diffs = [(r["name"], r["mine"], r["builtin"])
             for r in out if r["mine"] != r["builtin"]]
    assert not diffs, diffs


def test_soundex_blocking_groups_variants(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, name=n)
         for i, n in enumerate(["Smith", "Smyth", "Schmidt", "Jonson",
                                "Johnson", "Robert"])])
    keys = {r["name"]: r["sdx"]
            for r in dd.soundex_blocking_keys(df).collect()}
    # Smith/Smyth/Schmidt all S530 (the canonical Soundex collision);
    # Johnson/Jonson share J525; different families differ
    assert keys["Smith"] == keys["Smyth"] == keys["Schmidt"] == "S530"
    assert keys["Johnson"] == keys["Jonson"] == "J525"
    assert keys["Robert"] == "R163"


# ------------------------------------------------------------ covisit_pairs

def _ev(u, minute, item, eid):
    return Row(user_id=u, ts=dt.datetime(2024, 1, 1, 10, minute),
               event_type=item, event_id=eid)


def test_covisit_counts_distinct_sessions(spark):
    ev = spark.createDataFrame([
        # user 1, session 1: a, b, a (duplicate a counted once)
        _ev(1, 0, "a", 1), _ev(1, 5, "b", 2), _ev(1, 9, "a", 3),
        # user 1, session 2 (after >30 min gap): a, b again
        _ev(1, 50, "a", 4), _ev(1, 55, "b", 5),
        # user 2, one session: a, c
        _ev(2, 0, "a", 6), _ev(2, 1, "c", 7),
    ])
    got = {(r["item_a"], r["item_b"]): r["n_sessions"]
           for r in tp.covisit_pairs(ev, min_sessions=1).collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_covisit_min_sessions_and_gap_boundary(spark):
    # exactly 30 min apart stays the SAME session (strictly > gap splits)
    ev = spark.createDataFrame([
        _ev(1, 0, "x", 1), _ev(1, 30, "y", 2),
        _ev(2, 0, "x", 3), _ev(2, 29, "y", 4),
    ])
    got = {(r["item_a"], r["item_b"]): r["n_sessions"]
           for r in tp.covisit_pairs(ev, min_sessions=2).collect()}
    assert got == {("x", "y"): 2}


# --------------------------------------------------------- rolling_distinct

def test_rolling_distinct_window_semantics(spark):
    def e(u, day, eid):
        return Row(event_type="k", user_id=u,
                   ts=dt.datetime(2024, 3, day), event_id=eid)

    ev = spark.createDataFrame([
        e(1, 1, 1), e(2, 1, 2),       # day 1: users {1,2}
        e(1, 5, 3),                    # day 5: user 1 again
        e(3, 9, 4),                    # day 9: user 3
    ])
    d0 = (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
    got = {r["day"] - d0 + 1: r["n_users"]
           for r in tp.rolling_distinct(ev, window_days=7).collect()}
    # window [day-6, day]: day1 {1,2}=2 ... day5 {1,2}=2 (u1 deduped),
    # day7 {1,2}=2, day8 {1}=1 (day1 aged out), day9 {1,3}=2,
    # day12 {3}=1 (day5 aged out at day12)
    assert got[1] == 2 and got[5] == 2 and got[7] == 2
    assert got[8] == 1 and got[9] == 2
    # clipped at the key's max active day (9): no ghost trailing days
    assert max(got) == 9


def test_rolling_distinct_matches_bruteforce(spark):
    rows = []
    for i in range(120):
        rows.append(Row(event_type=f"t{i % 2}", user_id=(i * 7) % 13,
                        ts=dt.datetime(2024, 3, 1 + (i * 5) % 20),
                        event_id=i))
    ev = spark.createDataFrame(rows)
    got = {(r["event_type"], r["day"]): r["n_users"]
           for r in tp.rolling_distinct(ev, window_days=3).collect()}
    act = {}
    for r in rows:
        d = (r.ts.date() - dt.date(1970, 1, 1)).days
        act.setdefault(r.event_type, []).append((d, r.user_id))
    want = {}
    for k, pairs in act.items():
        dmax = max(d for d, _ in pairs)
        for day in range(min(d for d, _ in pairs), dmax + 1):
            us = {u for d, u in pairs if day - 2 <= d <= day}
            if us:
                want[(k, day)] = len(us)
    assert got == want
