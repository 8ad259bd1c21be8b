"""Round-5 wave 41: Gini decision stump, Cohen's kappa, integer power
iteration."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import similarity as sim
from plateau_gis_converter_spark.operators import stats as st


# --------------------------------------------------------------- gini split

def test_gini_perfect_split(spark):
    rows = [Row(f=1, y=1), Row(f=1, y=1), Row(f=2, y=0), Row(f=3, y=0)]
    r = st.gini_best_split(spark.createDataFrame(rows), "f", "y") \
        .collect()[0]
    assert r["thr"] == 1 and r["gini_milli"] == 0
    assert (r["n_left"], r["pos_left"]) == (2, 2)
    assert (r["n_right"], r["pos_right"]) == (2, 0)


def test_gini_degenerate_single_value_empty(spark):
    rows = [Row(f=5, y=1), Row(f=5, y=0)]
    assert st.gini_best_split(spark.createDataFrame(rows),
                              "f", "y").count() == 0


def test_gini_matches_bruteforce(spark):
    data = [((i * 7) % 13, 1 if (i * 3) % 5 < 2 else 0)
            for i in range(120)]
    rows = [Row(f=f, y=y) for f, y in data]
    r = st.gini_best_split(spark.createDataFrame(rows), "f", "y") \
        .collect()[0]
    vals = sorted({f for f, _ in data})
    n = len(data)
    ap = sum(y for _, y in data)
    best = None
    for v in vals[:-1]:
        nl = sum(1 for f, _ in data if f <= v)
        al = sum(y for f, y in data if f <= v)
        nr, ar = n - nl, ap - al
        g = ((nl - (al * al + (nl - al) ** 2) / nl)
             + (nr - (ar * ar + (nr - ar) ** 2) / nr)) / n
        if best is None or (g, v) < best[:2]:
            best = (g, v, nl, al)
    assert r["thr"] == best[1]
    assert (r["n_left"], r["pos_left"]) == (best[2], best[3])
    import math
    assert r["gini_milli"] == math.floor(best[0] * 1000 + 0.5)


# ------------------------------------------------------------- cohens kappa

def test_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [Row(a=x, b=x) for x in ("p", "q", "p", "q")])
    r = st.cohens_kappa(perfect, "a", "b").collect()[0]
    assert r["kappa_milli"] == 1000
    chance = spark.createDataFrame(
        [Row(a=a, b=b) for a in ("x", "y") for b in ("x", "y")])
    r2 = st.cohens_kappa(chance, "a", "b").collect()[0]
    assert r2["kappa_milli"] == 0


def test_kappa_constant_rater_null(spark):
    df = spark.createDataFrame(
        [Row(a="x", b="x"), Row(a="x", b="x")])
    r = st.cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa_milli"] is None  # pe = n^2: undefined


def test_kappa_matches_scalar(spark):
    import collections
    pairs = [("abc"[(i * 2) % 3], "abc"[(i * 5) % 3]) for i in range(90)]
    r = st.cohens_kappa(spark.createDataFrame(
        [Row(a=a, b=b) for a, b in pairs]), "a", "b").collect()[0]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra = collections.Counter(a for a, _ in pairs)
    cb = collections.Counter(b for _, b in pairs)
    pe = sum(ra[k] * cb.get(k, 0) for k in ra)
    import math
    want = math.floor((n * agree - pe) / (n * n - pe) * 1000 + 0.5)
    assert (r["n"], r["n_agree"], r["pe_num"]) == (n, agree, pe)
    assert r["kappa_milli"] == want


# ---------------------------------------------------------- power iteration

def _mirror_power(emb, dim, iters):
    import math

    # exact floor(x*1000 + 0.5) quantization mirror
    xl = [[math.floor(x * 1000 + 0.5) for x in row] for row in emb]

    def tz_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    v = [1_000_000] * dim
    for _ in range(iters):
        u = [sum(x * vv for x, vv in zip(row, v)) for row in xl]
        um = max(abs(a) for a in u)
        uq = [tz_div(1000 * a, um) if um > 0 else 0 for a in u]
        w = [sum(xl[r][d] * uq[r] for r in range(len(xl)))
             for d in range(dim)]
        wm = max(abs(a) for a in w)
        v = [tz_div(1_000_000 * a, wm) if wm > 0 else 0 for a in w]
    return v


def test_power_iteration_matches_scalar_mirror(spark):
    emb = [[((i * 7 + d * 13) % 19 - 9) / 10.0 for d in range(6)]
           for i in range(40)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=row) for i, row in enumerate(emb)])
    got = {r["d"]: r["v_e6"] for r in
           sim.power_iteration_top(df, dim=6, iters=2).collect()}
    want = _mirror_power(emb, 6, 2)
    assert got == {d: want[d] for d in range(6)}


def test_power_iteration_rank_one_recovers_direction(spark):
    # rows all proportional to w: one iteration aligns v with w
    w = [0.8, -0.4, 0.2, 0.1]
    emb = [[c * wj for wj in w] for c in (1.0, 2.0, 0.5, 1.5)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=row) for i, row in enumerate(emb)])
    got = [r["v_e6"] for r in sim.power_iteration_top(df, dim=4, iters=1)
           .orderBy("d").collect()]
    assert got[0] == 1_000_000  # max component
    # proportions match w up to integer rounding
    assert abs(got[1] / got[0] - (-0.5)) < 0.01
    assert abs(got[2] / got[0] - 0.25) < 0.01
