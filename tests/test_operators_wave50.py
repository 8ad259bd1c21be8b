"""Round-5 wave 50: A-ES weighted sampling, KS test, weighted quantiles."""
import math

from pyspark.sql import Row

from plateau_gis_converter_spark.operators import sampling as sp
from plateau_gis_converter_spark.operators import stats as st


# -------------------------------------------------------- weighted top-k

def test_aes_sample_exact_size_and_deterministic(spark):
    rows = [Row(g="a", key=i, w=1 + i % 5) for i in range(50)]
    df = spark.createDataFrame(rows)
    s1 = sorted(r["key"] for r in sp.weighted_topk_sample(
        df, "g", "w", "key", k=7).collect())
    s2 = sorted(r["key"] for r in sp.weighted_topk_sample(
        df, "g", "w", "key", k=7).collect())
    assert s1 == s2 and len(s1) == 7


def test_aes_matches_scalar_and_skips_nonpositive(spark):
    import hashlib
    rows = [Row(g="a", key=i, w=(i % 4)) for i in range(30)]
    df = spark.createDataFrame(rows)
    got = {r["key"]: r["sample_rank"] for r in
           sp.weighted_topk_sample(df, "g", "w", "key", k=4).collect()}

    def akey(i, w):
        h = int(hashlib.md5(f"{i}aes0".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / float(1 << 60)) / w

    cand = sorted(((akey(i, i % 4), i) for i in range(30) if i % 4 > 0),
                  key=lambda t: (-t[0], t[1]))
    want = {i: r + 1 for r, (_, i) in enumerate(cand[:4])}
    assert got == want
    assert all(i % 4 > 0 for i in got)  # zero weights never sampled


def test_aes_weight_bias(spark):
    # one heavy key among many light ones: the heavy key should be
    # sampled in (nearly) every salt — check across 20 salts
    hits = 0
    rows = [Row(g="a", key=0, w=10_000)] \
        + [Row(g="a", key=i, w=1) for i in range(1, 40)]
    df = None
    for s in range(20):
        df = sp.weighted_topk_sample(
            spark.createDataFrame(rows), "g", "w", "key", k=3,
            salt=f"s{s}")
        if any(r["key"] == 0 for r in df.collect()):
            hits += 1
    assert hits >= 18


# ----------------------------------------------------------------- KS test

def _sides(spark, a_vals, b_vals):
    return spark.createDataFrame(
        [Row(side="a", v=v) for v in a_vals]
        + [Row(side="b", v=v) for v in b_vals])


def test_ks_identical_accepts_disjoint_rejects(spark):
    same = list(range(100))
    r = st.ks_test(_sides(spark, same, same), "side", "v").collect()[0]
    assert r["d_num"] == 0 and r["reject"] == 0
    r2 = st.ks_test(_sides(spark, list(range(100)),
                           list(range(1000, 1100))),
                    "side", "v").collect()[0]
    assert r2["d_milli"] == 1000 and r2["reject"] == 1


def test_ks_matches_scalar(spark):
    a = [(i * 7) % 40 for i in range(60)]
    b = [(i * 11) % 55 for i in range(45)]
    r = st.ks_test(_sides(spark, a, b), "side", "v").collect()[0]
    grid = sorted(set(a) | set(b))
    dn = max(abs(sum(1 for x in a if x <= v) * len(b)
                 - sum(1 for x in b if x <= v) * len(a)) for v in grid)
    assert r["d_num"] == dn
    d = dn / (len(a) * len(b))
    want = 1 if d > 1.358 * math.sqrt(
        (len(a) + len(b)) / (len(a) * len(b))) else 0
    assert r["reject"] == want


# -------------------------------------------------------- weighted quantiles

def test_weighted_quantiles_vs_unweighted(spark):
    # 9 docs of length 1, one of length 991: unweighted median 1, but
    # the median TOKEN sits in the big doc
    rows = [Row(g="x", v=1, w=1) for _ in range(9)] \
        + [Row(g="x", v=991, w=991)]
    out = {r["q_ppm"]: r["value"] for r in st.weighted_group_quantiles(
        spark.createDataFrame(rows), "g", "v", "w",
        [500_000]).collect()}
    assert out[500_000] == 991


def test_weighted_quantiles_matches_scalar(spark):
    data = [((i * 3) % 7 + 1, (i * 5) % 9 + 1) for i in range(40)]
    rows = [Row(g="k", v=v, w=w) for v, w in data]
    out = {r["q_ppm"]: r["value"] for r in st.weighted_group_quantiles(
        spark.createDataFrame(rows), "g", "v", "w",
        [250_000, 750_000]).collect()}
    tw = sum(w for _, w in data)
    for q in (250_000, 750_000):
        tgt = (q * tw + 999_999) // 1_000_000
        cum = 0
        for v in sorted({v for v, _ in data}):
            cum += sum(w for vv, w in data if vv == v)
            if cum >= tgt:
                assert out[q] == v
                break
