"""Round-5 wave 33: anchor-text target profiles, Spearman rank
correlation, sitemap parsing."""
from pyspark.sql import Row

from plateau_gis_converter_spark.operators import frontier as fr
from plateau_gis_converter_spark.operators import links as lk
from plateau_gis_converter_spark.operators import stats as st


# ------------------------------------------------------------ anchor_terms

def test_anchor_terms_aggregate_across_sources(spark):
    pages = spark.createDataFrame([
        Row(url="https://a.com/1",
            html='<a href="https://t.com/x">fast green car</a>'),
        Row(url="https://b.com/2",
            html="<A HREF='https://t.com/x'>Green CAR!</A>"),
        Row(url="https://c.com/3",
            html='<a href="/local">green</a>'
                 '<a href="#f">skip</a><a href="mailto:a@b.c">skip</a>'),
    ])
    out = lk.anchor_term_counts(pages, top_k=2)
    got = {(r["dst_url"], r["term"]): (r["n"], r["rank"])
           for r in out.collect()}
    # top-2 for t.com/x: car=2, green=2 -> tie broken by term asc
    assert got[("https://t.com/x", "car")] == (2, 1)
    assert got[("https://t.com/x", "green")] == (2, 2)
    assert ("https://t.com/x", "fast") not in got  # cut by top_k
    # root-relative resolves against the SOURCE origin
    assert got[("https://c.com/local", "green")] == (1, 1)
    # fragment-only and mailto anchors contribute nothing
    assert not any(d.endswith("#f") or d.startswith("mailto")
                   for d, _ in got)


def test_anchor_terms_tokenizes_punctuation_and_case(spark):
    pages = spark.createDataFrame([
        Row(url="https://a.com/",
            html='<a href="https://t.com/">Wi-Fi 101, wi/fi</a>')])
    got = {r["term"]: r["n"]
           for r in lk.anchor_term_counts(pages, top_k=10).collect()}
    assert got == {"wi": 2, "fi": 2, "101": 1}


# ----------------------------------------------------------- spearman corr

def test_spearman_perfect_monotone_and_reverse(spark):
    rows = [Row(g="k", x=i, y=i * i) for i in range(1, 20)] \
        + [Row(g="r", x=i, y=-3 * i) for i in range(1, 20)]
    out = {r["g"]: r["r_milli"]
           for r in st.spearman_group_corr(
               spark.createDataFrame(rows), "g", "x", "y").collect()}
    assert out == {"k": 1000, "r": -1000}


def test_spearman_tied_values_average_ranks(spark):
    # x = (1, 1, 2), y = (1, 2, 3): doubled ranks x = (3, 3, 6),
    # y = (2, 4, 6) -> r = 18 / sqrt(18 * 24) = 0.8660 -> 866
    rows = [Row(g="k", x=1, y=1), Row(g="k", x=1, y=2),
            Row(g="k", x=2, y=3)]
    r = st.spearman_group_corr(spark.createDataFrame(rows),
                               "g", "x", "y").collect()[0]
    assert (r["n"], r["num"], r["den1"], r["den2"]) == (3, 18, 18, 24)
    assert r["r_milli"] == 866


def test_spearman_constant_side_is_null_and_nulls_drop(spark):
    rows = [Row(g="c", x=5, y=i) for i in range(4)] \
        + [Row(g="n", x=None, y=1), Row(g="n", x=1, y=2),
           Row(g="n", x=2, y=3)]
    out = {r["g"]: r for r in st.spearman_group_corr(
        spark.createDataFrame(rows), "g", "x", "y").collect()}
    assert out["c"]["r_milli"] is None and out["c"]["den1"] == 0
    assert out["n"]["n"] == 2 and out["n"]["r_milli"] == 1000


def test_spearman_matches_scalar_reference(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4]
    rows = [Row(g="k", x=a, y=b) for a, b in zip(xs, ys)]
    r = st.spearman_group_corr(spark.createDataFrame(rows),
                               "g", "x", "y").collect()[0]

    def dranks(vs):
        return [2 * sum(1 for u in vs if u < v)
                + sum(1 for u in vs if u == v) + 1 for v in vs]

    rx, ry = dranks(xs), dranks(ys)
    n = len(xs)
    num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
    d1 = n * sum(a * a for a in rx) - sum(rx) ** 2
    d2 = n * sum(b * b for b in ry) - sum(ry) ** 2
    import math
    want = math.floor(num / math.sqrt(d1 * d2) * 1000 + 0.5)
    assert (r["num"], r["den1"], r["den2"]) == (num, d1, d2)
    assert r["r_milli"] == want


# ---------------------------------------------------------- sitemap parse

_SM = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://ex.com/a </loc>
    <lastmod>2024-03-07</lastmod>
    <priority>0.7</priority>
  </url>
  <URL><LOC>https://ex.com/b</LOC></URL>
  <url><priority>0.9</priority></url>
</urlset>"""


def test_sitemap_entries_fields_defaults_and_malformed(spark):
    df = spark.createDataFrame([Row(sitemap_url="https://ex.com/s.xml",
                                    xml=_SM)])
    got = {r["loc"]: (r["lastmod"], r["priority_pm"])
           for r in fr.sitemap_entries(df).collect()}
    # whitespace-trimmed loc, lastmod kept verbatim, 0.7 -> 700
    assert got["https://ex.com/a"] == ("2024-03-07", 700)
    # case-insensitive tags; absent fields -> NULL lastmod, default 500
    assert got["https://ex.com/b"] == (None, 500)
    # the loc-less block is dropped
    assert len(got) == 2


def test_sitemap_priority_quantization_is_round_half_up(spark):
    xmls = [Row(sitemap_url=f"s{i}",
                xml=f"<url><loc>u{i}</loc><priority>{p}</priority></url>")
            for i, p in enumerate(["0.0", "0.3", "0.55", "1.0"])]
    got = {r["loc"]: r["priority_pm"]
           for r in fr.sitemap_entries(spark.createDataFrame(xmls))
           .collect()}
    assert got == {"u0": 0, "u1": 300, "u2": 550, "u3": 1000}
