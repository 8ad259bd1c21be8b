"""Unit tests for anchor extraction / link graph (operators/links.py)
and HyperLogLog registers (operators/cardinality.py)."""

import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import cardinality as cd
from plateau_gis_converter_spark.operators import links as lk


def _pages(spark):
    return spark.createDataFrame([
        (0, "https://a.com/p0",
         '<html><a href="https://b.org/x">1</a>'
         "<A HREF='/local' rel=\"nofollow\">2</A>"
         '<a class="c" href="//cdn.net/y">3</a>'
         '<a href="#frag">4</a><a href="mailto:z@q">5</a>'
         '<a href="rel/p">6</a></html>'),
        (1, "http://b.org/p1",
         '<a href="https://a.com/p0">back</a><a href="/x">self</a>'),
        (2, "https://c.io/p2", "<p>no anchors here</p>"),
    ], "id long, url string, html string")


def test_extract_links_resolution_and_drops(spark):
    out = {(r["url"], r["dst_url"], r["nofollow"])
           for r in lk.extract_links(_pages(spark)).collect()}
    assert out == {
        ("https://a.com/p0", "https://b.org/x", False),
        ("https://a.com/p0", "https://a.com/local", True),
        ("https://a.com/p0", "https://cdn.net/y", False),
        ("http://b.org/p1", "https://a.com/p0", False),
        # protocol-relative inherits the SOURCE scheme (http here)
        ("http://b.org/p1", "http://b.org/x", False),
    }


def test_link_edges_feeds_pagerank(spark):
    from plateau_gis_converter_spark.operators import graph

    pages = _pages(spark)
    ids = pages.select("url", F.col("id").alias("id"))
    edges = lk.link_edges(pages, ids)
    got = {(r["src_id"], r["dst_id"]) for r in edges.collect()}
    # only intra-corpus, follow-only, non-self edges survive
    assert got == {(1, 0)}
    nodes = ids.select("id")
    pr = graph.pagerank_int(
        nodes, edges.select(F.col("src_id").alias("src"),
                            F.col("dst_id").alias("dst")), iters=2)
    scores = {r[0]: r[1] for r in pr.collect()}
    assert scores[0] > scores[2]  # linked-to page outranks orphan


def test_extract_links_no_anchor_page_empty(spark):
    one = _pages(spark).where(F.col("id") == 2)
    assert lk.extract_links(one).count() == 0


# ------------------------------------------------------------- cardinality

def test_hll_estimate_accuracy(spark):
    df = spark.range(0, 100_000).selectExpr("cast(id as string) AS v")
    est = cd.approx_distinct(df, "v", p=12)
    # standard error ~1.04/sqrt(4096) = 1.6%; allow 5%
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_registers_mergeable(spark):
    a = cd.hll_registers(
        spark.range(0, 600).selectExpr("cast(id as string) v"), "v", p=8)
    b = cd.hll_registers(
        spark.range(300, 900).selectExpr("cast(id as string) v"), "v", p=8)
    u = cd.hll_registers(
        spark.range(0, 900).selectExpr("cast(id as string) v"), "v", p=8)
    merged = a.unionAll(b).groupBy("bucket").agg(
        F.max("r").cast("bigint").alias("r"))
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, u.collect())))


def test_hll_registers_bounded_and_duplicate_insensitive(spark):
    base = spark.range(0, 5000).selectExpr("cast(id % 100 as string) v")
    regs = cd.hll_registers(base, "v", p=6)
    assert regs.count() <= 64
    once = cd.hll_registers(
        spark.range(0, 100).selectExpr("cast(id as string) v"), "v", p=6)
    assert (sorted(map(tuple, regs.collect()))
            == sorted(map(tuple, once.collect())))


def test_hll_small_range_correction(spark):
    df = spark.range(0, 10).selectExpr("cast(id as string) v")
    est = cd.hll_estimate(
        [(r["bucket"], r["r"])
         for r in cd.hll_registers(df, "v", p=10).collect()], p=10)
    assert abs(est - 10) < 2  # linear counting regime is near-exact


def test_hll_p_validation(spark):
    df = spark.range(0, 10).selectExpr("cast(id as string) v")
    with pytest.raises(ValueError):
        cd.hll_registers(df, "v", p=3)


def test_hll_rollup_equals_direct_sketch(spark):
    """Pyramid rollup of per-tile HLL registers == sketching directly at
    the parent tile (max associativity): group keys floor-divide, r is
    the max over children."""
    from pyspark.sql import functions as F

    from plateau_gis_converter_spark.operators import cardinality as cd

    pts = spark.range(0, 2000).select(
        (F.col("id") % 37).cast("string").alias("u"),
        F.lit(13).cast("int").alias("z"),
        (F.col("id") % 16).cast("bigint").alias("x"),
        ((F.col("id") * 7) % 16).cast("bigint").alias("y"))
    fine = cd.hll_registers_grouped(pts, "u", ["z", "x", "y"], p=8)
    got = cd.hll_rollup_tiles(fine, levels=2)
    direct = cd.hll_registers_grouped(
        pts.select("u", (F.col("z") - 2).alias("z"),
                   F.expr("x div 4").alias("x"),
                   F.expr("y div 4").alias("y")),
        "u", ["z", "x", "y"], p=8)
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0
