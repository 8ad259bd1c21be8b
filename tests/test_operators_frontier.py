"""Crawl-frontier politeness scheduler invariants."""
import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import frontier

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fr(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://"), "source", F.lit("/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("host"),
        F.col("n_chars").alias("pr"))


def test_schedule_invariants(fr):
    sched = frontier.politeness_schedule(
        fr, n_fetchers=8, delay_s=5, priority_col="pr").persist()
    n = fr.count()
    assert sched.count() == n
    # per-host seqs are exactly 0..k-1 (contiguous, no dups)
    per_host = (sched.groupBy("host")
                .agg(F.count(F.lit(1)).alias("k"),
                     F.min("seq").alias("mn"), F.max("seq").alias("mx"),
                     F.countDistinct("seq").alias("d"),
                     F.countDistinct("fetcher").alias("nf"))
                .collect())
    for r in per_host:
        assert r["mn"] == 0 and r["mx"] == r["k"] - 1 and r["d"] == r["k"]
        assert r["nf"] == 1  # a host never splits across fetchers
    # delay law
    assert sched.where(F.col("not_before_s") != F.col("seq") * 5).count() == 0
    # deterministic: replanning yields the identical schedule
    again = frontier.politeness_schedule(
        fr, n_fetchers=8, delay_s=5, priority_col="pr")
    assert sched.exceptAll(again).count() == 0


def test_priority_order_and_budget(spark):
    rows = [("u%02d" % i, "h", 100 - i) for i in range(6)]
    fr = spark.createDataFrame(rows, ["url", "host", "pr"])
    sched = frontier.politeness_schedule(
        fr, n_fetchers=4, delay_s=2, max_per_host=4, priority_col="pr")
    got = [(r["url"], r["seq"], r["not_before_s"])
           for r in sched.orderBy("seq").collect()]
    # highest priority (u00) first; budget drops positions >= 4
    assert got == [("u00", 0, 0), ("u01", 1, 2), ("u02", 2, 4), ("u03", 3, 6)]


def test_fetcher_load(spark):
    rows = [("a%d" % i, "ha", 1) for i in range(3)] + [("b0", "hb", 1)]
    fr = spark.createDataFrame(rows, ["url", "host", "pr"])
    sched = frontier.politeness_schedule(fr, n_fetchers=1, delay_s=10)
    load = frontier.fetcher_load(sched).collect()
    assert len(load) == 1
    r = load[0]
    assert r["n_urls"] == 4 and r["n_hosts"] == 2 and r["makespan_s"] == 20


def test_robots_rfc_semantics(spark):
    """RFC 9309: longest prefix wins; allow beats disallow on ties;
    unmatched -> allowed; empty prefix matches everything."""
    from plateau_gis_converter_spark.operators import robots as rb

    pages = spark.createDataFrame(
        [("h", "/private/x"), ("h", "/private/pub/x"), ("h", "/doc/7"),
         ("h", "/open"), ("g", "/anything"), ("g", "/keep/this")],
        ["host", "path"])
    rules = spark.createDataFrame(
        [("h", False, "/private"), ("h", True, "/private/pub"),
         ("h", True, "/doc/7"), ("h", False, "/doc/7"),
         ("g", False, ""), ("g", True, "/keep")],
        ["host", "allow", "prefix"])
    got = {(r["host"], r["path"]): (r["allowed"], r["rule_len"])
           for r in rb.robots_decisions(pages, rules).collect()}
    assert got[("h", "/private/x")] == (False, 8)
    assert got[("h", "/private/pub/x")] == (True, 12)   # longer allow wins
    assert got[("h", "/doc/7")] == (True, 6)            # tie -> allow
    assert got[("h", "/open")] == (True, -1)            # no rule -> allowed
    assert got[("g", "/anything")] == (False, 0)        # empty disallow-all
    assert got[("g", "/keep/this")] == (True, 5)        # beats empty rule


def test_robots_filter_keeps_columns(spark):
    from plateau_gis_converter_spark.operators import robots as rb

    pages = spark.createDataFrame(
        [("h", "/a", 1), ("h", "/deny/x", 2)],
        ["host", "path", "payload"])
    rules = spark.createDataFrame(
        [("h", False, "/deny")], ["host", "allow", "prefix"])
    out = rb.robots_filter(pages, rules).collect()
    assert [(r["host"], r["path"], r["payload"]) for r in out] == \
        [("h", "/a", 1)]
