"""Units for operators/incremental.py, operators/cms.py, and
cardinality.hll_registers_grouped — the mergeable-sketch and
incremental-ingest layer."""
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def toks(spark, docs):
    return docs.select(F.explode(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9_]+"),
                 lambda t: t != "")).alias("tok")).persist()


def test_cms_never_undercounts(spark, toks):
    from plateau_gis_converter_spark.operators import cms

    regs = cms.cms_registers(toks, "tok", depth=4, width=256).persist()
    exact = toks.groupBy(F.col("tok").alias("key")) \
        .agg(F.count(F.lit(1)).alias("exact"))
    keys = exact.select(F.col("key").alias("tok"))
    est = cms.cms_estimate(regs, keys, "tok", depth=4, width=256)
    bad = est.join(exact, "key").where(F.col("est") < F.col("exact")).count()
    assert bad == 0  # CMS guarantee: estimate >= true count, always
    # and the total register mass per row is exactly the stream length
    n = toks.count()
    per_row = regs.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert len(per_row) == 4 and all(r["m"] == n for r in per_row)


def test_cms_merge_is_union(spark, toks):
    from plateau_gis_converter_spark.operators import cms

    a = toks.where(F.crc32("tok") % 2 == 0)
    b = toks.where(F.crc32("tok") % 2 == 1)
    merged = cms.cms_merge(cms.cms_registers(a, "tok"),
                           cms.cms_registers(b, "tok"))
    whole = cms.cms_registers(toks, "tok")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_weighted_equals_expanded(spark):
    from plateau_gis_converter_spark.operators import cms

    rows = [("a", 3), ("b", 1), ("c", 5), ("a", 2)]
    wdf = spark.createDataFrame(rows, "k string, w int")
    expanded = spark.createDataFrame(
        [(k,) for k, w in rows for _ in range(w)], "k string")
    wr = cms.cms_registers(wdf, "k", depth=3, width=16, weight_col="w")
    er = cms.cms_registers(expanded, "k", depth=3, width=16)
    assert wr.exceptAll(er).count() == 0 and er.exceptAll(wr).count() == 0


def test_cms_rejects_bad_shape(spark, toks):
    from plateau_gis_converter_spark.operators import cms

    with pytest.raises(ValueError):
        cms.cms_registers(toks, "tok", depth=0)
    with pytest.raises(ValueError):
        cms.cms_registers(toks, "tok", width=1)


def test_cms_inner_product_never_undercounts(spark, docs):
    from plateau_gis_converter_spark.operators import cms

    a = docs.select((F.col("doc_id") % 97).alias("k"))
    b = docs.where(F.col("doc_id") % 3 == 0) \
        .select((F.col("doc_id") % 61).alias("k"))
    exact = a.join(b, "k").count()
    est = cms.cms_inner_product(
        cms.cms_registers(a, "k", depth=4, width=512),
        cms.cms_registers(b, "k", depth=4, width=512),
        depth=4).collect()[0]["est_join_size"]
    assert est >= exact  # collisions only ADD; min never undercounts


def test_cms_inner_product_exact_when_collision_free(spark):
    from plateau_gis_converter_spark.operators import cms

    # few distinct keys vs a wide sketch: w=4096 >> 8 keys makes a hash
    # collision inside any register row overwhelmingly unlikely, so every
    # row's dot product IS the true inner product and the min is exact.
    a = spark.createDataFrame(
        [(k,) for k in range(8) for _ in range(k + 1)], "k int")
    b = spark.createDataFrame(
        [(k,) for k in range(0, 8, 2) for _ in range(3)], "k int")
    exact = a.join(b, "k").count()
    est = cms.cms_inner_product(
        cms.cms_registers(a, "k", depth=4, width=4096),
        cms.cms_registers(b, "k", depth=4, width=4096),
        depth=4).collect()[0]["est_join_size"]
    assert est == exact


def test_cms_inner_product_disjoint_is_zero(spark):
    from plateau_gis_converter_spark.operators import cms

    a = spark.createDataFrame([(k,) for k in range(4)], "k int")
    b = spark.createDataFrame([(k,) for k in range(1000, 1004)], "k int")
    est = cms.cms_inner_product(
        cms.cms_registers(a, "k", depth=4, width=4096),
        cms.cms_registers(b, "k", depth=4, width=4096),
        depth=4).collect()[0]["est_join_size"]
    # disjoint keys in a wide sketch: some register row has no shared
    # filled bucket -> per-row sum 0 (or the row is absent entirely,
    # handled by the count < depth guard) -> estimate 0
    assert est == 0


# ---------------------------------------------------------------------------
# grouped HLL
# ---------------------------------------------------------------------------

def test_grouped_hll_matches_per_group_sketches(spark):
    from plateau_gis_converter_spark.operators import cardinality as cd

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    grouped = cd.hll_registers_grouped(ev, "user_id", ["event_type"], p=8)
    for et in [r["event_type"] for r in
               ev.select("event_type").distinct().collect()]:
        solo = cd.hll_registers(ev.where(F.col("event_type") == et),
                                "user_id", p=8)
        sub = grouped.where(F.col("event_type") == et).select("bucket", "r")
        assert sub.exceptAll(solo).count() == 0
        assert solo.exceptAll(sub).count() == 0


def test_grouped_hll_estimate_close_and_mergeable(spark):
    from plateau_gis_converter_spark.operators import cardinality as cd

    # persist is scoped to this test: a leaked cache entry on the raw
    # events relation rewrites LATER tests' plans through the cache (the
    # scan-pruning audits in test_plans.py then see the full-column
    # cached scan) — hence the try/finally unpersist below
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").persist()
    try:
        grouped = cd.hll_registers_grouped(ev, "user_id", ["event_type"], p=8)
        exact = {r["event_type"]: r["d"] for r in
                 ev.groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("d")).collect()}
        regs: dict[str, list[tuple[int, int]]] = {}
        for row in grouped.collect():
            regs.setdefault(row["event_type"], []).append(
                (row["bucket"], row["r"]))
        for et, d in exact.items():
            est = cd.hll_estimate(regs[et], p=8)
            assert abs(est - d) <= max(3.0, 0.15 * d), (et, est, d)
        # merge across two halves = elementwise max
        a = cd.hll_registers_grouped(ev.where(F.col("event_id") % 2 == 0),
                                     "user_id", ["event_type"], p=8)
        b = cd.hll_registers_grouped(ev.where(F.col("event_id") % 2 == 1),
                                     "user_id", ["event_type"], p=8)
        merged = (a.unionAll(b).groupBy("event_type", "bucket")
                  .agg(F.max("r").alias("r")))
        assert merged.exceptAll(grouped).count() == 0
        assert grouped.exceptAll(merged).count() == 0
    finally:
        ev.unpersist()


def test_grouped_hll_validates(spark):
    from plateau_gis_converter_spark.operators import cardinality as cd

    ev = spark.range(5)
    with pytest.raises(ValueError):
        cd.hll_registers_grouped(ev, "id", [], p=8)
    with pytest.raises(ValueError):
        cd.hll_registers_grouped(ev, "id", ["id"], p=3)


# ---------------------------------------------------------------------------
# incremental LSH dedup
# ---------------------------------------------------------------------------

def _snapshots(docs):
    did = F.col("doc_id")
    unchanged = docs.where((did % 17 != 0) & (did % 13 != 0))
    changed = (docs.where((did % 17 != 0) & (did % 13 == 0))
               .select("doc_id",
                       F.concat(F.col("text"), F.lit(" v2")).alias("text")))
    added = (docs.where(did % 19 == 0)
             .select((did + 1000000).alias("doc_id"), "text"))
    return unchanged, changed.unionAll(added)


def test_incremental_equals_full_recompute_restricted(spark, docs):
    from plateau_gis_converter_spark.operators import dedup as dd
    from plateau_gis_converter_spark.operators import incremental as inc

    unchanged, new_docs = _snapshots(docs)
    idx = dd.lsh_buckets(unchanged)
    got = inc.incremental_dedup_pairs(idx, unchanged, new_docs,
                                      threshold=0.5) \
        .select("doc_a", "doc_b").persist()
    assert got.count() > 0  # the fixture must actually exercise pairs

    full = dd.minhash_dedup_pairs(unchanged.unionAll(new_docs),
                                  threshold=0.5)
    new_ids = new_docs.select("doc_id")
    want = (full
            .join(new_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a",
                  "left_semi")
            .unionAll(full.join(
                new_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b",
                "left_semi").select("doc_a", "doc_b", "jaccard"))
            .select("doc_a", "doc_b").distinct())
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # both cross (new-vs-old) and intra-new pairs must occur
    crosses = got.join(new_ids.withColumnRenamed("doc_id", "doc_a"),
                       "doc_a", "left_anti").count()
    intra = (got.join(new_ids.withColumnRenamed("doc_id", "doc_a"),
                      "doc_a", "left_semi")
             .join(new_ids.withColumnRenamed("doc_id", "doc_b"),
                   "doc_b", "left_semi").count())
    assert crosses > 0 and intra > 0


def test_lsh_index_roundtrip(spark, docs, tmp_path):
    from plateau_gis_converter_spark.operators import dedup as dd
    from plateau_gis_converter_spark.operators import incremental as inc

    unchanged, new_docs = _snapshots(docs)
    path = str(tmp_path / "lsh_index")
    inc.write_lsh_index(unchanged, path)
    # partitioned by band -> probing one band reads one directory
    assert sorted(d for d in os.listdir(path) if d.startswith("band=")) == \
        [f"band={b}" for b in range(4)]
    idx = inc.read_lsh_index(spark, path)
    live = dd.lsh_buckets(unchanged)
    assert idx.exceptAll(live).count() == 0
    assert live.exceptAll(idx).count() == 0
    via_disk = inc.incremental_dedup_pairs(idx, unchanged, new_docs) \
        .select("doc_a", "doc_b")
    via_mem = inc.incremental_dedup_pairs(live, unchanged, new_docs) \
        .select("doc_a", "doc_b")
    assert via_disk.exceptAll(via_mem).count() == 0
    assert via_mem.exceptAll(via_disk).count() == 0


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs or [(0, 0)],
                                 "doc_a long, doc_b long") \
        .where(F.lit(bool(pairs)))


def test_incremental_cc_bridge_removal_splits_cluster(spark):
    """Removing a bridge doc must SPLIT its old component — the case a
    naive merge-only incremental CC gets wrong."""
    from plateau_gis_converter_spark.operators import graph as gr
    from plateau_gis_converter_spark.operators import incremental as inc

    prev_pairs = _pairs_df(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    prev_labels = gr.connected_components(prev_pairs)
    stale = spark.createDataFrame([(2,)], "doc_id long")
    new_pairs = _pairs_df(spark, [(3, 30)])
    got = inc.incremental_connected_components(
        prev_labels, prev_pairs, stale, new_pairs)
    res = {r["id"]: r["component_id"] for r in got.collect()}
    # doc 2 gone; doc 1 lost all pairs -> absent; {3,30} is a new cluster
    assert res == {3: 3, 30: 3, 10: 10, 11: 10, 20: 20, 21: 20}


def test_incremental_cc_removal_only_delta(spark):
    from plateau_gis_converter_spark.operators import graph as gr
    from plateau_gis_converter_spark.operators import incremental as inc

    prev_pairs = _pairs_df(spark, [(1, 2), (2, 3), (10, 11)])
    prev_labels = gr.connected_components(prev_pairs)
    stale = spark.createDataFrame([(3,)], "doc_id long")
    new_pairs = _pairs_df(spark, [])
    got = inc.incremental_connected_components(
        prev_labels, prev_pairs, stale, new_pairs)
    res = {r["id"]: r["component_id"] for r in got.collect()}
    assert res == {1: 1, 2: 1, 10: 10, 11: 10}


def test_incremental_cc_merges_two_clean_clusters(spark):
    """A new doc bridging two previously-separate components must merge
    them under the global min id."""
    from plateau_gis_converter_spark.operators import graph as gr
    from plateau_gis_converter_spark.operators import incremental as inc

    prev_pairs = _pairs_df(spark, [(5, 6), (10, 11), (20, 21)])
    prev_labels = gr.connected_components(prev_pairs)
    stale = spark.createDataFrame([(0,)], "doc_id long").where(F.lit(False))
    new_pairs = _pairs_df(spark, [(6, 100), (100, 10)])
    got = inc.incremental_connected_components(
        prev_labels, prev_pairs, stale, new_pairs)
    res = {r["id"]: r["component_id"] for r in got.collect()}
    assert res == {5: 5, 6: 5, 10: 5, 11: 5, 100: 5, 20: 20, 21: 20}


def test_incremental_keep_list_equals_full(spark, docs):
    """The incremental curation chain end-to-end: delta-routed pairs ->
    incremental CC -> keep-list equals the from-scratch keep-list over
    the new snapshot — so a recurring crawl's deduplicated corpus can be
    maintained without ever re-clustering clean components."""
    from plateau_gis_converter_spark.operators import dedup as dd
    from plateau_gis_converter_spark.operators import graph as gr
    from plateau_gis_converter_spark.operators import incremental as inc

    did = F.col("doc_id")
    unchanged, new_docs = _snapshots(docs)
    new_corpus = unchanged.unionAll(new_docs)
    stale = docs.where((did % 17 == 0) | (did % 13 == 0)).select("doc_id")

    prev_pairs = dd.minhash_dedup_pairs(docs, threshold=0.5) \
        .select("doc_a", "doc_b").persist()
    prev_labels = gr.connected_components(prev_pairs).persist()
    new_pairs = inc.incremental_dedup_pairs(
        dd.lsh_buckets(unchanged), unchanged, new_docs,
        threshold=0.5).select("doc_a", "doc_b")
    inc_labels = inc.incremental_connected_components(
        prev_labels, prev_pairs, stale, new_pairs)
    got = dd.dedup_keep_list(new_corpus, inc_labels)

    full_labels = gr.connected_components(
        dd.minhash_dedup_pairs(new_corpus, threshold=0.5)
        .select("doc_a", "doc_b"))
    want = dd.dedup_keep_list(new_corpus, full_labels)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
