"""Bucketed co-located joins (sources/bucketed.py): both sides written
bucketBy(doc_id) → the equi-join plans with ZERO Exchange (each task zips
bucket i of both tables), vs the unbucketed plan which shuffles both
sides. The 'pay the shuffle once at layout time' story for repeat-join
keys at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from plateau_gis_converter_spark.sources import bucketed as bk


def test_bucketed_join_is_exchange_free(spark):
    # (managed tables land in the session's default spark-warehouse/,
    # gitignored; dropped in the finally)
    # big⋈big shape: disable broadcast so the exchange question is real
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97).alias("fp"))
        labels = spark.range(0, 5000, 3).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("component_id"))

        # unbucketed baseline: the same join shuffles both sides
        plan = (docs.join(labels, "doc_id")._jdf.queryExecution()
                .executedPlan().toString())
        assert "Exchange hashpartitioning" in plan

        bk.write_bucketed(docs, "docs_b", "doc_id", n_buckets=8,
                          sort_by="doc_id")
        bk.write_bucketed(labels, "labels_b", "doc_id", n_buckets=8,
                          sort_by="doc_id")
        a = bk.read_table(spark, "docs_b")
        b = bk.read_table(spark, "labels_b")
        assert bk.is_exchange_free_join(a, b, "doc_id")

        # and the join is still correct
        got = (a.join(b, "doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("component_id").alias("s")).collect()[0])
        exp = (docs.join(labels, "doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("component_id").alias("s")).collect()[0])
        assert (got["n"], got["s"]) == (exp["n"], exp["s"])
        assert got["n"] == labels.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS labels_b")
