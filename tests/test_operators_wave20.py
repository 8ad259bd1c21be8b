"""Round-5 wave 20: sorted-neighborhood blocking, weighted SSSP,
foreachBatch streaming upsert."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import dedup as dd
from plateau_gis_converter_spark.operators import graph as gr


def test_sorted_neighborhood_matches_window_reference(spark):
    rows = [Row(k=i, b=(i * 37) % 11) for i in range(50)]
    df = spark.createDataFrame(rows)
    got = {(r["key_a"], r["key_b"], r["dist"])
           for r in dd.sorted_neighborhood_pairs(
               df, "k", "b", window=3, num_partitions=7).collect()}
    order = sorted(rows, key=lambda r: (r.b, r.k))
    want = set()
    for i, a in enumerate(order):
        for j in range(1, 3):
            if i + j < len(order):
                want.add((a.k, order[i + j].k, j))
    assert got == want and len(want) == 50 * 2 - 3


def test_sorted_neighborhood_rejects_window_one(spark):
    df = spark.createDataFrame([Row(k=1, b=1)])
    with pytest.raises(ValueError):
        dd.sorted_neighborhood_pairs(df, "k", "b", window=1)


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(src=a, dst=b, w=w) for a, b, w in triples])


def test_sssp_min_over_paths_and_unreachable(spark):
    # 0 -> 1 (w5); 0 -> 2 (w1); 2 -> 1 (w1): min dist(1) = 2 via 2
    # 3 -> 4: unreachable from seed 0
    e = _edges(spark, [(0, 1, 5), (0, 2, 1), (2, 1, 1), (3, 4, 7)])
    seeds = spark.createDataFrame([Row(id=0)])
    out = {r["id"]: r["dist"]
           for r in gr.sssp_from_seeds(seeds, e, max_rounds=10).collect()}
    assert out == {0: 0, 2: 1, 1: 2}


def test_sssp_long_chain_needs_many_rounds(spark):
    e = _edges(spark, [(i, i + 1, 2) for i in range(15)])
    seeds = spark.createDataFrame([Row(id=0)])
    out = {r["id"]: r["dist"]
           for r in gr.sssp_from_seeds(seeds, e, max_rounds=20).collect()}
    assert out[15] == 30 and len(out) == 16


def test_sssp_raises_on_budget_exhaustion(spark):
    e = _edges(spark, [(i, i + 1, 1) for i in range(10)])
    seeds = spark.createDataFrame([Row(id=0)])
    with pytest.raises(RuntimeError):
        gr.sssp_from_seeds(seeds, e, max_rounds=3)


def test_streaming_upsert_multi_batch_and_replay_guard(spark, tmp_path):
    """Three micro-batches upsert sequentially; a replayed batch (same
    batch_id) must be idempotent (version guard reads pre-state only)."""
    import pandas as pd

    from plateau_gis_converter_spark.streaming import pipeline as sp

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, ts timestamp, event_id bigint, event_type string"

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                          "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{src}/{name}")

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true").parquet(src)
        q = (sp.streaming_upsert(stream, state, ["user_id"],
                                 ["ts", "event_id"])
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_batch("b0", [(1, "2026-01-01", 10, "view"),
                       (2, "2026-01-01", 11, "view")])
    run_once()
    write_batch("b1", [(1, "2026-01-02", 12, "purchase"),  # newer -> wins
                       (2, "2025-12-31", 13, "stale"),     # older -> loses
                       (3, "2026-01-01", 14, "view")])     # new key
    run_once()
    got = {(r["user_id"], r["event_id"], r["event_type"])
           for r in sp.read_upsert_state(spark, state).collect()}
    assert got == {(1, 12, "purchase"), (2, 11, "view"), (3, 14, "view")}

    # replay guard: re-delivering batch 1 with the SAME batch_id must
    # reproduce v=1 from v=0 (version guard: prior < batch_id), not merge
    # v=1 into itself — drive the exposed merge closure like the engine
    import os
    merge = sp.upsert_merge_fn(state, ["user_id"], ["ts", "event_id"])
    merge(spark.read.parquet(f"{src}/b1"), 1)
    again = {(r["user_id"], r["event_id"], r["event_type"])
             for r in sp.read_upsert_state(spark, state).collect()}
    assert again == got
    assert sorted(os.listdir(state)) == ["v=0", "v=1"]
