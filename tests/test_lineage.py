"""Lineage checkpoint + resume semantics (north_rule resumability).

The sink closure now runs on EXECUTORS (applyInPandas), so the test
observes writes through the filesystem (executor-visible in local mode),
not a driver-side dict.
"""
import json
import os

from plateau_gis_converter_spark.plans.lineage import (LineageLog,
                                                       run_stage_partitioned)


def _written(out_dir) -> dict[str, int]:
    """{key: total rows written across all sink invocations}."""
    out = {}
    for name in os.listdir(out_dir):
        key, _, _ = name.partition("__")
        with open(os.path.join(out_dir, name)) as f:
            out[key] = out.get(key, 0) + int(f.read())
    return out


def test_resume_skips_completed_partitions(spark, tmp_path):
    df = spark.range(0, 100).selectExpr("id", "CAST(id % 5 AS STRING) AS k")
    lin = LineageLog(spark, str(tmp_path), run_id="r1")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    def sink(key, pdf):
        # one file per (key, invocation): executor-side, idempotent naming
        n_prev = len([f for f in os.listdir(out_dir)
                      if f.startswith(f"{key}__")])
        with open(os.path.join(out_dir, f"{key}__{n_prev}"), "w") as f:
            f.write(str(len(pdf)))
        return len(pdf) * 8

    n1 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n1 == 5
    assert sum(_written(out_dir).values()) == 100

    # second run: everything already committed -> nothing reprocessed
    n2 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n2 == 0
    assert sum(_written(out_dir).values()) == 100

    # simulate a partial failure: drop two partitions from the log
    path = tmp_path / "_lineage" / "stage_a.jsonl"
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    keep = [r for r in recs if r["partition_key"] not in ("0", "3")]
    path.write_text("\n".join(json.dumps(r) for r in keep) + "\n")

    n3 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n3 == 2  # only the missing partitions re-ran
    w = _written(out_dir)
    assert w["0"] == 40 and w["3"] == 40  # re-processed once more
    assert w["1"] == 20 and w["2"] == 20 and w["4"] == 20

    m = lin.metrics_df().toPandas()
    assert (m["stage"] == "stage_a").all()
    assert m["rows_out"].sum() >= 100


def test_web_pipeline_end_to_end_and_resume(spark, tmp_path):
    """The composed north-star job (plans/web_pipeline.py): pages →
    geocode → broadcast-PIP join → lineage-checkpointed per-ward parquet →
    tile assignment → per-tile parquet. A rerun with the same run_id
    commits ZERO new keys (full resume), and output row counts equal the
    direct computation."""
    import glob
    import os

    import pyarrow.parquet as pq

    from plateau_gis_converter_spark.operators import geocode as gc
    from plateau_gis_converter_spark.operators import spatial_join as sj
    from plateau_gis_converter_spark.plans import web_pipeline as wp
    from plateau_gis_converter_spark.sources import fixtures as fx

    pages_path = str(tmp_path / "pages.parquet")
    fx.write_pages_parquet(pages_path, 2000)
    pages = spark.read.parquet(pages_path)
    out_root = str(tmp_path / "out")

    committed = wp.run_web_pipeline(spark, pages, out_root, run_id="r1")
    assert committed["ward_rows"] == 23          # every ward populated
    assert committed["tile_rows"] > 0

    # output parity with the direct plan
    joined_n = (sj.spatial_join_points(
        spark, gc.geocode_expr(pages), fx.tessellation_records()).count())
    ward_files = glob.glob(os.path.join(out_root, "ward_rows", "*.parquet"))
    assert len(ward_files) == 23
    assert sum(pq.read_table(f).num_rows for f in ward_files) == joined_n
    tile_files = glob.glob(os.path.join(out_root, "tile_rows", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in tile_files) == joined_n

    # full resume: nothing to do on the second invocation
    committed2 = wp.run_web_pipeline(spark, pages, out_root, run_id="r1")
    assert committed2 == {"ward_rows": 0, "tile_rows": 0}
