"""The composed north-star job: web pages → geocode → spatial join →
tile assignment, with per-partition lineage checkpointing at every stage.

This is the engine's equivalent of the reference's pipeline runner
(nusamai/src/pipeline/runner.rs: Source ⇒ Transformer ⇒ Sink over bounded
channels): one callable that chains the engine's operators into the
production shape, resumable mid-run (north_rule: "every stage checkpoints
per-partition lineage and row/byte metrics ... so the job resumes
mid-run").

Stages:
  1. ``ward_rows``  — geocode + broadcast-PIP spatial join, one output
     partition per ward (parquet, deterministic per-key path, overwrite =
     idempotent per the at-least-once contract in plans/lineage.py).
  2. ``tile_rows``  — z-tile assignment of the joined points, one output
     partition per z12 tile.

Both stages run their sinks DISTRIBUTED (groupBy(key).applyInPandas, one
executor task per key); only O(keys) metadata returns to the driver for
the lineage commit. A re-run with the same run_id anti-joins completed
keys and processes nothing — the e2e test asserts this.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..operators import geocode as gc
from ..operators import spatial_join as sj
from ..operators import tile_assign as ta
from ..sources import fixtures as fx
from .lineage import LineageLog, run_stage_partitioned


def _parquet_sink(out_root: str, stage: str):
    """Idempotent per-key parquet writer (deterministic path, overwrite)."""
    def sink_fn(key: str, pdf) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(out_root, stage, f"{key}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(table, path)
        return os.path.getsize(path)
    return sink_fn


def run_web_pipeline(spark: SparkSession, pages: DataFrame, out_root: str,
                     run_id: str = "run0", tile_zoom: int = 12) -> dict:
    """Run the composed job; returns per-stage key counts committed THIS
    invocation (0s on a fully-resumed rerun)."""
    lineage = LineageLog(spark, out_root, run_id)

    pts = gc.geocode_expr(pages)
    joined = sj.spatial_join_points(spark, pts, fx.tessellation_records())

    committed = {}
    before = {s: len(lineage.completed_partitions(s))
              for s in ("ward_rows", "tile_rows")}

    run_stage_partitioned(
        joined.select("url", "lng_udeg", "lat_udeg", "ward_code"),
        "ward_rows", "ward_code", lineage,
        _parquet_sink(out_root, "ward_rows"))
    committed["ward_rows"] = (len(lineage.completed_partitions("ward_rows"))
                              - before["ward_rows"])

    z = F.lit(tile_zoom)
    mx = geo.mercator_mx(geo.udeg_to_deg(F.col("lng_udeg")))
    my = geo.mercator_my(geo.udeg_to_deg(F.col("lat_udeg")))
    tiles = (joined
             .withColumn("tile_key",
                         F.concat_ws("_", z.cast("string"),
                                     geo.tile_x(z, mx).cast("string"),
                                     geo.tile_y(z, my).cast("string")))
             .select("url", "ward_code", "lng_udeg", "lat_udeg", "tile_key"))
    run_stage_partitioned(
        tiles, "tile_rows", "tile_key", lineage,
        _parquet_sink(out_root, "tile_rows"))
    committed["tile_rows"] = (len(lineage.completed_partitions("tile_rows"))
                              - before["tile_rows"])
    return committed
