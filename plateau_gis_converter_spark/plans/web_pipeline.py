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
                     run_id: str = "run0", tile_zoom: int = 12,
                     feedback=None, sink_factory=None) -> dict:
    """Run the composed job; returns per-stage key counts committed THIS
    invocation (0s on a fully-resumed rerun).

    ``feedback``: optional plans/feedback.PipelineFeedback — tags every
    action with the run's job group (so ``cancel()`` kills in-flight
    stages) and is polled cooperatively between stages; a cancelled run
    raises PipelineCancelled with the lineage log consistent, so a rerun
    with the same run_id resumes exactly where the cancel landed.
    ``sink_factory(out_root, stage) -> sink_fn`` defaults to the
    idempotent per-key parquet writer."""
    from .feedback import PipelineCancelled

    lineage = LineageLog(spark, out_root, run_id)
    make_sink = sink_factory or _parquet_sink
    if feedback is not None:
        feedback.attach()

    def _run_stage(df, stage, key_col):
        if feedback is not None:
            feedback.check()
        try:
            run_stage_partitioned(df, stage, key_col, lineage,
                                  make_sink(out_root, stage))
        except PipelineCancelled:
            raise
        except Exception:
            # a cancelJobGroup kills the in-flight action with a JVM
            # error; surface it as the cooperative exception when the
            # canceller fired (nothing was committed for this stage)
            if feedback is not None and feedback.cancelled:
                raise PipelineCancelled(
                    f"pipeline run {run_id} cancelled during {stage}")
            raise

    pts = gc.geocode_expr(pages)
    joined = sj.spatial_join_points(spark, pts, fx.tessellation_records())

    committed = {}
    before = {s: len(lineage.completed_partitions(s))
              for s in ("ward_rows", "tile_rows")}

    _run_stage(joined.select("url", "lng_udeg", "lat_udeg", "ward_code"),
               "ward_rows", "ward_code")
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
    _run_stage(tiles, "tile_rows", "tile_key")
    committed["tile_rows"] = (len(lineage.completed_partitions("tile_rows"))
                              - before["tile_rows"])
    return committed
