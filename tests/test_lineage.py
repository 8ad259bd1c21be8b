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
