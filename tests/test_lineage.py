"""Lineage checkpoint + resume semantics (north_rule resumability)."""
from plateau_gis_converter_spark.plans.lineage import LineageLog, run_stage_partitioned


def test_resume_skips_completed_partitions(spark, tmp_path):
    df = spark.range(0, 100).selectExpr("id", "CAST(id % 5 AS STRING) AS k")
    lin = LineageLog(spark, str(tmp_path), run_id="r1")

    written = {}

    def sink(key, pdf):
        written.setdefault(key, 0)
        written[key] += len(pdf)
        return len(pdf) * 8

    n1 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n1 == 5
    assert sum(written.values()) == 100

    # second run: everything already committed -> nothing reprocessed
    n2 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n2 == 0
    assert sum(written.values()) == 100

    # simulate a partial failure: drop two partitions from the log
    import json
    path = tmp_path / "_lineage" / "stage_a.jsonl"
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    keep = [r for r in recs if r["partition_key"] not in ("0", "3")]
    path.write_text("\n".join(json.dumps(r) for r in keep) + "\n")

    n3 = run_stage_partitioned(df, "stage_a", "k", lin, sink)
    assert n3 == 2  # only the missing partitions re-ran
    assert written["0"] == 40 and written["3"] == 40  # re-processed once more

    m = lin.metrics_df().toPandas()
    assert (m["stage"] == "stage_a").all()
    assert m["rows_out"].sum() >= 100
