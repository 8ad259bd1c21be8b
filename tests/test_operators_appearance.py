"""T3/J1 appearance pipeline — ports the reference's behavior cases:
theme preference (appearance.rs:16-21), span->material painting (:26-40),
ring texture validity + dummy UVs (:42-95), no-theme nulls (:97-113)."""
import pytest
from pyspark.sql import types as T

from plateau_gis_converter_spark.operators import appearance as ap


@pytest.fixture(scope="module")
def tables(spark):
    polys = spark.createDataFrame(
        [("e1", i) for i in range(4)] + [("e2", 0)],
        ["entity_id", "poly_idx"])
    # e1: rings for polys 0..3; poly 0 has an interior ring
    rings = spark.createDataFrame(
        [("e1", 0, 0, 10, 4), ("e1", 0, 1, 11, 4),
         ("e1", 1, 0, 12, 3), ("e1", 2, 0, None, 4), ("e1", 3, 0, 13, 4),
         ("e2", 0, 0, 20, 4)],
        T.StructType([
            T.StructField("entity_id", T.StringType()),
            T.StructField("poly_idx", T.IntegerType()),
            T.StructField("ring_idx", T.IntegerType()),
            T.StructField("ring_id", T.IntegerType(), True),
            T.StructField("ring_len", T.IntegerType()),
        ]))
    spans = spark.createDataFrame(
        [("e1", 0, 100, 0, 2),   # surface 100 paints polys 0,1
         ("e1", 1, 101, 2, 3),   # surface 101 paints poly 2
         ("e1", 2, 102, 1, 2)],  # later span overlaps poly 1 -> wins
        ["entity_id", "span_idx", "surface_id", "start", "end"])
    themes = spark.createDataFrame(
        [("e1", "FMETheme"), ("e1", "rgbTexture")],  # e2: no theme rows
        ["entity_id", "theme_name"])
    s2m = spark.createDataFrame(
        [("e1", "rgbTexture", 100, 0), ("e1", "rgbTexture", 101, 1),
         ("e1", "rgbTexture", 102, 2),
         ("e1", "FMETheme", 100, 7)],  # must NOT be used (rgbTexture wins)
        ["entity_id", "theme_name", "surface_id", "material_idx"])
    r2t = spark.createDataFrame(
        [("e1", "rgbTexture", 10, 5,
          [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),   # valid (len 4)
         ("e1", "rgbTexture", 12, 6, [[0.0, 0.0], [1.0, 0.0]]),  # bad len
         ("e1", "FMETheme", 13, 9,
          [[0.5, 0.5], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])],  # wrong theme
        T.StructType([
            T.StructField("entity_id", T.StringType()),
            T.StructField("theme_name", T.StringType()),
            T.StructField("ring_id", T.IntegerType()),
            T.StructField("texture_idx", T.IntegerType()),
            T.StructField("uv", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]))
    return polys, rings, spans, themes, s2m, r2t


def test_theme_resolution_prefers_rgb_texture(spark, tables):
    _, _, _, themes, _, _ = tables
    got = {r["entity_id"]: r["theme"]
           for r in ap.resolve_theme(themes).collect()}
    assert got == {"e1": "rgbTexture"}
    only_fme = spark.createDataFrame([("e3", "FMETheme")],
                                     ["entity_id", "theme_name"])
    assert ap.resolve_theme(only_fme).collect()[0]["theme"] == "FMETheme"
    other = spark.createDataFrame([("e4", "otherTheme")],
                                  ["entity_id", "theme_name"])
    assert ap.resolve_theme(other).collect()[0]["theme"] is None


def test_apply_appearance_materials_and_textures(spark, tables):
    polys, rings, spans, themes, s2m, r2t = tables
    out_polys, ring_tex = ap.apply_appearance(polys, rings, spans, themes,
                                              s2m, r2t)
    mats = {(r["entity_id"], r["poly_idx"]): r["material_idx"]
            for r in out_polys.collect()}
    # span painting over [start, end); later span (idx 2, surface 102) wins
    # the overlap on poly 1 (the reference writes spans in order)
    assert mats[("e1", 0)] == 0
    assert mats[("e1", 1)] == 2
    assert mats[("e1", 2)] == 1
    assert mats[("e1", 3)] is None
    assert mats[("e2", 0)] is None  # no theme -> all None

    tex = {(r["entity_id"], r["poly_idx"], r["ring_idx"]): r
           for r in ring_tex.collect()}
    ok = tex[("e1", 0, 0)]
    assert ok["texture_idx"] == 5 and ok["uv_valid"]
    assert len(ok["uv"]) == 5 and ok["uv"][0] == ok["uv"][-1]  # closed
    # interior ring without texture -> dummy zeros, len+1
    hole = tex[("e1", 0, 1)]
    assert hole["texture_idx"] is None and not hole["uv_valid"]
    assert len(hole["uv"]) == 5 and all(p == [0.0, 0.0] for p in hole["uv"])
    # UV length mismatch -> treated as missing (appearance.rs:75-82)
    bad = tex[("e1", 1, 0)]
    assert bad["texture_idx"] is None and len(bad["uv"]) == 4
    # entry under the NOT-chosen theme is ignored
    assert tex[("e1", 3, 0)]["texture_idx"] is None
    # null ring_id -> dummy
    assert tex[("e1", 2, 0)]["texture_idx"] is None
    # per-poly texture = exterior ring's
    ptex = {(r["entity_id"], r["poly_idx"]): r["texture_idx"]
            for r in out_polys.collect()}
    assert ptex[("e1", 0)] == 5 and ptex[("e1", 1)] is None


def test_empty_span_paints_nothing(spark, tables):
    """ADVICE r2 #1: a span with start == end covers [start, start) — zero
    polygons. Spark's sequence(start, start-1) counts DOWN, so an unguarded
    explode would paint polys start and start-1; the reference
    (appearance.rs paints [start, end)) leaves them untouched."""
    polys, _, _, themes, s2m, _ = tables
    spans = spark.createDataFrame(
        [("e1", 0, 100, 2, 2)],  # empty span at poly 2
        ["entity_id", "span_idx", "surface_id", "start", "end"])
    resolved = ap.resolve_theme(themes)
    out = ap.polygon_materials(polys, spans, s2m, resolved)
    mats = {(r["entity_id"], r["poly_idx"]): r["material_idx"]
            for r in out.collect()}
    assert all(v is None for v in mats.values()), mats


def test_appearance_dimension_joins_are_broadcast(spark, tables):
    """The theme-dimension joins (resolved theme, s2m, r2t) must be
    broadcast hash joins — the geometry side never shuffles for them. The
    final polys<->materials join keys on the geometry key itself, where a
    shuffle join is the correct plan at scale."""
    polys, rings, spans, themes, s2m, r2t = tables
    resolved = ap.resolve_theme(themes)
    ring_tex = ap.ring_textures(rings, r2t, resolved)
    plan = ring_tex._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    mats_plan = (ap.polygon_materials(polys, spans, s2m, resolved)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in mats_plan
