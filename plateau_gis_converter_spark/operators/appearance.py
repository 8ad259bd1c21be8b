"""T3 ApplyAppearanceTransform + J1 appearance-theme lookup as relational ops.

Reference semantics:

* theme resolution — prefer the "rgbTexture" theme, else "FMETheme", else
  no appearance (nusamai/src/transformer/transform/appearance.rs:16-21).
* materials — each SurfaceSpan (id, start, end) paints material_idx over
  polygon indices [start, end) of the entity's multipolygon
  (appearance.rs:26-40; span list order wins on overlap).
* textures — per ring: the theme's ring_id->texture entry applies iff the
  UV ring length equals the geometry ring length; otherwise (missing or
  mismatched) a dummy closed UV ring of (0,0) x (len+1) is used and the
  texture slot stays empty; a polygon's texture is its EXTERIOR ring's
  texture (appearance.rs:42-95). UV rings are emitted closed
  (iter_closed: first vertex repeated).
* no theme — all materials/textures None, dummy UVs (appearance.rs:97-113).

Relational model (the reference's AppearanceStore HashMaps become
broadcastable dimension tables; its merge_global local->global index remap,
nusamai-plateau/src/appearance.rs:119-185, is unnecessary here because
texture/material ids are globally keyed from the start):

  rings : (entity_id, poly_idx, ring_idx, ring_id?, ring_len)
  spans : (entity_id, span_idx, surface_id, start, end)
  themes: (entity_id, theme_name)
  s2m   : (entity_id, theme_name, surface_id, material_idx)
  r2t   : (entity_id, theme_name, ring_id, texture_idx,
           uv: array<array<double>>)

Every join keys on the small appearance dimension -> broadcast hash joins,
no shuffle of the geometry side beyond its own partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THEME_PRIORITY = {"rgbTexture": 2, "FMETheme": 1}


def resolve_theme(themes: DataFrame) -> DataFrame:
    """J1: per-entity theme choice — rgbTexture else FMETheme else none
    (appearance.rs:16-21). Output (entity_id, theme)."""
    pri = (F.when(F.col("theme_name") == "rgbTexture", F.lit(2))
           .when(F.col("theme_name") == "FMETheme", F.lit(1))
           .otherwise(F.lit(0)))
    best = (themes
            .groupBy("entity_id")
            .agg(F.max(F.struct(pri.alias("p"),
                                F.col("theme_name").alias("n"))).alias("b")))
    return best.select(
        "entity_id",
        F.when(F.col("b.p") > 0, F.col("b.n")).alias("theme"))


def polygon_materials(polys: DataFrame, spans: DataFrame, s2m: DataFrame,
                      resolved: DataFrame) -> DataFrame:
    """Materialize polygon_materials: polys (entity_id, poly_idx) gain a
    nullable material_idx (appearance.rs:26-40). Later spans win on overlap
    (the reference writes spans in order into the vec)."""
    # Empty spans (start == end) must paint NOTHING: the reference iterates
    # [start, end), but Spark's sequence(start, start-1) counts DOWN and
    # would paint two polygons — pre-filter them out.
    exploded = (spans.where(F.col("end") > F.col("start"))
                .withColumn(
        "poly_idx", F.explode(F.sequence(F.col("start"),
                                         F.col("end") - F.lit(1)))))
    hit = (exploded
           .join(F.broadcast(resolved), "entity_id")
           .join(F.broadcast(s2m),
                 (exploded["entity_id"] == s2m["entity_id"])
                 & (F.col("theme") == s2m["theme_name"])
                 & (exploded["surface_id"] == s2m["surface_id"]))
           .select(exploded["entity_id"], "poly_idx", "span_idx",
                   "material_idx"))
    last = (hit.groupBy("entity_id", "poly_idx")
            .agg(F.max(F.struct(F.col("span_idx"),
                                F.col("material_idx"))).alias("w"))
            .select("entity_id", "poly_idx",
                    F.col("w.material_idx").alias("material_idx")))
    return polys.join(last, ["entity_id", "poly_idx"], "left")


def ring_textures(rings: DataFrame, r2t: DataFrame,
                  resolved: DataFrame) -> DataFrame:
    """Materialize per-ring textures + UVs (appearance.rs:42-95).

    Output adds: texture_idx (nullable), uv (closed ring; dummy zeros when
    missing/mismatched), uv_valid (bool)."""
    r2 = (r2t.withColumnRenamed("entity_id", "_e")
          .withColumnRenamed("theme_name", "_t")
          .withColumnRenamed("ring_id", "r2t_ring_id"))
    joined = (rings
              .join(F.broadcast(resolved), "entity_id", "left")
              .join(F.broadcast(r2),
                    (F.col("entity_id") == F.col("_e"))
                    & (F.col("theme") == F.col("_t"))
                    & (F.col("ring_id") == F.col("r2t_ring_id")), "left"))
    valid = (F.col("texture_idx").isNotNull()
             & (F.size(F.col("uv")) == F.col("ring_len")))
    closed_uv = F.concat(F.col("uv"), F.slice(F.col("uv"), 1, 1))
    dummy_uv = F.array_repeat(F.array(F.lit(0.0), F.lit(0.0)),
                              F.col("ring_len") + F.lit(1))
    return (joined
            .withColumn("uv_valid", F.coalesce(valid, F.lit(False)))
            .withColumn("uv", F.when(F.col("uv_valid"), closed_uv)
                        .otherwise(dummy_uv))
            .withColumn("texture_idx",
                        F.when(F.col("uv_valid"), F.col("texture_idx")))
            .drop("_e", "_t", "r2t_ring_id", "theme"))


def polygon_textures(ring_tex: DataFrame) -> DataFrame:
    """A polygon's texture slot = its exterior ring's texture
    (appearance.rs:66-72: poly_textures pushed only for ring i == 0)."""
    return (ring_tex.where(F.col("ring_idx") == 0)
            .select("entity_id", "poly_idx", "texture_idx"))


def apply_appearance(polys: DataFrame, rings: DataFrame, spans: DataFrame,
                     themes: DataFrame, s2m: DataFrame,
                     r2t: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The full T3: returns (polygons with material_idx + texture_idx,
    rings with texture_idx/uv/uv_valid)."""
    resolved = resolve_theme(themes)
    ring_tex = ring_textures(rings, r2t, resolved)
    mats = polygon_materials(polys, spans, s2m, resolved)
    out_polys = mats.join(polygon_textures(ring_tex),
                          ["entity_id", "poly_idx"], "left")
    return out_polys, ring_tex
