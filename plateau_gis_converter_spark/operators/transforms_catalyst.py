"""Pure-Catalyst variants of the flat-schema transforms (SURVEY §2.2):

* T2 GeometryStatsTransform  (transform/geomstats.rs:13-64)
* T5 FilterLodTransform      (transform/lods.rs:30-93)
* T8 JsonifyTransform        (transform/jsonify.rs:30-77)

The tree-walking implementations in operators/transforms.py remain the
general path for deeply-nested entity trees (T6 flatten / T7 mergedown /
T9 dots need real recursion); but the MVT/GPKG requirement chains operate
on FLAT feature rows — typename, id, a geometries array, scalar attribute
columns — where every one of these three transforms is expressible as
whole-stage-codegen'd Catalyst expressions: no Python worker, no Arrow
hop, vectorized end-to-end. At 100 TB this is the difference between a
map-only JVM stage and a Python-bound pipeline.

Flat schema convention used here:
    geometries: array<struct<type:string, lod:int, pos:bigint, len:bigint>>
    vertices:   array<array<double>>   (x, y, z triples; T2 only)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOD_BITS = 5  # the reference's u8 mask covers lod 0..4 (lods.rs:15-27)


def geometry_stats(df: DataFrame, vertices_col: str = "vertices",
                   max_col: str = "maxHeight",
                   min_col: str = "minHeight") -> DataFrame:
    """T2: add max/min vertex-z double columns (geomstats.rs:25-43).

    array_max/array_min over a projected z array — null when the vertex
    list is empty (the reference skips the attrs then; consumers filter on
    isNotNull to match)."""
    zs = F.transform(F.col(vertices_col), lambda v: v[2])
    return (df.withColumn(max_col, F.array_max(zs))
              .withColumn(min_col, F.array_min(zs)))


def _lod_mask(geoms_col) -> F.Column:
    """u8 LOD bitmask over the geometries array (lods.rs:76-93)."""
    # shiftleft needs a literal shift amount; 2^lod via pow is exact for
    # the 5-bit LOD range
    return F.aggregate(
        geoms_col, F.lit(0),
        lambda acc, g: acc.bitwiseOR(
            F.pow(F.lit(2.0), g["lod"].cast("double")).cast("int")))


def _highest_bit(mask) -> F.Column:
    """Index of the highest set bit in a LOD_BITS-wide mask, -1 if empty."""
    out = F.lit(-1)
    for b in range(LOD_BITS):
        out = F.when(mask.bitwiseAND(F.lit(1 << b)) != 0, F.lit(b)) \
               .otherwise(out)
    return out


def _lowest_bit(mask) -> F.Column:
    out = F.lit(-1)
    for b in range(LOD_BITS - 1, -1, -1):
        out = F.when(mask.bitwiseAND(F.lit(1 << b)) != 0, F.lit(b)) \
               .otherwise(out)
    return out


def filter_lod(df: DataFrame, mode: str = "lowest", mask: int = 0b11111,
               geoms_col: str = "geometries") -> DataFrame:
    """T5 on flat rows: keep only the highest/lowest available LOD's
    geometries per feature; drop features with no remaining geometry
    (lods.rs:30-74). Pure expressions: per-row bitmask -> target lod ->
    array filter -> row filter."""
    if mode not in ("highest", "lowest"):
        raise ValueError(f"mode must be highest|lowest, got {mode!r}")
    lods = _lod_mask(F.col(geoms_col)).bitwiseAND(F.lit(mask))
    target = _highest_bit(lods) if mode == "highest" else _lowest_bit(lods)
    filtered = F.filter(F.col(geoms_col), lambda g: g["lod"] == target)
    return (df.withColumn("_target_lod", target)
            .where(F.col("_target_lod") >= 0)
            .withColumn(geoms_col, filtered)
            .drop("_target_lod"))


def jsonify(df: DataFrame, cols: list[str],
            out_col: str = "attributes_json") -> DataFrame:
    """T8 on flat rows: collapse the given attribute columns into one JSON
    string column (jsonify.rs:30-55 collapses nested objects; on a flat
    schema the object is the struct of attribute columns). ``to_json`` is
    a codegen'd JVM expression."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c)
                                                       for c in cols])))


def mvt_requirements_chain(df: DataFrame, lod_mode: str = "highest",
                           attr_cols: list[str] | None = None) -> DataFrame:
    """The MVT sink's transform requirements (nusamai/src/sink/mvt/mod.rs
    transformer_registry: highest-LOD filter + jsonified attributes +
    geometry stats) composed as one all-Catalyst chain on flat rows —
    tests assert the physical plan contains no Python/Arrow eval stage."""
    out = geometry_stats(df) if "vertices" in df.columns else df
    out = filter_lod(out, mode=lod_mode)
    if attr_cols:
        out = jsonify(out, attr_cols)
    return out
