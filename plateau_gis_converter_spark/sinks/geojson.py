"""GeoJSON sink (nusamai/src/sink/geojson/mod.rs:80-165,
nusamai-geojson/src/conversion.rs:7-160).

Per-type FeatureCollection output: each feature row becomes a GeoJSON
Feature whose geometry is the MultiPolygon in lon/lat order and whose
properties are the flattened attributes (the reference requires flattening +
jsonify before this sink, sink/geojson/mod.rs make_requirements).

Spark-first: the Feature JSON line is built with ``to_json(struct(...))``
(JVM-side), written with ``partitionBy(typename)`` — one directory per type,
newline-delimited features (the distributed-friendly form of a
FeatureCollection; a tiny finisher wraps them in the collection envelope
when a single .geojson file is required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boundaries_to_geojson_features(boundaries: DataFrame) -> DataFrame:
    """rings_udeg (µdeg ints) -> GeoJSON Feature JSON strings, per type.

    Output: (typename, feature_json: string).
    """
    coords = F.transform(
        "rings_udeg",
        lambda ring: F.transform(
            ring, lambda pt: F.array(pt[0] / F.lit(1e6), pt[1] / F.lit(1e6))))
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.col("feature_id").alias("id"),
        F.struct(
            F.lit("MultiPolygon").alias("type"),
            F.array(coords).alias("coordinates"),
        ).alias("geometry"),
        F.col("attributes").alias("properties"),
    ))
    return boundaries.select("typename", feature.alias("feature_json"))


def lines_to_geojson_features(lines: DataFrame) -> DataFrame:
    """paths_udeg (list of paths of (lng, lat) µdeg ints) -> MultiLineString
    Features (conversion.rs:88-117 multilinestring_to_value: parts emitted
    as-is, no closing point). Output: (typename, feature_json)."""
    coords = F.transform(
        "paths_udeg",
        lambda part: F.transform(
            part, lambda pt: F.array(pt[0] / F.lit(1e6), pt[1] / F.lit(1e6))))
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.col("feature_id").alias("id"),
        F.struct(
            F.lit("MultiLineString").alias("type"),
            coords.alias("coordinates"),
        ).alias("geometry"),
        F.col("attributes").alias("properties"),
    ))
    return lines.select("typename", feature.alias("feature_json"))


def points_to_geojson_features(points: DataFrame) -> DataFrame:
    """points_udeg (list of (lng, lat) µdeg ints) -> MultiPoint Features
    (conversion.rs:137-160 multipoint_to_value).
    Output: (typename, feature_json)."""
    coords = F.transform(
        "points_udeg",
        lambda pt: F.array(pt[0] / F.lit(1e6), pt[1] / F.lit(1e6)))
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.col("feature_id").alias("id"),
        F.struct(
            F.lit("MultiPoint").alias("type"),
            coords.alias("coordinates"),
        ).alias("geometry"),
        F.col("attributes").alias("properties"),
    ))
    return points.select("typename", feature.alias("feature_json"))


def write_geojson(features: DataFrame, output_dir: str) -> None:
    """One directory per typename of newline-delimited Features
    (`.text` needs a single 'value' string column)."""
    (features
     .withColumn("typename_dir", F.regexp_replace("typename", ":", "_"))
     .select(F.col("typename_dir"), F.col("feature_json").alias("value"))
     .write.mode("overwrite")
     .partitionBy("typename_dir")
     .text(output_dir))
