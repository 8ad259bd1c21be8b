"""Sink-driven plan building — the reference's query lifecycle (SURVEY §3.1):

    sink.make_requirements() -> Request -> ordered transform chain -> run

Each sink declares which transforms it needs (nusamai/src/sink/mod.rs:53-82):
MVT wants DotNotation + lowest-LOD + geom stats (sink/mvt/mod.rs:122-132),
GPKG wants flattening (sink/gpkg/mod.rs:261-270), 3D Tiles wants
JsonifyObjects (sink/cesiumtiles/mod.rs:92-99). The builder assembles the
SerialTransform in a fixed order (transformer/builder.rs:106-186):
projection → geomstats → appearance → rename → lod filter → flatten →
mergedown → jsonify/dots.

Here the "physical plan" is the ordered list consumed by
operators.transforms.apply_transform_chain (one mapInPandas stage), and the
schema effect of each transform is tracked alongside (SURVEY §1.3: schema
transforms mirror data transforms)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DataRequirements:
    """Mirror of sink/mod.rs DataRequirements (:53-82), reduced to the
    fields the engine implements."""
    key_value: str = "none"          # none | jsonify | dot_notation
    lod_filter_mode: str | None = None   # highest | lowest | None
    flatten_feature: str = "none"    # none | all | all_except_thematic_surfaces
    flatten_data: str = "none"       # none | top_level_only | all
    flatten_object: str = "none"
    geom_stats: bool = False
    mergedown: bool = False
    rename_rules: dict = field(default_factory=dict)


SINK_REQUIREMENTS = {
    # sink/mvt/mod.rs:122-132
    "mvt": DataRequirements(key_value="dot_notation", lod_filter_mode="lowest",
                            geom_stats=True),
    # sink/gpkg/mod.rs:261-270
    "gpkg": DataRequirements(flatten_feature="all", flatten_data="top_level_only",
                             lod_filter_mode="highest", key_value="jsonify"),
    # sink/cesiumtiles/mod.rs:92-99
    "cesiumtiles": DataRequirements(key_value="jsonify",
                                    lod_filter_mode="highest"),
    # sink/geojson, shapefile, kml: flatten + rename
    "geojson": DataRequirements(flatten_feature="all", key_value="jsonify",
                                lod_filter_mode="highest"),
    "shapefile": DataRequirements(flatten_feature="all", key_value="dot_notation",
                                  lod_filter_mode="highest"),
    "noop": DataRequirements(),
}


def build_transform_chain(req: DataRequirements) -> list[tuple[str, dict]]:
    """Requirements -> ordered chain (builder.rs:106-186 order)."""
    chain: list[tuple[str, dict]] = []
    if req.geom_stats:
        # geomstats needs the vertex store — applied by the caller where
        # vertices are in reach; position in chain preserved for parity
        pass
    if req.rename_rules:
        chain.append(("rename", {"rules": req.rename_rules}))
    if req.lod_filter_mode:
        chain.append(("filter_lod", {"mode": req.lod_filter_mode}))
    if (req.flatten_feature, req.flatten_data, req.flatten_object) != (
            "none", "none", "none"):
        chain.append(("flatten", {
            "feature_opt": req.flatten_feature,
            "data_opt": req.flatten_data,
            "object_opt": req.flatten_object,
        }))
    if req.mergedown:
        chain.append(("mergedown", {}))
    if req.key_value == "jsonify":
        chain.append(("jsonify", {}))
    elif req.key_value == "dot_notation":
        chain.append(("jsonify", {"jsonify_arrays": False}))
        chain.append(("dots", {}))
    return chain


def plan_for_sink(sink_name: str) -> list[tuple[str, dict]]:
    return build_transform_chain(SINK_REQUIREMENTS[sink_name])
