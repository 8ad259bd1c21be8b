"""glTF and Stanford PLY sinks (SURVEY §2.1 S11).

Reference dataflow:

* PLY (nusamai/src/sink/ply/mod.rs:77-243): per feature, vertices ->
  geocentric ECEF (no y-up), plane-project + earcut, emit raw triangle
  vertices; then the collector computes the centroid over ALL triangle
  vertices, subtracts it, dedups vertices by f64 bit pattern in arrival
  order, and writes one binary_little_endian PLY (double x/y/z; faces as
  uchar 3 + three u32 indices) with the PLY_HEADER_TEMPLATE (:24-33).
* glTF (nusamai/src/sink/gltf/mod.rs:131-446): like the 3D Tiles content
  build (ECEF -> y-up -> center translation, earcut, f32 vertex interning)
  but one glb for the whole dataset instead of per tile.

Spark shape: triangulation runs DISTRIBUTED (mapInPandas per feature);
the single-file pack runs as ONE EXECUTOR TASK per output file (both
formats are single-writer by design — the same serialization point the
reference has), receiving triangles in a canonical (typename, feature_id,
tri_idx) order because the reference's arrival order is thread-
nondeterministic. Only file paths return to the driver.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import gltf as gk
from ..kernels.projection import geodetic_to_geocentric, wgs84

PLY_HEADER_TEMPLATE = """ply
format binary_little_endian 1.0
element vertex {n_verts}
property double x
property double y
property double z
element face {n_faces}
property list uchar uint vertex_indices
end_header
"""

TRI_SCHEMA = T.StructType([
    T.StructField("typename", T.StringType()),
    T.StructField("feature_id", T.StringType()),
    T.StructField("tri_idx", T.IntegerType()),
    # 9 doubles: the triangle's three ECEF vertices
    T.StructField("v", T.ArrayType(T.DoubleType())),
])


def features_to_ecef_triangles(boundaries: DataFrame) -> DataFrame:
    """Distributed triangulation: each boundary polygon -> ECEF triangles
    (ply/mod.rs:117-151: geocentric transform BEFORE earcut because earcut
    doesn't work in geographic space)."""

    def run(batches):
        wgs = wgs84()
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                pts3d = []
                hole_indices = []
                for ri, ring in enumerate(rec.rings_udeg):
                    if ri > 0:
                        hole_indices.append(len(pts3d))
                    for x, y in ring:
                        gx, gy, gz = geodetic_to_geocentric(
                            wgs, float(x) / 1e6, float(y) / 1e6, 0.0)
                        pts3d.append((float(gx), float(gy), float(gz)))
                num_outer = hole_indices[0] if hole_indices else len(pts3d)
                flat = gk.project3d_to_2d(pts3d, num_outer)
                if flat is None:
                    continue
                tris = gk.earcut(flat, hole_indices)
                for t in range(0, len(tris), 3):
                    vv = []
                    for k in range(3):
                        vv.extend(pts3d[tris[t + k]])
                    rows.append({"typename": rec.typename,
                                 "feature_id": rec.feature_id,
                                 "tri_idx": t // 3, "v": vv})
            if rows:
                yield pd.DataFrame(rows)

    return boundaries.mapInPandas(run, schema=TRI_SCHEMA)


def pack_ply(triangles_pdf: pd.DataFrame, path: str) -> tuple[int, int]:
    """Single-writer PLY pack (ply/mod.rs:166-230): centroid subtract,
    f64-bit vertex dedup in arrival order, binary little-endian body."""
    pdf = triangles_pdf.sort_values(["typename", "feature_id", "tri_idx"],
                                    kind="mergesort")
    coords = [c for vv in pdf["v"] for c in vv]
    n_pts = len(coords) // 3
    if n_pts == 0:
        mu = (0.0, 0.0, 0.0)
    else:
        mu = (sum(coords[0::3]) / n_pts, sum(coords[1::3]) / n_pts,
              sum(coords[2::3]) / n_pts)
    interned: dict[bytes, int] = {}
    verts: list[bytes] = []
    indices: list[int] = []
    for i in range(n_pts):
        key = struct.pack("<3d", coords[3 * i] - mu[0],
                          coords[3 * i + 1] - mu[1], coords[3 * i + 2] - mu[2])
        j = interned.get(key)
        if j is None:
            j = len(verts)
            interned[key] = j
            verts.append(key)
        indices.append(j)
    with open(path, "wb") as f:
        f.write(PLY_HEADER_TEMPLATE
                .replace("{n_verts}", str(len(verts)))
                .replace("{n_faces}", str(len(indices) // 3))
                .encode("ascii"))
        for vb in verts:
            f.write(vb)
        for t in range(0, len(indices), 3):
            f.write(struct.pack("<B3I", 3, *indices[t:t + 3]))
    return len(verts), len(indices) // 3


def write_ply(boundaries: DataFrame, path: str) -> tuple[int, int]:
    """Distributed triangulate -> one packing task (single-writer format).
    Returns (n_verts, n_faces)."""
    tris = features_to_ecef_triangles(boundaries)
    result_schema = T.StructType([
        T.StructField("n_verts", T.LongType()),
        T.StructField("n_faces", T.LongType()),
    ])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        nv, nf = pack_ply(pdf.drop(columns=["_g"]), path)
        return pd.DataFrame({"n_verts": [nv], "n_faces": [nf]})

    row = (tris.withColumn("_g", F.lit(1)).groupBy("_g")
           .applyInPandas(pack, result_schema).collect())
    return (row[0]["n_verts"], row[0]["n_faces"]) if row else (0, 0)


def write_gltf(boundaries: DataFrame, output_dir: str) -> list[str]:
    """One glb per typename (gltf/mod.rs writes a single whole-dataset glb;
    per-type files mirror the shapefile sink's layout and keep the
    single-writer unit bounded): ECEF y-up center-translated vertices via
    the shared kernel; triangulation happens inside the per-type task."""
    os.makedirs(output_dir, exist_ok=True)
    # dataset translation from the per-type bbox center (f32-rounded like
    # the tile translation, gltf/mod.rs:297-330)
    pts = boundaries.select(
        "typename",
        F.explode(F.col("rings_udeg")).alias("ring"))
    pts = pts.select("typename", F.explode("ring").alias("pt"))
    bbox = (pts.groupBy("typename")
            .agg((F.min(F.col("pt")[0]) / 1e6).alias("min_lng"),
                 (F.max(F.col("pt")[0]) / 1e6).alias("max_lng"),
                 (F.min(F.col("pt")[1]) / 1e6).alias("min_lat"),
                 (F.max(F.col("pt")[1]) / 1e6).alias("max_lat")))
    staged = boundaries.join(F.broadcast(bbox), "typename")
    result_schema = T.StructType([
        T.StructField("typename", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_triangles", T.LongType()),
    ])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        tname = pdf["typename"].iloc[0]
        tr = gk.tile_translation(float(pdf["min_lng"].iloc[0]),
                                 float(pdf["max_lng"].iloc[0]),
                                 float(pdf["min_lat"].iloc[0]),
                                 float(pdf["max_lat"].iloc[0]))
        pdf = pdf.sort_values("feature_id", kind="mergesort")
        features = []
        for fi, rec in enumerate(pdf.itertuples(index=False)):
            rings = [[[float(x) / 1e6, float(y) / 1e6, 0.0] for x, y in ring]
                     for ring in rec.rings_udeg]
            features.append((fi, [rings]))
        glb, _, n_tri = gk.encode_features_to_glb(features, tr)
        path = os.path.join(output_dir, tname.replace(":", "_") + ".glb")
        with open(path, "wb") as f:
            f.write(glb)
        return pd.DataFrame({"typename": [tname], "path": [path],
                             "n_triangles": [n_tri]})

    done = (staged.groupBy("typename").applyInPandas(pack, result_schema)
            .collect())
    return sorted(r["path"] for r in done)
