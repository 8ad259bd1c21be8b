"""3D Tiles sink (SURVEY §2.1 S7): slice → sort by (tile, typename) →
per-tile content + implicit-quadtree tileset.json.

Parity notes (all against /root/reference):

* slicing runs in lng/lat DEGREES on the non-square scheme
  (sink/cesiumtiles/slice.rs:216-391): rows via iter_y_slice/y_slice_range,
  pole-widened columns via iter_x_slice/x_slice_range
  (tiling/scheme.rs:49-81), interpolation in t-form
  ``t=(k-a1)/(b1-a1); c=(b-a)*t+a`` carrying z through the clip
  (slice.rs:258-294) — note this op order differs from the MVT slicer's and
  is kept faithfully per sink.
* per-zoom skip: if zoom < max_zoom and the feature's approximate extent
  (approx_dx = a·cos(min_lat)·Δlng, approx_dy = a·Δlng — the reference uses
  Δlng for BOTH, replicated bug-for-bug — and Δheight) is smaller than
  1.5 × geometric_error(zoom, y_of_center) the zoom is skipped
  (slice.rs:63-89,132-148).
* tile tree: occupied tiles roll up via calc_parent_zxy with union-ed
  bounding regions and per-level geometricError — the reference's
  tiling/tree.rs:70-208 content-tree fold, done on aggregated per-tile rows
  (small) exactly like the reference's single-threaded tree build.

Per-tile glb content (S7 content / G11): ``encode_tile_glbs`` groups the
sliced features by tile and builds a binary glTF per tile — ECEF y-up
center-translated f32 vertices, Newell normals, plane-projected earcut
triangulation, vertex interning by f32 bit pattern (kernels/gltf.py,
reference mod.rs:269-420 + utils.rs:6-43 + gltf.rs). Materials/textures:
``encode_tile_glbs(material_specs=...)`` forwards reference-style material
specs (base_color + base_texture uri/bytes) into per-material primitives
with glTF texture/image arrays (material.rs:15-112, gltf.rs:149-160,
193-248); rows may carry a ``poly_mats`` column (one material idx or null
per polygon, the appearance pipeline's polygon_materials output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import tiling

WGS84_A = 6378137.0

SLICED3D_SCHEMA = T.StructType([
    T.StructField("feature_id", T.StringType()),
    T.StructField("typename", T.StringType()),
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    # clipped polygon rings carrying [lng, lat, height]
    T.StructField("mpoly", T.ArrayType(T.ArrayType(T.ArrayType(
        T.ArrayType(T.DoubleType()))))),
])


def _clip_ring_axis_t(ring_closed, axis: int, k1: float, k2: float):
    """t-form axis clip carrying all extra dims (slice.rs:252-298)."""
    out = []
    a = None
    for b in ring_closed:
        if a is None:
            a = b
            continue
        aa, ba = a[axis], b[axis]
        if aa < k1:
            if ba > k1:
                t = (k1 - aa) / (ba - aa)
                p = [(bc - ac) * t + ac for ac, bc in zip(a, b)]
                p[axis] = k1
                out.append(p)
        elif aa > k2:
            if ba < k2:
                t = (k2 - aa) / (ba - aa)
                p = [(bc - ac) * t + ac for ac, bc in zip(a, b)]
                p[axis] = k2
                out.append(p)
        else:
            out.append(list(a))
        if ba < k1 and aa > k1:
            t = (k1 - aa) / (ba - aa)
            p = [(bc - ac) * t + ac for ac, bc in zip(a, b)]
            p[axis] = k1
            out.append(p)
        elif ba > k2 and aa < k2:
            t = (k2 - aa) / (ba - aa)
            p = [(bc - ac) * t + ac for ac, bc in zip(a, b)]
            p[axis] = k2
            out.append(p)
        a = b
    return out


def _closed(ring):
    return list(ring) + [ring[0]] if ring else []


def slice_polygon_3d(zoom: int, rings_xyz) -> dict:
    """One polygon -> {(z,x,y): polygon rings} in the 3D-Tiles scheme
    (slice.rs:216-391). Points may be [lng, lat, h] or [lng, lat, h, u, v]:
    the t-form clip interpolates EVERY extra dimension, so UVs ride through
    exactly like the reference's [x, y, z, u, v] slicing (G6)."""
    out: dict = {}
    ext = rings_xyz[0]
    if not ext:
        return out
    lats = [c[1] for c in ext]
    y_range = list(tiling.iter_y_slice(zoom, min(lats), max(lats)))

    y_sliced = []
    for yi in y_range:
        k1, k2 = tiling.y_slice_range(zoom, yi)  # (south, north)
        poly = []
        for ring in rings_xyz:
            if not ring:
                continue
            poly.append(_clip_ring_axis_t(_closed(ring), axis=1,
                                          k1=float(k1), k2=float(k2)))
        y_sliced.append(poly)

    for yi, poly in zip(y_range, y_sliced):
        if not poly or not poly[0]:
            continue
        xs_list = [c[0] for c in poly[0]]
        for xi, xs in tiling.iter_x_slice(zoom, yi, min(xs_list), max(xs_list)):
            k1, k2 = tiling.x_slice_range(zoom, xi, xs)
            key = (zoom, int(xi) % (1 << zoom), int(yi))
            rings_out = []
            for ring in poly:
                clipped = _clip_ring_axis_t(_closed(ring), axis=0,
                                            k1=float(k1), k2=float(k2))
                if len(clipped) >= 2 and clipped[0] == clipped[-1]:
                    clipped.pop()
                if len(clipped) < 3:
                    continue
                rings_out.append(clipped)
            if rings_out:
                out.setdefault(key, []).append(rings_out)
    return out


def _approx_extents(rings_xyz):
    """slice.rs:63-89 feature extent approximation (kept bug-for-bug:
    approx_dy also uses the LNG span)."""
    pts = [c for rings in rings_xyz for ring in rings for c in ring]
    lngs = [c[0] for c in pts]
    lats = [c[1] for c in pts]
    hs = [c[2] for c in pts]
    dlng = np.radians(max(lngs) - min(lngs))
    approx_dx = WGS84_A * np.cos(np.radians(min(lats))) * dlng
    approx_dy = WGS84_A * dlng
    approx_dh = max(hs) - min(hs)
    center = ((min(lngs) + max(lngs)) / 2.0, (min(lats) + max(lats)) / 2.0)
    return approx_dx, approx_dy, approx_dh, center


def slice_boundaries_3d(boundaries: DataFrame, min_zoom: int = 12,
                        max_zoom: int = 15) -> DataFrame:
    """Boundary polygons -> per-(tile, feature) clipped rings with the
    geometric-error zoom skip."""

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rings = [[[float(x) / 1e6, float(y) / 1e6, 0.0]
                          for x, y in ring] for ring in rec.rings_udeg]
                dx, dy, dh, (clng, clat) = _approx_extents([rings])
                for zoom in range(min_zoom, max_zoom + 1):
                    if zoom < max_zoom:
                        _, _, yc = tiling.zxy_from_lng_lat(zoom, clng, clat)
                        err = float(tiling.geometric_error(zoom, int(yc[0]))[0])
                        if dx < err * 1.5 and dy < err * 1.5 and dh < err * 1.5:
                            continue  # slice.rs:132-148
                    tiled = slice_polygon_3d(zoom, rings)
                    for (z, x, y), polys in tiled.items():
                        rows.append({
                            "feature_id": rec.feature_id,
                            "typename": rec.typename,
                            "z": z, "x": x, "y": y,
                            "mpoly": polys,
                        })
            if rows:
                yield pd.DataFrame(rows)

    return boundaries.mapInPandas(run, schema=SLICED3D_SCHEMA)


GLB_TILE_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("n_features", T.IntegerType()),
    T.StructField("n_vertices", T.IntegerType()),
    T.StructField("n_triangles", T.IntegerType()),
    T.StructField("glb", T.BinaryType()),
])


def _make_tile_glb_encoder(material_specs: list[dict] | None):
    def _encode_tile_glb(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import gltf as gltf_kernel

        z, x, y = (int(key[0]), int(key[1]), int(key[2]))
        min_lat, max_lat = tiling.y_slice_range(z, y)
        xs = int(np.asarray(tiling.x_step(z, y)).reshape(-1)[0])
        min_lng, max_lng = tiling.x_slice_range(z, int(x), xs)
        translation = gltf_kernel.tile_translation(
            float(min_lng), float(max_lng), float(min_lat), float(max_lat))
        # within-tile feature order: canonical (typename, feature_id) sort —
        # the reference's arrival order is thread-nondeterministic
        # (SURVEY §7.4.2)
        pdf = pdf.sort_values(["typename", "feature_id"], kind="mergesort")
        has_mats = "poly_mats" in pdf.columns
        features = []
        for fi, rec in enumerate(pdf.itertuples(index=False)):
            if has_mats and rec.poly_mats is not None:
                features.append((fi, rec.mpoly,
                                 [None if m is None or m < 0 else int(m)
                                  for m in rec.poly_mats]))
            else:
                features.append((fi, rec.mpoly))
        glb, n_vert, n_tri = gltf_kernel.encode_features_to_glb(
            features, translation, material_specs=material_specs)
        return pd.DataFrame([{
            "z": z, "x": x, "y": y, "n_features": len(features),
            "n_vertices": n_vert, "n_triangles": n_tri, "glb": glb,
        }])

    return _encode_tile_glb


# default (texture-less) encoder kept importable for tests
_encode_tile_glb = _make_tile_glb_encoder(None)


def encode_tile_glbs(sliced3d: DataFrame,
                     material_specs: list[dict] | None = None) -> DataFrame:
    """sliced3d (slice_boundaries_3d output) -> one row per tile with the
    encoded glb bytes (mod.rs:259-420 dataflow: group by tile, encode).
    ``material_specs`` (reference material.rs Material structs as dicts)
    ride the task closure — a small broadcast-by-serialization; per-polygon
    material ids come from an optional ``poly_mats`` array column."""
    return (sliced3d.repartition("z", "x", "y")
            .groupBy("z", "x", "y")
            .applyInPandas(_make_tile_glb_encoder(material_specs),
                           schema=GLB_TILE_SCHEMA))


def write_tile_glbs(tiles: DataFrame, output_dir: str) -> int:
    """Write z/x/y.glb files (mod.rs:404-410 layout). Returns tile count."""
    import os

    def write_partition(rows):
        for r in rows:
            path = os.path.join(output_dir, str(r.z), str(r.x))
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, f"{r.y}.glb"), "wb") as f:
                f.write(bytes(r.glb))
            yield 1

    return tiles.rdd.mapPartitions(write_partition).count()


def tile_regions(sliced3d: DataFrame) -> DataFrame:
    """Per-tile bounding region (A2): min/max lng/lat over clipped rings."""
    pt = F.explode(F.flatten(F.flatten(F.col("mpoly")))).alias("pt")
    pts = sliced3d.select("z", "x", "y", pt)
    return (pts.groupBy("z", "x", "y")
            .agg(F.min(F.col("pt")[0]).alias("min_lng"),
                 F.max(F.col("pt")[0]).alias("max_lng"),
                 F.min(F.col("pt")[1]).alias("min_lat"),
                 F.max(F.col("pt")[1]).alias("max_lat"),
                 F.count(F.lit(1)).alias("n_vertices")))


def build_tileset(regions: list[dict], min_zoom: int) -> dict:
    """Implicit-quadtree tileset.json (tiling/tree.rs:70-208): leaf tiles
    roll up through calc_parent_zxy; parent regions = union of children;
    geometricError from the scheme (G7). Driver-side fold over per-tile
    aggregates — same as the reference's single-threaded tree."""
    nodes: dict[tuple, dict] = {}
    for r in regions:
        key = (int(r["z"]), int(r["x"]), int(r["y"]))
        nodes[key] = {"region": [r["min_lng"], r["min_lat"],
                                 r["max_lng"], r["max_lat"]],
                      "children": {}, "content": True}
    # roll up to min_zoom
    frontier = sorted(nodes.keys(), key=lambda k: -k[0])
    for key in frontier:
        z, x, y = key
        if z <= min_zoom:
            continue
        pz, px, py = tiling.calc_parent_zxy(z, x, y)
        pkey = (int(pz[0]), int(px[0]), int(py[0]))
        if pkey not in nodes:
            nodes[pkey] = {"region": list(nodes[key]["region"]),
                           "children": {}, "content": False}
            frontier.append(pkey)
        else:
            pr = nodes[pkey]["region"]
            cr = nodes[key]["region"]
            nodes[pkey]["region"] = [min(pr[0], cr[0]), min(pr[1], cr[1]),
                                     max(pr[2], cr[2]), max(pr[3], cr[3])]
        nodes[pkey]["children"][key] = True

    def emit(key) -> dict:
        z, x, y = key
        node = nodes[key]
        region = node["region"]
        err = float(tiling.geometric_error(z, y)[0]) if z >= 2 else 1e8
        out = {
            "boundingVolume": {"region": [
                float(np.radians(region[0])), float(np.radians(region[1])),
                float(np.radians(region[2])), float(np.radians(region[3])),
                0.0, 0.0]},
            "geometricError": min(err, 1e8),
            "refine": "REPLACE",
        }
        if node["content"]:
            out["content"] = {"uri": f"{z}/{x}/{y}.glb"}
        children = [emit(k) for k in sorted(node["children"])]
        if children:
            out["children"] = children
        return out

    roots = [k for k in nodes if k[0] == min_zoom]
    root_children = [emit(k) for k in sorted(roots)]
    all_regions = [nodes[k]["region"] for k in roots]
    root_region = [min(r[0] for r in all_regions), min(r[1] for r in all_regions),
                   max(r[2] for r in all_regions), max(r[3] for r in all_regions)]
    return {
        "asset": {"version": "1.1"},
        "geometricError": 1e8,
        "root": {
            "boundingVolume": {"region": [
                float(np.radians(root_region[0])), float(np.radians(root_region[1])),
                float(np.radians(root_region[2])), float(np.radians(root_region[3])),
                0.0, 0.0]},
            "geometricError": 1e8,
            "refine": "REPLACE",
            "children": root_children,
        },
    }
