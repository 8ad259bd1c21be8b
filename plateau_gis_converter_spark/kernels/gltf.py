"""glTF/GLB encoding kernels for the 3D Tiles sink (S7/G11).

Parity targets (semantics, cited):

* ``calculate_normal``      — nusamai/src/sink/cesiumtiles/utils.rs:6-43
  (Newell-style summed cross products of (prev-cur, prev+cur), normalized;
  None below 1e-30).
* ``project3d_to_2d``       — the earcut crate's utils3d helper used at
  mod.rs:377: project the polygon onto the plane of its exterior normal.
* ``earcut``                — public mapbox earcut semantics (ear clipping
  with hole elimination via bridges); O(n^2) scan is fine here because
  geometry rings are the small broadcast side.
* ECEF + y-up + center translation — mod.rs:342-349: geodetic_to_geocentric
  then [x, z, -y] minus the tile-center translation (translation itself
  f32-rounded, mod.rs:276-283).
* vertex interning by f32 bit pattern — IndexSet<[u32; 9]> (mod.rs:364-399):
  [x, y, z, nx, ny, nz, u, v, feature_id] — we keep the same 9-float layout
  (u=v=0 in this textureless graft) so accessor byte layout matches
  gltf.rs:36-120.
* GLB container + accessor layout — gltf.rs (positions/normals/texcoords/
  _feature_ids interleaved in one 36-byte-stride buffer view; u32 indices
  per primitive; 4-byte chunk padding per the public glTF 2.0 spec).
"""

from __future__ import annotations

import json
import math
import struct

from .projection import geodetic_to_geocentric, wgs84

__all__ = [
    "calculate_normal", "project3d_to_2d", "earcut", "signed_area2",
    "ecef_yup_translated", "tile_translation", "build_glb",
    "build_material_arrays", "encode_features_to_glb", "parse_glb",
]


def build_material_arrays(material_specs: list[dict]):
    """Reference-style material set -> glTF materials/textures/images
    arrays (material.rs:28-66, gltf.rs:193-213).

    Each spec: {"base_color": [r, g, b, a],
                "base_texture_uri": str | None,
                "image_bytes": bytes | None,   # embed instead of URI ref
                "mime_type": "image/png" | "image/jpeg" | None}

    Textures dedup by URI into a texture set; images dedup by URI into an
    image set (the reference's two IndexSets) — materials sharing a texture
    share its index. Returns (gltf_materials, gltf_textures, image_specs)
    where image_specs entries are {"uri": u} or
    {"bytes": b, "mime": m, "uri_name": u} for build_glb to embed in the
    BIN chunk (material.rs:80-112 embeds file content as a bufferView)."""
    textures: dict[str, int] = {}
    images: dict[str, int] = {}
    image_specs: list[dict] = []
    gltf_textures: list[dict] = []
    gltf_materials: list[dict] = []
    for spec in material_specs:
        base_color = [float(c) for c in spec.get("base_color",
                                                 [1.0, 1.0, 1.0, 1.0])]
        uri = spec.get("base_texture_uri")
        pbr = {
            "baseColorFactor": base_color,
            "metallicFactor": 0.2,
            "roughnessFactor": 0.5,
        }
        if uri is not None:
            tex_idx = textures.get(uri)
            if tex_idx is None:
                img_idx = images.get(uri)
                if img_idx is None:
                    img_idx = len(image_specs)
                    images[uri] = img_idx
                    if spec.get("image_bytes") is not None:
                        image_specs.append({
                            "bytes": spec["image_bytes"],
                            # `or`, not a dict default: a present-but-None
                            # mime_type (the spec shape allows None) must
                            # still fall back — "mimeType": null is
                            # rejected by strict glTF validators
                            "mime": spec.get("mime_type") or "image/png",
                            "uri_name": uri})
                    else:
                        image_specs.append({"uri": uri})
                tex_idx = len(gltf_textures)
                textures[uri] = tex_idx
                gltf_textures.append({"source": img_idx})
            pbr["baseColorTexture"] = {"index": tex_idx, "texCoord": 0}
        gltf_materials.append({"pbrMetallicRoughness": pbr})
    return gltf_materials, gltf_textures, image_specs


def calculate_normal(vertices) -> tuple[float, float, float] | None:
    """Unit normal of a 3D ring (utils.rs:6-43)."""
    it = iter(vertices)
    try:
        first = next(it)
    except StopIteration:
        return None
    prev = first
    sx = sy = sz = 0.0
    for v in list(it) + [first]:
        ax, ay, az = prev[0] - v[0], prev[1] - v[1], prev[2] - v[2]
        bx, by, bz = prev[0] + v[0], prev[1] + v[1], prev[2] + v[2]
        sx += ay * bz - az * by
        sy += az * bx - ax * bz
        sz += ax * by - ay * bx
        prev = v
    d = math.sqrt(sx * sx + sy * sy + sz * sz)
    if d < 1e-30:
        return None
    return (sx / d, sy / d, sz / d)


def project3d_to_2d(points, num_outer: int) -> list[tuple[float, float]] | None:
    """Project 3D polygon points onto the exterior ring's plane (the earcut
    crate's utils3d::project3d_to_2d semantics)."""
    n = calculate_normal(points[:num_outer])
    if n is None:
        return None
    nx, ny, nz = n
    # basis: u = normalize(cross(n, e)) with e the axis least aligned with n
    ax = (1.0, 0.0, 0.0) if abs(nx) <= min(abs(ny), abs(nz)) else (
        (0.0, 1.0, 0.0) if abs(ny) <= abs(nz) else (0.0, 0.0, 1.0))
    ux = ny * ax[2] - nz * ax[1]
    uy = nz * ax[0] - nx * ax[2]
    uz = nx * ax[1] - ny * ax[0]
    d = math.sqrt(ux * ux + uy * uy + uz * uz)
    if d < 1e-30:
        return None
    ux, uy, uz = ux / d, uy / d, uz / d
    vx = ny * uz - nz * uy
    vy = nz * ux - nx * uz
    vz = nx * uy - ny * ux
    return [(p[0] * ux + p[1] * uy + p[2] * uz,
             p[0] * vx + p[1] * vy + p[2] * vz) for p in points]


def signed_area2(pts, idx) -> float:
    """Twice the signed area of the ring visiting pts[i] for i in idx."""
    s = 0.0
    n = len(idx)
    for k in range(n):
        x1, y1 = pts[idx[k]]
        x2, y2 = pts[idx[(k + 1) % n]]
        s += x1 * y2 - x2 * y1
    return s


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    """Inclusive point-in-triangle for CCW (a,b,c); excludes the corners."""
    if p == a or p == b or p == c:
        return False
    return (_cross(a, b, p) >= 0 and _cross(b, c, p) >= 0
            and _cross(c, a, p) >= 0)


def _segments_intersect(p1, p2, q1, q2) -> bool:
    """Proper intersection test (shared endpoints don't count)."""
    d1 = _cross(q1, q2, p1)
    d2 = _cross(q1, q2, p2)
    d3 = _cross(p1, p2, q1)
    d4 = _cross(p1, p2, q2)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    return False


def _bridge_hole(pts, outer: list[int], hole: list[int],
                 other_holes: list[list[int]]) -> list[int]:
    """Splice a hole into the outer ring via a visible bridge (the public
    hole-elimination approach of mapbox earcut: connect the hole's leftmost
    vertex to a mutually visible outer vertex, duplicating both)."""
    hm = min(range(len(hole)), key=lambda k: pts[hole[k]])
    m = hole[hm]
    all_rings = [outer] + other_holes + [hole]

    def visible(b: int) -> bool:
        if pts[b] == pts[m]:
            return True
        for ring in all_rings:
            n = len(ring)
            for k in range(n):
                e1, e2 = ring[k], ring[(k + 1) % n]
                if e1 in (b, m) or e2 in (b, m):
                    continue
                if pts[e1] in (pts[b], pts[m]) or pts[e2] in (pts[b], pts[m]):
                    continue
                if _segments_intersect(pts[m], pts[b], pts[e1], pts[e2]):
                    return False
        return True

    order = sorted(range(len(outer)),
                   key=lambda k: (pts[outer[k]][0] - pts[m][0]) ** 2
                   + (pts[outer[k]][1] - pts[m][1]) ** 2)
    for k in order:
        if visible(outer[k]):
            hole_rot = hole[hm:] + hole[:hm]
            return (outer[:k + 1] + hole_rot + [hole_rot[0]] + outer[k:])
    # fallback: nearest vertex regardless (degenerate input)
    k = order[0]
    hole_rot = hole[hm:] + hole[:hm]
    return outer[:k + 1] + hole_rot + [hole_rot[0]] + outer[k:]


def earcut(points2d, hole_indices) -> list[int]:
    """Triangulate a polygon-with-holes; returns flat triangle index list
    into ``points2d`` (original indices survive hole bridging). Public
    mapbox-earcut semantics: outer CCW / holes CW, bridge holes, ear clip."""
    pts = [tuple(p) for p in points2d]
    bounds = list(hole_indices) + [len(pts)]
    outer = list(range(0, bounds[0] if hole_indices else len(pts)))
    holes = [list(range(bounds[i], bounds[i + 1]))
             for i in range(len(hole_indices))]
    if signed_area2(pts, outer) < 0:
        outer.reverse()
    oriented_holes = []
    for h in holes:
        if len(h) < 3:
            continue
        if signed_area2(pts, h) > 0:
            h = list(reversed(h))
        oriented_holes.append(h)
    # eliminate holes left-to-right (earcut.eliminate_holes ordering)
    oriented_holes.sort(key=lambda h: min(pts[i][0] for i in h))
    ring = outer
    for i, h in enumerate(oriented_holes):
        ring = _bridge_hole(pts, ring, h, oriented_holes[i + 1:])

    tris: list[int] = []
    ring = list(ring)
    guard = 0
    while len(ring) > 3 and guard < 4 * len(ring) ** 2:
        guard += 1
        n = len(ring)
        clipped = False
        for k in range(n):
            ia, ib, ic = ring[k - 1], ring[k], ring[(k + 1) % n]
            a, b, c = pts[ia], pts[ib], pts[ic]
            if _cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner — not an ear
            blocked = False
            for j in ring:
                if j in (ia, ib, ic):
                    continue
                if _point_in_tri(pts[j], a, b, c):
                    blocked = True
                    break
            if blocked:
                continue
            tris.extend((ia, ib, ic))
            del ring[k]
            clipped = True
            break
        if not clipped:
            # degenerate remainder: drop the flattest corner and continue
            flat = min(range(len(ring)), key=lambda k: abs(_cross(
                pts[ring[k - 1]], pts[ring[k]], pts[ring[(k + 1) % len(ring)]])))
            del ring[flat]
    if len(ring) == 3:
        a, b, c = (pts[ring[0]], pts[ring[1]], pts[ring[2]])
        if _cross(a, b, c) != 0:
            tris.extend(ring)
    return tris


# ---------------------------------------------------------------------------
# coordinate pipeline (mod.rs:276-283, 342-349)
# ---------------------------------------------------------------------------

def tile_translation(min_lng: float, max_lng: float, min_lat: float,
                     max_lat: float) -> list[float]:
    """Tile-center ECEF translation, z-up->y-up, f32-rounded (mod.rs:276-283)."""
    tx, ty, tz = geodetic_to_geocentric(
        wgs84(), (min_lng + max_lng) / 2.0, (min_lat + max_lat) / 2.0, 0.0)
    yup = [float(tx), float(tz), float(-ty)]
    return [struct.unpack("<f", struct.pack("<f", v))[0] for v in yup]


def ecef_yup_translated(lng: float, lat: float, height: float,
                        translation) -> tuple[float, float, float]:
    """(lng, lat, h) -> translated y-up ECEF (mod.rs:342-349)."""
    x, y, z = geodetic_to_geocentric(wgs84(), lng, lat, height)
    return (float(x) - translation[0], float(z) - translation[1],
            float(-y) - translation[2])


# ---------------------------------------------------------------------------
# GLB writer (gltf.rs; public glTF 2.0 spec)
# ---------------------------------------------------------------------------

VERTEX_FLOATS = 9  # x y z nx ny nz u v feature_id (gltf.rs:42)


def build_glb(translation, vertices: list[tuple], indices,
              materials: list[dict] | None = None,
              textures: list[dict] | None = None,
              images: list[dict] | None = None) -> bytes:
    """vertices: interned 9-float tuples. ``indices``: either a flat u32
    triangle list (single primitive) or an ordered dict
    {material_idx_or_None: [u32 ...]} — one primitive per material sharing
    the interleaved vertex buffer view, like the reference's per-material
    Primitives map (gltf.rs:12-17, 126-160). ``materials``: optional glTF
    material dicts (index = material_idx). ``textures``/``images``: from
    build_material_arrays — image entries carrying bytes are embedded as
    BIN-chunk bufferViews with their mimeType (material.rs:80-112); URI
    entries stay external references. A primitive whose material has no
    baseColorTexture omits TEXCOORD_0 (gltf.rs:149-153)."""
    if not isinstance(indices, dict):
        indices = {None: list(indices)}
    # glTF 2.0 validity (ADVICE r2 #5): accessor.count must be >= 1 and
    # min/max finite — never emit a primitive for an empty index list, and
    # with no vertices at all emit a mesh-less (but valid) glb.
    indices = {m: lst for m, lst in indices.items() if lst}
    if not vertices or not indices:
        # no mesh -> nothing can reference materials/textures/images;
        # emit the minimal valid mesh-less glb
        gltf = {"asset": {"version": "2.0"}, "scene": 0,
                "scenes": [{"nodes": [0]}],
                "nodes": [{"translation": list(translation)}]}
        json_bytes = json.dumps(gltf, separators=(",", ":")).encode("utf-8")
        while len(json_bytes) % 4:
            json_bytes += b" "
        out = bytearray()
        out += struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes))
        out += struct.pack("<II", len(json_bytes), 0x4E4F534A)
        out += json_bytes
        return bytes(out)
    bin_content = bytearray()
    pos_min = [float("inf")] * 3
    pos_max = [float("-inf")] * 3
    for v in vertices:
        f32 = [struct.unpack("<f", struct.pack("<f", c))[0] for c in v[:3]]
        for i in range(3):
            pos_min[i] = min(pos_min[i], f32[i])
            pos_max[i] = max(pos_max[i], f32[i])
        bin_content += struct.pack("<9f", *v)
    vertices_len = len(bin_content)
    accessors = [
        {"name": "positions", "bufferView": 0, "componentType": 5126,
         "count": len(vertices), "type": "VEC3",
         "min": pos_min, "max": pos_max},
        {"name": "normals", "bufferView": 0, "byteOffset": 12,
         "componentType": 5126, "count": len(vertices), "type": "VEC3"},
        {"name": "texcoords", "bufferView": 0, "byteOffset": 24,
         "componentType": 5126, "count": len(vertices), "type": "VEC2"},
        {"name": "_feature_ids", "bufferView": 0, "byteOffset": 32,
         "componentType": 5126, "count": len(vertices), "type": "SCALAR"},
    ]
    buffer_views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": vertices_len,
         "byteStride": 4 * VERTEX_FLOATS, "target": 34962},
    ]
    primitives = []
    for mat_idx, idx_list in indices.items():
        off = len(bin_content)
        for idx in idx_list:
            bin_content += struct.pack("<I", idx)
        buffer_views.append({"buffer": 0, "byteOffset": off,
                             "byteLength": 4 * len(idx_list),
                             "target": 34963})
        accessors.append({"name": "indices",
                          "bufferView": len(buffer_views) - 1,
                          "componentType": 5125, "count": len(idx_list),
                          "type": "SCALAR"})
        attrs = {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2,
                 "_FEATURE_ID_0": 3}
        if (mat_idx is not None and materials
                and "baseColorTexture" not in materials[int(mat_idx)]
                .get("pbrMetallicRoughness", {"baseColorTexture": 1})):
            # untextured material: no TEXCOORD_0 attribute (gltf.rs:149-153)
            del attrs["TEXCOORD_0"]
        prim = {"attributes": attrs,
                "indices": len(accessors) - 1, "mode": 4}
        if mat_idx is not None:
            prim["material"] = int(mat_idx)
        primitives.append(prim)
    # embedded texture images: one bufferView per byte payload
    # (material.rs:80-112); URI images stay external
    gltf_images = []
    for im in (images or []):
        if "bytes" in im:
            while len(bin_content) % 4:
                bin_content += b"\x00"
            off = len(bin_content)
            bin_content += im["bytes"]
            buffer_views.append({"buffer": 0, "byteOffset": off,
                                 "byteLength": len(im["bytes"]),
                                 "name": "image"})
            gltf_images.append({"mimeType": im["mime"],
                                "bufferView": len(buffer_views) - 1})
        else:
            gltf_images.append({"uri": im["uri"]})
    while len(bin_content) % 4:
        bin_content += b"\x00"

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": list(translation)}],
        "meshes": [{"primitives": primitives}],
        "bufferViews": buffer_views,
        "accessors": accessors,
        "buffers": [{"byteLength": len(bin_content)}],
    }
    if materials:
        gltf["materials"] = materials
    if textures:
        gltf["textures"] = textures
    if gltf_images:
        gltf["images"] = gltf_images
    json_bytes = json.dumps(gltf, separators=(",", ":")).encode("utf-8")
    while len(json_bytes) % 4:
        json_bytes += b" "
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_content)
    out = bytearray()
    out += struct.pack("<III", 0x46546C67, 2, total)          # glTF v2
    out += struct.pack("<II", len(json_bytes), 0x4E4F534A)    # JSON chunk
    out += json_bytes
    out += struct.pack("<II", len(bin_content), 0x004E4942)   # BIN chunk
    out += bin_content
    return bytes(out)


def encode_features_to_glb(features, translation,
                           materials: list[dict] | None = None,
                           material_specs: list[dict] | None = None
                           ) -> tuple[bytes, int, int]:
    """features: iterable of (feature_idx, mpoly[, poly_material_ids])
    where mpoly is a list of polygons, each a list of [lng, lat, h] or
    [lng, lat, h, u, v] rings (exterior first; the 5-dim form carries
    texture coordinates through — packed as (u, 1-v) per the reference's
    v-flip, mod.rs:348). With the optional third element (one material idx
    or None per polygon — the appearance pipeline's polygon_materials
    output), triangles group into one glTF primitive per material like the
    reference's Primitives map (mod.rs:361-370); ``materials`` then lists
    the glTF material dicts.

    Per polygon: ECEF/y-up/translate, exterior normal (skip if degenerate),
    plane projection, earcut with hole offsets, vertex interning by f32
    bits. Returns (glb_bytes, n_vertices, n_triangles)."""
    interned: dict[bytes, int] = {}
    vertices: list[tuple] = []
    indices: dict = {}

    def intern(v: tuple) -> int:
        key = struct.pack("<9f", *v)
        i = interned.get(key)
        if i is None:
            i = len(vertices)
            interned[key] = i
            vertices.append(struct.unpack("<9f", key))
        return i

    n_tris = 0
    for feat in features:
        feature_idx, mpoly = feat[0], feat[1]
        mat_ids = feat[2] if len(feat) > 2 else [None] * len(mpoly)
        for rings, mat_idx in zip(mpoly, mat_ids):
            prim_indices = indices.setdefault(mat_idx, [])
            pts3d = []
            uvs = []
            hole_indices = []
            for ri, ring in enumerate(rings):
                if ri > 0:
                    hole_indices.append(len(pts3d))
                for c in ring:
                    pts3d.append(ecef_yup_translated(
                        float(c[0]), float(c[1]),
                        float(c[2]) if len(c) > 2 else 0.0, translation))
                    # v is flipped on write (mod.rs:348: [.., u, 1.0 - v])
                    uvs.append((float(c[3]), 1.0 - float(c[4]))
                               if len(c) >= 5 else (0.0, 0.0))
            num_outer = hole_indices[0] if hole_indices else len(pts3d)
            normal = calculate_normal(pts3d[:num_outer])
            if normal is None:
                continue
            flat = project3d_to_2d(pts3d, num_outer)
            if flat is None:
                continue
            tris = earcut(flat, hole_indices)
            nx, ny, nz = normal
            for idx in tris:
                x, y, z = pts3d[idx]
                u, v = uvs[idx]
                prim_indices.append(intern((x, y, z, nx, ny, nz, u, v,
                                            float(feature_idx))))
            n_tris += len(tris) // 3
    textures = images = None
    if material_specs is not None:
        materials, textures, images = build_material_arrays(material_specs)
    glb = build_glb(translation, vertices, indices, materials=materials,
                    textures=textures, images=images)
    return glb, len(vertices), n_tris


def parse_glb(data: bytes) -> tuple[dict, bytes]:
    """Decode a GLB container into (gltf_json, bin_chunk) — test helper.
    The BIN chunk is optional (mesh-less glbs omit it per spec)."""
    magic, version, total = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    jlen, jtype = struct.unpack_from("<II", data, 12)
    assert jtype == 0x4E4F534A
    gltf = json.loads(data[20:20 + jlen])
    if 20 + jlen == len(data):
        return gltf, b""
    blen, btype = struct.unpack_from("<II", data, 20 + jlen)
    assert btype == 0x004E4942
    bin_chunk = data[28 + jlen:28 + jlen + blen]
    return gltf, bin_chunk
