"""glTF / PLY sink tests (S11): binary layout parity with
ply/mod.rs:24-33,166-230 and glb structure via the shared kernel."""
import struct

from plateau_gis_converter_spark.kernels import gltf as gk
from plateau_gis_converter_spark.sinks import gltf_ply as gp
from plateau_gis_converter_spark.sources import fixtures as fx


def _parse_ply(path):
    data = open(path, "rb").read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii")
    lines = header.splitlines()
    assert lines[0] == "ply"
    assert lines[1] == "format binary_little_endian 1.0"
    n_verts = int([l for l in lines if l.startswith("element vertex")][0]
                  .split()[-1])
    n_faces = int([l for l in lines if l.startswith("element face")][0]
                  .split()[-1])
    body = data[header_end:]
    verts = [struct.unpack_from("<3d", body, 24 * i) for i in range(n_verts)]
    off = 24 * n_verts
    faces = []
    for _ in range(n_faces):
        cnt = body[off]
        assert cnt == 3
        faces.append(struct.unpack_from("<3I", body, off + 1))
        off += 13
    assert off == len(body)
    return verts, faces


def test_write_ply_roundtrip(spark, tmp_path):
    bdf = fx.boundaries_df(spark)
    path = str(tmp_path / "out.ply")
    n_verts, n_faces = gp.write_ply(bdf, path)
    verts, faces = _parse_ply(path)
    assert len(verts) == n_verts and len(faces) == n_faces
    assert n_faces >= 25  # at least one triangle per feature
    assert all(i < n_verts for f in faces for i in f)
    # centroid subtracted: vertices are near the origin (Tokyo spans ~50 km),
    # nowhere near the raw ECEF magnitude (~6.37e6 m)
    assert all(abs(c) < 100_000 for v in verts for c in v)
    # centroid of the de-duplicated expansion is ~0 by construction
    sx = sum(v[0] for f in faces for v in [verts[f[0]], verts[f[1]], verts[f[2]]])
    n = 3 * len(faces)
    assert abs(sx / n) < 1e-6


def test_write_gltf_per_typename(spark, tmp_path):
    bdf = fx.boundaries_df(spark)
    paths = gp.write_gltf(bdf, str(tmp_path))
    names = {p.rsplit("/", 1)[1] for p in paths}
    assert names == {"urf_UrbanPlanningArea.glb", "urf_UrbanPlanningOverlay.glb"}
    gltf, bin_chunk = gk.parse_glb(open(paths[0], "rb").read())
    acc = {a["name"]: a for a in gltf["accessors"]}
    assert acc["indices"]["count"] % 3 == 0 and acc["indices"]["count"] > 0
    assert acc["positions"]["count"] > 0
    assert gltf["buffers"][0]["byteLength"] == len(bin_chunk)
