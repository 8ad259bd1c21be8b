"""Shapefile sink (SURVEY §2.1 S9; reference
nusamai/src/sink/shapefile/mod.rs:73-365,
nusamai-shapefile/src/conversion.rs:8-160).

Per-type ESRI shapefile output (.shp geometry + .shx index + .dbf
attributes), PolygonZ records, 10-character DBF field names (the reference
enforces this through the rename dictionary,
transformer/transform/attrname.rs:37-48 + transform/shp_field_dict.json —
we apply the same truncate-to-10 rule here).

Spark plan: distributed feature preparation (rings -> PolygonZ record bytes
via mapInPandas), then a per-type single-writer packing step — the shapefile
format is single-writer by design, exactly like the reference's sequential
ShapeWriter. The ESRI shapefile format is public (ESRI whitepaper, 1998).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SHAPE_POLYLINEZ = 13
SHAPE_POLYGONZ = 15
SHAPE_MULTIPOINTZ = 18

RECORD_SCHEMA = T.StructType([
    T.StructField("table_name", T.StringType()),
    T.StructField("obj_id", T.StringType()),
    T.StructField("shape_type", T.IntegerType()),
    T.StructField("shp_record", T.BinaryType()),
    T.StructField("bbox", T.ArrayType(T.DoubleType())),  # xmin,ymin,xmax,ymax
    T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
])


def _shoelace2(ring: list[tuple[float, float]]) -> float:
    """Twice the signed area of an open ring in the (x, y) plane
    (positive = counter-clockwise in standard math orientation)."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _oriented(ring: list[tuple[float, float]], clockwise: bool):
    """ESRI winding rule: outer rings clockwise, holes counter-clockwise
    (ESRI shapefile whitepaper §PolygonZ; the reference writer reorders
    windings the same way via PolygonRing::Outer/Inner,
    nusamai-shapefile/src/conversion.rs)."""
    cw = _shoelace2(ring) < 0.0
    return list(ring) if cw == clockwise else list(reversed(ring))


def polygonz_record(rings_deg: list[list[tuple[float, float]]],
                    z: float = 0.0) -> tuple[bytes, list[float]]:
    """One PolygonZ shape record body (without the record header).

    rings: list of rings, each a closed-implied list of (x=lng, y=lat),
    exterior first; windings are normalized to the ESRI rule (exterior CW,
    holes CCW) regardless of input orientation; shapefile rings are closed
    explicitly (first point repeated).
    """
    oriented = [_oriented(r, clockwise=(i == 0))
                for i, r in enumerate(rings_deg)]
    closed = [list(r) + [r[0]] for r in oriented]
    all_pts = [p for r in closed for p in r]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    bbox = [min(xs), min(ys), max(xs), max(ys)]
    num_parts = len(closed)
    num_points = len(all_pts)
    body = bytearray()
    body += struct.pack("<i", SHAPE_POLYGONZ)
    body += struct.pack("<4d", *bbox)
    body += struct.pack("<ii", num_parts, num_points)
    idx = 0
    for r in closed:
        body += struct.pack("<i", idx)
        idx += len(r)
    for x, y in all_pts:
        body += struct.pack("<dd", x, y)
    # Z range + Z values
    body += struct.pack("<dd", z, z)
    body += struct.pack(f"<{num_points}d", *([z] * num_points))
    # M range + M values (no-data)
    nodata = -1e39
    body += struct.pack("<dd", nodata, nodata)
    body += struct.pack(f"<{num_points}d", *([nodata] * num_points))
    return bytes(body), bbox


def polylinez_record(paths_deg: list[list[tuple[float, float]]],
                     z: float = 0.0) -> tuple[bytes, list[float]]:
    """One PolylineZ shape record body (ESRI whitepaper §PolyLineZ;
    reference conversion.rs:84-113 multilinestring_to_shape): parts are
    written as-is — no winding rule, no closing point."""
    all_pts = [p for part in paths_deg for p in part]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    bbox = [min(xs), min(ys), max(xs), max(ys)]
    body = bytearray()
    body += struct.pack("<i", SHAPE_POLYLINEZ)
    body += struct.pack("<4d", *bbox)
    body += struct.pack("<ii", len(paths_deg), len(all_pts))
    idx = 0
    for part in paths_deg:
        body += struct.pack("<i", idx)
        idx += len(part)
    for x, y in all_pts:
        body += struct.pack("<dd", x, y)
    n = len(all_pts)
    body += struct.pack("<dd", z, z)
    body += struct.pack(f"<{n}d", *([z] * n))
    nodata = -1e39  # shapefile::NO_DATA, same as the polygon path
    body += struct.pack("<dd", nodata, nodata)
    body += struct.pack(f"<{n}d", *([nodata] * n))
    return bytes(body), bbox


def multipointz_record(points_deg: list[tuple[float, float]],
                       z: float = 0.0) -> tuple[bytes, list[float]]:
    """One MultiPointZ shape record body (ESRI whitepaper §MultiPointZ;
    reference conversion.rs:116-141 multipoint_to_shape)."""
    xs = [p[0] for p in points_deg]
    ys = [p[1] for p in points_deg]
    bbox = [min(xs), min(ys), max(xs), max(ys)]
    body = bytearray()
    body += struct.pack("<i", SHAPE_MULTIPOINTZ)
    body += struct.pack("<4d", *bbox)
    body += struct.pack("<i", len(points_deg))
    for x, y in points_deg:
        body += struct.pack("<dd", x, y)
    n = len(points_deg)
    body += struct.pack("<dd", z, z)
    body += struct.pack(f"<{n}d", *([z] * n))
    nodata = -1e39
    body += struct.pack("<dd", nodata, nodata)
    body += struct.pack(f"<{n}d", *([nodata] * n))
    return bytes(body), bbox


def boundaries_to_shp_records(boundaries: DataFrame) -> DataFrame:
    """Boundary rows -> per-type PolygonZ record bytes (distributed)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rings = [[(float(x) / 1e6, float(y) / 1e6) for x, y in ring]
                         for ring in rec.rings_udeg]
                body, bbox = polygonz_record(rings)
                rows.append({
                    "table_name": rec.typename.replace(":", "_"),
                    "obj_id": rec.feature_id,
                    "shape_type": SHAPE_POLYGONZ,
                    "shp_record": body,
                    "bbox": bbox,
                    "attributes": dict(rec.attributes),
                })
            if rows:
                yield pd.DataFrame(rows)

    return boundaries.mapInPandas(run, schema=RECORD_SCHEMA)


def lines_to_shp_records(lines: DataFrame) -> DataFrame:
    """Line rows (typename, feature_id, paths_udeg, attributes) ->
    PolylineZ records (S9 line path, conversion.rs:84-113)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                paths = [[(float(x) / 1e6, float(y) / 1e6) for x, y in part]
                         for part in rec.paths_udeg]
                body, bbox = polylinez_record(paths)
                rows.append({
                    "table_name": rec.typename.replace(":", "_"),
                    "obj_id": rec.feature_id,
                    "shape_type": SHAPE_POLYLINEZ,
                    "shp_record": body,
                    "bbox": bbox,
                    "attributes": dict(rec.attributes),
                })
            if rows:
                yield pd.DataFrame(rows)

    return lines.mapInPandas(run, schema=RECORD_SCHEMA)


def points_to_shp_records(points: DataFrame) -> DataFrame:
    """Point rows (typename, feature_id, points_udeg, attributes) ->
    MultiPointZ records (S9 point path, conversion.rs:116-141)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                pts = [(float(x) / 1e6, float(y) / 1e6)
                       for x, y in rec.points_udeg]
                body, bbox = multipointz_record(pts)
                rows.append({
                    "table_name": rec.typename.replace(":", "_"),
                    "obj_id": rec.feature_id,
                    "shape_type": SHAPE_MULTIPOINTZ,
                    "shp_record": body,
                    "bbox": bbox,
                    "attributes": dict(rec.attributes),
                })
            if rows:
                yield pd.DataFrame(rows)

    return points.mapInPandas(run, schema=RECORD_SCHEMA)


def shp_field_name(name: str) -> str:
    """DBF field names are max 10 chars; strip namespace then truncate —
    the reference's shapefile dictionary rule (attrname.rs:37-48)."""
    if ":" in name:
        name = name.split(":", 1)[1]
    return name[:10]


def _shp_header(file_len_words: int, bbox: list[float],
                shape_type: int = SHAPE_POLYGONZ) -> bytes:
    h = bytearray(100)
    struct.pack_into(">i", h, 0, 9994)  # magic
    struct.pack_into(">i", h, 24, file_len_words)
    struct.pack_into("<i", h, 28, 1000)  # version
    struct.pack_into("<i", h, 32, shape_type)
    struct.pack_into("<4d", h, 36, *bbox)
    # z/m ranges left zero
    return bytes(h)


def pack_shapefile(records: list[dict], base_path: str) -> None:
    """Single-writer .shp/.shx/.dbf packing for one table. The table's
    shape type comes from its records (one type per .shp by format rule;
    the reference keeps polygon/line/point features in separate tables the
    same way, sink/shapefile/mod.rs:73-365)."""
    recs = sorted(records, key=lambda r: r["obj_id"])
    shape_type = int(recs[0].get("shape_type") or SHAPE_POLYGONZ)
    bbox = [min(r["bbox"][0] for r in recs), min(r["bbox"][1] for r in recs),
            max(r["bbox"][2] for r in recs), max(r["bbox"][3] for r in recs)]
    shp = bytearray()
    shx = bytearray()
    offset_words = 50
    for i, r in enumerate(recs):
        body = r["shp_record"]
        content_words = len(body) // 2
        shp += struct.pack(">ii", i + 1, content_words)
        shp += body
        shx += struct.pack(">ii", offset_words, content_words)
        offset_words += 4 + content_words
    with open(base_path + ".shp", "wb") as f:
        f.write(_shp_header(50 + len(shp) // 2, bbox, shape_type))
        f.write(bytes(shp))
    with open(base_path + ".shx", "wb") as f:
        f.write(_shp_header(50 + len(shx) // 2, bbox, shape_type))
        f.write(bytes(shx))

    # DBF: obj_id + attribute keys as 10-char character fields
    keys = sorted({k for r in recs for k in r["attributes"]})
    fields = [("obj_id", 64)] + [(shp_field_name(k), 64) for k in keys]
    dbf = bytearray()
    n_rec = len(recs)
    rec_len = 1 + sum(w for _, w in fields)
    header_len = 32 + 32 * len(fields) + 1
    dbf += struct.pack("<BBBBIHH20x", 3, 24, 1, 1, n_rec, header_len, rec_len)
    for fname, width in fields:
        fb = fname.encode("ascii", "replace")[:10]
        dbf += fb + b"\x00" * (11 - len(fb)) + b"C" + b"\x00" * 4
        dbf += struct.pack("<BB", width, 0) + b"\x00" * 14
    dbf += b"\x0d"
    for r in recs:
        row = b" "
        vals = [r["obj_id"]] + [r["attributes"].get(k, "") for k in keys]
        for (_, width), v in zip(fields, vals):
            vb = str(v).encode("utf-8", "replace")[:width]
            row += vb + b" " * (width - len(vb))
        dbf += row
    dbf += b"\x1a"
    with open(base_path + ".dbf", "wb") as f:
        f.write(bytes(dbf))


def write_shapefiles(boundaries: DataFrame, output_dir: str) -> list[str]:
    """Distributed record prep, then per-type packing as ONE TASK PER TYPE
    via ``groupBy(table_name).applyInPandas`` — the .shp format is
    single-writer per file (like the reference's sequential ShapeWriter),
    but types pack in parallel and no unbounded data ever reaches the
    driver (only the per-type path/count rows come back).

    ``output_dir`` must be visible to executors (local-mode tmp dir here;
    shared storage on a cluster — same constraint as any file sink).
    """
    return write_shp_records(boundaries_to_shp_records(boundaries),
                             output_dir)


def write_shp_records(staged: DataFrame, output_dir: str) -> list[str]:
    """Pack pre-staged shapefile records (any mix of PolygonZ / PolylineZ /
    MultiPointZ tables — one shape type per table) with one executor task
    per table. Union the staging outputs of boundaries_to_shp_records /
    lines_to_shp_records / points_to_shp_records before calling."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    result_schema = T.StructType([
        T.StructField("table_name", T.StringType()),
        T.StructField("base_path", T.StringType()),
        T.StructField("n_records", T.LongType()),
    ])

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        tname = pdf["table_name"].iloc[0]
        base = os.path.join(output_dir, tname)
        pack_shapefile(pdf.to_dict("records"), base)
        return pd.DataFrame({"table_name": [tname], "base_path": [base],
                             "n_records": [len(pdf)]})

    done = (staged.groupBy("table_name").applyInPandas(pack_one, result_schema)
            .collect())
    return sorted(r["base_path"] for r in done)
