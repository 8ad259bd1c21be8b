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
