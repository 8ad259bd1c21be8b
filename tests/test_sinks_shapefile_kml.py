"""Shapefile / KML / CZML sink tests."""
import json
import struct

from plateau_gis_converter_spark.sinks import kml_czml, shapefile as shp
from plateau_gis_converter_spark.sources import fixtures as fx


def test_polygonz_record_layout():
    rings = [[(139.56, 35.52), (139.92, 35.52), (139.92, 35.82), (139.56, 35.82)]]
    body, bbox = shp.polygonz_record(rings)
    assert struct.unpack("<i", body[:4])[0] == 15  # PolygonZ
    assert bbox == [139.56, 35.52, 139.92, 35.82]
    nparts, npoints = struct.unpack("<ii", body[36:44])
    assert nparts == 1 and npoints == 5  # closed ring


def test_write_shapefiles(spark, tmp_path):
    bdf = fx.boundaries_df(spark)
    bases = shp.write_shapefiles(bdf, str(tmp_path))
    names = {b.rsplit("/", 1)[1] for b in bases}
    assert names == {"urf_UrbanPlanningArea", "urf_UrbanPlanningOverlay"}
    shp_file = tmp_path / "urf_UrbanPlanningArea.shp"
    data = shp_file.read_bytes()
    assert struct.unpack(">i", data[:4])[0] == 9994
    assert struct.unpack("<i", data[32:36])[0] == 15
    # declared length matches actual
    assert struct.unpack(">i", data[24:28])[0] * 2 == len(data)
    shx = (tmp_path / "urf_UrbanPlanningArea.shx").read_bytes()
    assert (len(shx) - 100) // 8 == 23  # one index entry per ward
    dbf = (tmp_path / "urf_UrbanPlanningArea.dbf").read_bytes()
    n_rec = struct.unpack("<I", dbf[4:8])[0]
    assert n_rec == 23


def _shoelace(ring):
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s


def test_polygonz_winding_follows_esri_rule(spark, tmp_path):
    """Exterior rings must be CW (negative shoelace), holes CCW — the
    fixtures orient exteriors CCW-in-lnglat, so the writer must flip them
    (reference behavior: PolygonRing::Outer/Inner reorder on write)."""
    bdf = fx.boundaries_df(spark)
    shp.write_shapefiles(bdf, str(tmp_path))
    data = (tmp_path / "urf_UrbanPlanningOverlay.shp").read_bytes()
    pos = 100
    n_polys = 0
    while pos < len(data):
        content_words = struct.unpack(">i", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + content_words * 2]
        nparts, npoints = struct.unpack("<ii", body[36:44])
        parts = struct.unpack(f"<{nparts}i", body[44:44 + 4 * nparts])
        pts_off = 44 + 4 * nparts
        pts = struct.unpack(f"<{npoints * 2}d",
                            body[pts_off:pts_off + 16 * npoints])
        pts = [(pts[2 * i], pts[2 * i + 1]) for i in range(npoints)]
        bounds = list(parts) + [npoints]
        for ri in range(nparts):
            ring = pts[bounds[ri]:bounds[ri + 1]][:-1]  # drop closing pt
            if ri == 0:
                assert _shoelace(ring) < 0, "exterior must be CW"
            else:
                assert _shoelace(ring) > 0, "hole must be CCW"
        n_polys += 1
        pos += 8 + content_words * 2
    assert n_polys == 2  # both overlay polygons carry one hole each


def test_shp_field_name_rule():
    assert shp.shp_field_name("urf:function") == "function"
    assert shp.shp_field_name("bldg:measuredHeight") == "measuredHe"
    assert shp.shp_field_name("simple") == "simple"


def test_kml_placemarks(spark):
    bdf = fx.boundaries_df(spark)
    pms = kml_czml.boundaries_to_kml_placemarks(bdf).collect()
    assert len(pms) == 25
    overlay = [r for r in pms if r["typename"] == "urf:UrbanPlanningOverlay"][0]
    xml = overlay["placemark_xml"]
    assert "<altitudeMode>absolute</altitudeMode>" in xml
    assert "extrude" not in xml  # no extrusion (conversion.rs:32-44)
    assert xml.count("innerBoundaryIs>") == 2  # open+close of 1 hole
    doc = kml_czml.kml_document([r["placemark_xml"] for r in pms])
    assert doc.startswith('<?xml version="1.0"')
    import xml.etree.ElementTree as ET
    ET.fromstring(doc)  # well-formed


def test_czml_packets(spark):
    bdf = fx.boundaries_df(spark)
    pkts = kml_czml.boundaries_to_czml_packets(bdf).collect()
    assert len(pkts) == 25
    p = json.loads(pkts[0]["packet_json"])
    assert "polygon" in p and "positions" in p["polygon"]
    deg = p["polygon"]["positions"]["cartographicDegrees"]
    assert len(deg) % 3 == 0 and len(deg) >= 12
    doc = json.loads(kml_czml.czml_document(
        [r["packet_json"] for r in pkts]))
    assert doc[0]["id"] == "document"
    assert len(doc) == 26
