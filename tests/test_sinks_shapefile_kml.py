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
