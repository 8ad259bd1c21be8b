"""GPB byte-level golden from nusamai-gpkg/src/geometry.rs:119-229."""
import struct

from plateau_gis_converter_spark.kernels import gpb


def _mpoly_fixture():
    # vertices / rings mirroring geometry.rs:125-160: two polygons; the first
    # has one exterior and one interior ring, the second one exterior.
    ext1 = [(0., 0., 111.), (5., 0., 111.), (5., 5., 111.), (0., 5., 111.)]
    int1 = [(1., 1., 111.), (4., 1., 111.), (4., 4., 111.), (1., 4., 111.)]
    ext2 = [(6., 0., 222.), (9., 0., 222.), (9., 3., 222.), (6., 3., 222.)]
    return [[ext1, int1], [ext2]]


def test_header():
    h = gpb.gpb_header(4326)
    assert h[:2] == b"GP"
    assert h[2] == 0x00
    assert h[3] == 0b00000001
    assert struct.unpack("<i", h[4:8])[0] == 4326


def test_multipolygon_bytes_structure():
    data = gpb.gpb_multipolygon_z(_mpoly_fixture(), srs_id=4326)
    body = data[8:]
    assert body[0] == 1  # little endian
    assert struct.unpack("<I", body[1:5])[0] == 1006  # MultiPolygonZ
    assert struct.unpack("<I", body[5:9])[0] == 2  # numPolygons
    # first polygon
    p = body[9:]
    assert p[0] == 1
    assert struct.unpack("<I", p[1:5])[0] == 1003  # PolygonZ
    assert struct.unpack("<I", p[5:9])[0] == 2  # numRings
    assert struct.unpack("<I", p[9:13])[0] == 5  # closed ring: 4 + repeat
    # first point
    x, y, z = struct.unpack("<ddd", p[13:37])
    assert (x, y, z) == (0.0, 0.0, 111.0)
    # ring closes on first vertex
    x5, y5, z5 = struct.unpack("<ddd", p[13 + 4 * 24:13 + 5 * 24])
    assert (x5, y5, z5) == (0.0, 0.0, 111.0)


def test_total_length():
    data = gpb.gpb_multipolygon_z(_mpoly_fixture(), srs_id=4326)
    # 8 header + 9 mpoly hdr + poly1(9 + 2 rings * (4 + 5*24)) + poly2(9 + (4+5*24))
    expected = 8 + 9 + (9 + 2 * (4 + 5 * 24)) + (9 + (4 + 5 * 24))
    assert len(data) == expected
