"""GeoPackage Geometry Binary (GPB) + WKB encoders.

Semantics-parity with ``nusamai-gpkg/src/geometry.rs``:
* header (:49-57): magic 'GP', version 0, flags 0b00000001 (little-endian,
  no envelope), SRS id as i32 LE.
* WKB MultiPolygonZ body (:98-117): LE byte order marker, type 1006,
  numPolygons, then each polygon as PolygonZ (:59-85): LE marker, type 1003,
  numRings, each ring as numPoints over *closed* iteration (first vertex
  repeated at the end) with x,y,z f64 LE.

Byte-level golden from geometry.rs:119-229 is asserted in
``tests/test_kernels_gpb.py``.
"""

from __future__ import annotations

import struct

WKB_POLYGON_Z = 1003
WKB_MULTIPOLYGON_Z = 1006


def gpb_header(srs_id: int) -> bytes:
    return b"GP" + bytes([0x00, 0b00000001]) + struct.pack("<i", srs_id)


def _closed(ring):
    return list(ring) + [ring[0]] if ring else []


def wkb_polygon_z(rings) -> bytes:
    """rings: list of open rings, each list of (x, y, z)."""
    out = bytearray()
    out += bytes([1])  # little endian
    out += struct.pack("<I", WKB_POLYGON_Z)
    out += struct.pack("<I", len(rings))
    for ring in rings:
        closed = _closed(ring)
        out += struct.pack("<I", len(closed))
        for x, y, z in closed:
            out += struct.pack("<ddd", float(x), float(y), float(z))
    return bytes(out)


def wkb_multipolygon_z(mpoly) -> bytes:
    """mpoly: list of polygons (each a list of open rings of (x,y,z))."""
    out = bytearray()
    out += bytes([1])
    out += struct.pack("<I", WKB_MULTIPOLYGON_Z)
    out += struct.pack("<I", len(mpoly))
    for rings in mpoly:
        out += wkb_polygon_z(rings)
    return bytes(out)


def gpb_multipolygon_z(mpoly, srs_id: int) -> bytes:
    """Full GPB blob = header + WKB (geometry.rs:87-96)."""
    return gpb_header(srs_id) + wkb_multipolygon_z(mpoly)
