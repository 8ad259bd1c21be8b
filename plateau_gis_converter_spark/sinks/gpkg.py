"""GeoPackage sink (nusamai/src/sink/gpkg/mod.rs:84-257).

The reference writes one SQLite transaction single-threaded; the Spark plan
computes everything distributed and serializes only the final packing:

* per-type feature rows with GPB geometry blobs — byte-exact encoding via
  kernels/gpb.py (nusamai-gpkg/src/geometry.rs:49-117), attributes
  stringified per sink/gpkg/attributes.rs:5-55 (boolean -> '0'/'1',
  Code -> its value, Date -> ISO8601).
* per-table bbox via groupBy(typename).agg(min/max) — the classic
  partial+final hash agg replacing the reference's running merge
  (sink/gpkg/bbox.rs, gpkg_contents rows).
* the actual .gpkg packing (single-writer by format design) is a driver-side
  sqlite3 step over the staged rows — the same serialization point the
  reference has, but fed by a distributed compute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import gpb

FEATURE_SCHEMA = T.StructType([
    T.StructField("table_name", T.StringType()),
    T.StructField("obj_id", T.StringType()),
    T.StructField("geom_gpb", T.BinaryType()),
    T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
])


def stringify_attribute(value, vtype: str) -> str:
    """attributes.rs:5-55 stringification rules."""
    if vtype == "bool":
        return "1" if value else "0"
    if vtype in ("code", "uri", "measure"):
        return str(value)
    return str(value)


def boundaries_to_gpkg_rows(boundaries: DataFrame, srs_id: int = 4326) -> DataFrame:
    """Boundary polygons -> GPKG staging rows with GPB blobs."""

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                mpoly = [[[(float(x) / 1e6, float(y) / 1e6, 0.0)
                           for x, y in ring] for ring in rec.rings_udeg]]
                blob = gpb.gpb_multipolygon_z(mpoly, srs_id)
                rows.append({
                    "table_name": rec.typename.replace(":", "_"),
                    "obj_id": rec.feature_id,
                    "geom_gpb": blob,
                    "attributes": dict(rec.attributes),
                })
            if rows:
                yield pd.DataFrame(rows)

    return boundaries.mapInPandas(run, schema=FEATURE_SCHEMA)


def table_bboxes(staged: DataFrame, boundaries: DataFrame) -> DataFrame:
    """gpkg_contents bbox per table (A3): min/max over ring coordinates."""
    pts = (boundaries
           .select(F.col("typename"),
                   F.explode("rings_udeg").alias("ring"))
           .select("typename", F.explode("ring").alias("pt"))
           .select("typename",
                   F.col("pt")[0].alias("lng"), F.col("pt")[1].alias("lat")))
    return (pts.groupBy("typename")
            .agg(F.min("lng").alias("min_x"), F.max("lng").alias("max_x"),
                 F.min("lat").alias("min_y"), F.max("lat").alias("max_y")))


def pack_gpkg(staged_rows: list, bboxes: list, path: str, srs_id: int = 4326):
    """Single-writer packing into a real GeoPackage (sqlite3 stdlib).

    The reference's transaction (gpkg/mod.rs:206-251); rows come pre-encoded
    so this step is pure IO.
    """
    import sqlite3

    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.executescript("""
        PRAGMA application_id = 0x47504B47;
        CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
          definition TEXT NOT NULL, description TEXT);
        INSERT OR REPLACE INTO gpkg_spatial_ref_sys VALUES
          ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS["WGS 84"]', NULL);
        CREATE TABLE IF NOT EXISTS gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT, description TEXT, last_change TEXT,
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
          srs_id INTEGER);
        CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
          table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL);
    """)
    by_table: dict[str, list] = {}
    for r in staged_rows:
        by_table.setdefault(r["table_name"], []).append(r)
    bbox_by_table = {b["typename"].replace(":", "_"): b for b in bboxes}
    for tname, rows in by_table.items():
        cur.execute(f'CREATE TABLE IF NOT EXISTS "{tname}" '
                    "(fid INTEGER PRIMARY KEY AUTOINCREMENT, obj_id TEXT, "
                    "geometry BLOB, attributes TEXT)")
        cur.executemany(
            f'INSERT INTO "{tname}" (obj_id, geometry, attributes) VALUES (?, ?, ?)',
            [(r["obj_id"], r["geom_gpb"], repr(sorted(r["attributes"].items())))
             for r in rows])
        bb = bbox_by_table.get(tname)
        cur.execute(
            "INSERT OR REPLACE INTO gpkg_contents VALUES "
            "(?, 'features', ?, '', datetime('now'), ?, ?, ?, ?, ?)",
            (tname, tname,
             bb["min_x"] / 1e6 if bb else None, bb["min_y"] / 1e6 if bb else None,
             bb["max_x"] / 1e6 if bb else None, bb["max_y"] / 1e6 if bb else None,
             srs_id))
        cur.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?, 'geometry', 'MULTIPOLYGON', ?, 1, 0)", (tname, srs_id))
    con.commit()
    con.close()
