"""MVT + GPKG sink tests: end-to-end slice → sort → encode on the fixture
boundaries; decoded-tile invariants and GPB byte checks."""
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from plateau_gis_converter_spark.kernels import mvt as mvt_kernel
from plateau_gis_converter_spark.operators import tile_assign as ta
from plateau_gis_converter_spark.sinks import gpkg as gpkg_sink
from plateau_gis_converter_spark.sinks import mvt as mvt_sink
from plateau_gis_converter_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def sliced(spark):
    bdf = fx.boundaries_df(spark)
    return ta.slice_boundary_polygons(bdf, 10, 13)


def test_encode_tiles_end_to_end(spark, sliced):
    tiles = mvt_sink.encode_tiles(sliced).toPandas()
    assert len(tiles) > 0
    # every tile decodes as a zlib-compressible pbf under the cap
    for r in tiles.itertuples(index=False):
        assert r.detail <= 12 and r.detail >= 9
        assert len(zlib.compress(bytes(r.pbf))) <= 500_000 or r.detail == 9
        assert r.n_features >= 1
    # tile ids consistent with (z, x, y)
    from plateau_gis_converter_spark.kernels import hilbert
    for r in tiles.sample(n=min(30, len(tiles)), random_state=0).itertuples():
        assert r.tile_id == hilbert.zxy_to_id_scalar(r.z, r.x, r.y)


def test_tile_pbf_layers_contain_typenames(spark, sliced):
    tiles = mvt_sink.encode_tiles(sliced).toPandas()
    # tiles whose features survive quantization carry the layer name; a
    # boundary sliver can legitimately quantize away entirely (empty tile,
    # still written — mod.rs always writes after make_tile)
    nonempty = [bytes(b) for b in tiles["pbf"] if len(bytes(b)) > 0]
    assert len(nonempty) >= 0.8 * len(tiles)
    assert all(b"urf" in b for b in nonempty)


def test_write_tiles(spark, sliced, tmp_path):
    tiles = mvt_sink.encode_tiles(sliced)
    n = mvt_sink.write_tiles(tiles.limit(20), str(tmp_path))
    assert n > 0
    pbfs = list(tmp_path.rglob("*.pbf"))
    assert len(pbfs) == n


def test_gpkg_rows_and_pack(spark, tmp_path):
    bdf = fx.boundaries_df(spark)
    staged = gpkg_sink.boundaries_to_gpkg_rows(bdf).toPandas()
    assert len(staged) == 25
    blob = bytes(staged.iloc[0]["geom_gpb"])
    assert blob[:2] == b"GP"
    assert struct.unpack("<I", blob[9:13])[0] == 1006  # MultiPolygonZ
    bboxes = gpkg_sink.table_bboxes(None, bdf).toPandas().to_dict("records")
    out = str(tmp_path / "wards.gpkg")
    gpkg_sink.pack_gpkg(staged.to_dict("records"), bboxes, out)
    import sqlite3
    con = sqlite3.connect(out)
    tables = {r[0] for r in con.execute(
        "SELECT table_name FROM gpkg_contents").fetchall()}
    assert "urf_UrbanPlanningArea" in tables
    n = con.execute('SELECT count(*) FROM "urf_UrbanPlanningArea"').fetchone()[0]
    assert n == 23
    bb = con.execute(
        "SELECT min_x, max_x FROM gpkg_contents WHERE table_name = "
        "'urf_UrbanPlanningArea'").fetchone()
    assert abs(bb[0] - 139.56) < 1e-6 and abs(bb[1] - 139.92) < 1e-6


def test_adaptive_detail_reduction_on_fat_tile():
    """A tile whose full-detail pbf compresses over the cap must fall back to
    a lower detail (O4 semantics)."""
    import numpy as np
    rng = np.random.default_rng(0)
    feats = []
    for i in range(800):
        # jagged high-entropy rings compress poorly
        n = 1200
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.3, 0.5, n)
        xs = 0.5 + rad * np.cos(ang)
        ys = 0.5 + rad * np.sin(ang)
        ring = np.stack([xs, ys], axis=1).tolist()
        # ensure positive signed area orientation
        from plateau_gis_converter_spark.kernels.clip import signed_ring_area
        if signed_ring_area(ring) < 0:
            ring = ring[::-1]
        feats.append({"layer": "l", "feature_id": f"f{i}",
                      "mpoly": [[ring]], "attrs": []})
    data, detail = mvt_kernel.make_tile_adaptive(feats)
    assert detail < 12
