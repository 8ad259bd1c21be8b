"""3D Tiles sink: non-square-scheme slicing, geometric-error skip,
tileset.json rollup invariants."""
import numpy as np
import pytest

from plateau_gis_converter_spark.kernels import tiling
from plateau_gis_converter_spark.sinks import cesiumtiles as ct
from plateau_gis_converter_spark.sources import fixtures as fx


def _valid_zxy(z, x, y):
    if z == 0:
        return x == 0 and y == 0
    if z == 1:
        return 0 <= x < 2 and 0 <= y < 2
    return (x < (1 << z) and y < (1 << (z - 1))
            and x % int(tiling.x_step(z, y)[0]) == 0)


def test_slice_polygon_3d_valid_tiles():
    ring = [[139.60, 35.60, 10.0], [139.90, 35.60, 12.0],
            [139.90, 35.80, 14.0], [139.60, 35.80, 16.0]]
    out = ct.slice_polygon_3d(13, [ring])
    assert len(out) > 0
    for (z, x, y), polys in out.items():
        assert z == 13
        assert _valid_zxy(z, x, y)
        # clipped coords stay within the tile's slice ranges
        s, n = tiling.y_slice_range(z, y)
        w, e = tiling.x_slice_range(z, x, int(tiling.x_step(z, y)[0]))
        for rings in polys:
            for r in rings:
                arr = np.asarray(r)
                assert arr[:, 1].min() >= float(s) - 1e-9
                assert arr[:, 1].max() <= float(n) + 1e-9
                assert arr[:, 0].min() >= float(w) - 1e-9
                assert arr[:, 0].max() <= float(e) + 1e-9
                # heights interpolated within source range
                assert arr[:, 2].min() >= 10.0 - 1e-9
                assert arr[:, 2].max() <= 16.0 + 1e-9


def test_geometric_error_skip(spark):
    bdf = fx.boundaries_df(spark)
    sliced = ct.slice_boundaries_3d(bdf, 2, 13).toPandas()
    # ward polygons (~0.07 deg) are far smaller than 1.5x geometric error at
    # z<=8 → low zooms skipped entirely
    assert sliced["z"].min() > 8
    assert sliced["z"].max() == 13
    # max_zoom never skipped: every feature appears at z=13
    assert set(sliced[sliced.z == 13]["feature_id"]) == {
        f"urf_131{i:02d}" for i in range(1, 24)} | {"urf_ov_0", "urf_ov_1"}


def test_tileset_rollup(spark):
    bdf = fx.boundaries_df(spark)
    sliced = ct.slice_boundaries_3d(bdf, 12, 14)
    regions = ct.tile_regions(sliced).toPandas().to_dict("records")
    ts = ct.build_tileset(regions, min_zoom=12)
    assert ts["asset"]["version"] == "1.1"
    root = ts["root"]
    assert root["children"]

    def walk(node, depth=0):
        assert node["geometricError"] >= 0
        region = node["boundingVolume"]["region"]
        assert region[0] <= region[2] and region[1] <= region[3]
        for ch in node.get("children", []):
            cr = ch["boundingVolume"]["region"]
            # child region within parent region (union invariant)
            assert cr[0] >= region[0] - 1e-12 and cr[2] <= region[2] + 1e-12
            assert cr[1] >= region[1] - 1e-12 and cr[3] <= region[3] + 1e-12
            # geometric error decreases down the tree when both have content
            walk(ch, depth + 1)

    walk(root)
