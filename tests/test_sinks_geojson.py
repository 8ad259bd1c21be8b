"""GeoJSON sink: Feature JSON shape + partitioned write."""
import json

from plateau_gis_converter_spark.sinks import geojson as gj
from plateau_gis_converter_spark.sources import fixtures as fx


def test_geojson_feature_shape(spark):
    bdf = fx.boundaries_df(spark)
    feats = gj.boundaries_to_geojson_features(bdf).collect()
    assert len(feats) == 25
    f = json.loads([r for r in feats
                    if r["typename"] == "urf:UrbanPlanningArea"][0]["feature_json"])
    assert f["type"] == "Feature"
    assert f["geometry"]["type"] == "MultiPolygon"
    ring = f["geometry"]["coordinates"][0][0]
    assert len(ring) == 4
    lng, lat = ring[0]
    assert 139.5 < lng < 140.0 and 35.4 < lat < 35.9
    assert "urf:function" in f["properties"]


def test_geojson_write_partitioned(spark, tmp_path):
    bdf = fx.boundaries_df(spark)
    feats = gj.boundaries_to_geojson_features(bdf)
    gj.write_geojson(feats, str(tmp_path / "out"))
    dirs = {p.name for p in (tmp_path / "out").iterdir() if p.is_dir()}
    assert "typename_dir=urf_UrbanPlanningArea" in dirs
    lines = []
    for p in (tmp_path / "out" / "typename_dir=urf_UrbanPlanningArea").glob("*.txt"):
        lines += p.read_text().strip().splitlines()
    assert len(lines) == 23
    assert all(json.loads(l)["type"] == "Feature" for l in lines)
