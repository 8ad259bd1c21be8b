"""MVT encode kernels: zigzag golden (nusamai-mvt/src/geometry.rs:81-90),
tags-encoder golden sequence (nusamai-mvt/src/tag.rs:151-228), djb2 feature
id hash (nusamai/src/sink/mvt/mod.rs:436-441), quantize/simplify semantics
(mod.rs:366-398), and pbf assembly."""
import struct
import zlib

import numpy as np

from plateau_gis_converter_spark.kernels import mvt


def test_zigzag_golden():
    for v, exp in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                   (4096, 8192), (-4096, 8191)]:
        assert mvt.zigzag(v) == exp
        assert mvt.unzigzag(exp) == v


def test_tags_encoder_golden():
    enc = mvt.TagsEncoder()
    V = mvt.TagsEncoder
    assert enc.add("k0", V.v_string("v0")) == (0, 0)
    assert enc.add("k0", V.v_string("v0")) == (0, 0)
    assert enc.add("k1", V.v_string("v0")) == (1, 0)
    assert enc.add("k1", V.v_string("v1")) == (1, 1)
    assert enc.add("k0", V.v_string("v0")) == (0, 0)
    assert enc.add("k0", V.v_string("v2")) == (0, 2)
    assert enc.add("k1", V.v_string("v2")) == (1, 2)
    assert enc.add("k2", V.v_string("v0")) == (2, 0)
    assert enc.add("k1", V.v_string("v1")) == (1, 1)
    assert enc.add("k1", V.v_string("v1")) == (1, 1)
    assert enc.add("k1", V.v_int(10)) == (1, 3)          # i32 10 -> Uint
    assert enc.add("k2", V.v_double(10.5)) == (2, 4)
    assert enc.add("k3", V.v_uint(10)) == (3, 3)
    assert enc.add("k3", V.v_int(-10)) == (3, 5)          # -> SInt
    assert enc.add("k3", V.v_bool(True)) == (3, 6)
    assert enc.add("k3", V.v_int(1)) == (3, 7)            # Uint(1) != Bool(true)
    assert enc.add("k2", V.v_float(10.5)) == (2, 8)       # Float != Double
    assert enc.add("k4", V.v_double(10.5)) == (4, 4)
    assert enc.add("k3", V.v_int(-10)) == (3, 5)
    assert enc.add("k3", V.v_uint(10)) == (3, 3)
    assert enc.add("k5", V.v_raw_int(11)) == (5, 9)
    assert enc.add("k5", V.v_int(12)) == (5, 10)

    keys, values = enc.into_keys_and_values()
    assert keys == ["k0", "k1", "k2", "k3", "k4", "k5"]
    assert values == [
        ("string", "v0"), ("string", "v1"), ("string", "v2"),
        ("uint", 10), ("double", struct.pack("<d", 10.5)), ("sint", -10),
        ("bool", True), ("uint", 1), ("float", struct.pack("<f", 10.5)),
        ("int", 11), ("uint", 12),
    ]


def test_sniff_tag_value_typing():
    """Stringified attributes regain the reference's typed MVT values
    (convert_properties, mod.rs:443-478 + tag.rs:113-121)."""
    s = mvt.sniff_tag_value
    assert s("true") == mvt.TagsEncoder.v_bool(True)
    assert s("false") == mvt.TagsEncoder.v_bool(False)
    assert s("42") == ("uint", 42)
    assert s("-7") == ("sint", -7)
    assert s("10.5") == mvt.TagsEncoder.v_double(10.5)
    assert s("1e3") == mvt.TagsEncoder.v_double(1000.0)
    assert s("2014-04-01") == ("string", "2014-04-01")
    assert s("residential") == ("string", "residential")
    assert s("") == ("string", "")
    # over-range integer literals stay strings (no silent wrap)
    assert s(str(1 << 70)) == ("string", str(1 << 70))
    # identifier-like spellings stay strings: leading zeros (PLATEAU
    # municipal/codelist codes) and '-0' must not become numbers
    assert s("013104") == ("string", "013104")
    assert s("-0") == ("string", "-0")
    assert s("01.5") == ("string", "01.5")
    assert s("-007e2") == ("string", "-007e2")
    assert s("0.5") == mvt.TagsEncoder.v_double(0.5)
    assert s("0") == ("uint", 0)


def test_feature_id_hash():
    # djb2 variant: fold(5381, a*33 ^ byte) — check against a direct fold.
    def ref(s):
        a = 5381
        for c in s.encode():
            a = ((a * 33) & 0xFFFFFFFFFFFFFFFF) ^ c
        return a
    for s in ["", "a", "bldg_12345-abcde", "urf:UrbanPlanningArea"]:
        assert mvt.feature_id_hash(s) == ref(s)
    # 64-bit wrap exercised by long strings
    long_s = "x" * 100
    assert mvt.feature_id_hash(long_s) < 2**64


def test_quantize_truncates_toward_zero():
    # (x*extent + 0.5) as i16: -0.02*4096+0.5 = -81.42 -> -81 (toward zero)
    ring = np.array([[-0.02, 0.99998], [0.5, 0.25]])
    q = mvt.quantize_ring(ring, 4096)
    assert q.tolist() == [[-81, 4096], [2048, 1024]]


def test_simplify_removes_dups_and_collinear():
    ring = np.array([[0, 0], [0, 0], [1, 1], [2, 2], [4, 4], [4, 0], [0, 0]],
                    dtype=np.int16)
    s = mvt.simplify_ring(ring)
    # first kept, dup removed, collinear midpoints removed, last kept.
    # NOTE: [4,4] is ALSO removed by the reference's |cross|==|cross|
    # comparison (mod.rs:388-391): |(0-2)*(4-2)| == |(4-2)*(4-2)| even though
    # the signs differ — we replicate the quirk bit-for-bit.
    assert s.tolist() == [[0, 0], [4, 0], [0, 0]]


def test_geometry_encoder_square():
    enc = mvt.GeometryEncoder()
    enc.add_ring([[0, 0], [10, 0], [10, 10], [0, 10]])
    cmds = enc.into_vec()
    # MoveTo(1) dx=0 dy=0; LineTo(3): (10,0),(0,10),(-10,0); ClosePath
    assert cmds == [
        (1 << 3) | 1, 0, 0,
        (3 << 3) | 2, mvt.zigzag(10), 0, 0, mvt.zigzag(10), mvt.zigzag(-10), 0,
        (1 << 3) | 7,
    ]


def test_encode_tile_and_pbf_roundtrip_size():
    feats = [{
        "layer": "urf:UrbanPlanningArea",
        "feature_id": "urf_001",
        "mpoly": [[[[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]]]],
        "attrs": [("ward", mvt.TagsEncoder.v_string("chiyoda")),
                  ("pop", mvt.TagsEncoder.v_int(66000))],
    }]
    layers = mvt.encode_tile_features(feats, detail=12)
    assert "urf:UrbanPlanningArea" in layers
    layer = layers["urf:UrbanPlanningArea"]
    assert layer["keys"] == ["ward", "pop"]
    assert len(layer["features"]) == 1
    f = layer["features"][0]
    assert f["id"] == mvt.feature_id_hash("urf_001")
    assert f["tags"] == [0, 0, 1, 1]
    data = mvt.tile_to_pbf(layers)
    assert data[:1] == b"\x1a"  # field 3 (layer), wire 2
    assert len(zlib.compress(data)) < 500_000


def test_make_tile_adaptive_returns_full_detail_for_small():
    feats = [{
        "layer": "l", "feature_id": None,
        "mpoly": [[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]]],
        "attrs": [],
    }]
    data, detail = mvt.make_tile_adaptive(feats)
    assert detail == 12
    assert len(data) > 0


def test_exterior_ccw_is_dropped():
    # exterior with signed area <= 0 (counter-clockwise in tile coords) is
    # not admitted (mod.rs:409-419)
    feats = [{
        "layer": "l", "feature_id": None,
        "mpoly": [[[[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]]]],
        "attrs": [],
    }]
    # determine orientation: if this ring encodes empty geometry the feature
    # is skipped entirely
    layers = mvt.encode_tile_features(feats, detail=12)
    reversed_feats = [{
        "layer": "l", "feature_id": None,
        "mpoly": [[[[0.1, 0.9], [0.9, 0.9], [0.9, 0.1], [0.1, 0.1]]]],
        "attrs": [],
    }]
    layers_rev = mvt.encode_tile_features(reversed_feats, detail=12)
    # exactly one of the two orientations survives
    assert (len(layers) == 0) != (len(layers_rev) == 0)
