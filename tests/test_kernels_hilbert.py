"""Golden fixtures from nusamai-mvt/src/tileid/hilbert.rs:41-79."""
import numpy as np
import pytest

from plateau_gis_converter_spark.kernels import hilbert

# ((z, x, y), expected_tile_id) — hilbert.rs:46-71 (note the Rust fixture
# tuples are (z, x, y) passed as zxy_to_id(x=z, y=x, z=y)?? No: the Rust test
# calls zxy_to_id(x, y, z) with fixture ((x, y, z), id) where the first
# element is actually z per the comments; the call zxy_to_id(z:u8=x, x=y, y=z)
# binds positionally: zxy_to_id(z, x, y) receives (x, y, z) = fixture order,
# so fixture tuples are (z, x, y).
GOLDEN = [
    ((0, 0, 0), 0),
    ((1, 0, 0), 1),
    ((1, 0, 1), 2),
    ((1, 1, 1), 3),
    ((1, 1, 0), 4),
    ((2, 0, 1), 8),
    ((2, 1, 1), 7),
    ((2, 2, 0), 19),
    ((2, 3, 3), 15),
    ((2, 3, 2), 16),
    ((3, 0, 0), 21),
    ((3, 7, 0), 84),
    ((4, 0, 0), 85),
    ((4, 15, 0), 340),
    ((18, 1, 1), 22906492247),
]


@pytest.mark.parametrize("zxy,tid", GOLDEN)
def test_zxy_to_id_scalar(zxy, tid):
    assert hilbert.zxy_to_id_scalar(*zxy) == tid


@pytest.mark.parametrize("zxy,tid", GOLDEN)
def test_id_to_zxy_scalar(zxy, tid):
    assert hilbert.id_to_zxy_scalar(tid) == zxy


def test_vectorized_matches_golden():
    z = np.array([g[0][0] for g in GOLDEN])
    x = np.array([g[0][1] for g in GOLDEN])
    y = np.array([g[0][2] for g in GOLDEN])
    tid = np.array([g[1] for g in GOLDEN], dtype=np.uint64)
    got = hilbert.zxy_to_id(z, x, y)
    np.testing.assert_array_equal(got, tid)
    gz, gx, gy = hilbert.id_to_zxy(tid)
    np.testing.assert_array_equal(gz.astype(np.int64), z)
    np.testing.assert_array_equal(gx.astype(np.int64), x)
    np.testing.assert_array_equal(gy.astype(np.int64), y)


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    z = rng.integers(0, 21, size=5000)
    n = np.uint64(1) << z.astype(np.uint64)
    x = (rng.integers(0, 2**62, size=5000).astype(np.uint64) % n)
    y = (rng.integers(0, 2**62, size=5000).astype(np.uint64) % n)
    tid = hilbert.zxy_to_id(z, x, y)
    gz, gx, gy = hilbert.id_to_zxy(tid)
    np.testing.assert_array_equal(gz.astype(np.int64), z)
    np.testing.assert_array_equal(gx.astype(np.uint64), x)
    np.testing.assert_array_equal(gy.astype(np.uint64), y)
    # scalar agrees with vectorized
    for i in range(0, 5000, 500):
        assert hilbert.zxy_to_id_scalar(int(z[i]), int(x[i]), int(y[i])) == int(tid[i])


def test_tile_ids_sorted_within_zoom_partition():
    """IDs of all tiles at one zoom form a contiguous range — this is what
    makes tile_id a good repartitionByRange key (zoom-contiguous)."""
    for z in (0, 1, 2, 3):
        n = 1 << z
        ids = sorted(hilbert.zxy_to_id_scalar(z, x, y)
                     for x in range(n) for y in range(n))
        lo = ((1 << (2 * z)) - 1) // 3
        assert ids == list(range(lo, lo + n * n))
