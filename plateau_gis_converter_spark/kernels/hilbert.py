"""PMTiles-compatible Hilbert tile IDs, vectorized with NumPy.

Semantics-parity reimplementation of the reference's
``nusamai-mvt/src/tileid/hilbert.rs:3-39`` (``id_to_zxy`` / ``zxy_to_id`` with
per-level rotation and u64 wrapping arithmetic). Golden fixtures from
``hilbert.rs:41-79`` are asserted in ``tests/test_kernels_hilbert.py``.

The tile ID is the engine's global sort/partition key (reference uses it for
the external sort before per-tile encoding, ``nusamai/src/sink/mvt/mod.rs:223``).
Keeping the exact same u64 IDs means our ``repartitionByRange(tile_id)``
produces the same tile grouping as the reference's external sort.
"""

from __future__ import annotations

import numpy as np

__all__ = ["zxy_to_id", "id_to_zxy", "zxy_to_id_scalar", "id_to_zxy_scalar"]

_U1 = np.uint64(1)
_U2 = np.uint64(2)
_U3 = np.uint64(3)
_U4 = np.uint64(4)


def _rotate(n: np.ndarray, x: np.ndarray, y: np.ndarray, rx: np.ndarray, ry: np.ndarray):
    """Hilbert quadrant rotation with u64 wrapping (hilbert.rs:30-39)."""
    swap = ry == 0
    flip = swap & (rx == _U1)
    # (n - 1).wrapping_sub(coord): numpy uint64 arithmetic wraps like Rust's
    # wrapping_sub, which the reference relies on in zxy_to_id.
    nm1 = n - _U1
    fx = np.where(flip, nm1 - x, x)
    fy = np.where(flip, nm1 - y, y)
    nx = np.where(swap, fy, fx)
    ny = np.where(swap, fx, fy)
    return nx, ny


def zxy_to_id(z, x, y) -> np.ndarray:
    """(z, x, y) -> u64 Hilbert tile id. All args broadcastable arrays."""
    z = np.atleast_1d(np.asarray(z, dtype=np.uint64))
    x = np.atleast_1d(np.asarray(x, dtype=np.uint64))
    y = np.atleast_1d(np.asarray(y, dtype=np.uint64))
    z, x, y = np.broadcast_arrays(z, x, y)
    # acc = ((1 << (z * 2)) - 1) / 3
    acc = ((_U1 << (z * _U2)) - _U1) // _U3
    acc = acc.copy()
    tx = x.astype(np.uint64).copy()
    ty = y.astype(np.uint64).copy()
    max_z = int(z.max()) if z.size else 0
    for a in range(max_z - 1, -1, -1):
        au = np.uint64(a)
        active = z > au  # iterate a in (0..z).rev()
        rx = (tx >> au) & _U1
        ry = (ty >> au) & _U1
        s = _U1 << au
        ntx, nty = _rotate(np.full_like(tx, s), tx, ty, rx, ry)
        step = s * s * ((_U3 * rx) ^ ry)
        acc = np.where(active, acc + step, acc)
        tx = np.where(active, ntx, tx)
        ty = np.where(active, nty, ty)
    return acc


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Position of the most significant set bit (0 for v==0)."""
    v = v.astype(np.uint64).copy()
    bl = np.zeros(v.shape, dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        su = np.uint64(shift)
        m = (v >> su) > 0
        bl = np.where(m, bl + su, bl)
        v = np.where(m, v >> su, v)
    return bl + np.where(v > 0, _U1, np.uint64(0))


def id_to_zxy(tid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """u64 tile id -> (z, x, y) arrays. Inverse of :func:`zxy_to_id`."""
    tid = np.atleast_1d(np.asarray(tid, dtype=np.uint64))
    # z = 64/2 - leading_zeros(3*id + 1)/2 - 1  (hilbert.rs:4)
    v = _U3 * tid + _U1
    bl = _bit_length_u64(v)  # 64 - leading_zeros
    clz = np.uint64(64) - bl
    z = (np.uint64(32) - clz // _U2 - _U1).astype(np.uint64)
    acc = ((_U1 << (z * _U2)) - _U1) // _U3
    pos = (tid - acc).copy()
    tx = np.zeros_like(tid)
    ty = np.zeros_like(tid)
    max_z = int(z.max()) if z.size else 0
    for a in range(max_z):
        au = np.uint64(a)
        active = z > au
        rx = (pos // _U2) & _U1
        ry = (pos ^ rx) & _U1
        s = _U1 << au
        ntx, nty = _rotate(np.full_like(tx, s), tx, ty, rx, ry)
        ntx = ntx + s * rx
        nty = nty + s * ry
        tx = np.where(active, ntx, tx)
        ty = np.where(active, nty, ty)
        pos = np.where(active, pos // _U4, pos)
    return z.astype(np.uint8), tx.astype(np.uint32), ty.astype(np.uint32)


def zxy_to_id_scalar(z: int, x: int, y: int) -> int:
    """Scalar reference implementation (for property tests / oracles)."""
    acc = ((1 << (z * 2)) - 1) // 3
    tx, ty = x, y
    for a in range(z - 1, -1, -1):
        rx = (tx >> a) & 1
        ry = (ty >> a) & 1
        s = 1 << a
        if ry == 0:
            if rx == 1:
                tx = (s - 1 - tx) & 0xFFFFFFFFFFFFFFFF
                ty = (s - 1 - ty) & 0xFFFFFFFFFFFFFFFF
            tx, ty = ty, tx
        acc += s * s * ((3 * rx) ^ ry)
    return acc


def id_to_zxy_scalar(tid: int) -> tuple[int, int, int]:
    z = (64 // 2) - (64 - (3 * tid + 1).bit_length()) // 2 - 1
    acc = ((1 << (z * 2)) - 1) // 3
    pos = tid - acc
    tx = ty = 0
    for a in range(z):
        rx = (pos >> 1) & 1
        ry = (pos ^ rx) & 1
        s = 1 << a
        if ry == 0:
            if rx == 1:
                tx = s - 1 - tx
                ty = s - 1 - ty
            tx, ty = ty, tx
        pos >>= 2
        tx += s * rx
        ty += s * ry
    return z, tx, ty
