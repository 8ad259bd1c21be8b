"""Geoid-undulation grid sampling — the vertical-shift (vshift) half of T1.

The reference converts JGD2011 Geographic 3D (EPSG:6697) to WGS84
Geographic 3D (EPSG:4979) by adding the geoid height to the input
elevation, leaving lng/lat unchanged
(nusamai-projection/src/vshift.rs:16-21); the geoid height comes from the
GSI *gsigeo2011* model — a regular lat/lng grid sampled with BILINEAR
interpolation (the japan_geoid crate's MemoryGrid semantics; the GSI grid
spacing is 1' lat x 1.5' lng).

The production grid asset is licensed GSI data and is NOT embedded here:
``GeoidGrid`` loads any regular grid (e.g. a parsed gsigeo2011 file) at
runtime; tests exercise the sampler with a deterministic synthetic grid —
bilinear interpolation reproduces any bilinear function exactly, which is
the golden property the tests assert alongside the reference's convert
contract (lng/lat unchanged, ellipsoidal = geoid + input height,
vshift.rs:29-43).
"""

from __future__ import annotations

import numpy as np

__all__ = ["GeoidGrid", "synthetic_tokyo_grid"]


class GeoidGrid:
    """Regular (lat, lng) grid of geoid heights with bilinear sampling.

    ``values[i, j]`` is the undulation at (lat0 + i*dlat, lng0 + j*dlng).
    Outside the grid -> NaN (the reference's grid covers Japan only).
    """

    def __init__(self, lng0: float, lat0: float, dlng: float, dlat: float,
                 values: np.ndarray):
        self.lng0 = float(lng0)
        self.lat0 = float(lat0)
        self.dlng = float(dlng)
        self.dlat = float(dlat)
        self.values = np.asarray(values, dtype=np.float64)
        if self.values.ndim != 2:
            raise ValueError("values must be 2-D (lat rows x lng cols)")

    def height(self, lng, lat) -> np.ndarray:
        """Bilinear geoid height at (lng, lat); vectorized."""
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        fx = (lng - self.lng0) / self.dlng
        fy = (lat - self.lat0) / self.dlat
        ny, nx = self.values.shape
        # tolerate float noise at the exact grid border (e.g. 20.0000000004)
        eps = 1e-9 * max(nx, ny)
        inside = (fx >= -eps) & (fx <= nx - 1 + eps) \
            & (fy >= -eps) & (fy <= ny - 1 + eps)
        fx = np.clip(fx, 0.0, nx - 1)
        fy = np.clip(fy, 0.0, ny - 1)
        ix = np.floor(fx).astype(np.int64)
        iy = np.floor(fy).astype(np.int64)
        # clamp the cell so points exactly on the far edge still sample
        ix = np.clip(ix, 0, nx - 2)
        iy = np.clip(iy, 0, ny - 2)
        tx = fx - ix
        ty = fy - iy
        v00 = self.values[iy, ix]
        v01 = self.values[iy, ix + 1]
        v10 = self.values[iy + 1, ix]
        v11 = self.values[iy + 1, ix + 1]
        out = (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
               + v10 * (1 - tx) * ty + v11 * tx * ty)
        return np.where(inside, out, np.nan)

    def to_broadcastable(self) -> dict:
        """Plain-dict form for Spark broadcast (no object pickling traps)."""
        return {"lng0": self.lng0, "lat0": self.lat0, "dlng": self.dlng,
                "dlat": self.dlat, "values": self.values}

    @staticmethod
    def from_broadcastable(d: dict) -> "GeoidGrid":
        return GeoidGrid(d["lng0"], d["lat0"], d["dlng"], d["dlat"],
                         d["values"])


def synthetic_tokyo_grid(n_lng: int = 25, n_lat: int = 21) -> GeoidGrid:
    """Deterministic synthetic undulation grid over the tokyo23 bbox
    (139.56-139.92E x 35.52-35.82N): a smooth bilinear-ish base (~36-40 m,
    the real undulation magnitude around Kanto) plus a small integer hash
    ripple so adjacent cells differ."""
    lng0, lat0 = 139.56, 35.52
    dlng = (139.92 - 139.56) / (n_lng - 1)
    dlat = (35.82 - 35.52) / (n_lat - 1)
    jj, ii = np.meshgrid(np.arange(n_lng), np.arange(n_lat))
    base = 36.0 + 0.08 * jj + 0.05 * ii
    ripple = ((ii * 7919 + jj * 104729) % 101 - 50) / 1000.0
    return GeoidGrid(lng0, lat0, dlng, dlat, base + ripple)
