"""Generate the boundary_tiles golden table with an implementation that is
INDEPENDENT of kernels/clip.py: exact rational (Fraction) arithmetic over
the same f64 mercator inputs, restructured code. The tile-emission rule is
re-derived from the reference semantics (nusamai/src/sink/mvt/slice.rs):

* polygon skipped if its exterior is not front-facing (CW in y-down
  mercator, i.e. negative shoelace) or tiny (area * 4^(z+detail) < 4);
* Y pass: rows yi in [max(floor(min_y*2^z), 0), max(ceil(max_y*2^z), 0)),
  all rings clipped to y in [(yi-buf)/2^z, (yi+1+buf)/2^z];
* X pass: columns xi from the CLIPPED exterior's x-extent
  [floor(minx*2^z), ceil(maxx*2^z)); rings clipped to the buffered column;
* the tile (z, xi mod 2^z, yi) is emitted iff ANY ring still has >= 3
  vertices after tile-local normalization and closing-point removal.

`python scripts/gen_boundary_tiles_golden.py` rewrites
plateau_gis_converter_spark/plans/boundary_tiles_golden.py; the correctness
gate (tests/test_entry_correctness.py::boundary_tiles and the driver's
CORRECTNESS run) compares the production kernel's output against this
golden, so the oracle is doubly derived.
"""
from __future__ import annotations

import os
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plateau_gis_converter_spark.kernels.mercator import lnglat_to_web_mercator
from plateau_gis_converter_spark.sources import fixtures as fx

MIN_Z, MAX_Z = 12, 14
MAX_DETAIL = 12
BUFFER_PIXELS = 5


def _shoelace2(ring) -> Fraction:
    """Twice the signed area, anchored at vertex 0 (sign only is used)."""
    n = len(ring)
    if n < 3:
        return Fraction(0)
    x0, y0 = ring[0]
    s = Fraction(0)
    for i in range(1, n - 1):
        ax, ay = ring[i][0] - x0, ring[i][1] - y0
        bx, by = ring[i + 1][0] - x0, ring[i + 1][1] - y0
        s += ax * by - bx * ay
    return s


def _clip_axis(ring, axis: int, k1: Fraction, k2: Fraction):
    """One combined [k1, k2] clip pass along `axis` (exact rationals),
    emission-order-equivalent to the reference fold."""
    if not ring:
        return []
    out = []
    closed = list(ring) + [ring[0]]
    for a, b in zip(closed, closed[1:]):
        aa, ba = a[axis], b[axis]

        def lerp(k):
            t = (k - aa) / (ba - aa)
            v = (b[1 - axis] - a[1 - axis]) * t + a[1 - axis]
            return (v, k) if axis == 1 else (k, v)

        if aa < k1:
            if ba > k1:
                out.append(lerp(k1))
        elif aa > k2:
            if ba < k2:
                out.append(lerp(k2))
        else:
            out.append(tuple(a))
        if ba < k1 and aa > k1:
            out.append(lerp(k1))
        elif ba > k2 and aa < k2:
            out.append(lerp(k2))
    return out


def _floor_frac(v: Fraction) -> int:
    return v.numerator // v.denominator


def _ceil_frac(v: Fraction) -> int:
    return -((-v).numerator // (-v).denominator)


def tiles_for_polygon(rings, zoom: int) -> set[tuple[int, int]]:
    """(x, y) tiles emitted for one polygon at `zoom` (exact arithmetic)."""
    ext = rings[0]
    if not ext or _shoelace2(ext) >= 0:  # front-face cull: keep CW only
        return set()
    area = abs(_shoelace2(ext)) / 2
    for hole in rings[1:]:
        area -= abs(_shoelace2(hole)) / 2
    if area * Fraction(4) ** (zoom + MAX_DETAIL) < 4:
        return set()

    zs = 1 << zoom
    buf = Fraction(BUFFER_PIXELS * (1 << MAX_DETAIL) // 256, 1)
    bw = buf / (1 << MAX_DETAIL)  # buffer width in tile units

    ys = [c[1] for c in ext]
    y_lo = max(_floor_frac(min(ys) * zs), 0)
    y_hi = max(_ceil_frac(max(ys) * zs), 0)
    emitted: set[tuple[int, int]] = set()
    for yi in range(y_lo, y_hi):
        k1y = (yi - bw) / zs
        k2y = (yi + 1 + bw) / zs
        y_rings = [_clip_axis(r, 1, k1y, k2y) for r in rings if r]
        if not y_rings or not y_rings[0]:
            continue
        xs = [c[0] for c in y_rings[0]]
        x_lo = _floor_frac(min(xs) * zs)
        x_hi = _ceil_frac(max(xs) * zs)
        for xi in range(x_lo, x_hi):
            k1x = (xi - bw) / zs
            k2x = (xi + 1 + bw) / zs
            any_ring = False
            for r in y_rings:
                if not r:
                    continue
                clipped = _clip_axis(r, 0, k1x, k2x)
                norm = [(x * zs - xi, y * zs - yi) for x, y in clipped]
                if len(norm) >= 2 and norm[0] == norm[-1]:
                    norm.pop()
                if len(norm) >= 3:
                    any_ring = True
                    break
            if any_ring:
                emitted.add((xi % (1 << zoom), yi))
    return emitted


def golden_rows() -> list[tuple[str, str, int, int]]:
    rows = []
    for rec in fx.boundaries_records():
        merc_rings = []
        for ring in rec["rings_udeg"]:
            import numpy as np
            arr = np.asarray(ring, dtype=np.float64) / 1e6
            mx, my = lnglat_to_web_mercator(arr[:, 0], arr[:, 1])
            merc_rings.append([(Fraction(float(a)), Fraction(float(b)))
                               for a, b in zip(mx, my)])
        for z in range(MIN_Z, MAX_Z + 1):
            tiles = tiles_for_polygon(merc_rings, z)
            if tiles:
                rows.append((rec["feature_id"], rec["typename"], z,
                             len(tiles)))
    rows.sort()
    return rows


def main():
    rows = golden_rows()
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plateau_gis_converter_spark", "plans", "boundary_tiles_golden.py")
    with open(out_path, "w") as f:
        f.write('"""Golden (feature_id, typename, z, n_tiles) rows for the\n')
        f.write("boundary_tiles gate query — generated by\n")
        f.write("scripts/gen_boundary_tiles_golden.py (independent exact-\n")
        f.write("rational reimplementation; cross-checked against the\n")
        f.write('production kernel in tests/test_plans.py). Do not edit."""\n\n')
        f.write("ROWS = [\n")
        for r in rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(f"wrote {len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
