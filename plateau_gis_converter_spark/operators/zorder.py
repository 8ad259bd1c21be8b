"""Z-order (Morton) curve indexing: bbox -> sorted-key range scan.

The reference orders features along a Hilbert curve to keep tile writes
local (nusamai/src/sink/cesiumtiles/, kernels/hilbert.py is the parity
port); the companion capability a 100 TB STORE needs is the inverse —
turning a spatial predicate into a set of contiguous ranges over an
interleaved-bit sort key so the scan prunes row groups instead of
reading the planet. Morton (bit interleave) is the curve used for that
in production lake layouts (Delta/Iceberg Z-ORDER clustering) because
range decomposition is pure bit math.

Division of labor, and why each half lives where it lives:

* ``morton_code_col`` — a Catalyst column expression (a constant-folded
  chain of shift/and/or terms, zero Python at row scope) stamping each
  row's cell with its code. A table WRITTEN sorted by this column gets
  parquet min/max row-group stats that the range predicates below can
  prune against.
* ``bbox_cell_ranges`` — QUERY COMPILATION on the driver: enumerate the
  bbox's cells, sort their codes, merge consecutive runs into maximal
  [lo, hi] ranges. O(bbox cells) work bounded by ``max_cells`` (raise,
  never silently sample — a planet-sized bbox at a fine level needs a
  coarser level, the caller's call). This is the IVF-centroid pattern:
  bounded driver work that touches ZERO table data.
* ``morton_bbox_scan`` — the two-step read: OR-of-BETWEEN range
  predicate (pushable into the scan, AND'd row-group pruning on a
  z-sorted table) followed by the EXACT bbox refine on the raw
  coordinates (boundary cells overhang the bbox; the refine makes the
  result exactly the bbox filter, which is what the gate proves).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_SPREAD_MASKS = (  # the standard 64-bit bit-spreading magic masks
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(c: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of c to even positions (x -> x with
    a zero between every bit) via the magic-mask ladder — O(log bits)
    ops instead of a per-bit term chain, so the expression stays tiny
    even when an optimizer rule substitutes it into a predicate many
    times (a naive 32-term chain blew Janino's 64 KB codegen method
    limit under exactly that substitution)."""
    c = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_MASKS:
        if bits > shift:
            c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton_code_col(cx: Column, cy: Column, bits: int = 16) -> Column:
    """Interleaved-bit Morton code of two non-negative cell indices,
    each < 2**bits (caller pre-shifts negative coordinate spaces).
    Compiles to a constant-size shift/and/or ladder inside whole-stage
    codegen — zero Python at row scope."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return _spread(cx, bits).bitwiseOR(F.shiftleft(_spread(cy, bits), 1))


def _interleave(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return out


def bbox_cell_ranges(cx_min: int, cx_max: int, cy_min: int, cy_max: int,
                     bits: int = 16,
                     max_cells: int = 1 << 16,
                     max_ranges: int | None = None) -> list[tuple[int, int]]:
    """Maximal consecutive Morton-code ranges covering every cell of the
    inclusive cell-index bbox. Driver-side query compilation — raises
    past ``max_cells`` (pick a coarser level) rather than degrade.

    ``max_ranges`` (production hygiene, GeoMesa-style) coalesces the
    SMALLEST inter-range gaps until the count fits: the coarse set
    grows (more false positives for the exact refine to drop — still
    lossless), the scan predicate stays bounded."""
    n = (cx_max - cx_min + 1) * (cy_max - cy_min + 1)
    if n <= 0:
        return []
    if n > max_cells:
        raise ValueError(
            f"bbox covers {n} cells > max_cells={max_cells}; "
            f"decompose at a coarser level")
    if not (0 <= cx_min and cx_max < (1 << bits)
            and 0 <= cy_min and cy_max < (1 << bits)):
        raise ValueError("cell indices out of the bits-wide domain")
    codes = sorted(_interleave(x, y, bits)
                   for x in range(cx_min, cx_max + 1)
                   for y in range(cy_min, cy_max + 1))
    ranges: list[tuple[int, int]] = []
    lo = hi = codes[0]
    for c in codes[1:]:
        if c == hi + 1:
            hi = c
        else:
            ranges.append((lo, hi))
            lo = hi = c
    ranges.append((lo, hi))
    while max_ranges is not None and len(ranges) > max(int(max_ranges), 1):
        gaps = [(ranges[i + 1][0] - ranges[i][1], i)
                for i in range(len(ranges) - 1)]
        _, i = min(gaps)
        ranges[i:i + 2] = [(ranges[i][0], ranges[i + 1][1])]
    return ranges


def morton_bbox_scan(df: DataFrame, x_col: str, y_col: str,
                     x_min: int, x_max: int, y_min: int, y_max: int,
                     cell_shift: int = 15, bits: int = 16) -> DataFrame:
    """Exact bbox filter routed through the Morton range decomposition:
    coarse OR-of-BETWEEN over the row's code (scan-pushable; on a
    z-sorted table this is the row-group pruner), then the exact
    coordinate refine. Result == the plain bbox filter — the gate
    proves the decomposition covers every bbox cell (losslessness) and
    the refine discards boundary-cell overhang (no false positives).

    Coordinates must be non-negative (pre-shift a signed space); cells
    are ``2**cell_shift`` units wide.
    """
    ranges = bbox_cell_ranges(x_min >> cell_shift, x_max >> cell_shift,
                              y_min >> cell_shift, y_max >> cell_shift,
                              bits=bits, max_ranges=64)
    if not ranges:
        return df.where(F.lit(False))
    code = morton_code_col(F.shiftright(F.col(x_col), cell_shift),
                           F.shiftright(F.col(y_col), cell_shift),
                           bits=bits)
    # ONE exists() over the literal range array keeps the (substituted)
    # code expression bounded at two occurrences no matter how many
    # ranges the decomposition produced; on a table with a STORED code
    # column the caller instead writes the plain OR-of-BETWEENs, which
    # parquet pushes into row-group pruning.
    arr = F.array(*[F.struct(F.lit(lo).cast("bigint").alias("lo"),
                             F.lit(hi).cast("bigint").alias("hi"))
                    for lo, hi in ranges])
    coarse = F.exists(arr, lambda r: (code >= r["lo"]) & (code <= r["hi"]))
    exact = (F.col(x_col).between(x_min, x_max)
             & F.col(y_col).between(y_min, y_max))
    return df.where(coarse).where(exact)
