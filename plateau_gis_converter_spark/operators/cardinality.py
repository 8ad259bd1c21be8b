"""HyperLogLog distinct-count registers (mergeable cardinality sketch).

"How many distinct urls / shingles / domains?" at 10^12 rows is the
other canonical sketch question (Flajolet et al., "HyperLogLog", AofA
2007; the practical variant in Heule et al., "HyperLogLog in Practice",
EDBT 2013 — also the basis of Spark's own ``approx_count_distinct``).
Spark's built-in returns only the final estimate with a private hash —
useless when the REGISTERS must be stored, merged across days of
ingest, or gate-checked.  This operator materializes the registers as
a DataFrame:

* hash: the house 60-bit md5 hash (``sampling.hash_bucket`` family) —
  engine-portable, so the DuckDB oracle reproduces every register
  EXACTLY (Spark's xxhash64 does not exist in DuckDB);
* ``bucket`` = top ``p`` bits, ``rho`` = leading-zero count of the
  remaining ``60-p`` bits + 1, via the all-integer
  ``floor_log2(x) = length(bin(x)) - 1`` identity (both engines print
  unpadded binary);
* one partial-agg groupBy ``max(rho)`` — output bounded at ``2^p``
  rows no matter the input size, map-side combined, and MERGEABLE:
  registers of a union are the elementwise max of registers
  (pytest-proven), which is what incremental daily ingest needs.

The float estimate (alpha_m * m^2 / sum 2^-rho with the small-range
linear-counting correction) is computed OUTSIDE the gate from the
integer registers — the gate compares registers, never a float.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60


def _hash60(col: Column, salt: str = "hll") -> Column:
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def hll_registers(df: DataFrame, col: str, p: int = 12,
                  salt: str = "hll") -> DataFrame:
    """(bucket, r) registers, <= 2^p rows; empty buckets omitted (their
    register is 0 — ``hll_estimate`` accounts for them)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    rest_bits = HASH_BITS - p
    h = _hash60(F.col(col), salt)
    bucket = F.shiftrightunsigned(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = (F.when(rest == 0, F.lit(rest_bits + 1))
           .otherwise(F.lit(rest_bits) - (F.length(F.bin(rest)) - 1)))
    return (df.where(F.col(col).isNotNull())
            .select(bucket.cast("bigint").alias("bucket"),
                    rho.cast("bigint").alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").cast("bigint").alias("r")))


def hll_registers_grouped(df: DataFrame, col: str, groups: list[str],
                          p: int = 12, salt: str = "hll") -> DataFrame:
    """(*groups, bucket, r) — one HLL register set PER GROUP, in a single
    partial-agg groupBy (map-side combined).  Output bounded at
    n_groups * 2^p rows; each group's registers are independently
    mergeable, so per-group distinct counts compose across ingest days
    exactly like the global sketch.  The canonical corpus question this
    answers: distinct urls per registered domain / distinct users per
    event type, at 10^12 rows, without a distinct-key shuffle per group."""
    if not groups:
        raise ValueError("groups must be non-empty; use hll_registers")
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    rest_bits = HASH_BITS - p
    h = _hash60(F.col(col), salt)
    bucket = F.shiftrightunsigned(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = (F.when(rest == 0, F.lit(rest_bits + 1))
           .otherwise(F.lit(rest_bits) - (F.length(F.bin(rest)) - 1)))
    return (df.where(F.col(col).isNotNull())
            .select(*groups, bucket.cast("bigint").alias("bucket"),
                    rho.cast("bigint").alias("rho"))
            .groupBy(*groups, "bucket")
            .agg(F.max("rho").cast("bigint").alias("r")))


def hll_estimate(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Classic HLL estimate from (bucket, r) pairs (empty buckets = 0),
    with the small-range linear-counting correction."""
    m = 1 << p
    alpha = (0.673 if p == 4 else 0.697 if p == 5 else 0.709 if p == 6
             else 0.7213 / (1 + 1.079 / m))
    regs = dict(registers)
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    e = alpha * m * m / s
    zeros = m - len(regs)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def approx_distinct(df: DataFrame, col: str, p: int = 12,
                    salt: str = "hll") -> float:
    """Convenience: registers -> estimate (collects <= 2^p rows)."""
    regs = [(r["bucket"], r["r"])
            for r in hll_registers(df, col, p, salt).collect()]
    return hll_estimate(regs, p)


def hll_rollup_tiles(registers: DataFrame, levels: int = 1) -> DataFrame:
    """Roll per-tile HLL registers up the quadtree pyramid: the parent
    tile's register set is the elementwise MAX of its 4^levels
    children's registers — because max is associative/idempotent, the
    result is BIT-IDENTICAL to computing the sketch directly at the
    lower zoom from raw data (the gate proves it, mirroring
    ``raster_downsample``'s direct-vs-rollup equivalence).

    This is the sketch counterpart of the tile-tree rollup (SURVEY §2.4
    A4): "distinct domains/users per tile at EVERY zoom" materializes
    the corpus sketch ONCE at max zoom, then derives each coarser level
    with one partial-agg groupBy over register rows — never re-touching
    the corpus. Input/output shape: (z, x, y, bucket, r).
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    d = 1 << levels
    return (registers.groupBy(
                (F.col("z") - F.lit(levels)).cast("int").alias("z"),
                F.expr(f"x div {d}").cast("bigint").alias("x"),
                F.expr(f"y div {d}").cast("bigint").alias("y"),
                F.col("bucket"))
            .agg(F.max("r").cast("bigint").alias("r")))


def hll_estimate_grouped(registers: DataFrame, groups: list[str],
                         p: int = 12) -> DataFrame:
    """Distributed, engine-reproducible HLL estimate READ over a
    per-group register relation (the distributed dual of the scalar
    ``hll_estimate`` helper): one partial-agg groupBy, no collect, one
    output row per group.

    Determinism scheme (the module's register discipline extended to
    the read path): the harmonic denominator is accumulated as the
    EXACT integer S = sum(2^(B - r)) + zeros * 2^B with B = 62 - p —
    every term a power of two (r <= 61 - p, so the exponent is >= 1)
    and S <= m * 2^B = 2^62, always inside i64 for any p in [4, 18].
    The BIGINT sum is associative and merge-order free. Only AFTER the
    exact aggregation does one fixed-order scalar double chain (same
    literals, same op order in Spark and DuckDB) produce
    alpha * m^2 * 2^B / S with the standard linear-counting small-range
    correction; alpha is the SAME p-specific constant the scalar
    ``hll_estimate`` uses (0.673/0.697/0.709 for p=4/5/6), resolved in
    Python and embedded as one literal so the two readers agree
    bit-for-bit. Output: (*groups, n_buckets, s_scaled, est_distinct).
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    b = 62 - p
    alpha = (0.673 if p == 4 else 0.697 if p == 5 else 0.709 if p == 6
             else 0.7213 / (1 + 1.079 / m))
    per = (registers.groupBy(*groups)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
                F.sum(F.expr(f"CAST(1 AS BIGINT) << CAST({b} - r AS INT)"))
                .cast("bigint").alias("s_present")))
    zeros = F.lit(m).cast("bigint") - F.col("n_buckets")
    s = (F.col("s_present") + zeros * F.lit(1 << b)).alias("s_scaled")
    per = per.select(*groups, "n_buckets", s)
    raw = (F.lit(alpha)
           * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(1 << b))
           / F.col("s_scaled").cast("double"))
    zeros2 = F.lit(m).cast("bigint") - F.col("n_buckets")
    lc = F.lit(float(m)) * F.log(F.lit(float(m))
                                 / zeros2.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros2 > 0), lc).otherwise(raw)
    return per.select(*groups, "n_buckets", "s_scaled",
                      F.floor(est + F.lit(0.5)).cast("bigint")
                      .alias("est_distinct"))
