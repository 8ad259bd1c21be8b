"""Count-min sketch registers (mergeable frequency sketch).

The third canonical sketch for corpus statistics (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch", J. Algorithms
2005; mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
approximate counts for EVERY key in bounded space, where
``operators/frequent.py`` answers only the heavy tail and
``operators/cardinality.py`` answers only "how many distinct".  A
training pipeline uses it for token/domain frequency tables that feed
quality filters and sampling temperatures without shuffling the full
distinct-key relation.

Shape mirrors ``hll_registers`` — registers AS A DATAFRAME, because at
10^12 rows the sketch must be stored, merged across ingest days, and
gate-checked:

* ``d`` independent rows, each hashing with the house 60-bit md5 hash
  salted by the row index (engine-portable → the DuckDB oracle
  reproduces every register EXACTLY);
* one explode to (row, bucket) then ONE partial-agg groupBy sum —
  output bounded at ``d*w`` rows regardless of input size, map-side
  combined;
* MERGEABLE: registers of a union are the elementwise SUM of
  registers (pytest-proven) — incremental daily ingest;
* point estimate = min over the d rows of the key's register
  (never an undercount; overcount <= 2N/w per row with prob >= 1/2
  independently per row).

Estimates are integer mins over integer sums — no floats anywhere, so
the gate compares registers bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(col: Column, salt: str) -> Column:
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def _bucket(col: Column, row: int, width: int) -> Column:
    return _hash60(col, f":cms{row}") % width


def cms_registers(df: DataFrame, col: str, depth: int = 4,
                  width: int = 256,
                  weight_col: str | None = None) -> DataFrame:
    """(row, bucket, cnt) registers, <= depth*width rows; empty buckets
    omitted (their register is 0).  ``weight_col`` counts each input row
    with an integer weight instead of 1 (e.g. pre-aggregated token
    counts)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, "
                         f"got depth={depth} width={width}")
    c = F.col(col)
    w = (F.col(weight_col).cast("bigint") if weight_col is not None
         else F.lit(1).cast("bigint"))
    cells = F.array(*[
        F.struct(F.lit(r).cast("bigint").alias("row"),
                 _bucket(c, r, width).alias("bucket"))
        for r in range(depth)])
    return (df.where(c.isNotNull())
            .select(F.explode(cells).alias("cell"), w.alias("w"))
            .groupBy(F.col("cell.row").alias("row"),
                     F.col("cell.bucket").alias("bucket"))
            .agg(F.sum("w").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Registers of the union stream: elementwise sum."""
    return (a.unionAll(b).groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def cms_inner_product(a: DataFrame, b: DataFrame,
                      depth: int = 4) -> DataFrame:
    """Equi-join SIZE estimate from two streams' CMS registers (Cormode &
    Muthukrishnan 2005 §4.2): est = min over the d rows of
    sum_bucket a[r,b] * b[r,b].  Each row's sum >= the true inner product
    <freq_a, freq_b> = |A join B on key| (hash collisions only ADD), so
    the min never undercounts; overcount <= ||a||_1 ||b||_1 / w per row
    with prob >= 1/2 independently per row.

    This is what a query planner wants BEFORE running a join over two
    10^12-row streams: both sketches are <= d*w rows (built incrementally,
    merged across ingest days), and the estimate itself is one join of
    two tiny relations — no scan of either stream.  Integer products of
    integer sums, so the gate compares bit-for-bit.

    A register row with NO overlapping filled buckets has sum 0 — and a
    CMS row never undercounts, so the estimate is 0; the aggregate
    therefore treats missing rows as 0 via the count < depth guard.
    """
    j = (a.select("row", "bucket", F.col("cnt").alias("ca"))
         .join(b.select("row", "bucket", F.col("cnt").alias("cb")),
               ["row", "bucket"]))
    per_row = j.groupBy("row").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("s"))
    return per_row.agg(
        F.when(F.count(F.lit(1)) < depth, F.lit(0))
        .otherwise(F.min("s")).cast("bigint").alias("est_join_size"))


def cms_estimate(registers: DataFrame, keys: DataFrame, col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """(key, est) point estimates for every row of ``keys``: min over the
    d rows of the key's register (0 when the bucket never filled).  The
    register relation is <= d*w rows — broadcast it; the probe side
    stays map-local."""
    c = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(r).cast("bigint").alias("row"),
                 _bucket(c, r, width).alias("bucket"))
        for r in range(depth)])
    probe = (keys.select(c.alias("key"), F.explode(cells).alias("cell"))
             .select("key", F.col("cell.row").alias("row"),
                     F.col("cell.bucket").alias("bucket")))
    return (probe.join(F.broadcast(registers), ["row", "bucket"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")))
                 .alias("est")))


def ams_f2_registers(df: DataFrame, col: str, n_reg: int = 32,
                     weight_col: str | None = None) -> DataFrame:
    """AMS "tug-of-war" sketch registers (Alon, Matias & Szegedy, STOC
    1996) for the second frequency moment F2 = sum_key f(key)^2 — the
    SELF-join size of the stream keyed by ``col``, which is what a
    planner needs to size a self-join or gauge key skew before choosing
    a strategy (``cms_inner_product`` answers the two-RELATION version;
    this is the one-relation diagnostic). Sketch family #6 next to CMS /
    HLL / Misra-Gries / log-histogram / KMV.

    Register r holds  Z_r = sum over rows of s_r(key) * w,  with the
    Rademacher sign s_r(key) = 1 - 2*(md5(key || ':ams' || r) % 2) —
    fully deterministic, so registers are INTEGERS compared bit-for-bit
    across engines, and the sum is associative (partial-agg / shard-merge
    order free; merge two shards' sketches by elementwise register sum
    = ``ams_merge``). E[Z_r^2] = F2 exactly; Var(Z_r^2) <= 2*F2^2, so
    the mean over n_reg registers lands within ~sqrt(2/n_reg) relative
    error (pytest pins the tolerance).

    One explode (n_reg cells per row) + ONE partial-agg groupBy bounded
    at n_reg output rows regardless of corpus size. Registers that see
    no rows are omitted (their Z is 0; readers coalesce).

    Output: (reg, z).
    """
    if n_reg < 1:
        raise ValueError(f"need n_reg >= 1, got {n_reg}")
    c = F.col(col)
    w = (F.col(weight_col).cast("bigint") if weight_col is not None
         else F.lit(1).cast("bigint"))
    cells = F.array(*[
        F.struct(F.lit(r).cast("bigint").alias("reg"),
                 (1 - 2 * (_hash60(c, f":ams{r}") % 2)).alias("s"))
        for r in range(n_reg)])
    return (df.where(c.isNotNull())
            .select(F.explode(cells).alias("cell"), w.alias("w"))
            .groupBy(F.col("cell.reg").alias("reg"))
            .agg(F.sum(F.col("cell.s") * F.col("w")).cast("bigint")
                 .alias("z")))


def ams_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Registers of the union stream: elementwise sum (linear sketch)."""
    return (a.unionAll(b).groupBy("reg")
            .agg(F.sum("z").cast("bigint").alias("z")))


def ams_f2_estimate(registers: DataFrame, n_reg: int) -> DataFrame:
    """F2 point estimate: mean of Z_r^2 over ALL n_reg registers
    (absent rows are true zeros), emitted as the exact integer
    sum(z^2) div n_reg — deterministic and merge-order free."""
    return registers.agg(
        F.expr(f"sum(z * z) div {int(n_reg)}").cast("bigint")
        .alias("f2_est"))
