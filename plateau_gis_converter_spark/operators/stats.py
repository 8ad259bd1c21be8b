"""Exact distribution quantiles over low-cardinality columns.

Corpus reports need exact percentiles of doc length / token count /
quality — and at 10^12 rows a global sort for ``percentile`` is the
wrong plan.  For the columns these reports use (integer lengths,
counts, quantized scores) the DISTINCT-VALUE relation is tiny even when
the row count is astronomic, so the scalable exact algorithm is:

* one partial-agg groupBy value -> per-value counts (map-side
  combined; the only pass over the data);
* a running-sum window over the SMALL counts relation (this is the
  only ordered step, and it orders values, not rows);
* the type-1 (lower-value) quantile: for target rank
  ``ceil(q * n / 10^6)``, the smallest value whose cumulative count
  reaches it — all-integer, so the gate's oracle reproduces it bit
  for bit.

For genuinely continuous columns, quantize first (``_cents`` style) or
use Spark's ``approx_percentile`` (Greenwald-Khanna) — documented
trade; this operator is the exact path reports and gates need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_quantiles(df: DataFrame, col: str,
                    qs_ppm: list[int]) -> DataFrame:
    """(q_ppm, value): the exact type-1 quantile of ``col`` for each
    requested q (parts-per-million, e.g. 500000 = median)."""
    if not qs_ppm:
        raise ValueError("qs_ppm must be non-empty")
    if not all(0 < q <= 1_000_000 for q in qs_ppm):
        raise ValueError(f"qs_ppm must be in (0, 1e6], got {qs_ppm}")
    counts = (df.groupBy(F.col(col).alias("v"))
              .agg(F.count(F.lit(1)).alias("c")))
    n = counts.agg(F.sum("c")).collect()[0][0] or 0
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(w))
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(int(q), (int(q) * int(n) + 999_999) // 1_000_000)
         for q in sorted(set(qs_ppm))],
        "q_ppm long, tgt long")
    return (cum.join(F.broadcast(targets), F.col("cum") >= F.col("tgt"))
            .groupBy("q_ppm")
            .agg(F.min("v").alias("value")))
