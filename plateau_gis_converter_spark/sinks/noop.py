"""No-op / serde sinks (SURVEY §2.1 S12).

* ``count_stats`` — the reference's noop sink counts features and vertices
  (nusamai/src/sink/noop/mod.rs:62-77): `count()` + `sum(size(vertices))`.
* ``write_serde`` — the serde sink dumps the entity stream
  (sink/serde/mod.rs:65-126); the engine's equivalent durable dump is
  columnar parquet (Tungsten already stores binary rows; parquet is the
  cluster-native 'bincode dump').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_stats(df: DataFrame, vertices_col: str | None = None) -> dict:
    aggs = [F.count(F.lit(1)).alias("n_features")]
    if vertices_col is not None:
        aggs.append(F.sum(F.size(F.col(vertices_col))).alias("n_vertices"))
    row = df.agg(*aggs).collect()[0]
    return row.asDict()


def write_serde(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)
