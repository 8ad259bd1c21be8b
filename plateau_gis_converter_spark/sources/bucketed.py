"""Bucketed (co-located) table layout for repeat-join keys.

At 100 TB the dominant shuffle is the big⋈big equi-join (pages⋈labels,
pages⋈index, corpus⋈clusters). Spark's answer is BUCKETING: both sides
are written `bucketBy(n, key)`-partitioned once, and every subsequent
join/aggregation on that key is planned WITHOUT an Exchange — each task
zips bucket i of both tables. This module wraps the engine's bucketing
conventions so jobs that re-join the same keys (dedup keep-list against
the corpus, IVF cell joins, per-host aggregations) pay the shuffle once
at layout time instead of per query.

Notes for production:
* bucket counts must MATCH on both sides (or be integer multiples with
  `spark.sql.bucketing.coalesceBucketedTableScan.enabled`);
* buckets also bound per-task state for the sort-merge path — pick
  n_buckets ≈ data_size / target_partition_size;
* this complements AQE: bucketing removes the exchange entirely, AQE
  only resizes one.

Reference parity: the reference's single-node pipeline sorts by tile id
once and streams groups (nusamai/src/sink/mvt — external sort); the
distributed equivalent of "sort once, consume many times" is exactly a
bucketed+sorted table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed table keyed for shuffle-free equi-joins on ``key``."""
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, key))
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_exchange_free_join(a: DataFrame, b: DataFrame, key: str) -> bool:
    """True when joining ``a ⋈ b`` on ``key`` plans with NO shuffle
    exchange — the co-location proof the tests assert."""
    plan = (a.join(b, key)._jdf.queryExecution().executedPlan()
            .toString())
    return "Exchange hashpartitioning" not in plan
