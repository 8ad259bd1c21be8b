"""Deterministic sampling for training-data mixes.

Corpus curation needs REPRODUCIBLE sampling: per-stratum rates (e.g.
upsample high-quality English, downsample boilerplate) that give the same
sample on every run, every engine, and every partitioning. Random
`df.sample` is none of those. The operator here uses an md5-derived
Bernoulli draw per row — `md5(key || salt)` maps each row to a uniform
bucket in [0, 1e6), and a row survives iff its bucket < rate_ppm of its
stratum — so the sample is a pure function of (key, salt, rates): exact
SQL oracle, stable across runs, joins, and retries (the property that
makes downstream incremental processing safe).

Scale: a map-only filter (one md5 + one broadcast-joined or inlined rate
lookup); no shuffle, no state. The same construction gives deterministic
train/val/test splits (disjoint bucket ranges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Uniform deterministic bucket in [0, BUCKETS): the first 15 hex
    chars of md5(key||salt) (60 bits, exact in i64) mod BUCKETS."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % BUCKETS


def stratified_sample(df: DataFrame, rates_ppm: dict[str, int],
                      stratum_col: str, key_col: str,
                      salt: str = "s0",
                      default_ppm: int = 0) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rates_ppm[stratum] (ppm).
    Unknown strata fall back to ``default_ppm``. The rate lookup is an
    inlined CASE (tiny dict) — a broadcast join for large rate tables.
    Rates are schema-validated (ppm bounds) at plan time."""
    from ..parameters import validate_rates_ppm

    validate_rates_ppm(dict(rates_ppm) | {"__default__": default_ppm})
    rate = None
    for stratum, ppm in sorted(rates_ppm.items()):
        cond = F.col(stratum_col) == stratum
        rate = (F.when(cond, ppm) if rate is None
                else rate.when(cond, ppm))
    rate = (rate.otherwise(default_ppm) if rate is not None
            else F.lit(default_ppm))
    return df.where(hash_bucket(F.col(key_col), salt) < rate)


def deterministic_split(df: DataFrame, key_col: str,
                        val_ppm: int = 10_000, test_ppm: int = 10_000,
                        salt: str = "split0") -> DataFrame:
    """Add a ``split`` column (train/val/test) from disjoint bucket
    ranges — reproducible and leakage-free (a key lands in exactly one
    split, forever)."""
    b = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < val_ppm, F.lit("val"))
        .when(b < val_ppm + test_ppm, F.lit("test"))
        .otherwise(F.lit("train")))
