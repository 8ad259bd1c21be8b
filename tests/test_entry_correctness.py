"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.001, compare row count,
column names, and order-insensitive values."""
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), \
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), \
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    a = _canon(spark_pdf)
    b = _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x) and not pd.isna(y)
                    and math.isclose(float(x), float(y), rel_tol=0, abs_tol=0))
                assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r}"
        else:
            same = av.astype(str).eq(bv.astype(str))
            assert same.all(), (
                f"{name}: col {c} first diff at row {same.idxmin()}: "
                f"{av[same.idxmin()]!r} != {bv[same.idxmin()]!r}")


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck.sql(ORACLES[name]).df()
    _compare(spark_pdf, duck_pdf, name)


def test_every_gate_query_has_a_full_oracle():
    """VERDICT r2 #8: the rows-only set must STAY empty — a future gate
    query without an oracle_sql() entry degrades the driver's check to
    rows-only and should fail loudly here instead."""
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert missing == [], (
        f"gate queries without a DuckDB oracle: {missing} — add an "
        "oracle_sql() entry (or document a genuinely non-SQL-expressible "
        "exception in SURVEY.md and this test)")
    stale = sorted(set(ORACLES) - set(QUERIES))
    assert stale == [], f"oracles without a gate query: {stale}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"ward_code", "n_pages"} <= set(df.columns)


def test_lsh_candidates_subset_of_exact(spark):
    """MinHash-LSH verified pairs must be a subset of the exact Jaccard
    pairs (precision exactness; recall is probabilistic)."""
    exact = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).toPandas()
    lsh = QUERIES["minhash_lsh_verified"](spark, SF_DIR).toPandas()
    e = set(map(tuple, exact[["doc_a", "doc_b"]].itertuples(index=False)))
    l = set(map(tuple, lsh[["doc_a", "doc_b"]].itertuples(index=False)))
    assert l <= e
    # and with 16 hashes / 4 bands at τ=0.5, recall should be substantial
    if e:
        assert len(l) >= len(e) * 0.5
