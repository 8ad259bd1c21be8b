"""Round-5 wave 13: k-core decomposition, integer IDW surface, grouped
exact quantiles."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import raster as ra
from plateau_gis_converter_spark.operators import stats as st


# -------------------------------------------------------------- k-core

def test_k_core_peels_tail_into_fixpoint(spark):
    """K4 plus a pendant path: the 2-core is exactly the K4 + nothing of
    the path; peeling must cascade down the path."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in k4 + path])
    out = {r["id"]: r["deg"] for r in gr.k_core(edges, k=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(d == 3 for d in out.values())


def test_k_core_k3_drops_everything_sparse(spark):
    """A cycle has max core number 2 — the 3-core is empty."""
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in cyc])
    assert gr.k_core(edges, k=3).count() == 0


def test_k_core_whole_graph_when_degree_suffices(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in k4])
    out = gr.k_core(edges, k=3).collect()
    assert {r["id"] for r in out} == {0, 1, 2, 3}


def test_k_core_raises_on_exhaustion(spark):
    path = [(i, i + 1) for i in range(12)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in path])
    with pytest.raises(RuntimeError, match="did not converge"):
        gr.k_core(edges, k=2, max_iters=2)


# ----------------------------------------------------------------- idw

def test_idw_surface_single_sample_center_weight(spark):
    """One sample exactly at a cell center: w = 1e9 at its own cell,
    idw = the sample value in all 9 cells (only contributor)."""
    c = 40000
    df = spark.createDataFrame(
        [Row(lng_udeg=5 * c + c // 2, lat_udeg=7 * c + c // 2, value=123)])
    out = {(r["cx"], r["cy"]): (r["n_samples"], r["idw_value"])
           for r in ra.idw_surface(df, cell_udeg=c).collect()}
    assert len(out) == 9
    assert all(v == (1, 123) for v in out.values())


def test_idw_surface_weighted_blend_matches_hand_math(spark):
    """Two samples sharing a target cell: idw = (v1*w1 + v2*w2) // (w1+w2)
    with w = 1e9 // (1 + d2 // 1e6)."""
    c = 40000
    s1 = (5 * c + c // 2, 7 * c + c // 2, 100)       # at center of (5,7)
    s2 = (6 * c + c // 2, 7 * c + c // 2, 200)       # at center of (6,7)
    df = spark.createDataFrame(
        [Row(lng_udeg=lng, lat_udeg=lat, value=v) for lng, lat, v in
         [s1, s2]])
    out = {(r["cx"], r["cy"]): r["idw_value"]
           for r in ra.idw_surface(df, cell_udeg=c).collect()}
    w_self = 10**9
    w_far = 10**9 // (1 + (c * c) // 10**6)
    expect = (100 * w_self + 200 * w_far) // (w_self + w_far)
    assert out[(5, 7)] == expect
    # symmetric cell
    expect2 = (200 * w_self + 100 * w_far) // (w_self + w_far)
    assert out[(6, 7)] == expect2


# ----------------------------------------------------- group quantiles

def test_group_value_quantiles_match_per_group_sorting(spark):
    import math
    data = {"a": [5, 1, 9, 3, 7, 7, 2], "b": [10, 20], "c": [4]}
    rows = [Row(g=g, v=v) for g, vals in data.items() for v in vals]
    df = spark.createDataFrame(rows)
    qs = [250_000, 500_000, 900_000, 1_000_000]
    out = {(r["g"], r["q_ppm"]): r["value"]
           for r in st.group_value_quantiles(df, "g", "v", qs).collect()}
    for g, vals in data.items():
        sv = sorted(vals)
        for q in qs:
            tgt = (q * len(sv) + 999_999) // 1_000_000
            assert out[(g, q)] == sv[tgt - 1], (g, q)
    assert len(out) == len(qs) * len(data)


def test_group_value_quantiles_validates_inputs(spark):
    df = spark.createDataFrame([Row(g="a", v=1)])
    with pytest.raises(ValueError):
        st.group_value_quantiles(df, "g", "v", [])
    with pytest.raises(ValueError):
        st.group_value_quantiles(df, "g", "v", [0])
    with pytest.raises(ValueError):
        st.group_value_quantiles(df, "g", "v", [2_000_000])
