"""Round-5 wave 27: segment-intersection join, DAG layers, marching
squares."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import geometry as gm
from plateau_gis_converter_spark.operators import graph as gr
from plateau_gis_converter_spark.operators import raster as ra


# ------------------------------------------------------- segment predicate

def _segs(spark, rows):
    return spark.createDataFrame(
        [Row(seg_id=i, x1=a, y1=b, x2=c, y2=d)
         for i, (a, b, c, d) in enumerate(rows)])


def _pairs(spark, a_rows, b_rows, **kw):
    out = gm.segment_intersections(_segs(spark, a_rows),
                                   _segs(spark, b_rows), **kw)
    return {(r["a_id"], r["b_id"]): r["proper"] for r in out.collect()}


def test_segment_predicate_truth_table(spark):
    a = [(0, 0, 10, 10),   # 0: diagonal
         (0, 0, 10, 0)]    # 1: horizontal
    b = [(0, 10, 10, 0),   # 0: crossing diagonal      -> proper with a0
         (5, 0, 5, 8),     # 1: T onto a1's interior   -> touch
         (10, 0, 20, 5),   # 2: shares a1's endpoint   -> touch
         (5, 0, 15, 0),    # 3: collinear overlap a1   -> touch
         (11, 0, 20, 0),   # 4: collinear disjoint     -> none
         (6, 0, 10, 2)]    # 5: bbox overlaps a0, stays below -> none
    got = _pairs(spark, a, b, cell_udeg=64)
    assert got[(0, 0)] == 1
    assert got[(1, 1)] == 0
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 0
    assert (1, 4) not in got
    assert (0, 5) not in got
    # b1 (vertical at x=5, y 0..8) also properly crosses a0 (y=x) at (5,5)
    assert got[(0, 1)] == 1


def test_segment_multi_cell_found_exactly_once(spark):
    # tiny cells force the long segment across ~26 cells; the crossing
    # pair must appear EXACTLY once (distinct collapses multi-cell hits)
    a = [(0, 0, 100, 1)]
    b = [(50, -10, 50, 10)]
    out = gm.segment_intersections(_segs(spark, a), _segs(spark, b),
                                   cell_udeg=4).collect()
    assert [(r["a_id"], r["b_id"], r["proper"]) for r in out] == [(0, 0, 1)]


def test_segment_negative_coords(spark):
    # the +2^31 shift must keep cell indexing exact below zero
    a = [(-100, -100, -90, -90)]
    b = [(-100, -90, -90, -100)]
    got = _pairs(spark, a, b, cell_udeg=7)
    assert got == {(0, 0): 1}


# ------------------------------------------------------------- dag layers

def _graph(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([Row(id=i) for i in node_ids])
    edges = spark.createDataFrame([Row(src=s, dst=d) for s, d in edge_pairs])
    return nodes, edges


def test_dag_layers_longest_path(spark):
    nodes, edges = _graph(spark, [1, 2, 3, 4, 5],
                          [(1, 2), (2, 3), (4, 3), (1, 3)])
    got = {r["id"]: r["layer"] for r in gr.dag_layers(nodes, edges).collect()}
    # 3's layer is the LONGEST chain (1->2->3), not the shortcut 1->3
    assert got == {1: 0, 2: 1, 3: 2, 4: 0, 5: 0}


def test_dag_layers_cycle_raises(spark):
    nodes, edges = _graph(spark, [1, 2], [(1, 2), (2, 1)])
    with pytest.raises(RuntimeError, match="cycle"):
        gr.dag_layers(nodes, edges, max_rounds=5)


# ------------------------------------------------------- marching squares

def _raster(spark, pixels, tile_px=16):
    rows = [Row(z=0, x=gx // tile_px, y=gy // tile_px,
                px=gx % tile_px, py=gy % tile_px, n_points=v)
            for gx, gy, v in pixels]
    return spark.createDataFrame(rows)


def test_contour_saddle_and_threshold(spark):
    r = _raster(spark, [(0, 0, 3), (1, 1, 2),  # saddle at block (0,0)
                        (9, 9, 1)])            # below thr=2 -> ignored
    got = {(x["bx"], x["by"]): (x["case_id"], x["n_segments"])
           for x in ra.contour_cases(r, thr=2, tile_px=16).collect()}
    assert got[(0, 0)] == (9, 2)          # BL + TR diagonal saddle
    assert (8, 8) not in got and (9, 9) not in got
    # corner-only neighbours of the two set pixels
    assert got[(-1, -1)] == (8, 1)
    assert got[(1, 1)] == (1, 1)


def test_contour_full_block_suppressed(spark):
    r = _raster(spark, [(5, 5, 1), (6, 5, 1), (5, 6, 1), (6, 6, 1)])
    got = {(x["bx"], x["by"]): x["case_id"]
           for x in ra.contour_cases(r, thr=1, tile_px=16).collect()}
    assert (5, 5) not in got              # case 15: interior, no contour
    assert got[(4, 5)] == 2 + 8           # left edge block: BR + TR set
    assert all(c not in (0, 15) for c in got.values())
