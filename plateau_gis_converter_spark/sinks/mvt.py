"""MVT sink: the reference's slice → external-sort → per-tile encode dataflow
(nusamai/src/sink/mvt/mod.rs:121-478) as a Spark plan.

Stage mapping (SURVEY §2.1 S6, §2.6 O1-O8):

* slice                    — operators/tile_assign.slice_boundary_polygons
* external sort by tile_id — ``repartitionByRange("tile_id")`` +
  ``sortWithinPartitions`` : Spark's UnsafeExternalSorter spills exactly like
  the reference's 200 MiB ext-sort (mod.rs:237-257), but distributed.
* group consecutive        — ``groupBy("tile_id").applyInPandas(encode)``
  (mod.rs:259-268): hash-partition replaces sortedness dependence.
* per-tile encode          — kernels/mvt.make_tile_adaptive: detail 12..9
  descending until zlib size <= 500,000 B (mod.rs:286-336), quantize /
  simplify / command-encode / tags / djb2 id exactly as the reference.

Output is a DataFrame (z, x, y, tile_id, detail, n_features, pbf: binary)
— writing the z/x/y.pbf files is a trivial foreachPartition, kept separate
so tests can assert on tile bytes without touching the filesystem.

Within-tile feature order: the reference preserves arrival order, which is
HashMap/thread nondeterministic (SURVEY §7.4.2) — the engine sorts features
by (typename, feature_id) before encoding so tile bytes are deterministic;
row-parity with the reference is defined on canonically sorted rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import mvt as mvt_kernel

TILE_SCHEMA = T.StructType([
    T.StructField("tile_id", T.LongType()),
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("detail", T.IntegerType()),
    T.StructField("n_features", T.IntegerType()),
    T.StructField("pbf", T.BinaryType()),
])


def _encode_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
    (tile_id,) = key
    pdf = pdf.sort_values(["typename", "feature_id"], kind="mergesort")
    feats = []
    for rec in pdf.itertuples(index=False):
        attrs = []
        for k in sorted(rec.attributes):
            # typed tags (uint/sint/double/bool/string) like the reference's
            # convert_properties — see kernels/mvt.sniff_tag_value
            attrs.append((k, mvt_kernel.sniff_tag_value(rec.attributes[k])))
        feats.append({
            "layer": rec.typename,
            "feature_id": rec.feature_id,
            "mpoly": rec.mpoly,
            "attrs": attrs,
        })
    data, detail = mvt_kernel.make_tile_adaptive(feats)
    return pd.DataFrame([{
        "tile_id": tile_id,
        "z": int(pdf.iloc[0]["z"]),
        "x": int(pdf.iloc[0]["x"]),
        "y": int(pdf.iloc[0]["y"]),
        "detail": detail,
        "n_features": len(feats),
        "pbf": data,
    }])


def encode_tiles(sliced: DataFrame, range_partitions: int | None = None) -> DataFrame:
    """sliced(feature_id, typename, z, x, y, tile_id, mpoly, attributes)
    -> one row per tile with the encoded pbf.

    repartitionByRange on tile_id keeps zoom levels contiguous (Hilbert ids
    are zoom-contiguous) and co-locates each tile's features; AQE splits any
    skewed range at runtime.
    """
    parts = range_partitions or sliced.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    arranged = (sliced.repartitionByRange(int(parts), "tile_id")
                .sortWithinPartitions("tile_id"))
    return (arranged.groupBy("tile_id")
            .applyInPandas(_encode_tile, schema=TILE_SCHEMA))


def write_tiles(tiles: DataFrame, output_dir: str) -> int:
    """Write z/x/y.pbf files (mod.rs:303-306 layout). Returns tile count."""
    import os

    def write_partition(rows):
        for r in rows:
            path = os.path.join(output_dir, str(r.z), str(r.x))
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, f"{r.y}.pbf"), "wb") as f:
                f.write(bytes(r.pbf))
            yield r.tile_id

    return tiles.rdd.mapPartitions(write_partition).count()
