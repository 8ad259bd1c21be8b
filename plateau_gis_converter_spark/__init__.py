"""plateau_gis_converter_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query/data-processing capabilities of
fossabot/plateau-gis-converter (reference at /root/reference, read-only).

NOT a port: the reference is a single-machine Rust streaming dataflow
(Source ==> Transformer ==> Sink over bounded channels,
``nusamai/src/pipeline/runner.rs``); this engine re-expresses the same
operator semantics as declarative Spark DataFrame plans so Catalyst/Tungsten
pick the physical strategy and the job scales to 1000-executor clusters.

Layout
------
kernels/    pure-NumPy math kernels (tiling scheme, Hilbert IDs, mercator,
            geojson-vt clipping, point-in-polygon, MVT & GPKG encoders) —
            bit-compatible with the reference, unit-tested against the
            reference's own golden fixtures.
sources/    deterministic fixture generators (Common-Crawl-style ``pages``
            table, tokyo23-ku-style ``boundaries`` polygons) and loaders.
operators/  DataFrame-level operators: geocode, tile assignment, spatial
            join (broadcast cell join + exact PIP refine), kNN, the
            reference's Transformer chain (flatten/rename/LOD/jsonify/...),
            dedup/similarity/text-analysis for training-data pipelines.
functions/  Catalyst column-expression helpers (pure `pyspark.sql.functions`
            compositions — the JVM fast path).
sinks/      MVT / GeoPackage / GeoJSON encoders as grouped pandas UDFs.
plans/      schema-threaded stage composition + lineage/checkpointing.
streaming/  Structured Streaming wrappers (the reference is batch-only;
            these cover the bounded-channel backpressure semantics).
"""

__version__ = "0.1.0"
