"""Streaming variants of the engine's operators.

* ``streaming_tile_counts`` — readStream → geocode → tile assign → windowed
  per-tile counts with a watermark (the streaming analog of the MVT sink's
  per-tile aggregation).
* ``streaming_sessionize`` — session windows per user (the batch analog is
  plans/entry_queries.q_events_sessionize).

Tested with the rate / file sources in tests/test_streaming.py; production
would swap in Kafka with identical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo
from ..operators.geocode import LAT_PATTERN, LNG_PATTERN


def streaming_geocode(stream: DataFrame, text_col: str = "text") -> DataFrame:
    lat_s = F.regexp_extract(F.col(text_col), LAT_PATTERN, 1)
    lng_s = F.regexp_extract(F.col(text_col), LNG_PATTERN, 1)
    return (stream
            .withColumn("lat_udeg", F.when(lat_s != "", lat_s.cast("bigint")))
            .withColumn("lng_udeg", F.when(lng_s != "", lng_s.cast("bigint"))))


def streaming_tile_counts(stream: DataFrame, zoom: int = 12,
                          window: str = "1 minute",
                          watermark: str = "2 minutes",
                          ts_col: str = "warc_ts") -> DataFrame:
    """Windowed per-tile page counts over an unbounded page stream."""
    z = F.lit(zoom)
    geocoded = streaming_geocode(stream).where(
        F.col("lng_udeg").isNotNull() & F.col("lat_udeg").isNotNull())
    mx = geo.mercator_mx(geo.udeg_to_deg(F.col("lng_udeg")))
    my = geo.mercator_my(geo.udeg_to_deg(F.col("lat_udeg")))
    tiled = (geocoded.withColumn("x", geo.tile_x(z, mx))
             .withColumn("y", geo.tile_y(z, my))
             .withColumn(ts_col, F.col(ts_col).cast("timestamp")))  # NTZ→LTZ
    return (tiled.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), F.col("x"), F.col("y"))
            .agg(F.count(F.lit(1)).alias("n_pages")))


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes",
                         ts_col: str = "ts") -> DataFrame:
    """Session windows per user with watermark-bounded state."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (events.withWatermark(ts_col, "1 hour")
            .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value")))
