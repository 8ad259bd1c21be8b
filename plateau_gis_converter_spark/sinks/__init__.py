"""Sinks: per-format encoders as grouped/batched pandas UDF stages."""
