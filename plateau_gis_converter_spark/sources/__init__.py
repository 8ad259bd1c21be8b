"""Sources: deterministic fixture generators and table loaders.

The engine's production input is an Iceberg table of Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint). In this
sandbox there is no Iceberg catalog, so loaders fall back to Parquet; the
DataFrame-level plan is identical either way (``spark.read.format(...)``).
"""
