"""Structured Streaming surface: continuous crawl ingestion."""

from openalex_neo4j_spark.streaming.ingest import (  # noqa: F401
    crawl_stats_stream,
    migrate_flat_layout,
    pages_stream,
    stream_ingest_mentions,
)
