"""Input sources: the pages corpus in its batch and streaming forms."""

from openalex_neo4j_spark.sources.pages import (  # noqa: F401
    read_pages,
    read_pages_stream,
    synthesize_pages,
)
