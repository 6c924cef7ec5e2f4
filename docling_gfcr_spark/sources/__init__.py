"""Custom Spark data sources (Python DataSource V2 API)."""

from docling_gfcr_spark.sources.transcripts_source import (
    TranscriptsDataSource,
    register_transcripts_source,
)

__all__ = ["TranscriptsDataSource", "register_transcripts_source"]
