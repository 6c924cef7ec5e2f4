"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2B: no streams anywhere), so the
batch pipeline is the core product; this module exposes the same extraction
semantics over a stream for ingest-time deployment, plus watermarked windowed
aggregation over an event stream — the two standard streaming shapes.

Local tests drive these with a file source + memory sink +
``processAllAvailable()`` (synchronous drain), per the Spark docs pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_gfcr_spark import pipeline

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_extract(spark: SparkSession, input_dir: str, schema: str | None = None) -> DataFrame:
    """Streaming extraction: same fused UDF, readStream->transform.

    The extraction stage is stateless (per-turn equality invariant), so it
    composes with any trigger/sink; ordering/assembly belong downstream in a
    batch compaction pass, as in the Lambda-ish layout the lineage table
    implies.
    """
    from docling_gfcr_spark.transcripts import SCHEMA as TRANSCRIPTS_SCHEMA

    src = (
        spark.readStream.schema(schema or TRANSCRIPTS_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    return pipeline.extract_turns(src, mode="agent")


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type (late data dropped
    after the watermark horizon)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_to_memory(spark: SparkSession, stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming DF to completion over the currently-available files
    and return the materialized result (memory sink)."""
    q = (
        stream_df.writeStream.outputMode("complete" if _has_agg(stream_df) else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().logical().toString()
