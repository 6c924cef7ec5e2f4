"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001-scale
synthetic transcripts; ``queries()``/``oracle_sql()`` expose the full operator
inventory (see docling_gfcr_spark/queries.py for per-query notes on
cross-engine parity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from docling_gfcr_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic transcripts (input_hint schema) -> fused-UDF
    extraction -> stable turn ordering; driver checks rows>0 + stable schema."""
    from pyspark.sql import functions as F

    from docling_gfcr_spark import pipeline, transcripts

    tdf = transcripts.make_transcripts(
        spark, n_conv=100, mean_turns=6, seed=42, mega_every=25, skew_factor=10
    )
    ex = pipeline.extract_turns(tdf, mode="agent")
    return pipeline.with_stable_order(ex).select(
        "conv_id",
        "turn_idx",
        "rn",
        "role",
        "tool",
        "method",
        "success",
        "extracted_text",
        "n_spans",
        "quality_score",
        F.col("word_count").cast("long").alias("word_count"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
