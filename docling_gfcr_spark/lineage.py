"""Per-partition lineage checkpointing + resume.

North rule: "resumable from checkpoint with per-partition lineage + metrics —
a killed job resumes from the last committed partition without reprocessing."

Design (SURVEY.md §4.3): work is bucketed into ``n_parts`` stable logical
partitions by ``part_id = pmod(xxhash64(conv_id), n_parts)`` — a pure function
of the data, so the same row lands in the same part across runs and cluster
sizes. Parts are processed in waves; each wave

1. writes extracted rows under ``data/part_id=<p>/`` (dynamic partition
   overwrite — a re-run of an uncommitted part replaces, never duplicates);
2. then appends one lineage row per part ``(run_id, part_id, status, n_turns,
   nodes_classified, spans_emitted, parse_failures, committed_at)``.

A crash between (1) and (2) leaves data without lineage; resume reprocesses
that part and the overwrite makes it idempotent. On restart, committed parts
are excluded via a broadcast left-anti join — no reprocessing.

On a production cluster both tables are Iceberg (``writeTo(...).append()``
with atomic snapshot commits per wave); this module's storage layer is plain
parquet because the sandbox has no Iceberg runtime jar — the commit protocol,
resume logic, and table schemas are identical (storage is injected via paths).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_gfcr_spark import pipeline

LINEAGE_SCHEMA = (
    "run_id string, part_id int, status string, n_turns long, nodes_classified long, "
    "spans_emitted long, parse_failures long, errors long, committed_at double"
)


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn("part_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int"))


def committed_parts(spark: SparkSession, lineage_dir: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(lineage_dir)
            .where(F.col("status") == "committed")
            .select("part_id")
            .distinct()
            .collect()
        )
        return {r.part_id for r in rows}
    except Exception:  # first run: lineage table does not exist yet
        return set()


def run_extraction_job(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    n_parts: int = 64,
    n_waves: int = 4,
    mode: str = "agent",
    run_id: str | None = None,
    fail_after_wave: int | None = None,
) -> dict:
    """Wave-committed extraction with resume. Returns a run report dict.

    ``fail_after_wave`` is a crash-injection hook for resumability tests.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    data_dir, lineage_dir = f"{out_dir}/data", f"{out_dir}/lineage"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = committed_parts(spark, lineage_dir)
    todo = [p for p in range(n_parts) if p not in done]
    src = with_part_id(input_df, n_parts)

    waves = [todo[i::n_waves] for i in range(n_waves)]
    waves = [w for w in waves if w]
    processed: list[int] = []
    for wi, wave in enumerate(waves):
        wave_df = src.where(F.col("part_id").isin(wave))
        extracted = pipeline.extract_turns(wave_df.drop("part_id"), mode=mode)
        extracted = with_part_id(extracted, n_parts)
        # drop columns parquet can't round-trip cheaply is not needed — spans
        # nest fine; write partitioned so resume overwrites only its parts
        (
            extracted.repartition(max(len(wave), 1), "part_id")
            .write.mode("overwrite")
            .partitionBy("part_id")
            .parquet(data_dir)
        )
        agg = (
            spark.read.parquet(data_dir)
            .where(F.col("part_id").isin(wave))
            .groupBy("part_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum("n_nodes").alias("nodes_classified"),
                F.sum("n_spans").alias("spans_emitted"),
                F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
                F.sum((~F.col("success")).cast("long")).alias("errors"),
            )
        )
        # empty parts must still commit (else they would be retried forever)
        wave_parts = spark.createDataFrame([(p,) for p in wave], "part_id int")
        metrics = (
            wave_parts.join(agg, "part_id", "left")
            .na.fill(0)
            .withColumn("run_id", F.lit(run_id))
            .withColumn("status", F.lit("committed"))
            .withColumn("committed_at", F.lit(time.time()))
            .select(
                "run_id", "part_id", "status", "n_turns", "nodes_classified",
                "spans_emitted", "parse_failures", "errors", "committed_at",
            )
        )
        metrics.coalesce(1).write.mode("append").parquet(lineage_dir)
        processed.extend(wave)
        if fail_after_wave is not None and wi + 1 >= fail_after_wave:
            raise RuntimeError(f"injected crash after wave {wi + 1}")
    return {
        "run_id": run_id,
        "resumed_parts_skipped": sorted(done),
        "parts_processed": sorted(processed),
        "n_waves": len(waves),
    }


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/data")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/lineage")
