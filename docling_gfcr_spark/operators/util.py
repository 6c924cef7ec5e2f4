"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan out an under-partitioned input before a per-row-expensive stage.

    Small parquet inputs (one file < maxPartitionBytes) arrive as a single
    partition, which would serialize shingling/hashing/scoring onto one core.
    At real scale inputs have thousands of splits and this is a no-op.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
