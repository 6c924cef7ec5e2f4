"""SparkSession factory tuned for the extraction engine.

Local-mode defaults mirror what the cluster deployment sets via spark-submit:
AQE on (runtime shuffle coalescing + skew-join splitting), Arrow on (every
Python kernel crosses the JVM boundary as Arrow batches), UTC session TZ
(oracle comparability), shuffle partitions sized to cores locally (on a real
cluster: 2-3x total executor cores, or rely on AQE coalescing from a higher
initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docling_gfcr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource V2 filter pushdown (sources/transcripts_source.py
        # prunes its generated id-range from pushed conv_id predicates)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # bigger Arrow batches amortize the JVM<->Python boundary for the
        # fused extraction UDF; payloads are ~KB-sized strings
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
