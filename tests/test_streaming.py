"""Structured Streaming surface tests (file source -> memory sink, drained
synchronously with processAllAvailable)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from docling_gfcr_spark import pipeline, streaming, transcripts

SF = "/root/testdata/sf0.001"


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    tdf = transcripts.make_transcripts(spark, 8, mean_turns=4, seed=3, parallelism=2)
    tdf.write.mode("overwrite").parquet(src)

    out = streaming.run_stream_to_memory(
        spark, streaming.stream_extract(spark, src), "stream_extract_t"
    )
    got = (
        out.select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    batch = (
        pipeline.extract_turns(spark.read.parquet(src), mode="agent")
        .select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)


def test_windowed_event_counts_match_batch_bucketing(spark, tmp_path):
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF}/events.parquet").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(streaming.EVENTS_SCHEMA).format("parquet").load(src)
    )
    agg = streaming.windowed_event_counts(stream, window="5 minutes")
    got = streaming.run_stream_to_memory(spark, agg, "stream_win_t").toPandas()

    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.date_format(
                F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 300) * 300),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch)


def test_stateful_turn_progress_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-conversation state across micro-batches:
    feed two file batches, assert totals accumulate."""
    src = str(tmp_path / "stateful_src")
    import os

    os.makedirs(src, exist_ok=True)
    tdf = transcripts.make_transcripts(spark, 6, mean_turns=5, seed=4, parallelism=2)
    half1 = tdf.where(F.col("turn_idx") % 2 == 0)
    half2 = tdf.where(F.col("turn_idx") % 2 == 1)
    half1.coalesce(1).write.mode("overwrite").parquet(src + "/b1")

    stream = (
        spark.readStream.schema(transcripts.SCHEMA).format("parquet").load(src + "/b*")
    )
    out = streaming.stateful_turn_progress(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_t")
        .start()
    )
    q.processAllAvailable()
    half2.coalesce(1).write.mode("overwrite").parquet(src + "/b2")
    q.processAllAvailable()
    q.stop()

    res = spark.table("stateful_t").toPandas()
    # last emission per conv must equal the full per-conv totals
    final = res.sort_values("n_batches").groupby("conv_id").last()
    want = tdf.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    for conv_id, row in final.iterrows():
        assert row.n_turns == want[conv_id], conv_id
        assert row.n_batches >= 2  # state genuinely crossed micro-batches
