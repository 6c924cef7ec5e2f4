"""Custom `transcripts` data source (Python DataSource V2 API)."""

from __future__ import annotations

import pandas as pd

from docling_gfcr_spark import transcripts
from docling_gfcr_spark.sources import register_transcripts_source


def test_datasource_equals_generator_at_any_parallelism(spark):
    register_transcripts_source(spark)
    want = (
        transcripts.make_transcripts(spark, 25, mean_turns=5, seed=11, parallelism=3)
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    for par in (1, 4, 16):
        got = (
            spark.read.format("transcripts")
            .option("n_conv", 25).option("mean_turns", 5).option("seed", 11)
            .option("parallelism", par).load()
            .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_datasource_partition_count_and_pipeline_compose(spark):
    register_transcripts_source(spark)
    df = (
        spark.read.format("transcripts")
        .option("n_conv", 40).option("seed", 2).option("parallelism", 8).load()
    )
    assert df.rdd.getNumPartitions() == 8
    from docling_gfcr_spark import pipeline

    out = pipeline.extract_turns(df, mode="agent")
    assert out.where("success").count() > 0
