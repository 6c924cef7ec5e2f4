from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_gfcr_spark import io, pipeline, transcripts


def test_validate_input_schema_accepts_generator(spark):
    tdf = transcripts.make_transcripts(spark, 3, seed=1, parallelism=1)
    assert io.validate_input_schema(tdf) is tdf


def test_validate_input_schema_rejects_with_diff(spark):
    bad = spark.createDataFrame([(1, "x")], "conv_id int, text string")
    with pytest.raises(TypeError) as e:
        io.validate_input_schema(bad)
    msg = str(e.value)
    assert "conv_id is int" in msg and "missing column turn_idx" in msg


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    tdf = transcripts.make_transcripts(spark, 40, seed=4, parallelism=4)
    ex = pipeline.extract_turns(tdf).select("conv_id", "turn_idx", "quality_score")
    io.write_bucketed(ex, "t_left", str(tmp_path / "l"), "conv_id", n_buckets=8)
    io.write_bucketed(
        ex.groupBy("conv_id").agg(F.count("*").alias("n")),
        "t_right",
        str(tmp_path / "r"),
        "conv_id",
        n_buckets=8,
    )
    joined = (
        spark.table("t_left")
        .join(spark.table("t_right").hint("merge"), "conv_id")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join must be co-located (no shuffle)"
    assert joined.count() == ex.count()
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """Compaction: 64 tiny files -> byte-sized-down file count, provably
    lossless (row count + content digest unchanged)."""
    from pyspark.sql import functions as F

    from docling_gfcr_spark import io as gio
    from docling_gfcr_spark import transcripts

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    tdf = transcripts.make_transcripts(spark, 40, mean_turns=5, seed=17, parallelism=4)
    tdf.repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/part-*")) == 64

    report = gio.compact_parquet(spark, src, dst, target_mb=256)
    files_out = glob.glob(dst + "/part-*")
    assert len(files_out) == report["files_out"] == 1  # tiny corpus -> one file
    assert report["bytes_in"] > 0

    def digest(path):
        return (
            spark.read.parquet(path)
            .agg(F.sum(F.crc32(F.concat_ws("|", "conv_id", "turn_idx", "text")).cast("decimal(38,0)")))
            .collect()[0][0]
        )

    assert spark.read.parquet(dst).count() == tdf.count() == report["n_rows"]
    assert digest(src) == digest(dst)


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    """mode('overwrite') on the directory being read would delete the source
    mid-job (round-4 ADVICE finding) — same resolved path must raise."""
    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="differ from src_dir"):
        io.compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="differ from src_dir"):
        io.compact_parquet(spark, src, "file:" + src + "/")
