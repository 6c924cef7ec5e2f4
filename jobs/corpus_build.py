"""End-to-end corpus build: extract -> dedup -> decontaminate -> scrub ->
mix -> pack, lineage-committed per stage with crash-resume.

This is the job a 100 TB training-data user actually runs: every operator
the engine exposes in isolation, chained under ONE resume discipline.
Composition mirrors the reference's batch pipeline shape (markdown_agent
batch loop -> per-file convert -> optimize -> validate -> summary) lifted to
corpus scale: extraction reuses `lineage.run_extraction_job`'s wave/commit
protocol (part-level resume INSIDE the stage), and every downstream stage
commits one lineage row to a stage table after its output parquet lands —
so a killed job resumes at stage granularity without recomputing committed
stages, and a crash BETWEEN data write and lineage append just rewrites that
stage (mode=overwrite, idempotent).

Stage chain and the operator each one exercises:

  1. extract       wave-committed fused-UDF extraction (part-level resume)
  2. assemble      skew-safe two-phase conversation assembly + source tag
  3. dedup_exact   content-hash keep-first
  4. dedup_near    MinHash/LSH candidate pairs -> connected components ->
                   cluster representatives survive
  5. decontaminate word-8-gram overlap vs a heldout/benchmark set (broadcast)
  6. scrub         PII redaction (6 families, chained Catalyst regexps)
  7. mix           per-source md5-threshold sampling rates
  8. pack          greedy sequence packing via distributed prefix sum

Scale notes (the 100 TB lens): every stage is a declarative DataFrame plan —
extraction is one ArrowEvalPython with zero shuffles, near-dup pair
enumeration is worker-side (no blocking self-join), the heldout set is
broadcast (no corpus shuffle), packing has no global sort. Stage outputs are
parquet dirs (Iceberg tables in production via the same Storage seam
lineage.py documents); the stage-lineage append is the only serial step.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGES: tuple[str, ...] = (
    "extract",
    "assemble",
    "dedup_exact",
    "dedup_near",
    "decontaminate",
    "scrub",
    "mix",
    "pack",
)

STAGE_LINEAGE_SCHEMA = (
    "run_id string, stage string, stage_idx int, status string, n_out long, "
    "committed_at double"
)


def _stage_lineage_dir(out_dir: str) -> str:
    return f"{out_dir}/stage_lineage"


def read_stage_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_stage_lineage_dir(out_dir))
    except Exception:  # first run: no lineage yet
        return None


def committed_stages(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """stage -> run_id that committed it (earliest commit wins per stage)."""
    lin = read_stage_lineage(spark, out_dir)
    if lin is None:
        return {}
    rows = (
        lin.where(F.col("status") == "committed")
        .groupBy("stage")
        .agg(F.min_by("run_id", "committed_at").alias("run_id"))
        .collect()
    )
    return {r.stage: r.run_id for r in rows}


def _commit_stage(
    spark: SparkSession, out_dir: str, run_id: str, stage: str, n_out: int
) -> None:
    row = spark.createDataFrame(
        [(run_id, stage, STAGES.index(stage), "committed", n_out, time.time())],
        STAGE_LINEAGE_SCHEMA,
    )
    row.coalesce(1).write.mode("append").parquet(_stage_lineage_dir(out_dir))


def stage_dir(out_dir: str, stage: str) -> str:
    return f"{out_dir}/{stage}"


def run_corpus_build(
    spark: SparkSession,
    transcripts_df: DataFrame,
    heldout_df: DataFrame,
    out_dir: str,
    n_parts: int = 8,
    n_waves: int = 2,
    mix_weights: dict[str, float] | None = None,
    mix_default: float = 1.0,
    pack_budget: int = 2048,
    minhash: tuple[int, int, int, str] = (32, 8, 5, "md5"),
    decontam_k: int = 8,
    heldout_text_col: str = "text",
    mode: str = "agent",
    run_id: str | None = None,
    fail_after_stage: str | None = None,
) -> dict:
    """Run (or resume) the full corpus build. Returns a report dict.

    ``fail_after_stage`` injects a crash AFTER that stage's commit — the
    resumability test hook, mirroring run_extraction_job's fail_after_wave.
    A resumed run (same ``out_dir``) skips committed stages entirely; the
    extract stage additionally resumes at part granularity through
    run_extraction_job's own lineage.
    """
    from docling_gfcr_spark import lineage, pipeline
    from docling_gfcr_spark.operators import dedup, sampling, text_analysis

    if fail_after_stage is not None and fail_after_stage not in STAGES:
        raise ValueError(f"unknown stage {fail_after_stage!r}")
    run_id = run_id or uuid.uuid4().hex[:12]
    n_hashes, bands, k, hash_fn = minhash
    done = committed_stages(spark, out_dir)
    ran: list[str] = []
    skipped = [s for s in STAGES if s in done]

    def _read(stage: str) -> DataFrame:
        return spark.read.parquet(stage_dir(out_dir, stage))

    def _publish(stage: str, df: DataFrame) -> None:
        """Land the stage output, then commit its lineage row. n_out is
        counted from the files actually written (the committed truth, not
        the plan we hoped to write)."""
        df.write.mode("overwrite").parquet(stage_dir(out_dir, stage))
        n_out = _read(stage).count()
        _commit_stage(spark, out_dir, run_id, stage, n_out)
        ran.append(stage)
        if fail_after_stage == stage:
            raise RuntimeError(f"injected crash after stage {stage}")

    # -- 1. extract: wave-committed, part-level resume inside the stage ----
    if "extract" not in done:
        lineage.run_extraction_job(
            spark, transcripts_df, stage_dir(out_dir, "extract"),
            n_parts=n_parts, n_waves=n_waves, mode=mode, run_id=run_id,
        )
        n_out = lineage.read_extracted(spark, stage_dir(out_dir, "extract")).count()
        _commit_stage(spark, out_dir, run_id, "extract", n_out)
        ran.append("extract")
        if fail_after_stage == "extract":
            raise RuntimeError("injected crash after stage extract")

    # -- 2. assemble: one doc per conversation + its source tag ------------
    if "assemble" not in done:
        ex = lineage.read_extracted(spark, stage_dir(out_dir, "extract")).drop("part_id")
        docs = pipeline.assemble_conversations(ex)
        src = ex.groupBy("conv_id").agg(F.min_by("tool", "turn_idx").alias("source"))
        _publish("assemble", docs.join(src, "conv_id"))

    # -- 3. exact dedup: content-hash keep-first ---------------------------
    if "dedup_exact" not in done:
        _publish(
            "dedup_exact",
            dedup.exact_dedup_keep(_read("assemble"), text_col="conv_text", id_col="conv_id"),
        )

    # -- 4. near dedup: LSH pairs -> connected components -> keep reps -----
    if "dedup_near" not in done:
        docs = _read("dedup_exact")
        pairs = dedup.minhash_lsh_pairs(
            docs, text_col="conv_text", id_col="conv_id",
            n_hashes=n_hashes, bands=bands, k=k, hash_fn=hash_fn,
        )
        if pairs.take(1):
            comps = dedup.connected_components(pairs)
            losers = comps.where(F.col("node") != F.col("comp")).select(
                F.col("node").alias("conv_id")
            )
            docs = docs.join(F.broadcast(losers), "conv_id", "left_anti")
        _publish("dedup_near", docs)

    # -- 5. decontaminate: drop docs sharing any word k-gram with heldout --
    if "decontaminate" not in done:
        docs = _read("dedup_near")
        held = heldout_df.select(F.col(heldout_text_col).alias("conv_text"))
        contaminated = sampling.ngram_decontaminate(
            docs, held, text_col="conv_text", id_col="conv_id", k=decontam_k
        ).select("conv_id")
        _publish("decontaminate", docs.join(F.broadcast(contaminated), "conv_id", "left_anti"))

    # -- 6. scrub: PII redaction, text carried forward ---------------------
    if "scrub" not in done:
        docs = _read("decontaminate")
        _publish(
            "scrub",
            docs.withColumn(
                "conv_text", text_analysis.pii_redacted_text("conv_text")
            ),
        )

    # -- 7. mix: per-source deterministic sampling rates -------------------
    if "mix" not in done:
        docs = _read("scrub")
        pred = sampling.source_mixing_predicate(
            mix_weights or {}, mix_default, source_col="source",
            id_col="conv_id", salt="mix",
        )
        _publish("mix", docs.where(pred))

    # -- 8. pack: greedy sequence packing (hash order: string ids) ---------
    if "pack" not in done:
        docs = _read("mix").withColumn(
            "n_tokens", text_analysis.token_count_ws("conv_text")
        )
        packed = sampling.pack_sequences(
            docs, budget=pack_budget, id_col="conv_id",
            token_col="n_tokens", order_by="hash",
        )
        _publish("pack", packed)

    packed_rows = _read("pack").count()
    return {
        "run_id": run_id,
        "stages_run": ran,
        "stages_skipped_on_resume": skipped,
        "packed_rows": packed_rows,
    }


def read_packed(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(stage_dir(out_dir, "pack"))


def main() -> None:
    """Cluster entrypoint.

    Submit:
        spark-submit --py-files dist/docling_gfcr_spark.zip jobs/corpus_build.py \
            --input <transcripts parquet/table> --heldout <benchmark parquet> \
            --output <job root> --n-parts 4096 --waves 64 \
            [--mix html=0.6 --mix json=0.5] [--pack-budget 4096] [--run-id r42]

    On restart with the same --output, committed stages are skipped; the
    extract stage resumes at part granularity. Local smoke: --local-cores N
    --synth-convs M.
    """
    import argparse
    import json
    import os
    import sys

    try:
        import docling_gfcr_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path")
    ap.add_argument("--table", help="catalog table name instead of --input")
    ap.add_argument("--heldout", help="heldout/benchmark parquet (text column)")
    ap.add_argument("--heldout-text-col", default="text")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-parts", type=int, default=4096)
    ap.add_argument("--waves", type=int, default=64)
    ap.add_argument("--mode", choices=["agent", "cli"], default="agent")
    ap.add_argument("--mix", action="append", default=[], metavar="SOURCE=RATE")
    ap.add_argument("--mix-default", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=4096)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--local-cores", type=int, default=0, help="local smoke mode")
    ap.add_argument("--synth-convs", type=int, default=0, help="generate synthetic input")
    args = ap.parse_args()

    if args.local_cores:
        from docling_gfcr_spark.session import get_spark

        spark = get_spark(app_name="corpus_build", cores=args.local_cores)
    else:
        from pyspark.sql import SparkSession as _SS

        spark = _SS.builder.appName("docling_gfcr_corpus_build").getOrCreate()
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from docling_gfcr_spark import io, transcripts

    if args.synth_convs:
        input_df = transcripts.make_transcripts(spark, args.synth_convs, seed=42)
    elif args.table:
        input_df = spark.read.table(args.table)
    elif args.input:
        input_df = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input/--table/--synth-convs required")
    io.validate_input_schema(input_df)
    if args.heldout:
        heldout_df = spark.read.parquet(args.heldout)
    else:  # no benchmark set: decontamination is a no-op against empty
        heldout_df = spark.createDataFrame([], f"{args.heldout_text_col} string")
    mix_weights = {}
    for spec in args.mix:
        src, _, rate = spec.partition("=")
        mix_weights[src] = float(rate)

    report = run_corpus_build(
        spark, input_df, heldout_df, args.output,
        n_parts=args.n_parts, n_waves=args.waves,
        mix_weights=mix_weights, mix_default=args.mix_default,
        pack_budget=args.pack_budget, mode=args.mode,
        heldout_text_col=args.heldout_text_col, run_id=args.run_id,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
