#!/usr/bin/env python3
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

- relational / dedup / ANN headline queries at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
- the north-star extraction throughput (extracted turns/sec) over a
  deterministic synthetic transcripts corpus, reported under "throughput".

Scaling evidence across two parallelism levels lives in tools/scaling_bench.py
(writes BENCH.md) — run separately; this file stays fast for per-round runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "latest_order_per_customer",
    "events_sessionize",
    "events_hourly",
    "dedup_exact",
    "text_quality",
    "lang_id_docs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "emb_neardup_lsh",
    "asof_error_after_click",
    # round-3 training-data ops
    "pii_redaction",
    "pack_training_sequences",
    "ngram_decontamination",
    # round-4 ops
    "events_session_window",
    "skewed_hot_key_join",
    "quality_model_scores",
    "source_mixed_sample",
]

N_CONV_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))


def _materialize_transcripts(spark) -> str:
    """Generate-once, read-many: the extraction bench reads parquet like a
    real job reads its Iceberg table, so generation cost isn't measured."""
    path = os.path.join(CACHE, f"transcripts_{N_CONV_BENCH}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from docling_gfcr_spark import transcripts

        tdf = transcripts.make_transcripts(
            spark, N_CONV_BENCH, mean_turns=8, seed=42, mega_every=200, skew_factor=40,
            parallelism=CPUS * 2,
        )
        tdf.write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    from docling_gfcr_spark import pipeline
    from docling_gfcr_spark import queries as Q
    from docling_gfcr_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={
            # the sf0.1 tables and the bench corpus are single-digit-MB
            # parquet; default 128 MB splits would starve the cores
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    results: dict[str, float] = {}
    # per-entry timing samples (both passes): median + spread in the JSON let
    # round-over-round deltas separate code changes from host noise
    samples: dict[str, list[float]] = {}

    # warmup: JVM/codegen/Arrow path
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    def timed(fn, name: str) -> tuple[float, int]:
        """Best of two runs: this shared VM shows 10-20x single-run variance
        under noisy neighbors; min-of-2 keeps the per-round record from
        being hostage to one bad window. Raw samples are kept for the JSON."""
        times, n = [], 0
        for _ in range(2):
            t0 = time.time()
            n = fn()
            times.append(round(time.time() - t0, 3))
        samples[name] = times
        return min(times), n

    for name in HEADLINE:
        q = Q.QUERIES[name]
        results[name], n = timed(lambda: q(spark, SF_DIR).count(), name)
        print(f"# {name}: {results[name]}s ({n} rows)", file=sys.stderr)

    from docling_gfcr_spark.operators import dedup as _dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # minhash LSH pairs on the xxhash64 FAST path (the queries() entry uses
    # md5 band keys only because DuckDB must reproduce them; at scale you run
    # this variant — same plan, no hex-string materialization)
    results["dedup_minhash_pairs"], n = timed(
        lambda: _dedup.minhash_lsh_pairs(docs, n_hashes=32, bands=8, k=5, hash_fn="xxhash64").count(),
        "dedup_minhash_pairs",
    )
    print(f"# dedup_minhash_pairs: {results['dedup_minhash_pairs']}s ({n} rows)", file=sys.stderr)

    # scale-shaped n-gram jaccard (hot-shingle cap on): the uncapped oracle
    # variant is quadratic by design on this shared-vocab synthetic corpus
    results["dedup_ngram_capped"], n = timed(
        lambda: _dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5, hot_shingle_cap=100).count(),
        "dedup_ngram_capped",
    )
    print(f"# dedup_ngram_capped: {results['dedup_ngram_capped']}s ({n} rows)", file=sys.stderr)

    # north-star throughput: extracted turns/sec over parquet-backed transcripts
    tpath = _materialize_transcripts(spark)
    tdf = spark.read.parquet(tpath)
    n_turns = tdf.count()

    def extract_pass() -> float:
        t0 = time.time()
        # count() alone would let Catalyst prune the UDF; noop sink forces
        # full materialization of every extracted turn
        pipeline.extract_turns(tdf, mode="agent").write.mode("overwrite").format("noop").save()
        return time.time() - t0

    extract_pass()  # warmup: python-worker spawn + imports (per-executor one-off)
    # PINNED PROTOCOL (round 3): min-of-2 timed passes after one warmup —
    # the same rule as every query above — so round-over-round deltas are
    # apples-to-apples. (r2 used an adaptive up-to-6-pass min here, which
    # inflated the apparent r1->r2 win; do not drift again.)
    samples["extract_pipeline"] = [round(extract_pass(), 3), round(extract_pass(), 3)]
    extract_sec = min(samples["extract_pipeline"])

    # ordering + skew-safe two-phase conversation assembly (the shuffle path)
    def assemble_pass() -> int:
        ex = pipeline.extract_turns(tdf, mode="agent")
        pipeline.assemble_conversations(ex).write.mode("overwrite").format("noop").save()
        return 0

    results["assemble_conversations"], _n = timed(assemble_pass, "assemble_conversations")
    print(f"# assemble_conversations: {results['assemble_conversations']}s", file=sys.stderr)
    results["extract_pipeline"] = round(extract_sec, 3)
    turns_per_sec = round(n_turns / extract_sec, 1)
    print(f"# extraction: {n_turns} turns in {extract_sec:.1f}s = {turns_per_sec}/s", file=sys.stderr)

    total = round(sum(results.values()), 3)
    stats = {
        name: {
            "med": round(sorted(ts)[len(ts) // 2] if len(ts) % 2 else sum(sorted(ts)[len(ts) // 2 - 1 : len(ts) // 2 + 1]) / 2, 3),
            "spread": round(max(ts) - min(ts), 3),
        }
        for name, ts in samples.items()
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "passes": 2,  # pinned: min-of-2 for every entry incl. extraction
                "queries": results,
                "stats": stats,  # per-entry median + spread of the raw passes
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "throughput": {
                    "extracted_turns_per_sec": turns_per_sec,
                    "n_turns": n_turns,
                    "cpus": CPUS,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
