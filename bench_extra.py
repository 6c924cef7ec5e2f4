#!/usr/bin/env python3
"""Per-entry measurement harness for optimization work (guide §1).

bench.py is FROZEN for driver measurement; this file exists so individual
entries can be timed (same session conf, same .count()/noop methodology,
min-of-N) at any SF dir without paying for the whole suite, and so
.explain("formatted") plans can be dumped to plans/r08/.

Usage:
    python bench_extra.py [--sf DIR] [--passes N] [--plans SUFFIX] [entry ...]

With --plans <suffix>, each timed entry's formatted plan is written to
plans/r08/<entry>_<suffix>.txt (the judge checks plan claims against these).
No entries => list available entry names.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def build_entries(spark, sf_dir):
    """Name -> (make_df, run) mirroring bench.py's per-entry construction.

    make_df returns the DataFrame (for explain); run executes one timed pass
    with the same action bench.py uses (.count() for queries-style entries,
    noop sink for the pipeline entries, side-effecting call for commit).
    """
    import hashlib
    import tempfile

    from pyspark.sql import functions as F

    from docling_gfcr_spark import pipeline
    from docling_gfcr_spark import queries as Q
    from docling_gfcr_spark.operators import dedup as _dedup
    from docling_gfcr_spark.operators import sampling as _sampling
    from docling_gfcr_spark.operators import similarity as _similarity

    entries: dict[str, tuple] = {}

    for name in Q.QUERIES:
        def mk(q=Q.QUERIES[name]):
            return q(spark, sf_dir)
        entries[name] = (mk, lambda mk=mk: mk().count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def mk_minhash_fast():
        return _dedup.minhash_lsh_pairs(docs, n_hashes=32, bands=8, k=5, hash_fn="fast")
    entries["bench_minhash_fast"] = (mk_minhash_fast, lambda: mk_minhash_fast().count())

    def mk_semantic_prune():
        return _similarity.semantic_prune(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            text_col="text", id_col="doc_id", n_centroids=64, threshold=0.95,
        )
    entries["bench_semantic_prune"] = (mk_semantic_prune, lambda: mk_semantic_prune().count())

    def mk_ngram_capped():
        return _dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5, hot_shingle_cap=100)
    entries["bench_ngram_capped"] = (mk_ngram_capped, lambda: mk_ngram_capped().count())

    inc_new = docs.where(_sampling.sample_predicate(0.2, salt="incr"))
    inc_old = docs.where(~_sampling.sample_predicate(0.2, salt="incr"))
    itable = "benchx_incr_bands_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ipath = os.path.join(tempfile.gettempdir(), f"docling_gfcr_{itable}")

    def commit_run():
        _dedup.commit_minhash_bands(
            inc_old, itable, ipath, n_hashes=32, bands=8, k=5, hash_fn="xxhash64"
        )
        return 0
    entries["bench_incremental_commit"] = (None, commit_run)

    def mk_mine():
        return _dedup.incremental_minhash_pairs(
            spark, itable, inc_new, n_hashes=32, bands=8, k=5, hash_fn="xxhash64"
        )
    entries["bench_incremental_mine"] = (mk_mine, lambda: mk_mine().count())

    # band-keys-only probe: the signature scan without the pair join
    def mk_band_keys():
        return _dedup.minhash_band_keys(inc_old, n_hashes=32, bands=8, k=5, hash_fn="xxhash64")
    entries["probe_band_keys_xxhash64"] = (
        mk_band_keys,
        lambda: mk_band_keys().write.mode("overwrite").format("noop").save() or 0,
    )

    def _bench_corpus():
        from docling_gfcr_spark import transcripts
        n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
        path = os.path.join(
            REPO, ".bench_cache", f"transcripts_{n_conv}_{transcripts.generator_fingerprint()}"
        )
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            tdf = transcripts.make_transcripts(
                spark, n_conv, mean_turns=8, seed=42, mega_every=200, skew_factor=40,
                parallelism=64,
            )
            tdf.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def mk_assemble():
        ex = pipeline.extract_turns(_bench_corpus(), mode="agent")
        return pipeline.assemble_conversations(ex)
    entries["bench_assemble"] = (
        mk_assemble,
        lambda: mk_assemble().write.mode("overwrite").format("noop").save() or 0,
    )

    def mk_mega():
        n_mega, n_bg = 100_000, 2000
        mega = spark.range(n_mega).select(
            F.lit("mega").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.concat(F.lit("line "), F.col("id")).alias("extracted_text"),
        )
        bg = spark.range(n_bg * 8).select(
            F.concat(F.lit("bg-"), (F.col("id") % n_bg).cast("string")).alias("conv_id"),
            F.floor(F.col("id") / n_bg).cast("int").alias("turn_idx"),
            F.concat(F.lit("b"), F.col("id")).alias("extracted_text"),
        )
        return pipeline.assemble_conversations(mega.unionByName(bg))
    entries["bench_mega_skew"] = (
        mk_mega,
        lambda: mk_mega().write.mode("overwrite").format("noop").save() or 0,
    )

    def mk_extract():
        return pipeline.extract_turns(_bench_corpus(), mode="agent")
    entries["bench_extract"] = (
        mk_extract,
        lambda: mk_extract().write.mode("overwrite").format("noop").save() or 0,
    )

    return entries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="suffix: dump plans/r08/<entry>_<suffix>.txt")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("entries", nargs="*")
    args = ap.parse_args()

    from docling_gfcr_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        cores=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    entries = build_entries(spark, args.sf)
    if not args.entries:
        print("\n".join(entries))
        return

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()  # warmup

    out = {}
    for name in args.entries:
        mk, run = entries[name]
        if args.plans and mk is not None:
            os.makedirs(os.path.join(REPO, "plans", "r08"), exist_ok=True)
            df = mk()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(REPO, "plans", "r08", f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(name)
        times = []
        n = None
        for _ in range(args.passes):
            t0 = time.time()
            n = run()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "samples": times, "rows": n}
        print(f"# {name}: min {min(times)}s {times} rows={n}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
