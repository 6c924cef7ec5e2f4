#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (sandbox stand-in for N vs 4N executors).

Runs the IDENTICAL extraction job (same input parquet, same code) at two
local parallelism levels in separate processes (fresh JVM each), measures
extracted-turns/sec, and writes BENCH.md with both throughputs and the
scaling efficiency  eff = (tps_hi / tps_lo) / (cores_hi / cores_lo).

Usage: python tools/scaling_bench.py [lo_cores hi_cores] (default 8 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
N_CONV = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "60000"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from docling_gfcr_spark.session import get_spark
from docling_gfcr_spark import pipeline

cores = int(sys.argv[1]); path = sys.argv[2]
# 16 MB splits: the benchmark corpus is ~1-2 GB, so default 128 MB splits
# would give fewer tasks than cores and the high-parallelism run could never
# engage its extra cores (a 100 TB table has millions of splits; this knob
# only matters for the small corpus)
spark = get_spark(app_name=f"scale{{cores}}", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)}})
tdf = spark.read.parquet(path)
n = tdf.count()
print(f"input partitions: {{tdf.rdd.getNumPartitions()}}", file=sys.stderr)
# warmup a small slice so JVM/codegen/Arrow startup is off the clock
pipeline.extract_turns(tdf.limit(512)).write.mode("overwrite").format("noop").save()
t0 = time.time()
pipeline.extract_turns(tdf, mode="agent").write.mode("overwrite").format("noop").save()
sec = time.time() - t0
print(json.dumps({{"cores": cores, "n_turns": n, "sec": round(sec, 2),
                   "turns_per_sec": round(n / sec, 1)}}))
spark.stop()
"""


def materialize() -> str:
    path = os.path.join(CACHE, f"transcripts_{N_CONV}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from docling_gfcr_spark import transcripts
        from docling_gfcr_spark.session import get_spark

        spark = get_spark(app_name="gen", cores=16)
        transcripts.make_transcripts(
            spark, N_CONV, mean_turns=8, seed=42, mega_every=200, skew_factor=40, parallelism=256
        ).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def run_at(cores: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), path],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo, hi = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) == 3 else (8, 32)
    path = materialize()
    r_lo, r_hi = run_at(lo, path), run_at(hi, path)
    speedup = r_hi["turns_per_sec"] / r_lo["turns_per_sec"]
    eff = speedup / (hi / lo)
    report = {
        "lo": r_lo,
        "hi": r_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — extraction throughput & scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 moving from N to
4N executors. No real cluster exists in this sandbox, so per the driver's
instruction the same job (same input, same code) runs at two local
parallelism levels; a fresh JVM per run, warmup excluded from timing.

Corpus: {r_lo["n_turns"]:,} turns ({N_CONV} conversations, deterministic seed 42,
mega-conversation skew planted every 200th conv at 40x turns).
Job: parquet scan -> fused-UDF extraction (route/extract/optimize/validate)
-> noop sink (full materialization of every extracted turn).

| parallelism | wall sec | extracted turns/sec |
|---|---|---|
| local[{lo}]  (N)  | {r_lo["sec"]} | {r_lo["turns_per_sec"]:,} |
| local[{hi}] (4N) | {r_hi["sec"]} | {r_hi["turns_per_sec"]:,} |

**Speedup {lo}->{hi} cores: {speedup:.2f}x — scaling efficiency
{eff:.3f}** (criterion >= 0.8: {"MET" if eff >= 0.8 else "NOT met"}).

Why it scales: the extraction path has zero shuffles (scan -> one
ArrowEvalPython stage -> sink), so throughput is bounded by per-core kernel
work; Python workers scale with cores (one per task thread). Skewed
mega-conversations don't serialize the pipeline because per-turn extraction
is order-free; ordering/assembly stages use salted repartition
(docling_gfcr_spark/pipeline.py).

Reproduce: `python tools/scaling_bench.py {lo} {hi}`.
""")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
