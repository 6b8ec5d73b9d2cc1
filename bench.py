"""Benchmark harness.

Default mode (driver contract): run the headline suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extraction": {...}}

--scaling mode (BASELINE.json scaling criterion): run the identical
extraction job at local[8] and local[32] over the same pre-materialized
parquet corpus, report turns/sec at both + scaling efficiency
(eff = (T8/T32) / (32/8) throughput form: eff = (thr32/thr8)/4) into
BENCH/BASELINE.md. Efficiency >= 0.8 is the pass bar.

Usage:
  python bench.py                 # driver mode
  python bench.py --scaling       # writes BENCH/BASELINE.md
  python bench.py --extraction-only --cpus 8 --corpus /tmp/x.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# corpus size for the extraction benchmark (turns)
EXTRACT_TURNS = int(os.environ.get("BENCH_EXTRACT_TURNS", "1200000"))
# fixed bucket count: the scaling pair must run the IDENTICAL job shape
EXTRACT_BUCKETS = int(os.environ.get("BENCH_EXTRACT_BUCKETS", "128"))
# physical task count (fixed across the scaling pair; ~8x the larger core
# count so tasks are small and stragglers smooth out)
EXTRACT_PARTITIONS = int(os.environ.get("BENCH_EXTRACT_PARTITIONS", "256"))
# scaling mode uses a larger corpus so fixed per-job costs (scan, shuffle
# setup, scheduler) amortize and the measurement reflects the parallel
# fraction — the quantity the 0.8 efficiency bar is about
SCALING_TURNS = int(os.environ.get("BENCH_SCALING_TURNS", "4800000"))


def _materialize(df) -> int:
    """Force full computation of every column (count() lets Catalyst prune
    projections; the noop sink does not)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _get_spark(cpus: int):
    from epstein_browser_spark.session import get_spark

    return get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)


def ensure_corpus(spark, path: str, n_turns: int) -> None:
    from epstein_browser_spark.synth import synth_transcripts_spark

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    synth_transcripts_spark(spark, n_turns).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)


def bench_extraction(spark, corpus_path: str, n_buckets: int = None) -> dict:
    from epstein_browser_spark.pipeline import extract_transcripts

    n_buckets = n_buckets or EXTRACT_BUCKETS
    tr = spark.read.parquet(corpus_path)
    n = tr.count()  # warm the file listing; excluded from timing
    # warmup pass: compile codegen, spawn+reuse Python workers — we measure
    # steady-state throughput, not JVM/worker cold start
    _materialize(extract_transcripts(tr.limit(20000), n_buckets=n_buckets,
                                     n_partitions=EXTRACT_PARTITIONS))
    t0 = time.time()
    out = extract_transcripts(tr, n_buckets=n_buckets,
                              n_partitions=EXTRACT_PARTITIONS)
    _materialize(out)
    sec = time.time() - t0
    return {"turns": n, "sec": round(sec, 3),
            "turns_per_sec": round(n / sec, 1)}


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from epstein_browser_spark.queries import QUERIES

    times = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
        print(f"  bench {name}: {times[name]}s", file=sys.stderr)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extraction-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument(
        "--corpus",
        default=f"/tmp/bench_transcripts_{EXTRACT_TURNS}.parquet",
    )
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    spark = _get_spark(args.cpus)
    ensure_corpus(spark, args.corpus, EXTRACT_TURNS)
    ext = bench_extraction(spark, args.corpus)

    if args.extraction_only:
        print(json.dumps({"cpus": args.cpus, "extraction": ext}))
        spark.stop()
        return

    qt = bench_queries(spark, args.sf_dir)
    spark.stop()
    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    total = round(sum(qt.values()) + ext["sec"], 3)
    print(json.dumps({
        "metric": "headline suite wall time (extraction + 31 queries)",
        "value": total,
        "unit": "sec",
        "queries": qt,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extraction": ext,
        "cpus": args.cpus,
    }))


def run_scaling(args) -> None:
    """local[8] vs local[32] on the identical corpus → BENCH/BASELINE.md."""
    corpus = f"/tmp/bench_transcripts_{SCALING_TURNS}.parquet"
    spark = _get_spark(32)
    ensure_corpus(spark, corpus, SCALING_TURNS)
    spark.stop()

    results = {}
    for cpus in (8, 32):
        cmd = [sys.executable, os.path.abspath(__file__), "--extraction-only",
               "--cpus", str(cpus), "--corpus", corpus]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)["extraction"]

    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# Scaling evidence (BASELINE.json criterion: efficiency >= 0.8 "
            "from N to 4N parallelism)\n\n"
            "Identical extraction job (read parquet -> repartition on "
            "hash(conv_id) -> sortWithinPartitions -> mapInPandas extract -> "
            "materialize all columns) over the same pre-materialized "
            f"{results[8]['turns']}-turn corpus, in separate JVMs.\n\n"
            "| parallelism | turns | wall sec | turns/sec |\n"
            "|---|---|---|---|\n"
            f"| local[8]  (N)  | {results[8]['turns']} | {results[8]['sec']} "
            f"| {thr8} |\n"
            f"| local[32] (4N) | {results[32]['turns']} | {results[32]['sec']} "
            f"| {thr32} |\n\n"
            f"**speedup 8→32 = {thr32 / thr8:.2f}x, scaling efficiency = "
            f"{eff:.3f}** ({'PASS' if eff >= 0.8 else 'FAIL'} vs the 0.8 bar)\n"
        )
    print(json.dumps({
        "metric": "extraction scaling efficiency local[8]->local[32]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "thr_local8": thr8,
        "thr_local32": thr32,
    }))


if __name__ == "__main__":
    main()
