"""Paired A/B re-bench of a query band across two code trees (VERDICT r3
item 6: the q27-q39 driver-bench deltas needed isolated, same-minute
paired measurement before being called regressions).

Usage:
    python tools/paired_bench.py <repoA> <repoB> [q27_... q28_...]

For each repetition the two variants run back-to-back in fresh
subprocesses (own JVM each) on the same sf dir; within a subprocess every
query gets one warmup run (codegen compile) and the min of two timed runs
(steady-state execution, the quantity that scales). Medians across
repetitions are reported per variant with the B/A ratio. Box must be
otherwise idle — this host drifts 30-50% between minutes, which is the
whole reason only PAIRED numbers are meaningful (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PAIRED_REPS", "3"))

WORKER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[%s]")
         .config("spark.sql.shuffle.partitions", "%s")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from epstein_browser_spark.queries import QUERIES
out = {}
for name in sys.argv[3:]:
    fn = QUERIES[name][0]
    fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    out[name] = round(min(times), 3)
print("PAIRED_RESULT " + json.dumps(out))
spark.stop()
""" % (CPUS, CPUS)


def run_variant(repo: str, queries: list[str]) -> dict[str, float]:
    r = subprocess.run(
        [sys.executable, "-c", WORKER, repo, SF_DIR, *queries],
        capture_output=True, text=True, timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PAIRED_RESULT "):
            return json.loads(line[len("PAIRED_RESULT "):])
    raise RuntimeError(f"variant {repo} produced no result:\n{r.stderr[-2000:]}")


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or [
        "q27_merge_classify", "q28_extract_plain", "q29_extract_multimode",
        "q30_nav_transcripts", "q35_string_funcs", "q38_cosine_pairs_lsh",
        "q39_search_page",
    ]
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for rep in range(REPS):
        a_runs.append(run_variant(repo_a, queries))
        b_runs.append(run_variant(repo_b, queries))
        print(f"rep {rep + 1}/{REPS}: A={a_runs[-1]} B={b_runs[-1]}",
              file=sys.stderr)
    result = {}
    for q in queries:
        a = statistics.median(r[q] for r in a_runs)
        b = statistics.median(r[q] for r in b_runs)
        result[q] = {"a_median": a, "b_median": b,
                     "ratio_b_over_a": round(b / a, 3),
                     "a_runs": [r[q] for r in a_runs],
                     "b_runs": [r[q] for r in b_runs]}
    print(json.dumps({"repo_a": repo_a, "repo_b": repo_b, "sf_dir": SF_DIR,
                      "reps": REPS, "queries": result}))


if __name__ == "__main__":
    main()
