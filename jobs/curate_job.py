"""spark-submit entrypoint for the end-to-end curation pipeline
(extract → dedup keep-policy → stats/langid → split → manifests).

Cluster usage:

  spark-submit --master <cluster> \\
      --py-files dist/epstein_browser_spark.zip \\
      jobs/curate_job.py \\
      --input  <transcripts parquet/Iceberg path> \\
      --output <output dir> \\
      --buckets 16384 --partitions 32768 --salt 4 \\
      --near-threshold 0.7 --snapshot <input snapshot id>

Resumable: rerunning with the same --output and --snapshot skips completed
stages (and, inside the extract stage, completed buckets).

Incremental ingest: ``--increment`` curates ONLY the --input batch against
the existing --output corpus (content-hash + minhash-index probing; see
curation.run_curation_increment) and appends it under
curated_incr/snap=<snapshot>/; --snapshot is required and identifies the
batch (a retry of the same snapshot is idempotent).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--salt", type=int, default=1)
    ap.add_argument("--near-threshold", type=float, default=0.7)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--snapshot", default="unversioned")
    ap.add_argument("--increment", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "epstein_browser_spark.curate"
    ).getOrCreate()

    from epstein_browser_spark.curation import (
        run_curation,
        run_curation_increment,
    )

    if args.increment:
        if args.snapshot == "unversioned":
            ap.error("--increment requires an explicit --snapshot")
        metrics = run_curation_increment(
            spark,
            spark.read.parquet(args.input),
            args.output,
            snapshot=args.snapshot,
            n_buckets=args.buckets,
            salt=args.salt,
            n_partitions=args.partitions,
            near_threshold=args.near_threshold,
            redact_pii=args.redact_pii,
            resume=not args.no_resume,
        )
    else:
        metrics = run_curation(
            spark,
            spark.read.parquet(args.input),
            args.output,
            n_buckets=args.buckets,
            salt=args.salt,
            n_partitions=args.partitions,
            near_threshold=args.near_threshold,
            redact_pii=args.redact_pii,
            resume=not args.no_resume,
            input_snapshot=args.snapshot,
        )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
