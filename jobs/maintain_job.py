"""spark-submit entrypoint for table lifecycle maintenance: bucket
compaction and incremental-snapshot retention.

  spark-submit --py-files dist/epstein_browser_spark.zip \\
      jobs/maintain_job.py compact --table <dir>/extract/data \\
          [--max-files-per-bucket 1]
  spark-submit ... jobs/maintain_job.py vacuum --output <curation out dir> \\
          --keep snap1 --keep snap2
  spark-submit ... jobs/maintain_job.py promote --output <curation out dir>

Compaction rewrites only over-fragmented buckets (streaming upserts and
repeated increments accrete a file per write); vacuum drops obsolete
incremental snapshots from the curated tree, the feature scratch, and the
band index, clearing their stage markers so the ids can be re-ingested;
promote folds every incremental snapshot into the base tables (the rebase
that keeps future increments probing ONE feature table / band index — run
quiesced, see curation.promote_increments).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    c.add_argument("--max-files-per-bucket", type=int, default=1)
    v = sub.add_parser("vacuum")
    v.add_argument("--output", required=True)
    v.add_argument("--keep", action="append", default=[])
    p = sub.add_parser("promote")
    p.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "epstein_browser_spark.maintain"
    ).getOrCreate()

    if args.cmd == "compact":
        from epstein_browser_spark.merge import compact_buckets

        out = compact_buckets(spark, args.table,
                              max_files_per_bucket=args.max_files_per_bucket)
    elif args.cmd == "vacuum":
        from epstein_browser_spark.curation import vacuum_snapshots

        out = vacuum_snapshots(spark, args.output, keep_snaps=args.keep)
    else:
        from epstein_browser_spark.curation import promote_increments

        out = promote_increments(spark, args.output)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
