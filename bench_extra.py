"""Round-6 optimization harness — per-query isolation bench + plan capture.

bench.py is FROZEN for driver measurement; this file holds the extra
instrumentation guide §1 asks for: noop-sink isolation of individual
queries, .explain("formatted") capture into plans/r06/, and repeatable
before/after timing of the queries being optimized.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 q139_edit_near_dups q80_semdedup
  python bench_extra.py --plans q139_edit_near_dups        # dump plan only
  python bench_extra.py --all                              # whole registry once
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _get_spark(cpus: int):
    from epstein_browser_spark.session import get_spark

    return get_spark("bench-extra", master=f"local[{cpus}]",
                     shuffle_partitions=cpus)


def _warm(spark) -> None:
    df = spark.range(int(spark.conf.get("spark.sql.shuffle.partitions"))) \
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))

    def _ident(batches):
        yield from batches

    df.mapInPandas(_ident, df.schema).write.format("noop").mode(
        "overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", action="store_true",
                    help="dump explain('formatted') to plans/r06/<name>_<tag>.txt")
    ap.add_argument("--plan-tag", default="before")
    args = ap.parse_args()

    from epstein_browser_spark.queries import QUERIES

    names = list(QUERIES) if args.all else args.names
    for n in names:
        if n not in QUERIES:
            sys.exit(f"unknown query {n}")

    spark = _get_spark(args.cpus)
    _warm(spark)
    out = {}
    for name in names:
        fn, _sql = QUERIES[name]
        if args.plans:
            df = fn(spark, args.sf_dir)
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{args.plan_tag}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            print(f"  plan -> plans/r06/{name}_{args.plan_tag}.txt",
                  file=sys.stderr)
            continue
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench-extra {name}")
            t0 = time.time()
            _materialize(fn(spark, args.sf_dir))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"  {name}: {samples}", file=sys.stderr)
    spark.stop()
    if out:
        print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                          "queries": out}))


if __name__ == "__main__":
    main()
