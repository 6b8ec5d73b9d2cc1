"""SparkSession builder tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "epstein_browser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Session with AQE, Arrow, UTC, and shuffle partitions sized to cores.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32).
    On a real cluster pass the cluster master / rely on spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # bracket forms: local[N], local[*], local[N,maxFailures],
        # local-cluster[n,cores,mem] — the FIRST bracketed field is the
        # thread/worker count; '*' means the machine's real core count
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        n = n.split(",")[0].strip()
        if n == "*":
            shuffle_partitions = os.cpu_count() or cpus
        elif n.isdigit():
            shuffle_partitions = int(n)
        else:
            shuffle_partitions = cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size trades per-batch Python-worker roundtrip
        # overhead (wants bigger) against the kernels' numpy working set
        # per batch (wants smaller: N concurrent workers each hold
        # codepoint+mask arrays; past the shared-cache budget throughput
        # collapses). Measured on 32 cores with 37k-row input partitions:
        # 32768 → 28k turns/s, 8192 → 164k, 2048 → 178k — the r1 "32k is
        # best" reading was an artifact of 4.7k-row shuffle partitions
        # capping the REAL batch size; single-threaded the kernel is only
        # ~30% slower at 32k, so this is cache pressure, not algorithmic.
        # 8192 balances roundtrip overhead vs cache. Override via
        # SPARK_ARROW_BATCH.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "8192"),
        )
        # Whole-stage-codegen methods above HotSpot's DontCompileHugeMethods
        # threshold (8000 bytecode) NEVER JIT — the fused stage then runs in
        # the JVM *bytecode interpreter*, measurably slower than Spark's
        # Volcano path (q38 pair-verify: 22s fused-interpreted vs 6s after
        # fallback). Spark's default limit (65535) only rejects stages janino
        # itself cannot compile; 8000 makes Spark fall back to the Volcano
        # path exactly when the JIT would refuse the method, which is at
        # worst neutral and strictly faster for the unrolled-dot-product
        # pair stages (guide §1.3 plan-shape note on WholeStageCodegen
        # spans). Override via SPARK_HUGE_METHOD_LIMIT.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_HUGE_METHOD_LIMIT", "8000"),
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
