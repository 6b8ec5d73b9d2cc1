"""Source/sink resolution for the transcripts table: Iceberg-first with a
parquet fallback.

The production deployment (SURVEY.md §1, BASELINE north rule) reads the
10^12-turn transcript corpus from an Iceberg table; this container has no
Iceberg runtime jar, so the resolver PROBES the classpath at runtime and
degrades explicitly:

* a catalog table name (``db.transcripts``, ``lake.raw.transcripts``)
  resolves through the session catalog — with an Iceberg catalog
  configured this is the Iceberg read path unchanged, and in tests a
  temp view satisfies the same contract;
* a path resolves as ``format('iceberg')`` when the runtime is on the
  classpath, else as parquet;
* asking for Iceberg explicitly without the runtime raises immediately
  with the spark-submit flags that fix it, instead of the opaque
  ``ClassNotFoundException`` mid-job.

Reference analog: the repo points SQLite at a single documents.db path
(/root/reference/app.py:60-75); here the "path" is a catalog-managed
table whose snapshots, schema evolution, and hidden partitioning come
from the table format, not from this library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Classes that exist iff the iceberg-spark-runtime jar is on the
# classpath. Loaded via the JVM's application classloader — a py4j
# attribute access on a missing package would return a JavaPackage
# stub, not an error, so loadClass is the reliable probe.
_ICEBERG_MARKER_CLASS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"

ICEBERG_HINT = (
    "Iceberg runtime not on the classpath. Launch with\n"
    "  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-"
    "4.0_2.13:<version> \\\n"
    "    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions."
    "IcebergSparkSessionExtensions \\\n"
    "    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog"
    " \\\n"
    "    --conf spark.sql.catalog.lake.type=<hive|hadoop|rest> ...\n"
    "then address tables as lake.<db>.<table>."
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this JVM."""
    try:
        (spark._jvm.java.lang.Class  # type: ignore[union-attr]
         .forName(_ICEBERG_MARKER_CLASS))
        return True
    except Exception:
        return False


def _looks_like_path(source: str) -> bool:
    """Paths contain a separator or a scheme; catalog table identifiers
    are dot-separated bare names."""
    return "/" in source or "\\" in source or ":" in source


def read_transcripts(spark: SparkSession, source: str,
                     source_format: str = "auto") -> DataFrame:
    """Resolve ``source`` to the transcripts DataFrame.

    ``source_format``:

    * ``'auto'`` (default) — a table identifier goes through the session
      catalog (``spark.read.table``: Iceberg, Hive, or a registered
      view — whatever the catalog maps the name to); a path reads as
      Iceberg only when the runtime is present AND the directory is
      actually an Iceberg Hadoop table (``metadata/`` present), else
      parquet — symmetric with ``write_transcripts``' auto-path parquet
      fallback.
    * ``'iceberg'`` — require Iceberg; raise with remediation if the
      runtime is absent (fail at plan time, not mid-job).
    * ``'parquet'`` — force the plain-directory read.

    Every caller downstream (extraction, curation, streaming backfill)
    sees the same columns either way — the table format changes WHERE
    snapshots/partition pruning come from, never the schema contract.
    """
    if source_format == "parquet":
        return spark.read.parquet(source)
    if source_format == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(ICEBERG_HINT)
        if _looks_like_path(source):
            return spark.read.format("iceberg").load(source)
        return spark.read.table(source)
    if source_format != "auto":
        raise ValueError(
            f"unknown source_format {source_format!r} (auto|iceberg|parquet)"
        )
    if not _looks_like_path(source):
        return spark.read.table(source)
    if iceberg_available(spark) and _is_iceberg_path(spark, source):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def _is_iceberg_path(spark: SparkSession, source: str) -> bool:
    """True when the path holds an Iceberg Hadoop table (a ``metadata/``
    dir beside the data). 'auto' must dispatch on what the directory
    ACTUALLY is, not on the classpath: write_transcripts' auto-path
    branch writes plain parquet even with the runtime present, so an
    unconditional Iceberg read broke the default write→read round trip
    (r5 review finding); and a pre-existing parquet lake must not become
    unreadable because an Iceberg jar appeared."""
    from epstein_browser_spark import fsutil

    try:
        return fsutil.exists(spark, f"{source}/metadata")
    except Exception:
        return False


def write_transcripts(df: DataFrame, target: str,
                      target_format: str = "auto",
                      mode: str = "append") -> None:
    """Write a transcripts-shaped frame to ``target``.

    With Iceberg available and a table identifier, uses the V2 writer
    (``writeTo``): ``append`` or ``overwritePartitions`` — dynamic
    partition replacement, the engine-level version of this library's
    snapshot-overwrite machinery (curation._write_snapshot_overwrite).
    The production table is created once with hidden partitioning::

        CREATE TABLE lake.raw.transcripts (
          conv_id string, turn_idx int, role string,
          text string, tool string, ts timestamp)
        USING iceberg
        PARTITIONED BY (days(ts), bucket(512, conv_id))

    so ingest never materializes partition columns and conv-locality
    (the extraction/dedup shuffle key) is a storage property. The
    parquet fallback approximates with an explicit ``pday`` column —
    usable for tests, without snapshot isolation.
    """
    if target_format not in ("auto", "iceberg", "parquet"):
        raise ValueError(
            f"unknown target_format {target_format!r} (auto|iceberg|parquet)"
        )
    ice = iceberg_available(df.sparkSession)
    if target_format == "iceberg" and not ice:
        raise RuntimeError(ICEBERG_HINT)
    if target_format == "iceberg" and _looks_like_path(target):
        # EXPLICIT iceberg + path target: Hadoop-table write via the V1
        # writer, symmetric with read_transcripts' path read. (This case
        # used to fall through to the parquet branch below, silently
        # downgrading the write while the matching read expected an
        # Iceberg table; r5 review finding.) Path writes stay opt-in —
        # 'auto' keeps writing parquet to paths even with the runtime
        # present, so a deployment appending to a pre-existing plain
        # parquet directory is never broken by a classpath change
        # (second r5 review finding); the auto READ dispatches on the
        # directory's actual layout (_is_iceberg_path), so the default
        # write→read round trip stays symmetric.
        (df.write.format("iceberg")
           .mode("overwrite" if mode == "overwrite" else "append")
           .save(target))
        return
    if ice and target_format != "parquet" and not _looks_like_path(target):
        w = df.writeTo(target)
        if mode == "overwrite":
            w.overwritePartitions()
        else:
            w.append()
        return
    from pyspark.sql import functions as F

    (df.withColumn("pday", F.to_date("ts"))
       .repartition("pday")
       .write.mode(mode).partitionBy("pday").parquet(target))
