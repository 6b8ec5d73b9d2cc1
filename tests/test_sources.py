"""Source resolution (sources.py): Iceberg-first with parquet fallback.

This container has no Iceberg runtime jar, so these tests pin the
DEGRADED behavior precisely: the probe says no, explicit iceberg fails
fast with the remediation text, auto falls back to parquet for paths and
to the session catalog for table identifiers. On a deployment with the
jar, the same calls resolve to the Iceberg reader unchanged.
"""

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import sources


def test_iceberg_probe_is_false_here(spark):
    assert sources.iceberg_available(spark) is False


def test_explicit_iceberg_fails_fast_with_remediation(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        sources.read_transcripts(spark, "lake.raw.transcripts", "iceberg")
    with pytest.raises(RuntimeError, match="spark.sql.extensions"):
        sources.read_transcripts(spark, "/tmp/nowhere", "iceberg")


def test_auto_path_falls_back_to_parquet(spark, sf_dir):
    df = sources.read_transcripts(spark, f"{sf_dir}/events.parquet")
    assert df.count() == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_auto_table_identifier_goes_through_catalog(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "transcripts_src_view"
    )
    try:
        df = sources.read_transcripts(spark, "transcripts_src_view")
        assert df.count() > 0
    finally:
        spark.catalog.dropTempView("transcripts_src_view")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="auto\\|iceberg\\|parquet"):
        sources.read_transcripts(spark, "x", "orc")


def test_parquet_write_fallback_partitions_by_day(spark, tmp_path):
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, "2024-01-01 10:00:00"),
         ("c1", 1, "assistant", "yo", None, "2024-01-02 11:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = str(tmp_path / "t")
    sources.write_transcripts(df, out)
    import glob

    days = {p.split("pday=")[1] for p in glob.glob(f"{out}/pday=*")}
    assert days == {"2024-01-01", "2024-01-02"}
    back = spark.read.parquet(out)
    assert back.count() == 2 and "pday" in back.columns


def test_iceberg_write_fails_fast(spark):
    df = spark.range(1).select(
        F.lit("c").alias("conv_id"),
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        sources.write_transcripts(df, "lake.raw.t", target_format="iceberg")
