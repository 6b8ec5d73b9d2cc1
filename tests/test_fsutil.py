"""Hadoop-FS small-file layer: round trips, atomicity shape, listing."""


from epstein_browser_spark import fsutil


def test_fsutil_roundtrip_and_overwrite(spark, tmp_path):
    base = str(tmp_path / "fs")
    p = f"{base}/sub/manifest.json"
    assert fsutil.read_text(spark, p) is None
    assert fsutil.list_names(spark, base) == []
    fsutil.mkdirs(spark, f"{base}/sub")
    fsutil.write_text(spark, p, '{"v": 1}')
    assert fsutil.read_text(spark, p) == '{"v": 1}'
    fsutil.write_text(spark, p, '{"v": 2}')  # overwrite via tmp+rename
    assert fsutil.read_text(spark, p) == '{"v": 2}'
    names = fsutil.list_names(spark, f"{base}/sub")
    assert "manifest.json" in names and "manifest.json.tmp" not in names
    assert fsutil.exists(spark, p)
    fsutil.delete(spark, p)
    assert not fsutil.exists(spark, p)


def test_write_partition_overwrite_leaves_session_conf_alone(spark, tmp_path):
    """ADVICE r2: the shared sink helper must scope dynamic overwrite to
    the single write — the session's partitionOverwriteMode stays whatever
    the caller set (here: the STATIC default), and the write still only
    replaces the partitions present in the frame."""
    from pyspark.sql import functions as F

    orig = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    path = str(tmp_path / "tbl")
    full = spark.range(10).select(
        "id", F.pmod("id", F.lit(2)).cast("int").alias("bucket")
    )
    fsutil.write_partition_overwrite(full, path)
    # rewrite ONLY bucket 0 with fewer rows; bucket 1 must survive
    only0 = spark.range(2).select(
        "id", F.lit(0).cast("int").alias("bucket")
    )
    fsutil.write_partition_overwrite(only0, path)
    spark.catalog.refreshByPath(path)
    try:
        got = spark.read.parquet(path)
        assert got.filter(F.col("bucket") == 1).count() == 5
        assert got.filter(F.col("bucket") == 0).count() == 2
        after = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        assert after == "static"  # the helper never touched the session
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", orig)
