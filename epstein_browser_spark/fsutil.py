"""Storage-agnostic small-file I/O through the JVM Hadoop FileSystem API.

Manifests, failure-queue cleanup, and per-bucket directory maintenance must
work on whatever filesystem the DATA writes go to — at 100 TB that is
hdfs:// or s3a://, not the driver's local disk. Python ``os``/``shutil``
calls silently no-op (or write to bogus local paths) against remote
schemes; every path here resolves through ``Path.getFileSystem`` with the
session's Hadoop configuration, so ``file:``, ``hdfs:`` and object stores
behave identically (ADVICE r1: manifest I/O used local-FS APIs).

All files handled here are tiny (KB-scale JSON / directory listings); the
data path never goes through this module.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def exists(spark: SparkSession, path_str: str) -> bool:
    fs, path, _ = _fs_path(spark, path_str)
    return bool(fs.exists(path))


def mkdirs(spark: SparkSession, path_str: str) -> None:
    fs, path, _ = _fs_path(spark, path_str)
    fs.mkdirs(path)


def delete(spark: SparkSession, path_str: str, recursive: bool = True) -> bool:
    fs, path, _ = _fs_path(spark, path_str)
    return bool(fs.delete(path, recursive))


def list_names(spark: SparkSession, dir_str: str) -> list[str]:
    """Basenames of a directory's children; [] when the dir is absent."""
    fs, path, _ = _fs_path(spark, dir_str)
    if not fs.exists(path):
        return []
    return [st.getPath().getName() for st in fs.listStatus(path)]


def read_text(spark: SparkSession, path_str: str) -> str | None:
    """Whole-file read (None when absent). Small files only."""
    fs, path, jvm = _fs_path(spark, path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path_str: str, text: str) -> None:
    """Atomic-for-readers write: create <path>.tmp, then rename over the
    target (a reader never observes a half-written manifest)."""
    fs, path, jvm = _fs_path(spark, path_str)
    tmp = jvm.org.apache.hadoop.fs.Path(path_str + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(path):
        fs.delete(path, False)
    fs.rename(tmp, path)
