"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full multi-mode extraction pipeline + per-
                conversation rollup on sf0.001.
queries()     — every implemented operator family from SURVEY.md §2 plus
                the training-data ops (dedup / similarity / text stats).
oracle_sql()  — DuckDB-checkable ANSI SQL for each query (omitted only for
                ops whose kernels aren't SQL-expressible: minhash/simhash
                LSH over xxhash64 and the HTML/PDF layout parsers — those
                get rows-only checks plus pytest golden tests).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-mode extraction over transcripts derived from the
    sf0.001 documents table, rolled up per conversation."""
    from pyspark.sql import functions as F

    from epstein_browser_spark.queries import q29_extract_multimode

    extracted = q29_extract_multimode(spark, "/root/testdata/sf0.001")
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("parse_failed"), 1).otherwise(0)).alias("n_failed"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.sum(F.length("clean_text")).alias("total_chars"),
        )
        .orderBy("conv_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from epstein_browser_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from epstein_browser_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
