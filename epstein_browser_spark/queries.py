"""Relational + extraction query surface with DuckDB-oracle SQL equivalents.

Each entry in QUERIES is (spark_fn, oracle_sql | None). Spark fns take
(spark, sf_dir) and return a DataFrame; oracle SQL runs on DuckDB against
the same parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings). Column names/aliases and types match
on both sides (the driver hashes values sorted by column name).

Operator coverage map (SURVEY.md §2): see each query's docstring for the
operator ids it exercises and the reference file:line it derives from.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epstein_browser_spark import (
    convstats, dedup, merge, redaction, similarity, textstats,
)
from epstein_browser_spark.core.quality import (
    classify_low_quality_batch,
    quality_score_batch,
)
from epstein_browser_spark.ordering import with_navigation
from epstein_browser_spark.pipeline import extract_transcripts


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the frame across the session's shuffle-partition count.

    The driver's test tables are single-row-group parquet files, so a
    scan yields ONE input split no matter what
    ``spark.sql.files.maxPartitionBytes`` says — every per-row-heavy
    map stage (regex counts, shingle explodes, merge chains) otherwise
    runs serially in that one task (guide §2.6 stragglers / §6 input
    splits). Applied ONLY in queries whose scan-stage work dominates;
    derived from the session's core count, never a constant, so the
    same code is right at any parallelism. On a real multi-file table
    the exchange is redundant but proportionally tiny."""
    ncores = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(ncores)


# ---------------------------------------------------------------------------
# pandas UDFs exposing the real extraction kernels to relational queries
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

_QUALITY_TYPE = T.StructType(
    [
        T.StructField("quality_score", T.IntegerType()),
        T.StructField("quality_reason", T.StringType()),
    ]
)
_LOWQ_TYPE = T.StructType(
    [
        T.StructField("is_low_quality", T.BooleanType()),
        T.StructField("lq_reason", T.StringType()),
        T.StructField("lq_confidence", T.DoubleType()),
    ]
)


# created lazily: pandas_udf registration requires an active SparkContext,
# and this module must stay importable before the session exists
_UDF_CACHE: dict = {}


def quality_udf():
    if "q" not in _UDF_CACHE:
        _UDF_CACHE["q"] = F.pandas_udf(_QUALITY_TYPE)(
            lambda s: quality_score_batch(s)
        )
    return _UDF_CACHE["q"]


def lowq_udf():
    if "l" not in _UDF_CACHE:
        _UDF_CACHE["l"] = F.pandas_udf(_LOWQ_TYPE)(
            lambda s: classify_low_quality_batch(s)
        )
    return _UDF_CACHE["l"]


# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

# adversarial text variants hitting every E4/E5 branch, derived
# deterministically from doc_id (same CASE in the SQL oracles)
_VARIANT_SQL = """
  CASE CAST(doc_id % 8 AS INT)
    WHEN 1 THEN '' WHEN 2 THEN '0 0 00 0'
    WHEN 3 THEN substring(text, 1, 8) WHEN 4 THEN repeat('q', 25)
    WHEN 5 THEN '00 a 00 00' WHEN 6 THEN 'a b c d e f g h i j'
    WHEN 7 THEN 'mixed with asdf pattern inside text'
    ELSE text END
"""


def _variant_col():
    cases = [
        (1, F.lit("")),
        (2, F.lit("0 0 00 0")),
        (3, F.expr("substring(text, 1, 8)")),
        (4, F.expr("repeat('q', 25)")),
        (5, F.lit("00 a 00 00")),
        (6, F.lit("a b c d e f g h i j")),
        (7, F.lit("mixed with asdf pattern inside text")),
    ]
    m = F.pmod("doc_id", F.lit(8))
    expr = F.col("text")
    for k, v in cases:
        expr = F.when(m == k, v).otherwise(expr)
    return expr


def _derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcripts-shaped input derived deterministically from documents —
    the oracle can reproduce conv_id/turn_idx with plain SQL."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("c"), F.pmod("doc_id", F.lit(50)).cast("string")).alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


# ---------------------------------------------------------------------------
# relational queries (aggregations / joins / windows / sorts / strings)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """A1/A2/A8-style headline aggregate (TPC-H Q1 shape): filtered scan →
    grouped sums/avgs/counts. Filter + pruning push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q02_status_counts(spark, sf_dir):
    """A3: group-by count + sum (reference: volume rollups,
    /root/reference/app.py:902-908)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


_Q02_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY o_orderstatus
"""


def q03_distinct_users(spark, sf_dir):
    """A4: exact count-distinct (reference: unique visitors,
    /root/reference/app.py:508-515)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


_Q03_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q04_avg_value(spark, sf_dir):
    """A5: avg (reference: AVG(response_time), /root/reference/app.py:512)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value")
    )


_Q04_SQL = """
SELECT event_type, round(avg(value), 6) AS avg_value
FROM events GROUP BY event_type
"""


def q05_top_users(spark, sf_dir):
    """A6: top-k by count → TakeOrderedAndProject, no global sort
    (reference: top pages, /root/reference/app.py:521-530)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id").agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


_Q05_SQL = """
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 10
"""


def q06_hourly(spark, sf_dir):
    """A7: time-bucketed count (reference: strftime('%H'),
    /root/reference/app.py:533-541)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.hour("ts").cast("long").alias("hour_of_day")).agg(
        F.count("*").alias("n_events")
    )


_Q06_SQL = """
SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, count(*) AS n_events
FROM events GROUP BY 1
"""


def q07_event_stats(spark, sf_dir):
    """A8: multi-key group, multiple aggs (reference: query+type stats,
    /root/reference/app.py:557-567)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_Q07_SQL = """
SELECT event_type, count(*) AS n_events,
       round(avg(value), 6) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q08_nav_window(spark, sf_dir):
    """W1-W4: position / prev / next / first / last / progress over a
    stable order — the reference's whole navigation model
    (/root/reference/app.py:691-709,756-760) as one window spec."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("position"),
        F.lag("l_linenumber", 1).over(w).alias("prev_line"),
        F.lead("l_linenumber", 1).over(w).alias("next_line"),
        F.first("l_linenumber").over(wf).alias("first_line"),
        F.last("l_linenumber").over(wf).alias("last_line"),
        F.round(F.percent_rank().over(w), 6).alias("progress"),
    )


_Q08_SQL = """
SELECT l_orderkey, l_linenumber,
       row_number() OVER w AS position,
       lag(l_linenumber, 1) OVER w AS prev_line,
       lead(l_linenumber, 1) OVER w AS next_line,
       first_value(l_linenumber) OVER wf AS first_line,
       last_value(l_linenumber) OVER wf AS last_line,
       round(percent_rank() OVER w, 6) AS progress
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber),
       wf AS (PARTITION BY l_orderkey ORDER BY l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q09_customers_no_orders(spark, sf_dir):
    """J1/J2: left-anti join = work-remaining selection (reference:
    unprocessed-images query, /root/reference/ocr_processor.py:140-147).
    "No FINALIZED order" (o_orderstatus='F'), the reference's
    'not yet completed' semantics — and non-vacuous at sf0.01 (the
    plain no-orders form returned 0 rows there, pinning nothing;
    VERDICT r4 item 6). The status filter is pushed below the anti-join
    build side, so the shuffled right side shrinks to one status
    partition's worth of keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_Q09_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
"""


def q10_search_excerpt(spark, sf_dir):
    """P4+F1+J3: case-insensitive substring search with the reference's
    exact excerpt window — 100 chars starting max(1, first_match-50)
    (/root/reference/app.py:997-1035)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.lower("text").contains("table")).select(
        "doc_id",
        F.expr(
            "substring(text, greatest(1, locate('table', lower(text)) - 50), 100)"
        ).alias("excerpt"),
    )


_Q10_SQL = """
SELECT doc_id,
       substring(text, greatest(1, position('table' IN lower(text)) - 50), 100)
         AS excerpt
FROM documents WHERE lower(text) LIKE '%table%'
"""


def q11_union_dedup(spark, sf_dir):
    """O3+J4+§2.7: union of two match families with anti-join dedup
    (reference merges filename + OCR matches, /root/reference/app.py:1047-1071)."""
    d = _t(spark, sf_dir, "documents")
    src = d.filter(F.col("source") == "src1").select(
        "doc_id", F.lit("source").alias("match_type")
    )
    txt = (
        d.filter(F.lower("text").contains("join"))
        .join(src.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit("text").alias("match_type"))
    )
    return src.unionByName(txt)


_Q11_SQL = """
SELECT doc_id, 'source' AS match_type FROM documents WHERE source = 'src1'
UNION ALL
SELECT d.doc_id, 'text' AS match_type FROM documents d
WHERE lower(d.text) LIKE '%join%'
  AND d.doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src1')
"""


def _paginate(df: DataFrame, order_cols: list, lo: int, hi: int) -> DataFrame:
    """O2 at scale: the consumed output is always a bounded prefix of a
    total order, so pre-reduce with orderBy+limit — TakeOrderedAndProject,
    per-partition top-k heaps, no global sort — and only then number the
    tiny (≤hi-row) prefix. The window partitions on a constant so WindowExec
    never takes the moves-everything-to-one-partition path on the full
    input (its input here is already ≤hi rows). Semantics are identical to
    row_number over the full order because order_cols are a total order."""
    limited = df.orderBy(*order_cols).limit(hi)
    # the partition key must be constant-valued but NOT foldable — Catalyst
    # eliminates a literal partitionBy, putting WindowExec back on its
    # empty-partition-spec (global) path
    const_key = F.pmod(F.xxhash64(df.columns[0]), F.lit(1))
    w = Window.partitionBy(const_key).orderBy(*order_cols)
    return (
        limited.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn").between(lo, hi))
    )


def q12_pagination(spark, sf_dir):
    """O2: LIMIT/OFFSET pagination (/root/reference/app.py:959-982) as
    orderBy+limit prefix → row_number — see :func:`_paginate` for why this
    beats an unpartitioned window at scale."""
    d = _t(spark, sf_dir, "documents")
    return _paginate(
        d.select("doc_id", "n_chars"),
        [F.desc("n_chars"), F.asc("doc_id")], 11, 30,
    )


_Q12_SQL = """
SELECT doc_id, n_chars, rn FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) WHERE rn BETWEEN 11 AND 30
"""


def q13_extremes(spark, sf_dir):
    """A10/O5: first/last by sort key as min/max aggregates, not
    ORDER BY+LIMIT 1 (/root/reference/app.py:1136-1137)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_date"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_Q13_SQL = """
SELECT strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_date,
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_date,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM orders
"""


def q14_doc_numbers(spark, sf_dir):
    """F5: regexp number extraction with cast (reference: DOJ-OGR doc
    numbers, /root/reference/app.py:762-776)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.regexp_extract("source", r"src(\d+)", 1).cast("int").alias("src_num")
        )
        .groupBy("src_num")
        .agg(F.count("*").alias("n_docs"))
    )


_Q14_SQL = """
SELECT CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) AS src_num,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


def q15_recent_events(spark, sf_dir):
    """P8/F9: relative time-window predicate, anchored to max(ts) for
    determinism (reference anchors to now(), /root/reference/app.py:507-515)."""
    e = _t(spark, sf_dir, "events")
    mx = e.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


_Q15_SQL = """
SELECT event_type, count(*) AS n_events FROM events
WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# extraction-kernel queries (real pandas-UDF kernels vs independent SQL oracle)
# ---------------------------------------------------------------------------

def q16_quality_score(spark, sf_dir):
    """E4: the reference's binary quality heuristic chain
    (/root/reference/helpers/error_detection.py:126-180) — Spark side runs
    the production vectorized kernel; the oracle re-states the semantics in
    SQL. Variants cover every branch."""
    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", quality_udf()(_variant_col()).alias("q"))
    return q.select("doc_id", "q.quality_score", "q.quality_reason")


_Q16_SQL = """
WITH v AS (SELECT doc_id, {variant} AS t0 FROM documents),
s AS (SELECT doc_id, trim(t0) AS t, length(trim(t0)) AS n,
             length(trim(t0)) - length(replace(trim(t0), '0', '')) AS nzero
      FROM v),
m AS (SELECT doc_id, t, n, nzero,
             CASE WHEN n = 0 THEN 0
                  ELSE len(string_split_regex(t, '\\s+')) END AS nwords,
             CASE WHEN n = 0 THEN 0
                  ELSE len(list_filter(string_split_regex(t, '\\s+'),
                                       w -> regexp_matches(w, '^0+$'))) END AS nzw,
             length(t) - length(regexp_replace(t,
                 '[^\\x00-\\x1f{bin}]', '', 'g')) AS nbin_inv,
             length(regexp_replace(t, '[\\x00-\\x1f{bin}]', '', 'g')) AS n_nonbin,
             len(regexp_extract_all(t,
                 '[A-Za-z0-9]|[ .,;:!?()\\[\\]{{}}"''`~@#$%^&*+=<>/\\\\|_-]')) AS nmean
      FROM s)
SELECT doc_id,
  CASE WHEN n = 0 THEN 0
       WHEN length(replace(replace(t, ' ', ''), '0', '')) = 0 THEN 0
       WHEN n < 20 AND nzero > n * 0.5 THEN 0
       WHEN n < 10 THEN 0
       WHEN nwords > 3 AND CAST(nzw AS DOUBLE) / nwords > 0.7 THEN 0
       WHEN (n - n_nonbin) > n * 0.1 THEN 0
       WHEN nmean < 10 THEN 0 ELSE 100 END AS quality_score,
  CASE WHEN n = 0 THEN 'Empty or whitespace-only text'
       WHEN length(replace(replace(t, ' ', ''), '0', '')) = 0
         THEN 'Only zeros and spaces'
       WHEN n < 20 AND nzero > n * 0.5
         THEN 'Too many zeros in short text (' || nzero || '/' || n || ' chars)'
       WHEN n < 10 THEN 'Too short (' || n || ' characters)'
       WHEN nwords > 3 AND CAST(nzw AS DOUBLE) / nwords > 0.7
         THEN 'Too many zero patterns (' || nzw || '/' || nwords || ' words)'
       WHEN (n - n_nonbin) > n * 0.1
         THEN 'Too many binary/corrupted characters (' || (n - n_nonbin) || '/'
              || n || ' chars)'
       WHEN nmean < 10
         THEN 'Too few meaningful characters (' || nmean || ' chars)'
       ELSE 'Passed all quality checks' END AS quality_reason
FROM m
""".replace("{bin}", "␦\\\\{}|~`\\^\\[\\]").replace("{variant}", _VARIANT_SQL).replace("{{}}", "{}")


def q17_lowq_classify(spark, sf_dir):
    """E5: the 5-pattern low-quality classifier
    (/root/reference/helpers/ocr_quality_assessment.py:251-335) — production
    kernel vs SQL restatement."""
    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", lowq_udf()(_variant_col()).alias("q"))
    return q.select("doc_id", "q.is_low_quality", "q.lq_reason", "q.lq_confidence")


_Q17_SQL = """
WITH v AS (SELECT doc_id, {variant} AS t FROM documents),
m AS (SELECT doc_id, t,
             length(t) AS n,
             len(regexp_extract_all(t, '[\\p{L}]')) AS nalpha,
             length(replace(t, ' ', '')) AS ntotal,
             coalesce(list_max(list_transform(
                 list_distinct(regexp_extract_all(t, '[\\p{L}\\p{N}]')),
                 c -> length(t) - length(replace(t, c, '')))), 0) AS maxrep,
             length(regexp_replace(t, '\\s', '', 'g')) AS nonws,
             len(list_filter(string_split_regex(trim(t), '\\s+'),
                             w -> w <> '')) AS nwords,
             len(regexp_extract_all(t, '[^\\p{L}\\p{N}\\s]')) AS nspecial
      FROM v)
SELECT doc_id,
  CASE WHEN length(trim(t)) < 10 THEN TRUE
       WHEN ntotal > 0 AND CAST(nalpha AS DOUBLE) / ntotal < 0.3 THEN TRUE
       WHEN maxrep > n * 0.4 THEN TRUE
       WHEN nwords > 0 AND nonws < nwords * 2.0 THEN TRUE
       WHEN regexp_matches(lower(t),
         'qqqq|wwww|eeee|rrrr|tttt|yyyy|asdf|qwer|zxcv|0000|1111|2222|3333')
         THEN TRUE
       WHEN n > 0 AND nspecial > n * 0.5 THEN TRUE
       ELSE FALSE END AS is_low_quality,
  CASE WHEN length(trim(t)) < 10 THEN 'text_too_short'
       WHEN ntotal > 0 AND CAST(nalpha AS DOUBLE) / ntotal < 0.3 THEN 'mostly_non_alphabetic'
       WHEN maxrep > n * 0.4 THEN 'excessive_character_repetition'
       WHEN nwords > 0 AND nonws < nwords * 2.0 THEN 'gibberish_short_words'
       WHEN regexp_matches(lower(t),
         'qqqq|wwww|eeee|rrrr|tttt|yyyy|asdf|qwer|zxcv|0000|1111|2222|3333')
         THEN 'ocr_failure_pattern'
       WHEN n > 0 AND nspecial > n * 0.5 THEN 'excessive_special_characters'
       ELSE 'passed_quality_checks' END AS lq_reason,
  CASE WHEN length(trim(t)) < 10 THEN 1.0
       WHEN ntotal > 0 AND nalpha < ntotal * 0.3 THEN 0.8
       WHEN maxrep > n * 0.4 THEN 0.7
       WHEN nwords > 0 AND nonws < nwords * 2.0 THEN 0.6
       WHEN regexp_matches(lower(t),
         'qqqq|wwww|eeee|rrrr|tttt|yyyy|asdf|qwer|zxcv|0000|1111|2222|3333')
         THEN 0.9
       WHEN n > 0 AND nspecial > n * 0.5 THEN 0.7
       ELSE 0.8 END AS lq_confidence
FROM m
""".replace("{variant}", _VARIANT_SQL)


# ---------------------------------------------------------------------------
# dedup / similarity / text-analysis queries
# ---------------------------------------------------------------------------

def q18_dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy (reference content-hash idempotency,
    /root/reference/index_images.py:194-232); keyed on a 20-char prefix so
    the synthetic corpus actually collides."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.expr("substring(text, 1, 20)")
    )
    return dedup.exact_duplicates(d)


_Q18_SQL = """
SELECT md5(substring(text, 1, 20)) AS content_hash,
       count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def q19_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs over a blocked candidate set — exact
    set semantics, SQL-checkable."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


_Q19_SQL = """
WITH g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - 2),
           i -> lower(trim(text))[i:i+2])) AS grams
  FROM documents WHERE doc_id < 200 AND length(lower(trim(text))) >= 3),
b AS (SELECT id, grams, list_sort(grams)[1] AS blk FROM g)
SELECT a.id AS id_a, c.id AS id_b,
       round(CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, c.grams))), 6) AS jaccard
FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
WHERE CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
      / len(list_distinct(list_concat(a.grams, c.grams))) >= 0.5
"""


def q20_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup (scale path): signatures → banded buckets →
    verify. Non-SQL-expressible (xxhash64) → rows-only check."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(d, threshold=0.5).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q21_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs — EXACT semantics: (max_hamming+1)-band
    candidate generation has recall 1.0 by pigeonhole, so the output is
    precisely the hamming<=6 pair set. hash_mode='md5' derives the 64
    shingle-hash bits from md5 hex digits, which DuckDB can restate
    verbatim — full value oracle (was rows-only in r1)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup.simhash_near_dups(d, max_hamming=6, hash_mode="md5").select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _simhash_sql(max_hamming: int = 6, n: int = 3, id_cap: int = 300) -> str:
    """DuckDB restatement of md5-mode SimHash: per doc, bit b of the
    64-bit sketch = sign of sum over distinct shingles of ±1 by bit
    (b%4) of hex digit (b//4) of md5(shingle) — exactly
    dedup.simhash_table(hash_mode='md5'). Pairs via exact all-pairs
    hamming (BIT xor + bit_count), which the banded Spark plan must equal
    because its recall is exactly 1.0."""
    counters = ",\n        ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substring(hx, {b // 4 + 1}, 1)) - 1)"
        f" // {1 << (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS c{b}"
        for b in range(64)
    )
    bit_str = " || ".join(
        f"(CASE WHEN c{b} > 0 THEN '1' ELSE '0' END)" for b in range(63, -1, -1)
    )
    return f"""
WITH g AS (
  SELECT doc_id AS id,
         unnest(list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - {n - 1}),
           i -> lower(trim(text))[i:i+{n - 1}]))) AS sh
  FROM documents
  WHERE doc_id < {id_cap} AND length(lower(trim(text))) >= {n}),
h AS (SELECT id, md5(sh) AS hx FROM g),
c AS (SELECT id,
        {counters}
      FROM h GROUP BY id),
s AS (SELECT id, ({bit_str}) AS sh FROM c)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(CAST(a.sh AS BIT), CAST(b.sh AS BIT))) AS BIGINT)
         AS hamming
FROM s a JOIN s b ON a.id < b.id
WHERE bit_count(xor(CAST(a.sh AS BIT), CAST(b.sh AS BIT))) <= {max_hamming}
"""


def q22_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: JVM-side dot products
    (F.aggregate/zip_with), TakeOrderedAndProject top-k."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    return (
        e.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            # order by the UNROUNDED cosine (mirrors the oracle's ORDER BY):
            # ordering on the 6-dp-rounded value can flip the top-k boundary
            # for cosines that differ only beyond 6 dp
            similarity.cosine(F.col("embedding"), F.col("q_vec")).alias("_c"),
        )
        .orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("_c", 6).alias("cosine_sim"))
    )


_Q22_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
FROM embeddings e, q
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.qv, q.qv))) DESC, vec_id ASC
LIMIT 10
"""


def _lsh_bucket_sql(dim: int, n_planes: int, vec_expr: str = "v") -> str:
    """DuckDB restatement of similarity.with_lsh_bucket: the hyperplane
    components are plan literals (similarity.hyperplane_components), so the
    oracle embeds the identical values — bucket bit i weighted
    2^(n_planes-1-i), matching sig = sig*2 + bit."""
    terms = []
    for i in range(n_planes):
        comps = similarity.hyperplane_components(dim, i)
        lit = "[" + ", ".join(f"{c:.1f}" for c in comps) + "]"
        weight = 1 << (n_planes - 1 - i)
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) >= 0"
            f" THEN {weight} ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_query_bucket(dim: int, n_planes: int, qv: list[float]) -> int:
    """The query vector's bucket, computed with the same fold ordering as
    the Spark/DuckDB expressions (sequential dot, bit i -> 2^(np-1-i))."""
    bucket = 0
    for i in range(n_planes):
        comps = similarity.hyperplane_components(dim, i)
        acc = 0.0
        for x, p in zip(qv, comps):
            acc += float(x) * p
        bucket = bucket * 2 + (1 if acc >= 0 else 0)
    return bucket


_Q23_QVEC = [1.0] + [0.0] * 63


def q23_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (scale path: bucket = partition key at 100 TB —
    the probe becomes a partition-pruned scan). Hyperplanes are plan
    literals, so the FULL bucketing + top-k is value-oracle-checked in
    DuckDB (was rows-only in r1)."""
    e = _t(spark, sf_dir, "embeddings")
    bucketed = similarity.with_lsh_bucket(e, dim=64, n_planes=6)
    top = similarity.lsh_topk_df(spark, bucketed, _Q23_QVEC, dim=64, k=10,
                                 n_planes=6)
    return top.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q23_sql() -> str:
    qlit = "[" + ", ".join(f"{x:.1f}" for x in _Q23_QVEC) + "]"
    qb = _lsh_query_bucket(64, 6, _Q23_QVEC)
    cos = (
        f"list_dot_product(v, {qlit}) / (sqrt(list_dot_product(v, v))"
        f" * sqrt(list_dot_product({qlit}, {qlit})))"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v FROM e WHERE ({_lsh_bucket_sql(64, 6)}) = {qb})
SELECT vec_id, round({cos}, 6) AS cosine_sim
FROM b ORDER BY {cos} DESC, vec_id ASC LIMIT 10
"""


def q24_token_stats(spark, sf_dir):
    """Token counting + quality ratios (training-data curation stats)."""
    d = _spread(_t(spark, sf_dir, "documents"))
    c = F.col("text")
    toks = textstats.tokens(c)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(textstats.BPE_TOKEN_RE), 0))
        .cast("long").alias("n_bpe_tokens"),
        F.round(textstats.stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(textstats.punct_ratio(c), 6).alias("punct_ratio"),
    )


_Q24_SQL = """
SELECT doc_id,
  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))
       AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
       AS BIGINT) AS n_bpe_tokens,
  round(CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  t -> t <> '')) > 0
    THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         t -> list_contains(['the','and','of','to','is','in','that','with',
                             'a','an','it','on','for','as','are'], t)))
         AS DOUBLE)
         / len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           t -> t <> ''))
    ELSE 0.0 END, 6) AS stopword_ratio,
  round(CASE WHEN length(text) > 0
    THEN CAST(length(text)
              - length(regexp_replace(text, '[^\\p{L}\\p{N}_\\s]', '', 'g'))
         AS DOUBLE) / length(text)
    ELSE 0.0 END, 6) AS punct_ratio
FROM documents
"""


def q25_langid(spark, sf_dir):
    """Marker-word language-ID heuristic, JVM expressions only."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", "lang",
        textstats.predicted_lang(F.col("text")).alias("predicted_lang"),
    )


def _langid_sql() -> str:
    parts = []
    for lang, markers in textstats.LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        parts.append(
            f"printf('%010d', len(list_filter("
            f"string_split_regex(trim(lower(text)), '\\s+'), "
            f"t -> list_contains([{lst}], t)))) || '{lang}'"
        )
    best = "greatest(" + ", ".join(parts) + ")"
    return f"""
SELECT doc_id, lang,
  CASE WHEN CAST(substring({best}, 1, 10) AS INTEGER) > 0
       THEN substring({best}, 11, 10) ELSE 'und' END AS predicted_lang
FROM documents
"""


def q26_fingerprint(spark, sf_dir):
    """Order-insensitive shingle fingerprint (content-hash idempotency key,
    /root/reference/index_images.py:206, robust to reordering)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.fingerprint_table(d, "text", "doc_id", 4).select(
        F.col("id").alias("doc_id"), "fingerprint"
    )


_Q26_SQL = """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(list_transform(
    generate_series(1, length(lower(trim(text))) - 3),
    i -> lower(trim(text))[i:i+3]))), '')) AS fingerprint
FROM documents WHERE length(lower(trim(text))) >= 4
UNION ALL
SELECT doc_id, md5('') AS fingerprint
FROM documents WHERE length(lower(trim(text))) < 4
"""


def q27_merge_classify(spark, sf_dir):
    """S6/S7/E8: incremental merge diff — skip/update/insert/delete
    classification on content hashes (/root/reference/index_images.py:344-434)."""
    d = _t(spark, sf_dir, "documents")
    target = d.select("doc_id", F.md5("text").alias("h"))
    source = (
        d.filter(F.pmod("doc_id", F.lit(11)) != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(F.pmod("doc_id", F.lit(7)) == 0,
                       F.concat(F.col("text"), F.lit(" updated")))
                .otherwise(F.col("text"))
            ).alias("h"),
        )
        .unionByName(
            d.filter(F.pmod("doc_id", F.lit(13)) == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5("text").alias("h"),
            )
        )
    )
    return (
        merge.classify_merge(target, source, "doc_id", "h")
        .groupBy("merge_action")
        .agg(F.count("*").alias("n"))
    )


_Q27_SQL = """
WITH target AS (SELECT doc_id, md5(text) AS h FROM documents),
source AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END) AS h
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text) AS h
  FROM documents WHERE doc_id % 13 = 0),
j AS (
  SELECT CASE WHEN t.h IS NULL THEN 'insert'
              WHEN s.h IS NULL THEN 'delete'
              WHEN t.h <> s.h THEN 'update'
              ELSE 'skip' END AS merge_action
  FROM target t FULL OUTER JOIN source s USING (doc_id))
SELECT merge_action, count(*) AS n FROM j GROUP BY merge_action
"""


# ---------------------------------------------------------------------------
# extraction-pipeline queries over derived transcripts
# ---------------------------------------------------------------------------

def q28_extract_plain(spark, sf_dir):
    """Full extraction pipeline (plain mode) over derived transcripts —
    per-turn clean text / gate / content hash, SQL-oracle-checkable."""
    tr = _derived_transcripts(spark, sf_dir)
    out = extract_transcripts(tr, n_buckets=8)
    return out.select(
        "conv_id", "turn_idx", "clean_text", "parse_failed", "content_hash"
    )


_Q28_SQL = """
SELECT 'c' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
       CAST(doc_id // 50 AS INTEGER) AS turn_idx,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean_text,
       length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) <= 10 AS parse_failed,
       md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS content_hash
FROM documents
"""


def q29_extract_multimode(spark, sf_dir):
    """Full multi-mode extraction (plain/spans/html/pdf wrappers) through
    the real pipeline — the flagship correctness query. The wrappers are
    deterministic, so the oracle can state the expected per-turn output in
    plain SQL: the spans wrapper keeps only the 0.9-confidence span, the
    html wrapper's nav/link boilerplate is stripped leaving the <p> body,
    the pdf wrapper drops the page-furniture line; in every mode the clean
    text is exactly the whitespace-normalized document body."""
    d = _t(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(4))
    body = F.trim(F.regexp_replace("text", r"\s+", " "))
    text = (
        F.when(m == 1, F.concat(F.lit("0.9|"), body, F.lit("\n0.1|dropped")))
        .when(m == 2, F.concat(F.lit("<body><nav><a href='/'>x</a></nav><p>"),
                               body, F.lit("</p></body>")))
        .when(m == 3, F.concat(F.lit("1|1|10|"), body, F.lit("\n1|1|999|Page 1")))
        .otherwise(F.col("text"))
    )
    tool = (
        F.when(m == 1, F.lit("spans"))
        .when(m == 2, F.lit("html"))
        .when(m == 3, F.lit("pdf"))
        .otherwise(F.lit(None).cast("string"))
    )
    tr = d.select(
        F.concat(F.lit("c"), F.pmod("doc_id", F.lit(50)).cast("string")).alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = extract_transcripts(tr, n_buckets=8)
    return out.select(
        "conv_id", "turn_idx", "tool", "clean_text", "quality_score",
        "parse_failed", "content_hash",
    )


_Q29_SQL = """
WITH b AS (
  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS body
  FROM documents)
SELECT 'c' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
       CAST(doc_id // 50 AS INTEGER) AS turn_idx,
       CASE CAST(doc_id % 4 AS INT)
         WHEN 1 THEN 'spans' WHEN 2 THEN 'html' WHEN 3 THEN 'pdf' END AS tool,
       body AS clean_text,
       CASE WHEN length(body) = 0 THEN 0 ELSE 100 END AS quality_score,
       length(body) <= 10 AS parse_failed,
       md5(body) AS content_hash
FROM b
"""


def q30_nav_transcripts(spark, sf_dir):
    """W1-W4 over derived transcripts — the navigation surface on the
    extraction output shape."""
    tr = _derived_transcripts(spark, sf_dir).select("conv_id", "turn_idx")
    nav = with_navigation(tr)
    return nav.select(
        "conv_id", "turn_idx",
        F.col("position").cast("long").alias("position"),
        "prev_turn_idx", "next_turn_idx", "first_turn_idx", "last_turn_idx",
        F.round("progress_pct", 6).alias("progress_pct"),
    )


_Q30_SQL = """
WITH tr AS (SELECT 'c' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
                   CAST(doc_id // 50 AS INTEGER) AS turn_idx
            FROM documents)
SELECT conv_id, turn_idx,
       row_number() OVER w AS position,
       lag(turn_idx, 1) OVER w AS prev_turn_idx,
       lead(turn_idx, 1) OVER w AS next_turn_idx,
       first_value(turn_idx) OVER wf AS first_turn_idx,
       last_value(turn_idx) OVER wf AS last_turn_idx,
       round(percent_rank() OVER w * 100.0, 6) AS progress_pct
FROM tr
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx),
       wf AS (PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q31_hourly_tumbling(spark, sf_dir):
    """A7 streaming-shaped: tumbling 1-hour window over event time (the
    batch equivalent of window(ts, '1 hour') — reference computes this over
    a static table, /root/reference/app.py:533-541)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events", "avg_value",
        )
    )


_Q31_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1
"""


def q32_text_preference(spark, sf_dir):
    """E10: two-version text model — display corrected text when present,
    else original (/root/reference/app.py:720-754, coalesce semantics).
    Synthetic corrections: every 5th doc has one."""
    d = _t(spark, sf_dir, "documents")
    corrected = F.when(
        F.pmod("doc_id", F.lit(5)) == 0, F.upper(F.expr("substring(text, 1, 30)"))
    ).otherwise(F.lit(None).cast("string"))
    return d.select(
        "doc_id",
        F.coalesce(corrected, F.col("text")).alias("display_text"),
        corrected.isNotNull().alias("is_corrected"),
    )


_Q32_SQL = """
SELECT doc_id,
       coalesce(CASE WHEN doc_id % 5 = 0 THEN upper(substring(text, 1, 30)) END,
                text) AS display_text,
       (CASE WHEN doc_id % 5 = 0 THEN upper(substring(text, 1, 30)) END)
         IS NOT NULL AS is_corrected
FROM documents
"""


def q33_relevance_order(spark, sf_dir):
    """W6/O4: rank-expression ordering — exact-match class before others,
    then secondary keys (/root/reference/app.py:967-974 CASE relevance),
    paginated top-25."""
    d = _t(spark, sf_dir, "documents")
    rank_cls = F.when(F.col("source") == "src1", 1).otherwise(2)
    return _paginate(
        d.select("doc_id", "source", "n_chars", rank_cls.alias("rank_class")),
        [F.asc("rank_class"), F.desc("n_chars"), F.asc("doc_id")], 1, 25,
    )


_Q33_SQL = """
SELECT * FROM (
  SELECT doc_id, source, n_chars,
         CASE WHEN source = 'src1' THEN 1 ELSE 2 END AS rank_class,
         row_number() OVER (
           ORDER BY CASE WHEN source = 'src1' THEN 1 ELSE 2 END ASC,
                    n_chars DESC, doc_id ASC) AS rn
  FROM documents) WHERE rn <= 25
"""


def q34_rollup_join(spark, sf_dir):
    """J6: the reference's correlated scalar subquery (directory file_count
    rollup, /root/reference/index_images.py:438-445) decorrelated into a
    groupBy + join-back — free decorrelation in the DataFrame formulation."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("file_count"))
    return (
        d.select("doc_id", "source")
        .join(counts, "source")
        .select("doc_id", "source", "file_count")
    )


_Q34_SQL = """
SELECT d.doc_id, d.source,
       (SELECT count(*) FROM documents i WHERE i.source = d.source)
         AS file_count
FROM documents d
"""


def q35_string_funcs(spark, sf_dir):
    """F3/F4/F5: path normalization (backslash → slash), extension swap
    (.txt sidecar naming, /root/reference/ocr_processor.py:111), doc-number
    extraction with positional fallback (/root/reference/app.py:762-776)."""
    d = _t(spark, sf_dir, "documents")
    # synthesize a windows-ish path deterministically from existing columns
    path = F.concat(F.lit("VOL00001\\IMAGES\\"), F.col("source"),
                    F.lit("\\DOJ-OGR-"), F.lpad(F.col("doc_id").cast("string"), 8, "0"),
                    F.lit(".tif"))
    norm = F.translate(path, "\\", "/")
    return d.select(
        "doc_id",
        norm.alias("norm_path"),
        F.regexp_replace(norm, r"\.[^.]+$", ".txt").alias("sidecar_path"),
        F.coalesce(
            F.nullif(F.regexp_extract(norm, r"DOJ-OGR-(\d+)", 1), F.lit("")).cast("int"),
            F.col("doc_id").cast("int"),
        ).alias("doc_number"),
    )


_Q35_SQL = """
WITH p AS (
  SELECT doc_id,
         'VOL00001\\IMAGES\\' || source || '\\DOJ-OGR-' ||
         lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.tif' AS path
  FROM documents)
SELECT doc_id,
       replace(path, '\\', '/') AS norm_path,
       regexp_replace(replace(path, '\\', '/'), '\\.[^.]+$', '.txt')
         AS sidecar_path,
       coalesce(CAST(nullif(regexp_extract(replace(path, '\\', '/'),
                                           'DOJ-OGR-(\\d+)', 1), '') AS INTEGER),
                CAST(doc_id AS INTEGER)) AS doc_number
FROM p
"""


def q36_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads through Arrow-batched
    mapInPandas (decode stubbed, schema/partitioning real). The synthetic
    payloads are derived from md5(media_id), so DuckDB can restate the
    hash/size features over range(200) — full value oracle for the binary
    round-trip through Arrow (was rows-only in r1)."""
    from epstein_browser_spark import multimodal

    media = multimodal.synth_media_spark(spark, 200)
    return multimodal.extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "payload_hash", "decode_status"
    )


_Q36_SQL = """
SELECT range AS media_id,
       CASE CAST(range % 3 AS INT)
         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(length(repeat(md5(CAST(range AS VARCHAR)), 4)) AS BIGINT)
         AS n_bytes,
       md5(repeat(md5(CAST(range AS VARCHAR)), 4)) AS payload_hash,
       'stubbed' AS decode_status
FROM range(200)
"""


def q37_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact baseline on a bounded subset
    (all-pairs; the LSH variant q38 is the scale path)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return similarity.cosine_near_dup_pairs(e, threshold=0.25)


_Q37_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.25
"""


def q38_cosine_pairs_lsh(spark, sf_dir):
    """Embedding near-dup via random-hyperplane LSH buckets + exact-cosine
    verify. Literal hyperplanes make the whole path (bucketing, candidate
    self-join, verify) value-oracle-checked (was rows-only in r1)."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs_lsh(e, dim=64, threshold=0.25,
                                                n_planes=6)


def _q38_sql() -> str:
    cos = (
        "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(c.v, c.v)))"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, ({_lsh_bucket_sql(64, 6)}) AS bucket FROM e)
SELECT a.vec_id AS id_a, c.vec_id AS id_b, round({cos}, 6) AS cosine_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round({cos}, 6) >= 0.25
"""


def q39_search_page(spark, sf_dir, materialize=True):
    """The reference's whole /api/search composed as ONE declarative plan
    (/root/reference/app.py:920-1095): two match families (source-match ≈
    filename-match, content-match with excerpt F1), anti-join dedup (J4),
    relevance-class ordering (W6: exact class first), then window
    pagination (O2/O3) — page 2, 10 per page — plus the response's
    pagination METADATA (total match count and page count,
    /root/reference/app.py:1070-1074), broadcast-joined onto the page rows
    (a scalar aggregate: map-side partial counts, one row crosses the
    wire). The reference does this with two SQL queries plus Python list
    merge/sort/slice; here it is one plan with no driver-side merging."""
    d = _t(spark, sf_dir, "documents")
    q = "join"
    per_page = 10
    src = d.filter(F.col("source") == "src1").select(
        "doc_id", "n_chars",
        F.lit("source").alias("match_type"),
        F.expr("substring(text, 1, 100)").alias("excerpt"),
    )
    txt = (
        d.filter(F.lower("text").contains(q))
        .join(src.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id", "n_chars",
            F.lit("text").alias("match_type"),
            F.expr(
                f"substring(text, greatest(1, locate('{q}', lower(text)) - 50), 100)"
            ).alias("excerpt"),
        )
    )
    # materialize the match set ONCE: both the page rows and the metadata
    # aggregate consume it, and as plain lazy branches each would
    # re-evaluate the full search (two scans + two anti-joins — the r4
    # paired bench measured the double evaluation as q39's entire 1.59×
    # delta vs r2). The match set is the SMALL post-filter frame
    # (hundreds of rows): persist + eager count (NOT localCheckpoint —
    # persisted blocks keep their lineage, so an executor loss recomputes
    # instead of failing the query; the r1 rule applies: an unmaterialized
    # persist referenced twice in one plan recomputes per side, hence the
    # count first). At 100 TB this is exactly the frame you'd cache.
    from pyspark import StorageLevel

    def assemble(unioned):
        meta = unioned.agg(
            F.count("*").alias("total_count"),
            F.ceil(F.count("*") / per_page).alias("n_pages"),
        )
        rank_cls = F.when(F.col("match_type") == "source", 1).otherwise(2)
        page = _paginate(
            unioned.select("doc_id", "match_type", "excerpt", "n_chars",
                           rank_cls.alias("_rank_cls")),
            [F.asc("_rank_cls"), F.desc("n_chars"), F.asc("doc_id")], 11, 20,
        ).select("doc_id", "match_type", "excerpt", "rn")
        return page.crossJoin(F.broadcast(meta))

    if not materialize:
        # plan-inspection path (tests/test_plans.py): the same expression
        # tree with no persist/checkpoint, so the logical shape
        # (TakeOrderedAndProject, partitioned windows) stays visible —
        # the eager path below returns a checkpointed RDD scan whose
        # plan is opaque by construction.
        return assemble(src.unionByName(txt))

    unioned = src.unionByName(txt).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        unioned.count()
        # Materialize the ONE-page result (≤ per_page rows + the scalar
        # metadata) eagerly, so the cached match set can be released
        # before returning — without this, every invocation in a
        # long-lived session (bench loops, repeated driver runs) leaked
        # one cached block (r4 ADVICE). localCheckpoint is acceptable
        # HERE because the checkpointed frame is the bounded page, not
        # the match set: losing its (page-sized, MEMORY_AND_DISK)
        # blocks to an executor loss fails just this query — a cheap
        # retry — and the blocks are ContextCleaner-collected when the
        # frame goes out of scope, which persisted plans are not.
        return assemble(unioned).localCheckpoint(eager=True)
    finally:
        unioned.unpersist()


_Q39_SQL = """
WITH src AS (
  SELECT doc_id, n_chars, 'source' AS match_type,
         substring(text, 1, 100) AS excerpt
  FROM documents WHERE source = 'src1'),
txt AS (
  SELECT d.doc_id, d.n_chars, 'text' AS match_type,
         substring(d.text, greatest(1, position('join' IN lower(d.text)) - 50),
                   100) AS excerpt
  FROM documents d
  WHERE lower(d.text) LIKE '%join%'
    AND d.doc_id NOT IN (SELECT doc_id FROM src)),
u AS (SELECT * FROM src UNION ALL SELECT * FROM txt),
meta AS (SELECT count(*) AS total_count,
                CAST(ceil(count(*) / 10.0) AS BIGINT) AS n_pages FROM u),
r AS (SELECT doc_id, match_type, excerpt,
             row_number() OVER (
               ORDER BY CASE WHEN match_type = 'source' THEN 1 ELSE 2 END ASC,
                        n_chars DESC, doc_id ASC) AS rn
      FROM u)
SELECT doc_id, match_type, excerpt, rn, total_count, n_pages
FROM r CROSS JOIN meta WHERE rn BETWEEN 11 AND 20
"""


def q42_minhash_pairs_md5(spark, sf_dir):
    """MinHash+LSH with the md5-string permutation hash — the SAME
    signatures→banded-candidates→bucket-cap→verify pipeline as q20, made
    value-oracle-checkable: DuckDB reproduces every stage (min-string
    signatures, band keys, window bucket cap, exact-Jaccard verify). q20
    keeps the cheap xxhash64 hash for the bench/scale path; this query
    pins the LSH semantics."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return dedup.minhash_dedup_pairs_md5(d, threshold=0.5).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _minhash_md5_sql(n_perms: int = 16, n_bands: int = 4, shingle: int = 5,
                     threshold: float = 0.5, max_bucket: int = 200,
                     id_cap: int = 250, source_sql: str | None = None) -> str:
    """DuckDB restatement of dedup.minhash_dedup_pairs_md5. ``source_sql``
    overrides the document source — any SELECT producing (id, text) —
    so the SAME oracle pipeline covers other granularities (q76 feeds
    conversation-concatenated docs through it)."""
    width = n_perms // n_bands
    mins = ",\n        ".join(
        f"min(md5(sh || ':{i}')) AS h{i}" for i in range(n_perms)
    )
    band_keys = ", ".join(
        "'" + str(b) + "' || '|' || " + " || '|' || ".join(
            f"h{i}" for i in range(b * width, (b + 1) * width)
        )
        for b in range(n_bands)
    )
    src = source_sql or (
        f"SELECT doc_id AS id, text FROM documents WHERE doc_id < {id_cap}"
    )
    return f"""
WITH srcdocs AS ({src}),
g AS (
  SELECT id,
         unnest(list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - {shingle - 1}),
           i -> lower(trim(text))[i:i+{shingle - 1}]))) AS sh
  FROM srcdocs
  WHERE length(lower(trim(text))) >= {shingle}),
s AS (SELECT id,
        {mins},
        list_distinct(list(sh)) AS grams
      FROM g GROUP BY id),
b AS (SELECT id, grams, unnest([{band_keys}]) AS key FROM s),
bc AS (SELECT *, count(*) OVER (PARTITION BY key) AS bn FROM b),
bf AS (SELECT id, grams, key FROM bc WHERE bn <= {max_bucket}),
p AS (
  SELECT a.id AS id_a, c.id AS id_b,
         CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
           / len(list_distinct(list_concat(a.grams, c.grams))) AS j
  FROM bf a JOIN bf c ON a.key = c.key AND a.id < c.id)
SELECT DISTINCT id_a, id_b, round(j, 6) AS jaccard
FROM p WHERE j >= {threshold}
"""


def q43_dup_clusters(spark, sf_dir):
    """Dup-cluster resolution: connected components over the q19 near-dup
    pairs (iterative min-label propagation — the keep-one-canonical-doc
    step every curation pipeline needs after near-dup detection). Oracle:
    DuckDB recursive-CTE reachability closure over the identical pair
    set."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    return dedup.dedup_clusters(d, pairs).select(
        "id", "cluster_id", "is_canonical"
    )


# the q43 connected-components closure over 3-gram Jaccard>=0.5 pairs at
# doc_id < 200 — shared verbatim by the q112 leakage-safe-split oracle so
# the two restatements cannot drift
_Q43_COMP_CTE = """g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - 2),
           i -> lower(trim(text))[i:i+2])) AS grams
  FROM documents WHERE doc_id < 200 AND length(lower(trim(text))) >= 3),
b AS (SELECT id, grams, list_sort(grams)[1] AS blk FROM g),
p AS (
  SELECT a.id AS id_a, c.id AS id_b
  FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
  WHERE CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
        / len(list_distinct(list_concat(a.grams, c.grams))) >= 0.5),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT s AS id FROM e),
walk(id, label) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.s, w.label FROM e JOIN walk w ON e.d = w.id),
comp AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id)"""

_Q43_SQL = f"""
WITH RECURSIVE {_Q43_COMP_CTE}
SELECT doc.doc_id AS id,
       coalesce(comp.cluster_id, doc.doc_id) AS cluster_id,
       doc.doc_id = coalesce(comp.cluster_id, doc.doc_id) AS is_canonical
FROM documents doc LEFT JOIN comp ON comp.id = doc.doc_id
WHERE doc.doc_id < 200
"""


def q40_failures_queue(spark, sf_dir):
    """E7: the reprocessing-queue projection — low-quality rows with the
    reference's priority rule (10 if lq_confidence > 0.8 else 5,
    /root/reference/helpers/ocr_quality_assessment.py:152-162). Runs the
    production classifier kernel; the oracle restates classifier + rule in
    SQL."""
    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", lowq_udf()(_variant_col()).alias("q"))
    return q.filter(F.col("q.is_low_quality")).select(
        "doc_id",
        F.col("q.lq_reason").alias("lq_reason"),
        F.when(F.col("q.lq_confidence") > 0.8, 10)
        .otherwise(5).cast("int").alias("priority"),
    )


_Q40_SQL = f"""
SELECT doc_id, lq_reason,
       CASE WHEN lq_confidence > 0.8 THEN 10 ELSE 5 END AS priority
FROM ({_Q17_SQL}) WHERE is_low_quality
"""


def q41_rfc2822(spark, sf_dir):
    """F11: the reference's exact RFC-2822 timestamp format for HTTP
    headers/feeds ('%a, %d %b %Y %H:%M:%S GMT',
    /root/reference/app.py:1253,1262) — Spark date_format pattern
    'EEE, dd MMM yyyy HH:mm:ss' + the GMT suffix (session TZ is UTC)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat(
            F.date_format("o_orderdate", "EEE, dd MMM yyyy HH:mm:ss"),
            F.lit(" GMT"),
        ).alias("rfc2822"),
    )


_Q41_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%a, %d %b %Y %H:%M:%S') || ' GMT' AS rfc2822
FROM orders
"""


def q47_frame_sample(spark, sf_dir):
    """Multimodal 1→N row expansion through Arrow: frame sampling of video
    payloads at 1 fps (decode stubbed — frame identity is a deterministic
    (payload, idx) hash — but the mapInPandas row-expansion plumbing is
    real and value-oracle-checked over the same synthetic media)."""
    from epstein_browser_spark import multimodal

    media = multimodal.synth_media_spark(spark, 200)
    return multimodal.sample_frames(media)


_Q47_SQL = """
WITH m AS (
  SELECT range AS media_id,
         CASE CAST(range % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(500 * (range % 5 + 1) AS INT) AS duration_ms,
         repeat(md5(CAST(range AS VARCHAR)), 4) AS payload
  FROM range(200)),
v AS (SELECT * FROM m WHERE kind = 'video'),
f AS (SELECT media_id, payload,
             unnest(generate_series(
               0, CAST(greatest(1, duration_ms // 1000) AS INT) - 1))
               AS frame_idx
      FROM v)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 1000 AS INT) AS ts_ms,
       md5(payload || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash,
       'stubbed' AS decode_status
FROM f
"""


def q48_ivf_topk(spark, sf_dir):
    """IVF ANN (nprobe=1): sampled-centroid coarse quantizer → nearest-cell
    assignment → exact cosine top-k inside the query's cell. Deterministic
    end-to-end (no k-means float ambiguity), so the ENTIRE index +
    search is value-oracle-checked; at 100 TB the assigned table is stored
    PARTITIONED BY (cell) and a probe is a pruned scan of ~1/n_centroids
    of the corpus."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(e, _Q23_QVEC, n_centroids=16, k=10)


def _q48_sql(nprobe: int = 1) -> str:
    qlit = "[" + ", ".join(f"{x:.1f}" for x in _Q23_QVEC) + "]"
    cos = (
        f"list_dot_product(a.v, {qlit}) / (sqrt(list_dot_product(a.v, a.v))"
        f" * sqrt(list_dot_product({qlit}, {qlit})))"
    )
    # rank-based centroid pick (ORDER BY id LIMIT n) — mirrors
    # similarity.ivf_centroids, correct on sparse/non-zero-based id spaces
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT 16),
p AS (SELECT e.vec_id, e.v, c.cid,
        list_dot_product(e.v, e.v) + list_dot_product(c.cvec, c.cvec)
          - 2 * list_dot_product(e.v, c.cvec) AS d
      FROM e CROSS JOIN c),
m AS (SELECT vec_id, min(d) AS mind FROM p GROUP BY vec_id),
a AS (SELECT p.vec_id, p.v, min(p.cid) AS cell
      FROM p JOIN m ON p.vec_id = m.vec_id AND p.d = m.mind
      GROUP BY p.vec_id, p.v),
qc AS (SELECT cid AS q_cell FROM (
         SELECT cid,
                list_dot_product({qlit}, {qlit})
                  + list_dot_product(cvec, cvec)
                  - 2 * list_dot_product({qlit}, cvec) AS d
         FROM c) ORDER BY d ASC, cid ASC LIMIT {nprobe})
SELECT a.vec_id, round({cos}, 6) AS cosine_sim
FROM a JOIN qc ON a.cell = qc.q_cell
ORDER BY {cos} DESC, a.vec_id ASC LIMIT 10
"""


def q53_ivf_topk_multiprobe(spark, sf_dir):
    """IVF ANN at nprobe=4: probe the 4 nearest cells instead of 1 — the
    cell-boundary recall recovery (q48's scale shape, 4 pruned partitions
    instead of 1; recall-dominance over nprobe=1 is pinned by pytest).
    Fully value-oracle-checked like q48: centroid choice, assignment,
    probe set, and scores are all deterministic."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(e, _Q23_QVEC, n_centroids=16, k=10, nprobe=4)


def q49_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN: probe the query's bucket plus its 1-bit-flip
    neighborhood (the standard recall recovery for near-hyperplane
    queries) — still an IN-list of literal buckets, so still a pruned
    scan of n_planes+1 partitions at scale. Full value oracle: the probe
    set is computed driver-side from the literal hyperplanes and embedded
    in the SQL."""
    e = _t(spark, sf_dir, "embeddings")
    bucketed = similarity.with_lsh_bucket(e, dim=64, n_planes=6)
    top = similarity.lsh_topk_df(spark, bucketed, _Q23_QVEC, dim=64, k=10,
                                 n_planes=6, n_flip=1)
    return top.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


def _q49_sql() -> str:
    qlit = "[" + ", ".join(f"{x:.1f}" for x in _Q23_QVEC) + "]"
    probes = similarity.lsh_probe_buckets(64, 6, _Q23_QVEC, n_flip=1)
    cos = (
        f"list_dot_product(v, {qlit}) / (sqrt(list_dot_product(v, v))"
        f" * sqrt(list_dot_product({qlit}, {qlit})))"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v FROM e
      WHERE ({_lsh_bucket_sql(64, 6)}) IN ({", ".join(map(str, probes))}))
SELECT vec_id, round({cos}, 6) AS cosine_sim
FROM b ORDER BY {cos} DESC, vec_id ASC LIMIT 10
"""


def q50_resize_plan(spark, sf_dir):
    """Multimodal resize plumbing (the pixel resample is stubbed — no
    image libs): aspect-fit geometry into a 32px box, never upscaling,
    vectorized numpy over Arrow batches. Oracle restates the math over the
    same synthetic media."""
    from epstein_browser_spark import multimodal

    media = multimodal.synth_media_spark(spark, 200)
    return multimodal.resize_media(media, target=32).select(
        "media_id", "src_w", "src_h", "out_w", "out_h",
        F.round("scale", 6).alias("scale"), "resize_status",
    )


_Q50_SQL = """
WITH m AS (
  SELECT range AS media_id,
         CASE CAST(range % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(32 * (range % 4 + 1) AS INT) AS w,
         CAST(24 * (range % 3 + 1) AS INT) AS h
  FROM range(200)),
i AS (SELECT *, least(1.0, least(32.0 / w, 32.0 / h)) AS scale
      FROM m WHERE kind = 'image')
SELECT media_id, w AS src_w, h AS src_h,
       CAST(greatest(1, floor(w * scale)) AS INT) AS out_w,
       CAST(greatest(1, floor(h * scale)) AS INT) AS out_h,
       round(scale, 6) AS scale, 'stubbed' AS resize_status
FROM i
"""


def q51_langid_ngram(spark, sf_dir):
    """Char-trigram-profile language ID (the n-gram flavor of q25's
    marker-word heuristic): argmax over languages of the doc's distinct
    trigram overlap with literal per-language profiles, explode path."""
    d = _t(spark, sf_dir, "documents")
    return textstats.langid_ngram_table(d, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "predicted_lang"
    )


def _q51_sql() -> str:
    parts = []
    for lang, profile in textstats.LANG_TRIGRAMS.items():
        lst = ", ".join("'" + g.replace("'", "''") + "'" for g in profile)
        parts.append(
            f"printf('%010d', len(list_intersect(grams, [{lst}]))) || '{lang}'"
        )
    best = "greatest(" + ", ".join(parts) + ")"
    return f"""
WITH g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - 2),
           i -> lower(trim(text))[i:i+2])) AS grams
  FROM documents WHERE length(lower(trim(text))) >= 3),
s AS (SELECT d.doc_id, coalesce(g.grams, []) AS grams
      FROM documents d LEFT JOIN g ON g.id = d.doc_id)
SELECT doc_id,
  CASE WHEN CAST(substring({best}, 1, 10) AS INTEGER) > 0
       THEN substring({best}, 11, 10) ELSE 'und' END AS predicted_lang
FROM s
"""


def q44_sessions(spark, sf_dir):
    """Event-time sessionization: per-user session windows with a
    30-minute inactivity gap (F.session_window — the batch form of the
    streaming session operator; training-data pipelines sessionize
    interaction logs exactly like this). Oracle: gaps-and-islands with
    lag + running sum. Session end = last event + gap (Spark
    session_window semantics, mirrored in the SQL)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


_Q44_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


def q45_length_quantiles(spark, sf_dir):
    """Exact distributional stats for curation decisions: continuous
    percentiles of document length per source (Spark `percentile` — exact,
    linear interpolation; DuckDB quantile_cont is the same estimator).
    Scale note: exact percentile buffers the group's values; at 100 TB use
    `approx_percentile` (t-digest sketch, partial-aggregable, bounded
    memory) — the exact form here is what gives the value oracle."""
    d = _t(spark, sf_dir, "documents")
    aggs = [
        F.round(F.expr(f"percentile(n_chars, {q})"), 4).alias(f"p{int(q * 100)}")
        for q in (0.5, 0.9, 0.99)
    ]
    return d.groupBy("source").agg(F.count("*").alias("n_docs"), *aggs)


_Q45_SQL = """
SELECT source, count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents GROUP BY source
"""


def q52_length_quantiles_approx(spark, sf_dir):
    """The 100 TB percentile path (q45's scale twin): `approx_percentile`
    — a Greenwald-Khanna sketch, partial-aggregable with bounded memory
    (O(1/eps * log(eps*n)) samples per group), so one hot source over 10^12
    turns streams through map-side partial aggregation instead of buffering
    every value like exact `percentile` does. Value oracle: at accuracy
    10000 the rank error n/accuracy < 1 for driver-scale groups, so the
    sketch returns exactly the discrete percentile (DuckDB quantile_disc) —
    the operator under test is still the sketch, only its error budget is
    below one element. tests/test_dedup_similarity.py pins the GK rank-error
    bound vs the exact form at accuracy where approximation really kicks in."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr(
                "approx_percentile(n_chars, array(0.5, 0.9, 0.99), 10000)"
            ).alias("_p"),
        )
        .select(
            "source", "n_docs",
            F.col("_p")[0].cast("long").alias("p50"),
            F.col("_p")[1].cast("long").alias("p90"),
            F.col("_p")[2].cast("long").alias("p99"),
        )
    )


_Q52_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents GROUP BY source
"""


def q46_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10) from md5(doc_id) —
    stable across runs, engines, and row order (textstats.
    deterministic_split); plus the realized distribution."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textstats.deterministic_split(F.col("doc_id")).alias("split")
    )


# bucket = int(first 4 hex digits of md5) % 100 — mirrors
# textstats.deterministic_split (4 digits: bias 36/65536, vs 56/256 for one
# byte). The digit-value sum restates Spark's conv(substring(h,1,4),16,10).
def _split_bucket_sql(expr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST({expr} AS VARCHAR))"
        f", {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )


def _split_case_sql(expr: str) -> str:
    """The full deterministic_split restatement: bucket → split name."""
    return (f"CASE WHEN ({_split_bucket_sql(expr)}) % 100 < 80 THEN 'train' "
            f"WHEN ({_split_bucket_sql(expr)}) % 100 < 90 THEN 'val' "
            f"ELSE 'test' END")


_Q46_BUCKET = _split_bucket_sql("doc_id")
_Q46_SQL = f"""
SELECT doc_id,
  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id, ({_Q46_BUCKET}) % 100 AS b
  FROM documents)
"""


def _pii_augmented(d):
    """documents.text with deterministic planted PII (the synthetic corpus
    contains none) — the SAME augmentation is restated in the oracle SQL,
    so the redaction itself is what's value-checked."""
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(3)) == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                         F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.pmod("doc_id", F.lit(5)) == 0,
                F.concat(F.lit(" call 555-010-"),
                         F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"),
                                4, "0")),
            ).otherwise(F.lit("")),
            F.when(F.pmod("doc_id", F.lit(7)) == 0, F.lit(" from 10.0.0.1"))
            .otherwise(F.lit("")),
            F.when(F.pmod("doc_id", F.lit(11)) == 0, F.lit(" ssn 123-45-6789"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


_PII_AUG_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.1' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END
           AS text
  FROM documents
"""


def q54_pii_redaction(spark, sf_dir):
    """PII redaction audit: per-doc redacted text (md5'd for compactness)
    plus per-class match counts — email / SSN / IPv4 / phone regexes, all
    JVM-side `regexp_replace`/`regexp_count` (RE2-compatible patterns, so
    DuckDB restates them verbatim). The curation compliance pass a web/
    transcript corpus needs before training."""
    from epstein_browser_spark import redaction

    aug = _pii_augmented(_t(spark, sf_dir, "documents"))
    out = redaction.pii_counts(aug)
    return out.select(
        F.col("id").alias("doc_id"),
        F.md5("redacted_text").alias("redacted_md5"),
        *[F.col(f"n_{name}").cast("long").alias(f"n_{name}")
          for name, _p, _t2 in redaction.REDACTIONS],
        F.col("n_pii").cast("long").alias("n_pii"),
    )


def _q54_sql() -> str:
    from epstein_browser_spark import redaction

    red = "text"
    for _name, pat, tag in redaction.REDACTIONS:
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    # counts of the TAGS in the redacted output (mirrors pii_counts):
    # sequential redaction means a nested class emits one tag
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(redacted, '{tag}')) AS BIGINT)"
        f" AS n_{name}"
        for name, _pat, tag in redaction.REDACTIONS
    )
    total = " + ".join(f"n_{name}" for name, _p, _t in redaction.REDACTIONS)
    return f"""
WITH aug AS ({_PII_AUG_SQL}),
r0 AS (SELECT doc_id, {red} AS redacted FROM aug),
c AS (SELECT doc_id, md5(redacted) AS redacted_md5, {counts} FROM r0)
SELECT doc_id, redacted_md5, n_email, n_ssn, n_ipv4, n_phone,
       ({total}) AS n_pii
FROM c
"""


def _lines_augmented(d):
    """documents.text reshaped into multi-line docs with known duplicate
    lines, bullets, symbols, and a terminal sentence (the corpus is
    single-line word soup) — same transform in the oracle SQL."""
    multi = F.replace(F.col("text"), F.lit(" table "), F.lit(".\ntable "))
    return d.select(
        "doc_id",
        F.concat(
            multi,
            F.lit("\n- bullet item\n- bullet item\nEnd of the document."),
            F.when(F.pmod("doc_id", F.lit(6)) == 0, F.lit(" ####"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


_LINES_AUG_SQL = """
  SELECT doc_id,
         replace(text, ' table ', '.' || chr(10) || 'table ')
         || chr(10) || '- bullet item' || chr(10) || '- bullet item'
         || chr(10) || 'End of the document.'
         || CASE WHEN doc_id % 6 = 0 THEN ' ####' ELSE '' END AS text
  FROM documents
"""


def q55_quality_rules(spark, sf_dir):
    """C4/Gopher web-corpus quality rules as pure column expressions:
    word-count and mean-word-length bounds, within-doc duplicate-line
    fraction, symbol-to-word ratio, terminal-punctuation line ratio,
    bullet-line fraction, and the composite keep flag. Per-doc bounded
    work, no shuffle, no Python — the standard pre-training document
    filters (C4: Raffel et al. 2020; Gopher rules: Rae et al. 2021)."""
    from epstein_browser_spark import redaction

    aug = _lines_augmented(_t(spark, sf_dir, "documents"))
    out = redaction.quality_rule_flags(aug)
    return out.select(F.col("id").alias("doc_id"), "n_words", "mean_word_len",
                      "dup_line_frac", "symbol_word_ratio",
                      "terminal_punct_ratio", "bullet_line_frac", "keep")


def _q55_sql() -> str:
    words = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"
    lines = ("list_filter(list_transform(string_split_regex(text, "
             "'\r?\n'), s -> trim(s)), s -> s <> '')")
    return f"""
WITH aug AS ({_LINES_AUG_SQL}),
m AS (
  SELECT doc_id,
         len({words}) AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS total_wc,
         length(text) - length(regexp_replace(text, '[#…]', '', 'g'))
           AS n_symbols,
         {lines} AS lines
  FROM aug),
r AS (
  SELECT doc_id, n_words,
         round(CASE WHEN n_words > 0
                    THEN CAST(total_wc AS DOUBLE) / n_words ELSE 0 END, 6)
           AS mean_word_len,
         round(CASE WHEN len(lines) > 0
                    THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                         / len(lines) ELSE 0 END, 6) AS dup_line_frac,
         round(CASE WHEN n_words > 0
                    THEN CAST(n_symbols AS DOUBLE) / n_words
                    ELSE 0 END, 6) AS symbol_word_ratio,
         round(CASE WHEN len(lines) > 0
                    THEN CAST(len(list_filter(lines,
                         s -> right(s, 1) IN ('.', '!', '?', '"'))) AS DOUBLE)
                         / len(lines) ELSE 0 END, 6) AS terminal_punct_ratio,
         round(CASE WHEN len(lines) > 0
                    THEN CAST(len(list_filter(lines,
                         s -> left(s, 1) IN ('-', '*', '•'))) AS DOUBLE)
                         / len(lines) ELSE 0 END, 6) AS bullet_line_frac
  FROM m)
SELECT *,
       (n_words BETWEEN 5 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND dup_line_frac <= 0.3
        AND symbol_word_ratio <= 0.1) AS keep
FROM r
"""


def _url_augmented(d):
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(2)) == 0,
                F.concat(F.lit(" see https://w"),
                         F.pmod("doc_id", F.lit(20)).cast("string"),
                         F.lit(".example.org/p/"),
                         F.col("doc_id").cast("string"), F.lit("?x=1")),
            ).otherwise(F.lit("")),
            F.when(F.pmod("doc_id", F.lit(3)) == 0,
                   F.lit(" http://CDN.example.net/asset.js"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


_URL_AUG_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' see https://w' || CAST(doc_id % 20 AS VARCHAR)
                      || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '?x=1'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' http://CDN.example.net/asset.js' ELSE '' END AS text
  FROM documents
"""


def q56_url_domains(spark, sf_dir):
    """Web-corpus URL hygiene: extract every URL occurrence
    (regexp_extract_all + explode — the corpus-scale shape), normalize to
    lowercase domains, and aggregate the per-domain census (occurrences +
    distinct docs) a blocklist/allowlist filtering pass runs on."""
    from epstein_browser_spark import redaction

    aug = _url_augmented(_t(spark, sf_dir, "documents"))
    urls = redaction.url_domains(aug)
    return (
        urls.groupBy("domain")
        .agg(F.count("*").alias("n_urls"),
             F.countDistinct("id").alias("n_docs"))
        .orderBy(F.desc("n_urls"), F.asc("domain"))
    )


def _q56_sql() -> str:
    from epstein_browser_spark.redaction import DOMAIN_RE, URL_RE

    url_re = URL_RE.replace("'", "''")  # the pattern's char class has a quote
    return f"""
WITH aug AS ({_URL_AUG_SQL}),
u AS (SELECT doc_id, unnest(regexp_extract_all(text, '{url_re}')) AS url
      FROM aug)
SELECT lower(regexp_extract(url, '{DOMAIN_RE}', 1)) AS domain,
       count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
FROM u GROUP BY 1 ORDER BY n_urls DESC, domain ASC
"""


def q57_decontamination(spark, sf_dir):
    """Benchmark decontamination (GPT-3/The-Pile style): training docs
    sharing any 8-word window with an evaluation set. The eval set is
    derived deterministically from the corpus itself (a 16-word excerpt of
    every 25th doc, re-keyed +10000) so there ARE true contaminations to
    find and the whole check is value-oracled. One equi-join on the gram,
    benchmark side broadcast — never all-pairs."""
    d = _t(spark, sf_dir, "documents")
    toks = textstats.tokens(F.lower(F.col("text")))
    bench = d.filter(F.pmod("doc_id", F.lit(25)) == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 5, 16)).alias("text"),
    )
    rep = textstats.contamination_report(d, bench, n=8)
    return rep.select(
        F.col("id").alias("doc_id"),
        F.col("n_shared_grams").cast("long").alias("n_shared_grams"),
        F.col("n_benchmark_docs").cast("long").alias("n_benchmark_docs"),
    )


_Q57_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
bench AS (
  SELECT doc_id + 10000 AS doc_id, toks[5:20] AS toks
  FROM tok WHERE doc_id % 25 = 0),
cg AS (
  SELECT DISTINCT doc_id AS id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM tok WHERE len(toks) >= 8),
bg AS (
  SELECT DISTINCT doc_id AS bench_id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM bench WHERE len(toks) >= 8)
SELECT cg.id AS doc_id,
       count(DISTINCT cg.gram) AS n_shared_grams,
       count(DISTINCT bg.bench_id) AS n_benchmark_docs
FROM cg JOIN bg ON cg.gram = bg.gram
GROUP BY cg.id
"""


def q58_vocab_stats(spark, sf_dir):
    """Corpus vocabulary census: top-20 tokens by occurrence count with
    document frequency — explode + partial-aggregable groupBy +
    TakeOrderedAndProject. What stopword/boilerplate-token discovery runs
    corpus-wide."""
    d = _t(spark, sf_dir, "documents")
    out = textstats.vocab_stats(d, "text", "doc_id", k=20)
    return out.select(
        "token",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


_Q58_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            w -> w <> '')) AS token
  FROM documents)
SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token ASC LIMIT 20
"""


def q59_sequence_packing(spark, sf_dir):
    """Training-sequence packing: assign every doc to a 512-token training
    sequence via a sharded running token sum (GPT concat-and-chunk; the
    window is per shard, so no task sorts the corpus — sequences never
    span shards and the assignment is layout-independent). The shard here
    is md5-derived (deterministic_split's bucket arithmetic mod 8) so the
    ENTIRE packing — shard, cumulative sum, sequence id — is
    value-oracled; production runs use the cheaper default xxhash64
    shard (same semantics, pinned by the unit test)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", textstats.token_count(F.col("text")).alias("n_tokens"))
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("int"), F.lit(8)
    )
    packed = textstats.pack_sequences(toks, budget=512, shard_col=shard)
    return packed.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "shard",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("seq_in_shard").cast("long").alias("seq_in_shard"),
    )


_Q59_SHARD = " + ".join(
    f"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (3 - i)}"
    for i in range(4)
)
_Q59_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '')) AS n_tokens,
         CAST(({_Q59_SHARD}) % 8 AS INT) AS shard
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard,
       CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / 512.0) AS BIGINT) AS seq_in_shard
FROM t
"""


def q60_bm25_rank(spark, sf_dir):
    """BM25 relevance ranking over the document corpus for a multi-term
    query — the principled form of the reference's relevance ordering
    (/root/reference/app.py:967-974 ranks by match class + recency; BM25
    is what a search engine over the same corpus would actually score
    with, and it composes from the same explode/agg/broadcast primitives
    as the rest of the registry).

    Scale shape: tokens are exploded ONCE; the term-frequency branch
    filters to the query terms BEFORE its groupBy (the shuffle carries
    only matching (doc, term) rows); document frequency (|terms| rows)
    and the corpus stats (one row: N, avgdl) are broadcast; final top-20
    is TakeOrderedAndProject. Ordering is by the 6dp-ROUNDED score then
    doc_id, so the ranking is reproducible across engines whose float
    summation orders differ."""
    d = _t(spark, sf_dir, "documents")
    terms = ["spark", "merge", "vector"]
    k1, b = 1.2, 0.75
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda w: w != "")
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    w = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(w), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)


_Q60_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            w -> w <> '')) AS term
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('spark', 'merge', 'vector') GROUP BY doc_id, term),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id,
         round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * 2.2)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))),
               6) AS bm25
  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, bm25 FROM s ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""


_MIXTURE = {"en": 600, "de": 350, "fr": 350, "es": 350, "zh": 100}


def q61_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling against a data-mixture spec —
    the operator a training pipeline uses to rebalance languages/domains
    (keep 60% of en, 35% of de/fr/es, 10% of zh here). The keep decision
    is ``md5-bucket(doc_id) mod 1000 < rate`` — a pure column expression:
    no RNG state, stable across runs/engines/partitionings. FIVE hex
    digits of entropy, not four: 65536 % 1000 = 536 would skew every
    sub-536 bucket by +1/65536 (the same bias class ADVICE r2 fixed in
    deterministic_split); 16^5 % 1000 = 576 leaves a residual bias of
    576/2^20 ≈ 0.05%, inside the documented tolerance. Resampling at a new rate keeps prior decisions
    nested (a doc sampled at 10% is also sampled at 60%), which makes
    mixture re-weighting reproducible downstream. One narrow scan, no
    shuffle, no sampleBy (whose seeded RNG is partitioning-dependent)."""
    d = _t(spark, sf_dir, "documents")
    rate = None
    for lang, r in _MIXTURE.items():
        c = F.when(F.col("lang") == lang, F.lit(r))
        rate = c if rate is None else rate.when(F.col("lang") == lang, F.lit(r))
    rate = rate.otherwise(F.lit(0))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10)
        .cast("long"),
        F.lit(1000),
    )
    return d.select(
        "doc_id", "lang", bucket.cast("long").alias("bucket"),
        rate.cast("long").alias("rate_permille"),
    ).filter(F.col("bucket") < F.col("rate_permille"))


def _q61_sql() -> str:
    shard = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {16 ** (4 - i)}"
        for i in range(5)
    )
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIXTURE.items())
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(({shard}) % 1000 AS BIGINT) AS bucket,
         CAST(CASE lang {cases} ELSE 0 END AS BIGINT) AS rate_permille
  FROM documents)
SELECT * FROM t WHERE bucket < rate_permille
"""


def q62_asof_join(spark, sf_dir):
    """As-of join: for every purchase event, the most recent view event
    of the same user at-or-before the purchase (the canonical
    point-in-time enrichment a feature/training pipeline needs; Spark has
    no built-in ASOF JOIN). Implemented WITHOUT a join: both event
    families ride one window partitioned by user and ordered by
    (ts, is_probe, event_id) — views sort before purchases at equal
    timestamps, so ``last(view, ignorenulls)`` over the running frame is
    exactly the <= match, and ties on ts resolve to the max view
    event_id deterministically. One shuffle on user_id, partition-local
    sort, zero join: at 10^12 events this is the merge-scan shape an
    interval tree would hand-build, with skew handled by AQE. The oracle
    restates it as the O(per-user²) join+row_number form."""
    from epstein_browser_spark.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    refs = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"),
    )
    return asof_join(
        probes, refs, on=["user_id"], ts_col="ts",
        payload=["view_ts", "view_id"], how="inner", suffix="",
    ).select(
        "purchase_id", "user_id",
        F.col("ts").alias("purchase_ts"), "view_ts", "view_id",
    )


_Q62_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
l AS (SELECT * FROM events WHERE event_type = 'view'),
pl AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         l.ts AS view_ts, l.event_id AS view_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY l.ts DESC, l.event_id DESC) AS rn
  FROM p JOIN l ON l.user_id = p.user_id AND l.ts <= p.ts)
SELECT purchase_id, user_id, purchase_ts, view_ts, view_id
FROM pl WHERE rn = 1
"""


def q63_range_join(spark, sf_dir):
    """Bin-bucketed range join: events aggregated into time INTERVALS of
    the same user (intervals derived deterministically from orders:
    start = o_orderdate's time-of-month mapped into the event window,
    length 1..72 h). A naive user-equality join explodes — every user's
    events × every user's intervals — and a pure range join is a
    cartesian scan; instead each interval is exploded into the hour bins
    it covers (≤73 rows, bounded by max interval length) and events join
    on the compound (user, hour-bin) key with the exact range predicate
    as a post-filter. Each event lives in exactly one bin, so no
    dedup pass is needed; join fan-out is proportional to TRUE matches,
    the shuffle key is high-cardinality (user × hour), and the oracle is
    the plain O(n·m) range join restated in SQL (operator:
    joins.range_join_binned; boundary semantics pinned by
    tests/test_joins.py)."""
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    # deterministic synthetic intervals inside the events' time window
    iv = o.filter(F.col("o_orderkey") % 100 < 5).select(
        F.col("o_orderkey").alias("interval_id"),
        F.pmod(F.col("o_custkey"), F.lit(150)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01 00:00:00 UTC
            + F.pmod(F.col("o_orderkey") * 7919, F.lit(29 * 24)) * 3600
        ).alias("start_ts"),
        (F.pmod(F.col("o_orderkey") * 104729, F.lit(72)) + 1).alias("_len_h"),
    ).withColumn(
        "end_ts", F.timestamp_add("HOUR", F.col("_len_h"), F.col("start_ts"))
    ).drop("_len_h")
    from epstein_browser_spark.joins import range_join_binned

    pts = ev.select("event_id", "user_id", "ts", "value")
    joined = range_join_binned(
        pts, iv, on=["user_id"], ts_col="ts",
        start_col="start_ts", end_col="end_ts", bin_seconds=3600,
    )
    return joined.groupBy("interval_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


_Q63_SQL = """
WITH iv AS (
  SELECT o_orderkey AS interval_id,
         o_custkey % 150 AS user_id,
         to_timestamp(1704067200
                      + ((o_orderkey * 7919) % (29 * 24)) * 3600) AS start_ts,
         to_timestamp(1704067200
                      + ((o_orderkey * 7919) % (29 * 24)) * 3600
                      + ((o_orderkey * 104729) % 72 + 1) * 3600) AS end_ts
  FROM orders WHERE o_orderkey % 100 < 5)
SELECT iv.interval_id, count(*) AS n_events,
       round(sum(e.value), 6) AS sum_value
FROM iv JOIN events e
  ON e.user_id = iv.user_id AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
GROUP BY iv.interval_id
"""


def q64_repetition_signals(spark, sf_dir):
    """Gopher within-doc repetition: most-frequent word 2-gram (+ the
    fraction of the token stream its occurrences cover) and the char
    fraction covered by word 3-grams occurring ≥2 times — the
    boilerplate/keyword-stuffing signals that complement q55's line-level
    rules. Operator: textstats.repetition_signals (explode → partial-agg
    counts keyed (doc, gram), lexicographic tie-break so the top gram is
    engine-independent)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.repetition_signals(d).select(
        F.col("id").alias("doc_id"), "n_words", "top_bigram",
        "top_bigram_count", "top_bigram_frac", "dup_trigram_frac",
    )


_Q64_SQL = """
WITH norm AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
den AS (
  SELECT doc_id, len(toks) AS n_words,
         len(array_to_string(toks, ' ')) AS denom
  FROM norm),
bg AS (
  SELECT doc_id, array_to_string(toks[g.g:g.g+1], ' ') AS gram
  FROM norm, LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS g) g
  WHERE len(toks) >= 2),
c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY doc_id, gram),
topc AS (SELECT doc_id, max(cnt) AS top_bigram_count FROM c2 GROUP BY doc_id),
top2 AS (
  SELECT c2.doc_id, t.top_bigram_count, min(c2.gram) AS top_bigram
  FROM c2 JOIN topc t ON c2.doc_id = t.doc_id AND c2.cnt = t.top_bigram_count
  GROUP BY c2.doc_id, t.top_bigram_count),
tg AS (
  SELECT doc_id, array_to_string(toks[g.g:g.g+2], ' ') AS gram
  FROM norm, LATERAL (SELECT unnest(generate_series(1, len(toks)-2)) AS g) g
  WHERE len(toks) >= 3),
c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM tg GROUP BY doc_id, gram),
dup3 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt >= 2 THEN cnt * len(gram) ELSE 0 END) AS dup_chars
  FROM c3 GROUP BY doc_id)
SELECT den.doc_id, den.n_words, top2.top_bigram,
       coalesce(top2.top_bigram_count, 0) AS top_bigram_count,
       CASE WHEN den.denom > 0
            THEN round(least(1.0,
                 coalesce(top2.top_bigram_count * len(top2.top_bigram),
                          0) / CAST(den.denom AS DOUBLE)), 6)
            ELSE 0.0 END AS top_bigram_frac,
       CASE WHEN den.denom > 0
            THEN round(least(1.0, coalesce(dup3.dup_chars, 0)
                       / CAST(den.denom AS DOUBLE)), 6)
            ELSE 0.0 END AS dup_trigram_frac
FROM den
LEFT JOIN top2 ON den.doc_id = top2.doc_id
LEFT JOIN dup3 ON den.doc_id = dup3.doc_id
"""


def q66_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (the compression half of IVF-PQ): every
    vector stored as 4 codes (one per 16-dim subspace, rank-based sampled
    codebooks — deterministic, so encode + lookup-table + ranking are all
    value-oracle-checked), query scored by asymmetric distance: 4 table
    lookups + 4 adds per vector instead of a 64-dim dot product. Ordering
    by the rounded distance then id (the 4-term sum has no guaranteed
    fold order across engines). Operator: similarity.pq_codebooks/
    pq_encode/pq_adc_topk; exactness-on-codebook-vectors pinned by
    pytest."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(e, _Q23_QVEC, m=4, k=16, topk=10)


def _q66_sql(m: int = 4, k: int = 16, dim: int = 64) -> str:
    w = dim // m
    qsubs = {
        s: "[" + ", ".join(f"{float(x):.1f}" for x in _Q23_QVEC[s * w:(s + 1) * w]) + "]"
        for s in range(m)
    }
    qcase = "CASE sub " + " ".join(
        f"WHEN {s} THEN list_dot_product({q}, {q}) + "
        f"list_dot_product(cvec, cvec) - 2 * list_dot_product({q}, cvec)"
        for s, q in qsubs.items()
    ) + " END"
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS code, v AS cv FROM e ORDER BY vec_id LIMIT {k}),
subs AS (SELECT unnest(generate_series(0, {m - 1})) AS sub),
cb AS (SELECT sub, code, cv[sub*{w}+1 : sub*{w}+{w}] AS cvec
       FROM c CROSS JOIN subs),
sv AS (SELECT e.vec_id, sub, v[sub*{w}+1 : sub*{w}+{w}] AS svec
       FROM e CROSS JOIN subs),
p AS (SELECT sv.vec_id, sv.sub, cb.code,
        list_dot_product(svec, svec) + list_dot_product(cvec, cvec)
          - 2 * list_dot_product(svec, cvec) AS d
      FROM sv JOIN cb ON sv.sub = cb.sub),
mn AS (SELECT vec_id, sub, min(d) AS mind FROM p GROUP BY vec_id, sub),
codes AS (SELECT p.vec_id, p.sub, min(p.code) AS code
          FROM p JOIN mn ON p.vec_id = mn.vec_id AND p.sub = mn.sub
                        AND p.d = mn.mind
          GROUP BY p.vec_id, p.sub),
tbl AS (SELECT sub, code, {qcase} AS contrib FROM cb)
SELECT codes.vec_id,
       round(sum(tbl.contrib), 6) AS adc_dist2
FROM codes JOIN tbl ON codes.sub = tbl.sub AND codes.code = tbl.code
GROUP BY codes.vec_id
ORDER BY adc_dist2 ASC, codes.vec_id ASC LIMIT 10
"""


def q67_ivf_pq_topk(spark, sf_dir):
    """Composed IVF-PQ (nprobe=4): the billion-vector ANN architecture in
    one plan — IVF cell pruning (scan ~4/16 of the corpus) + PQ
    asymmetric-distance scoring (4 lookups/vector, dim-independent).
    Every stage deterministic and value-oracled: centroids, cell
    assignment, probe set, codebooks, codes, lookup table, ranking.
    Operator: similarity.ivf_pq_topk."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(e, _Q23_QVEC, n_centroids=16, m=4, k=16,
                                  topk=10, nprobe=4)


def _q67_sql(n_centroids: int = 16, m: int = 4, k: int = 16,
             nprobe: int = 4, dim: int = 64) -> str:
    w = dim // m
    qlit = "[" + ", ".join(f"{x:.1f}" for x in _Q23_QVEC) + "]"
    qsubs = {
        s: "[" + ", ".join(f"{float(x):.1f}" for x in _Q23_QVEC[s * w:(s + 1) * w]) + "]"
        for s in range(m)
    }
    qcase = "CASE sub " + " ".join(
        f"WHEN {s} THEN list_dot_product({q}, {q}) + "
        f"list_dot_product(cvec, cvec) - 2 * list_dot_product({q}, cvec)"
        for s, q in qsubs.items()
    ) + " END"
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT {n_centroids}),
p0 AS (SELECT e.vec_id, c.cid,
         list_dot_product(e.v, e.v) + list_dot_product(c.cvec, c.cvec)
           - 2 * list_dot_product(e.v, c.cvec) AS d
       FROM e CROSS JOIN c),
m0 AS (SELECT vec_id, min(d) AS mind FROM p0 GROUP BY vec_id),
a AS (SELECT p0.vec_id, min(p0.cid) AS cell
      FROM p0 JOIN m0 ON p0.vec_id = m0.vec_id AND p0.d = m0.mind
      GROUP BY p0.vec_id),
qc AS (SELECT cid AS q_cell FROM (
         SELECT cid,
                list_dot_product({qlit}, {qlit})
                  + list_dot_product(cvec, cvec)
                  - 2 * list_dot_product({qlit}, cvec) AS d
         FROM c) ORDER BY d ASC, cid ASC LIMIT {nprobe}),
probed AS (SELECT a.vec_id FROM a JOIN qc ON a.cell = qc.q_cell),
cb0 AS (SELECT vec_id AS code, v AS cv FROM e ORDER BY vec_id LIMIT {k}),
subs AS (SELECT unnest(generate_series(0, {m - 1})) AS sub),
cb AS (SELECT sub, code, cv[sub*{w}+1 : sub*{w}+{w}] AS cvec
       FROM cb0 CROSS JOIN subs),
sv AS (SELECT e.vec_id, sub, v[sub*{w}+1 : sub*{w}+{w}] AS svec
       FROM e CROSS JOIN subs),
p AS (SELECT sv.vec_id, sv.sub, cb.code,
        list_dot_product(svec, svec) + list_dot_product(cvec, cvec)
          - 2 * list_dot_product(svec, cvec) AS d
      FROM sv JOIN cb ON sv.sub = cb.sub),
mn AS (SELECT vec_id, sub, min(d) AS mind FROM p GROUP BY vec_id, sub),
codes AS (SELECT p.vec_id, p.sub, min(p.code) AS code
          FROM p JOIN mn ON p.vec_id = mn.vec_id AND p.sub = mn.sub
                        AND p.d = mn.mind
          GROUP BY p.vec_id, p.sub),
tbl AS (SELECT sub, code, {qcase} AS contrib FROM cb)
SELECT codes.vec_id, round(sum(tbl.contrib), 6) AS adc_dist2
FROM codes
JOIN probed ON codes.vec_id = probed.vec_id
JOIN tbl ON codes.sub = tbl.sub AND codes.code = tbl.code
GROUP BY codes.vec_id
ORDER BY adc_dist2 ASC, codes.vec_id ASC LIMIT 10
"""


def q68_semantic_clusters(spark, sf_dir):
    """SEMANTIC dedup-cluster resolution: connected components over the
    embedding-cosine near-dup pairs (q37's exact bounded pair set) with
    the keep-one-canonical policy — the embedding-level counterpart of
    the textual q43 (near-paraphrases that share no shingles still
    cluster). Same pointer-jumping CC machinery; the LSH pair generator
    (q38) is the drop-in scale path for the pair stage. Oracle: DuckDB
    recursive-CTE reachability closure over the identical pair set."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pairs = similarity.cosine_near_dup_pairs(e, threshold=0.25)
    return dedup.dedup_clusters(e, pairs, id_col="vec_id").select(
        "id", "cluster_id", "is_canonical"
    )


_Q68_SQL = """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < 200),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.25),
ed AS (SELECT id_a AS s, id_b AS d FROM p
       UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT s AS id FROM ed),
walk(id, label) AS (
  SELECT id, id FROM n
  UNION
  SELECT ed.s, w.label FROM ed JOIN walk w ON ed.d = w.id),
comp AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id)
SELECT emb.vec_id AS id,
       coalesce(comp.cluster_id, emb.vec_id) AS cluster_id,
       emb.vec_id = coalesce(comp.cluster_id, emb.vec_id) AS is_canonical
FROM embeddings emb LEFT JOIN comp ON comp.id = emb.vec_id
WHERE emb.vec_id < 200
"""


def q69_mixture_report(spark, sf_dir):
    """Training-mixture report: per (lang, split) doc and token counts
    plus each cell's share of the corpus token total — the summary a
    data-mixture owner reads before adjusting q61's sampling rates. The
    split is q46's deterministic md5 bucket; the global total is a
    scalar aggregate broadcast onto the bounded (|langs|×|splits|) cell
    table, so nothing wide ever funnels to one task."""
    d = _t(spark, sf_dir, "documents")
    toks = textstats.token_count(F.col("text"))
    split = textstats.deterministic_split(F.col("doc_id"))
    cells = (
        d.select("lang", split.alias("split"), toks.alias("_t"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_tokens"))
    )
    total = cells.agg(F.sum("n_tokens").alias("_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "lang", "split", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.col("_total"), 6).alias("token_share"),
    )


def _q69_sql() -> str:
    shard = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"""
WITH t AS (
  SELECT lang,
         CASE WHEN ({shard}) % 100 < 80 THEN 'train'
              WHEN ({shard}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '')) AS n_tok
  FROM documents),
cells AS (
  SELECT lang, split, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM t GROUP BY lang, split),
tot AS (SELECT sum(n_tokens) AS total FROM cells)
SELECT lang, split, n_docs, n_tokens,
       round(n_tokens / CAST(total AS DOUBLE), 6) AS token_share
FROM cells CROSS JOIN tot
"""


def q65_topk_per_group(spark, sf_dir):
    """Per-group top-k: the 3 longest documents of EVERY source (ties by
    doc_id) — the grouped counterpart of the global TakeOrderedAndProject
    queries (q05/q33): a row_number window partitioned by source, so each
    group is ranked independently inside its own shuffle partition and no
    single task ever sees the whole corpus. The shape a curation job uses
    for per-domain exemplar sampling / per-source quality quotas."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "source", "n_chars",
                 F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


_Q65_SQL = """
SELECT doc_id, source, n_chars, rk FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents)
WHERE rk <= 3
"""


def q70_chunking(spark, sf_dir):
    """Training-window chunking: split every document into 64-token
    windows with a 16-token stride overlap (the long-document
    preprocessing step before packing/tokenization — overlap preserves
    cross-boundary context). Pure column expressions: one tokenization,
    chunk starts via ``sequence`` with the stride as step, explode, slice
    + rejoin — no UDF, output rows ∝ tokens/stride. Documents shorter
    than one window become a single chunk."""
    d = _spread(_t(spark, sf_dir, "documents"))
    window, stride = 64, 48  # 16-token overlap
    toks = d.select(
        "doc_id", textstats.tokens(F.lower(F.col("text"))).alias("_toks")
    ).filter(F.size("_toks") > 0)
    # last chunk start: the largest multiple of stride still strictly
    # inside the token list (so a final short window is emitted rather
    # than dropped); single-window docs start only at 0
    last_start = F.greatest(
        F.lit(0),
        (F.ceil((F.size("_toks") - window) / F.lit(stride))).cast("long")
        * stride,
    )
    chunks = toks.select(
        "doc_id",
        F.size("_toks").alias("n_doc_tokens"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), last_start,
                       F.lit(stride).cast("long"))
        ).alias("chunk_start"),
        F.col("_toks"),
    ).filter(  # a start past the end can appear when size < window
        F.col("chunk_start") < F.size("_toks")
    )
    return chunks.select(
        "doc_id",
        (F.col("chunk_start") / stride).cast("long").alias("chunk_idx"),
        "n_doc_tokens",
        F.concat_ws(
            " ",
            F.slice("_toks", (F.col("chunk_start") + 1).cast("int"), window),
        ).alias("chunk_text"),
        F.least(
            F.lit(window), F.size("_toks") - F.col("chunk_start").cast("int")
        ).cast("long").alias("n_tokens"),
    )


_Q70_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
tt AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
st AS (
  SELECT doc_id, n, toks,
         unnest(generate_series(
           0, greatest(0, CAST(ceil((n - 64) / 48.0) AS BIGINT) * 48),
           48)) AS chunk_start
  FROM tt)
SELECT doc_id,
       CAST(chunk_start / 48 AS BIGINT) AS chunk_idx,
       n AS n_doc_tokens,
       array_to_string(toks[chunk_start + 1 : chunk_start + 64],
                       ' ') AS chunk_text,
       CAST(least(64, n - chunk_start) AS BIGINT) AS n_tokens
FROM st WHERE chunk_start < n
"""


def q71_boilerplate_lines(spark, sf_dir):
    """Corpus-level boilerplate detection: non-overlapping 10-word
    segments whose normalized form appears in ≥2 documents (≥0.4% here),
    with document frequency and an example doc — what a curation
    pipeline strips corpus-wide (ToS footers, cookie banners, navigation
    crumbs) that per-document rules cannot see. The segment is the unit
    because boilerplate repeats as a phrase inside otherwise-distinct
    documents. One tokenize + explode + per-doc distinct, one groupBy on
    the segment; output bounded by the distinct-common-segment count."""
    d = _spread(_t(spark, sf_dir, "documents"))
    stats = d.agg(F.count("*").alias("n_docs"))
    toks = d.select(
        "doc_id", textstats.tokens(F.lower(F.col("text"))).alias("_toks")
    ).filter(F.size("_toks") >= 10)
    segs = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.size("_toks") - 1) / 10).cast("long"),
            )
        ).alias("_g"),
        "_toks",
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.slice("_toks", (F.col("_g") * 10 + 1).cast("int"), 10)
        ).alias("line"),
    ).filter(F.length("line") >= 20).distinct()
    counts = segs.groupBy("line").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.min("doc_id").alias("example_doc"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .withColumn(
            "doc_frac", F.round(F.col("doc_freq") / F.col("n_docs"), 6)
        )
        .filter(F.col("doc_frac") >= 0.004)
        .select("line", "doc_freq", "doc_frac", "example_doc")
    )


_Q71_SQL = """
WITH stats AS (SELECT count(*) AS n_docs FROM documents),
t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
seg AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[g.g*10+1 : g.g*10+10], ' ') AS line
  FROM t, LATERAL (SELECT unnest(generate_series(
           0, CAST(floor((len(toks)-1)/10) AS BIGINT))) AS g) g
  WHERE len(toks) >= 10),
counts AS (
  SELECT line, count(DISTINCT doc_id) AS doc_freq,
         min(doc_id) AS example_doc
  FROM seg WHERE len(line) >= 20 GROUP BY line)
SELECT line, doc_freq,
       round(doc_freq / CAST(n_docs AS DOUBLE), 6) AS doc_frac,
       example_doc
FROM counts CROSS JOIN stats
WHERE doc_freq / CAST(n_docs AS DOUBLE) >= 0.004
"""

def _bpe_merges():
    """The frozen merges table (trained once from the sf0.01 documents
    corpus by epstein_browser_spark.bpe.train_merges and committed as a
    resource) — frozen so the APPLY path carries a full value oracle;
    training itself is pinned by golden tests against the pure-Python
    reference (tests/test_bpe.py)."""
    import os

    from epstein_browser_spark import bpe

    return bpe.load_merges(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "resources", "bpe_merges.json"))


def q72_bpe_tokens(spark, sf_dir):
    """Per-document REAL-BPE token counts (corpus-trained merges applied
    as a JVM literal-replace chain — bpe.py): the n_tokens a training
    pipeline actually budgets with, vs the whitespace proxy. Explode
    words → merge chain (codegen, no Python) → per-doc sum; whitespace
    count alongside for the compression view."""
    d = _t(spark, sf_dir, "documents")
    from epstein_browser_spark import bpe

    counts = bpe.doc_bpe_token_counts(d, _bpe_merges(), "text", "doc_id")
    ws = d.select(
        "doc_id", textstats.token_count(F.col("text")).alias("n_ws_tokens")
    )
    return ws.join(counts, ws["doc_id"] == counts["id"]).select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        "n_bpe_tokens",
    )


def _bpe_count_sql(word_expr: str) -> str:
    """DuckDB restatement of the bpe.py merge chain for one word: the
    SAME sentinel-wrapped representation and the SAME literal replaces in
    rank order (replace-all left-to-right in both engines), so the value
    oracle covers every merge."""
    s = (f"regexp_replace(replace({word_expr}, chr(31), ''), '(.)', "
         "chr(31) || '\\1' || chr(31) || ' ', 'g') "
         "|| chr(31) || '</w>' || chr(31)")

    def lit(sym: str) -> str:
        return "chr(31) || '" + sym.replace("'", "''") + "' || chr(31)"

    for a, b in _bpe_merges():
        s = f"replace({s}, {lit(a)} || ' ' || {lit(b)}, {lit(a + b)})"
    return f"len(string_split({s}, ' '))"


def _q72_sql() -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents),
c AS (SELECT doc_id, sum({_bpe_count_sql('w')}) AS n FROM w GROUP BY doc_id)
SELECT d.doc_id,
       CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                            x -> x <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN c USING (doc_id)
"""


def q73_packing_bpe(spark, sf_dir):
    """q59's training-sequence packing driven by REAL BPE token counts
    (VERDICT r3 item 5: budgets must count what the tokenizer emits, not
    whitespace words): same sharded running-sum shape — no corpus-wide
    sort — with n_tokens from the frozen-merges chain."""
    d = _t(spark, sf_dir, "documents")
    from epstein_browser_spark import bpe

    toks = bpe.doc_bpe_token_counts(d, _bpe_merges(), "text", "doc_id").select(
        F.col("id").alias("doc_id"), F.col("n_bpe_tokens").alias("n_tokens")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("int"), F.lit(8)
    )
    packed = textstats.pack_sequences(toks, budget=512, shard_col=shard)
    return packed.select(
        "doc_id", "n_tokens", "shard",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("seq_in_shard").cast("long").alias("seq_in_shard"),
    )


def _q73_sql() -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents),
c AS (SELECT doc_id, sum({_bpe_count_sql('w')}) AS n FROM w GROUP BY doc_id),
t AS (
  SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens,
         CAST(({_Q59_SHARD}) % 8 AS INT) AS shard
  FROM documents d LEFT JOIN c USING (doc_id))
SELECT doc_id, n_tokens, shard,
       CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / 512.0) AS BIGINT) AS seq_in_shard
FROM t
"""


def q74_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN with the LEARNED quantizer (quantizer='kmeans': Lloyd's
    k-means from the deterministic rank seed, exact decimal-sum centroid
    updates — similarity.kmeans_centroids). Same pruned-probe scale shape
    as q48; the oracle replays every Lloyd iteration in SQL — assignment
    argmin, order-independent decimal coordinate sums, empty-cluster
    carryover — so the TRAINED index itself is value-checked, not just
    the final scoring. Recall dominance over the rank quantizer is pinned
    by tests/test_kmeans.py on a clustered corpus."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(e, _Q23_QVEC, n_centroids=8, k=10, nprobe=2,
                               quantizer="kmeans", n_iters=2)


def _kmeans_assign_ctes(n_centroids: int = 8, n_iters: int = 2) -> list[str]:
    """DuckDB CTE chain replaying similarity.kmeans_centroids + ivf_assign
    exactly: rank-seeded c0, per-iteration constant-shifted argmin
    assignment / exact decimal centroid update / empty-cluster carryover,
    ending in ``a`` = (vec_id, v, cell) against the trained centroids
    (table ``c{n_iters}``). Shared by the q74 IVF oracle and the q80
    SemDeDup oracle."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS cvec FROM e "
        f"ORDER BY vec_id LIMIT {n_centroids})",
    ]
    for i in range(n_iters):
        # assignment against c{i}: the same constant-shifted argmin the
        # Spark path evaluates (|v|² dropped — same winners), ties to the
        # lower cid
        ctes.append(
            f"p{i} AS (SELECT e.vec_id, e.v, c.cid, "
            f"list_dot_product(c.cvec, c.cvec) "
            f"- 2 * list_dot_product(e.v, c.cvec) AS d "
            f"FROM e CROSS JOIN c{i} c)"
        )
        ctes.append(
            f"a{i} AS (SELECT p{i}.vec_id, p{i}.v, min(p{i}.cid) AS cell "
            f"FROM p{i} JOIN (SELECT vec_id, min(d) AS mind FROM p{i} "
            f"GROUP BY vec_id) m "
            f"ON p{i}.vec_id = m.vec_id AND p{i}.d = m.mind "
            f"GROUP BY p{i}.vec_id, p{i}.v)"
        )
        # centroid update: EXACT order-independent decimal coordinate
        # sums, cast to double before the division (identical to the
        # driver-side float(Decimal)/n), emptied clusters keep c{i}
        ctes.append(
            f"u{i} AS (SELECT cell, gs.i AS pos, "
            f"CAST(sum(CAST(v[gs.i] AS DECIMAL(38,18))) AS DOUBLE) "
            f"/ count(*) AS mval "
            f"FROM a{i}, LATERAL (SELECT unnest(generate_series(1, len(v)))"
            f" AS i) gs GROUP BY cell, gs.i)"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT c{i}.cid, "
            f"coalesce(n.cvec, c{i}.cvec) AS cvec FROM c{i} LEFT JOIN "
            f"(SELECT cell AS cid, list(mval ORDER BY pos) AS cvec "
            f"FROM u{i} GROUP BY cell) n ON c{i}.cid = n.cid)"
        )
    fin = f"c{n_iters}"
    ctes.append(
        f"pf AS (SELECT e.vec_id, e.v, c.cid, "
        f"list_dot_product(c.cvec, c.cvec) "
        f"- 2 * list_dot_product(e.v, c.cvec) AS d "
        f"FROM e CROSS JOIN {fin} c)"
    )
    ctes.append(
        "a AS (SELECT pf.vec_id, pf.v, min(pf.cid) AS cell "
        "FROM pf JOIN (SELECT vec_id, min(d) AS mind FROM pf "
        "GROUP BY vec_id) m "
        "ON pf.vec_id = m.vec_id AND pf.d = m.mind "
        "GROUP BY pf.vec_id, pf.v)"
    )
    return ctes


def _q74_sql(n_centroids: int = 8, n_iters: int = 2, nprobe: int = 2) -> str:
    qlit = "[" + ", ".join(f"{x:.1f}" for x in _Q23_QVEC) + "]"
    cos = (
        f"list_dot_product(a.v, {qlit}) / (sqrt(list_dot_product(a.v, a.v))"
        f" * sqrt(list_dot_product({qlit}, {qlit})))"
    )
    fin = f"c{n_iters}"
    ctes = _kmeans_assign_ctes(n_centroids, n_iters)
    ctes.append(
        f"qc AS (SELECT cid AS q_cell FROM (SELECT cid, "
        f"list_dot_product({qlit}, {qlit}) + list_dot_product(cvec, cvec) "
        f"- 2 * list_dot_product({qlit}, cvec) AS d FROM {fin}) "
        f"ORDER BY d ASC, cid ASC LIMIT {nprobe})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.vec_id, round({cos}, 6) AS cosine_sim "
        f"FROM a JOIN qc ON a.cell = qc.q_cell "
        f"ORDER BY {cos} DESC, a.vec_id ASC LIMIT 10"
    )


def q75_conv_dedup(spark, sf_dir):
    """CONVERSATION-granularity exact dedup decisions (the keep rule of
    curation's unit='conversation' mode, oracle-able twin: md5 hash +
    lexicographic-min conv_id keep instead of xxhash64 uids): turns
    concatenate per conversation in turn order, whole conversations
    collapse when their concatenation matches. Five planted duplicate
    conversations (relabelled copies of c0–c4) must lose to their
    originals. The production near-dup conversation path (same policy
    over MinHash clusters) is pinned by tests/test_curation.py."""
    tr = _derived_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "text"
    )
    planted = tr.filter(
        F.col("conv_id").isin("c0", "c1", "c2", "c3", "c4")
    ).withColumn("conv_id", F.concat(F.lit("dup_"), F.col("conv_id")))
    allt = tr.unionByName(planted)
    from epstein_browser_spark.curation import conversation_docs

    # the PRODUCTION concatenation kernel — one definition, reused.
    # conv_hash is the kernel's conv_key (md5 of '|'-joined per-turn
    # md5 digests): turn-BOUNDARY-SAFE exact identity — hashing the
    # '\n'-joined conv_text collapsed ['a\nb'] with ['a','b'] (r4 ADVICE)
    convs = conversation_docs(allt, text_col="text").drop("conv_uid")
    w = Window.partitionBy("conv_hash")
    return (
        convs.withColumn("conv_hash", F.col("conv_key"))
        .select(
            "conv_id",
            F.col("n_turns").cast("long").alias("n_turns"),
            "conv_hash",
            (F.col("conv_id") == F.min("conv_id").over(w)).alias("is_kept"),
        )
    )


_Q75_SQL = """
WITH tr AS (
  SELECT concat('c', CAST(doc_id % 50 AS VARCHAR)) AS conv_id,
         CAST(floor(doc_id / 50) AS INT) AS turn_idx, text
  FROM documents),
tr2 AS (
  SELECT * FROM tr
  UNION ALL
  SELECT concat('dup_', conv_id), turn_idx, text FROM tr
  WHERE conv_id IN ('c0', 'c1', 'c2', 'c3', 'c4')),
convs AS (
  SELECT conv_id, count(*) AS n_turns,
         md5(string_agg(md5(text), '|' ORDER BY turn_idx, text))
           AS conv_key
  FROM tr2 GROUP BY conv_id)
SELECT conv_id, n_turns, conv_key AS conv_hash,
       conv_id = min(conv_id) OVER (PARTITION BY conv_key) AS is_kept
FROM convs
"""


def q76_conv_neardup(spark, sf_dir):
    """CONVERSATION-granularity NEAR-dup pairs — the MinHash half of
    curation's unit='conversation' keep policy, through the md5
    oracle-able pipeline (q42's twin at conversation granularity):
    conversations concatenate via the production kernel
    (curation.conversation_docs), three planted near-duplicate
    conversations ('edited ' prefixed onto turn 0 of copies of c0–c2)
    must pair with their originals at jaccard >= 0.7 while staying
    byte-distinct (exact dedup alone would miss them).

    Bounded at every sf: the md5 permutation hash costs ~10× xxhash64
    per shingle (the price of SQL-restatability — q20/q42 notes), and a
    conversation document concatenates ALL its turns, so the input is
    capped to doc_id < 500 (≤10 turns/conv at any sf) and 8 perms / 2
    bands — the xxhash64 path in curation stays the production scale
    form."""
    from epstein_browser_spark.curation import conversation_docs

    tr = _derived_transcripts(spark, sf_dir).filter(
        F.col("turn_idx") < 10
    ).select("conv_id", "turn_idx", "text")
    planted = tr.filter(
        F.col("conv_id").isin("c0", "c1", "c2")
    ).withColumn(
        "conv_id", F.concat(F.lit("dup_"), F.col("conv_id"))
    ).withColumn(
        "text",
        F.when(F.col("turn_idx") == 0,
               F.concat(F.lit("edited "), F.col("text")))
        .otherwise(F.col("text")),
    )
    allt = tr.unionByName(planted)
    convs = conversation_docs(allt, text_col="text").select(
        "conv_id", "conv_text"
    )
    pairs = dedup.minhash_dedup_pairs_md5(
        convs, text_col="conv_text", id_col="conv_id", threshold=0.7,
        n_perms=8, n_bands=2,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _q76_sql() -> str:
    conv_src = """
  SELECT conv_id AS id,
         string_agg(text, chr(10) ORDER BY turn_idx) AS text
  FROM (
    SELECT concat('c', CAST(doc_id % 50 AS VARCHAR)) AS conv_id,
           CAST(floor(doc_id / 50) AS INT) AS turn_idx, text
    FROM documents WHERE floor(doc_id / 50) < 10
    UNION ALL
    SELECT concat('dup_', conv_id),
           turn_idx,
           CASE WHEN turn_idx = 0 THEN 'edited ' || text ELSE text END
    FROM (
      SELECT concat('c', CAST(doc_id % 50 AS VARCHAR)) AS conv_id,
             CAST(floor(doc_id / 50) AS INT) AS turn_idx, text
      FROM documents WHERE floor(doc_id / 50) < 10) base
    WHERE conv_id IN ('c0', 'c1', 'c2'))
  GROUP BY conv_id"""
    return _minhash_md5_sql(threshold=0.7, n_perms=8, n_bands=2,
                            source_sql=conv_src)


def q77_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (textstats.tfidf_top_terms): the
    per-doc keyword extraction a corpus browser shows next to each hit
    (the reference surfaces raw excerpts, /root/reference/app.py:930-966;
    TF-IDF is the principled salience those approximate). df is a window
    count over the term partition — the corpus-sized vocabulary is never
    broadcast or collected; ranking uses the 6dp-rounded score + term so
    top-k boundaries agree cross-engine."""
    d = _spread(_t(spark, sf_dir, "documents"))
    out = textstats.tfidf_top_terms(d, "text", "doc_id", k=3)
    return out.select(
        F.col("id").alias("doc_id"), "term",
        F.col("tf").cast("long").alias("tf"), "tfidf",
        F.col("rank").cast("long").alias("rank"),
    )


_Q77_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            w -> w <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       GROUP BY doc_id, term),
tfd AS (SELECT doc_id, term, tf,
               count(*) OVER (PARTITION BY term) AS df
        FROM tf),
stats AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT doc_id, term, tf,
             round(tf * ln(n_docs / df), 6) AS tfidf
      FROM tfd CROSS JOIN stats),
r AS (SELECT doc_id, term, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rank
      FROM s)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
"""


def _md5_int_sql(expr: str, ndigits: int) -> str:
    """DuckDB restatement of Spark's ``conv(substring(md5(x),1,n),16,10)``
    — hex-digit positional sum with BIGINT-cast multipliers (16^7 rows
    overflow 32-bit INT arithmetic, the default DuckDB integer type)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1))"
        f" - 1) * CAST({16 ** (ndigits - 1 - i)} AS BIGINT)"
        for i in range(ndigits)
    )


def q78_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — the
    MOSS scheme; textstats.winnow_fingerprints): rightmost-min 4-gram
    hash per 5-window, the sub-document near-dup index guaranteeing any
    shared span of ≥ 8 tokens shares a fingerprint at ~1/3 full-shingle
    density. The (hash, position) argmin packs into one bigint key so
    the window min IS the argmin on both engines — no struct ordering or
    argmin_by dependence. Restricted to doc_id < 200 to bound the gate's
    compare set; the operator itself is corpus-wide."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return textstats.winnow_fingerprints(d, "text", "doc_id", k=4, w=5)


def _q78_sql(k: int = 4, w: int = 5) -> str:
    m = 1 << 31  # position field width — must match winnow_fingerprints
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents WHERE doc_id < 200),
g AS (
  SELECT doc_id, gs.i - 1 AS pos,
         array_to_string(toks[gs.i:gs.i+{k - 1}], ' ') AS gram
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks) - {k - 1}))
                     AS i) gs
  WHERE len(toks) >= {k + w - 1}),
keyed AS (
  SELECT doc_id, pos,
         ({_md5_int_sql('gram', 8)}) * CAST({m} AS BIGINT)
           + ({m - 1} - pos) AS key
  FROM g),
sel AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
           AS wkey
  FROM keyed)
SELECT DISTINCT doc_id AS id, CAST(wkey // {m} AS BIGINT) AS fp_hash,
       CAST({m - 1} - wkey % {m} AS BIGINT) AS fp_pos
FROM sel WHERE pos >= {w - 1}
"""


def q79_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. NeurIPS'23;
    textstats.dsir_logweights): hashed-unigram bag features, per-doc
    ``Σ_f n_f · log(p̂_target(f)/p̂_raw(f))`` with add-one smoothing,
    target = the English slice of the corpus. The per-bucket log-ratio
    quantizes to integer micro-nats and sums exactly, so the result is
    independent of float summation order and has no rounding boundary
    for a 1-ulp ln divergence to straddle — fully value-oracled."""
    d = _t(spark, sf_dir, "documents")
    out = textstats.dsir_logweights(d, d.filter(F.col("lang") == "en"),
                                    "text", "doc_id", n_buckets=1024)
    return out.select(F.col("id").alias("doc_id"), "log_weight")


def _q79_sql(n_buckets: int = 1024) -> str:
    return f"""
WITH terms AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) AS term
  FROM documents),
f AS (SELECT id, ({_md5_int_sql('term', 5)}) % {n_buckets} AS bucket
      FROM terms),
tgt_f AS (SELECT f.* FROM f JOIN documents d ON f.id = d.doc_id
          WHERE d.lang = 'en'),
raw_c AS (SELECT bucket, count(*) AS n_raw FROM f GROUP BY bucket),
tgt_c AS (SELECT bucket, count(*) AS n_tgt FROM tgt_f GROUP BY bucket),
tot AS (SELECT (SELECT count(*) FROM f) AS tot_raw,
               (SELECT count(*) FROM tgt_f) AS tot_tgt),
ratio AS (
  SELECT r.bucket,
         CAST(round(ln(((coalesce(t.n_tgt, 0) + 1)
                        / (tot_tgt + {n_buckets}))
                       / ((r.n_raw + 1) / (tot_raw + {n_buckets})))
                    * 1000000.0) AS BIGINT) AS lr_micro
  FROM raw_c r LEFT JOIN tgt_c t ON r.bucket = t.bucket CROSS JOIN tot),
dcnt AS (SELECT id, bucket, count(*) AS n FROM f GROUP BY id, bucket)
SELECT dcnt.id AS doc_id,
       CAST(sum(dcnt.n * ratio.lr_micro) AS DOUBLE) / 1000000.0
         AS log_weight
FROM dcnt JOIN ratio ON dcnt.bucket = ratio.bucket
GROUP BY dcnt.id
"""


def q80_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023; similarity.semdedup): k-means-cluster
    the embeddings (the SAME learned quantizer q74 value-oracles), then
    mark every vector whose within-cell cosine to a lower-id vector
    rounds ≥ 0.3 as a semantic duplicate — clustering bounds the
    quadratic to |cell|², the paper's core trick. Oracle replays the
    Lloyd training via the shared _kmeans_assign_ctes chain, so the
    drop decisions are value-checked against the TRAINED cells."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.semdedup(e, n_centroids=8, threshold=0.3,
                               quantizer="kmeans", n_iters=2, dim=64)


def _q80_sql(n_centroids: int = 8, n_iters: int = 2,
             threshold: float = 0.3) -> str:
    cos = (
        "list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v))"
        " * sqrt(list_dot_product(y.v, y.v)))"
    )
    ctes = _kmeans_assign_ctes(n_centroids, n_iters)
    ctes.append(
        f"dup AS (SELECT DISTINCT x.vec_id FROM a x JOIN a y "
        f"ON x.cell = y.cell AND y.vec_id < x.vec_id "
        f"WHERE round({cos}, 6) >= {threshold})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT a.vec_id AS id, a.cell, "
        "(dup.vec_id IS NOT NULL) AS is_dup "
        "FROM a LEFT JOIN dup ON a.vec_id = dup.vec_id"
    )


def q81_media_decode(spark, sf_dir):
    """REAL image decode through the multimodal Arrow path
    (multimodal.decode_image): 200 valid binary-PPM payloads built from
    column expressions (header + md5-chain RGB bytes), decoded by the
    pure-numpy P6 parser inside mapInPandas, reduced to per-channel
    pixel means. The md5-derived pixel bytes restate in DuckDB
    (hex-pair arithmetic), so the DECODED statistics are value-checked
    — the decode step is no longer stub-only (VERDICT r4 missing item;
    compressed formats still degrade per-row to 'stubbed'). w·h = 16:
    the channel mean divides by a power of two, so numpy's mean and
    SQL's avg agree bit-for-bit."""
    from epstein_browser_spark import multimodal

    m = multimodal.synth_ppm_media_spark(spark, n=200, w=4, h=4)
    return multimodal.extract_decoded_features(m)


def _q81_sql(n: int = 200, w: int = 4, h: int = 4) -> str:
    npix = w * h * 3

    def hexdig(col_off: str) -> str:
        return (
            "(strpos('0123456789abcdef', substring("
            f"md5(media_id || ':' || (p // 16)), {col_off}, 1)) - 1)"
        )

    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {n - 1})) AS media_id),
pos AS (SELECT media_id, gs.p
        FROM ids, LATERAL (SELECT unnest(generate_series(0, {npix - 1}))
                           AS p) gs),
v AS (SELECT media_id, p % 3 AS ch,
             {hexdig("((p % 16) * 2) + 1")} * 16
           + {hexdig("((p % 16) * 2) + 2")} AS val
      FROM pos)
SELECT media_id, {w} AS width, {h} AS height,
       round(avg(CASE WHEN ch = 0 THEN val END), 6) AS r_mean,
       round(avg(CASE WHEN ch = 1 THEN val END), 6) AS g_mean,
       round(avg(CASE WHEN ch = 2 THEN val END), 6) AS b_mean,
       'decoded' AS decode_status
FROM v GROUP BY media_id
"""


def q82_dup_spans(spark, sf_dir):
    """Cross-document EXACT-substring duplicate spans (Lee et al. ACL'22
    ExactSubstr, re-expressed over token 8-grams; textstats.dup_spans):
    token positions whose 8-gram occurs in ≥2 distinct documents, merged
    into maximal per-doc spans — the operator that cuts boilerplate
    embedded INSIDE otherwise-unique documents (the reference's repeated
    Bates-stamp/scanner-banner problem at corpus scale). One wide
    shuffle on the gram, a co-partitioned semi-join back, and per-doc
    island merging — no global window."""
    d = _t(spark, sf_dir, "documents")
    return textstats.dup_spans(d, "text", "doc_id", n=8, min_docs=2
                               ).withColumnRenamed("id", "doc_id")


def _q82_sql(n: int = 8, min_docs: int = 2) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, gs.i - 1 AS pos,
         array_to_string(toks[gs.i:gs.i+{n - 1}], ' ') AS gram
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks) - {n - 1}))
                     AS i) gs
  WHERE len(toks) >= {n}),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= {min_docs}),
m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM m)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {n - 1} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, grp
"""


def q83_shard_shuffle(spark, sf_dir):
    """Deterministic training-epoch shuffle + shard assignment
    (ordering.shard_shuffle): shard = md5(seed:id) mod 16 (unbiased
    4-hex-digit draw), pos = rank of the hash within the shard — the
    epoch permutation as DATA, identical on every engine and rerun, a
    new epoch = a new seed. Per-shard rank windows (shuffle by shard,
    never a global sort)."""
    from epstein_browser_spark import ordering

    d = _t(spark, sf_dir, "documents")
    return ordering.shard_shuffle(d, n_shards=16, seed="epoch0",
                                  id_col="doc_id")


_Q83_SQL = """
WITH k AS (
  SELECT doc_id,
         md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents),
s AS (
  SELECT doc_id, skey,
         CAST(({md5p4}) % 16 AS INT) AS shard
  FROM k)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
            AS BIGINT) AS pos
FROM s
""".format(md5p4=" + ".join(
    f"(strpos('0123456789abcdef', substring(skey, {i + 1}, 1)) - 1)"
    f" * CAST({16 ** (3 - i)} AS BIGINT)" for i in range(4)))


def q84_lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity scoring with head/tail bucketing at the
    corpus mean (CCNet-style quality signal, Wenzek et al. LREC'20;
    textstats.lm_perplexity): add-one-smoothed p(w2|w1), per-bigram
    log-probs quantized to integer micro-nats, per-doc exact integer
    sums — fully value-oracled like q79 (no float summation order, no
    rounding boundary for a 1-ulp ln divergence to straddle)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.lm_perplexity(d, "text", "doc_id"
                                   ).withColumnRenamed("id", "doc_id")


_Q84_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents),
bg AS (
  SELECT doc_id, toks[gs.i] AS w1, toks[gs.i + 1] AS w2
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
       gs
  WHERE len(toks) >= 2),
cnt AS (SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY ALL),
v AS (SELECT count(DISTINCT t.w) AS v
      FROM (SELECT unnest(toks) AS w FROM tok) t),
scored AS (
  SELECT doc_id, n,
         CAST(round(ln((sum(n) OVER (PARTITION BY w1, w2) + 1)
                       / (sum(n) OVER (PARTITION BY w1) + v.v))
                    * 1000000.0) AS BIGINT) AS lp_micro
  FROM cnt, v),
docs AS (
  SELECT doc_id, -sum(n * lp_micro) AS nll_micro,
         sum(n) AS n_bigrams
  FROM scored GROUP BY doc_id),
corpus AS (
  SELECT CAST(sum(nll_micro) AS DOUBLE) / CAST(sum(n_bigrams) AS DOUBLE)
         / 1000000.0 AS mean_nll
  FROM docs)
SELECT doc_id, CAST(nll_micro AS BIGINT) AS nll_micro,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(CAST(nll_micro AS DOUBLE) / 1000000.0 / n_bigrams, 6) AS score,
       CASE WHEN CAST(nll_micro AS DOUBLE) / 1000000.0 / n_bigrams
                 <= corpus.mean_nll
            THEN 'head' ELSE 'tail' END AS bucket
FROM docs, corpus
"""


def q85_eval_containment(spark, sf_dir):
    """Asymmetric benchmark containment (|A∩B| / |A|, A = the eval item):
    the decontamination form that catches a short benchmark item embedded
    verbatim in a long training doc, which Jaccard scores near 0. The
    eval set derives deterministically from the corpus (q57's excerpt
    rule: 16 words of every 25th doc, re-keyed +10000) so true full
    containments exist; kept pairs have ≥ 0.5 of the item's 8-grams.
    Benchmark grams AND totals broadcast; one wide shuffle (per-pair
    count)."""
    d = _t(spark, sf_dir, "documents")
    toks = textstats.tokens(F.lower(F.col("text")))
    bench = d.filter(F.pmod("doc_id", F.lit(25)) == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 5, 16)).alias("text"),
    )
    out = textstats.eval_containment(d, bench, n=8, threshold=0.5)
    return out.select(
        F.col("id").alias("doc_id"),
        "bench_id",
        F.col("n_shared").cast("long").alias("n_shared"),
        "containment",
    )


_Q85_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
bench AS (
  SELECT doc_id + 10000 AS bench_id, toks[5:20] AS toks
  FROM tok WHERE doc_id % 25 = 0),
cg AS (
  SELECT DISTINCT doc_id AS id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM tok WHERE len(toks) >= 8),
bg AS (
  SELECT DISTINCT bench_id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM bench WHERE len(toks) >= 8),
btot AS (SELECT bench_id, count(*) AS nb FROM bg GROUP BY bench_id),
shared AS (
  SELECT cg.id, bg.bench_id, count(*) AS n_shared
  FROM cg JOIN bg USING (gram)
  GROUP BY cg.id, bg.bench_id)
SELECT s.id AS doc_id, s.bench_id,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       round(s.n_shared / b.nb, 6) AS containment
FROM shared s JOIN btot b USING (bench_id)
WHERE round(s.n_shared / b.nb, 6) >= 0.5
"""


def q86_ngram_novelty(spark, sf_dir):
    """Per-doc cross-corpus novelty: fraction of the doc's distinct
    8-grams occurring in no other document — the memorization-risk /
    data-value scalar. One checkpointed explode, partial-agg gram doc
    counts, co-keyed join back, per-doc reduce."""
    d = _t(spark, sf_dir, "documents")
    out = textstats.ngram_novelty(d, n=8)
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("n_grams").cast("long").alias("n_grams"),
        "n_novel",
        "novelty",
    )


_Q86_SQL = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
cg AS (
  SELECT DISTINCT doc_id AS id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM tok WHERE len(toks) >= 8),
dc AS (SELECT gram, count(*) AS nd FROM cg GROUP BY gram)
SELECT cg.id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN dc.nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN dc.nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS novelty
FROM cg JOIN dc USING (gram)
GROUP BY cg.id
"""


_NB_LEXICON = ("spark", "window", "stream", "vector", "merge")


def q87_nb_select(spark, sf_dir):
    """Classifier-scored selection (textstats.nb_quality_scores): distill
    a lexicon rule (≥4 of 5 marker words present — the stand-in for an
    expensive labeler, the FineWeb-Edu pattern) into a hashed-unigram
    Naive Bayes on the doc_id%5<2 labeled subset, score EVERY doc with
    the length-normalized mean token log-odds, keep the top-100 of the
    ranking — the budgeted model-based quality filter. Ranking follows
    the cross-engine contract: order by the 6dp-ROUNDED score, then
    doc_id; global top-k is TakeOrderedAndProject (no full sort, no
    single-partition shuffle)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda t: t != "")
    n_lex = reduce(
        lambda a, b: a + b,
        [F.array_contains(toks, w).cast("int") for w in _NB_LEXICON],
    )
    labeled = d.filter(F.pmod("doc_id", F.lit(5)) < 2).select(
        "doc_id", "text", (n_lex >= 4).alias("label")
    )
    out = textstats.nb_quality_scores(d, labeled)
    return (
        out.select(F.col("id").alias("doc_id"),
                   F.round("nb_score", 6).alias("nb_score"))
        .orderBy(F.col("nb_score").desc(), F.col("doc_id"))
        .limit(100)
    )


def _q87_sql(n_buckets: int = 1024, k: int = 100) -> str:
    lex = " + ".join(
        f"CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END"
        for w in _NB_LEXICON
    )
    return f"""
WITH tok AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     t -> t <> '') AS toks
  FROM documents),
lab AS (SELECT id, ({lex}) >= 4 AS y FROM tok WHERE id % 5 < 2),
terms AS (SELECT id, unnest(toks) AS term FROM tok),
f AS (SELECT id, ({_md5_int_sql('term', 5)}) % {n_buckets} AS bucket
      FROM terms),
lf AS (SELECT f.bucket, lab.y FROM f JOIN lab USING (id)),
cc AS (SELECT bucket,
              sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
              sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS n_neg
       FROM lf GROUP BY bucket),
tot AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS tot_pos,
               sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS tot_neg
        FROM lf),
dom AS (SELECT unnest(generate_series(0, {n_buckets - 1})) AS bucket),
ratio AS (
  SELECT dom.bucket,
         CAST(round(ln(((coalesce(cc.n_pos, 0) + 1)
                        / (tot_pos + {n_buckets}))
                       / ((coalesce(cc.n_neg, 0) + 1)
                          / (tot_neg + {n_buckets})))
                    * 1000000.0) AS BIGINT) AS lr
  FROM dom LEFT JOIN cc ON dom.bucket = cc.bucket CROSS JOIN tot),
dcnt AS (SELECT id, bucket, count(*) AS n FROM f GROUP BY id, bucket),
sums AS (SELECT id, CAST(sum(n * lr) AS BIGINT) AS s,
                CAST(sum(n) AS BIGINT) AS nt
         FROM dcnt JOIN ratio USING (bucket) GROUP BY id)
SELECT id AS doc_id,
       round(CAST(s AS DOUBLE) / nt / 1000000.0, 6) AS nb_score
FROM sums
ORDER BY nb_score DESC, doc_id
LIMIT {k}
"""


def q88_lsh_recall(spark, sf_dir):
    """LSH banding telemetry (dedup.lsh_recall_eval): the md5-MinHash
    banded-candidate stage (16 perms / 4 bands / bucket cap 200 — the
    exact q42 pipeline configuration) measured against exact ground
    truth (every pair with 5-char-shingle Jaccard ≥ 0.5, complete via
    the shared-shingle equi-join — J > 0 implies a shared shingle, no
    cross product). One row: truth size, candidate count, hits, recall,
    candidate precision — the numbers a banding configuration is tuned
    by, run on a bounded sample exactly as production recall estimation
    is."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.lsh_recall_eval(d, n_perms=16, n_bands=4, shingle=5,
                                 threshold=0.5, max_bucket=200)


def _q88_sql(n_perms: int = 16, n_bands: int = 4, shingle: int = 5,
             threshold: float = 0.5, max_bucket: int = 200,
             id_cap: int = 200) -> str:
    width = n_perms // n_bands
    mins = ",\n        ".join(
        f"min(md5(sh || ':{i}')) AS h{i}" for i in range(n_perms)
    )
    band_keys = ", ".join(
        "'" + str(b) + "' || '|' || " + " || '|' || ".join(
            f"h{i}" for i in range(b * width, (b + 1) * width)
        )
        for b in range(n_bands)
    )
    return f"""
WITH srcdocs AS (SELECT doc_id AS id, text FROM documents
                 WHERE doc_id < {id_cap}),
g AS (
  SELECT id,
         unnest(list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - {shingle - 1}),
           i -> lower(trim(text))[i:i+{shingle - 1}]))) AS sh
  FROM srcdocs
  WHERE length(lower(trim(text))) >= {shingle}),
sz AS (SELECT id, count(*) AS n FROM g GROUP BY id),
s AS (SELECT id,
        {mins}
      FROM g GROUP BY id),
b AS (SELECT id, unnest([{band_keys}]) AS key FROM s),
bc AS (SELECT *, count(*) OVER (PARTITION BY key) AS bn FROM b),
bf AS (SELECT id, key FROM bc WHERE bn <= {max_bucket}),
cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
         FROM bf a JOIN bf c ON a.key = c.key AND a.id < c.id),
shp AS (SELECT x.id AS id_a, y.id AS id_b, count(*) AS n_sh
        FROM g x JOIN g y ON x.sh = y.sh AND x.id < y.id
        GROUP BY 1, 2),
truth AS (SELECT id_a, id_b FROM shp
          JOIN sz a ON shp.id_a = a.id JOIN sz b2 ON shp.id_b = b2.id
          WHERE CAST(n_sh AS DOUBLE) / (a.n + b2.n - n_sh)
                >= {threshold}),
u AS (SELECT t.id_a IS NOT NULL AS in_t, c.id_a IS NOT NULL AS in_c
      FROM truth t FULL OUTER JOIN cand c
        ON t.id_a = c.id_a AND t.id_b = c.id_b)
SELECT CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       CAST(sum(CASE WHEN in_t AND in_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       round(sum(CASE WHEN in_t AND in_c THEN 1 ELSE 0 END)
             / nullif(sum(CASE WHEN in_t THEN 1 ELSE 0 END), 0), 6)
         AS recall,
       round(sum(CASE WHEN in_t AND in_c THEN 1 ELSE 0 END)
             / nullif(sum(CASE WHEN in_c THEN 1 ELSE 0 END), 0), 6)
         AS cand_precision
FROM u
"""


# ---------------------------------------------------------------------------
# agent-transcript analytics (convstats) + encoding repair + DSIR selection
# ---------------------------------------------------------------------------

def _derived_agent_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent-transcript-shaped input (the north-rule input_hint schema with
    a NON-constant role/tool/ts derivation, unlike _derived_transcripts):
    turn 0 is the system prompt, doc_id%7==3 turns are tool results (with
    a deterministic tool name and an 'error: ' prefix on the %11==0
    slice), odd turns are user, the rest assistant; ts advances one
    minute per doc_id. Every column derives from doc_id with plain
    arithmetic so the oracle reproduces it in SQL."""
    d = _t(spark, sf_dir, "documents")
    turn_idx = F.floor(F.col("doc_id") / 50).cast("int")
    role = (
        F.when(turn_idx == 0, "system")
        .when(F.pmod("doc_id", F.lit(7)) == 3, "tool")
        .when(F.pmod(turn_idx, F.lit(2)) == 1, "user")
        .otherwise("assistant")
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("browser"), F.lit("python")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ),
    )
    text = F.when(
        (role == "tool") & (F.pmod("doc_id", F.lit(11)) == 0),
        F.concat(F.lit("error: "), F.col("text")),
    ).otherwise(F.col("text"))
    return d.select(
        F.concat(F.lit("c"), F.pmod("doc_id", F.lit(50)).cast("string"))
        .alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.expr(
            "timestampadd(MINUTE, CAST(doc_id AS INT),"
            " timestamp'2024-01-01 00:00:00')"
        ).alias("ts"),
    )


_AGENT_TR_CTE = """
tr AS (
  SELECT 'c' || CAST(doc_id % 50 AS VARCHAR) AS conv_id,
         CAST(doc_id // 50 AS INT) AS turn_idx,
         CASE WHEN doc_id // 50 = 0 THEN 'system'
              WHEN doc_id % 7 = 3 THEN 'tool'
              WHEN (doc_id // 50) % 2 = 1 THEN 'user'
              ELSE 'assistant' END AS role,
         CASE WHEN doc_id // 50 <> 0 AND doc_id % 7 = 3
                   AND doc_id % 11 = 0
              THEN 'error: ' || text ELSE text END AS text,
         CASE WHEN doc_id // 50 <> 0 AND doc_id % 7 = 3
              THEN ['search', 'browser', 'python']
                   [CAST(doc_id % 3 AS INT) + 1]
              END AS tool,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
  FROM documents)
"""


def q89_role_transitions(spark, sf_dir):
    """Conversation-flow bigram matrix (convstats.role_transitions): the
    role→role transition census a dialog-training pipeline validates
    corpus well-formedness with (every conversation enters from the
    synthetic 'start' role). Transcript analog of the reference's
    grouped analytics censuses (/root/reference/app.py:515-566). One
    conv-keyed window shuffle + a partial-agg groupBy bounded by
    |roles|²."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.role_transitions(tr)


_Q89_SQL = f"""
WITH {_AGENT_TR_CTE},
l AS (SELECT conv_id,
             coalesce(lag(role) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx), 'start')
               AS prev_role,
             role
      FROM tr)
SELECT prev_role, role,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM l GROUP BY prev_role, role
"""


def q90_tool_census(spark, sf_dir):
    """Per-tool usage census (convstats.tool_census) over the tool-result
    turns: call/conversation counts, mean result length, error rate —
    the tool-health rollup of an agent-transcript corpus (transcript
    analog of the reference's popular-searches census,
    /root/reference/app.py:557-566). Role filter prunes before the one
    partial-agg shuffle; output bounded by the tool vocabulary."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.tool_census(tr)


_Q90_SQL = f"""
WITH {_AGENT_TR_CTE}
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       round(avg(length(text)), 4) AS avg_result_chars,
       round(avg(CASE WHEN contains(lower(text), 'error:')
                      THEN 1.0 ELSE 0.0 END), 6) AS error_rate
FROM tr WHERE role = 'tool'
GROUP BY tool
"""


def q91_conv_profile(spark, sf_dir):
    """Per-conversation profile (convstats.conv_profile): turn counts by
    role, tool diversity, assistant verbosity, wall-clock span,
    well-formedness flags — the row a curation gate keeps or drops whole
    dialogs by (transcript analog of the reference's per-volume
    breakdown, /root/reference/app.py:886-915). A single partial-agg
    groupBy on the conversation key."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.conv_profile(tr)


_Q91_SQL = f"""
WITH {_AGENT_TR_CTE}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_user,
       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_assistant,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_calls,
       CAST(count(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
       CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
                     ELSE 0 END) AS BIGINT) AS assistant_chars,
       CAST(epoch(max(ts) - min(ts)) AS BIGINT) AS span_seconds,
       max(role = 'system') AS has_system,
       max(role = 'assistant') AS has_assistant
FROM tr GROUP BY conv_id
"""


_MOJIBAKE_BAD = {good: bad for bad, good in textstats.MOJIBAKE_FIXES}
_MOJI_SUFFIX = (
    f" {_MOJIBAKE_BAD['—']} broken {_MOJIBAKE_BAD['’']}quote"
    f"{_MOJIBAKE_BAD['’']}"
)
_MOJI_PREFIX = _MOJIBAKE_BAD["ü"] + "ber "


def q92_mojibake_repair(spark, sf_dir):
    """Encoding-repair census (textstats.fix_mojibake /
    mojibake_census): the ftfy-style UTF-8-read-as-cp1252 cleanup step
    every web-scale text pipeline runs before quality scoring (CCNet's
    normalization stage). Corruption is PLANTED deterministically by
    doc_id%4 — an appended mojibake em-dash/quote suffix, a full
    e→'Ã©' substitution, a mojibake 'über' prefix — so both engines
    see identical inputs and the repair chain (a JVM replace chain
    inside whole-stage codegen, no Python, no regex) is value-checked
    end-to-end."""
    d = _t(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(4))
    corrupted = (
        F.when(m == 1, F.concat(F.col("text"), F.lit(_MOJI_SUFFIX)))
        .when(m == 2, F.replace(F.col("text"), F.lit("e"),
                                F.lit(_MOJIBAKE_BAD["é"])))
        .when(m == 3, F.concat(F.lit(_MOJI_PREFIX), F.col("text")))
        .otherwise(F.col("text"))
    )
    planted = d.select("doc_id", corrupted.alias("text"))
    return textstats.mojibake_census(planted).withColumnRenamed(
        "id", "doc_id"
    )


def _q92_sql() -> str:
    chain = "text"
    for bad, good in textstats.MOJIBAKE_FIXES:
        chain = f"replace({chain}, '{bad}', '{good}')"
    return f"""
WITH c AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 1 THEN text || '{_MOJI_SUFFIX}'
           WHEN 2 THEN replace(text, 'e', '{_MOJIBAKE_BAD["é"]}')
           WHEN 3 THEN '{_MOJI_PREFIX}' || text
           ELSE text END AS text
  FROM documents),
f AS (SELECT doc_id, text, {chain} AS fixed FROM c)
SELECT doc_id,
       (length(text) > length(fixed)) AS was_mojibake,
       CAST(length(text) AS BIGINT) AS chars_before,
       CAST(length(fixed) AS BIGINT) AS chars_after
FROM f
"""


def q93_dsir_select(spark, sf_dir):
    """DSIR Gumbel top-k selection (textstats.dsir_select): the
    importance-RESAMPLING step on top of q79's weights — top-100 by
    ``log_weight + deterministic hash Gumbel`` (sampling ∝ exp(weight)
    without replacement), target = the English slice. The ranking key
    is an exact integer micro-nat sum with doc_id tie-break; the top-k
    plans as TakeOrderedAndProject (no global sort)."""
    d = _t(spark, sf_dir, "documents")
    out = textstats.dsir_select(d, d.filter(F.col("lang") == "en"),
                                k=100, seed="sel0")
    return out.withColumnRenamed("id", "doc_id")


def _q93_sql(k: int = 100, seed: str = "sel0") -> str:
    draw = _md5_int_sql(f"'{seed}:' || CAST(doc_id AS VARCHAR)", 5)
    u = f"(({draw}) + 0.5) / 1048576.0"
    return f"""
WITH w AS ({_q79_sql()}),
g AS (SELECT doc_id, log_weight,
             CAST(round(log_weight * 1000000.0) AS BIGINT)
           + CAST(round(-ln(-ln({u})) * 1000000.0) AS BIGINT)
             AS score_micro
      FROM w)
SELECT doc_id, log_weight, score_micro
FROM g ORDER BY score_micro DESC, doc_id LIMIT {k}
"""


def q94_conv_packing(spark, sf_dir):
    """Conversation-ATOMIC sequence packing
    (convstats.pack_conversations): whole dialogs assigned to
    2048-token training sequences — the fine-tuning counterpart of
    q59's GPT concat-and-chunk, where a dialog must never straddle a
    sequence boundary. Same sharded running-sum machinery (md5 shard
    here so the whole assignment is value-oracled; production uses the
    default xxhash64 shard)."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("conv_id")), 1, 4), 16, 10)
        .cast("int"),
        F.lit(8),
    )
    return convstats.pack_conversations(tr, budget=2048, shard_col=shard,
                                        n_shards=8)


_Q94_SHARD = _md5_int_sql("conv_id", 4)
_Q94_SQL = f"""
WITH {_AGENT_TR_CTE},
ct AS (
  SELECT conv_id,
         CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  w -> w <> ''))) AS BIGINT) AS n_tokens
  FROM tr GROUP BY conv_id),
s AS (SELECT conv_id, n_tokens,
             CAST(({_Q94_SHARD}) % 8 AS INT) AS shard
      FROM ct)
SELECT conv_id, n_tokens, shard,
       CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY conv_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY conv_id
                                       ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / 2048.0) AS BIGINT) AS seq_in_shard
FROM s
"""


def q95_sft_pairs(spark, sf_dir):
    """SFT example builder (convstats.sft_pairs): every assistant turn
    paired with its last-4-turn context rendered as 'role: text' lines —
    the exporter that turns a transcript corpus into supervised training
    pairs. Emits context/target lengths + md5s (the q54 pattern: the
    assembly is value-checked without shipping the assembled strings).
    Bounded window frame keeps per-row work O(k·turn_chars)."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.sft_pairs(tr, k_context=4)


_Q95_SQL = f"""
WITH {_AGENT_TR_CTE},
c AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10))
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS ctx
  FROM tr)
SELECT conv_id, turn_idx,
       CAST(length(ctx) AS BIGINT) AS n_context_chars,
       md5(ctx) AS context_md5,
       CAST(length(text) AS BIGINT) AS n_target_chars,
       md5(text) AS target_md5
FROM c WHERE role = 'assistant' AND ctx IS NOT NULL
"""


def q96_context_budget(spark, sf_dir):
    """Context-window trimming (convstats.context_budget_suffix): the
    maximal suffix of each conversation's turns whose whitespace-token
    total fits a 512-token budget — what an example builder does when a
    dialog outgrows the model context. One reverse-ordered window over
    the conversation key; no second pass, no per-conv collect."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.context_budget_suffix(tr, budget=512)


_Q96_SQL = f"""
WITH {_AGENT_TR_CTE},
t AS (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              w -> w <> '')) AS BIGINT) AS n_tokens
  FROM tr)
SELECT conv_id, turn_idx, n_tokens,
       CAST(sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS rev_cum_tokens,
       (sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                            ROWS UNBOUNDED PRECEDING) <= 512) AS keep
FROM t
"""


def q97_mixture_alpha(spark, sf_dir):
    """α-sampling mixture reweighting (the XLM-R / PaLM multilingual
    policy): per-source sampling weights ∝ share^α (α=0.3) so
    low-resource sources are upsampled relative to their token share,
    plus the expected epochs over each source for a 1M-token budget —
    the numbers a mixture config is written from (composes with q69's
    mixture report and q61's stratified sampler).

    Cross-engine determinism: p^α quantizes to integer nano-units so the
    normalizer is an exact integer sum (no float summation order); the
    final weights divide exact integers (correctly-rounded doubles both
    engines agree on). Scale shape: one partial-agg groupBy to ≤|sources|
    rows, two broadcast scalars — nothing corpus-sized past the first
    aggregate."""
    alpha = 0.3
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(textstats.token_count(F.col("text")))
        .cast("long").alias("n_tokens")
    )
    # The ≤|sources|-row aggregate feeds TWO scalar normalizers (total
    # tokens, then the weight sum); without a cut Catalyst inlines the
    # corpus-sized aggregate into each consumer — four full scans at
    # 100 TB. localCheckpoint pins the tiny frame once (q43 precedent).
    per = per.localCheckpoint(eager=True)
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    w = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_tokens") / F.col("_tot"))
        .withColumn(
            "_w_nano",
            F.round(F.pow("share", F.lit(alpha)) * 1e9, 0).cast("long"),
        )
    )
    wsum = w.agg(F.sum("_w_nano").alias("_wsum"))
    return (
        w.crossJoin(F.broadcast(wsum))
        .select(
            "lang",
            "n_tokens",
            F.round("share", 6).alias("share"),
            F.round(F.col("_w_nano") / F.col("_wsum"), 6)
            .alias("alpha_weight"),
            F.round(
                F.col("_w_nano") / F.col("_wsum") * 1000000.0
                / F.col("n_tokens"), 6
            ).alias("epochs_at_1m"),
        )
    )


_Q97_SQL = """
WITH per AS (
  SELECT lang,
         CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  w -> w <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
w AS (SELECT lang, n_tokens,
             CAST(n_tokens AS DOUBLE) / t AS share,
             CAST(round(pow(CAST(n_tokens AS DOUBLE) / t, 0.3)
                        * 1000000000.0) AS BIGINT) AS w_nano
      FROM per CROSS JOIN tot),
ws AS (SELECT CAST(sum(w_nano) AS BIGINT) AS s FROM w)
SELECT lang, n_tokens, round(share, 6) AS share,
       round(CAST(w_nano AS DOUBLE) / s, 6) AS alpha_weight,
       round(CAST(w_nano AS DOUBLE) / s * 1000000.0 / n_tokens, 6)
         AS epochs_at_1m
FROM w CROSS JOIN ws
"""


def q98_self_repetition(spark, sf_dir):
    """Consecutive assistant-turn self-repetition
    (convstats.self_repetition): distinct-word Jaccard between each
    assistant turn and the previous assistant turn in its conversation —
    the "model is looping / repeating itself" detector an
    agent-transcript curation gate drops dialogs by (the dialog analog
    of q64's within-document repetition signals). Role filter prunes
    before the one conv-keyed window shuffle; pure JVM array set ops,
    no self-join, no UDF."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.self_repetition(tr)


_Q98_SQL = f"""
WITH {_AGENT_TR_CTE},
a AS (
  SELECT conv_id, turn_idx,
         list_distinct(list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '')) AS w
  FROM tr WHERE role = 'assistant'),
l AS (
  SELECT conv_id, turn_idx,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_turn_idx,
         w,
         lag(w) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pw
  FROM a),
m AS (
  SELECT conv_id, turn_idx, prev_turn_idx,
         len(list_filter(w, x -> list_contains(pw, x))) AS n_inter,
         len(w) + len(pw)
           - len(list_filter(w, x -> list_contains(pw, x))) AS n_union
  FROM l WHERE prev_turn_idx IS NOT NULL)
SELECT conv_id, turn_idx, prev_turn_idx,
       CAST(n_inter AS BIGINT) AS n_common_words,
       CASE WHEN n_union > 0
            THEN round(CAST(n_inter AS DOUBLE) / n_union, 6)
            ELSE 0.0 END AS jaccard
FROM m
"""


def q99_tool_grounding(spark, sf_dir):
    """Tool-result grounding rate (convstats.tool_grounding): for every
    assistant turn preceded by a tool result in its conversation, the
    fraction of the turn's distinct words appearing in the MOST RECENT
    tool result — the cheap faithfulness proxy a RAG/agent curation
    pipeline scores responses with before keeping them as training
    targets. One window carries the last tool text forward
    (last ignorenulls over an unbounded-preceding row frame); no join,
    no UDF."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    return convstats.tool_grounding(tr)


_Q99_SQL = f"""
WITH {_AGENT_TR_CTE},
c AS (
  SELECT conv_id, turn_idx, role, text,
         last_value(CASE WHEN role = 'tool' THEN text END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tt
  FROM tr),
g AS (
  SELECT conv_id, turn_idx,
         list_distinct(list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '')) AS aw,
         list_distinct(list_filter(string_split_regex(trim(tt), '\\s+'),
                                   w -> w <> '')) AS tw
  FROM c WHERE role = 'assistant' AND tt IS NOT NULL)
SELECT conv_id, turn_idx,
       CAST(len(aw) AS BIGINT) AS n_words,
       CAST(len(list_filter(aw, x -> list_contains(tw, x))) AS BIGINT)
         AS n_grounded,
       CASE WHEN len(aw) > 0
            THEN round(CAST(len(list_filter(aw, x -> list_contains(tw, x)))
                            AS DOUBLE) / len(aw), 6)
            ELSE 0.0 END AS grounding
FROM g
"""


def q100_episode_segments(spark, sf_dir):
    """Inactivity-gap episode segmentation: split each conversation into
    episodes wherever the gap to the previous turn exceeds 60 minutes —
    how a pipeline cuts long-running agent sessions into training-sized
    dialogs (the transcript analog of q44's event sessionization, but
    batch, per-turn-labeled, and on the north-rule ts column). The base
    derivation spaces turns exactly 50 minutes apart, so the query adds
    a deterministic arithmetic jitter ((turn_idx² + conv_num) mod 23
    minutes, reproduced verbatim in the oracle) giving gaps in [28, 72]
    — both sides of the threshold are exercised.

    Scale shape: ONE exchange on the conversation key serves both
    windows (lag, then the running is-new sum); episode ids are emitted
    per turn rather than aggregated so the plan stays single-shuffle —
    downstream grouping is the consumer's choice."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    jit = tr.withColumn(
        "_ts2",
        F.expr(
            "timestampadd(MINUTE, CAST(pmod(turn_idx * turn_idx"
            " + CAST(substring(conv_id, 2) AS INT), 23) AS INT), ts)"
        ),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gapped = jit.select(
        "conv_id",
        "turn_idx",
        F.expr(
            "timestampdiff(MINUTE,"
            " lag(_ts2) OVER (PARTITION BY conv_id ORDER BY turn_idx),"
            " _ts2)"
        ).cast("long").alias("gap_minutes"),
    )
    is_new = F.when(
        F.col("gap_minutes").isNull() | (F.col("gap_minutes") > 60), 1
    ).otherwise(0)
    return gapped.select(
        "conv_id",
        "turn_idx",
        "gap_minutes",
        F.sum(is_new).over(w).cast("long").alias("episode"),
    )


_Q100_SQL = f"""
WITH {_AGENT_TR_CTE},
j AS (
  SELECT conv_id, turn_idx,
         ts + INTERVAL ((turn_idx * turn_idx
                         + CAST(substr(conv_id, 2) AS INT)) % 23) MINUTE
           AS ts2
  FROM tr),
g AS (
  SELECT conv_id, turn_idx,
         date_diff('minute',
                   lag(ts2) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                   ts2) AS gap_minutes
  FROM j)
SELECT conv_id, turn_idx,
       CAST(gap_minutes AS BIGINT) AS gap_minutes,
       CAST(sum(CASE WHEN gap_minutes IS NULL OR gap_minutes > 60
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
         AS episode
FROM g
"""




def q101_boilerplate_strip(spark, sf_dir):
    """Boilerplate REMOVAL rewrite (textstats.strip_boilerplate): the
    apply half of q71's census — every non-overlapping 10-word segment
    appearing in >=2 documents is cut and the document re-assembled from
    the survivors in order, emitting per-doc before/after sizes and the
    md5 of the cleaned text (the q54/q95 pattern: the rewrite is
    value-checked without shipping the rewritten corpus). This is the
    stage CCNet/RefinedWeb actually run after boilerplate DETECTION —
    the census alone never changes the training set. One tokenize, one
    segment explode, a partial-agg census, one shuffle join back, one
    per-doc re-assembly groupBy."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return textstats.strip_boilerplate(d).withColumnRenamed("id", "doc_id")


_Q101_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents WHERE len(list_filter(
        string_split_regex(trim(lower(text)), '\\s+'), w -> w <> '')) >= 1),
e AS (
  SELECT doc_id, len(toks) AS n,
         length(array_to_string(toks, ' ')) AS chars_before,
         g.g AS g,
         array_to_string(toks[g.g*10+1 : g.g*10+10], ' ') AS seg
  FROM t, LATERAL (SELECT unnest(generate_series(
           0, CAST(floor((len(toks)-1)/10) AS BIGINT))) AS g) g),
census AS (
  SELECT seg FROM e WHERE (g+1)*10 <= n
  GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
k AS (
  SELECT e.doc_id, e.g, e.seg, e.chars_before,
         (c.seg IS NOT NULL AND (e.g+1)*10 <= e.n) AS is_bp
  FROM e LEFT JOIN census c USING (seg)),
agg AS (
  SELECT doc_id,
         count(*) AS n_segs,
         sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS n_dropped,
         min(chars_before) AS chars_before,
         coalesce(string_agg(seg, ' ' ORDER BY g)
                    FILTER (WHERE NOT is_bp), '') AS cleaned
  FROM k GROUP BY doc_id)
SELECT doc_id,
       CAST(n_segs AS BIGINT) AS n_segs,
       CAST(n_dropped AS BIGINT) AS n_dropped,
       CAST(chars_before AS BIGINT) AS chars_before,
       CAST(length(cleaned) AS BIGINT) AS chars_after,
       md5(cleaned) AS clean_md5
FROM agg
"""


def q102_token_entropy(spark, sf_dir):
    """Token-distribution Shannon entropy per document
    (textstats.token_entropy): the order-free gibberish / degenerate-
    repetition quality scalar (near-zero for a doc that repeats one
    phrase, ~ln(n_distinct) for token soup) — complements q64's
    positional repetition signals and q84's bigram-LM score, both of
    which shuffled-boilerplate spam evades. Integer micro-nat exactness
    throughout (the q79/q84 discipline): the per-type term sum is an
    exact integer, so no float summation order anywhere."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return textstats.token_entropy(d).withColumnRenamed("id", "doc_id")


_Q102_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            w -> w <> '')) AS tok
  FROM documents),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(c * CAST(round(ln(c) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS s
  FROM cnt GROUP BY doc_id),
h AS (
  SELECT doc_id, n_tokens, n_distinct,
         CAST(round(ln(n_tokens) * 1000000.0) AS BIGINT)
           - CAST(round(CAST(s AS DOUBLE) / n_tokens) AS BIGINT) AS h_micro,
         CAST(round(ln(n_tokens) * 1000000.0) AS BIGINT) AS ln_n
  FROM per)
SELECT doc_id, n_tokens, n_distinct, h_micro,
       CASE WHEN n_tokens > 1
            THEN round(CAST(h_micro AS DOUBLE) / ln_n, 6)
            ELSE 0.0 END AS norm_entropy
FROM h
"""


def q103_centroid_diversity(spark, sf_dir):
    """Per-label corpus diversity via the O(n) centroid identity
    (similarity.centroid_diversity): mean pairwise cosine from
    per-dimension sums and per-vector norms — Σ_{i≠j} u_i·u_j =
    ||Σu||² − Σ||u||² — replacing the O(n²) pair join (q37) that cannot
    run at 10^12 rows. Components quantize to integer micro-units and
    re-normalize through correctly-rounded IEEE sqrt/divide, so every
    accumulated term is an exact integer on both engines; only the
    final reported ratio is floating-point."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.centroid_diversity(e, "embedding", "label", dim=64)


_Q103_SQL = """
WITH q AS (
  -- CAST to DOUBLE before scaling (the q117 lesson): DuckDB otherwise
  -- multiplies FLOAT * literal in FLOAT precision and quantizes ±1 off
  -- Spark's exact float->double promotion; q103's final 6dp rounding
  -- happened to absorb it at sf0.01, but the arrays themselves must
  -- match the Spark kernel
  SELECT label,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0)
                                  AS BIGINT)) AS q
  FROM embeddings),
s AS (
  SELECT label, q,
         list_sum(list_transform(q, x -> x * x)) AS sq
  FROM q WHERE list_sum(list_transform(q, x -> x * x)) > 0),
u AS (
  SELECT label,
         list_transform(q, x -> CAST(round(CAST(x AS DOUBLE) / sqrt(sq)
                                           * 1000000.0) AS BIGINT)) AS nu
  FROM s),
uu AS (
  SELECT label, nu,
         list_sum(list_transform(nu, x -> x * x)) AS usq
  FROM u),
dims AS (
  SELECT label, usq,
         unnest(nu) AS v,
         unnest(range(1, len(nu) + 1)) AS dim
  FROM uu),
per_dim AS (
  SELECT label, dim, sum(v) AS s,
         sum(CASE WHEN dim = 1 THEN usq END) AS usq0
  FROM dims GROUP BY label, dim),
per_grp AS (
  SELECT label, sum(s * s) AS centroid_sq, sum(usq0) AS sum_usq
  FROM per_dim GROUP BY label),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM uu
      GROUP BY label),
m AS (
  SELECT g.label, n.n_vecs,
         CASE WHEN n.n_vecs > 1
              THEN round(CAST(g.centroid_sq - g.sum_usq AS DOUBLE)
                         / CAST(n.n_vecs * (n.n_vecs - 1) AS DOUBLE)
                         / 1000000000000.0, 6)
              ELSE 0.0 END AS mean_cos
  FROM per_grp g JOIN n USING (label))
SELECT label, n_vecs, mean_cos, round(1.0 - mean_cos, 6) AS diversity
FROM m
"""


def q104_turn_integrity(spark, sf_dir):
    """Transcript ingest-integrity gate (convstats.turn_integrity):
    duplicate turn indices, holes in the index sequence, timestamp
    regressions, and the per-conversation all-clear flag — the
    validation row a 10^12-turn pipeline quarantines dialogs by BEFORE
    extraction or dedup touches them. Defects are PLANTED
    deterministically (the q92/q100 pattern, reproduced verbatim in the
    oracle): doc_id%53==7 turns get an off-by-one index (creating a
    duplicate AND a hole at once), doc_id%89==2 turns get a 180-minute
    timestamp rollback — so at sf0.01 every defect class is non-vacuous
    on both engines. ONE conv-keyed exchange serves the lag window and
    the final groupBy."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    doc_id = (
        F.col("turn_idx").cast("long") * 50
        + F.substring("conv_id", 2, 10).cast("long")
    )
    planted = tr.select(
        "conv_id",
        (F.col("turn_idx")
         + F.when(F.pmod(doc_id, F.lit(53)) == 7, 1).otherwise(0))
        .alias("turn_idx"),
        F.when(
            F.pmod(doc_id, F.lit(89)) == 2,
            F.expr("timestampadd(MINUTE, -180, ts)"),
        ).otherwise(F.col("ts")).alias("ts"),
    )
    return convstats.turn_integrity(planted)


_Q104_SQL = f"""
WITH {{agent_cte}},
p AS (
  SELECT conv_id,
         turn_idx + CASE WHEN (turn_idx * 50
                               + CAST(substr(conv_id, 2) AS BIGINT)) % 53 = 7
                         THEN 1 ELSE 0 END AS turn_idx,
         CASE WHEN (turn_idx * 50
                    + CAST(substr(conv_id, 2) AS BIGINT)) % 89 = 2
              THEN ts - INTERVAL 180 MINUTE ELSE ts END AS ts
  FROM tr),
l AS (
  SELECT conv_id, turn_idx, ts,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts)
           AS prev_ts
  FROM p),
per AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_distinct,
         CAST(min(turn_idx) AS BIGINT) AS min_idx,
         CAST(max(turn_idx) AS BIGINT) AS max_idx,
         CAST(sum(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ts_regress
  FROM l GROUP BY conv_id)
SELECT conv_id, n_turns,
       CAST(n_turns - n_distinct AS BIGINT) AS n_dup_idx,
       CAST(max_idx - min_idx + 1 - n_distinct AS BIGINT) AS n_missing_idx,
       n_ts_regress,
       (n_turns - n_distinct = 0 AND max_idx - min_idx + 1 - n_distinct = 0
        AND n_ts_regress = 0) AS is_valid
FROM per
""".replace("{agent_cte}", _AGENT_TR_CTE)


def q105_robust_length_gate(spark, sf_dir):
    """Robust length-outlier gate (textstats.robust_length_outliers):
    per-source modified z-score from the median and the MAD — the
    curation filter for truncation/concatenation artifacts that
    mean/stddev z-scores miss because the outliers drag the mean.
    Both medians are exact `percentile` (the q45 estimator, identical
    to DuckDB quantile_cont); at 100 TB the gate swaps in
    approx_percentile (q52's t-digest path). The conventional 3.5 cut
    assumes heavy-tailed web lengths; the synthetic corpus is
    uniform-ish (max |z| ≈ 1.8-3.0 across sf), so the query exercises
    the flag at 1.5 to keep BOTH boolean outcomes populated at every
    test scale."""
    d = _t(spark, sf_dir, "documents")
    return (
        textstats.robust_length_outliers(d, z_thresh=1.5)
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("grp", "source")
    )


_Q105_SQL = """
WITH med AS (
  SELECT source, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY source),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, m.med
  FROM documents d JOIN med m USING (source)),
mad AS (
  SELECT source, quantile_cont(abs(n_chars - med), 0.5) AS mad
  FROM dev GROUP BY source),
s AS (
  SELECT dev.doc_id, dev.source, dev.n_chars, dev.med, mad.mad,
         CASE WHEN mad.mad > 0
              THEN 0.6745 * (dev.n_chars - dev.med) / mad.mad
              ELSE 0.0 END AS z
  FROM dev JOIN mad USING (source))
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS "length",
       round(med, 4) AS grp_median, round(mad, 4) AS grp_mad,
       round(z, 6) AS robust_z, (abs(z) > 1.5) AS is_outlier
FROM s
"""


def q106_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve (textstats.vocab_growth):
    cumulative distinct token types vs cumulative tokens per source at
    20-doc ingestion checkpoints — the corpus-diversity monitor (a
    flattening curve = new shards add volume, not vocabulary; a
    type-token ratio that stops falling = dedup leaking templates).
    Checkpoints are global doc_id ranges, not per-source row_numbers —
    no raw-row window, so no per-source sort shuffle at 10^12 rows;
    the only corpus-wide shuffle is the (source, token) first-
    appearance partial agg."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return textstats.vocab_growth(d).withColumnRenamed("grp", "source")


_Q106_SQL = """
WITH base AS (
  SELECT source, CAST(floor(doc_id / 20) AS BIGINT) AS bucket,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
firsts AS (
  SELECT source, tok, min(bucket) AS bucket
  FROM (SELECT source, bucket, unnest(list_distinct(toks)) AS tok
        FROM base)
  GROUP BY source, tok),
newt AS (SELECT source, bucket, count(*) AS new_types
         FROM firsts GROUP BY source, bucket),
pb AS (SELECT source, bucket, count(*) AS new_docs,
              sum(len(toks)) AS new_tokens
       FROM base GROUP BY source, bucket),
j AS (SELECT pb.source, pb.bucket, pb.new_docs, pb.new_tokens,
             coalesce(newt.new_types, 0) AS new_types
      FROM pb LEFT JOIN newt USING (source, bucket))
SELECT source, bucket,
       CAST(sum(new_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(new_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(new_types) OVER w AS BIGINT) AS cum_types,
       CASE WHEN sum(new_tokens) OVER w > 0
            THEN round(CAST(sum(new_types) OVER w AS DOUBLE)
                       / CAST(sum(new_tokens) OVER w AS DOUBLE), 6)
            ELSE 0.0 END AS type_token_ratio
FROM j
WINDOW w AS (PARTITION BY source ORDER BY bucket ROWS UNBOUNDED PRECEDING)
"""


def q107_unigram_kl(spark, sf_dir):
    """Per-source unigram KL divergence vs the corpus distribution
    (textstats.unigram_kl) — the mixture-drift diagnostic: which
    source's token distribution is unusual, how far a crawl snapshot
    drifted from the training mix. Integer micro-nat exactness (the
    q79/q102 discipline) with a decimal(38,0) term sum — at 10^12
    tokens a per-type term passes bigint range; only the final /N_g
    rescale is floating-point."""
    d = _spread(_t(spark, sf_dir, "documents"))
    return textstats.unigram_kl(d).withColumnRenamed("grp", "source")


_Q107_SQL = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            w -> w <> '')) AS tok
  FROM documents),
gt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok),
ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_g,
              CAST(count(*) AS BIGINT) AS n_types
       FROM gt GROUP BY source),
ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS c_t FROM gt GROUP BY tok),
nt AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM ng),
term AS (
  SELECT gt.source, ng.n_g, ng.n_types,
         CAST(gt.c AS HUGEINT) * (
             CAST(round(ln(gt.c) * 1000000.0) AS BIGINT)
           - CAST(round(ln(ng.n_g) * 1000000.0) AS BIGINT)
           - CAST(round(ln(ct.c_t) * 1000000.0) AS BIGINT)
           + CAST(round(ln(nt.n) * 1000000.0) AS BIGINT)) AS t
  FROM gt JOIN ng USING (source) JOIN ct USING (tok) CROSS JOIN nt),
agg AS (
  SELECT source, max(n_g) AS n_tokens, max(n_types) AS n_types,
         sum(t) AS kl_micro
  FROM term GROUP BY source)
SELECT source, n_tokens, n_types,
       round(CAST(kl_micro AS DOUBLE) / n_tokens / 1000000.0, 6) AS kl_nats
FROM agg
"""


def q108_chunk_langid(spark, sf_dir):
    """Per-chunk language ID / code-switch report (textstats.
    chunk_langid): 40-token chunks each vote via q51's trigram-profile
    argmax; per document the report is chunk count, majority language,
    agreement ratio, distinct real languages, and the code-switch flag
    — the CCNet per-paragraph langid that catches the half-English
    half-German page a document-level vote (q51) waves through. The
    synthetic corpus's per-chunk votes are naturally diverse (every
    output column takes multiple values at sf0.001+), so nothing is
    planted."""
    d = _t(spark, sf_dir, "documents")
    return textstats.chunk_langid(d).withColumnRenamed("id", "doc_id")


def _q108_sql() -> str:
    hit_cols, best_parts = [], []
    for lang, profile in textstats.LANG_TRIGRAMS.items():
        lst = ", ".join("'" + g.replace("'", "''") + "'" for g in profile)
        hit_cols.append(
            f"sum(CASE WHEN sh IN ({lst}) THEN 1 ELSE 0 END) AS h_{lang}"
        )
        # sum() yields HUGEINT, which DuckDB printf('%d') rejects
        best_parts.append(
            f"printf('%010d', CAST(coalesce(h.h_{lang}, 0) AS BIGINT))"
            f" || '{lang}'"
        )
    best = "greatest(" + ", ".join(best_parts) + ")"
    return f"""
WITH norm AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
chunks AS (
  SELECT id, g.g AS ci,
         array_to_string(toks[g.g*40+1 : g.g*40+40], ' ') AS chunk
  FROM norm, LATERAL (SELECT unnest(generate_series(
         0, CAST(ceil(len(toks) / 40.0) AS BIGINT) - 1)) AS g) g
  WHERE len(toks) >= 1),
sh AS (
  SELECT DISTINCT id, ci, chunk[i.i:i.i+2] AS sh
  FROM chunks, LATERAL (SELECT unnest(generate_series(
         1, length(chunk) - 2)) AS i) i
  WHERE length(chunk) >= 3),
hits AS (
  SELECT id, ci, {", ".join(hit_cols)}
  FROM sh GROUP BY id, ci),
cl AS (
  SELECT c.id, c.ci,
         CASE WHEN CAST(substring({best}, 1, 10) AS INTEGER) > 0
              THEN substring({best}, 11, 10) ELSE 'und' END AS lang
  FROM chunks c LEFT JOIN hits h ON h.id = c.id AND h.ci = c.ci),
per_lang AS (SELECT id, lang, count(*) AS cnt FROM cl GROUP BY id, lang),
per_doc AS (
  SELECT id, CAST(sum(cnt) AS BIGINT) AS n_chunks,
         max(printf('%010d', CAST(cnt AS BIGINT)) || lang) AS top,
         CAST(sum(CASE WHEN lang <> 'und' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_langs
  FROM per_lang GROUP BY id)
SELECT d.doc_id,
       coalesce(p.n_chunks, 0) AS n_chunks,
       coalesce(substring(p.top, 11, 10), 'und') AS majority_lang,
       coalesce(round(CAST(substring(p.top, 1, 10) AS DOUBLE)
                      / p.n_chunks, 6), 0.0) AS lang_agreement,
       coalesce(p.n_langs, 0) AS n_langs,
       coalesce(p.n_langs >= 2, FALSE) AS is_code_switched
FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
"""


def q109_keep_best(spark, sf_dir):
    """Quality-ranked dedup keep policy (dedup.keep_best_in_cluster):
    q43 resolves near-dup clusters and keeps the MIN id; production
    pipelines (FineWeb et al.) instead keep the highest-quality member
    so dedup never downgrades the surviving copy. Score here = n_chars
    (keep-longest, the common default), ties to the smallest id —
    fully deterministic, so the per-cluster ranking is value-oracled.
    ONE window over cluster_id (frames are near-dup groups, bounded by
    the pair-generation caps, never corpus-sized) on top of the q43
    component machinery."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    return dedup.keep_best_in_cluster(d, pairs).withColumn(
        "score", F.col("score").cast("long")
    )


_Q109_SQL = """
WITH RECURSIVE g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - 2),
           i -> lower(trim(text))[i:i+2])) AS grams
  FROM documents WHERE doc_id < 200 AND length(lower(trim(text))) >= 3),
b AS (SELECT id, grams, list_sort(grams)[1] AS blk FROM g),
p AS (
  SELECT a.id AS id_a, c.id AS id_b
  FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
  WHERE CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
        / len(list_distinct(list_concat(a.grams, c.grams))) >= 0.5),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT s AS id FROM e),
walk(id, label) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.s, w.label FROM e JOIN walk w ON e.d = w.id),
comp AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id),
scored AS (
  SELECT doc.doc_id AS id,
         coalesce(comp.cluster_id, doc.doc_id) AS cluster_id,
         CAST(doc.n_chars AS BIGINT) AS score
  FROM documents doc LEFT JOIN comp ON comp.id = doc.doc_id
  WHERE doc.doc_id < 200)
SELECT id, cluster_id, score,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY score DESC, id) AS rank_in_cluster,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY score DESC, id) = 1 AS is_kept
FROM scored
"""


def q110_source_overlap(spark, sf_dir):
    """Cross-source near-duplicate overlap matrix: q19's exact-Jaccard
    near-dup pairs aggregated per unordered source pair — the
    provenance-overlap report a mixture owner reads before weighting
    sources (two crawls that near-duplicate each other should not both
    be upsampled; q69/q97 weight by volume alone). Per (src_a, src_b):
    pair count and the min/max Jaccard observed — order-free picks of
    per-pair doubles (NO float-sum aggregates like avg, whose
    summation order differs between engines). Two broadcast joins of
    the |docs|-row (id, source) projection onto the pair set, one
    partial-agg groupBy on the source pair."""
    d = _spread(_t(spark, sf_dir, "documents")).filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    meta = d.select("doc_id", "source")
    j = (
        pairs.join(
            F.broadcast(meta.select(F.col("doc_id").alias("id_a"),
                                    F.col("source").alias("_sa"))),
            "id_a",
        )
        .join(
            F.broadcast(meta.select(F.col("doc_id").alias("id_b"),
                                    F.col("source").alias("_sb"))),
            "id_b",
        )
    )
    return (
        j.select(
            F.least("_sa", "_sb").alias("src_a"),
            F.greatest("_sa", "_sb").alias("src_b"),
            "jaccard",
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.min("jaccard"), 6).alias("min_jaccard"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


_Q110_SQL = """
WITH g AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, length(lower(trim(text))) - 2),
           i -> lower(trim(text))[i:i+2])) AS grams
  FROM documents WHERE doc_id < 200 AND length(lower(trim(text))) >= 3),
b AS (SELECT id, grams, list_sort(grams)[1] AS blk FROM g),
p AS (
  SELECT a.id AS id_a, c.id AS id_b,
         CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
           / len(list_distinct(list_concat(a.grams, c.grams))) AS jaccard
  FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
  WHERE CAST(len(list_intersect(a.grams, c.grams)) AS DOUBLE)
        / len(list_distinct(list_concat(a.grams, c.grams))) >= 0.5),
j AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b,
         p.jaccard
  FROM p
  JOIN documents da ON da.doc_id = p.id_a
  JOIN documents db ON db.doc_id = p.id_b)
SELECT src_a, src_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(min(jaccard), 6) AS min_jaccard,
       round(max(jaccard), 6) AS max_jaccard
FROM j GROUP BY src_a, src_b
"""


def q111_template_turns(spark, sf_dir):
    """Canned-response / template-turn census (convstats.template_turns):
    exact turn texts repeated across the transcript corpus, per role —
    what dialog curation strips before SFT (templated refusals, system-
    prompt echoes, copy-pasted tool boilerplate teach the template, not
    the behavior). Templates are PLANTED deterministically (the
    q92/q104 pattern): turns whose reconstructed doc_id
    (turn_idx*50 + conv number) is ≡5 mod 13 are replaced with a
    per-role canned string, reproduced verbatim in the oracle — so the
    census is non-vacuous for several roles at every sf. Texts ship as
    md5 + length only (the q42/q54 discipline)."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    doc_id = (
        F.col("turn_idx").cast("long") * 50
        + F.substring("conv_id", 2, 10).cast("long")
    )
    planted = tr.withColumn(
        "text",
        F.when(
            F.pmod(doc_id, F.lit(13)) == 5,
            F.concat(F.lit("I cannot help with that request. [canned:"),
                     F.col("role"), F.lit("]")),
        ).otherwise(F.col("text")),
    )
    return convstats.template_turns(planted)


_Q111_SQL = """
WITH {agent_cte},
planted AS (
  SELECT role, conv_id,
         CASE WHEN (CAST(turn_idx AS BIGINT) * 50
                    + CAST(substring(conv_id, 2, 10) AS BIGINT)) % 13 = 5
              THEN 'I cannot help with that request. [canned:' || role
                   || ']'
              ELSE text END AS text
  FROM tr)
SELECT role, md5(text) AS text_md5,
       CAST(length(text) AS BIGINT) AS turn_len,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM planted
GROUP BY role, md5(text), length(text)
HAVING count(*) >= 2
""".replace("{agent_cte}", _AGENT_TR_CTE)


def q112_leakage_safe_split(spark, sf_dir):
    """Dedup-aware (cluster-atomic) train/val/test split
    (dedup.leakage_safe_split): every member of a q43 near-dup cluster
    lands in the split of its CLUSTER id, so a held-out document is
    never a near-duplicate of a training document — the leak the
    per-doc hash split (q46) cannot prevent. `was_leaky` marks the docs
    the cluster-atomic rule moved (33 of 200 at sf0.01 — the realized
    leak rate of naive splitting on this corpus). Oracle: the q43
    recursive-CTE closure (shared CTE text — cannot drift) + the q46
    bucket arithmetic applied to cluster_id and id."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    return dedup.leakage_safe_split(d, pairs)


_Q112_SQL = f"""
WITH RECURSIVE {_Q43_COMP_CTE},
t AS (
  SELECT doc.doc_id AS id,
         coalesce(comp.cluster_id, doc.doc_id) AS cluster_id
  FROM documents doc LEFT JOIN comp ON comp.id = doc.doc_id
  WHERE doc.doc_id < 200),
s AS (
  SELECT id, cluster_id,
         {_split_case_sql('cluster_id')} AS split,
         {_split_case_sql('id')} AS naive_split
  FROM t)
SELECT id, cluster_id, split, naive_split,
       split <> naive_split AS was_leaky
FROM s
"""


def q113_split_leakage(spark, sf_dir):
    """Cross-split n-gram leakage report (textstats.split_leakage): for
    every val/test document under the PER-DOC hash split (q46) that
    shares a word 8-gram with any train document, the shared-gram and
    matched-train-doc counts — the audit that motivates q112's
    cluster-atomic fix (GPT-3's dirtiness check pointed at the corpus's
    own splits). One gram explode, split as a column expression, ONE
    gram-keyed shuffle; join cost Σ_gram df_train·df_eval (per-gram
    document frequency, never corpus size)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.split_leakage(d, n=8)


_Q113_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
cg AS (
  SELECT DISTINCT doc_id AS id,
         unnest(list_transform(generate_series(1, len(toks) - 7),
                               i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM tok WHERE len(toks) >= 8),
sp AS (SELECT id, gram, {_split_case_sql('id')} AS split FROM cg),
tr AS (SELECT gram, id AS tid FROM sp WHERE split = 'train'),
ev AS (SELECT * FROM sp WHERE split <> 'train')
SELECT ev.id AS id, ev.split AS split,
       CAST(count(DISTINCT ev.gram) AS BIGINT) AS n_shared_grams,
       CAST(count(DISTINCT tr.tid) AS BIGINT) AS n_train_docs
FROM ev JOIN tr USING (gram)
GROUP BY ev.id, ev.split
"""


def q114_budget_sampling(spark, sf_dir):
    """Token-budget mixture materialization
    (textstats.budgeted_source_sample): q97's α-sampling weights turned
    into an actual per-source document selection for a 10k-token budget
    — integer per-source budgets (w_nano·B div Σw_nano, exact on both
    engines), documents taken in deterministic md5(id) order until the
    budget is crossed (first crossing doc included). The selection is
    DATA — stable across runs, engines, and row order. One corpus
    groupBy (localCheckpoint-pinned), broadcast budget table, one
    source-partitioned window."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang",
        textstats.token_count(F.col("text")).alias("n_tokens"),
    )
    out = textstats.budgeted_source_sample(
        docs, group_col="lang", token_col="n_tokens", id_col="doc_id",
        budget_tokens=10000, alpha=0.3,
    )
    return out.select(
        F.col("id").alias("doc_id"), F.col("src").alias("lang"),
        "n_tokens", "budget_tokens", "sel_rank", "cum_tokens",
    )


_Q114_SQL = """
WITH docs AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              w -> w <> '')) AS BIGINT) AS n_tokens
  FROM documents),
per AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM docs GROUP BY lang),
tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS t FROM per),
w AS (SELECT lang,
             CAST(round(pow(CAST(src_tokens AS DOUBLE) / t, 0.3)
                        * 1000000000.0) AS BIGINT) AS w_nano
      FROM per CROSS JOIN tot),
ws AS (SELECT CAST(sum(w_nano) AS BIGINT) AS s FROM w),
bud AS (SELECT lang, CAST((w_nano * 10000) // s AS BIGINT) AS budget_tokens
        FROM w CROSS JOIN ws),
r AS (
  SELECT d.doc_id, d.lang, d.n_tokens, b.budget_tokens,
         CAST(row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS BIGINT) AS sel_rank,
         CAST(sum(d.n_tokens) OVER (
           PARTITION BY d.lang
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM docs d JOIN bud b USING (lang))
SELECT doc_id, lang, n_tokens, budget_tokens, sel_rank, cum_tokens
FROM r WHERE cum_tokens - n_tokens < budget_tokens
"""


def q115_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer fertility audit: REAL-BPE tokens per
    whitespace word and UTF-8 bytes per BPE token, by language — the
    multilingual tokenizer-budget report (XLM-R/BLOOM-style fertility
    tables: a language whose fertility is 2× pays 2× the context budget
    per word, and bytes/token exposes scripts the merge table
    under-serves). Reuses q72's frozen-merges JVM replace chain
    (codegen, zero Python); per-doc counts partial-agg to ≤|langs|
    rows. Ratios divide exact integer sums (round 6 — the cross-engine
    division discipline)."""
    d = _t(spark, sf_dir, "documents")
    from epstein_browser_spark import bpe

    counts = bpe.doc_bpe_token_counts(d, _bpe_merges(), "text", "doc_id")
    per_doc = (
        d.select(
            "doc_id", "lang",
            textstats.token_count(F.col("text")).cast("long").alias("n_ws"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        )
        .join(counts, F.col("doc_id") == counts["id"])
        .drop("id")
    )
    agg = per_doc.groupBy("lang").agg(
        F.sum("n_ws").alias("n_ws_tokens"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.sum("n_bytes").alias("n_bytes"),
    )
    return agg.select(
        "lang", "n_ws_tokens", "n_bpe_tokens", "n_bytes",
        F.round(F.col("n_bpe_tokens") / F.col("n_ws_tokens"), 6)
        .alias("fertility"),
        F.round(F.col("n_bytes") / F.col("n_bpe_tokens"), 6)
        .alias("bytes_per_token"),
    )


def _q115_sql() -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents),
c AS (SELECT doc_id, sum({_bpe_count_sql('w')}) AS n FROM w GROUP BY doc_id),
per AS (
  -- LEFT join (the q72 pattern): Spark's explode_outer keeps wordless
  -- docs with n_bpe 0, and their BYTES must still count toward the lang
  SELECT d.lang,
         CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_ws,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe,
         CAST(strlen(d.text) AS BIGINT) AS n_bytes
  FROM documents d LEFT JOIN c USING (doc_id))
SELECT lang,
       CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
       round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws), 6) AS fertility,
       round(CAST(sum(n_bytes) AS DOUBLE) / sum(n_bpe), 6)
         AS bytes_per_token
FROM per GROUP BY lang
"""


def q116_split_leak_pairs(spark, sf_dir):
    """Split-policy verification row for q112: over the q43 near-dup
    pair set, how many pairs straddle splits under the NAIVE per-doc
    hash split vs the cluster-atomic one — and how many straddle the
    train boundary specifically (the harmful direction: a held-out doc
    whose near-duplicate was trained on). Cluster-atomic is zero BY
    CONSTRUCTION; the naive row is the measured leak this corpus would
    ship with. Pairs localCheckpoint-pinned so the capped candidate set
    is computed once for both the component closure and the pair
    audit; the two-policy unpivot is a 1-row stack — nothing
    corpus-sized after the aggregate."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    pairs = pairs.localCheckpoint(eager=True)
    assign = dedup.leakage_safe_split(d, pairs)
    a = assign.select(F.col("id").alias("id_a"), F.col("split").alias("sa"),
                      F.col("naive_split").alias("na"))
    b = assign.select(F.col("id").alias("id_b"), F.col("split").alias("sb"),
                      F.col("naive_split").alias("nb"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    agg = j.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("na") != F.col("nb")).cast("long"))
        .alias("_naive_cross"),
        F.sum((F.col("sa") != F.col("sb")).cast("long"))
        .alias("_atomic_cross"),
        F.sum(((F.col("na") == "train") != (F.col("nb") == "train"))
              .cast("long")).alias("_naive_te"),
        F.sum(((F.col("sa") == "train") != (F.col("sb") == "train"))
              .cast("long")).alias("_atomic_te"),
    )
    return agg.select(
        F.expr(
            "stack(2, "
            "'naive', n_pairs, _naive_cross, _naive_te, "
            "'cluster_atomic', n_pairs, _atomic_cross, _atomic_te) "
            "AS (policy, n_pairs, n_cross_split, n_train_eval)"
        )
    )


_Q116_SQL = f"""
WITH RECURSIVE {_Q43_COMP_CTE},
t AS (
  SELECT doc.doc_id AS id,
         coalesce(comp.cluster_id, doc.doc_id) AS cluster_id
  FROM documents doc LEFT JOIN comp ON comp.id = doc.doc_id
  WHERE doc.doc_id < 200),
s AS (
  SELECT id,
         {_split_case_sql('cluster_id')} AS split,
         {_split_case_sql('id')} AS naive_split
  FROM t),
jp AS (
  SELECT sa.split AS sa, sa.naive_split AS na,
         sb.split AS sb, sb.naive_split AS nb
  FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
           AS naive_cross,
         CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
           AS atomic_cross,
         CAST(sum(CASE WHEN (na = 'train') <> (nb = 'train')
                  THEN 1 ELSE 0 END) AS BIGINT) AS naive_te,
         CAST(sum(CASE WHEN (sa = 'train') <> (sb = 'train')
                  THEN 1 ELSE 0 END) AS BIGINT) AS atomic_te
  FROM jp)
SELECT 'naive' AS policy, n_pairs, naive_cross AS n_cross_split,
       naive_te AS n_train_eval FROM agg
UNION ALL
SELECT 'cluster_atomic', n_pairs, atomic_cross, atomic_te FROM agg
"""


def q117_embedding_health(spark, sf_dir):
    """Pre-ANN embedding validation census
    (similarity.embedding_health): per label, how many vectors are
    NULL / wrong-dimension / all-zero (each silently corrupts or
    crashes every downstream cosine/ANN operator), plus exact-integer
    norm statistics over the valid rest — the gate a pipeline runs
    before the q22/q23/q37/q48 family. Defects PLANTED
    deterministically (the q92/q104 pattern, reproduced verbatim in
    the oracle): vec_id%97==13 → NULL, %89==7 → all-zero, %83==11 →
    truncated to 32 dims — all three defect classes populated at every
    sf. Norms follow the q103 micro-unit quantization: min/max/sum are
    exact integers on both engines."""
    e = _t(spark, sf_dir, "embeddings")
    zero = F.transform("embedding", lambda x: F.lit(0.0).cast("float"))
    planted = e.select(
        "vec_id", "label",
        F.when(F.pmod("vec_id", F.lit(97)) == 13,
               F.lit(None).cast("array<float>"))
        .when(F.pmod("vec_id", F.lit(89)) == 7, zero)
        .when(F.pmod("vec_id", F.lit(83)) == 11,
              F.slice("embedding", 1, 32))
        .otherwise(F.col("embedding")).alias("embedding"),
    )
    return similarity.embedding_health(planted, "embedding", "label", 64)


_Q117_SQL = """
WITH planted AS (
  SELECT label,
         CASE WHEN vec_id % 97 = 13 THEN NULL
              WHEN vec_id % 89 = 7
                THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
              WHEN vec_id % 83 = 11 THEN embedding[1:32]
              ELSE embedding END AS v
  FROM embeddings),
cls AS (
  SELECT label,
         v IS NULL AS is_null,
         v IS NOT NULL AND len(v) <> 64 AS is_wrong,
         CASE WHEN v IS NOT NULL AND len(v) = 64
              -- CAST to DOUBLE before scaling: DuckDB otherwise
              -- multiplies in FLOAT precision (63795.4995 becomes the
              -- float 63795.5 and rounds UP) while Spark promotes the
              -- float to double exactly
              THEN list_sum(list_transform(
                     v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0)
                                  AS BIGINT)
                             * CAST(round(CAST(x AS DOUBLE) * 1000000.0)
                                    AS BIGINT)))
              END AS sq
  FROM planted),
nm AS (
  SELECT label, is_null, is_wrong, sq = 0 AS is_zero,
         CASE WHEN sq > 0
              THEN CAST(round(sqrt(CAST(sq AS DOUBLE))) AS BIGINT)
              END AS norm_micro
  FROM cls)
SELECT label AS grp,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN is_wrong THEN 1 ELSE 0 END) AS BIGINT)
         AS n_wrong_dim,
       CAST(sum(CASE WHEN coalesce(is_zero, false) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_zero,
       CAST(count(norm_micro) AS BIGINT) AS n_valid,
       min(norm_micro) AS min_norm_micro,
       max(norm_micro) AS max_norm_micro,
       round(CAST(sum(norm_micro) AS DOUBLE) / count(norm_micro)
             / 1000000.0, 6) AS mean_norm
FROM nm GROUP BY label
"""


def q118_code_detect(spark, sf_dir):
    """Code-vs-prose routing signals (textstats.code_signals): symbol
    density, indented-line fraction, and code-keyword hits, with the
    integer-cross-multiplied gate — the curation step that routes
    source code away from the prose pipeline (The-Stack-style
    separation: code must not be langid'd or sentence-packed like
    prose). The corpus is pure prose (zero structural code chars at
    every sf), so code is PLANTED deterministically: doc_id%7==3 docs
    become a three-line function body derived from doc_id, reproduced
    verbatim in the oracle — both classes populated, and the organic
    rows exercise the all-zero signal path."""
    d = _spread(_t(spark, sf_dir, "documents"))
    i = F.col("doc_id").cast("string")
    code = F.concat(
        F.lit("def f_"), i, F.lit("(x):\n    y = x + "), i,
        F.lit(";\n    return y;\n"),
    )
    planted = d.select(
        "doc_id",
        F.when(F.pmod("doc_id", F.lit(7)) == 3, code)
        .otherwise(F.col("text")).alias("text"),
    )
    out = textstats.code_signals(planted)
    return out.withColumnRenamed("id", "doc_id")


_Q118_SQL = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3
              THEN 'def f_' || CAST(doc_id AS VARCHAR) || '(x):' || chr(10)
                   || '    y = x + ' || CAST(doc_id AS VARCHAR) || ';'
                   || chr(10) || '    return y;' || chr(10)
              ELSE text END AS text
  FROM documents),
sig AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[{}\\[\\]();=<>]', '', 'g'))
              AS BIGINT) AS sym_count,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                              l -> regexp_matches(l, '^(    |\\t)')))
              AS BIGINT) AS indent_lines,
         CAST(len(list_intersect(
                list_distinct(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9_]+'),
                  t -> t <> '')),
                ['def', 'return', 'import', 'function', 'class', 'var',
                 'const', 'void', 'include'])) AS BIGINT) AS kw_hits
  FROM planted)
SELECT doc_id, n_chars, sym_count, n_lines, indent_lines, kw_hits,
       CASE WHEN n_chars > 0
            THEN round(CAST(sym_count AS DOUBLE) / n_chars, 6)
            ELSE 0.0 END AS sym_ratio,
       (sym_count * 100 >= n_chars * 3 AND kw_hits >= 1)
         OR indent_lines * 10 >= n_lines * 3 AS is_code
FROM sig
"""


BLOCKWORDS = ("dup", "slow")


def q119_blocklist_gate(spark, sf_dir):
    """C4-style word-blocklist safety gate (redaction.blocklist_gate):
    per-doc blocklist hit counts plus BOTH standard policies — C4's
    any-hit drop and the RefinedWeb/Dolma fraction threshold (exact
    cross-multiplied integers at the boundary). The blocklist here is a
    stand-in pair chosen from the synthetic vocabulary so all three
    outcomes are populated at sf0.01 (100 clean / 89 any-hit-only /
    311 both): the operator is word-boundary token matching, identical
    for a real badwords list. Generalizes the reference's scrub-before-
    index gate (/root/reference/index_images.py:194-232) to the safety
    filter a web corpus runs before training."""
    out = redaction.blocklist_gate(
        _t(spark, sf_dir, "documents"), list(BLOCKWORDS),
        max_hits_permille=25,
    )
    return out.withColumnRenamed("id", "doc_id")


_Q119_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS words
  FROM documents)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_filter(words, t -> t IN ('dup', 'slow')))
            AS BIGINT) AS block_hits,
       CAST(len(list_intersect(words, ['dup', 'slow'])) AS BIGINT)
            AS n_blocked_kinds,
       len(list_filter(words, t -> t IN ('dup', 'slow'))) > 0 AS drop_any,
       len(words) > 0
         AND len(list_filter(words, t -> t IN ('dup', 'slow'))) * 1000
             >= 25 * len(words) AS drop_frac
FROM w
"""


def _url_canon_augmented(d):
    """Documents augmented with raw-variant URLs of the same logical
    pages: mixed-case host + default port + trailing slash + utm param
    (variant A), clean form + trailing tracking param (variant B), http
    + default port + fragment (C, a DIFFERENT canonical — scheme is
    significant), and a trailing-slash-only page (D). A and B
    canonicalize together; byte-level URL equality sees four unrelated
    strings."""
    k = F.pmod("doc_id", F.lit(5)).cast("string")
    m = F.pmod("doc_id", F.lit(7)).cast("string")
    v = F.pmod("doc_id", F.lit(4))
    url = (
        F.when(v == 0, F.concat(
            F.lit(" https://Example.COM:443/a/b/?utm_source=x&id="), k))
        .when(v == 1, F.concat(
            F.lit(" https://example.com/a/b?id="), k,
            F.lit("&utm_campaign=y")))
        .when(v == 2, F.concat(
            F.lit(" http://example.com:80/a/b?id="), k, F.lit("#frag")))
        .otherwise(F.concat(F.lit(" https://tracker.net/p/"), m, F.lit("/")))
    )
    return d.select("doc_id", F.concat(F.col("text"), url).alias("text"))


_URL_CANON_AUG_SQL = """
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 0 THEN ' https://Example.COM:443/a/b/?utm_source=x&id='
                       || CAST(doc_id % 5 AS VARCHAR)
           WHEN 1 THEN ' https://example.com/a/b?id='
                       || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=y'
           WHEN 2 THEN ' http://example.com:80/a/b?id='
                       || CAST(doc_id % 5 AS VARCHAR) || '#frag'
           ELSE ' https://tracker.net/p/' || CAST(doc_id % 7 AS VARCHAR)
                || '/' END AS text
  FROM documents
"""


def q120_url_canonical(spark, sf_dir):
    """Canonical-URL duplicate census (redaction.canonical_url_census):
    lowercase scheme+host, strip default port / fragment / tracking
    params / trailing slash, then group every URL occurrence by its
    canonical form — the fetch-level dedup CommonCrawl-style pipelines
    run BEFORE any text hashing (the same page under utm-decorated and
    clean URLs is invisible to byte equality). Raw variants are planted
    deterministically (restated verbatim in the oracle); groups with
    n_raw_variants > 1 are the duplicates the operator exists to find."""
    aug = _url_canon_augmented(_t(spark, sf_dir, "documents"))
    return redaction.canonical_url_census(aug)


def _q120_sql() -> str:
    from epstein_browser_spark.redaction import (
        DOMAIN_RE, TRACKING_PARAM_RE, URL_RE,
    )

    url_re = URL_RE.replace("'", "''")
    track_re = TRACKING_PARAM_RE.replace("'", "''")
    _ = DOMAIN_RE  # (domain extraction not needed here; URL_RE only)
    return f"""
WITH aug AS ({_URL_CANON_AUG_SQL}),
u AS (SELECT doc_id, unnest(regexp_extract_all(text, '{url_re}')) AS url
      FROM aug),
p AS (SELECT doc_id, url,
             lower(regexp_extract(url, '^(https?)://', 1)) AS scheme,
             lower(regexp_extract(url, '^https?://([^/?#]*)', 1)) AS hostport,
             regexp_replace(url, '^https?://[^/?#]*', '') AS rest
      FROM u),
q AS (SELECT doc_id, url, scheme,
             CASE WHEN scheme = 'https'
                  THEN regexp_replace(hostport, ':443$', '')
                  WHEN scheme = 'http'
                  THEN regexp_replace(hostport, ':80$', '')
                  ELSE hostport END AS host,
             regexp_replace(regexp_extract(rest, '^([^?#]*)', 1),
                            '/+$', '') AS path0,
             list_filter(
               string_split(regexp_extract(rest, '\\?([^#]*)', 1), '&'),
               x -> x <> '' AND NOT regexp_matches(x, '{track_re}'))
               AS params
      FROM p),
c AS (SELECT doc_id, url,
             scheme || '://' || host
             || CASE WHEN path0 = '' THEN '/' ELSE path0 END
             || CASE WHEN len(params) > 0
                     THEN '?' || array_to_string(params, '&')
                     ELSE '' END AS canonical
      FROM q)
SELECT canonical, count(*) AS n_urls,
       count(DISTINCT doc_id) AS n_docs,
       count(DISTINCT url) AS n_raw_variants
FROM c GROUP BY 1 ORDER BY n_urls DESC, canonical ASC
"""


def q121_domain_reputation(spark, sf_dir):
    """Domain-level reputation from document-level safety outcomes —
    the RefinedWeb/Dolma domain-filter step: per-doc q119 blocklist
    flags roll up to each domain the doc links to (q56's URL plants),
    and a domain whose docs are ≥80% flagged is blocked wholesale (the
    cheap forward index: future fetches from a blocked domain are
    dropped before any text processing). The rate threshold compares
    exact cross-multiplied integers (5·n_flagged ≥ 4·n_docs) and
    flag_permille is exact integer division — no float at the gate.
    At sf0.01 the split is real: 7 domains blocked, 4 kept. One
    (doc, domain) dedup + one |domains|-bounded partial-agg groupBy;
    the per-doc gate is q119's map-only pass."""
    d = _t(spark, sf_dir, "documents")
    doms = (
        redaction.url_domains(_url_augmented(d))
        .select("id", "domain").distinct()
    )
    flags = redaction.blocklist_gate(
        d, list(BLOCKWORDS), max_hits_permille=25
    ).select("id", "drop_any")
    per = doms.join(flags, "id")
    return (
        per.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("drop_any")).alias("n_flagged"),
        )
        .select(
            "domain", "n_docs", "n_flagged",
            F.expr("(1000 * n_flagged) div n_docs").alias("flag_permille"),
            (F.col("n_flagged") * 5 >= F.col("n_docs") * 4)
            .alias("domain_blocked"),
        )
        .orderBy("domain")
    )


def _q121_sql() -> str:
    from epstein_browser_spark.redaction import DOMAIN_RE, URL_RE

    url_re = URL_RE.replace("'", "''")
    return f"""
WITH aug AS ({_URL_AUG_SQL}),
u AS (SELECT DISTINCT doc_id,
             lower(regexp_extract(url, '{DOMAIN_RE}', 1)) AS domain
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(text, '{url_re}')) AS url
            FROM aug)),
g AS (SELECT doc_id,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t IN ('dup', 'slow'))) > 0 AS flagged
      FROM documents)
SELECT domain, count(*) AS n_docs,
       count(*) FILTER (flagged) AS n_flagged,
       (1000 * count(*) FILTER (flagged)) // count(*) AS flag_permille,
       count(*) FILTER (flagged) * 5 >= count(*) * 4 AS domain_blocked
FROM u JOIN g USING (doc_id)
GROUP BY domain ORDER BY domain
"""


def q122_conv_safety_drop(spark, sf_dir):
    """Conversation-atomic safety gate over agent transcripts: a dialog
    with ONE blocklisted turn is dropped WHOLE (the q75 atomicity rule
    applied to safety — shipping the clean remainder of a flagged
    conversation teaches the model the conversation minus the evidence).
    Per conversation: turn count, flagged-turn count, the first flagged
    turn index (where a human reviewer starts reading), and the drop
    verdict. The rarer single-word blocklist keeps both branches real
    at sf0.01 (20 of 50 conversations flagged). One conv-keyed
    partial-agg groupBy over q119's map-only per-turn gate — at 10^12
    turns this is extraction-shuffle-shaped, nothing heavier."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    hit = (
        F.size(
            F.filter(
                textstats.tokens(F.lower(F.col("text"))),
                lambda t: t == "dup",
            )
        )
        > 0
    )
    return (
        tr.select("conv_id", "turn_idx", hit.alias("hit"))
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.count_if(F.col("hit")).alias("n_flagged_turns"),
            F.min(F.when(F.col("hit"), F.col("turn_idx")))
            .alias("first_flagged_turn"),
            (F.count_if(F.col("hit")) > 0).alias("conv_drop"),
        )
        .orderBy("conv_id")
    )


_Q122_SQL = f"""
WITH {_AGENT_TR_CTE},
f AS (SELECT conv_id, turn_idx,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> t = 'dup')) > 0 AS hit
      FROM tr)
SELECT conv_id,
       count(*) AS n_turns,
       count(*) FILTER (hit) AS n_flagged_turns,
       min(CASE WHEN hit THEN turn_idx END) AS first_flagged_turn,
       count(*) FILTER (hit) > 0 AS conv_drop
FROM f GROUP BY conv_id ORDER BY conv_id
"""


def q123_domain_pagerank(spark, sf_dir):
    """Domain authority via integer-exact PageRank (graph.pagerank) —
    the link-graph ranking web curation runs before domain weighting
    (Common Crawl publishes harmonic-centrality domain ranks for exactly
    this): 5 fixed rounds, damping 850‰, all arithmetic in rank
    micro-units with integer division, so the WHOLE iterative loop is
    value-oracled by DuckDB restating the recurrence unrolled (the q74
    Lloyd-loop discipline applied to graph propagation). Edges: each
    doc's fetched-from domain (the crawl-frontier referrer, planted as
    w{(3·doc_id)%20}.example.org — a permutation of the even w-domains,
    so REAL cycles exist and the rounds matter) links to every domain
    the doc's text cites (q56's URL plants), self-loops dropped.
    cdn.example.net is a pure sink — the dangling-mass drop is exercised,
    and odd w-referrers are pure sources pinning the base-rank floor.

    Scale shape: pagerank() partitions the edge table on src ONCE and
    localCheckpoints per round; each round is one |nodes|-sized rank
    shuffle + a partial-agg sum — at a 10^8-domain graph the edge table
    never re-shuffles."""
    from epstein_browser_spark import graph

    return (
        graph.pagerank(
            _link_graph_edges(spark, sf_dir), iters=5, damping_permille=850
        )
        .orderBy(F.desc("rank_micro"), F.asc("node"))
    )


def _link_graph_edges(spark, sf_dir):
    """The planted crawl-frontier link graph shared by q123 (PageRank)
    and q138 (triangles): each doc's referrer domain (w{(3·doc_id)%20} —
    a permutation of the even w-domains, so real cycles exist) links to
    every domain the doc's text cites (q56's URL plants); self-loops
    dropped, edges deduped. ONE definition — the q138 contract is
    'exactly q123's graph', so any plant change stays in lockstep."""
    d = _t(spark, sf_dir, "documents")
    linked = (
        redaction.url_domains(_url_augmented(d))
        .select("id", "domain").distinct()
    )
    referrer = F.concat(
        F.lit("w"), ((F.col("id") * 3) % 20).cast("string"),
        F.lit(".example.org"),
    )
    return (
        linked.select(referrer.alias("src"), F.col("domain").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _q123_sql() -> str:
    from epstein_browser_spark.redaction import DOMAIN_RE, URL_RE

    url_re = URL_RE.replace("'", "''")
    ref = "'w' || CAST((doc_id * 3) % 20 AS VARCHAR) || '.example.org'"
    rounds = []
    prev = "r0"
    for k in range(1, 6):
        rounds.append(f"""
r{k} AS (SELECT n.node,
               CAST(150000 + (850 * COALESCE(s.m, 0)) // 1000 AS BIGINT)
                 AS rank_micro
        FROM nodes n LEFT JOIN
             (SELECT e.dst AS node,
                     CAST(sum(r.rank_micro // e.deg) AS BIGINT) AS m
              FROM e JOIN {prev} r ON r.node = e.src
              GROUP BY e.dst) s USING (node))""")
        prev = f"r{k}"
    rounds_sql = ",".join(rounds)
    return f"""
WITH aug AS ({_URL_AUG_SQL}),
u AS (SELECT DISTINCT doc_id,
             lower(regexp_extract(url, '{DOMAIN_RE}', 1)) AS domain
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(text, '{url_re}')) AS url
            FROM aug)),
e0 AS (SELECT DISTINCT {ref} AS src, domain AS dst
       FROM u WHERE domain <> {ref}),
nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
{rounds_sql}
SELECT node, rank_micro FROM r5 ORDER BY rank_micro DESC, node
"""


def q124_retention_cohorts(spark, sf_dir):
    """Cohort retention over the event log — the classic product-
    analytics rollup (and, for a training pipeline, the user-activity
    census behind recency-weighted interaction sampling): users cohort
    by FIRST active day; for day offsets 0..7, how many of each cohort
    were active again. retention_permille is exact integer division and
    offset 0 is definitionally 1000‰ (pinned by test). Scale shape: ONE
    user-keyed shuffle produces both the distinct active days and the
    per-user min (same key — no second exchange for the join), then
    cohort-keyed partial aggs; at 10^12 events nothing touches the raw
    log twice."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    j = (
        days.join(first, "user_id")
        .select(
            "user_id", "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("n_cohort")
    )
    ret = j.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        ret.join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset", "n_active", "n_cohort",
            F.expr("(1000 * n_active) div n_cohort")
            .alias("retention_permille"),
        )
        .orderBy("cohort_day", "day_offset")
    )


_Q124_SQL = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id),
j AS (SELECT d.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, d.day) AS day_offset
      FROM days d JOIN f USING (user_id)
      WHERE date_diff('day', f.cohort_day, d.day) <= 7),
sizes AS (SELECT cohort_day, count(*) AS n_cohort FROM f GROUP BY cohort_day),
r AS (SELECT cohort_day, day_offset,
             count(DISTINCT user_id) AS n_active
      FROM j GROUP BY cohort_day, day_offset)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
       r.day_offset, r.n_active, sizes.n_cohort,
       CAST((1000 * r.n_active) // sizes.n_cohort AS BIGINT)
         AS retention_permille
FROM r JOIN sizes USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


def q125_session_funnel(spark, sf_dir):
    """Ordered funnel within 24-hour visit sessions: view → click →
    purchase, each stage's timestamp the FIRST event of that type AT OR
    AFTER the previous stage (a purchase before any view never counts —
    pinned by test). The gap is a day, not q44's 30 minutes: this
    corpus averages ~10h between a user's events, so the micro-session
    funnel would be vacuous past stage one (the q09 non-vacuity rule) —
    at 24h every stage is populated at every sf (sf0.01:
    1214/816/498/288). Sessionization is the q44 gaps-and-islands in
    exact epoch-micros (boundary-truncation-free on both engines); the three
    stage timestamps are chained full-frame conditional MINs over the
    session partition — one exchange on (user, session) serves all
    three windows AND the per-session collapse. Output is the one-row
    funnel report with exact integer-permille stage conversions
    (zero denominators defined as 0‰ on both engines)."""
    e = _t(spark, sf_dir, "events")
    # the cast maps TIMESTAMP_NTZ wall times through the session zone
    # (UTC everywhere in this repo) — the joins.py epoch-micros idiom
    mu = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = mu - F.lag(mu).over(wu)
    s = e.select(
        "user_id", "event_id", "event_type", "ts",
        F.sum(
            F.when(gap.isNull() | (gap > 86_400_000_000), 1).otherwise(0)
        ).over(wu).cast("long").alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid")
    s = s.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws),
    )
    s = s.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view")),
                F.col("ts"),
            )
        ).over(ws),
    )
    s = s.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click")),
                F.col("ts"),
            )
        ).over(ws),
    )
    per = s.groupBy("user_id", "sid").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.count("t_view").alias("n_reached_view"),
        F.count("t_click").alias("n_reached_click"),
        F.count("t_purchase").alias("n_reached_purchase"),
    ).select(
        "n_sessions", "n_reached_view", "n_reached_click",
        "n_reached_purchase",
        F.expr(
            "CASE WHEN n_reached_view = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (1000 * n_reached_click) div n_reached_view END"
        ).alias("click_permille"),
        F.expr(
            "CASE WHEN n_reached_click = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (1000 * n_reached_purchase) div n_reached_click END"
        ).alias("purchase_permille"),
    )


_Q125_SQL = """
WITH m AS (SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS mu
           FROM events),
g AS (SELECT *,
             CASE WHEN lag(mu) OVER w IS NULL
                    OR mu - lag(mu) OVER w > 86400000000
                  THEN 1 ELSE 0 END AS new_s
      FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id, sid) AS t_view FROM s),
c AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view
                         THEN ts END)
                  OVER (PARTITION BY user_id, sid) AS t_click FROM v),
p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click
                         THEN ts END)
                  OVER (PARTITION BY user_id, sid) AS t_purchase FROM c),
per AS (SELECT user_id, sid, max(t_view) AS t_view,
               max(t_click) AS t_click, max(t_purchase) AS t_purchase
        FROM p GROUP BY user_id, sid)
SELECT count(*) AS n_sessions,
       count(t_view) AS n_reached_view,
       count(t_click) AS n_reached_click,
       count(t_purchase) AS n_reached_purchase,
       CAST(CASE WHEN count(t_view) = 0 THEN 0
                 ELSE (1000 * count(t_click)) // count(t_view) END
            AS BIGINT) AS click_permille,
       CAST(CASE WHEN count(t_click) = 0 THEN 0
                 ELSE (1000 * count(t_purchase)) // count(t_click) END
            AS BIGINT) AS purchase_permille
FROM per
"""


def q126_rollup_totals(spark, sf_dir):
    """ROLLUP grouping sets: order volume by (status, year) with
    per-status subtotals and a grand total in ONE pass — the
    multi-granularity report shape (reference analog: the stats
    endpoint's stacked volume rollups, app.py) that would otherwise be
    three scans unioned. grouping_id() disambiguates real NULL keys
    from subtotal rows (Spark and DuckDB share the first-column-is-MSB
    bit convention — pinned by the value oracle). Money sums in exact
    cents (the repo-wide micro-unit discipline: double SUM order
    differs across engines; BIGINT cents cannot). Scale shape: rollup
    is a single partial-aggregable expand — each input row feeds 3
    grouping sets map-side, one shuffle total."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .alias("cents"),
        )
        .rollup("o_orderstatus", "yr")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("gid", "o_orderstatus", "yr")
    )


_Q126_SQL = """
SELECT o_orderstatus,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(GROUPING(o_orderstatus, yr) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, yr)
ORDER BY gid, o_orderstatus, yr
"""


def q127_event_pivot(spark, sf_dir):
    """PIVOT: per-user event-type counts as columns — the wide activity
    matrix feature stores and cohort tools export. The pivot value list
    is EXPLICIT (the five known types), so Spark skips the
    values-discovery scan and the plan is one partial-aggregable
    shuffle; absent cells are 0, not NULL (a user without purchases has
    zero purchases, not unknown). Oracle: FILTER-ed counts — the
    relational restatement of the same expand."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    p = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    ).orderBy("user_id")


_Q127_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


def q128_big_spenders_semi(spark, sf_dir):
    """LEFT-SEMI join (EXISTS): customers with at least one order above
    466,000 — the threshold splits the customer base roughly in half at
    every sf, so BOTH the kept and dropped branches are real (the q09
    non-vacuity rule). Completes the join family: J1/J2 are the
    anti-join form; this is its EXISTS dual, planned as LeftSemi (pinned
    by plan test) — the probe side streams, the filter is pushed below
    the join, and no customer row ever duplicates however many
    qualifying orders it has (the bug a naive inner-join-distinct
    restatement invites)."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 466000)
    return (
        c.join(big, c["c_custkey"] == big["o_custkey"], "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_Q128_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 466000)
ORDER BY c_custkey
"""


def q129_gap_fill(spark, sf_dir):
    """Time-series gap filling with forward fill (last observation
    carried forward): per user, hourly value sums over the user's own
    [first, last] active-hour span, with silent hours materialized from
    a generated sequence and filled from the previous observed hour —
    the resample/ffill every monitoring and finance pipeline runs, and
    the dense-grid prep for windowed feature extraction. Values in
    exact micro-units (sum order is engine-independent on BIGINT).
    Restricted to user_id % 29 = 0 (6 users at sf0.01) so the dense
    grid stays compare-sized; the operator itself is per-user and
    embarrassingly parallel. Scale shape: one user-hour partial agg,
    one |users|-sized span agg, the grid explode is output-sized, and
    the fill is a single user-partitioned running window — no
    corpus-wide sort. Leading hours are never filled (the span starts
    at the first OBSERVED hour, so value_micro is never NULL — pinned
    by test)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 29 == 0)
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
            .alias("v")
        )
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    j = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("value_micro"),
        F.col("v").isNull().alias("is_filled"),
    ).orderBy("user_id", "hour")


_Q129_SQL = """
WITH f AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                  CAST(round(value * 1000000) AS BIGINT) AS mv
           FROM events WHERE user_id % 29 = 0),
h AS (SELECT user_id, hour, CAST(sum(mv) AS BIGINT) AS v
      FROM f GROUP BY user_id, hour),
s AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
      FROM h GROUP BY user_id),
g AS (SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM s),
j AS (SELECT g.user_id, g.hour, h.v
      FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour)
SELECT user_id, strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
       last_value(v IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY hour
               ROWS UNBOUNDED PRECEDING) AS value_micro,
       v IS NULL AS is_filled
FROM j ORDER BY user_id, hour
"""


def q130_hopping_window(spark, sf_dir):
    """Hopping (sliding) time windows: 2-hour windows advancing every
    hour, so each event lands in exactly TWO overlapping windows — the
    smoothing aggregation dashboards and rate-limit monitors run (q31
    is the tumbling special case; q44 the gap-session one; this
    completes the window-assignment family, same kernel as the
    streaming variant). Oracle: each event expands to its two window
    starts via unnest — the relational restatement of Spark's window
    expand. Scale shape: Expand doubles rows map-side, then one
    partial-aggregable shuffle on the window start; never a self-join
    of the event log against shifted copies of itself."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
            "n_events", "n_users",
        )
        .orderBy("w_start")
    )


_Q130_SQL = """
WITH x AS (SELECT user_id,
                  unnest([date_trunc('hour', ts),
                          date_trunc('hour', ts) - INTERVAL 1 HOUR])
                    AS w_start
           FROM events)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       strftime(w_start + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS w_end,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM x GROUP BY w_start ORDER BY w_start
"""


def q131_priority_bag_diff(spark, sf_dir):
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): the
    multiset surplus and overlap of order priorities between 1995 and
    1996 — SURVEY §2.7's union family completed with the duplicate-
    preserving duals (DISTINCT set ops would collapse the five
    priority values to at most five rows and measure nothing).
    n_surplus = how many MORE 1995 orders carry each priority than
    1996 (floored at 0), n_common = the overlapping count — both pinned
    against direct per-year counts by test. Scale shape: Spark plans
    both ops as count-aggregate + replicate (partial-aggregable), never
    a row-by-row matching join; the final groupBy collapses them to
    |priorities| rows."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_orderpriority")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_orderpriority")
    diff = (
        y95.exceptAll(y96)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_surplus"))
    )
    inter = (
        y95.intersectAll(y96)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_common"))
    )
    # anchor on every priority present in EITHER year: a 1996-only
    # priority has zero surplus AND zero common, and a full join of the
    # two empty aggregates would silently drop its row from the report
    prios = y95.unionByName(y96).distinct()
    return (
        prios.join(diff, "o_orderpriority", "left")
        .join(inter, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            F.coalesce("n_surplus", F.lit(0)).cast("long")
            .alias("n_surplus"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        )
        .orderBy("o_orderpriority")
    )


_Q131_SQL = """
WITH y95 AS (SELECT o_orderpriority FROM orders
             WHERE year(o_orderdate) = 1995),
y96 AS (SELECT o_orderpriority FROM orders
        WHERE year(o_orderdate) = 1996),
d AS (SELECT o_orderpriority, count(*) AS n_surplus
      FROM (SELECT * FROM y95 EXCEPT ALL SELECT * FROM y96)
      GROUP BY o_orderpriority),
i AS (SELECT o_orderpriority, count(*) AS n_common
      FROM (SELECT * FROM y95 INTERSECT ALL SELECT * FROM y96)
      GROUP BY o_orderpriority),
p AS (SELECT DISTINCT o_orderpriority FROM
      (SELECT * FROM y95 UNION ALL SELECT * FROM y96))
SELECT p.o_orderpriority,
       CAST(COALESCE(n_surplus, 0) AS BIGINT) AS n_surplus,
       CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common
FROM p LEFT JOIN d ON p.o_orderpriority = d.o_orderpriority
       LEFT JOIN i ON p.o_orderpriority = i.o_orderpriority
ORDER BY p.o_orderpriority
"""


def q132_json_props(spark, sf_dir):
    """Semi-structured column extraction: events.props is a JSON string
    ({"k": N}); per event type, extract k and aggregate — the
    schema-on-read path every log pipeline runs before promoting hot
    JSON fields to real columns. Malformed payloads are PLANTED
    (event_id %97 → a broken prefix, reproduced in the oracle) and must
    degrade to NULL, never fail the job: Spark's get_json_object is
    lenient by design; DuckDB's json_extract throws, so the oracle
    restates the same tolerance with a json_valid guard. get_json_object
    stays inside whole-stage codegen (no UDF, no from_json schema
    inference pass). n_bad counts every row whose $.k is unextractable
    — malformed JSON, NULL props, or a missing/non-integer k (on this
    corpus exactly the planted poison, which keeps it non-vacuous);
    k sums exact BIGINT."""
    e = _t(spark, sf_dir, "events")
    props = F.when(
        F.pmod("event_id", F.lit(97)) == 0,
        F.concat(F.lit("{bad-"), F.col("props")),
    ).otherwise(F.col("props"))
    k = F.get_json_object(props, "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_parsed"),
            (F.count("*") - F.count("k")).alias("n_bad"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


_Q132_SQL = """
WITH p AS (SELECT event_type,
                  CASE WHEN event_id % 97 = 0
                       THEN '{bad-' || props ELSE props END AS props
           FROM events),
x AS (SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      FROM p)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_parsed,
       count(*) - count(k) AS n_bad,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min,
       max(k) AS k_max
FROM x GROUP BY event_type ORDER BY event_type
"""


def q133_rolling_24h(spark, sf_dir):
    """RANGE-frame rolling window: at every event, the same user's
    trailing-24-hour event count and exact micro-value sum — the
    sliding rate/exposure feature (rate limiting, fraud velocity,
    per-user activity features) that ROWS frames cannot express because
    the lookback is a TIME span, not a row count. The frame bounds are
    exact epoch-micros integers, so tied timestamps resolve identically
    on both engines (RANGE includes all peers). Restricted to
    user_id % 29 = 0 (the q129 slice) to keep the compare bounded; the
    operator is one user-partitioned range window — at 10^12 events
    it is exactly the extraction-shuffle shape plus a per-partition
    sort."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 29 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("mu")
        .rangeBetween(-86_400_000_000, 0)
    )
    return (
        e.select(
            "user_id", "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("mu"),
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("mv"),
        )
        .select(
            "user_id", "event_id", "ts_s",
            F.count("*").over(w).alias("n_24h"),
            F.sum("mv").over(w).alias("mv_sum_24h"),
        )
        .orderBy("user_id", "event_id")
    )


_Q133_SQL = """
WITH f AS (SELECT user_id, event_id,
                  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                  epoch_us(ts) AS mu,
                  CAST(round(value * 1000000) AS BIGINT) AS mv
           FROM events WHERE user_id % 29 = 0)
SELECT user_id, event_id, ts_s,
       count(*) OVER w AS n_24h,
       CAST(sum(mv) OVER w AS BIGINT) AS mv_sum_24h
FROM f
WINDOW w AS (PARTITION BY user_id ORDER BY mu
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def q134_role_sequence(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg): each dialog's
    role flow collapsed to one 'system>user>assistant>...' string — the
    shape key conversation curation groups by to find the dominant
    dialog templates (and the classic ordered-collect operator the
    engine must get deterministic: an UNORDERED collect would be
    partition-luck). Spark side: collect everything per conversation as
    (turn_idx, role) structs, array_sort (struct order = field order),
    then a pure-JVM transform+array_join; the groupBy collapses
    map-side, and the per-conv array is dialog-bounded, never
    corpus-bounded. Second level: the shape census (n_convs per
    distinct flow, max 50 rows here) — the template report itself."""
    tr = _derived_agent_transcripts(spark, sf_dir)
    per_conv = (
        tr.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "role"))
                    ),
                    lambda s: s["role"],
                ),
                ">",
            ).alias("role_flow"),
            F.count("*").alias("n_turns"),
        )
    )
    return (
        per_conv.groupBy("role_flow", "n_turns")
        .agg(F.count("*").alias("n_convs"))
        .orderBy(F.desc("n_convs"), "role_flow")
    )


_Q134_SQL = f"""
WITH {_AGENT_TR_CTE},
per AS (SELECT conv_id,
               string_agg(role, '>' ORDER BY turn_idx) AS role_flow,
               count(*) AS n_turns
        FROM tr GROUP BY conv_id)
SELECT role_flow, n_turns, count(*) AS n_convs
FROM per GROUP BY role_flow, n_turns
ORDER BY n_convs DESC, role_flow
"""


def q135_unpivot_activity(spark, sf_dir):
    """UNPIVOT (melt): q127's wide per-user activity matrix back to
    tidy long form — the reshape every exporter/BI handoff needs, and
    the inverse proof that the pivot lost nothing (the long form
    re-derives the per-(user, type) counts INCLUDING explicit zeros,
    which a plain groupBy cannot produce). Spark's unpivot is a
    map-side Expand — no shuffle beyond the pivot's own; the oracle
    restates it as the users × types cross grid left-joined to direct
    counts."""
    wide = q127_event_pivot(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in types],
            "event_type",
            "n_events",
        )
        .withColumn(
            "event_type", F.expr("substring(event_type, 3)")
        )
        .orderBy("user_id", "event_type")
    )


_Q135_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
t AS (SELECT unnest(['click','error','purchase','signup','view'])
        AS event_type),
c AS (SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type)
SELECT u.user_id, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM u CROSS JOIN t
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
ORDER BY u.user_id, t.event_type
"""


def q136_source_datacard(spark, sf_dir):
    """Per-source data card — the one-page report a curation run
    publishes per provenance (the Datasheets/Dolma-style summary a
    mixture owner reads before weighting): docs, whitespace tokens,
    distinct languages, and the three gate drop-rates (C4/Gopher
    quality, q119 word blocklist, exact content dup) with exact
    integer permilles — composing three operator families in ONE pass
    over the corpus. Every gate defect is PLANTED deterministically
    (the q92/q104 pattern, restated verbatim in the oracle): doc_id
    %13==2 becomes a too-short doc (quality drop), %17==5 a
    corpus-constant payload (exact dup), %19==7 a constant sentence
    containing a blocklisted token (safety drop) — so all three
    branches are real at every sf regardless of the raw corpus (which
    has zero quality/dup defects). The constant plants ALSO count as
    dups of each other — flags are independent censuses, not exclusive
    buckets. Scale shape: the gates are map-only column expressions
    over one scan (quality_rule_flags carries source/lang/text through;
    the blocklist hit is redaction.blocklist_hits — the ONE kernel
    q119 uses); the dup flag is a partial-aggregable
    groupBy(md5(text)).count joined back on the hash — an AQE-skew-
    splittable equi-join, NOT a window (a corpus-constant text would
    put all its copies in a single unsplittable window partition);
    the card is a |sources|-bounded partial agg."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id", "source", "lang",
        F.when(F.pmod("doc_id", F.lit(13)) == 2, F.lit("aa aa aa"))
        .when(
            F.pmod("doc_id", F.lit(17)) == 5,
            F.lit("duplicate payload block shared across sources"),
        )
        .when(
            F.pmod("doc_id", F.lit(19)) == 7,
            F.lit("please keep this slow record entry intact"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    flags = redaction.quality_rule_flags(
        planted, extra_cols=("source", "lang", "text")
    )
    unsafe = redaction.blocklist_hits(F.col("text"), BLOCKWORDS) > 0
    counts = planted.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("cnt")
    )
    f = (
        flags.withColumn("h", F.md5("text"))
        .join(counts, "h")
        .select(
            "source", "lang", "n_words", "keep",
            unsafe.alias("unsafe"),
            (F.col("cnt") > 1).alias("is_dup"),
        )
    )
    return (
        f.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.count_if(~F.col("keep")).alias("n_quality_drop"),
            F.count_if(F.col("unsafe")).alias("n_safety_drop"),
            F.count_if(F.col("is_dup")).alias("n_exact_dup"),
        )
        .select(
            "source", "n_docs", "n_tokens", "n_langs",
            "n_quality_drop", "n_safety_drop", "n_exact_dup",
            F.expr("(1000 * n_quality_drop) div n_docs")
            .alias("quality_drop_permille"),
            F.expr("(1000 * n_safety_drop) div n_docs")
            .alias("safety_drop_permille"),
            F.expr("(1000 * n_exact_dup) div n_docs").alias("dup_permille"),
        )
        .orderBy("source")
    )


_Q136_SQL = """
WITH planted AS (
  SELECT doc_id, source, lang,
         CASE WHEN doc_id % 13 = 2 THEN 'aa aa aa'
              WHEN doc_id % 17 = 5
              THEN 'duplicate payload block shared across sources'
              WHEN doc_id % 19 = 7
              THEN 'please keep this slow record entry intact'
              ELSE text END AS text
  FROM documents),
m AS (
  SELECT source, lang, text,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '')) AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS total_wc,
         length(text) - length(regexp_replace(text, '[#…]', '', 'g'))
           AS n_symbols,
         list_filter(list_transform(string_split_regex(text, '\r?\n'),
                                    s -> trim(s)), s -> s <> '') AS lines
  FROM planted),
f AS (
  SELECT source, lang, n_words,
         (n_words BETWEEN 5 AND 100000
          AND round(CASE WHEN n_words > 0
                         THEN CAST(total_wc AS DOUBLE) / n_words
                         ELSE 0 END, 6) BETWEEN 3.0 AND 10.0
          AND round(CASE WHEN len(lines) > 0
                         THEN CAST(len(lines) - len(list_distinct(lines))
                                   AS DOUBLE) / len(lines)
                         ELSE 0 END, 6) <= 0.3
          AND round(CASE WHEN n_words > 0
                         THEN CAST(n_symbols AS DOUBLE) / n_words
                         ELSE 0 END, 6) <= 0.1) AS keep,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t IN ('dup', 'slow'))) > 0 AS unsafe,
         count(*) OVER (PARTITION BY md5(text)) > 1 AS is_dup
  FROM m)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_tokens,
       count(DISTINCT lang) AS n_langs,
       count(*) FILTER (NOT keep) AS n_quality_drop,
       count(*) FILTER (unsafe) AS n_safety_drop,
       count(*) FILTER (is_dup) AS n_exact_dup,
       (1000 * count(*) FILTER (NOT keep)) // count(*)
         AS quality_drop_permille,
       (1000 * count(*) FILTER (unsafe)) // count(*)
         AS safety_drop_permille,
       (1000 * count(*) FILTER (is_dup)) // count(*) AS dup_permille
FROM f GROUP BY source ORDER BY source
"""


def q137_length_quartiles(spark, sf_dir):
    """NTILE + CUME_DIST: per-source document-length quartile
    assignment and cumulative distribution — the distribution
    diagnostics completing the window-function family (W1-W4 cover
    row_number/lag/first/percent_rank; this adds the equal-height
    bucketer every length-stratified sampler uses and the empirical
    CDF). The order key is (n_chars, doc_id) so ties break
    deterministically and NTILE is engine-exact; CUME_DIST's ratio is
    a single IEEE division of exact integers — identical on both
    engines. Rolled up to the quartile census (bounds + counts + the
    CDF at the quartile's top edge) so the output is |source|×4
    bounded, not corpus-sized. ONE source-keyed exchange serves both
    window functions and the census groupBy."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    q = d.select(
        "source", "n_chars",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        q.groupBy("source", "quartile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("len_min"),
            F.max("n_chars").alias("len_max"),
            F.round(F.max("cd"), 6).alias("cume_dist_top"),
        )
        .orderBy("source", "quartile")
    )


_Q137_SQL = """
WITH q AS (
  SELECT source, n_chars,
         ntile(4) OVER w AS quartile,
         cume_dist() OVER w AS cd
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id))
SELECT source, CAST(quartile AS INT) AS quartile,
       count(*) AS n_docs,
       min(n_chars) AS len_min,
       max(n_chars) AS len_max,
       round(max(cd), 6) AS cume_dist_top
FROM q GROUP BY source, quartile ORDER BY source, quartile
"""


def q138_link_triangles(spark, sf_dir):
    """Triangle census + local clustering coefficient on the q123 link
    graph (graph.triangle_stats) — the graph-motif statistic web curation
    uses to separate organically interlinked communities from star-shaped
    link farms (a spam hub has thousands of neighbours that never link
    each other: degree high, clustering ~0). Edges are exactly q123's
    crawl-frontier graph (referrer domain → cited domains, planted
    deterministically), made undirected and simple. The kernel is
    node-iterator++ (degree orientation): each triangle is found ONCE at
    its minimum-(degree,node)-rank apex, so per-node wedge work is bounded
    by out-degree² = O(m) total instead of Σ deg² — the difference between
    feasible and not on a 10^8-domain graph with celebrity hubs.
    clustering_permille is all-integer ((2000·tri) div (deg·(deg-1))), so
    the whole motif count is value-oracled. Scale shape: two equi-join
    shuffles (wedge build + closure) and one partial-agg explode —
    AQE-skew-splittable joins, zero windows, output |nodes|-bounded."""
    from epstein_browser_spark import graph

    return graph.triangle_stats(_link_graph_edges(spark, sf_dir)).orderBy(
        F.desc("n_triangles"), F.asc("node")
    )


def _q138_sql() -> str:
    from epstein_browser_spark.redaction import DOMAIN_RE, URL_RE

    url_re = URL_RE.replace("'", "''")
    ref = "'w' || CAST((doc_id * 3) % 20 AS VARCHAR) || '.example.org'"
    return f"""
WITH aug AS ({_URL_AUG_SQL}),
u AS (SELECT DISTINCT doc_id,
             lower(regexp_extract(url, '{DOMAIN_RE}', 1)) AS domain
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(text, '{url_re}')) AS url
            FROM aug)),
e0 AS (SELECT DISTINCT {ref} AS src, domain AS dst
       FROM u WHERE domain <> {ref}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e0),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
wd AS (SELECT und.a, und.b, da.degree AS dega, db.degree AS degb
       FROM und JOIN deg da ON da.node = und.a
                JOIN deg db ON db.node = und.b),
o AS (SELECT CASE WHEN (dega, a) < (degb, b) THEN a ELSE b END AS ux,
             CASE WHEN (dega, a) < (degb, b) THEN b ELSE a END AS v,
             CASE WHEN (dega, a) < (degb, b) THEN degb ELSE dega END AS dv
      FROM wd),
w AS (SELECT o1.ux AS x, o1.v AS y, o2.v AS z
      FROM o o1 JOIN o o2 ON o1.ux = o2.ux
      WHERE (o1.dv, o1.v) < (o2.dv, o2.v)),
t AS (SELECT x, y, z FROM w JOIN o ON o.ux = w.y AND o.v = w.z),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
             UNION ALL SELECT z FROM t)
       GROUP BY node)
SELECT deg.node, deg.degree,
       CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN deg.degree >= 2
                 THEN (2000 * COALESCE(pn.n_triangles, 0))
                      // (deg.degree * (deg.degree - 1))
                 ELSE 0 END AS BIGINT) AS clustering_permille
FROM deg LEFT JOIN pn USING (node)
ORDER BY n_triangles DESC, node
"""


def q139_edit_near_dups(spark, sf_dir):
    """Edit-distance near-duplicate pairs — the character-level dedup
    family MinHash/SimHash cannot see (one-typo reposts, trailing-byte
    variants: shingle sets barely move but so do thousands of unrelated
    docs; Levenshtein ≤ 3 is the precise test). Candidate generation is
    EXACT-LENGTH blocking: |len(a) − len(b)| is a lower bound on edit
    distance, so the shorter side fans out to the four lengths a
    qualifying partner may have and the join key is the exact length —
    the Ed-Join length filter promoted from post-join prune to the
    equi-join key itself (the r5-verdict quadratic band fix: candidates
    per doc are bounded by Δlen≤3 length-group occupancy, not 64-char
    band occupancy). Spark computes levenshtein WITH the threshold
    argument (early-exit row-kernel:
    abandons a pair the moment the running minimum exceeds 3). A
    deterministic plant (doc_id % 37 == 4 → a ' x'-suffixed variant at
    −doc_id − 1, a key space no real non-negative id can ever collide
    with at ANY corpus size) guarantees true positives on any
    regenerated corpus; the corpus also contributes natural pairs. The
    operator's domain is ASCII-only text (guard pushed into the scan):
    Spark's levenshtein counts CODEPOINTS while DuckDB's counts BYTES,
    so the two agree exactly on ASCII and diverge on multi-byte chars —
    on a real multilingual corpus the distance kernel itself is the
    cross-engine contract to pin, not this query's blocking. Scale
    shape: the band self-join is a plain equi-join shuffle on the band
    key (AQE-skew-splittable if one length band is hot); candidates per
    doc are bounded by band occupancy × the Δlen prune, never
    corpus-sized. Exact-dup pairs (dist 0) are excluded — that family
    is q18's."""
    d = (
        _spread(_t(spark, sf_dir, "documents"))
        .select("doc_id", "text", "n_chars")
        .filter(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    )
    var = d.filter(F.col("doc_id") % 37 == 4).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" x")).alias("text"),
        (F.col("n_chars") + 2).alias("n_chars"),
    )
    b = d.unionByName(var).select("doc_id", "text", "n_chars")
    # r6 blocking (guide §1.2 — fix the algorithm): the 64-char band
    # self-join materialized ~459M join rows at sf1.0 and then threw
    # ~98% away with the |Δlen| ≤ 3 filter (band occupancy grows
    # linearly with the corpus, so those junk rows grow quadratically —
    # VERDICT r5 "What's wrong" #1). The Δlen prune is now the EQUI-JOIN
    # KEY itself: the shorter-or-equal side x fans out to the four
    # lengths a qualifying partner may have (n_chars … n_chars+3) and
    # joins y on exact length — emitting exactly the |Δlen| ≤ 3
    # candidate set (~21M rows at sf1.0) straight out of the join, with
    # ~541 distinct int keys for the exchange to balance and AQE skew
    # split as the hot-length backstop. Every pair appears exactly once:
    # a cross-length pair only as (x=shorter, y=longer); an equal-length
    # pair only under x.doc_id < y.doc_id — the same once-per-pair
    # orientation (doc_a = least id) the band form produced, so the
    # result set is row-for-row identical and the frozen oracle holds.
    xk = b.select(
        F.col("doc_id").alias("_xid"), F.col("text").alias("ta"),
        F.col("n_chars").alias("_na"),
        F.explode(F.array(*[F.col("n_chars") + i for i in range(4)]))
        .alias("_k"),
    )
    y = b.select(F.col("doc_id").alias("_yid"), F.col("text").alias("tb"),
                 F.col("n_chars").alias("_nb"))
    return (
        xk.join(y, F.col("_k") == F.col("_nb"))
        .filter((F.col("_nb") > F.col("_na"))
                | (F.col("_xid") < F.col("_yid")))
        .select(
            F.least("_xid", "_yid").alias("doc_a"),
            F.greatest("_xid", "_yid").alias("doc_b"),
            F.levenshtein("ta", "tb", 3).cast("long").alias("dist"),
        )
        .filter((F.col("dist") >= 1) & (F.col("dist") <= 3))
        .orderBy("doc_a", "doc_b")
    )


_Q139_SQL = r"""
WITH ascii_docs AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE regexp_matches(text, '^[\x00-\x7F]*$')),
base AS (
  SELECT doc_id, text, n_chars FROM ascii_docs
  UNION ALL
  SELECT -doc_id - 1, text || ' x', n_chars + 2
  FROM ascii_docs WHERE doc_id % 37 = 4),
b AS (SELECT doc_id, text, n_chars, n_chars // 64 AS band FROM base),
cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.text AS ta, y.text AS tb
  FROM b x JOIN b y ON x.band = y.band AND x.doc_id < y.doc_id
  WHERE abs(x.n_chars - y.n_chars) <= 3
  UNION ALL
  SELECT least(x.doc_id, y.doc_id), greatest(x.doc_id, y.doc_id),
         x.text, y.text
  FROM b x JOIN b y ON x.band + 1 = y.band
  WHERE abs(x.n_chars - y.n_chars) <= 3),
scored AS (
  SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
  FROM cand)
SELECT doc_a, doc_b, dist FROM scored
WHERE dist BETWEEN 1 AND 3
ORDER BY doc_a, doc_b
"""


def q140_scd2_state(spark, sf_dir):
    """SCD-2 state-interval build over the event log: each user's
    event_type stream run-length-encodes into validity intervals
    (version, valid_from_us, valid_to_us, n_events, is_current) — the
    slowly-changing-dimension type-2 table every warehouse derives from a
    mutation log, and for a training pipeline the "which state was active
    at time t" table that as-of joins (q62) consume. Islands are the
    change-flag + running-sum idiom in exact epoch-micros; the island
    ordinal ships as the SCD2 ``version``, so (user_id, version) is a
    deterministic TOTAL order even when two same-timestamp events open
    two intervals (event_id breaks the window tie identically on both
    engines; the degenerate [t, t) row is then well-ordered too);
    valid_to is the NEXT version's valid_from (half-open [from, to)
    contract, pinned by test), with the open interval carrying the
    int64-max sentinel rather than NULL so every column stays exact
    BIGINT on both engines.
    Scale shape: ONE user-keyed exchange serves the change-flag window,
    the island sum, the interval collapse, AND the valid_to lead (all
    partition on user_id); at 10^12 events nothing re-shuffles, and
    output is bounded by the number of state CHANGES, not events."""
    e = _t(spark, sf_dir, "events")
    mu = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(wu).isNull()
        | (F.lag("event_type").over(wu) != F.col("event_type")), 1
    ).otherwise(0)
    s = e.select(
        "user_id", "event_id", "event_type", mu.alias("mu"),
        F.sum(chg).over(wu).cast("long").alias("island"),
    )
    per = s.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.min("mu").cast("long").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    sentinel = F.lit(9_223_372_036_854_775_807).cast("long")
    return (
        per.select(
            "user_id", F.col("island").alias("version"), "state",
            "valid_from_us", "n_events",
            F.coalesce(F.lead("valid_from_us").over(wi), sentinel)
            .alias("valid_to_us"),
        )
        .select(
            "user_id", "version", "state", "valid_from_us", "valid_to_us",
            "n_events",
            (F.col("valid_to_us") == sentinel).alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


_Q140_SQL = """
WITH m AS (SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS mu
           FROM events),
g AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM g),
per AS (SELECT user_id, island, min(event_type) AS state,
               CAST(min(mu) AS BIGINT) AS valid_from_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, island),
fin AS (SELECT user_id, CAST(island AS BIGINT) AS version, state,
               valid_from_us, n_events,
               CAST(coalesce(
                 lead(valid_from_us)
                   OVER (PARTITION BY user_id ORDER BY island),
                 9223372036854775807) AS BIGINT) AS valid_to_us
        FROM per)
SELECT user_id, version, state, valid_from_us, valid_to_us, n_events,
       valid_to_us = 9223372036854775807 AS is_current
FROM fin ORDER BY user_id, version
"""


def q141_basket_rules(spark, sf_dir):
    """Market-basket association rules over user-day baskets: which event
    types co-occur within one user's day, with exact integer support,
    both directional confidences, and lift — the co-occurrence mining a
    curation pipeline runs on (source, defect-flag) or (tool, error)
    pairs to find systematically coupled behaviours. Baskets are distinct
    (user, day, event_type) triples; pairs form per basket with
    item_a < item_b. All ratios are integer: support/conf in permille,
    lift in milli via the overflow-safe two-step
    ((1e6·n_ab div n_a) · n_baskets) div (1000·n_b) — every intermediate
    ≤ 1e18 even at 10^12 baskets, restated verbatim in the oracle (the
    inner floor can sit lift one milli under the rational value — the
    deliberate, deterministic quantization of the micro-unit discipline,
    pinned by test).
    Scale shape: one (user, day)-keyed exchange dedups baskets AND feeds
    the pair self-join on the same key (no second shuffle of the big
    side); pair output is |item-vocabulary|²-bounded, so the global
    basket count joins in as a broadcast one-rower."""
    e = _t(spark, sf_dir, "events")
    b = e.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    n_baskets = (
        b.select("user_id", "day").distinct()
        .agg(F.count("*").cast("long").alias("n_baskets"))
    )
    ni = b.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(y, ["user_id", "day"])
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("item_a"),
            F.col("y.event_type").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    na = ni.select(F.col("event_type").alias("item_a"), F.col("n").alias("n_a"))
    nb = ni.select(F.col("event_type").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
            F.expr("(1000 * n_ab) div n_baskets").alias("support_permille"),
            F.expr("(1000 * n_ab) div n_a").alias("conf_a_to_b_permille"),
            F.expr("(1000 * n_ab) div n_b").alias("conf_b_to_a_permille"),
            F.expr(
                "((1000000 * n_ab div n_a) * n_baskets) div (1000 * n_b)"
            ).alias("lift_milli"),
        )
        .orderBy("item_a", "item_b")
    )


_Q141_SQL = """
WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
           FROM events),
nbk AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
        FROM (SELECT DISTINCT user_id, day FROM b)),
ni AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       FROM b GROUP BY event_type),
pairs AS (SELECT x.event_type AS item_a, y.event_type AS item_b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM b x JOIN b y
            ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type
          GROUP BY 1, 2)
SELECT item_a, item_b, na.n AS n_a, nb.n AS n_b, n_ab, nbk.n_baskets,
       CAST((1000 * n_ab) // nbk.n_baskets AS BIGINT) AS support_permille,
       CAST((1000 * n_ab) // na.n AS BIGINT) AS conf_a_to_b_permille,
       CAST((1000 * n_ab) // nb.n AS BIGINT) AS conf_b_to_a_permille,
       CAST(((1000000 * n_ab // na.n) * nbk.n_baskets)
            // (1000 * nb.n) AS BIGINT) AS lift_milli
FROM pairs
JOIN ni na ON na.event_type = item_a
JOIN ni nb ON nb.event_type = item_b
CROSS JOIN nbk
ORDER BY item_a, item_b
"""


def q142_chi2_contingency(spark, sf_dir):
    """Chi-squared contingency audit of the lang × source grid — the
    independence check a mixture owner runs to catch provenance/language
    coupling (one crawl source quietly all-German ⇒ language balancing
    silently reweights sources). Observed counts, expected counts, and
    deviations are integers in micro-units via the overflow-safe two-step
    expected: the LARGER marginal is scaled-and-floored first, then
    multiplied by the smaller — every intermediate ≤ 1e18 at 10^12 docs,
    and the floor's quantization is bounded by min(row, col) micro-units
    (= min(row, col)/1e6 counts; the q141 documented-quantization
    discipline — a truly exact product needs int128). The float χ²
    contribution is ONE multiply and two divides over those integers
    (identical IEEE ops on both engines, round 6 — the q137 cume_dist
    discipline); cells whose expected floors to 0 (a marginal below
    total/1e6) report χ² 0.0 rather than a cross-engine Inf/NULL
    disagreement — dev_micro still exposes them. Scale shape: ONE scan
    builds the |langs|×|sources| cell table; marginals and the total
    derive from the CELLS (partial re-aggs of a tiny frame, guaranteed
    consistent by construction) and broadcast back."""
    d = _t(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_obs")
    )
    row = cell.groupBy("lang").agg(F.sum("n_obs").alias("n_lang"))
    col = cell.groupBy("source").agg(F.sum("n_obs").alias("n_source"))
    tot = row.agg(F.sum("n_lang").alias("n_total"))
    return (
        cell.join(F.broadcast(row), "lang")
        .join(F.broadcast(col), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "n_obs",
            F.expr(
                "CASE WHEN n_lang >= n_source"
                " THEN (1000000 * n_lang div n_total) * n_source"
                " ELSE (1000000 * n_source div n_total) * n_lang END"
            ).alias("expected_micro"),
        )
        .select(
            "lang", "source", "n_obs", "expected_micro",
            F.expr("1000000 * n_obs - expected_micro").alias("dev_micro"),
            F.round(
                F.expr(
                    "CASE WHEN expected_micro = 0 THEN CAST(0 AS DOUBLE)"
                    " ELSE CAST(dev_micro AS DOUBLE)"
                    " * CAST(dev_micro AS DOUBLE)"
                    " / CAST(expected_micro AS DOUBLE) / 1000000.0 END"
                ),
                6,
            ).alias("chi2_contrib"),
        )
        .orderBy("lang", "source")
    )


_Q142_SQL = """
WITH cell AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_obs
              FROM documents GROUP BY lang, source),
r AS (SELECT lang, CAST(sum(n_obs) AS BIGINT) AS n_lang
      FROM cell GROUP BY lang),
c AS (SELECT source, CAST(sum(n_obs) AS BIGINT) AS n_source
      FROM cell GROUP BY source),
t AS (SELECT CAST(sum(n_lang) AS BIGINT) AS n_total FROM r),
e AS (SELECT cell.lang, cell.source, cell.n_obs,
             CAST(CASE WHEN r.n_lang >= c.n_source
                       THEN (1000000 * r.n_lang // t.n_total) * c.n_source
                       ELSE (1000000 * c.n_source // t.n_total) * r.n_lang
                  END AS BIGINT) AS expected_micro
      FROM cell JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t)
SELECT lang, source, n_obs, expected_micro,
       CAST(1000000 * n_obs - expected_micro AS BIGINT) AS dev_micro,
       round(CASE WHEN expected_micro = 0 THEN 0.0
             ELSE CAST(1000000 * n_obs - expected_micro AS DOUBLE)
                  * CAST(1000000 * n_obs - expected_micro AS DOUBLE)
                  / CAST(expected_micro AS DOUBLE) / 1000000.0 END, 6)
         AS chi2_contrib
FROM e ORDER BY lang, source
"""


def q143_interval_coalesce(spark, sf_dir):
    """Interval coalescing (overlapping-range union): each event opens an
    activity lease (15 minutes; 2 hours for an ``error`` — the incident
    window); per user, overlapping leases merge into maximal covered
    intervals, reported as the per-user census (events, merged intervals,
    exact covered micros) — the time-range dedup behind rate-limit
    accounting, crawl-politeness windows, and GPU-hour attribution, and a
    DIFFERENT islands operator from q44/q100: because lease lengths VARY,
    interval ends are not monotone in starts, so the island break needs
    the running MAX of interval ENDS — an early 2h incident lease
    swallows several later 15-minute leases that a lag-gap check would
    wrongly split on (pinned by test). The running max uses the
    [unbounded, 1 preceding) frame in exact epoch-micros with an event_id
    tiebreak, so island ids are engine-exact. Scale shape: ONE user-keyed
    exchange serves the running-max window, the island collapse, and the
    per-user census (same partition key throughout); output is
    |users|-bounded."""
    e = _t(spark, sf_dir, "events")
    mu = F.unix_micros(F.col("ts").cast("timestamp"))
    lease = F.when(
        F.col("event_type") == "error", F.lit(7_200_000_000)
    ).otherwise(F.lit(900_000_000))
    iv = e.select(
        "user_id", "event_id", mu.alias("s"), (mu + lease).alias("en"),
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    flagged = iv.select(
        "user_id", "event_id", "s", "en",
        F.when(
            F.max("en").over(wu).isNull()
            | (F.col("s") > F.max("en").over(wu)), 1
        ).otherwise(0).alias("new_island"),
    ).select(
        "user_id", "s", "en",
        F.sum("new_island").over(wo).cast("long").alias("island"),
    )
    merged = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("en").alias("me"),
        F.count("*").cast("long").alias("n_ev"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.sum("n_ev").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_intervals"),
            F.sum(F.col("me") - F.col("ms")).cast("long")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


_Q143_SQL = """
WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                   + CASE WHEN event_type = 'error' THEN 7200000000
                          ELSE 900000000 END AS en
            FROM events),
g AS (SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
      FROM iv),
f AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                     THEN 1 ELSE 0 END AS new_island
      FROM g),
s2 AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id
                                       ORDER BY s, event_id
                                       ROWS UNBOUNDED PRECEDING) AS island
       FROM f),
m AS (SELECT user_id, island, min(s) AS ms, max(en) AS me,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM s2 GROUP BY user_id, island)
SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(me - ms) AS BIGINT) AS covered_us
FROM m GROUP BY user_id ORDER BY user_id
"""


def _hll_sql_rho(tail: str) -> str:
    """DuckDB restatement of sketches.hll rho: leading-zero count of the
    32-bit tail + 1, EXACT via minimal-binary length (both engines print
    bin() without leading zeros)."""
    return f"CASE WHEN {tail} = 0 THEN 33 ELSE 33 - length(bin({tail})) END"


def q144_hll_customers(spark, sf_dir):
    """HyperLogLog distinct-customer census per order status
    (sketches.hll_distinct, Flajolet et al. 2007) — the bounded-state
    twin of the exact count-distinct family (A4/q03): per-group distinct
    counts whose aggregation state is 256 integer registers regardless
    of input size, merging by pointwise max (map-side combinable — at
    10^12 fact rows the exact count(distinct) re-shuffles every raw key,
    the sketch ships 256 bytes per group per partition). Integer-exact
    up to ONE division: register = top 8 bits of the 40-bit md5 draw,
    rho = 33 - length(bin(tail)) (minimal-binary length on both
    engines), the harmonic denominator is the exact BIGINT
    sum(2^(33-M_j)) (256 terms ≤ 2^33 — even its double image is exact),
    and hll_est is the single correctly-rounded IEEE division
    ALPHA_NUM / sum_scaled, identical on both engines. n_exact rides
    along as the labeled audit baseline (the q22 exact-cosine contract);
    err_permille is floor()ed from engine-identical doubles. Raw
    estimator only — the small-range linear-counting correction would
    need ln(), which is libm-divergent across engines. Regime honesty:
    the raw estimator carries the KNOWN systematic biases of plain HLL —
    sf0.001's ~145-distinct groups sit below the 2.5·m = 640
    linear-counting threshold and read high; sf0.01's ~1.4k-distinct
    groups are in the n ≲ 5·m mid-range where raw HLL reads LOW
    (observed err ≈ −140 permille, the regime HLL++'s empirical bias
    table exists to correct). err_permille IS the audit of that bias —
    deterministic, pinned, and exactly what a production rollout sizes
    p against."""
    from epstein_browser_spark import sketches

    o = _spread(_t(spark, sf_dir, "orders"))
    return sketches.hll_distinct(
        o, ["o_orderstatus"], "o_custkey", seed="hll0"
    ).orderBy("o_orderstatus")


def _q144_sql() -> str:
    from epstein_browser_spark.sketches import HLL_ALPHA_NUM

    h = _md5_int_sql("'hll0:' || CAST(o_custkey AS VARCHAR)", 10)
    return f"""
WITH hashed AS (
  SELECT o_orderstatus, ({h}) AS h FROM orders),
split AS (
  SELECT o_orderstatus, h // 4294967296 AS reg, h % 4294967296 AS tail
  FROM hashed),
regs AS (
  SELECT o_orderstatus, reg, max({_hll_sql_rho('tail')}) AS m
  FROM split GROUP BY o_orderstatus, reg),
census AS (
  SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_regs_hit,
         CAST(sum(CAST(1 AS BIGINT) << (33 - m)) AS BIGINT) AS present
  FROM regs GROUP BY o_orderstatus),
exact AS (
  SELECT o_orderstatus,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY o_orderstatus),
est AS (
  SELECT c.o_orderstatus, e.n_exact, c.n_regs_hit,
         CAST(c.present + (256 - c.n_regs_hit) * 8589934592 AS BIGINT)
           AS sum_scaled
  FROM census c JOIN exact e USING (o_orderstatus))
SELECT o_orderstatus, n_exact, n_regs_hit, sum_scaled,
       {HLL_ALPHA_NUM!r} / CAST(sum_scaled AS DOUBLE) AS hll_est,
       CAST(floor(({HLL_ALPHA_NUM!r} / CAST(sum_scaled AS DOUBLE)
                   - CAST(n_exact AS DOUBLE)) * 1000.0
                  / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_permille
FROM est ORDER BY o_orderstatus
"""


def q145_cms_heavyhitters(spark, sf_dir):
    """Count-min heavy-hitter audit (sketches.cms_sketch/cms_estimate,
    Cormode & Muthukrishnan 2005): a 4×256 integer counter grid over the
    orders fact stream keyed by customer, point-queried for the 20
    highest-order-count customers (exact top-20 = the labeled baseline,
    ties broken by key). cms_est = min over the 4 rows of the key's
    bucket counter — ≥ true always; overcount (the collision mass) is
    the audited error and is structurally non-vacuous: the key domain
    (~1.5k customers at sf0.01, growing with sf) overfills the 256
    buckets ~6× per row, so every probed bucket carries other keys'
    counts (P[any of 4 rows collision-free] ≈ 1%). Scale shape: the
    sketch build is ONE partial-aggregable shuffle with ≤ 1024 groups
    (vs the full-key shuffle of an exact census); probes are a broadcast
    equi-join of the ≤ 1024-row grid. Every value is a BIGINT count —
    no floats anywhere."""
    from epstein_browser_spark import sketches

    o = _spread(_t(spark, sf_dir, "orders"))
    keys = o.select(F.col("o_custkey").cast("string").alias("k"))
    exact = (
        keys.groupBy("k")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("k"))
        .limit(20)
        # 20 rows feeding BOTH the probe set and the final join — pin
        # once instead of re-running the fact aggregation (q43/q97
        # localCheckpoint precedent)
        .localCheckpoint()
    )
    sketch = sketches.cms_sketch(keys, "k", depth=4, width=256,
                                 seed="cms0")
    est = sketches.cms_estimate(sketch, exact.select("k"), "k",
                                depth=4, width=256, seed="cms0")
    return (
        exact.join(est, "k")
        .select(
            F.col("k").cast("long").alias("custkey"),
            "true_cnt", "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("true_cnt"), F.asc("custkey"))
    )


def _q145_sql(depth: int = 4, width: int = 256) -> str:
    h = _md5_int_sql("'cms0:' || CAST(i AS VARCHAR) || ':' || k", 6)
    return f"""
WITH keys AS (
  SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
exact AS (
  SELECT k, CAST(count(*) AS BIGINT) AS true_cnt
  FROM keys GROUP BY k
  ORDER BY true_cnt DESC, k ASC LIMIT 20),
grid AS (
  SELECT i AS row, ({h}) % {width} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM keys, (SELECT unnest(generate_series(0, {depth - 1})) AS i)
  GROUP BY row, bucket),
probes AS (
  SELECT k, i AS row, ({h}) % {width} AS bucket
  FROM exact, (SELECT unnest(generate_series(0, {depth - 1})) AS i)),
est AS (
  SELECT p.k, min(g.cnt) AS cms_est
  FROM probes p JOIN grid g ON p.row = g.row AND p.bucket = g.bucket
  GROUP BY p.k)
SELECT CAST(e.k AS BIGINT) AS custkey, e.true_cnt,
       CAST(s.cms_est AS BIGINT) AS cms_est,
       CAST(s.cms_est - e.true_cnt AS BIGINT) AS overcount
FROM exact e JOIN est s ON e.k = s.k
ORDER BY e.true_cnt DESC, custkey ASC
"""


def q146_doc_skyline(spark, sf_dir):
    """2-D Pareto skyline (sketches.skyline_2d): the
    information-density frontier — documents no other document beats on
    BOTH axes (shorter-or-equal n_chars AND richer-or-equal distinct
    vocabulary, strictly better on one). Minimize-chars is fed to the
    maximize-maximize kernel as x = -n_chars. Grid-pruned, never
    all-pairs: ≤ 256 per-bin max-y partial aggs + a driver-side
    suffix-max (bounded scalar collect) prune every point dominated from
    a strictly-better bin map-side; the exact dominance check is a LEFT
    ANTI EQUI-join on the bin among the few survivors (AQE-splittable;
    provably sufficient — a surviving point's dominators can only live
    in its own bin, see sketches.skyline_2d). Identical (chars, vocab)
    duplicates do not dominate each other: both stay on the frontier.
    Oracle is the O(n²) NOT EXISTS dominance restatement."""
    from epstein_browser_spark import sketches

    d = _spread(_t(spark, sf_dir, "documents"))
    pts = d.select(
        "doc_id",
        (-F.col("n_chars")).alias("neg_chars"),
        F.size(
            F.array_distinct(textstats.tokens(F.lower("text")))
        ).alias("n_vocab"),
    )
    sky = sketches.skyline_2d(pts, "doc_id", "neg_chars", "n_vocab")
    return sky.select(
        F.col("id").alias("doc_id"),
        (-F.col("x")).alias("n_chars"),
        F.col("y").alias("n_vocab"),
    ).orderBy("n_chars", "doc_id")


_Q146_SQL = """
WITH p AS (
  SELECT doc_id, n_chars,
         CAST(len(list_distinct(list_filter(
           string_split_regex(trim(lower(text)), '\\s+'),
           t -> t <> ''))) AS BIGINT) AS n_vocab
  FROM documents)
SELECT a.doc_id, a.n_chars, a.n_vocab
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.n_chars <= a.n_chars AND b.n_vocab >= a.n_vocab
    AND (b.n_chars < a.n_chars OR b.n_vocab > a.n_vocab))
ORDER BY a.n_chars, a.doc_id
"""


def q148_org_hierarchy(spark, sf_dir):
    """Recursive hierarchy closure (graph.tree_closure) — Spark's answer
    to ``WITH RECURSIVE``: every customer's root and depth in a
    deterministic org forest (parent = custkey div 3; custkeys 1 and 2
    are the roots), rolled up to the (root, depth) census. The kernel is
    POINTER DOUBLING — the known-ancestor distance doubles per
    equi-join round, so the ~7-level sf0.01 hierarchy (and a 100-level
    BOM at 10^12 rows) settles in ceil(log2 D) shuffles instead of D —
    with the repo's iterative discipline: per-round localCheckpoint,
    scalar-only driver traffic, loud cycle failure. The DuckDB oracle
    IS the recursive CTE this kernel replaces, walking depth-at-a-time
    from the roots — two entirely different evaluation strategies, one
    value-matched answer. Census output is |roots|×depth bounded."""
    from epstein_browser_spark import graph

    c = _t(spark, sf_dir, "customer")
    nodes = c.select(
        F.col("c_custkey").alias("node"),
        F.when(
            F.expr("c_custkey div 3") >= 1, F.expr("c_custkey div 3")
        ).alias("parent"),
    )
    closure = graph.tree_closure(nodes, "node", "parent")
    return (
        closure.groupBy("root", "depth")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("root", "depth")
    )


_Q148_SQL = """
WITH RECURSIVE r AS (
  SELECT c_custkey AS node, c_custkey AS root, CAST(0 AS BIGINT) AS depth
  FROM customer WHERE c_custkey // 3 < 1
  UNION ALL
  SELECT c.c_custkey, r.root, r.depth + 1
  FROM customer c JOIN r ON (c.c_custkey // 3) = r.node
  WHERE c.c_custkey // 3 >= 1)
SELECT root, depth, CAST(count(*) AS BIGINT) AS n_nodes
FROM r GROUP BY root, depth ORDER BY root, depth
"""


def q149_cube_census(spark, sf_dir):
    """CUBE grouping sets: document volume by (lang, source) at ALL four
    granularities — per cell, per lang, per source, grand total — in ONE
    partial-aggregable pass (each input row feeds 4 grouping sets
    map-side, one shuffle total). Completes the grouping-sets family:
    q126's ROLLUP cannot produce the source-only marginal. grouping_id
    disambiguates real NULL keys from subtotal rows (same MSB-first bit
    convention on both engines, pinned by the q126 oracle already —
    this one pins the full CUBE lattice)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("gid", "lang", "source")
    )


_Q149_SQL = """
SELECT lang, source,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
ORDER BY gid, lang, source
"""


def q150_table_fingerprint(spark, sf_dir):
    """Order-independent replica fingerprint: one BIGINT per order
    status that two clusters (or a table and its migrated copy) can
    compare WITHOUT sorting, shipping, or diffing rows — the
    anti-entropy check every cross-datacenter replication and
    engine-migration runbook needs. fingerprint = Σ md5(row-key
    material) over the group, accumulated in DECIMAL(38,0) (exact at
    any row count — BIGINT sums overflow at ~2^23 rows of 40-bit
    hashes; the q84 corpus-sum discipline) and reduced mod 2^61 at the
    end. Addition is commutative, so the result is independent of row
    order, partitioning, and engine — a single flipped byte anywhere in
    the keyed columns changes it. Map-only hash + ONE partial-agg
    shuffle with |statuses| groups; only integer-typed columns (keys,
    epoch micros) and the status string feed the hash — float columns
    are excluded by design (their text rendering is not
    engine-portable). Timestamp columns enter as unix_micros of the
    stored instant, which makes the fingerprint SESSION-TIMEZONE-bound:
    both replicas must read under the same session timezone (this repo
    pins UTC — session.py — as does the driver harness; verified: a
    non-UTC session shifts DST-gap rows and changes the checksum).
    NULL keyed values hash as an explicit '<NULL>' sentinel on both
    engines — concat_ws would silently skip them and DuckDB's || would
    NULL-propagate, either corrupting or escaping the integrity check."""
    from epstein_browser_spark.sketches import md5_int

    o = _t(spark, sf_dir, "orders")

    def _part(c):
        # explicit NULL sentinel on BOTH engines: concat_ws silently
        # SKIPS NULLs (collapsing 'a|NULL|b' into 'a|b') while DuckDB's
        # || NULL-propagates and sum() then drops the whole row — either
        # way a NULL key would corrupt or escape the integrity check.
        # The keyed columns here are integers + a status code, so the
        # sentinel cannot collide with real values.
        return F.coalesce(c.cast("string"), F.lit("<NULL>"))

    h = md5_int(
        F.concat_ws(
            "|",
            _part(F.col("o_orderkey")),
            _part(F.col("o_custkey")),
            _part(F.col("o_orderstatus")),
            _part(F.unix_micros(F.col("o_orderdate").cast("timestamp"))),
        ),
        10,
    ).cast("decimal(38,0)")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.pmod(F.sum(h), F.lit(1 << 61).cast("decimal(38,0)"))
            .cast("long")
            .alias("fingerprint"),
        )
        .orderBy("o_orderstatus")
    )


def _q150_sql() -> str:
    parts = [
        "CAST(o_orderkey AS VARCHAR)",
        "CAST(o_custkey AS VARCHAR)",
        "o_orderstatus",
        "CAST(epoch_us(o_orderdate) AS VARCHAR)",
    ]
    joined = " || '|' || ".join(f"coalesce({c}, '<NULL>')" for c in parts)
    h = _md5_int_sql(joined, 10)
    return f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({h}) % {1 << 61} AS BIGINT) AS fingerprint
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ONE definition of the q147 filter geometry: the pass threshold IS k,
# shared by both bloom_positions calls, the all-k match filter, and the
# DuckDB oracle — editing k in one place cannot desynchronize the rest
# (a missed threshold would turn Bloom false-negative-free into lossy).
_Q147_K = 2
_Q147_M = 512


def q147_bloom_semijoin(spark, sf_dir):
    """Bloom-filter semi-join audit (sketches.bloom_positions): gate the
    orders fact table by membership of o_custkey in the high-balance
    customer set (c_acctbal > 9000) through a k=2, m=512 Bloom filter,
    then audit it against the exact broadcast semi-join — per
    order-status: total orders, Bloom passes, true matches, false
    positives, and the integer false-positive permille among true
    negatives. The filter IS data: the ≤ min(k·|dim|, m) DISTINCT bit
    positions of the dim keys, broadcast to the fact side — the 100 TB
    point is that the fact table never shuffles on the join key; rows
    failing the filter die in the scan stage and only Bloom-passers
    reach the (still-needed) exact join. No false negatives by
    construction — every true match passes. m is sized DOWN (512) so
    the false-positive branch is non-vacuous at gate scale (~0.2 fp
    rate at sf0.01's 153 dim keys); production sizing is the same
    operator with m = 2^27. All-integer output."""
    from epstein_browser_spark import sketches

    cust = _t(spark, sf_dir, "customer")
    orders = _spread(_t(spark, sf_dir, "orders"))
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    dim_pos = dim.select(
        F.explode(
            sketches.bloom_positions(
                F.col("c_custkey"), k=_Q147_K, m=_Q147_M
            )
        ).alias("pos")
    ).distinct()
    probe = orders.select(
        "o_orderkey",
        F.explode(
            sketches.bloom_positions(
                F.col("o_custkey"), k=_Q147_K, m=_Q147_M
            )
        ).alias("pos"),
    )
    passes = (
        probe.join(F.broadcast(dim_pos), "pos")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("_nm"))
        .filter(F.col("_nm") == _Q147_K)
        .select("o_orderkey", F.lit(True).alias("bloom_pass"))
    )
    flagged = (
        orders.join(passes, "o_orderkey", "left")
        .join(
            F.broadcast(dim.withColumn("is_true", F.lit(True))),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .select(
            "o_orderstatus",
            F.coalesce("bloom_pass", F.lit(False)).alias("bp"),
            F.coalesce("is_true", F.lit(False)).alias("tr"),
        )
    )
    agg = flagged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("bp").cast("long")).alias("n_bloom_pass"),
        F.sum(F.col("tr").cast("long")).alias("n_true"),
    )
    return agg.select(
        "o_orderstatus", "n_orders", "n_bloom_pass", "n_true",
        (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
        F.when(F.col("n_orders") - F.col("n_true") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "(1000 * (n_bloom_pass - n_true)) div (n_orders - n_true)"
            )
        )
        .alias("fp_permille"),
    ).orderBy("o_orderstatus")


def _q147_sql(k: int = _Q147_K, m: int = _Q147_M) -> str:
    hd = _md5_int_sql(
        "'bl0:' || CAST(i AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)", 6
    )
    ho = _md5_int_sql(
        "'bl0:' || CAST(i AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)", 6
    )
    return f"""
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
pos AS (
  SELECT DISTINCT ({hd}) % {m} AS pos
  FROM dim, (SELECT unnest(generate_series(0, {k - 1})) AS i)),
probe AS (
  SELECT o_orderkey, ({ho}) % {m} AS pos
  FROM orders, (SELECT unnest(generate_series(0, {k - 1})) AS i)),
pass AS (
  SELECT o_orderkey FROM probe JOIN pos USING (pos)
  GROUP BY o_orderkey HAVING count(*) = {k}),
flagged AS (
  SELECT o.o_orderstatus,
         CASE WHEN p.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS bp,
         CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS tr
  FROM orders o
  LEFT JOIN pass p ON o.o_orderkey = p.o_orderkey
  LEFT JOIN dim d ON o.o_custkey = d.c_custkey)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(bp) AS BIGINT) AS n_bloom_pass,
       CAST(sum(tr) AS BIGINT) AS n_true,
       CAST(sum(bp) - sum(tr) AS BIGINT) AS n_false_pos,
       CAST(CASE WHEN count(*) = sum(tr) THEN 0
                 ELSE (1000 * (sum(bp) - sum(tr)))
                      // (count(*) - sum(tr)) END AS BIGINT) AS fp_permille
FROM flagged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# registry
#
# ORDERING IS DELIBERATE, not numeric: the round driver's correctness gate
# records exactly 50 rows, taken in registry order (VERDICT r3 item 1 —
# q51+ never got a driver row while the registry was numeric). The window
# leads with the newest families (temporal joins, PII, packing, PQ/IVF-PQ,
# BPE, learned quantizers, conversation dedup), then the core
# extraction/dedup/ANN operators. The 25 queries past the window are the
# long-green TPC-relational/string rows (driver-green since r1/r2 and
# still pinned per-query by tests/test_queries_oracle.py at sf0.001).
# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple] = {
    # Registry order IS the driver's 50-row correctness window. r6
    # rotation (VERDICT r5 item 3 — retire the window debt): the 24
    # queries never sampled by any round's driver window (the q77–q100
    # band, q106, q107, q149) debut first, so
    # union(CORRECTNESS_r01..r06) covers every registry name; the
    # remaining 26 slots go to the queries whose INTERNALS this
    # optimization round rewrote (numpy pair kernel, map-only centroid
    # assignment, fused minhash prefilter, census-side novelty, hashed
    # dup-span keys, …) so each rewrite gets a driver-green row in the
    # round it landed. Everything below the window stays value-pinned by
    # tests/test_queries_oracle.py and the full sf0.01 mirror
    # (tools/check_oracle.py).
    "q87_nb_select": (q87_nb_select, _q87_sql()),
    "q88_lsh_recall": (q88_lsh_recall, _q88_sql()),
    "q149_cube_census": (q149_cube_census, _Q149_SQL),
    "q82_dup_spans": (q82_dup_spans, _q82_sql()),
    "q84_lm_perplexity": (q84_lm_perplexity, _Q84_SQL),
    "q80_semdedup": (q80_semdedup, _q80_sql()),
    "q81_media_decode": (q81_media_decode, _q81_sql()),
    "q95_sft_pairs": (q95_sft_pairs, _Q95_SQL),
    "q97_mixture_alpha": (q97_mixture_alpha, _Q97_SQL),
    "q98_self_repetition": (q98_self_repetition, _Q98_SQL),
    "q100_episode_segments": (q100_episode_segments, _Q100_SQL),
    "q106_vocab_growth": (q106_vocab_growth, _Q106_SQL),
    "q107_unigram_kl": (q107_unigram_kl, _Q107_SQL),
    "q77_tfidf_topk": (q77_tfidf_topk, _Q77_SQL),
    "q92_mojibake_repair": (q92_mojibake_repair, _q92_sql()),
    "q78_winnow_fingerprints": (q78_winnow_fingerprints, _q78_sql()),
    "q79_dsir_weights": (q79_dsir_weights, _q79_sql()),
    "q89_role_transitions": (q89_role_transitions, _Q89_SQL),
    "q94_conv_packing": (q94_conv_packing, _Q94_SQL),
    "q90_tool_census": (q90_tool_census, _Q90_SQL),
    "q91_conv_profile": (q91_conv_profile, _Q91_SQL),
    "q85_eval_containment": (q85_eval_containment, _Q85_SQL),
    "q83_shard_shuffle": (q83_shard_shuffle, _Q83_SQL),
    "q86_ngram_novelty": (q86_ngram_novelty, _Q86_SQL),
    "q38_cosine_pairs_lsh": (q38_cosine_pairs_lsh, _q38_sql()),
    "q20_minhash_pairs": (q20_minhash_pairs, None),
    "q42_minhash_pairs_md5": (q42_minhash_pairs_md5, _minhash_md5_sql()),
    "q74_ivf_kmeans_topk": (q74_ivf_kmeans_topk, _q74_sql()),
    "q48_ivf_topk": (q48_ivf_topk, _q48_sql()),
    "q53_ivf_topk_multiprobe": (q53_ivf_topk_multiprobe, _q48_sql(nprobe=4)),
    "q66_pq_adc_topk": (q66_pq_adc_topk, _q66_sql()),
    "q67_ivf_pq_topk": (q67_ivf_pq_topk, _q67_sql()),
    "q68_semantic_clusters": (q68_semantic_clusters, _Q68_SQL),
    "q103_centroid_diversity": (q103_centroid_diversity, _Q103_SQL),
    "q139_edit_near_dups": (q139_edit_near_dups, _Q139_SQL),
    "q51_langid_ngram": (q51_langid_ngram, _q51_sql()),
    "q108_chunk_langid": (q108_chunk_langid, _q108_sql()),
    "q26_fingerprint": (q26_fingerprint, _Q26_SQL),
    "q72_bpe_tokens": (q72_bpe_tokens, _q72_sql()),
    "q73_packing_bpe": (q73_packing_bpe, _q73_sql()),
    "q115_tokenizer_fertility": (q115_tokenizer_fertility, _q115_sql()),
    "q24_token_stats": (q24_token_stats, _Q24_SQL),
    "q25_langid": (q25_langid, _langid_sql()),
    "q57_decontamination": (q57_decontamination, _Q57_SQL),
    "q64_repetition_signals": (q64_repetition_signals, _Q64_SQL),
    "q113_split_leakage": (q113_split_leakage, _Q113_SQL),
    "q93_dsir_select": (q93_dsir_select, _q93_sql()),
    "q101_boilerplate_strip": (q101_boilerplate_strip, _Q101_SQL),
    "q21_simhash_pairs": (q21_simhash_pairs, _simhash_sql()),
    "q19_jaccard_pairs": (q19_jaccard_pairs, _Q19_SQL),
    "q148_org_hierarchy": (q148_org_hierarchy, _Q148_SQL),
    "q150_table_fingerprint": (q150_table_fingerprint, _q150_sql()),
    "q144_hll_customers": (q144_hll_customers, _q144_sql()),
    "q145_cms_heavyhitters": (q145_cms_heavyhitters, _q145_sql()),
    "q146_doc_skyline": (q146_doc_skyline, _Q146_SQL),
    "q147_bloom_semijoin": (q147_bloom_semijoin, _q147_sql()),
    "q138_link_triangles": (q138_link_triangles, _q138_sql()),
    "q140_scd2_state": (q140_scd2_state, _Q140_SQL),
    "q141_basket_rules": (q141_basket_rules, _Q141_SQL),
    "q142_chi2_contingency": (q142_chi2_contingency, _Q142_SQL),
    "q143_interval_coalesce": (q143_interval_coalesce, _Q143_SQL),
    "q137_length_quartiles": (q137_length_quartiles, _Q137_SQL),
    "q136_source_datacard": (q136_source_datacard, _Q136_SQL),
    "q132_json_props": (q132_json_props, _Q132_SQL),
    "q133_rolling_24h": (q133_rolling_24h, _Q133_SQL),
    "q134_role_sequence": (q134_role_sequence, _Q134_SQL),
    "q135_unpivot_activity": (q135_unpivot_activity, _Q135_SQL),
    "q129_gap_fill": (q129_gap_fill, _Q129_SQL),
    "q130_hopping_window": (q130_hopping_window, _Q130_SQL),
    "q131_priority_bag_diff": (q131_priority_bag_diff, _Q131_SQL),
    "q126_rollup_totals": (q126_rollup_totals, _Q126_SQL),
    "q127_event_pivot": (q127_event_pivot, _Q127_SQL),
    "q128_big_spenders_semi": (q128_big_spenders_semi, _Q128_SQL),
    "q123_domain_pagerank": (q123_domain_pagerank, _q123_sql()),
    "q124_retention_cohorts": (q124_retention_cohorts, _Q124_SQL),
    "q125_session_funnel": (q125_session_funnel, _Q125_SQL),
    "q119_blocklist_gate": (q119_blocklist_gate, _Q119_SQL),
    "q120_url_canonical": (q120_url_canonical, _q120_sql()),
    "q121_domain_reputation": (q121_domain_reputation, _q121_sql()),
    "q122_conv_safety_drop": (q122_conv_safety_drop, _Q122_SQL),
    "q117_embedding_health": (q117_embedding_health, _Q117_SQL),
    "q118_code_detect": (q118_code_detect, _Q118_SQL),
    "q116_split_leak_pairs": (q116_split_leak_pairs, _Q116_SQL),
    "q112_leakage_safe_split": (q112_leakage_safe_split, _Q112_SQL),
    "q114_budget_sampling": (q114_budget_sampling, _Q114_SQL),
    "q111_template_turns": (q111_template_turns, _Q111_SQL),
    "q109_keep_best": (q109_keep_best, _Q109_SQL),
    "q110_source_overlap": (q110_source_overlap, _Q110_SQL),
    "q105_robust_length_gate": (q105_robust_length_gate, _Q105_SQL),
    "q102_token_entropy": (q102_token_entropy, _Q102_SQL),
    "q104_turn_integrity": (q104_turn_integrity, _Q104_SQL),
    "q96_context_budget": (q96_context_budget, _Q96_SQL),
    "q99_tool_grounding": (q99_tool_grounding, _Q99_SQL),
    "q28_extract_plain": (q28_extract_plain, _Q28_SQL),
    "q29_extract_multimode": (q29_extract_multimode, _Q29_SQL),
    "q43_dup_clusters": (q43_dup_clusters, _Q43_SQL),
    "q54_pii_redaction": (q54_pii_redaction, _q54_sql()),
    "q62_asof_join": (q62_asof_join, _Q62_SQL),
    "q75_conv_dedup": (q75_conv_dedup, _Q75_SQL),
    "q76_conv_neardup": (q76_conv_neardup, _q76_sql()),
    "q69_mixture_report": (q69_mixture_report, _q69_sql()),
    "q71_boilerplate_lines": (q71_boilerplate_lines, _Q71_SQL),
    "q61_stratified_sample": (q61_stratified_sample, _q61_sql()),
    "q39_search_page": (q39_search_page, _Q39_SQL),
    "q63_range_join": (q63_range_join, _Q63_SQL),
    "q50_resize_plan": (q50_resize_plan, _Q50_SQL),
    "q59_sequence_packing": (q59_sequence_packing, _Q59_SQL),
    "q65_topk_per_group": (q65_topk_per_group, _Q65_SQL),
    "q70_chunking": (q70_chunking, _Q70_SQL),
    "q27_merge_classify": (q27_merge_classify, _Q27_SQL),
    "q32_text_preference": (q32_text_preference, _Q32_SQL),
    "q37_cosine_pairs": (q37_cosine_pairs, _Q37_SQL),
    "q40_failures_queue": (q40_failures_queue, _Q40_SQL),
    "q55_quality_rules": (q55_quality_rules, _q55_sql()),
    "q56_url_domains": (q56_url_domains, _q56_sql()),
    "q58_vocab_stats": (q58_vocab_stats, _Q58_SQL),
    "q60_bm25_rank": (q60_bm25_rank, _Q60_SQL),
    "q46_split_assign": (q46_split_assign, _Q46_SQL),
    "q47_frame_sample": (q47_frame_sample, _Q47_SQL),
    "q44_sessions": (q44_sessions, _Q44_SQL),
    "q45_length_quantiles": (q45_length_quantiles, _Q45_SQL),
    "q52_length_quantiles_approx": (q52_length_quantiles_approx, _Q52_SQL),
    "q49_ann_lsh_multiprobe": (q49_ann_lsh_multiprobe, _q49_sql()),
    "q16_quality_score": (q16_quality_score, _Q16_SQL),
    "q17_lowq_classify": (q17_lowq_classify, _Q17_SQL),
    "q18_dedup_exact": (q18_dedup_exact, _Q18_SQL),
    "q23_ann_lsh": (q23_ann_lsh, _q23_sql()),
    "q01_pricing_summary": (q01_pricing_summary, _Q01_SQL),
    "q02_status_counts": (q02_status_counts, _Q02_SQL),
    "q03_distinct_users": (q03_distinct_users, _Q03_SQL),
    "q04_avg_value": (q04_avg_value, _Q04_SQL),
    "q05_top_users": (q05_top_users, _Q05_SQL),
    "q06_hourly": (q06_hourly, _Q06_SQL),
    "q07_event_stats": (q07_event_stats, _Q07_SQL),
    "q08_nav_window": (q08_nav_window, _Q08_SQL),
    "q09_customers_no_orders": (q09_customers_no_orders, _Q09_SQL),
    "q10_search_excerpt": (q10_search_excerpt, _Q10_SQL),
    "q11_union_dedup": (q11_union_dedup, _Q11_SQL),
    "q12_pagination": (q12_pagination, _Q12_SQL),
    "q13_extremes": (q13_extremes, _Q13_SQL),
    "q14_doc_numbers": (q14_doc_numbers, _Q14_SQL),
    "q15_recent_events": (q15_recent_events, _Q15_SQL),
    "q22_embedding_topk": (q22_embedding_topk, _Q22_SQL),
    "q30_nav_transcripts": (q30_nav_transcripts, _Q30_SQL),
    "q31_hourly_tumbling": (q31_hourly_tumbling, _Q31_SQL),
    "q33_relevance_order": (q33_relevance_order, _Q33_SQL),
    "q34_rollup_join": (q34_rollup_join, _Q34_SQL),
    "q35_string_funcs": (q35_string_funcs, _Q35_SQL),
    "q36_media_features": (q36_media_features, _Q36_SQL),
    "q41_rfc2822": (q41_rfc2822, _Q41_SQL),
}
