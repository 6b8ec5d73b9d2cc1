"""Stable turn ordering + navigation windows (SURVEY.md §2.5, W1-W6).

The reference materializes the entire ordered id list in Python and does
linear scans for position/prev/next/first/last/progress
(/root/reference/app.py:691-709,756-760). Here the same semantics are one
window spec over (conv_id, turn_idx) — no driver-side materialization, and
the sort is per-conversation, not global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NAV_WINDOW_COLS = [
    "position", "prev_turn_idx", "next_turn_idx",
    "first_turn_idx", "last_turn_idx", "progress_pct",
]


def with_navigation(df: DataFrame, partition_col: str = "conv_id",
                    order_col: str = "turn_idx") -> DataFrame:
    """Adds W1-W4: 1-based position, prev/next neighbor, first/last of the
    conversation, and progress percent = (pos-1)/(N-1)*100 — the reference's
    exact formula (app.py:756-760), which is percent_rank()*100."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        df.withColumn("position", F.row_number().over(w))
        .withColumn("prev_turn_idx", F.lag(order_col, 1).over(w))
        .withColumn("next_turn_idx", F.lead(order_col, 1).over(w))
        .withColumn("first_turn_idx", F.first(order_col).over(w_full))
        .withColumn("last_turn_idx", F.last(order_col).over(w_full))
        .withColumn("progress_pct", F.percent_rank().over(w) * 100.0)
    )


def with_sequence_ids(df: DataFrame, partition_col: str = "conv_id",
                      order_col: str = "turn_idx") -> DataFrame:
    """W5/S2: deterministic sequential ids within a conversation — the
    reference's filename-sort + enumerate (index_images.py:315-318). Never
    monotonically_increasing_id: ids must be order-stable across runs and
    partitionings."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    return df.withColumn("seq_id", F.row_number().over(w))
