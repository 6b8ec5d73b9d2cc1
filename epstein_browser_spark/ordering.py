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


def shard_shuffle(df: DataFrame, n_shards: int = 16,
                  seed: str = "epoch0",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shard, pos) — deterministic training-epoch shuffle + shard
    assignment: the order a training run consumes the curated corpus in,
    as DATA rather than as a property of some writer's task layout.
    ``shard = md5(seed:id) mod n_shards`` (unbiased: the 4-hex-digit
    draw space 16^4 is divisible by any power-of-two shard count) and
    ``pos`` = the rank of the hash within its shard — so every engine,
    every rerun, and every resumed job derives the identical permutation
    from (seed, id) alone, and a NEW epoch is just a new seed string.
    The per-shard rank is a window over the shard partition (shuffles by
    shard, never a global sort); at 1000 executors each shard's rank
    computes where its rows live. The curation counterpart of
    ``DataFrame.orderBy(rand())``, which is neither stable across runs
    nor restatable in SQL (same contract as deterministic_split,
    textstats.py).
    """
    if n_shards < 1 or (65536 % n_shards) != 0:
        raise ValueError(
            f"n_shards must divide 65536 for an unbiased hex-prefix draw; "
            f"got {n_shards}")
    key = F.md5(F.concat_ws(
        ":", F.lit(seed), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 4), 16, 10).cast("int"),
        F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (
        df.select(F.col(id_col), key.alias("_skey"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )
