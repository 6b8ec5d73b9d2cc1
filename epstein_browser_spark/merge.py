"""Content-hash merge semantics (S6/S7/E8): the reference's incremental
re-index diff — skip unchanged / update changed / insert new / delete
missing (/root/reference/index_images.py:344-434) and content-hash
idempotent writes (:194-232) — expressed as one full-outer join.

On a real deployment this is Iceberg ``MERGE INTO`` (WHEN MATCHED AND
hash<>… UPDATE / WHEN NOT MATCHED INSERT / WHEN NOT MATCHED BY SOURCE
DELETE); this module computes the identical classification and new
snapshot with plain DataFrame ops so the semantics are testable without an
Iceberg runtime. The classification join broadcasts whichever side is
small; at scale both sides bucket on the key so the join is shuffle-free
against a bucketed target table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_ACTIONS = ["insert", "update", "skip", "delete"]


def classify_merge(
    target: DataFrame,
    source: DataFrame,
    key_col: str,
    hash_col: str,
) -> DataFrame:
    """Full-outer join on the key; per row emits ``merge_action``:
    insert (source only), delete (target only), update (hash differs),
    skip (hash equal) — exactly the reference's diff loop semantics."""
    t = target.select(
        F.col(key_col).alias("_k"), F.col(hash_col).alias("_t_hash")
    )
    s = source.select(
        F.col(key_col).alias("_k"), F.col(hash_col).alias("_s_hash")
    )
    j = t.join(s, "_k", "full_outer")
    action = (
        F.when(F.col("_t_hash").isNull(), "insert")
        .when(F.col("_s_hash").isNull(), "delete")
        .when(F.col("_t_hash") != F.col("_s_hash"), "update")
        .otherwise("skip")
    )
    return j.select(F.col("_k").alias(key_col), action.alias("merge_action"))


def merge_snapshot(
    target: DataFrame,
    source: DataFrame,
    key_col: str,
    hash_col: str,
) -> DataFrame:
    """New snapshot after the merge: source rows win on conflict, target
    rows missing from source are dropped (WHEN NOT MATCHED BY SOURCE
    DELETE). Equivalent to ``source`` by construction, but computed via the
    join so tests can assert the classification is consistent."""
    actions = classify_merge(target, source, key_col, hash_col)
    keep_keys = actions.filter(F.col("merge_action") != "delete").select(key_col)
    return source.join(keep_keys, key_col, "left_semi")
