"""Navigation windows (W1-W5) — semantics of /root/reference/app.py:691-760
re-expressed as window functions, asserted against a hand-computed fixture."""

import pandas as pd

from epstein_browser_spark.ordering import with_navigation, with_sequence_ids


def _fixture(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": pd.array([10, 20, 30, 1, 2], dtype="int32"),
            "text": ["t1", "t2", "t3", "u1", "u2"],
        }
    )
    return spark.createDataFrame(pdf)


def test_navigation_columns(spark):
    out = (
        with_navigation(_fixture(spark))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    a = out[out["conv_id"] == "a"].reset_index(drop=True)
    assert list(a["position"]) == [1, 2, 3]
    assert list(a["prev_turn_idx"].fillna(-1)) == [-1, 10, 20]
    assert list(a["next_turn_idx"].fillna(-1)) == [20, 30, -1]
    assert list(a["first_turn_idx"]) == [10, 10, 10]
    assert list(a["last_turn_idx"]) == [30, 30, 30]
    # progress = (pos-1)/(N-1)*100, the reference formula (app.py:756-760)
    assert list(a["progress_pct"]) == [0.0, 50.0, 100.0]
    b = out[out["conv_id"] == "b"].reset_index(drop=True)
    assert list(b["position"]) == [1, 2]
    assert list(b["progress_pct"]) == [0.0, 100.0]


def test_sequence_ids_stable_across_partitionings(spark):
    df = _fixture(spark)
    one = with_sequence_ids(df.repartition(1)).orderBy("conv_id", "turn_idx").toPandas()
    many = with_sequence_ids(df.repartition(7)).orderBy("conv_id", "turn_idx").toPandas()
    assert list(one["seq_id"]) == list(many["seq_id"]) == [1, 2, 3, 1, 2]
