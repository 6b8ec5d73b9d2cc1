"""Unit tests for the late-round-5 operators: boilerplate-strip rewrite,
token entropy, centroid-trick diversity, turn-integrity gate.

Each also has a full DuckDB value oracle (q101-q104); these pin the
semantic guarantees the oracles can't express — the partial-tail
keep rule, the entropy extremes, the centroid identity vs an explicit
pair loop, the defect taxonomy — against hand computations on tiny
inputs, plus layout invariance.
"""

import hashlib
import math

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark import convstats, similarity, textstats


# ---------------------------------------------------------------------------
# strip_boilerplate
# ---------------------------------------------------------------------------

_BP = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # the shared 10-token segment


def _bp_docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                # bp segment + unique full segment + 3-token tail
                _BP + " u0a u0b u0c u0d u0e u0f u0g u0h u0i u0j t0 t1 t2",
                # bp segment only
                _BP,
                # unique full segment + bp segment (order flipped)
                "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9 " + _BP,
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_strip_boilerplate_hand_case(spark):
    out = (
        textstats.strip_boilerplate(_bp_docs(spark))
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    # doc 0: 3 segments (bp, unique, 3-token tail); bp dropped
    assert out.loc[0, "n_segs"] == 3
    assert out.loc[0, "n_dropped"] == 1
    clean0 = "u0a u0b u0c u0d u0e u0f u0g u0h u0i u0j t0 t1 t2"
    assert out.loc[0, "clean_md5"] == hashlib.md5(clean0.encode()).hexdigest()
    assert out.loc[0, "chars_after"] == len(clean0)
    # doc 1: the whole doc IS the boilerplate -> cleaned empty
    assert out.loc[1, "n_dropped"] == 1
    assert out.loc[1, "chars_after"] == 0
    assert out.loc[1, "clean_md5"] == hashlib.md5(b"").hexdigest()
    # doc 2: segment ORDER preserved in the rewrite
    clean2 = "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"
    assert out.loc[2, "clean_md5"] == hashlib.md5(clean2.encode()).hexdigest()


def test_strip_boilerplate_partial_tail_never_censused(spark):
    # two docs END with the same 5-token tail; tails are partial segments
    # so they never enter the census and are always kept
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 z1 z2 z3 z4 z5",
                "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 z1 z2 z3 z4 z5",
            ],
        }
    )
    out = (
        textstats.strip_boilerplate(spark.createDataFrame(pdf))
        .toPandas()
    )
    assert (out["n_dropped"] == 0).all()
    assert (out["chars_after"] == out["chars_before"]).all()


def test_strip_boilerplate_layout_invariant(spark):
    d = _bp_docs(spark)
    a = textstats.strip_boilerplate(d).toPandas().sort_values("id")
    b = (
        textstats.strip_boilerplate(d.repartition(7, "text"))
        .toPandas()
        .sort_values("id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_hand_case(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a a b",            # H = ln3 - (2 ln2)/3
                "x x x x",          # degenerate -> 0
                "p q r s",          # all distinct -> ln4, norm exactly 1.0
            ],
        }
    )
    out = (
        textstats.token_entropy(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    s0 = 2 * round(math.log(2) * 1e6)
    h0 = round(math.log(3) * 1e6) - round(s0 / 3)
    assert out.loc[0, "h_micro"] == h0
    assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "n_distinct"] == 2
    assert out.loc[1, "h_micro"] == 0
    assert out.loc[1, "norm_entropy"] == 0.0
    assert out.loc[2, "h_micro"] == round(math.log(4) * 1e6)
    assert out.loc[2, "norm_entropy"] == 1.0


def test_token_entropy_single_token_defines_zero(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": ["lonely"]})
    out = textstats.token_entropy(spark.createDataFrame(pdf)).toPandas()
    assert out.loc[0, "h_micro"] == 0
    assert out.loc[0, "norm_entropy"] == 0.0


# ---------------------------------------------------------------------------
# centroid_diversity
# ---------------------------------------------------------------------------


def test_centroid_diversity_extremes(spark):
    pdf = pd.DataFrame(
        {
            "label": [0, 0, 0, 1, 1],
            "embedding": [
                [1.0, 0.0], [1.0, 0.0], [1.0, 0.0],   # identical -> cos 1
                [1.0, 0.0], [0.0, 1.0],               # orthogonal -> cos 0
            ],
        }
    )
    out = (
        similarity.centroid_diversity(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    assert out.loc[0, "n_vecs"] == 3
    assert out.loc[0, "mean_cos"] == 1.0
    assert out.loc[0, "diversity"] == 0.0
    assert out.loc[1, "mean_cos"] == 0.0
    assert out.loc[1, "diversity"] == 1.0


def test_centroid_identity_matches_pair_loop(spark):
    # deterministic non-trivial vectors; the centroid-trick result must
    # match the explicit O(n^2) mean pairwise cosine of the SAME
    # quantized unit vectors (exact, not approximate)
    vecs = [
        [0.3, -0.4, 0.5],
        [0.1, 0.9, -0.2],
        [-0.7, 0.2, 0.2],
        [0.5, 0.5, 0.5],
    ]

    def unit_q(v):
        q = [round(x * 1e6) for x in v]
        s = math.sqrt(sum(x * x for x in q))
        return [round(x / s * 1e6) for x in q]

    nus = [unit_q(v) for v in vecs]
    n = len(nus)
    dots = [
        sum(a * b for a, b in zip(nus[i], nus[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    ]
    expected = round(sum(dots) / (n * (n - 1)) / 1e12, 6)

    pdf = pd.DataFrame({"label": [7] * n, "embedding": vecs})
    out = similarity.centroid_diversity(spark.createDataFrame(pdf)).toPandas()
    assert out.loc[0, "mean_cos"] == expected


def test_centroid_diversity_skips_zero_vectors_and_singletons(spark):
    pdf = pd.DataFrame(
        {
            "label": [0, 0, 1],
            "embedding": [[0.0, 0.0], [1.0, 0.0], [0.2, 0.1]],
        }
    )
    out = (
        similarity.centroid_diversity(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    # the zero vector is excluded, leaving label 0 a singleton
    assert out.loc[0, "n_vecs"] == 1 and out.loc[0, "mean_cos"] == 0.0
    assert out.loc[1, "n_vecs"] == 1


# ---------------------------------------------------------------------------
# turn_integrity
# ---------------------------------------------------------------------------


def _integrity_df(spark):
    rows = [
        # clean conversation
        ("ok", 0, "2024-01-01 00:00:00"),
        ("ok", 1, "2024-01-01 00:10:00"),
        ("ok", 2, "2024-01-01 00:20:00"),
        # duplicate idx 1 (double delivery), hole at idx 2, ts regression
        ("bad", 0, "2024-01-01 00:00:00"),
        ("bad", 1, "2024-01-01 00:10:00"),
        ("bad", 1, "2024-01-01 00:11:00"),
        ("bad", 3, "2024-01-01 00:05:00"),  # ts < previous turn's ts
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    return spark.createDataFrame(pdf).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_turn_integrity_defect_taxonomy(spark):
    out = (
        convstats.turn_integrity(_integrity_df(spark))
        .toPandas()
        .set_index("conv_id")
    )
    ok = out.loc["ok"]
    assert ok["n_dup_idx"] == 0 and ok["n_missing_idx"] == 0
    assert ok["n_ts_regress"] == 0 and bool(ok["is_valid"])
    bad = out.loc["bad"]
    assert bad["n_turns"] == 4
    assert bad["n_dup_idx"] == 1      # idx 1 delivered twice
    assert bad["n_missing_idx"] == 1  # idx 2 never arrived
    assert bad["n_ts_regress"] == 1   # idx 3 precedes idx 1's ts
    assert not bool(bad["is_valid"])


def test_turn_integrity_layout_invariant(spark):
    d = _integrity_df(spark)
    a = convstats.turn_integrity(d).toPandas().sort_values("conv_id")
    b = (
        convstats.turn_integrity(d.repartition(5, "ts"))
        .toPandas()
        .sort_values("conv_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
