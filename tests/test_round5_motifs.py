"""Round-5 closing debuts q138-q143: graph motifs (triangles), edit-distance
near-dup, SCD2 state intervals, market-basket rules, chi-squared contingency,
and interval coalescing. Cross-engine value equality is pinned registry-wide
by tests/test_queries_oracle.py; these tests pin the SEMANTICS (hand graphs
with known motif counts, planted near-dup pairs, half-open interval
contracts, the running-max swallow case)."""

import itertools

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import graph
from epstein_browser_spark.queries import (
    q138_link_triangles,
    q139_edit_near_dups,
    q140_scd2_state,
    q141_basket_rules,
    q142_chi2_contingency,
    q143_interval_coalesce,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# ---------------------------------------------------------------- q138


def test_triangle_stats_complete_graph(spark):
    """K4: every node sits in C(3,2)=3 triangles, clustering exactly 1."""
    k4 = _edges(spark, [(a, b) for a, b in
                        itertools.combinations("abcd", 2)])
    got = {r["node"]: r for r in graph.triangle_stats(k4).collect()}
    assert set(got) == set("abcd")
    for r in got.values():
        assert (r["degree"], r["n_triangles"], r["clustering_permille"]) \
            == (3, 3, 1000)


def test_triangle_stats_star_has_none(spark):
    """A star (the link-farm shape): high hub degree, zero triangles."""
    star = _edges(spark, [("hub", f"leaf{i}") for i in range(5)])
    got = {r["node"]: r for r in graph.triangle_stats(star).collect()}
    assert got["hub"]["degree"] == 5
    assert all(r["n_triangles"] == 0 for r in got.values())
    assert all(r["clustering_permille"] == 0 for r in got.values())


def test_triangle_stats_collapses_dups_reverses_and_self_loops(spark):
    """Duplicate, reversed, and self-loop edges must not inflate counts."""
    messy = _edges(spark, [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("a", "c"), ("c", "c"),
    ])
    got = {r["node"]: r for r in graph.triangle_stats(messy).collect()}
    assert all(r["n_triangles"] == 1 for r in got.values())
    assert got["a"]["degree"] == 2


def test_q138_matches_brute_force(spark, sf_dir):
    got = {r["node"]: r for r in q138_link_triangles(spark, sf_dir).collect()}
    # brute-force the same (small) undirected graph driver-side, from the
    # ONE shared edge definition (q123's graph by construction)
    from epstein_browser_spark.queries import _link_graph_edges

    e = _link_graph_edges(spark, sf_dir).collect()
    und = {tuple(sorted((r["src"], r["dst"]))) for r in e}
    nodes = sorted({x for p in und for x in p})
    tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if {(x, y), (y, z), (x, z)} <= und:
            for n in (x, y, z):
                tri[n] += 1
    assert {n: r["n_triangles"] for n, r in got.items()} == tri
    assert sum(tri.values()) % 3 == 0 and sum(tri.values()) > 0


# ---------------------------------------------------------------- q139


def test_q139_planted_pairs_all_found(spark, sf_dir):
    got = q139_edit_near_dups(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["dist"] for r in got}
    from epstein_browser_spark.queries import _t

    planted = [r["doc_id"] for r in
               _t(spark, sf_dir, "documents")
               .filter((F.col("doc_id") % 37 == 4)
                       & F.col("text").rlike("^[\\x00-\\x7F]*$"))
               .collect()]
    assert planted, "corpus must contain planted ids"
    for d in planted:
        # variant lives at -d-1 (collision-free at any corpus size);
        # ' x' suffix = 2 edits
        assert pairs.get((-d - 1, d)) == 2
    assert all(1 <= v <= 3 for v in pairs.values())
    assert all(a < b for a, b in pairs)


# ---------------------------------------------------------------- q140


SENTINEL = 9_223_372_036_854_775_807


def test_q140_half_open_interval_contract(spark, sf_dir):
    import pandas as pd

    got = q140_scd2_state(spark, sf_dir).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("version").reset_index(drop=True)
        # versions are the dense 1..n SCD2 ordinals
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # half-open chain: every valid_to is the NEXT valid_from
        assert (g["valid_to_us"].iloc[:-1].values
                == g["valid_from_us"].iloc[1:].values).all()
        assert g["valid_to_us"].iloc[-1] == SENTINEL
        assert int(g["is_current"].sum()) == 1 and bool(
            g["is_current"].iloc[-1])
        # run-length encoding: adjacent states always differ
        assert (g["state"].iloc[:-1].values
                != g["state"].iloc[1:].values).all()
    from epstein_browser_spark.queries import _t

    assert int(got["n_events"].sum()) == _t(spark, sf_dir, "events").count()


def test_q140_hand_corpus_runs(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 0.0, ""),
        (2, "2024-01-01 00:10:00", 7, "view", 0.0, ""),
        (3, "2024-01-01 00:20:00", 7, "click", 0.0, ""),
        (4, "2024-01-01 00:30:00", 7, "view", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = (q140_scd2_state(spark, str(tmp_path)).toPandas()
           .sort_values("version").reset_index(drop=True))
    assert list(got["version"]) == [1, 2, 3]
    assert list(got["state"]) == ["view", "click", "view"]
    assert list(got["n_events"]) == [2, 1, 1]
    assert got["valid_to_us"][0] == got["valid_from_us"][1]
    assert list(got["is_current"]) == [False, False, True]


# ---------------------------------------------------------------- q141


def test_q141_association_invariants(spark, sf_dir):
    got = q141_basket_rules(spark, sf_dir).collect()
    assert got, "event corpus co-occurs"
    for r in got:
        assert r["item_a"] < r["item_b"]
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["support_permille"] <= r["conf_a_to_b_permille"]
        assert r["support_permille"] <= r["conf_b_to_a_permille"]
        assert 0 <= r["support_permille"] <= 1000
        assert r["n_baskets"] >= max(r["n_a"], r["n_b"])


def test_q141_hand_corpus_exact(spark, tmp_path):
    # 3 baskets: {a,b}, {a,b}, {a}  => n_a=3, n_b=2, n_ab=2
    rows = [
        (1, "2024-01-01 01:00:00", 1, "click", 0.0, ""),
        (2, "2024-01-01 02:00:00", 1, "view", 0.0, ""),
        (3, "2024-01-02 01:00:00", 1, "click", 0.0, ""),
        (4, "2024-01-02 02:00:00", 1, "view", 0.0, ""),
        (5, "2024-01-01 01:00:00", 2, "click", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = q141_basket_rules(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"]) == ("click", "view")
    assert (r["n_a"], r["n_b"], r["n_ab"], r["n_baskets"]) == (3, 2, 2, 3)
    assert r["support_permille"] == 666       # 2000 // 3
    assert r["conf_a_to_b_permille"] == 666   # 2000 // 3
    assert r["conf_b_to_a_permille"] == 1000  # 2000 // 2
    # lift = n_ab*N/(n_a*n_b) = 6/6 = 1.0; the overflow-safe two-step
    # floors the inner division ((1e6*2)//3 = 666666), giving 999 milli —
    # the deliberate quantization documented in the q141 docstring.
    assert r["lift_milli"] == 999


# ---------------------------------------------------------------- q142


def test_q142_contingency_invariants(spark, sf_dir):
    from epstein_browser_spark.queries import _t

    got = q142_chi2_contingency(spark, sf_dir).toPandas()
    assert int(got["n_obs"].sum()) == _t(spark, sf_dir, "documents").count()
    assert (got["expected_micro"] >= 0).all()
    assert (got["chi2_contrib"] >= 0).all()
    # floored-to-zero expected cells must report chi2 0.0, never Inf
    zero = got[got["expected_micro"] == 0]
    assert (zero["chi2_contrib"] == 0.0).all()
    import numpy as np

    assert np.isfinite(got["chi2_contrib"]).all()
    assert (got["dev_micro"]
            == 1_000_000 * got["n_obs"] - got["expected_micro"]).all()


# ---------------------------------------------------------------- q143


def test_q143_census_bounds(spark, sf_dir):
    from epstein_browser_spark.queries import _t

    got = q143_interval_coalesce(spark, sf_dir).toPandas()
    e = _t(spark, sf_dir, "events")
    per_user = {r["user_id"]: r["n"] for r in
                e.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert {int(u) for u in got["user_id"]} == set(per_user)
    for _, r in got.iterrows():
        assert r["n_intervals"] <= r["n_events"] == per_user[r["user_id"]]
        # covered by at least one lease, at most the sum of max leases
        assert 900_000_000 <= r["covered_us"] \
            <= r["n_events"] * 7_200_000_000


def test_q143_long_lease_swallows_later_starts(spark, tmp_path):
    """The running-max pin: an early 2h error lease swallows two later
    15-minute leases; a lag-gap islander would split after the first
    (00:20's lease ends 00:35 < 01:00 start) — coalescing must not."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "error", 0.0, ""),   # [0, 2h)
        (2, "2024-01-01 00:20:00", 7, "view", 0.0, ""),    # [20m, 35m)
        (3, "2024-01-01 01:00:00", 7, "view", 0.0, ""),    # [1h, 1h15)
        (4, "2024-01-01 05:00:00", 7, "view", 0.0, ""),    # separate
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = q143_interval_coalesce(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 4
    assert r["n_intervals"] == 2
    # [00:00, 02:00) + [05:00, 05:15) = 2h + 15m
    assert r["covered_us"] == 7_200_000_000 + 900_000_000
