"""graph.pagerank: integer-exact PageRank vs a pure-Python mirror of the
recurrence, plus the q124/q125 event-analytics semantic pins."""

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark.graph import pagerank


def _py_pagerank(edges, iters=5, damping=850, unit=1_000_000):
    """The recurrence, restated independently in pure Python."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = unit * (1000 - damping) // 1000
    r = {n: unit for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for s, d in edges:
            m[d] += r[s] // deg[s]
        r = {n: base + (damping * m[n]) // 1000 for n in nodes}
    return r


CYCLE = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
STAR = [("hub", x) for x in ("a", "b", "c")] + [("a", "hub"), ("b", "hub")]
CHAIN_WITH_SINK = [("a", "b"), ("b", "c"), ("c", "sink"), ("a", "c")]


@pytest.mark.parametrize("edges", [CYCLE, STAR, CHAIN_WITH_SINK])
def test_pagerank_matches_python_mirror(spark, edges):
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]), iters=5
        ).collect()
    }
    assert got == _py_pagerank(edges, iters=5)


def test_pagerank_rounds_matter(spark):
    """On a cyclic graph the 5-round value differs from 1-round — the
    oracle really pins the whole loop, not a single propagation."""
    df = spark.createDataFrame(CYCLE, ["src", "dst"])
    r1 = {r["node"]: r["rank_micro"] for r in pagerank(df, iters=1).collect()}
    r5 = {r["node"]: r["rank_micro"] for r in pagerank(df, iters=5).collect()}
    assert r1 != r5
    assert r5 == _py_pagerank(CYCLE, iters=5)


def test_pagerank_partitioning_invariance(spark):
    df2 = spark.createDataFrame(CHAIN_WITH_SINK, ["src", "dst"]).repartition(2)
    df7 = spark.createDataFrame(CHAIN_WITH_SINK, ["src", "dst"]).repartition(7)
    a = sorted(map(tuple, pagerank(df2).collect()))
    b = sorted(map(tuple, pagerank(df7).collect()))
    assert a == b


def test_pagerank_dangling_sink_keeps_base_inflow(spark):
    """A pure sink still accumulates in-flow; pure sources sit at the
    base-rank floor (150000 at the defaults)."""
    r = {
        x["node"]: x["rank_micro"]
        for x in pagerank(
            spark.createDataFrame([("src", "sink")], ["src", "dst"])
        ).collect()
    }
    assert r["src"] == 150_000
    assert r["sink"] == 150_000 + (850 * 150_000) // 1000


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame(CYCLE, ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_permille=1001)


def test_q124_offset_zero_is_full_cohort(spark, sf_dir):
    from epstein_browser_spark.queries import QUERIES

    rows = QUERIES["q124_retention_cohorts"][0](spark, sf_dir).collect()
    assert rows, "retention must be non-vacuous"
    zero = [r for r in rows if r["day_offset"] == 0]
    assert zero, "every cohort has an offset-0 row"
    for r in zero:
        assert r["n_active"] == r["n_cohort"]
        assert r["retention_permille"] == 1000
    # monotone containment is NOT required (activity fluctuates), but
    # retention can never exceed the cohort
    assert all(r["n_active"] <= r["n_cohort"] for r in rows)


def test_q125_funnel_stage_order(spark, sf_dir):
    from epstein_browser_spark.queries import QUERIES

    row = QUERIES["q125_session_funnel"][0](spark, sf_dir).collect()[0]
    # attrition: each stage is a subset of the previous one
    assert row["n_sessions"] >= row["n_reached_view"]
    assert row["n_reached_view"] >= row["n_reached_click"]
    assert row["n_reached_click"] >= row["n_reached_purchase"]
    # non-vacuous at every stage (the q09 rule)
    assert row["n_reached_purchase"] > 0


def test_q125_purchase_before_view_never_counts(spark, tmp_path):
    """Hand corpus: u1 purchases BEFORE viewing (doesn't count), u2 runs
    the full ordered funnel, u3 clicks with no view (doesn't count)."""
    import os

    from epstein_browser_spark.queries import q125_session_funnel

    rows = [
        (1, "2024-01-01 10:00:00", 10, "purchase", 1.0, ""),
        (2, "2024-01-01 10:05:00", 10, "view", 1.0, ""),
        (3, "2024-01-02 09:00:00", 20, "view", 1.0, ""),
        (4, "2024-01-02 09:01:00", 20, "click", 1.0, ""),
        (5, "2024-01-02 09:02:00", 20, "purchase", 1.0, ""),
        (6, "2024-01-03 08:00:00", 30, "click", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    row = q125_session_funnel(spark, d).collect()[0]
    assert row["n_sessions"] == 3
    assert row["n_reached_view"] == 2       # u1, u2
    assert row["n_reached_click"] == 1      # u2 only
    assert row["n_reached_purchase"] == 1   # u2 only
    assert row["click_permille"] == 500
    assert row["purchase_permille"] == 1000


# ---------------------------------------------------------------------------
# tree_closure (pointer doubling)
# ---------------------------------------------------------------------------

from epstein_browser_spark.graph import tree_closure  # noqa: E402


def _closure_brute(parent):
    """Pure-Python ancestor walk: node -> (root, depth)."""
    out = {}
    for n in parent:
        d, cur = 0, n
        while parent[cur] is not None:
            cur = parent[cur]
            d += 1
        out[n] = (cur, d)
    return out


def _closure_run(spark, parent):
    df = spark.createDataFrame(
        [(n, p) for n, p in parent.items()], "node bigint, parent bigint"
    )
    got = tree_closure(df, "node", "parent").collect()
    return {r["node"]: (r["root"], r["depth"]) for r in got}


@pytest.mark.parametrize(
    "parent",
    [
        # two-tree forest with branching
        {1: None, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 10: None, 11: 10},
        # deep chain (depth 37): needs ceil(log2 37) = 6 doubling rounds
        {0: None, **{i: i - 1 for i in range(1, 38)}},
        # all roots (zero rounds of work)
        {i: None for i in range(5)},
        # single node
        {42: None},
    ],
)
def test_tree_closure_matches_python_walk(spark, parent):
    assert _closure_run(spark, parent) == _closure_brute(parent)


def test_tree_closure_detects_cycles(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "node bigint, parent bigint"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        tree_closure(df, "node", "parent", max_rounds=6)


def test_tree_closure_partition_invariance(spark):
    parent = {0: None, **{i: (i - 1) // 2 for i in range(1, 64)}}
    df = spark.createDataFrame(
        [(n, p) for n, p in parent.items()], "node bigint, parent bigint"
    )
    one = {
        r["node"]: (r["root"], r["depth"])
        for r in tree_closure(df.coalesce(1), "node", "parent").collect()
    }
    many = {
        r["node"]: (r["root"], r["depth"])
        for r in tree_closure(
            df.repartition(5), "node", "parent"
        ).collect()
    }
    assert one == many == _closure_brute(parent)


def test_tree_closure_settles_on_exact_round_budget(spark):
    """A depth-4 chain needs exactly ceil(log2 4) = 2 doubling joins;
    max_rounds=2 must therefore SUCCEED (settlement is re-checked after
    the final join, not only before it)."""
    parent = {0: None, 1: 0, 2: 1, 3: 2, 4: 3}
    df = spark.createDataFrame(
        [(n, p) for n, p in parent.items()], "node bigint, parent bigint"
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in tree_closure(df, "node", "parent", max_rounds=2).collect()
    }
    assert got == _closure_brute(parent)


def test_tree_closure_rejects_dangling_parent(spark):
    """A parent referencing a node absent from the input raises up
    front instead of silently dropping the subtree."""
    df = spark.createDataFrame(
        [(1, None), (2, 5)], "node bigint, parent bigint"
    )
    with pytest.raises(ValueError, match="absent"):
        tree_closure(df, "node", "parent")


def test_tree_closure_self_loop_is_a_cycle_not_a_root(spark):
    """parent == node is a 1-cycle: it must hit the cycle error, not be
    misreported as a settled root with depth 1."""
    df = spark.createDataFrame(
        [(1, None), (7, 7)], "node bigint, parent bigint"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        tree_closure(df, "node", "parent", max_rounds=5)
