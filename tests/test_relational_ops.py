"""q126-q128 (ROLLUP / PIVOT / LEFT-SEMI): semantics + the plan shapes
the 100 TB story needs — rollup as ONE expand+shuffle, pivot without a
values-discovery scan, EXISTS planned as LeftSemi with the filter pushed
below the join."""

import contextlib
import io
import re

from epstein_browser_spark.queries import (
    q126_rollup_totals,
    q127_event_pivot,
    q128_big_spenders_semi,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_rollup_grouping_sets_semantics(spark, sf_dir):
    rows = q126_rollup_totals(spark, sf_dir).collect()
    detail = [r for r in rows if r["gid"] == 0]
    sub = {r["o_orderstatus"]: r for r in rows if r["gid"] == 1}
    grand = [r for r in rows if r["gid"] == 3]
    assert detail and sub and len(grand) == 1
    # subtotal rows blank the year, grand total blanks both
    assert all(r["yr"] is None for r in sub.values())
    assert grand[0]["o_orderstatus"] is None and grand[0]["yr"] is None
    # every level sums to the one above it — exact cents, no float drift
    for status, s in sub.items():
        mine = [r for r in detail if r["o_orderstatus"] == status]
        assert s["n_orders"] == sum(r["n_orders"] for r in mine)
        assert s["total_cents"] == sum(r["total_cents"] for r in mine)
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in sub.values())
    assert grand[0]["total_cents"] == sum(
        r["total_cents"] for r in sub.values()
    )


def test_rollup_is_one_shuffle(spark, sf_dir):
    plan = _plan(q126_rollup_totals(spark, sf_dir))
    assert "Expand" in plan  # grouping sets expand, not unioned rescans
    # one exchange for the agg (+ the orderBy range exchange), never one
    # scan per grouping set ("(N) Scan parquet" headers count physical
    # scans; the tree section repeats the label)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_pivot_explicit_values_no_discovery_scan(spark, sf_dir):
    plan = _plan(q127_event_pivot(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "props" not in m.group(1)  # pruned to user_id+event_type


def test_pivot_absent_cell_is_zero(spark, sf_dir):
    rows = q127_event_pivot(spark, sf_dir).collect()
    assert rows
    types = ["n_click", "n_error", "n_purchase", "n_signup", "n_view"]
    assert all(r[t] is not None and r[t] >= 0 for r in rows for t in types)
    # column split must re-sum to the user's event count
    from epstein_browser_spark.queries import _t
    import pyspark.sql.functions as F

    per_user = {
        r["user_id"]: r["n"]
        for r in _t(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert sum(r[t] for t in types) == per_user[r["user_id"]]


def test_semi_join_plan_and_no_duplication(spark, sf_dir):
    df = q128_big_spenders_semi(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    # the price filter reaches the orders scan
    assert re.search(r"PushedFilters: \[.*o_totalprice.*\]", plan)
    keys = [r["c_custkey"] for r in df.collect()]
    assert keys, "semi join must be non-vacuous"
    assert len(keys) == len(set(keys))  # EXISTS never duplicates


def test_gap_fill_dense_grid_and_ffill(spark, sf_dir):
    from epstein_browser_spark.queries import q129_gap_fill
    from datetime import datetime, timedelta

    rows = q129_gap_fill(spark, sf_dir).collect()
    assert rows
    # span starts at an observed hour => never NULL after forward fill
    assert all(r["value_micro"] is not None for r in rows)
    filled = [r for r in rows if r["is_filled"]]
    assert filled, "silent hours must exist on this corpus"
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        hours = [datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S") for r in rs]
        # contiguous hourly grid, first row observed, ffill semantics
        assert all(
            b - a == timedelta(hours=1) for a, b in zip(hours, hours[1:])
        )
        assert rs[0]["is_filled"] is False
        for prev, cur in zip(rs, rs[1:]):
            if cur["is_filled"]:
                assert cur["value_micro"] == prev["value_micro"]


def test_hopping_window_double_counts(spark, sf_dir):
    from epstein_browser_spark.queries import q130_hopping_window, _t

    rows = q130_hopping_window(spark, sf_dir).collect()
    total = _t(spark, sf_dir, "events").count()
    # every event lands in exactly two 2h/1h windows
    assert sum(r["n_events"] for r in rows) == 2 * total
    starts = [r["w_start"] for r in rows]
    assert starts == sorted(starts)


def test_bag_set_ops_match_direct_counts(spark, sf_dir):
    import pyspark.sql.functions as F
    from epstein_browser_spark.queries import q131_priority_bag_diff, _t

    o = _t(spark, sf_dir, "orders")
    c = {
        (r["y"], r["p"]): r["n"]
        for r in o.select(
            F.year("o_orderdate").alias("y"),
            F.col("o_orderpriority").alias("p"),
        )
        .groupBy("y", "p").agg(F.count("*").alias("n")).collect()
    }
    got = {r["o_orderpriority"]: r for r in
           q131_priority_bag_diff(spark, sf_dir).collect()}
    prios = {p for (y, p) in c if y in (1995, 1996)}
    assert set(got) == prios
    for p in prios:
        c95, c96 = c.get((1995, p), 0), c.get((1996, p), 0)
        assert got[p]["n_surplus"] == max(c95 - c96, 0)
        assert got[p]["n_common"] == min(c95, c96)


def test_json_props_poison_tolerated(spark, sf_dir):
    from epstein_browser_spark.queries import q132_json_props

    rows = q132_json_props(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_bad"] for r in rows) > 0          # poison planted
    assert sum(r["n_parsed"] for r in rows) > 0       # bulk parses
    for r in rows:
        assert r["n_parsed"] + r["n_bad"] == r["n_events"]
        assert r["k_min"] is not None and r["k_min"] <= r["k_max"]


def test_rolling_24h_matches_bruteforce(spark, sf_dir):
    from epstein_browser_spark.queries import q133_rolling_24h, _t
    import pyspark.sql.functions as F

    rows = q133_rolling_24h(spark, sf_dir).collect()
    raw = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 29 == 0)
        .select(
            "user_id", "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("mu"),
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("mv"),
        )
        .collect()
    )
    by_user = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append(r)
    idx = {(r["user_id"], r["event_id"]): r for r in raw}
    for out in rows[::17]:  # stride keeps the quadratic check fast
        me = idx[(out["user_id"], out["event_id"])]
        peers = [
            r for r in by_user[out["user_id"]]
            if me["mu"] - 86_400_000_000 <= r["mu"] <= me["mu"]
        ]
        assert out["n_24h"] == len(peers)
        assert out["mv_sum_24h"] == sum(r["mv"] for r in peers)


def test_role_sequence_flows_account_for_every_conv(spark, sf_dir):
    from epstein_browser_spark.queries import q134_role_sequence

    rows = q134_role_sequence(spark, sf_dir).collect()
    assert sum(r["n_convs"] for r in rows) == 50  # one flow per conv
    for r in rows:
        flow = r["role_flow"].split(">")
        assert len(flow) == r["n_turns"]
        assert flow[0] == "system"  # turn 0 is always the system prompt


def test_unpivot_roundtrips_pivot(spark, sf_dir):
    import pyspark.sql.functions as F
    from epstein_browser_spark.queries import (
        q127_event_pivot,
        q135_unpivot_activity,
        _t,
    )

    long = q135_unpivot_activity(spark, sf_dir)
    wide = q127_event_pivot(spark, sf_dir)
    # complete 5-type grid per user (this corpus has no zero cells —
    # every user emits every type — but the unpivot emits the full grid
    # by construction, which a plain groupBy could not)
    assert long.count() == wide.count() * 5
    per_user = long.groupBy("user_id").count().collect()
    assert all(r["count"] == 5 for r in per_user)
    # and the long form re-sums to the raw event count
    total = long.agg(F.sum("n_events")).collect()[0][0]
    assert total == _t(spark, sf_dir, "events").count()


def test_bag_set_ops_keep_one_sided_values(spark, tmp_path):
    """A priority present ONLY in 1996 must still report (p, 0, 0) — the
    full-join-of-aggregates form silently dropped it (review finding)."""
    import os

    import pandas as pd
    from epstein_browser_spark.queries import q131_priority_bag_diff

    pdf = pd.DataFrame(
        {
            "o_orderkey": range(5),
            "o_custkey": [1] * 5,
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [10.0] * 5,
            "o_orderdate": pd.to_datetime(
                ["1995-06-01", "1995-06-02", "1996-06-01", "1996-06-02",
                 "1996-06-03"]
            ),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT",
                                "5-LOW", "5-LOW"],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "orders.parquet"))
    got = {r["o_orderpriority"]: r for r in
           q131_priority_bag_diff(spark, d).collect()}
    assert got["1-URGENT"]["n_surplus"] == 1   # 2 in '95 vs 1 in '96
    assert got["1-URGENT"]["n_common"] == 1
    assert got["5-LOW"]["n_surplus"] == 0      # 1996-only: kept, zeroed
    assert got["5-LOW"]["n_common"] == 0


def test_datacard_branches_real_and_conserved(spark, sf_dir):
    from epstein_browser_spark.queries import q136_source_datacard

    rows = q136_source_datacard(spark, sf_dir).collect()
    assert rows
    # every gate fires somewhere — each has its own plant (%13 quality,
    # %17 dup, %19 safety), so this holds on ANY regenerated corpus
    assert sum(r["n_quality_drop"] for r in rows) > 0
    assert sum(r["n_safety_drop"] for r in rows) > 0
    assert sum(r["n_exact_dup"] for r in rows) > 0
    for r in rows:
        for c in ("n_quality_drop", "n_safety_drop", "n_exact_dup"):
            assert 0 <= r[c] <= r["n_docs"]
        assert r["quality_drop_permille"] == (1000 * r["n_quality_drop"]) // r["n_docs"]
        assert r["n_langs"] >= 1
        assert r["n_tokens"] > 0


def test_length_quartiles_equal_height_and_cdf(spark, sf_dir):
    from epstein_browser_spark.queries import q137_length_quartiles

    rows = q137_length_quartiles(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r["quartile"])
        assert [r["quartile"] for r in rs] == [1, 2, 3, 4]
        # equal-height: bucket sizes differ by at most 1
        sizes = [r["n_docs"] for r in rs]
        assert max(sizes) - min(sizes) <= 1
        # quartile length ranges are non-decreasing across buckets
        for a, b in zip(rs, rs[1:]):
            assert a["len_max"] <= b["len_min"]
        # CDF tops the group at exactly 1.0
        assert rs[-1]["cume_dist_top"] == 1.0
