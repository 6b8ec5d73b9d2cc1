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
