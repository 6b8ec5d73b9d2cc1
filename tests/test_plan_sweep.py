"""Whole-surface plan hygiene: no query may plan a CartesianProduct or an
Exchange SinglePartition (the all-rows-to-one-task shapes). Catches any
future query or Spark-upgrade regression across the entire QUERIES
registry, not just the individually pinned plans in test_plans.py."""

import contextlib
import io

import pytest

from epstein_browser_spark.queries import QUERIES

SMELLS = ["CartesianProduct", "Exchange SinglePartition"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_plan_smells(spark, sf_dir, name):
    fn, _sql = QUERIES[name]
    df = fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    found = [s for s in SMELLS if s in plan]
    assert not found, f"{name} plans {found}:\n{plan[:2000]}"
