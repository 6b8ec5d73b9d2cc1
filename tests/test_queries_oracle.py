"""The driver's correctness gate, in-miniature: every queries() entry with
an oracle must match DuckDB at sf0.001 (row count, columns, values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from epstein_browser_spark.queries import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_QUERIES = [n for n, (_f, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [n for n, (_f, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = QUERIES[name]
    got = fn(spark, sf_dir).toPandas()
    exp = duck.sql(sql).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(exp), check_dtype=False,
        check_exact=False, atol=1e-9,
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
