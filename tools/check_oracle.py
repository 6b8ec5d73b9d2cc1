"""Local mirror of the driver's correctness gate: run each queries() entry
in Spark AND its oracle_sql() in DuckDB at a given sf dir, compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from epstein_browser_spark.queries import QUERIES
    from epstein_browser_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL-SPARK] {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"[ROWS-ONLY] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL-DUCK] {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append(name)
            print(f"[FAIL-COLS] {name}: spark={sorted(got.columns)} "
                  f"duck={sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"[FAIL-COUNT] {name}: spark={len(got)} duck={len(exp)}")
            continue
        g, e = _normalize(got), _normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=False, atol=1e-9)
            print(f"[OK] {name}: {len(got)} rows")
        except AssertionError as err:
            failures.append(name)
            diff = (g != e).any(axis=1) if g.shape == e.shape else None
            print(f"[FAIL-VALUES] {name}: {str(err).splitlines()[0][:200]}")
            if diff is not None and diff.any():
                i = diff.idxmax()
                print("  first diff row spark:", g.loc[i].to_dict())
                print("  first diff row duck :", e.loc[i].to_dict())
    spark.stop()
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
