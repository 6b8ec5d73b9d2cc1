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


def _kind(dtype) -> str:
    """Dtype KIND the driver's value hash is sensitive to: int64 renders
    `6` while float64 renders `6.0`, so an int column on one engine and a
    float column on the other hash-mismatches even when every value is
    numerically equal (the q59/q69/q73 r4 failure). Width within a kind
    (int32 vs int64) renders identically and is fine."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if str(dtype).startswith("decimal") or dtype == object:
        return "object"
    return str(dtype)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-hash fidelity: every cell becomes the exact repr the dtype
    renders — NO float rounding, NO cross-kind coercion. A value that
    would hash differently at the driver must compare unequal here."""
    pdf = pdf[sorted(pdf.columns)].copy()
    out = {}
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_float_dtype(col.dtype):
            out[c] = col.map(lambda v: "NaN" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(col.dtype):
            out[c] = col.map(lambda v: "NaN" if pd.isna(v) else str(int(v)))
        elif pd.api.types.is_bool_dtype(col.dtype):
            out[c] = col.map(lambda v: "NaN" if pd.isna(v) else str(bool(v)))
        else:
            out[c] = col.astype(str)
    res = pd.DataFrame(out)
    return res.sort_values(list(res.columns)).reset_index(drop=True)


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
        kind_mismatch = [
            (c, _kind(got[c].dtype), _kind(exp[c].dtype))
            for c in sorted(got.columns)
            if _kind(got[c].dtype) != _kind(exp[c].dtype)
        ]
        if kind_mismatch:
            failures.append(name)
            print(f"[FAIL-DTYPE] {name}: "
                  + "; ".join(f"{c}: spark={gk} duck={ek}"
                              for c, gk, ek in kind_mismatch))
            continue
        g, e = _normalize(got), _normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e)
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
