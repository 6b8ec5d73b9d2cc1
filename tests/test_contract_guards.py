"""Contract-drift guards: the UDF output frame must match EXTRACT_SCHEMA
column-for-column, every queries() entry must be callable with the driver
signature, and every oracle key must have a query."""

import pandas as pd

import __spark_entry__ as entry_mod
from epstein_browser_spark.udfs import EXTRACT_SCHEMA, extract_pdf_batch


def test_udf_output_matches_schema_columns():
    ddl_cols = [c.strip().split(" ")[0] for c in EXTRACT_SCHEMA.split(",")]
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["u"], "text": ["some ordinary sentence of text"],
            "tool": pd.array([None], dtype=object), "ts_us": [0],
        }
    )
    out = extract_pdf_batch(pdf)
    assert list(out.columns) == ddl_cols


def test_driver_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 39
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 34
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_session_master_parse_forms():
    """Shuffle-partition inference handles every legal bracketed master:
    plain N, '*' (real core count), N,maxFailures, local-cluster."""
    import inspect
    import os

    from epstein_browser_spark import session

    src = inspect.getsource(session.get_spark)
    # pure-logic check without building sessions: replicate the parse
    def infer(master, cpus=32):
        n = master[master.find("[") + 1: master.find("]")] if "[" in master else ""
        n = n.split(",")[0].strip()
        if n == "*":
            return os.cpu_count() or cpus
        return int(n) if n.isdigit() else cpus

    assert infer("local[4]") == 4
    assert infer("local[4,2]") == 4
    assert infer("local-cluster[2,1,1024]") == 2
    assert infer("local[*]") == (os.cpu_count() or 32)
    assert infer("spark://host:7077") == 32
    # and the real source carries the comma-split guard
    assert 'split(",")' in src
