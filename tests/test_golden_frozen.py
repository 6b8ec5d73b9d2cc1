"""Frozen golden-fixture equality: the committed expected outputs in
tests/fixtures/golden_turns.json must keep matching the kernels byte-for-
byte (guards against silent semantic drift; regenerate deliberately with
tools/freeze_golden.py only when semantics are *meant* to change)."""

import json
import os

import pandas as pd

from epstein_browser_spark.core import extract_batch, quality_score_batch
from epstein_browser_spark.core import reference_oracle as ro

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_turns.json")


def test_frozen_goldens():
    with open(FIXTURE) as f:
        rows = json.load(f)
    assert len(rows) >= 100
    texts = pd.Series([r["text"] for r in rows], dtype=object)
    tools = pd.Series([r["tool"] for r in rows], dtype=object)
    ex = extract_batch(texts, tools)
    q = quality_score_batch(ex["clean_text"])
    for i, r in enumerate(rows):
        assert ex["clean_text"].iloc[i] == r["clean_text"], i
        assert list(map(int, ex["span_starts"].iloc[i])) == r["span_starts"], i
        assert list(map(int, ex["span_ends"].iloc[i])) == r["span_ends"], i
        assert list(ex["span_kinds"].iloc[i]) == r["span_kinds"], i
        assert bool(ex["parse_failed"].iloc[i]) == r["parse_failed"], i
        assert int(q["quality_score"].iloc[i]) == r["quality_score"], i
        assert q["quality_reason"].iloc[i] == r["quality_reason"], i
        assert ro.content_hash(r["clean_text"]) == r["content_hash"], i
