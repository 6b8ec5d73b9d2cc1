"""Freeze golden expected outputs for the extraction kernels.

Writes tests/fixtures/golden_turns.json: deterministic inputs covering
every content class + the expected extraction/quality outputs produced by
the CURRENT kernels (validated against core.reference_oracle at freeze
time). The frozen file guards against silent semantic drift in future
edits — the reference's golden-fixture equality model
(/root/reference/tests/unit/test_search_coverage.py:22-45).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from epstein_browser_spark.core import extract_batch, quality_score_batch
from epstein_browser_spark.core import reference_oracle as ro
from epstein_browser_spark.synth import make_transcripts_pdf

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_turns.json")


def main() -> None:
    df = make_transcripts_pdf(n_convs=12, hot_conv_turns=5)
    ex = extract_batch(df["text"], df["tool"])
    q = quality_score_batch(ex["clean_text"])
    rows = []
    for i in range(len(df)):
        clean = ex["clean_text"].iloc[i]
        # cross-check against the row-level oracle before freezing
        assert (int(q["quality_score"].iloc[i]), q["quality_reason"].iloc[i]) \
            == ro.quality_score(clean)
        rows.append(
            {
                "text": df["text"].iloc[i],
                "tool": df["tool"].iloc[i],
                "clean_text": clean,
                "span_starts": list(map(int, ex["span_starts"].iloc[i])),
                "span_ends": list(map(int, ex["span_ends"].iloc[i])),
                "span_kinds": list(ex["span_kinds"].iloc[i]),
                "parse_failed": bool(ex["parse_failed"].iloc[i]),
                "quality_score": int(q["quality_score"].iloc[i]),
                "quality_reason": q["quality_reason"].iloc[i],
                "content_hash": ro.content_hash(clean),
            }
        )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"froze {len(rows)} golden turns -> {OUT}")


if __name__ == "__main__":
    main()
