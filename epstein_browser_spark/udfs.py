"""Arrow-batched UDF layer: wraps the pandas core for Spark execution.

The extraction stage is a ``mapInPandas`` iterator transform — one Python
worker per task, Arrow batches in/out, vectorized pandas inside, no per-row
Python at the Spark boundary. This replaces the reference's serial
row-at-a-time loop with subprocess-per-record engines
(/root/reference/ocr_processor.py:170-241, ocr_processor_lite.py:62-85).

Retry semantics (bounded re-extraction, E6): rows whose quality_score == 0
are re-parsed with fallback modes — attempt 2 re-parses the raw payload as
plain text, attempt 3 strips binary/control characters first — capped at
MAX_ATTEMPTS=3 total passes, mirroring the reference's rescan budget
(/root/reference/helpers/error_detection.py:44,315-380: delete output,
bump ocr_rescan_attempts, re-drive, give up at 3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from epstein_browser_spark.core.extract import extract_batch
from epstein_browser_spark.core.quality import assess_batch

MAX_ATTEMPTS = 3  # /root/reference/helpers/error_detection.py:44

_BINARY_STRIP_RE = r"[\x00-\x1f␦\\{}|~`^\[\]]"

# Spark DDL for the extraction output (input cols + derived cols).
# content_hash is added JVM-side with F.md5 (no reason to hash in Python).
# ts crosses the Python boundary as epoch micros (bigint): Arrow<->pandas
# timestamp conversion costs more than the integer round-trip, and the
# kernel never touches it. Spans cross as three flat arrays and are zipped
# into array<struct<start,end,kind>> JVM-side (list-of-dict serialization
# is as expensive as the extraction itself).
EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, ts_us bigint, "
    "clean_text string, "
    "span_starts array<int>, span_ends array<int>, span_kinds array<string>, "
    "quality_score int, quality_reason string, "
    "is_low_quality boolean, lq_reason string, lq_confidence double, "
    "parse_failed boolean, attempts int, "
    "chars_in bigint, chars_out bigint, boilerplate_ratio double"
)

_OUT_COLS = [c.split(" ")[0] for c in EXTRACT_SCHEMA.split(", ")]


def extract_pdf_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract one pandas batch of transcript turns (all modes + retries)."""
    n = len(pdf)
    pdf = pdf.reset_index(drop=True)
    res = extract_batch(pdf["text"], pdf["tool"])
    res = pd.concat([res, assess_batch(res["clean_text"])], axis=1)
    attempts = pd.Series(1, index=res.index, dtype="int32")

    for attempt in (2, 3):
        failed = res["quality_score"] == 0
        # attempt 2 only helps rows that had a structured parse mode;
        # attempt 3 (binary strip) can help any failed row
        if attempt == 2:
            failed &= pdf["tool"].fillna("").isin(["spans", "html", "pdf"])
        if not failed.any():
            # continue, never break: attempt 2's mask being empty says
            # nothing about attempt 3's broader mask, and a break would
            # make a row's attempt-3 retry depend on whether some OTHER
            # row in the same Arrow batch had a failed structured parse —
            # per-row output must be batch-composition-independent
            # (partitioning/salting/resume invariance)
            continue
        raw = pdf.loc[failed, "text"]
        if attempt == 3:
            raw = raw.fillna("").astype(str).str.replace(
                _BINARY_STRIP_RE, " ", regex=True
            )
        sub = extract_batch(raw, pd.Series(None, index=raw.index, dtype=object))
        sub = pd.concat(
            [sub, assess_batch(sub["clean_text"])], axis=1
        ).set_index(raw.index)
        # `attempts` counts retries ATTEMPTED, not retries that improved
        # the row: a row still failed after attempt 3 is stamped 3 even
        # though nothing changed — the reference counts attempts the same
        # way, and no downstream logic keys off success-vs-attempt
        attempts[failed] = attempt
        ok = sub[sub["quality_score"] > 0]
        if len(ok):
            res.loc[ok.index, ok.columns] = ok

    out = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"],
            "turn_idx": pdf["turn_idx"].astype("int32"),
            "role": pdf["role"],
            "tool": pdf["tool"],
            "ts_us": pdf["ts_us"],
            "clean_text": res["clean_text"],
            "span_starts": res["span_starts"],
            "span_ends": res["span_ends"],
            "span_kinds": res["span_kinds"],
            "quality_score": res["quality_score"].astype("int32"),
            "quality_reason": res["quality_reason"],
            "is_low_quality": res["is_low_quality"],
            "lq_reason": res["lq_reason"],
            "lq_confidence": res["lq_confidence"],
            "parse_failed": res["parse_failed"],
            "attempts": attempts,
            "chars_in": res["chars_in"],
            "chars_out": res["chars_out"],
            "boilerplate_ratio": res["boilerplate_ratio"],
        }
    )
    assert len(out) == n
    return out


def extract_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas entrypoint (schema = EXTRACT_SCHEMA)."""
    for pdf in batches:
        if len(pdf):
            yield extract_pdf_batch(pdf)
