"""Vectorized kernels must agree exactly with the pure-Python reference
oracle on every content class (the reference's own test model: one case per
quality-reason branch, /root/reference/tests/unit/test_ocr_quality_assessment.py:321-394).
"""

import pandas as pd
import pytest

from epstein_browser_spark.core import (
    classify_low_quality_batch,
    extract_batch,
    quality_score_batch,
)
from epstein_browser_spark.core import reference_oracle as ro
from epstein_browser_spark.synth import _NOISE_PAYLOADS, make_transcripts_pdf

# one representative per reference-tested branch (FIXTURES.md §1)
BRANCH_CASES = [
    ("", 0, "Empty or whitespace-only text"),
    ("   ", 0, "Empty or whitespace-only text"),
    ("0 0 00 0", 0, "Only zeros and spaces"),
    ("hi", 0, "Too short (2 characters)"),
    ("0 0", 0, "Only zeros and spaces"),
    ("00 a 00 00", 0, "Too many zeros in short text (6/10 chars)"),
    ("this is perfectly normal text content", 100, "Passed all quality checks"),
]

LQ_CASES = [
    ("hi", True, "text_too_short", 1.0),
    ("@@@@ #### $$$$ %%%%", True, "mostly_non_alphabetic", 0.8),
    ("qqqqqqqqqqqqqqqqqqqq", True, "excessive_character_repetition", 0.7),
    ("a b c d e f g h i j", True, "gibberish_short_words", 0.6),
    ("this text contains qqqq stuck keys inside", True, "ocr_failure_pattern", 0.9),
    ("normal readable sentence with several proper words", False,
     "passed_quality_checks", 0.8),
]


@pytest.mark.parametrize("text,score,reason", BRANCH_CASES)
def test_quality_branches(text, score, reason):
    assert ro.quality_score(text) == (score, reason)
    got = quality_score_batch(pd.Series([text]))
    assert (int(got["quality_score"][0]), got["quality_reason"][0]) == (score, reason)


@pytest.mark.parametrize("text,is_lq,reason,conf", LQ_CASES)
def test_low_quality_branches(text, is_lq, reason, conf):
    assert ro.classify_low_quality(text) == (is_lq, reason, conf)
    got = classify_low_quality_batch(pd.Series([text]))
    assert bool(got["is_low_quality"][0]) == is_lq
    assert got["lq_reason"][0] == reason
    assert float(got["lq_confidence"][0]) == conf


def _corpus_texts():
    df = make_transcripts_pdf(n_convs=40, hot_conv_turns=50)
    ex = extract_batch(df["text"], df["tool"])
    return list(ex["clean_text"]) + _NOISE_PAYLOADS + [None]


def test_quality_parity_on_corpus():
    texts = _corpus_texts()
    got = quality_score_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        exp = ro.quality_score(t)
        assert (int(got["quality_score"][i]), got["quality_reason"][i]) == exp, repr(t)


def test_low_quality_parity_on_corpus():
    texts = _corpus_texts()
    got = classify_low_quality_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        exp = ro.classify_low_quality(t)
        assert (
            bool(got["is_low_quality"][i]),
            got["lq_reason"][i],
            float(got["lq_confidence"][i]),
        ) == exp, repr(t)


def test_span_join_matches_reference_semantics():
    # confidence >= 0.3 filter, single-space join, strip
    # (/root/reference/ocr_processor.py:92-102)
    spans = [(0.95, "first span"), (0.1, "dropped"), (0.3, "boundary kept"),
             (0.29, "dropped too"), (1.0, "final")]
    assert ro.join_spans(spans) == "first span boundary kept final"
    raw = "\n".join(f"{c}|{t}" for c, t in spans)
    out = extract_batch(pd.Series([raw]), pd.Series(["spans"]))
    assert out["clean_text"][0] == "first span boundary kept final"
    assert list(out["span_kinds"][0]) == ["span"] * 3


def test_content_hash_is_md5():
    assert ro.content_hash("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_meaningful_gate():
    # strictly greater than 10 chars passes (/root/reference/ocr_processor.py:190)
    assert ro.parse_failed("0123456789")  # len 10 → failed
    assert not ro.parse_failed("0123456789a")  # len 11 → kept
    out = extract_batch(pd.Series(["0123456789", "0123456789a"]),
                        pd.Series([None, None], dtype=object))
    assert list(out["parse_failed"]) == [True, False]


def test_zero_pattern_exact_ratio_boundary():
    """90 words, 63 all-zero: 63/90 == 0.7 exactly, which must NOT fire
    the >0.7 rule — the multiply form (zero_words > n_words*0.7) fired it
    because 90*0.7 rounds just below 63 in doubles."""
    import pandas as pd

    from epstein_browser_spark.core.quality import quality_score_batch
    from epstein_browser_spark.core.reference_oracle import quality_score

    text = ("00 " * 63 + "abcd " * 27).strip()
    exp = quality_score(text)
    got = quality_score_batch(pd.Series([text]))
    assert (got.loc[0, "quality_score"], got.loc[0, "quality_reason"]) == exp
    assert exp[0] == 100  # the ratio is exactly at, not above, the bar


def test_retry_is_batch_composition_independent():
    """A failed plain-text row must get its attempt-3 binary-strip retry
    regardless of whether any OTHER row in the Arrow batch had a failed
    structured parse — per-row output must not depend on batch
    composition (partitioning / salting / resume invariance)."""
    import pandas as pd

    from epstein_browser_spark.udfs import extract_pdf_batch

    def mk(rows):
        return pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pd.array(range(len(rows)), dtype="int32"),
                "role": ["user"] * len(rows),
                "text": [r[1] for r in rows],
                "tool": pd.array([r[2] for r in rows], dtype=object),
                "ts_us": pd.array([0] * len(rows), dtype="int64"),
            }
        )

    # plain row that fails attempt 1 (binary noise) but recovers after
    # the attempt-3 binary strip
    noisy = "the quick brown fox jumps over the lazy dog " + "\x01\x02" * 40
    alone = extract_pdf_batch(mk([("c1", noisy, None)]))
    together = extract_pdf_batch(
        mk([("c1", noisy, None), ("c2", "\x01|0.1|garbage", "spans")])
    )
    a = alone.set_index("conv_id").loc["c1"]
    t = together.set_index("conv_id").loc["c1"]
    assert a["quality_score"] == t["quality_score"]
    assert a["attempts"] == t["attempts"]
    assert a["clean_text"] == t["clean_text"]
