"""Vectorized (pandas/numpy) implementations of the reference quality
heuristics.

Production counterpart of ``core.reference_oracle`` — identical results,
computed batch-at-a-time. Both heuristics run off ONE flat codepoint
encoding of the batch (``core.charstats.BatchChars``): the quality chain
works on stripped text, the classifier on raw text, and instead of
re-encoding the stripped strings the quality counts are taken over the
[first-nonws..last-nonws] region of the raw encoding (identical by
construction of str.strip()).

Semantics sources (see reference_oracle for the row-level statement):
  * quality_score  — /root/reference/helpers/error_detection.py:126-180
  * low-quality classifier — /root/reference/helpers/ocr_quality_assessment.py:251-335
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from epstein_browser_spark.core.charstats import BatchChars

_FAILURE_PATTERNS = [
    "qqqq", "wwww", "eeee", "rrrr", "tttt", "yyyy",
    "asdf", "qwer", "zxcv",
    "0000", "1111", "2222", "3333",
]
_FAILURE_PATTERN_RE = "|".join(_FAILURE_PATTERNS)  # kept for SQL oracles/tests


def _strip_region(bc: BatchChars):
    """Per-row (first_nonws_idx, last_nonws_idx, strip_len) plus the
    per-char in-region mask; rows with no non-ws chars get strip_len 0.

    Segmented min/max via ``reduceat`` over the row-offset boundaries —
    one pass each, no sorting (the previous flatnonzero + double
    np.unique formulation cost ~47% of the whole kernel in argsort)."""
    n = bc.n
    total = len(bc.codes)
    first_nw = np.full(n, -1, dtype=np.int64)
    last_nw = np.full(n, -2, dtype=np.int64)
    if total:
        nonws = ~bc.char_class("ws")
        idx = np.arange(total, dtype=np.int64)
        nz = bc.lens > 0
        starts = bc.offsets[nz]  # strictly increasing: zero-len rows skipped
        fwd = np.where(nonws, idx, total)  # sentinel: no non-ws in segment
        bwd = np.where(nonws, idx, -1)
        f = np.minimum.reduceat(fwd, starts)
        la = np.maximum.reduceat(bwd, starts)
        first_nw[nz] = np.where(f < total, f, -1)
        last_nw[nz] = np.where(la >= 0, la, -2)
        ro = bc.row_of()
        in_region = (idx >= first_nw[ro]) & (idx <= last_nw[ro])
    else:
        in_region = np.zeros(0, dtype=bool)
    strip_len = np.maximum(last_nw - first_nw + 1, 0)
    return in_region, strip_len


def assess_batch(texts: pd.Series) -> pd.DataFrame:
    """Both heuristics over one encode:
    (quality_score, quality_reason, is_low_quality, lq_reason,
    lq_confidence)."""
    raw = texts.fillna("").astype(str)
    bc = BatchChars(raw.tolist())
    n = bc.n
    in_region, strip_len = _strip_region(bc)

    def count_in_region(name: str) -> np.ndarray:
        return bc.row_count(bc.char_class(name) & in_region)

    # ---- quality chain (on stripped text == raw restricted to region) ----
    length = strip_len
    zeros = count_in_region("zero")
    spaces = count_in_region("space_literal")

    is_empty = length == 0
    only_zeros = (~is_empty) & (zeros + spaces == length)
    short_zeros = (length < 20) & (zeros > length * 0.5)
    too_short_q = length < 10

    n_words = bc.word_counts()  # boundary ws doesn't change split()
    zero_words = bc.zero_word_counts()
    # DIVIDE form, exactly as the reference computes it: 0.7 is not a
    # representable double, so `zero_words > n_words * 0.7` disagrees
    # with `zero_words / n_words > 0.7` at exact-ratio boundaries
    # (n_words=90, zero_words=63: 90*0.7 rounds just below 63)
    zero_patterns = (n_words > 3) & (
        zero_words / np.maximum(n_words, 1) > 0.7
    )

    n_binary = count_in_region("binary")
    binary_heavy = n_binary > length * 0.1
    n_meaningful = count_in_region("meaningful")
    few_meaningful = n_meaningful < 10

    reason = np.full(n, "Passed all quality checks", dtype=object)
    score = np.full(n, 100, dtype=np.int32)
    fired = np.zeros(n, dtype=bool)

    def fire(cond: np.ndarray, fmt) -> None:
        nonlocal fired
        for i in np.flatnonzero(cond & ~fired):
            reason[i] = fmt(i)
        fired |= np.asarray(cond)

    fire(is_empty, lambda i: "Empty or whitespace-only text")
    fire(only_zeros, lambda i: "Only zeros and spaces")
    fire(short_zeros,
         lambda i: f"Too many zeros in short text ({zeros[i]}/{length[i]} chars)")
    fire(too_short_q, lambda i: f"Too short ({length[i]} characters)")
    fire(zero_patterns,
         lambda i: f"Too many zero patterns ({zero_words[i]}/{n_words[i]} words)")
    fire(binary_heavy,
         lambda i: "Too many binary/corrupted characters "
                   f"({n_binary[i]}/{length[i]} chars)")
    fire(few_meaningful,
         lambda i: f"Too few meaningful characters ({n_meaningful[i]} chars)")
    score[fired] = 0

    # ---- low-quality classifier (on raw text) ----------------------------
    raw_len = bc.lens
    too_short = strip_len < 10
    alpha = bc.count_class("alpha")
    total = raw_len - bc.count_class("space_literal")
    # divide form for the same boundary-parity reason as zero_patterns
    non_alpha = (total > 0) & (alpha / np.maximum(total, 1) < 0.3)
    repetition = bc.max_alnum_repetition() > raw_len * 0.4
    nonws = bc.nonws_counts()
    gibberish = (n_words > 0) & (nonws < n_words * 2.0)
    pattern_hit = bc.contains_any_4gram(_FAILURE_PATTERNS)
    special_heavy = (raw_len > 0) & (bc.count_class("special") > raw_len * 0.5)

    conds = [too_short, non_alpha, repetition, gibberish, pattern_hit,
             special_heavy]
    labels = ["text_too_short", "mostly_non_alphabetic",
              "excessive_character_repetition", "gibberish_short_words",
              "ocr_failure_pattern", "excessive_special_characters"]
    confs = [1.0, 0.8, 0.7, 0.6, 0.9, 0.7]
    lq_reason = np.select(conds, labels, default="passed_quality_checks")
    lq_conf = np.select(conds, confs, default=0.8)
    is_lq = np.select(conds, [True] * len(conds), default=False)

    return pd.DataFrame(
        {
            "quality_score": pd.Series(score, index=texts.index),
            "quality_reason": pd.Series(reason, index=texts.index),
            "is_low_quality": pd.Series(is_lq, index=texts.index, dtype=bool),
            "lq_reason": pd.Series(lq_reason, index=texts.index, dtype=object),
            "lq_confidence": pd.Series(lq_conf, index=texts.index,
                                       dtype="float64"),
        }
    )


def quality_score_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized check_ocr_quality: -> DataFrame(quality_score, quality_reason)."""
    return assess_batch(texts)[["quality_score", "quality_reason"]]


def classify_low_quality_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized detect_low_quality_ocr:
    -> DataFrame(is_low_quality, lq_reason, lq_confidence)."""
    return assess_batch(texts)[["is_low_quality", "lq_reason", "lq_confidence"]]
