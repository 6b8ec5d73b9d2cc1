"""Vectorized (pandas/numpy) implementations of the reference quality
heuristics.

Production counterpart of ``core.reference_oracle`` — identical results,
computed batch-at-a-time. The per-character class counts run on a single
flat codepoint encoding of the batch (``core.charstats.BatchChars``): one
encode + table lookups replaces ~a dozen regex scans, which profiling
showed dominated the extraction kernel.

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


def quality_score_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized check_ocr_quality: -> DataFrame(quality_score, quality_reason)."""
    raw = texts.fillna("").astype(str)
    t = raw.str.strip()
    bc = BatchChars(t.tolist())
    length = bc.lens
    zeros = bc.count_class("zero")
    spaces = bc.count_class("space_literal")

    is_empty = length == 0
    # no_space.replace('0','') == '' ⇔ every char is ' ' or '0'
    only_zeros = (~is_empty) & (zeros + spaces == length)
    short_zeros = (length < 20) & (zeros > length * 0.5)
    too_short = length < 10

    n_words = bc.word_counts()
    zero_words = bc.zero_word_counts()
    zero_patterns = (n_words > 3) & (zero_words > n_words * 0.7)

    n_binary = bc.count_class("binary")
    binary_heavy = n_binary > length * 0.1

    n_meaningful = bc.count_class("meaningful")
    few_meaningful = n_meaningful < 10

    n = bc.n
    reason = np.full(n, "Passed all quality checks", dtype=object)
    score = np.full(n, 100, dtype=np.int32)
    fired = np.zeros(n, dtype=bool)

    def fire(cond: np.ndarray, fmt) -> None:
        nonlocal fired
        hit = np.flatnonzero(cond & ~fired)
        for i in hit:
            reason[i] = fmt(i)
        fired |= np.asarray(cond)

    fire(is_empty, lambda i: "Empty or whitespace-only text")
    fire(only_zeros, lambda i: "Only zeros and spaces")
    fire(short_zeros,
         lambda i: f"Too many zeros in short text ({zeros[i]}/{length[i]} chars)")
    fire(too_short, lambda i: f"Too short ({length[i]} characters)")
    fire(zero_patterns,
         lambda i: f"Too many zero patterns ({zero_words[i]}/{n_words[i]} words)")
    fire(binary_heavy,
         lambda i: "Too many binary/corrupted characters "
                   f"({n_binary[i]}/{length[i]} chars)")
    fire(few_meaningful,
         lambda i: f"Too few meaningful characters ({n_meaningful[i]} chars)")
    score[fired] = 0
    return pd.DataFrame(
        {
            "quality_score": pd.Series(score, index=texts.index),
            "quality_reason": pd.Series(reason, index=texts.index),
        }
    )


def classify_low_quality_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized detect_low_quality_ocr:
    -> DataFrame(is_low_quality, lq_reason, lq_confidence)."""
    raw = texts.fillna("").astype(str)
    bc = BatchChars(raw.tolist())
    length = bc.lens

    too_short = (raw.str.strip().str.len() < 10).to_numpy()

    alpha = bc.count_class("alpha")
    total = length - bc.count_class("space_literal")
    non_alpha = (total > 0) & (alpha < total * 0.3)

    repetition = bc.max_alnum_repetition() > length * 0.4

    nonws = bc.nonws_counts()
    n_words = bc.word_counts()
    gibberish = (n_words > 0) & (nonws < n_words * 2.0)

    pattern_hit = bc.contains_any_4gram(_FAILURE_PATTERNS)

    special_heavy = (length > 0) & (bc.count_class("special") > length * 0.5)

    conds = [too_short, non_alpha, repetition, gibberish, pattern_hit,
             special_heavy]
    labels = ["text_too_short", "mostly_non_alphabetic",
              "excessive_character_repetition", "gibberish_short_words",
              "ocr_failure_pattern", "excessive_special_characters"]
    confs = [1.0, 0.8, 0.7, 0.6, 0.9, 0.7]

    reason = np.select(conds, labels, default="passed_quality_checks")
    conf = np.select(conds, confs, default=0.8)
    is_lq = np.select(conds, [True] * len(conds), default=False)
    return pd.DataFrame(
        {
            "is_low_quality": pd.Series(is_lq, index=texts.index, dtype=bool),
            "lq_reason": pd.Series(reason, index=texts.index, dtype=object),
            "lq_confidence": pd.Series(conf, index=texts.index, dtype="float64"),
        }
    )
