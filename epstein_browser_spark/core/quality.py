"""Vectorized (pandas) implementations of the reference quality heuristics.

Production counterpart of ``core.reference_oracle`` — identical results,
computed batch-at-a-time with pandas str/regex ops (C loops) instead of
per-row Python, so they can run inside Arrow-batched pandas UDFs.

Semantics sources (see reference_oracle for the row-level statement):
  * quality_score  — /root/reference/helpers/error_detection.py:126-180
  * low-quality classifier — /root/reference/helpers/ocr_quality_assessment.py:251-335
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Regex fragments ------------------------------------------------------------

# all-zeros "word" bounded by whitespace/ends (word.replace('0','') == '')
_ZERO_WORD_RE = r"(?<!\S)0+(?!\S)"

# single-char binary/corruption indicators (error_detection.py:168; the
# 'JFIF' entry is unreachable in the reference's per-char test — see oracle)
_BINARY_CHAR_RE = r"[\x00-\x1f␦\\{}|~`^\[\]]"

# chars counted "meaningful": alnum or the explicit punctuation set
# (error_detection.py:175)
_MEANINGFUL_RE = r"[^\W_]|[ .,;:!?()\[\]{}\"'`~@#$%^&*+\-=<>/\\|_]"

# unicode letters (str.isalpha approximation for the corpus we process)
_ALPHA_RE = r"[^\W\d_]"
# unicode alnum (str.isalnum approximation)
_ALNUM_RE = r"[^\W_]"
# special: not alnum and not whitespace (underscore is special per isalnum)
_SPECIAL_RE = r"[^\w\s]|_"

_FAILURE_PATTERN_RE = (
    "qqqq|wwww|eeee|rrrr|tttt|yyyy|asdf|qwer|zxcv|0000|1111|2222|3333"
)


def quality_score_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized check_ocr_quality: -> DataFrame(quality_score, quality_reason)."""
    raw = texts.fillna("").astype(str)
    t = raw.str.strip()
    length = t.str.len()
    no_space = t.str.replace(" ", "", regex=False)

    is_empty = length == 0
    only_zeros = (~is_empty) & (no_space.str.replace("0", "", regex=False) == "")
    zeros = t.str.count("0")
    short_zeros = (length < 20) & (zeros > length * 0.5)
    too_short = length < 10

    n_words = t.str.count(r"\S+")
    zero_words = t.str.count(_ZERO_WORD_RE)
    zero_patterns = (n_words > 3) & (zero_words > n_words * 0.7)

    n_binary = t.str.count(_BINARY_CHAR_RE)
    binary_heavy = n_binary > length * 0.1

    n_meaningful = t.str.count(_MEANINGFUL_RE)
    few_meaningful = n_meaningful < 10

    ls = length.astype(str)
    conds = [is_empty, only_zeros, short_zeros, too_short, zero_patterns,
             binary_heavy, few_meaningful]
    reasons = [
        pd.Series("Empty or whitespace-only text", index=t.index),
        pd.Series("Only zeros and spaces", index=t.index),
        "Too many zeros in short text (" + zeros.astype(str) + "/" + ls + " chars)",
        "Too short (" + ls + " characters)",
        "Too many zero patterns (" + zero_words.astype(str) + "/"
        + n_words.astype(str) + " words)",
        "Too many binary/corrupted characters (" + n_binary.astype(str) + "/"
        + ls + " chars)",
        "Too few meaningful characters (" + n_meaningful.astype(str) + " chars)",
    ]
    reason = pd.Series("Passed all quality checks", index=t.index, dtype=object)
    score = pd.Series(100, index=t.index, dtype="int32")
    fired = pd.Series(False, index=t.index)
    for cond, r in zip(conds, reasons):
        hit = cond & ~fired
        reason[hit] = r[hit] if isinstance(r, pd.Series) else r
        fired |= cond
    score[fired] = 0
    return pd.DataFrame({"quality_score": score, "quality_reason": reason})


# exact str.isalnum() for the ASCII range; codepoints >= 128 fall back to
# Python's unicodedata-backed isalnum on *unique* codes only
_ASCII_ALNUM = np.zeros(128, dtype=bool)
for _c in range(128):
    _ASCII_ALNUM[_c] = chr(_c).isalnum()


def _max_char_repetition(texts: pd.Series) -> pd.Series:
    """Max count of any single alnum char per row (reference semantics:
    per-char histogram over isalnum chars, ocr_quality_assessment.py:276-285).

    Flat numpy formulation: one codepoint array for the whole batch +
    np.unique over (row, codepoint) keys + reduceat for per-row maxima.
    (str.extractall builds one MultiIndex row per character — ~1000×
    slower on real batches.)"""
    out = pd.Series(0, index=texts.index, dtype="int64")
    vals = texts.to_numpy()
    lens = np.fromiter((len(t) for t in vals), dtype=np.int64, count=len(vals))
    total = int(lens.sum())
    if total == 0:
        return out
    joined = "".join(vals)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    row_ids = np.repeat(np.arange(len(vals), dtype=np.int64), lens)
    is_ascii = codes < 128
    alnum = np.zeros(total, dtype=bool)
    alnum[is_ascii] = _ASCII_ALNUM[codes[is_ascii]]
    hi = codes[~is_ascii]
    if len(hi):
        uniq = np.unique(hi)
        ok = np.array([chr(int(c)).isalnum() for c in uniq], dtype=bool)
        alnum[~is_ascii] = ok[np.searchsorted(uniq, hi)]
    codes = codes[alnum]
    row_ids = row_ids[alnum]
    if len(codes) == 0:
        return out
    key = row_ids * (1 << 21) + codes  # max codepoint 0x10FFFF < 2^21
    uk, counts = np.unique(key, return_counts=True)
    grp = (uk >> 21).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1]])
    maxima = np.maximum.reduceat(counts, starts)
    out.iloc[grp[starts]] = maxima
    return out


def classify_low_quality_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized detect_low_quality_ocr:
    -> DataFrame(is_low_quality, lq_reason, lq_confidence)."""
    raw = texts.fillna("").astype(str)
    length = raw.str.len()

    too_short = raw.str.strip().str.len() < 10

    alpha = raw.str.count(_ALPHA_RE)
    total = raw.str.replace(" ", "", regex=False).str.len()
    non_alpha = (total > 0) & (alpha < total * 0.3)

    max_rep = _max_char_repetition(raw)
    repetition = max_rep > length * 0.4

    non_ws_chars = raw.str.count(r"\S")
    n_words = raw.str.count(r"\S+")
    gibberish = (n_words > 0) & (non_ws_chars < n_words * 2.0)

    pattern_hit = raw.str.lower().str.contains(_FAILURE_PATTERN_RE, regex=True)

    special = raw.str.count(_SPECIAL_RE)
    special_heavy = (length > 0) & (special > length * 0.5)

    conds = [too_short, non_alpha, repetition, gibberish, pattern_hit, special_heavy]
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
