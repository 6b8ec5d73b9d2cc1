"""Pure-Python oracle of the reference's extraction/quality semantics.

This module is the *specification*: a direct, row-at-a-time statement of
what the reference computes, used only by tests to generate golden expected
outputs. The production path is the vectorized pandas implementation in
``core.quality`` / ``core.extract``; tests assert the two agree exactly.

Reference semantics reproduced here (file:line cites into /root/reference):

* ``quality_score``  — binary 0/100 heuristic chain,
  helpers/error_detection.py:126-180 (``check_ocr_quality``).
* ``classify_low_quality`` — 5-pattern classifier with confidence,
  helpers/ocr_quality_assessment.py:251-335 (``detect_low_quality_ocr``).
* ``join_spans`` — confidence filter >= 0.3 then single-space join + strip,
  ocr_processor.py:92-102 with MIN_CONFIDENCE at :46.
* meaningful-text gate ``len(strip()) > 10`` — ocr_processor.py:190.
* ``content_hash`` — md5 of extracted text, index_images.py:206.

NOTE (intentional quirk parity): the reference's binary-character check puts
the 4-char string 'JFIF' inside a *per-character* membership list
(error_detection.py:168-170), so it can never match; only the single-char
indicators count. We reproduce that behavior, not the apparent intent.
"""

from __future__ import annotations

import hashlib

MIN_SPAN_CONFIDENCE = 0.3  # ocr_processor.py:46
MEANINGFUL_GATE = 10  # chars; ocr_processor.py:190 (strictly greater passes)
MAX_ATTEMPTS = 3  # helpers/error_detection.py:44

# Single-character binary/corruption indicators (error_detection.py:168).
# 'JFIF' appears in the reference list but is unreachable in a per-char test.
_BINARY_INDICATOR_LIST = ["JFIF", "␦", "\\", "{", "}", "|", "~", "`", "^", "[", "]"]

# Characters counted as "meaningful" (error_detection.py:175).
_MEANINGFUL_EXTRA = " .,;:!?()[]{}\"'`~@#$%^&*+-=<>/\\|_"

# Substring patterns that mark definite OCR failure
# (ocr_quality_assessment.py:303-309).
_FAILURE_PATTERNS = [
    "qqqq", "wwww", "eeee", "rrrr", "tttt", "yyyy",
    "asdf", "qwer", "zxcv",
    "0000", "1111", "2222", "3333",
]


def quality_score(text: str | None) -> tuple[int, str]:
    """Binary quality score, exact chain of error_detection.py:126-180."""
    if not text or not text.strip():
        return 0, "Empty or whitespace-only text"
    t = text.strip()
    no_space = t.replace(" ", "")

    if no_space.replace("0", "") == "":
        return 0, "Only zeros and spaces"
    if no_space == "0" * len(no_space):  # unreachable after the line above; kept for parity
        return 0, "All zeros when stripped of spaces"
    if len(t) < 20 and t.count("0") > len(t) * 0.5:
        return 0, f"Too many zeros in short text ({t.count('0')}/{len(t)} chars)"
    if len(t) < 10:
        return 0, f"Too short ({len(t)} characters)"

    words = t.split()
    if len(words) > 3:
        zero_words = sum(1 for w in words if w.replace("0", "") == "")
        if zero_words / len(words) > 0.7:
            return 0, f"Too many zero patterns ({zero_words}/{len(words)} words)"

    binary_count = sum(1 for c in t if ord(c) < 32 or c in _BINARY_INDICATOR_LIST)
    if binary_count > len(t) * 0.1:
        return 0, f"Too many binary/corrupted characters ({binary_count}/{len(t)} chars)"

    meaningful = sum(1 for c in t if c.isalnum() or c in _MEANINGFUL_EXTRA)
    if meaningful < 10:
        return 0, f"Too few meaningful characters ({meaningful} chars)"

    return 100, "Passed all quality checks"


def classify_low_quality(text: str | None) -> tuple[bool, str, float]:
    """(is_low_quality, reason, confidence) — ocr_quality_assessment.py:251-335."""
    if not text or len(text.strip()) < 10:
        return True, "text_too_short", 1.0

    lower = text.lower()

    alpha = sum(1 for c in text if c.isalpha())
    total = len(text.replace(" ", ""))
    if total > 0 and alpha / total < 0.3:
        return True, "mostly_non_alphabetic", 0.8

    counts: dict[str, int] = {}
    for c in text:
        if c.isalnum():
            counts[c] = counts.get(c, 0) + 1
    if counts and max(counts.values()) > len(text) * 0.4:
        return True, "excessive_character_repetition", 0.7

    words = text.split()
    if words and sum(len(w) for w in words) / len(words) < 2.0:
        return True, "gibberish_short_words", 0.6

    if any(p in lower for p in _FAILURE_PATTERNS):
        return True, "ocr_failure_pattern", 0.9

    special = sum(1 for c in text if not c.isalnum() and not c.isspace())
    if len(text) > 0 and special / len(text) > 0.5:
        return True, "excessive_special_characters", 0.7

    return False, "passed_quality_checks", 0.8


def join_spans(spans: list[tuple[float, str]]) -> str:
    """Confidence-filter then single-space join + strip (ocr_processor.py:92-102)."""
    kept = [s for conf, s in spans if conf >= MIN_SPAN_CONFIDENCE]
    return " ".join(kept).strip()


def parse_failed(clean_text: str) -> bool:
    """E3 gate: meaningful output iff len(strip) > 10 (ocr_processor.py:190)."""
    return len(clean_text.strip()) <= MEANINGFUL_GATE


def content_hash(clean_text: str) -> str:
    """md5 hex of extracted content (index_images.py:206)."""
    return hashlib.md5(clean_text.encode("utf-8")).hexdigest()
