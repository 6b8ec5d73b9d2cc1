"""Edge cases for the flat codepoint-array engine (core.charstats):
empty batches, empty/whitespace rows, unicode, and agreement with naive
Python on every statistic."""

import numpy as np
import pandas as pd

from epstein_browser_spark.core.charstats import BatchChars

CASES = [
    "", "   ", "0 0 00 0", "hello world", "a b c",
    "tabs\tand\nnewlines mixed  runs", "0", "00 a 00",
    "éclair Ωmega 中文 mixed", "trailing spaces   ", "   leading",
    "\x01\x02 control chars {}[]|", "one",
]


def _naive_words(t):
    return t.split()


def test_word_counts_match_python_split():
    bc = BatchChars(CASES)
    got = bc.word_counts()
    for i, t in enumerate(CASES):
        assert got[i] == len(_naive_words(t)), repr(t)


def test_zero_word_counts():
    bc = BatchChars(CASES)
    got = bc.zero_word_counts()
    for i, t in enumerate(CASES):
        exp = sum(1 for w in _naive_words(t) if w.replace("0", "") == "")
        assert got[i] == exp, repr(t)


def test_nonws_counts():
    bc = BatchChars(CASES)
    got = bc.nonws_counts()
    for i, t in enumerate(CASES):
        assert got[i] == sum(len(w) for w in _naive_words(t)), repr(t)


def test_class_counts_match_python_predicates():
    bc = BatchChars(CASES)
    preds = {
        "alpha": str.isalpha,
        "alnum": str.isalnum,
        "zero": lambda c: c == "0",
        "space_literal": lambda c: c == " ",
        "special": lambda c: not c.isalnum() and not c.isspace(),
    }
    for name, pred in preds.items():
        got = bc.count_class(name)
        for i, t in enumerate(CASES):
            assert got[i] == sum(1 for c in t if pred(c)), (name, repr(t))


def test_max_alnum_repetition():
    bc = BatchChars(CASES + ["aaaabbbcc", "zzzzzzzz"])
    got = bc.max_alnum_repetition()
    texts = CASES + ["aaaabbbcc", "zzzzzzzz"]
    for i, t in enumerate(texts):
        counts = {}
        for c in t:
            if c.isalnum():
                counts[c] = counts.get(c, 0) + 1
        assert got[i] == (max(counts.values()) if counts else 0), repr(t)


def test_contains_any_4gram():
    texts = ["has QQQQ upper", "asdf embedded", "no pattern here at all",
             "spans\nqq\nqq lines", "0000", "", "a s d f spaced out"]
    bc = BatchChars(texts)
    got = bc.contains_any_4gram(["qqqq", "asdf", "0000"])
    exp = [any(p in t.lower() for p in ["qqqq", "asdf", "0000"]) for t in texts]
    assert list(got) == exp
    # windows must not straddle rows: 'qq' + 'qq' adjacent rows is NOT a hit
    bc2 = BatchChars(["abqq", "qqcd"])
    assert list(bc2.contains_any_4gram(["qqqq"])) == [False, False]


def test_empty_batch():
    bc = BatchChars([])
    assert bc.n == 0
    assert list(bc.word_counts()) == []
    assert list(bc.count_class("alpha")) == []
    assert list(bc.max_alnum_repetition()) == []
    assert list(bc.contains_any_4gram(["qqqq"])) == []


def test_row_count_offsets_with_empty_rows():
    bc = BatchChars(["", "ab", "", "c", ""])
    got = bc.count_class("alpha")
    assert list(got) == [0, 2, 0, 1, 0]
    assert np.array_equal(bc.lens, [0, 2, 0, 1, 0])


def test_contains_4gram_astral_codepoints_no_false_positive():
    """The packed-int64 matcher clamps non-ASCII codepoints to an
    unmatchable sentinel: astral chars whose low 16 bits equal an ASCII
    pattern char (e.g. U+1F061 & 0xFFFF == 0x61 'a') must NOT create a
    match, and real matches adjacent to astral chars must survive."""
    from epstein_browser_spark.core.charstats import BatchChars

    sneaky = "\U0001F073\U0001F064\U0001F066\U0001F073"  # low bytes spell 'sdfs'-ish
    rows = [
        "x" + sneaky + "x",            # no ASCII 'asdf' anywhere
        "\U0001F061sdf",               # astral + 'sdf' — not a 4-gram match
        "ok asdf ok \U0001F061",       # genuine match beside astral char
        "QweR",                        # case-insensitive genuine match
    ]
    bc = BatchChars(rows)
    got = bc.contains_any_4gram(["asdf", "qwer"])
    assert list(got) == [False, False, True, True]
