"""Property-based parity: on arbitrary (adversarial) strings the vectorized
kernels must agree exactly with the pure-Python reference oracle, and span
offsets must always reconstruct clean_text. Goes beyond the reference's
example-based tests (it has no property tests; SURVEY.md §5)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from epstein_browser_spark.core import (
    classify_low_quality_batch,
    extract_batch,
    quality_score_batch,
)
from epstein_browser_spark.core import reference_oracle as ro

# characters the heuristics care about: zeros, spaces, punctuation from the
# binary/meaningful sets, letters, plus some unicode
_ALPHABET = st.sampled_from(
    list("0 abcqwz.{}|~`^[]\\!@#$%\t\n") + ["é", "Ω", "中"]
)
_TEXTS = st.text(alphabet=_ALPHABET, min_size=0, max_size=120)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TEXTS, min_size=1, max_size=8))
def test_quality_score_matches_oracle(texts):
    got = quality_score_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        exp = ro.quality_score(t)
        assert (int(got["quality_score"][i]), got["quality_reason"][i]) == exp, repr(t)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TEXTS, min_size=1, max_size=8))
def test_low_quality_matches_oracle(texts):
    got = classify_low_quality_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        exp = ro.classify_low_quality(t)
        assert (
            bool(got["is_low_quality"][i]),
            got["lq_reason"][i],
            float(got["lq_confidence"][i]),
        ) == exp, repr(t)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.text(alphabet=st.sampled_from(list("abc xyz.")), max_size=30),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_span_mode_matches_reference_join(spans):
    raw = "\n".join(f"{round(c, 3)}|{t}" for c, t in spans)
    out = extract_batch(pd.Series([raw]), pd.Series(["spans"]))
    # reference semantics on the normalized segment texts
    kept = [" ".join(t.split()) for c, t in spans
            if round(c, 3) >= ro.MIN_SPAN_CONFIDENCE and t.split()]
    assert out["clean_text"][0] == " ".join(kept).strip()


@settings(max_examples=200, deadline=None)
@given(st.lists(_TEXTS, min_size=1, max_size=6),
       st.lists(st.sampled_from([None, "spans", "html", "pdf"]), min_size=1,
                max_size=6))
def test_span_reconstruction_always_holds(texts, tools):
    n = min(len(texts), len(tools))
    out = extract_batch(pd.Series(texts[:n], dtype=object),
                        pd.Series(tools[:n], dtype=object))
    for i in range(n):
        ct = out["clean_text"][i]
        recon = " ".join(
            ct[s:e] for s, e in zip(out["span_starts"][i], out["span_ends"][i])
        )
        assert recon == ct
        # offsets are sane: ordered, non-overlapping, end-exclusive in bounds
        prev_end = -1
        for s, e in zip(out["span_starts"][i], out["span_ends"][i]):
            assert 0 <= s < e <= len(ct)
            assert s > prev_end
            prev_end = e


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                           blacklist_categories=("Cs",)),
    max_size=40), min_size=1, max_size=30))
def test_4gram_matcher_matches_python_in(texts):
    """The packed-int64 4-gram matcher must agree with Python's
    `pat in text.lower()` on arbitrary unicode, including astral chars
    adjacent to real matches (the clamp-to-sentinel path)."""
    from epstein_browser_spark.core.charstats import BatchChars

    patterns = ["asdf", "qwer", "0000"]
    bc = BatchChars(texts)
    got = list(bc.contains_any_4gram(patterns))
    exp = [any(p in t.lower() for p in patterns) for t in texts]
    assert got == exp


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=40))
def test_strip_region_matches_python_strip(texts):
    """reduceat strip-region must agree with Python str.strip() lengths."""
    from epstein_browser_spark.core.charstats import BatchChars
    from epstein_browser_spark.core.quality import _strip_region

    bc = BatchChars(texts)
    _in_region, strip_len = _strip_region(bc)
    assert list(strip_len) == [len(t.strip()) for t in texts]
