"""Golden-style tests for each extraction mode (the reference's
golden-fixture equality model, tests/unit/test_search_coverage.py:22-45)."""

import pandas as pd

from epstein_browser_spark.core.extract import extract_batch


def _one(text, tool):
    out = extract_batch(pd.Series([text]), pd.Series([tool], dtype=object))
    return out.iloc[0]


def _spans(r):
    return list(zip(r["span_starts"], r["span_ends"], r["span_kinds"]))


def _reconstruct(r):
    return " ".join(
        r["clean_text"][s:e] for s, e, _ in _spans(r)
    )


def test_plain_normalizes_whitespace():
    r = _one("  Lorem   ipsum\t dolor \n sit amet  ", None)
    assert r["clean_text"] == "Lorem ipsum dolor sit amet"
    assert _spans(r) == [(0, 26, "text")]
    assert not r["parse_failed"]


def test_spans_mode_filters_and_offsets():
    raw = "0.9|alpha beta\n0.2|noise dropped\n0.5|gamma"
    r = _one(raw, "spans")
    assert r["clean_text"] == "alpha beta gamma"
    assert _spans(r) == [(0, 10, "span"), (11, 16, "span")]
    # spans reconstruct clean_text exactly (FIXTURES.md §2 invariant)
    assert _reconstruct(r) == r["clean_text"]


def test_spans_mode_unparseable_line_kept_as_full_span():
    r = _one("no separator here at all", "spans")
    assert r["clean_text"] == "no separator here at all"


def test_html_strips_boilerplate_keeps_main():
    html = (
        "<html><head><style>p{}</style><script>var x=1;</script></head><body>"
        "<nav><a href='/'>home</a> <a href='/b'>browse</a> nav items</nav>"
        "<p>The main article body has plenty of meaningful words in it.</p>"
        "<div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div>"
        "<footer>copyright legal boilerplate footer</footer>"
        "</body></html>"
    )
    r = _one(html, "html")
    assert r["clean_text"] == (
        "The main article body has plenty of meaningful words in it."
    )
    assert r["span_kinds"][0] == "block"
    assert r["boilerplate_ratio"] > 0.5


def test_html_link_density_drops_link_farms():
    farm = "<p>" + " ".join(f"<a href='/{i}'>link text {i}</a>" for i in range(8)) + "</p>"
    keep = "<p>a genuine paragraph with informative content and many words</p>"
    r = _one(f"<body>{farm}{keep}</body>", "html")
    assert r["clean_text"] == (
        "a genuine paragraph with informative content and many words"
    )


def test_pdf_reading_order_and_furniture():
    raw = "\n".join([
        "2|1|10|second page starts here",
        "1|2|10|right column continues the thought",
        "1|1|999|Page 1",
        "1|1|20|left column second line",
        "1|1|10|left column first line",
    ])
    r = _one(raw, "pdf")
    assert r["clean_text"] == (
        "left column first line left column second line "
        "right column continues the thought second page starts here"
    )
    # blocks: (p1,c1) merged, (p1,c2), (p2,c1); furniture dropped
    assert list(r["span_kinds"]) == ["block", "block", "block"]
    assert _reconstruct(r) == r["clean_text"]


def test_empty_and_null_inputs():
    out = extract_batch(pd.Series(["", None, "   "]),
                        pd.Series([None, "html", "pdf"], dtype=object))
    assert list(out["clean_text"]) == ["", "", ""]
    assert list(out["parse_failed"]) == [True, True, True]
    assert list(out["span_starts"]) == [[], [], []]


def test_mixed_mode_batch_alignment():
    texts = pd.Series(["plain one here", "0.9|span text kept", "<p>html body words in paragraph</p>",
                       "1|1|1|pdf line content"])
    tools = pd.Series([None, "spans", "html", "pdf"], dtype=object)
    out = extract_batch(texts, tools)
    assert list(out["clean_text"]) == [
        "plain one here",
        "span text kept",
        "html body words in paragraph",
        "pdf line content",
    ]


def test_span_reconstruction_invariant_on_corpus():
    from epstein_browser_spark.synth import make_transcripts_pdf

    df = make_transcripts_pdf(n_convs=30)
    out = extract_batch(df["text"], df["tool"])
    for _, r in out.iterrows():
        assert _reconstruct(r) == r["clean_text"]


def test_html_tag_density_drops_markup_heavy_blocks():
    """North-star DOM heuristic #3: a block whose raw chars are mostly
    markup is boilerplate even when its words are numerous and its links
    few (e.g. styling-wrapper soup)."""
    heavy = ("<p>" + "".join(
        f'<b class="x{i}" style="font-weight:bold">w{i}</b> ' for i in range(8)
    ) + "</p>")
    clean = "<p>eight plain words of real prose content here</p>"
    out = extract_batch(
        pd.Series([heavy, clean]), pd.Series(["html", "html"])
    )
    assert out["clean_text"][0] == ""          # dropped: tag-density > 0.7
    assert "real prose" in out["clean_text"][1]  # kept: tag-density ~ 0


def test_tag_density_counts_markup_exactly():
    """A block that is mostly markup must be dropped: '<b>w</b> '×8 has a
    true markup share of 7/9 > 0.7; the old space-replacement measurement
    credited one visible char per tag and computed ~0.56, letting it
    through."""
    import pandas as pd

    from epstein_browser_spark.core.extract import _extract_html_mode

    markup_heavy = "<p>" + "<b>w</b> " * 8 + "</p>"
    out = _extract_html_mode(pd.Series([markup_heavy]))
    assert len(out) == 0
    # a normal prose block with light inline markup still passes
    prose = ("<p>plain sentence with <b>one</b> bold word and otherwise "
             "ordinary visible text content here</p>")
    out2 = _extract_html_mode(pd.Series([prose]))
    assert len(out2) == 1 and "bold word" in out2.iloc[0]["seg_text"]
