"""Vectorized per-turn text extraction: plain / OCR-span / HTML / PDF-layout.

Re-expresses the reference's extraction stages as batch pandas transforms:

* span confidence filtering + single-space join
  (/root/reference/ocr_processor.py:92-102, MIN_CONFIDENCE=0.3 at :46)
* layout-aware parsing of page/block text into reading order
  (/root/reference/helpers/explode_pdfs.py:33-72 page/block decomposition;
   /root/reference/ocr_processor_lite.py:70 uniform-block mode)
* HTML boilerplate stripping via tag-density / link-ratio / text-block
  scoring — the north-star generalization of the reference's density/ratio
  quality heuristics (/root/reference/helpers/error_detection.py:126-180)
* search-ready normalization (whitespace collapse + strip)
* meaningful-output gate len(strip) > 10 (/root/reference/ocr_processor.py:190)

Raw `text` payload contracts (ours — the synthetic corpus generator in
``synth.py`` emits exactly these; `tool` column selects the mode):

  tool='spans' : one span per line, ``<confidence>|<span text>``; lines
                 without a parseable confidence default to 1.0.
  tool='html'  : HTML-ish markup; script/style/head and nav/footer/header/
                 aside subtrees are boilerplate; block-level tags delimit
                 candidate text blocks; blocks are kept iff they have
                 >= MIN_BLOCK_WORDS words, link-density <= MAX_LINK_DENSITY,
                 and tag-density <= MAX_TAG_DENSITY (markup share of the
                 block's raw chars).
  tool='pdf'   : one line per layout fragment ``<page>|<col>|<y>|<text>``,
                 emitted in arbitrary order; reading order = sort by
                 (page, col, y); page-furniture lines (bare page numbers)
                 are dropped; consecutive fragments of one (page, col) form
                 a block.
  otherwise    : plain text.

Output per turn: list of normalized segments; ``clean_text`` is the
single-space join of segments, and spans are (start, end, kind) char offsets
into clean_text (end-exclusive). Invariant: joining the span substrings with
single spaces reconstructs clean_text exactly.

Everything here is pandas-vectorized (explode / regex / groupby); the only
per-row work is assembling the final nested span lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_SPAN_CONFIDENCE = 0.3
MEANINGFUL_GATE = 10
MIN_BLOCK_WORDS = 5
MAX_LINK_DENSITY = 0.5
MAX_TAG_DENSITY = 0.7  # share of block chars that are markup, not text

# -- HTML regexes ------------------------------------------------------------
_HTML_DROP_SUBTREES_RE = (
    r"(?is)<(script|style|head|nav|footer|header|aside)\b[^>]*>.*?</\1\s*>"
)
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_BLOCK_TAG_SPLIT_RE = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|section|"
    r"article|main|blockquote|pre|form|hr)\b[^>]*/?>"
)
_ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_ANY_TAG_RE = r"(?s)<[^>]+>"

# -- PDF regexes -------------------------------------------------------------
_PDF_LINE_RE = r"^(\d+)\|(\d+)\|(\d+)\|(.*)$"
_PAGE_FURNITURE_RE = r"^\s*(?:Page\s+)?\d+\s*$"

_WS_RE = r"\s+"


def _normalize(s: pd.Series) -> pd.Series:
    """Search-ready normalization: collapse whitespace runs, strip.

    ``' '.join(t.split())`` — exactly the reference's join/split/strip
    semantics (/root/reference/ocr_processor.py:101-102) and 3.5× faster
    than a pandas regex replace (which is the same object-array loop
    internally, plus regex machinery per row)."""
    vals = s.fillna("").astype(str)
    return pd.Series(
        [" ".join(t.split()) for t in vals], index=vals.index, dtype=object
    )


def _segments_to_rows(
    seg: pd.DataFrame, n: int
) -> tuple[list[str], list[list[int]], list[list[int]], list[list[str]]]:
    """From exploded segments (_row, seg_text, kind) sorted by _row (stable,
    mode order preserved within a row), build per-input-row clean_text plus
    parallel span arrays (starts, ends, kinds). Offsets are computed with
    flat numpy cumsums over run boundaries — no per-group pandas calls (a
    groupby.transform(lambda) here costs ~1ms per group, which at 10k
    rows/batch dominates the whole extraction). Spans travel as three flat
    arrays, not list-of-dicts: Arrow-serializing per-row dicts costs more
    than the extraction itself; the JVM zips them into structs afterwards.
    """
    texts = [""] * n
    starts: list[list[int]] = [[] for _ in range(n)]
    ends: list[list[int]] = [[] for _ in range(n)]
    kinds_out: list[list[str]] = [[] for _ in range(n)]
    if len(seg) == 0:
        return texts, starts, ends, kinds_out
    seg = seg[seg["seg_text"].str.len() > 0]
    if len(seg) == 0:
        return texts, starts, ends, kinds_out
    rows = seg["_row"].to_numpy()
    seg_texts = seg["seg_text"].tolist()
    kinds = seg["kind"].tolist()
    lens = np.fromiter((len(t) for t in seg_texts), dtype=np.int64,
                       count=len(seg_texts))
    # global start = cumsum of (len+1) shifted; rebase per row-run
    gstart = np.cumsum(lens + 1) - (lens + 1)
    run_first = np.empty(len(rows), dtype=bool)
    run_first[0] = True
    np.not_equal(rows[1:], rows[:-1], out=run_first[1:])
    base = gstart[run_first][np.cumsum(run_first) - 1]
    start = (gstart - base).tolist()
    end = (gstart - base + lens).tolist()
    bounds = np.flatnonzero(run_first)
    stops = np.r_[bounds[1:], len(rows)]
    for b, e in zip(bounds, stops):
        r = rows[b]
        texts[r] = " ".join(seg_texts[b:e])
        starts[r] = start[b:e]
        ends[r] = end[b:e]
        kinds_out[r] = kinds[b:e]
    return texts, starts, ends, kinds_out


# -- mode extractors: each returns an exploded segment frame ------------------
# columns: _row (positional input row id), seg_text (normalized), kind


def _extract_spans_mode(text: pd.Series) -> pd.DataFrame:
    lines = text.fillna("").astype(str).str.split("\n")
    ex = lines.explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame(columns=["_row", "seg_text", "kind"])
    df = pd.DataFrame({"_row": ex.index, "raw": ex.to_numpy()})
    parts = df["raw"].str.partition("|")
    has_sep = parts[1] == "|"
    conf = pd.to_numeric(parts[0].where(has_sep), errors="coerce")
    conf = conf.where(has_sep & conf.notna(), 1.0)
    body = parts[2].where(has_sep & pd.to_numeric(parts[0], errors="coerce").notna(),
                          df["raw"])
    df["seg_text"] = _normalize(body)
    df["kind"] = "span"
    keep = (conf >= MIN_SPAN_CONFIDENCE) & (df["seg_text"].str.len() > 0)
    return df.loc[keep, ["_row", "seg_text", "kind"]]


def _extract_html_mode(text: pd.Series) -> pd.DataFrame:
    s = text.fillna("").astype(str)
    s = s.str.replace(_HTML_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_HTML_DROP_SUBTREES_RE, " ", regex=True)
    blocks = s.str.split(_BLOCK_TAG_SPLIT_RE, regex=True)
    ex = blocks.explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame(columns=["_row", "seg_text", "kind"])
    df = pd.DataFrame({"_row": ex.index, "raw": ex.to_numpy()})
    # the three block scores of the north-star DOM heuristics:
    #   link-density: chars of anchor text / chars of visible text
    #   tag-density:  share of the block's raw chars that are markup
    #   text-block:   visible word count
    # anchor text may contain nested inline tags (<a><b>x</b></a>) —
    # strip them before measuring, or markup inflates link density
    anchor_text = df["raw"].str.findall(_ANCHOR_TEXT_RE).str.join(" ")
    anchor_len = _normalize(
        anchor_text.str.replace(_ANY_TAG_RE, " ", regex=True)
    ).str.len()
    untagged = df["raw"].str.replace(_ANY_TAG_RE, " ", regex=True)
    visible = _normalize(untagged)
    vis_len = visible.str.len()
    n_words = visible.str.count(r"\S+")
    link_density = anchor_len / vis_len.replace(0, 1)
    raw_len = df["raw"].str.len()
    # markup share measured by REMOVING tags: the space-replacement form
    # (kept above only for visible-text extraction) credits one visible
    # char per tag, so markup-heavy blocks undercounted by 1 char/tag and
    # slid under MAX_TAG_DENSITY ('<b>w</b> '×8: true 0.78, old 0.56)
    detagged_len = df["raw"].str.replace(_ANY_TAG_RE, "", regex=True).str.len()
    tag_density = 1.0 - detagged_len / raw_len.replace(0, 1)
    df["seg_text"] = visible
    df["kind"] = "block"
    keep = (
        (n_words >= MIN_BLOCK_WORDS)
        & (link_density <= MAX_LINK_DENSITY)
        & (tag_density <= MAX_TAG_DENSITY)
    )
    return df.loc[keep, ["_row", "seg_text", "kind"]]


def _extract_pdf_mode(text: pd.Series) -> pd.DataFrame:
    lines = text.fillna("").astype(str).str.split("\n")
    ex = lines.explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame(columns=["_row", "seg_text", "kind"])
    df = pd.DataFrame({"_row": ex.index, "raw": ex.to_numpy()})
    # split is ~2x a 4-group regex extract; validity = 3 numeric prefixes
    parts = df["raw"].str.split("|", n=3, expand=True)
    if parts.shape[1] < 4:
        return pd.DataFrame(columns=["_row", "seg_text", "kind"])
    # contract: the three prefixes are digit runs (same acceptance as the
    # ^(\d+)\|(\d+)\|(\d+)\| regex — isdigit + parseable excludes signs,
    # decimals, exponents, and whitespace)
    ok = (
        parts[0].str.isdigit().fillna(False)
        & parts[1].str.isdigit().fillna(False)
        & parts[2].str.isdigit().fillna(False)
        & parts[3].notna()
    )
    page = pd.to_numeric(parts[0].where(ok), errors="coerce")
    col = pd.to_numeric(parts[1].where(ok), errors="coerce")
    y = pd.to_numeric(parts[2].where(ok), errors="coerce")
    ok &= page.notna() & col.notna() & y.notna()
    df = df[ok].assign(
        page=page[ok].astype("int64"),
        col=col[ok].astype("int64"),
        y=y[ok].astype("int64"),
        seg_text=_normalize(parts.loc[ok, 3]),
    )
    furniture = df["seg_text"].str.match(_PAGE_FURNITURE_RE)
    df = df[~furniture & (df["seg_text"].str.len() > 0)]
    # reading order within each turn: page, then column, then y
    df = df.sort_values(["_row", "page", "col", "y"], kind="stable")
    # merge consecutive fragments of the same (page, col) into one block
    grp = df.groupby(["_row", "page", "col"], sort=False)
    merged = grp["seg_text"].agg(" ".join).reset_index()
    merged["kind"] = "block"
    return merged[["_row", "seg_text", "kind"]]


def _extract_plain_mode(text: pd.Series) -> pd.DataFrame:
    clean = _normalize(text)
    df = pd.DataFrame({"_row": clean.index, "seg_text": clean.to_numpy()})
    df["kind"] = "text"
    return df[df["seg_text"].str.len() > 0]


_MODE_FNS = {
    "spans": _extract_spans_mode,
    "html": _extract_html_mode,
    "pdf": _extract_pdf_mode,
}


def extract_batch(text: pd.Series, tool: pd.Series) -> pd.DataFrame:
    """Extract a batch of turns.

    Returns a DataFrame aligned positionally with the inputs:
      clean_text, spans (list[dict]), parse_failed, chars_in, chars_out,
      boilerplate_ratio.
    """
    n = len(text)
    text = text.reset_index(drop=True)
    tool = tool.reset_index(drop=True).fillna("").astype(str)
    frames = []
    for mode, fn in _MODE_FNS.items():
        mask = tool == mode
        if mask.any():
            sub = text[mask]
            frames.append(fn(sub))
    plain_mask = ~tool.isin(list(_MODE_FNS))
    if plain_mask.any():
        frames.append(_extract_plain_mode(text[plain_mask]))
    seg = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=["_row", "seg_text", "kind"])
    )
    # restore global input order of segments: stable sort on _row keeps each
    # mode's internal segment order
    seg = seg.sort_values("_row", kind="stable").reset_index(drop=True)
    texts, starts, ends, kinds = _segments_to_rows(seg, n)
    clean = pd.Series(texts, dtype=object)
    chars_in = text.fillna("").astype(str).str.len().astype("int64")
    chars_out = clean.str.len().astype("int64")
    ratio = np.where(chars_in > 0, 1.0 - chars_out / chars_in.replace(0, 1), 0.0)
    return pd.DataFrame(
        {
            "clean_text": clean,
            "span_starts": pd.Series(starts, dtype=object),
            "span_ends": pd.Series(ends, dtype=object),
            "span_kinds": pd.Series(kinds, dtype=object),
            "parse_failed": (clean.str.strip().str.len() <= MEANINGFUL_GATE),
            "chars_in": chars_in,
            "chars_out": chars_out,
            "boilerplate_ratio": pd.Series(ratio, dtype="float64"),
        }
    )
