"""PII redaction + web-corpus hygiene operators for training-data curation.

All JVM-side regex (`regexp_replace` / `regexp_count` /
`regexp_extract_all` — whole-stage codegen, no Python): the patterns are
deliberately RE2-compatible (no backrefs/lookaround) so every operator is
restatable verbatim in the DuckDB oracle.

These generalize the reference's "scrub before indexing" discipline (the
quality/cleanup gate before content enters the search table,
/root/reference/index_images.py:194-232) to the redaction and URL hygiene
a 100 TB web/transcript corpus needs before LLM training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns (shared verbatim with the SQL oracles)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# the optional '+' sits OUTSIDE the word boundary: \b between a space
# and '+' never matches (both non-word), so the old \b\+? form left a
# stray unredacted '+' on international-style numbers
PHONE_RE = r"(?:\+|\b)[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}\b"
# host = dot-separated labels (a '.' must be FOLLOWED by a label, so a
# sentence-terminating period is not swallowed into the domain and a
# blocklist groupBy never splits 'example.com' from 'example.com.');
# optional :port so 'http://h:8080/x' keeps its path
URL_RE = (r"https?://[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*(?::[0-9]+)?"
          r"(?:/[A-Za-z0-9._~:/?#@!$&'()*+,;=%-]*)?")
DOMAIN_RE = r"https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"

# redaction order matters: SSN/IP before PHONE (their digit shapes are
# disjoint from the phone pattern, but a redacted-first longer match can
# never be re-broken by a later pattern; emails first so user@host.tld
# never leaks a host into the URL/domain pass)
REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact(col: Column) -> Column:
    """Text with every PII class replaced by its tag, applied in
    REDACTIONS order."""
    out = col
    for _name, pat, tag in REDACTIONS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, redacted_text, n_<class>..., n_pii): per-doc redaction with
    per-class match counts — the audit trail a compliance pass needs
    alongside the redacted corpus. Counts are of the TAGS present in the
    redacted output, not of pattern matches against the original text:
    redaction is sequential, so nested classes ('555-123-4567@x.com' —
    a phone shape inside an email) emit one tag, and the audit must say
    what was actually emitted, never claim a redaction that is not in
    the output."""
    c = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"), redact(c).alias("redacted_text")
    )
    for name, _pat, tag in REDACTIONS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count("redacted_text", F.lit(tag))
        )
    total = None
    for name, _p, _t in REDACTIONS:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("n_pii", total)


def url_domains(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per URL occurrence: (id, url, domain). Explode-shaped —
    the corpus-scale form for domain-level filtering/blocklists (the
    downstream groupBy('domain') is an ordinary partial-aggregable
    count)."""
    c = F.col(text_col)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.regexp_extract_all(c, F.lit(URL_RE), 0)).alias("url"),
        )
        .withColumn("domain", F.lower(F.regexp_extract("url", DOMAIN_RE, 1)))
    )


# ---------------------------------------------------------------------------
# C4 / Gopher-style document quality rules (Raffel et al. 2020 "C4";
# Rae et al. 2021 "Gopher" §A1.1) — the standard web-corpus repetition and
# shape filters, as pure column expressions.
# ---------------------------------------------------------------------------

TERMINAL_PUNCT = (".", "!", "?", '"')


def _lines(col: Column) -> Column:
    # split on \r?\n: Spark's trim strips only 0x20, so CRLF documents
    # would otherwise keep a trailing \r per line — every blank line
    # becomes the duplicate '\r', inflating dup_line_frac past the keep
    # gate, and terminal_punct_ratio reads \r as the final character
    return F.filter(
        F.transform(F.split(col, r"\r?\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def quality_rule_flags(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_words: int = 5, max_words: int = 100000,
                       min_mean_word_len: float = 3.0,
                       max_mean_word_len: float = 10.0,
                       max_dup_line_frac: float = 0.3,
                       max_symbol_word_ratio: float = 0.1,
                       extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc C4/Gopher rule metrics + keep flag:

    * ``n_words`` in [min_words, max_words]           (Gopher word count)
    * ``mean_word_len`` in [3, 10]                    (Gopher)
    * ``dup_line_frac`` ≤ 0.3 — duplicate lines within the doc (C4's
      three-sentence dedup, at line granularity)
    * ``symbol_word_ratio`` ≤ 0.1 — '#'/'…'-style symbols per word (Gopher)
    * ``terminal_punct_ratio`` — fraction of lines ending in terminal
      punctuation (C4 keeps only such lines; reported as a ratio here)
    * ``bullet_line_frac`` — lines starting with a bullet (Gopher ≤ 0.9)

    Everything is split/array expressions over the doc's own words and
    lines — per-doc bounded work, no shuffle, no Python."""
    from epstein_browser_spark.textstats import tokens

    c = F.col(text_col)
    words = tokens(c)  # ONE tokenizer definition repo-wide
    n_words = F.size(words)
    # total word chars = chars minus whitespace — avoids an aggregate() HOF
    # (interpreted, re-evaluates the captured split per element: O(len²))
    total_wc = F.length(F.regexp_replace(c, r"\s", ""))
    mean_wl = F.when(
        n_words > 0, total_wc.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    lines = _lines(c)
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(c) - F.length(F.regexp_replace(c, r"[#…]", ""))
    )
    sym_ratio = F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    term = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda s: F.substring(s, -1, 1).isin(*TERMINAL_PUNCT),
            )
        ).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    bullet = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda s: F.substring(s, 1, 1).isin("-", "*", "•"))
        ).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    out = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],  # carried through for composers
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(dup_frac, 6).alias("dup_line_frac"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(term, 6).alias("terminal_punct_ratio"),
        F.round(bullet, 6).alias("bullet_line_frac"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
    )
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# Word-blocklist safety gate (C4's badwords filter, Raffel et al. 2020;
# RefinedWeb/Dolma run the same shape with a fraction threshold instead of
# C4's any-hit drop) — the standard "unsafe page" filter of web curation.
# ---------------------------------------------------------------------------


def blocklist_hits(text: Column, blockwords) -> Column:
    """Whole-token case-insensitive blocklist hit COUNT over ``text`` —
    the column-level kernel shared by blocklist_gate and composers
    (q136's data card), so there is exactly ONE normalized blocklist
    definition: a mixed-case entry can never match in the gate but not
    in a composer's inline copy."""
    from epstein_browser_spark.textstats import tokens

    bw = sorted({w.lower() for w in blockwords})
    if not bw:
        raise ValueError("blocklist needs at least one word")
    return F.size(F.filter(tokens(F.lower(text)), lambda t: t.isin(*bw)))


def blocklist_gate(df: DataFrame, blockwords: list[str],
                   text_col: str = "text", id_col: str = "doc_id",
                   max_hits_permille: int = 25) -> DataFrame:
    """Per-doc word-blocklist audit + both standard gate policies:

    * ``block_hits`` — occurrences of any blocklisted word as a whole
      whitespace token (case-insensitive; substring matches do NOT count
      — C4 matches words, not character spans).
    * ``n_blocked_kinds`` — how many DISTINCT blocklist entries appear.
    * ``drop_any`` — C4 policy: one hit drops the document.
    * ``drop_frac`` — RefinedWeb/Dolma policy: drop only when hits
      exceed ``max_hits_permille`` per thousand tokens. The threshold
      compares EXACT cross-multiplied integers
      (``hits·1000 ≥ permille·n_words``) — no float at the boundary.

    Pure JVM array/lambda expressions over the doc's own tokens — one
    scan, no shuffle, no Python; at 100 TB this is a map-only pass whose
    blocklist is a compile-time literal array (for huge blocklists,
    swap the literal for a broadcast-joined explode — same semantics,
    one extra broadcast)."""
    from epstein_browser_spark.textstats import tokens

    bw = sorted({w.lower() for w in blockwords})
    if not bw:
        raise ValueError("blocklist_gate needs a non-empty blocklist")
    words = tokens(F.lower(F.col(text_col)))
    n_words = F.size(words)
    hits = blocklist_hits(F.col(text_col), bw)
    kinds = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in bw])))
    return df.select(
        F.col(id_col).alias("id"),
        n_words.cast("long").alias("n_words"),
        hits.cast("long").alias("block_hits"),
        kinds.cast("long").alias("n_blocked_kinds"),
        (hits > 0).alias("drop_any"),
        ((n_words > 0) & (hits * 1000 >= F.lit(max_hits_permille) * n_words))
        .alias("drop_frac"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization — the FIRST dedup any web pipeline runs (CommonCrawl
# WET processing dedups by canonical URL before any text hashing): the same
# page arrives as https://Example.COM:443/a/b/?utm_source=x&id=7 and
# https://example.com/a/b?id=7, and byte-level URL equality misses it.
# ---------------------------------------------------------------------------

# tracking params stripped by canonicalization (utm_* family + click ids),
# ANCHORED at the param-name start: the query string is split on '&' and
# each param matched whole, so a param that merely CONTAINS a tracking
# name ('xutm_source=1') is never mangled — the failure mode of the
# regexp_replace-over-the-whole-query form, which would also need a kept
# capture group (Spark spells it '$1', DuckDB '\\1' — patterns shared
# with the oracle must never need a backreference, the repo-wide RE2
# rule).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of one URL, as pure column expressions:

    1. scheme + host lowercased (path/query case is significant, host
       case is not — RFC 3986 §6.2.2.1);
    2. default port stripped per scheme (:443 on https, :80 on http);
    3. fragment dropped (never sent to the server);
    4. tracking query params removed (``utm_*``/``fbclid``/``gclid``)
       by splitting the query on '&' and filtering whole params —
       boundary-exact (a param CONTAINING a tracking name survives) and
       it normalizes empty/double separators for free; a query left
       empty loses its '?';
    5. trailing slashes stripped from a non-root path; an empty path
       normalizes to '/'.
    """
    scheme = F.lower(F.regexp_extract(url, r"^(https?)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^https?://([^/?#]*)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(url, r"^https?://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(rest, r"\?([^#]*)", 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)


def canonical_url_census(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL duplicate census over every URL occurrence in the
    corpus: (canonical, n_urls, n_docs, n_raw_variants). Groups with
    ``n_raw_variants > 1`` are the fetch-level duplicates byte equality
    misses. Explode + ONE partial-aggregable groupBy — the counts and
    the distinct-variant set both combine map-side; at 100 TB the
    canonical key is also the right shuffle key (near-uniform unless one
    URL dominates the crawl, which this census is how you notice)."""
    occ = url_domains(df, text_col=text_col, id_col=id_col).select(
        "id", "url", canonical_url(F.col("url")).alias("canonical")
    )
    return (
        occ.groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("id").alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
        )
        .orderBy(F.desc("n_urls"), F.asc("canonical"))
    )
