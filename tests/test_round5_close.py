"""Round-5 closing operators: the word-blocklist safety gate (q119) and
URL canonicalization dedup (q120)."""

from pyspark.sql import functions as F

from epstein_browser_spark import redaction


def _gate(spark, rows, permille=25):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = redaction.blocklist_gate(
        df, ["dup", "slow"], max_hits_permille=permille
    )
    return {r["id"]: r.asDict() for r in out.collect()}


def test_blocklist_gate_branches(spark):
    got = _gate(spark, [
        (0, "fast scan merge join"),              # clean
        (1, "dup " + "filler " * 99),             # 1/100 hits, under 2.5%
        (2, "dup slow dup scan"),                 # 3/4 hits, over
        (3, ""),                                  # empty: no drop, ever
    ])
    assert (got[0]["block_hits"], got[0]["drop_any"], got[0]["drop_frac"]) \
        == (0, False, False)
    assert (got[1]["block_hits"], got[1]["drop_any"], got[1]["drop_frac"]) \
        == (1, True, False)
    assert (got[2]["block_hits"], got[2]["n_blocked_kinds"],
            got[2]["drop_any"], got[2]["drop_frac"]) == (3, 2, True, True)
    assert (got[3]["n_words"], got[3]["drop_any"], got[3]["drop_frac"]) \
        == (0, False, False)


def test_blocklist_gate_word_boundary_and_case(spark):
    got = _gate(spark, [
        (0, "dups duplicate backup"),   # substrings never count (C4: words)
        (1, "DUP Slow"),                # case-insensitive
    ])
    assert got[0]["block_hits"] == 0 and not got[0]["drop_any"]
    assert got[1]["block_hits"] == 2 and got[1]["n_blocked_kinds"] == 2


def test_blocklist_gate_boundary_is_exact(spark):
    # 1 hit in exactly 40 words = 25.0 permille: >= keeps the boundary
    # doc in the DROP set on both engines (exact integer cross-multiply,
    # no float at the gate)
    text = "dup " + "x " * 39
    got = _gate(spark, [(0, text.strip())], permille=25)
    assert got[0]["n_words"] == 40 and got[0]["drop_frac"] is True
    # one word fewer hits 1/39 > 25 permille too; one MORE word dips under
    got = _gate(spark, [(0, (text + "y").strip())], permille=25)
    assert got[0]["n_words"] == 41 and got[0]["drop_frac"] is False


CANON_CASES = [
    # mixed-case host + default https port + trailing slash + utm
    ("https://Example.COM:443/a/b/?utm_source=x&id=7",
     "https://example.com/a/b?id=7"),
    # tracking param last: dangling '&' cleaned
    ("https://example.com/a/b?id=7&utm_campaign=y",
     "https://example.com/a/b?id=7"),
    # http default port + fragment; scheme stays significant
    ("http://example.com:80/a/b?id=7#frag", "http://example.com/a/b?id=7"),
    # tracking-only query: the '?' itself goes
    ("https://example.com/p?utm_medium=z", "https://example.com/p"),
    # adjacent tracking params both removed (whole-param filtering)
    ("https://example.com/p?utm_a=1&utm_b=2&id=3&gclid=g",
     "https://example.com/p?id=3"),
    # a param that merely CONTAINS a tracking name is never mangled
    ("https://example.com/p?xutm_source=1&my_gclid=2",
     "https://example.com/p?xutm_source=1&my_gclid=2"),
    # empty/double separators normalize for free under param splitting
    ("https://example.com/p?a=1&&b=2&", "https://example.com/p?a=1&b=2"),
    # NON-default port survives; path case is significant
    ("https://example.com:8443/A/B", "https://example.com:8443/A/B"),
    # empty path normalizes to '/'
    ("https://example.com", "https://example.com/"),
    # multiple trailing slashes
    ("https://example.com/x///", "https://example.com/x"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", redaction.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(CANON_CASES):
        assert got[i] == want, (CANON_CASES[i][0], got[i], want)


def test_canonical_census_merges_variants(spark):
    df = spark.createDataFrame(
        [
            (0, "see https://A.example.org/x/?utm_source=s now"),
            (1, "see https://a.example.org/x later"),
            (2, "and https://a.example.org/x again"),
            (3, "but https://b.example.org/x is another page"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["canonical"]: (r["n_urls"], r["n_docs"], r["n_raw_variants"])
        for r in redaction.canonical_url_census(df).collect()
    }
    assert out["https://a.example.org/x"] == (3, 3, 2)
    assert out["https://b.example.org/x"] == (1, 1, 1)


def test_domain_reputation_gate_invariants(spark, sf_dir):
    from epstein_browser_spark.queries import QUERIES

    rows = QUERIES["q121_domain_reputation"][0](spark, sf_dir).collect()
    assert rows, "domain reputation must be non-vacuous"
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        # the gate IS the exact cross-multiply — never a rounded rate
        assert r["domain_blocked"] == (r["n_flagged"] * 5 >= r["n_docs"] * 4)
        assert r["flag_permille"] == (1000 * r["n_flagged"]) // r["n_docs"]
    # both verdicts must be real on this corpus, or the query pins nothing
    assert {r["domain_blocked"] for r in rows} == {True, False}


def test_conv_safety_drop_atomicity(spark, sf_dir):
    from epstein_browser_spark.queries import QUERIES

    rows = QUERIES["q122_conv_safety_drop"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["conv_drop"] == (r["n_flagged_turns"] > 0)
        # first_flagged_turn exists exactly for dropped conversations
        assert (r["first_flagged_turn"] is not None) == r["conv_drop"]
        if r["first_flagged_turn"] is not None:
            assert 0 <= r["first_flagged_turn"] < r["n_turns"] + 50
    assert {r["conv_drop"] for r in rows} == {True, False}
