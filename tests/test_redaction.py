"""PII redaction, URL/domain extraction, C4/Gopher quality rules."""

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark import redaction


def test_pii_redaction_classes(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b+c@ex-ample.co.uk or call 555-010-1234 "
                "from 192.168.0.1 ssn 123-45-6789",
                "no pii here at all",
                "two mails x@y.io z@w.ai and ip 10.0.0.255",
            ],
        }
    )
    out = redaction.pii_counts(spark.createDataFrame(pdf)).toPandas().set_index("id")
    r0 = out.loc[0]
    assert r0["n_email"] == 1 and r0["n_phone"] == 1
    assert r0["n_ipv4"] == 1 and r0["n_ssn"] == 1 and r0["n_pii"] == 4
    t0 = r0["redacted_text"]
    assert "<EMAIL>" in t0 and "<PHONE>" in t0 and "<IP>" in t0 and "<SSN>" in t0
    for leak in ("a.b+c@", "555-010", "192.168", "123-45-6789"):
        assert leak not in t0
    assert out.loc[1, "n_pii"] == 0
    assert out.loc[1, "redacted_text"] == "no pii here at all"
    assert out.loc[2, "n_email"] == 2 and out.loc[2, "n_ipv4"] == 1


def test_url_domains(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "see https://Docs.Example.org/a/b?q=1 and http://cdn.net/x.js done",
                "plain text without links",
            ],
        }
    )
    out = redaction.url_domains(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 2  # doc 1 contributes nothing
    assert set(out["domain"]) == {"docs.example.org", "cdn.net"}
    assert out[out["domain"] == "docs.example.org"]["url"].iloc[0].endswith("?q=1")


def test_quality_rule_flags(spark):
    good = "this is a perfectly normal document with reasonable words.\n" \
           "it has several distinct lines of content in it.\n" \
           "each line ends with terminal punctuation."
    duppy = "same line repeated\n" * 10 + "tail"
    symbols = "word " * 10 + "#### #### ####"
    short = "too short"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [good, duppy, symbols, short, ""],
        }
    )
    out = (
        redaction.quality_rule_flags(spark.createDataFrame(pdf))
        .toPandas().set_index("id")
    )
    assert bool(out.loc[0, "keep"])
    assert out.loc[0, "terminal_punct_ratio"] == 1.0
    assert out.loc[0, "dup_line_frac"] == 0.0

    assert not bool(out.loc[1, "keep"])  # 9/11 duplicate lines
    assert out.loc[1, "dup_line_frac"] > 0.5

    assert not bool(out.loc[2, "keep"])  # symbol ratio 12/13 words
    assert out.loc[2, "symbol_word_ratio"] > 0.1

    assert not bool(out.loc[3, "keep"])  # word count below min
    assert out.loc[4, "n_words"] == 0 and not bool(out.loc[4, "keep"])


def test_quality_bullet_lines(spark):
    text = "intro line.\n- first bullet\n- second bullet\n* third\nclosing."
    out = redaction.quality_rule_flags(
        spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    ).toPandas()
    assert abs(out["bullet_line_frac"][0] - 3 / 5) < 1e-9


def test_contamination_report(spark):
    from epstein_browser_spark import textstats

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                    "totally different words one two three four five six seven",
                    "prefix alpha beta gamma delta epsilon zeta eta theta suffix",
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [100],
             "text": ["alpha beta gamma delta epsilon zeta eta theta"]}
        )
    )
    rep = (
        textstats.contamination_report(corpus, bench, n=8)
        .toPandas().set_index("id")
    )
    # docs 0 and 2 contain the benchmark 8-gram; doc 1 does not
    assert sorted(rep.index) == [0, 2]
    assert (rep["n_benchmark_docs"] == 1).all()
    assert (rep["n_shared_grams"] >= 1).all()


def test_vocab_stats(spark):
    from epstein_browser_spark import textstats

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["the cat the dog the end", "the bird and cat"],
            }
        )
    )
    out = textstats.vocab_stats(df, k=3).toPandas()
    assert list(out["token"])[0] == "the"
    assert out["n_occurrences"][0] == 4 and out["n_docs"][0] == 2
    assert out[out["token"] == "cat"]["n_docs"].iloc[0] == 2


def test_curation_redact_pii(spark):
    from epstein_browser_spark import curation
    from epstein_browser_spark.pipeline import extract_transcripts

    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "turn_idx": [0, 0],
            "role": ["user", "user"],
            "tool": [None, None],
            "ts": pd.Timestamp("2025-01-01"),
            "text": [
                "please email results to analyst@example.com before the meeting",
                "a completely clean message about flight schedules and records",
            ],
        }
    )
    extracted = extract_transcripts(spark.createDataFrame(pdf), n_buckets=2)
    cur = curation.curate_documents(extracted, redact_pii=True).toPandas()
    by_conv = cur.set_index("conv_id")
    assert "<EMAIL>" in by_conv.loc["a", "clean_text"]
    assert "analyst@" not in by_conv.loc["a", "clean_text"]
    assert by_conv.loc["a", "n_pii"] == 1 and by_conv.loc["b", "n_pii"] == 0


def test_pack_sequences_invariants(spark):
    """Packing invariants: within a shard, cum_tokens is the running sum in
    doc order; a doc starts in sequence floor(preceding_tokens/budget);
    sequence ids are non-decreasing; assignment is identical across input
    partitionings (layout independence)."""
    from epstein_browser_spark import textstats

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(90)) + 10).alias("n_tokens"),
    )
    packed = textstats.pack_sequences(df, budget=100, n_shards=4).toPandas()
    for _shard, grp in packed.groupby("shard"):
        grp = grp.sort_values("doc_id")
        assert list(grp["cum_tokens"]) == list(grp["n_tokens"].cumsum())
        assert (grp["seq_in_shard"].diff().fillna(0) >= 0).all()
        starts = (grp["cum_tokens"] - grp["n_tokens"]) // 100
        assert list(starts) == list(grp["seq_in_shard"])
    repart = textstats.pack_sequences(
        df.repartition(7), budget=100, n_shards=4
    ).toPandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        packed.sort_values(key).reset_index(drop=True),
        repart.sort_values(key).reset_index(drop=True),
    )


def test_redaction_order_email_before_url_class(spark):
    # an email inside a URL-ish context must not leave the host exposed
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["ping admin@internal.example.com now"]})
    )
    out = df.select(redaction.redact(F.col("text")).alias("t")).toPandas()
    assert out["t"][0] == "ping <EMAIL> now"


def test_pii_counts_match_emitted_tags(spark):
    """Audit counts reflect what the redacted output CONTAINS: a phone
    shape nested inside an email is consumed by the email pass, so
    n_email=1 and n_phone=0 — never a claimed redaction that is not in
    the output. An international '+' is consumed by the phone tag."""
    import pandas as pd

    from epstein_browser_spark import redaction

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["contact 555-123-4567@example.com today",
                 "call +555-010-1234 now"],
    })
    out = (
        redaction.pii_counts(spark.createDataFrame(pdf))
        .toPandas().set_index("id")
    )
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_phone"] == 0
    assert out.loc[1, "n_pii"] == 1
    assert "<EMAIL>" in out.loc[1, "redacted_text"]
    assert out.loc[2, "n_phone"] == 1
    assert out.loc[2, "redacted_text"] == "call <PHONE> now"


def test_quality_rules_crlf_lines(spark):
    """CRLF documents: \\r must not survive line splitting — blank '\\r'
    lines inflated dup_line_frac past the keep gate and zeroed
    terminal_punct_ratio."""
    import pandas as pd

    from epstein_browser_spark import redaction

    text = ("the first paragraph sentence ends properly.\r\n\r\n"
            "the second paragraph sentence also ends properly.\r\n\r\n"
            "the third paragraph sentence likewise ends properly.\r\n")
    out = (
        redaction.quality_rule_flags(
            spark.createDataFrame(pd.DataFrame({"doc_id": [1],
                                                "text": [text]})))
        .toPandas().iloc[0]
    )
    assert out["dup_line_frac"] == 0.0
    assert out["terminal_punct_ratio"] == 1.0
    assert bool(out["keep"])


def test_url_domain_boundaries(spark):
    """Sentence-terminating periods stay out of the domain; ports keep
    their paths attached."""
    import pandas as pd

    from epstein_browser_spark import redaction

    pdf = pd.DataFrame({
        "doc_id": [1],
        "text": ["visit https://example.com. then http://h.io:8080/x/y ok"],
    })
    out = redaction.url_domains(spark.createDataFrame(pdf)).toPandas()
    got = dict(zip(out["domain"], out["url"]))
    assert got["example.com"] == "https://example.com"
    assert got["h.io"] == "http://h.io:8080/x/y"


def test_punct_ratio_unicode_letters(spark):
    """Non-ASCII letters are letters, not punctuation: Java's ASCII \\w
    previously gave a clean French/Russian sentence a punct_ratio near
    the junk band."""
    import pandas as pd

    from epstein_browser_spark.textstats import with_text_stats

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["l'été au café était déjà très agréable cette année là",
                 "обычное предложение на русском языке без пунктуации"],
    })
    out = with_text_stats(spark.createDataFrame(pdf)).toPandas()
    assert (out["punct_ratio"] < 0.1).all()


def test_repetition_fracs_bounded(spark):
    """Degenerate repeats ('a a a a a') produce fractions capped at 1.0 —
    overlapping-window counts otherwise exceed the stream length."""
    import pandas as pd

    from epstein_browser_spark.textstats import repetition_signals

    out = (
        repetition_signals(spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["a a a a a"]})))
        .toPandas().iloc[0]
    )
    assert out["top_bigram"] == "a a"
    assert out["top_bigram_frac"] == 1.0
    assert out["dup_trigram_frac"] <= 1.0
