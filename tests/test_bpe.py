"""Real BPE (bpe.py): golden parity with a pure-Python reference
implementation of the published algorithm (train + apply), determinism
across partitionings, and the frozen-merges resource's self-consistency."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import bpe


# -- pure-Python reference (the published algorithm, independent code) ----

def ref_apply(word: str, merges) -> list[str]:
    syms = list(word) + [bpe.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_train(words_with_counts, n_merges):
    from collections import Counter
    vocab = {}
    for w, c in words_with_counts:
        k = tuple(list(w) + [bpe.EOW])
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = {tuple(ref_apply_once(list(k), best)): c
                 for k, c in _merge_items(vocab, best)}
    return merges


def _merge_items(vocab, best):
    # ref_apply_once mutates a copy; aggregate collided keys
    from collections import Counter
    agg = Counter()
    for k, c in vocab.items():
        agg[tuple(ref_apply_once(list(k), best))] += c
    return agg.items()


def ref_apply_once(syms, pair):
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


SAMPLE = [
    ("lower", 5), ("low", 7), ("lowest", 2), ("newer", 6), ("new", 3),
    ("wider", 3), ("widest", 1), ("error", 4), ("rower", 2),
]


def test_train_matches_reference():
    assert bpe.train_merges_local(SAMPLE, n_merges=20) == ref_train(SAMPLE, 20)


def test_spark_apply_matches_reference(spark):
    merges = bpe.train_merges_local(SAMPLE, n_merges=15)
    words = [w for w, _ in SAMPLE] + ["unseen", "xyz", "a", "lowlow"]
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    got = df.select(
        "w", bpe.tokenize_words(F.col("w"), merges).alias("toks")
    ).toPandas().set_index("w")["toks"].to_dict()
    for w in words:
        assert list(got[w]) == ref_apply(w, merges), w


def test_doc_counts_and_partition_invariance(spark):
    merges = bpe.train_merges_local(SAMPLE, n_merges=15)
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["lower lowest  newer", "new error rower wider", "", "   "],
    })
    df = spark.createDataFrame(pdf)
    out = bpe.doc_bpe_token_counts(df, merges).toPandas().set_index("id")
    exp = {
        0: sum(len(ref_apply(w, merges)) for w in ["lower", "lowest", "newer"]),
        1: sum(len(ref_apply(w, merges))
               for w in ["new", "error", "rower", "wider"]),
        2: 0, 3: 0,
    }
    for k, v in exp.items():
        assert out.loc[k, "n_bpe_tokens"] == v
    re7 = bpe.doc_bpe_token_counts(df.repartition(7), merges).toPandas()
    pd.testing.assert_frame_equal(
        out.reset_index().sort_values("id").reset_index(drop=True),
        re7.sort_values("id").reset_index(drop=True),
    )


def test_training_partition_invariance(spark, corpus_sdf):
    """Corpus-trained merges are identical regardless of input layout —
    the word-type table is a deterministic top-k."""
    docs = corpus_sdf.select(F.col("conv_id").alias("doc_id"), "text")
    m1 = bpe.train_merges(docs, n_merges=25, max_word_types=500)
    m2 = bpe.train_merges(docs.repartition(9), n_merges=25,
                          max_word_types=500)
    assert m1 == m2 and len(m1) > 0


def test_frozen_resource_loads_and_applies(spark):
    from epstein_browser_spark.queries import _bpe_merges
    merges = _bpe_merges()
    assert len(merges) > 50
    df = spark.createDataFrame(pd.DataFrame({"w": ["window", "partition"]}))
    got = df.select(bpe.tokenize_words(F.col("w"), merges).alias("t")).collect()
    for row, w in zip(got, ["window", "partition"]):
        toks = list(row["t"])
        assert "".join(toks).replace(bpe.EOW, "") == w
        assert toks == ref_apply(w, merges)


def test_sentinel_word_is_cleaned(spark):
    merges = bpe.train_merges_local(SAMPLE, n_merges=5)
    df = spark.createDataFrame(pd.DataFrame({"w": ["lo\x1fwer"]}))
    got = df.select(bpe.tokenize_words(F.col("w"), merges).alias("t")).collect()
    assert "".join(got[0]["t"]).replace(bpe.EOW, "") == "lower"


def test_curation_budgets_with_bpe_counts(spark):
    """run-curation-shaped path with bpe_merges: the curated table's
    n_tokens are the BPE chain's counts (what packing/mixtures budget
    with), not the whitespace proxy."""
    from epstein_browser_spark import curation
    from epstein_browser_spark.pipeline import extract_transcripts

    merges = bpe.train_merges_local(SAMPLE, n_merges=15)
    pdf = pd.DataFrame({
        "conv_id": ["a", "b"],
        "turn_idx": [0, 0],
        "role": ["user", "user"],
        "tool": pd.array([None, None], dtype="string"),
        "ts": pd.Timestamp("2025-03-01"),
        "text": ["the lower and newer records remain lower than the widest",
                 "an error in the rower manifest kept the new entry wider"],
    })
    extracted = extract_transcripts(spark.createDataFrame(pdf), n_buckets=2)
    cur = curation.curate_documents(extracted, bpe_merges=merges).toPandas()
    assert len(cur) == 2
    exp = bpe.doc_bpe_token_counts(
        spark.createDataFrame(cur[["conv_id", "clean_text"]]), merges,
        text_col="clean_text", id_col="conv_id",
    ).toPandas().set_index("id")["n_bpe_tokens"].to_dict()
    got = cur.set_index("conv_id")["n_tokens"].to_dict()
    assert got == exp
    ws = cur["clean_text"].str.split().str.len()
    assert (cur.set_index("conv_id")["n_tokens"].values != ws.values).any()


def test_non_ascii_line_separators_wrap_like_training(spark):
    """U+2028/U+0085 are not \\s+ whitespace in Java or RE2, so they stay
    inside words; without DOTALL Java '.' skipped them and the Spark
    apply diverged from training and from the RE2 oracle (r4 review)."""
    w = "foo\u2028bar\u0085x"
    merges = bpe.train_merges_local([(w, 3), ("foo", 2)], 10)
    df = spark.createDataFrame(pd.DataFrame({"w": [w, "ab"]}))
    got = df.select(
        "w", bpe.tokenize_words(F.col("w"), merges).alias("t")
    ).toPandas().set_index("w")["t"].to_dict()
    assert list(got[w]) == ref_apply(w, merges)
    assert list(got["ab"]) == ref_apply("ab", merges)
    counts = bpe.doc_bpe_token_counts(
        spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [w]})),
        merges,
    ).collect()
    assert counts[0]["n_bpe_tokens"] == len(ref_apply(w, merges))
