"""Unit tests for the final round-5 operators: robust length-outlier
gate, Heaps'-law vocabulary growth, per-source unigram KL divergence,
per-chunk language ID / code-switch report.

Each also has a full DuckDB value oracle (q105-q108); these pin the
semantic guarantees the oracles can't express — the MAD=0 degeneracy,
the modified-z hand value, KL's zero at identical distributions and
positivity under skew, vocabulary-curve monotonicity/saturation, the
chunking boundaries and majority tie-break — against hand computations
on tiny inputs, plus layout invariance.
"""

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark import textstats

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# robust_length_outliers
# ---------------------------------------------------------------------------


def test_robust_outlier_hand_case(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(5),
            "source": ["a"] * 5,
            "n_chars": [1, 2, 3, 4, 100],
        }
    )
    out = (
        textstats.robust_length_outliers(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    # median 3, deviations [2,1,0,1,97] -> MAD 1
    assert out["grp_median"].eq(3.0).all()
    assert out["grp_mad"].eq(1.0).all()
    # z(100) = 0.6745 * 97 = 65.4265 — far past any cut
    assert abs(out.loc[4, "robust_z"] - 65.4265) < 1e-6
    assert bool(out.loc[4, "is_outlier"])
    # z(1) = 0.6745 * -2 = -1.349 — inside the 3.5 cut
    assert abs(out.loc[0, "robust_z"] - (-1.349)) < 1e-6
    assert not bool(out.loc[0, "is_outlier"])


def test_robust_outlier_mad_zero_degenerates_to_zero(spark):
    # >half the group shares one length -> MAD 0 -> z defined as 0
    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["a"] * 4,
            "n_chars": [7, 7, 7, 9999],
        }
    )
    out = textstats.robust_length_outliers(
        spark.createDataFrame(pdf)
    ).toPandas()
    assert out["robust_z"].eq(0.0).all()
    assert not out["is_outlier"].any()


def test_robust_outlier_groups_independent(spark):
    # the same length can be an outlier in one source and typical in
    # another — the gate is per-group by construction
    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["a"] * 5 + ["b"] * 5,
            "n_chars": [10, 11, 12, 13, 500] + [480, 490, 500, 510, 520],
        }
    )
    out = (
        textstats.robust_length_outliers(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")
    )
    assert bool(out.loc[4, "is_outlier"])  # 500 among ~10s
    assert not bool(out.loc[7, "is_outlier"])  # 500 among ~500s


# ---------------------------------------------------------------------------
# unigram_kl
# ---------------------------------------------------------------------------


def test_unigram_kl_zero_for_identical_distributions(spark):
    # two sources with IDENTICAL token distributions: each source's
    # distribution equals the corpus distribution, so KL ~ 0 (exactly,
    # up to the +/- 1-micro-nat quantization of each ln term)
    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["a", "a", "b", "b"],
            "text": ["x x y", "z", "x x y", "z"],
        }
    )
    out = textstats.unigram_kl(spark.createDataFrame(pdf)).toPandas()
    assert (out["kl_nats"].abs() < 1e-4).all()
    assert out["n_tokens"].eq(4).all()
    assert out["n_types"].eq(3).all()


def test_unigram_kl_positive_under_skew(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(2),
            "source": ["a", "b"],
            "text": ["x x x x x x x x", "y y y y y y y y"],
        }
    )
    out = (
        textstats.unigram_kl(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("grp")
    )
    # disjoint vocabularies: KL(p_a || p_c) = ln 2 for both sources
    import math

    assert abs(out.loc["a", "kl_nats"] - math.log(2)) < 1e-5
    assert abs(out.loc["b", "kl_nats"] - math.log(2)) < 1e-5


def test_unigram_kl_layout_invariance(spark):
    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    a = textstats.unigram_kl(d).toPandas().sort_values("grp")
    b = (
        textstats.unigram_kl(d.repartition(13, "lang"))
        .toPandas()
        .sort_values("grp")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# vocab_growth
# ---------------------------------------------------------------------------


def test_vocab_growth_hand_case(spark):
    # bucket_docs=2: docs 0,1 -> bucket 0; docs 2,3 -> bucket 1
    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["a"] * 4,
            "text": ["x y", "x", "x z", "x x"],
        }
    )
    out = (
        textstats.vocab_growth(
            spark.createDataFrame(pdf), bucket_docs=2
        )
        .toPandas()
        .set_index("bucket")
        .sort_index()
    )
    assert out.loc[0, "cum_docs"] == 2
    assert out.loc[0, "cum_tokens"] == 3
    assert out.loc[0, "cum_types"] == 2  # x, y
    assert out.loc[1, "cum_docs"] == 4
    assert out.loc[1, "cum_tokens"] == 7
    assert out.loc[1, "cum_types"] == 3  # + z (x already seen)
    assert abs(out.loc[1, "type_token_ratio"] - round(3 / 7, 6)) < 1e-9


def test_vocab_growth_monotone_and_saturates(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.vocab_growth(d).toPandas()
    total_types = (
        d.select(
            F.explode(
                textstats.tokens(F.lower(F.col("text")))
            ).alias("t"),
            "source",
        )
        .groupBy("source")
        .agg(F.countDistinct("t").alias("n"))
        .toPandas()
        .set_index("source")["n"]
    )
    for src, g in out.groupby("grp"):
        g = g.sort_values("bucket")
        for c in ("cum_docs", "cum_tokens", "cum_types"):
            assert g[c].is_monotonic_increasing, (src, c)
        # the curve ends at exactly the per-source distinct-type count
        assert g["cum_types"].iloc[-1] == total_types[src]


# ---------------------------------------------------------------------------
# chunk_langid
# ---------------------------------------------------------------------------

_EN_40 = " ".join(["the and of to in that it is was for"] * 4)
_DE_40 = " ".join(["der die und ein ich dich sich nicht schon unter"] * 4)


def test_chunk_langid_code_switch_detected(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                _EN_40 + " " + _DE_40,  # half English, half German
                _EN_40,  # pure English, one chunk
                "",  # empty -> no chunks
            ],
        }
    )
    out = (
        textstats.chunk_langid(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[0, "n_chunks"] == 2
    assert out.loc[0, "n_langs"] == 2
    assert bool(out.loc[0, "is_code_switched"])
    assert abs(out.loc[0, "lang_agreement"] - 0.5) < 1e-9
    assert out.loc[1, "n_chunks"] == 1
    assert out.loc[1, "majority_lang"] == "en"
    assert out.loc[1, "n_langs"] == 1
    assert not bool(out.loc[1, "is_code_switched"])
    assert out.loc[2, "n_chunks"] == 0
    assert out.loc[2, "majority_lang"] == "und"
    assert not bool(out.loc[2, "is_code_switched"])


def test_chunk_langid_tail_chunk_votes(spark):
    # 41 tokens -> 2 chunks; the 1-token tail is where appended foreign
    # boilerplate would live, so it must get its own vote (here: too
    # short to shingle meaningfully -> 'und', still counted)
    pdf = pd.DataFrame({"doc_id": [0], "text": [_EN_40 + " zz"]})
    out = textstats.chunk_langid(spark.createDataFrame(pdf)).toPandas()
    assert out.loc[0, "n_chunks"] == 2
    assert out.loc[0, "majority_lang"] in ("en", "und")


def test_chunk_langid_layout_invariance(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = textstats.chunk_langid(d).toPandas().sort_values("id")
    b = (
        textstats.chunk_langid(d.repartition(11))
        .toPandas()
        .sort_values("id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# keep_best_in_cluster
# ---------------------------------------------------------------------------


def test_keep_best_hand_case(spark):
    from epstein_browser_spark import dedup

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 9],
            "n_chars": [10, 50, 50, 7],
        }
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    )
    out = (
        dedup.keep_best_in_cluster(spark.createDataFrame(pdf), pairs)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    # {1,2,3} one cluster (labeled by min id): 2 and 3 tie on score 50,
    # tie-break keeps the smaller id
    assert out.loc[[1, 2, 3], "cluster_id"].eq(1).all()
    assert bool(out.loc[2, "is_kept"])
    assert out.loc[2, "rank_in_cluster"] == 1
    assert not bool(out.loc[3, "is_kept"])
    assert out.loc[3, "rank_in_cluster"] == 2
    assert out.loc[1, "rank_in_cluster"] == 3
    # 9 is a singleton: its own kept cluster
    assert out.loc[9, "cluster_id"] == 9
    assert bool(out.loc[9, "is_kept"])


def test_keep_best_exactly_one_kept_per_cluster(spark):
    from epstein_browser_spark import dedup
    from pyspark.sql import functions as SF

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("doc_id < 200")
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)
    out = dedup.keep_best_in_cluster(d, pairs)
    per = out.groupBy("cluster_id").agg(
        SF.sum(SF.col("is_kept").cast("int")).alias("k"),
        SF.max("score").alias("mx"),
        SF.max(SF.when(SF.col("is_kept"), SF.col("score"))).alias("kept_score"),
    ).toPandas()
    assert per["k"].eq(1).all()
    # the kept member always carries the cluster's max score
    assert (per["kept_score"] == per["mx"]).all()


# ---------------------------------------------------------------------------
# template_turns
# ---------------------------------------------------------------------------


def test_template_turns_census(spark):
    from epstein_browser_spark import convstats

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c2", "c3"],
            "role": ["assistant"] * 5,
            "text": ["CANNED", "unique-a", "CANNED", "unique-b", "CANNED"],
        }
    )
    out = convstats.template_turns(spark.createDataFrame(pdf)).toPandas()
    # only the repeated text survives the census
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_occurrences"] == 3
    assert row["n_convs"] == 3
    assert row["turn_len"] == len("CANNED")
    import hashlib

    assert row["text_md5"] == hashlib.md5(b"CANNED").hexdigest()


def test_template_turns_empty_when_all_unique(spark):
    from epstein_browser_spark import convstats

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "role": ["assistant", "user"],
            "text": ["one", "two"],
        }
    )
    assert (
        convstats.template_turns(spark.createDataFrame(pdf)).count() == 0
    )


# ---------------------------------------------------------------------------
# leakage_safe_split / split_leakage / budgeted_source_sample
# ---------------------------------------------------------------------------


def _split_of(i: int) -> str:
    import hashlib

    b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_leakage_safe_split_cluster_atomic(spark):
    from epstein_browser_spark import dedup

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1], "id_b": [2]})
    )
    out = (
        dedup.leakage_safe_split(docs, pairs)
        .toPandas().set_index("id").sort_index()
    )
    # cluster {1,2} takes the split of its min id; 3 stays naive
    assert out.loc[1, "cluster_id"] == 1 and out.loc[2, "cluster_id"] == 1
    assert out.loc[1, "split"] == _split_of(1)
    assert out.loc[2, "split"] == _split_of(1)
    assert out.loc[3, "split"] == _split_of(3)
    # naive_split is the per-doc hash; was_leaky iff the rule moved it
    for i in (1, 2, 3):
        assert out.loc[i, "naive_split"] == _split_of(i)
        assert out.loc[i, "was_leaky"] == (
            out.loc[i, "split"] != out.loc[i, "naive_split"]
        )
    # every cluster is split-atomic
    assert out.groupby("cluster_id")["split"].nunique().eq(1).all()


def test_split_leakage_detects_cross_split_gram(spark):
    from epstein_browser_spark import textstats

    # pick ids landing in train / test / train by the md5 bucket
    train_id = next(i for i in range(1000) if _split_of(i) == "train")
    test_id = next(i for i in range(1000) if _split_of(i) == "test")
    train_id2 = next(
        i for i in range(train_id + 1, 2000) if _split_of(i) == "train"
    )
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [train_id, test_id, train_id2],
                "text": [
                    shared + " train tail words here",
                    shared + " totally different suffix",
                    "no overlap with anything else at all in this one",
                ],
            }
        )
    )
    out = textstats.split_leakage(docs, n=8).toPandas()
    # exactly the test doc is reported, against exactly one train doc
    assert len(out) == 1
    row = out.iloc[0]
    assert row["id"] == test_id and row["split"] == "test"
    assert row["n_shared_grams"] == 1 and row["n_train_docs"] == 1


def test_budgeted_source_sample_budget_rule(spark):
    from epstein_browser_spark import textstats

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "lang": ["a"] * 3,
                "n_tokens": [5, 5, 5],
            }
        )
    )
    out = (
        textstats.budgeted_source_sample(
            docs, group_col="lang", budget_tokens=8
        )
        .toPandas().sort_values("sel_rank")
    )
    # single source: budget == B; docs taken in md5 order until the
    # first crossing (included) — 5 < 8 keep, 10-5=5 < 8 keep, 15-10 drop
    assert (out["budget_tokens"] == 8).all()
    assert len(out) == 2
    assert list(out["cum_tokens"]) == [5, 10]
    # the kept prefix obeys the crossing rule exactly
    assert ((out["cum_tokens"] - out["n_tokens"]) < 8).all()


def test_budgeted_source_sample_every_source_contributes(spark):
    from epstein_browser_spark import textstats

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(10)),
                "lang": ["a"] * 8 + ["b"] * 2,
                "n_tokens": [100] * 8 + [10] * 2,
            }
        )
    )
    out = textstats.budgeted_source_sample(
        docs, group_col="lang", budget_tokens=50
    ).toPandas()
    # α upsamples the small source; both sources select ≥ 1 doc and
    # selections stay per-source ordered prefixes
    assert set(out["src"]) == {"a", "b"}
    per = out.groupby("src")["sel_rank"]
    assert (per.min() == 1).all()
    assert (per.max() == per.count()).all()


# ---------------------------------------------------------------------------
# q115 / q116 registry-level invariants (value parity is oracle-checked)
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_bounds(spark):
    from epstein_browser_spark.queries import q115_tokenizer_fertility

    out = q115_tokenizer_fertility(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # BPE splits within words and never merges across them, so every
    # word is >= 1 token: fertility >= 1 for every language
    assert (out["fertility"] >= 1.0).all()
    assert (out["n_bpe_tokens"] >= out["n_ws_tokens"]).all()
    assert (out["bytes_per_token"] > 0).all()


def test_split_leak_pairs_policy_contrast(spark):
    from epstein_browser_spark.queries import q116_split_leak_pairs

    out = (
        q116_split_leak_pairs(spark, SF_DIR)
        .toPandas().set_index("policy")
    )
    # same pair universe for both policies; the cluster-atomic rule is
    # leak-free BY CONSTRUCTION while naive hashing measurably leaks
    assert out.loc["naive", "n_pairs"] == out.loc["cluster_atomic", "n_pairs"]
    assert out.loc["naive", "n_pairs"] > 0
    assert out.loc["cluster_atomic", "n_cross_split"] == 0
    assert out.loc["cluster_atomic", "n_train_eval"] == 0
    assert out.loc["naive", "n_cross_split"] >= out.loc["naive", "n_train_eval"]


def test_tokenizer_fertility_wordless_doc_counts_bytes(spark, tmp_path):
    """A whitespace-only doc has 0 words/BPE tokens but its BYTES still
    count toward the language (Spark's explode_outer keeps it; the
    oracle must LEFT-join for the same reason — regression for the
    inner-join form that silently dropped such docs)."""
    import duckdb

    from epstein_browser_spark.queries import (
        _q115_sql,
        q115_tokenizer_fertility,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "en"],
            "text": ["hello world", "   "],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = q115_tokenizer_fertility(spark, str(tmp_path)).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["n_ws_tokens"] == 2
    assert got.iloc[0]["n_bytes"] == len("hello world") + 3

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    exp = con.sql(_q115_sql()).df()
    assert exp.iloc[0]["n_bytes"] == got.iloc[0]["n_bytes"]
    assert exp.iloc[0]["n_bpe_tokens"] == got.iloc[0]["n_bpe_tokens"]


# ---------------------------------------------------------------------------
# embedding_health / code_signals
# ---------------------------------------------------------------------------


def test_embedding_health_classifies_each_defect(spark):
    from pyspark.sql import types as T

    from epstein_browser_spark import similarity

    dim = 4
    unit = [1.0] + [0.0] * (dim - 1)
    half = [0.5] + [0.0] * (dim - 1)
    rows = [
        ("g", unit), ("g", half), ("g", None),
        ("g", [0.0] * dim), ("g", [1.0, 0.0]),
    ]
    schema = T.StructType([
        T.StructField("label", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    out = similarity.embedding_health(
        spark.createDataFrame(rows, schema), expected_dim=dim
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_rows"] == 5 and r["n_null"] == 1
    assert r["n_wrong_dim"] == 1 and r["n_zero"] == 1
    assert r["n_valid"] == 2
    # unit vector -> 1e6 micro-units; the half vector -> 5e5
    assert r["min_norm_micro"] == 500000
    assert r["max_norm_micro"] == 1000000
    assert abs(r["mean_norm"] - 0.75) < 1e-9


def test_code_signals_gate_branches(spark):
    from epstein_browser_spark import textstats

    code = "def f(x):\n    y = x + 1;\n    return y;\n"
    indent_only = "line one\n    indented a\n    indented b"
    prose = "plain prose with no structure at all"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [code, indent_only, prose, ""],
        }
    )
    out = (
        textstats.code_signals(spark.createDataFrame(pdf))
        .toPandas().set_index("id")
    )
    # symbol+keyword branch
    assert bool(out.loc[1, "is_code"])
    assert out.loc[1, "kw_hits"] == 2  # def, return
    assert out.loc[1, "sym_count"] >= 5
    # indent-only branch (no symbols, no keywords)
    assert bool(out.loc[2, "is_code"])
    assert out.loc[2, "sym_count"] == 0 and out.loc[2, "kw_hits"] == 0
    assert out.loc[2, "indent_lines"] == 2 and out.loc[2, "n_lines"] == 3
    # prose and the empty doc stay prose
    assert not bool(out.loc[3, "is_code"])
    assert not bool(out.loc[4, "is_code"])
    assert out.loc[4, "sym_ratio"] == 0.0
