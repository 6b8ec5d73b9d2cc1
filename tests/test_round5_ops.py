"""Unit tests for the round-5 training-data operators: TF-IDF top terms,
winnowing fingerprints, DSIR importance weights, SemDeDup.

Each operator also has a full DuckDB value oracle (q77-q80 in
tests/test_queries_oracle.py); these tests pin the SEMANTIC guarantees
the oracles can't express — the winnowing coverage theorem, DSIR's
target-likeness ordering, SemDeDup's keep-lowest-id policy — against
pure-Python references on tiny hand-built inputs.
"""

import hashlib
import math

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark import similarity, textstats


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def _tfidf_docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "apple apple banana common",
                "banana cherry common",
                "cherry cherry cherry common",
                "date common",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_tfidf_top_terms_matches_hand_computation(spark):
    out = (
        textstats.tfidf_top_terms(_tfidf_docs(spark), "text", "doc_id", k=3)
        .toPandas()
        .sort_values(["id", "rank"])
    )
    # hand model: n_docs=4; df(apple)=1, df(banana)=2, df(cherry)=2,
    # df(common)=4, df(date)=1
    def s(tf, df):
        return round(tf * math.log(4 / df), 6)

    doc0 = out[out["id"] == 0]
    assert list(doc0["term"]) == ["apple", "banana", "common"]
    assert list(doc0["tfidf"]) == [s(2, 1), s(1, 2), s(1, 4)]
    # 'common' appears in every doc -> idf ln(1) = 0 exactly
    assert s(1, 4) == 0.0
    doc3 = out[out["id"] == 3]
    assert list(doc3["term"]) == ["date", "common"]  # only 2 distinct terms


def test_tfidf_rank_ties_break_by_term(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["beta alpha", "zeta"]})
    out = (
        textstats.tfidf_top_terms(spark.createDataFrame(pdf), "text",
                                  "doc_id", k=2)
        .toPandas()
        .sort_values(["id", "rank"])
    )
    d0 = out[out["id"] == 0]
    # identical tfidf (tf=1, df=1 each) -> alphabetical order decides
    assert list(d0["term"]) == ["alpha", "beta"]
    assert list(d0["rank"]) == [1, 2]


# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 4, w: int = 5):
    """Pure-Python reference: rightmost-min per w-window of k-gram hashes
    (Schleimer/Wilkerson/Aiken '03 fig. 5), dedup on (hash, pos)."""
    toks = text.lower().split()
    if len(toks) < k + w - 1:
        return set()
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    out = set()
    for end in range(w - 1, len(hs)):
        window = hs[end - w + 1:end + 1]
        m = min(window)
        # rightmost minimal position
        pos = end - list(reversed(window)).index(m)
        out.add((hs[pos], pos))
    return out


def test_winnow_matches_python_reference(spark):
    texts = [
        "a b c d e f g h i j k l m n o p",
        "the quick brown fox jumps over the lazy dog again and again",
        "x y z",  # too short: < k + w - 1 tokens
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = textstats.winnow_fingerprints(
        spark.createDataFrame(pdf), "text", "doc_id", k=4, w=5
    ).toPandas()
    for i, t in enumerate(texts):
        got = set(
            zip(out[out["id"] == i]["fp_hash"], out[out["id"] == i]["fp_pos"])
        )
        assert got == _py_winnow(t), f"doc {i}"


def test_winnow_shared_span_guarantee(spark):
    """The SIGMOD'03 theorem: any shared token run of length >= w + k - 1
    (= 8 here) yields at least one common fingerprint HASH."""
    shared = "one two three four five six seven eight"  # 8 tokens
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                f"alpha beta {shared} gamma delta",
                f"unrelated prefix words here {shared} and other suffix",
            ],
        }
    )
    out = textstats.winnow_fingerprints(
        spark.createDataFrame(pdf), "text", "doc_id", k=4, w=5
    ).toPandas()
    h0 = set(out[out["id"] == 0]["fp_hash"])
    h1 = set(out[out["id"] == 1]["fp_hash"])
    assert h0 & h1, "shared 8-token span must share a fingerprint"


def test_winnow_density_below_full_shingling(spark):
    text = " ".join(f"tok{i}" for i in range(200))
    pdf = pd.DataFrame({"doc_id": [0], "text": [text]})
    out = textstats.winnow_fingerprints(
        spark.createDataFrame(pdf), "text", "doc_id", k=4, w=5
    ).toPandas()
    n_grams = 200 - 4 + 1
    # expected density 2/(w+1) = 1/3 of full shingling; allow slack but
    # require a real reduction
    assert 0 < len(out) < 0.6 * n_grams


# ---------------------------------------------------------------------------
# dsir_logweights
# ---------------------------------------------------------------------------


def _py_dsir(corpus, target, n_buckets=64):
    """Pure-Python reference of the micro-nat quantized DSIR weight."""
    def feats(texts):
        out = []
        for i, t in texts:
            for term in [x for x in __import__("re").split("[^a-z]+",
                                                           t.lower()) if x]:
                b = int(hashlib.md5(term.encode()).hexdigest()[:5], 16) \
                    % n_buckets
                out.append((i, b))
        return out

    raw = feats(corpus)
    tgt = feats(target)
    raw_c, tgt_c = {}, {}
    for _, b in raw:
        raw_c[b] = raw_c.get(b, 0) + 1
    for _, b in tgt:
        tgt_c[b] = tgt_c.get(b, 0) + 1
    tot_raw, tot_tgt = len(raw), len(tgt)
    lr_micro = {
        b: round(
            math.log(((tgt_c.get(b, 0) + 1) / (tot_tgt + n_buckets))
                     / ((n + 1) / (tot_raw + n_buckets))) * 1e6
        )
        for b, n in raw_c.items()
    }
    w = {}
    for i, b in raw:
        w[i] = w.get(i, 0) + lr_micro[b]
    return {i: v / 1e6 for i, v in w.items()}


def test_dsir_matches_python_reference_and_orders_by_likeness(spark):
    corpus = [
        (0, "stocks bonds markets finance trading"),
        (1, "stocks finance markets"),
        (2, "recipe flour sugar butter oven"),
        (3, "flour oven recipe"),
    ]
    target = [(0, corpus[0][1]), (1, corpus[1][1])]  # the finance slice
    pdf = pd.DataFrame(corpus, columns=["doc_id", "text"])
    tdf = pd.DataFrame(target, columns=["doc_id", "text"])
    out = textstats.dsir_logweights(
        spark.createDataFrame(pdf), spark.createDataFrame(tdf),
        "text", "doc_id", n_buckets=64
    ).toPandas()
    got = dict(zip(out["id"], out["log_weight"]))
    ref = _py_dsir(corpus, target, n_buckets=64)
    assert got == ref  # bit-exact: integer micro-nat arithmetic
    # finance docs must outscore cooking docs under a finance target
    assert min(got[0], got[1]) > max(got[2], got[3])


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def _emb_df(spark):
    # two tight clusters far apart + one lone vector; identical vectors
    # within cluster A, near-identical within cluster B
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),          # exact dup of 0
        (2, [0.99, 0.01, 0.0, 0.0]),        # near dup of 0
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.98, 0.02]),        # near dup of 3
        (5, [0.0, -1.0, 0.0, 0.0]),         # lone: negative cosine to all
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_keeps_lowest_id_per_chain(spark):
    out = similarity.semdedup(
        _emb_df(spark), n_centroids=3, threshold=0.3, n_iters=2
    ).toPandas().set_index("id")
    # chain {0,1,2}: 0 survives, 1 and 2 are dups
    assert not out.loc[0, "is_dup"]
    assert out.loc[1, "is_dup"] and out.loc[2, "is_dup"]
    # chain {3,4}: 3 survives
    assert not out.loc[3, "is_dup"] and out.loc[4, "is_dup"]
    # the lone vector never duplicates anything
    assert not out.loc[5, "is_dup"]
    # every input id appears exactly once
    assert sorted(out.index) == [0, 1, 2, 3, 4, 5]


def test_semdedup_cell_bound(spark):
    """Duplicates are only sought WITHIN a cell: vectors in different
    k-means cells are never compared, the |cell|² bound that makes the
    operator scale."""
    out = similarity.semdedup(
        _emb_df(spark), n_centroids=3, threshold=0.3, n_iters=2
    ).toPandas()
    cells = dict(zip(out["id"], out["cell"]))
    # the two tight clusters land in different cells under k=3
    assert cells[0] == cells[1] == cells[2]
    assert cells[3] == cells[4]
    assert cells[0] != cells[3]


# ---------------------------------------------------------------------------
# multimodal real decode (PPM) + nearest-neighbor resample
# ---------------------------------------------------------------------------


def _ppm(w, h, pix, header=None):
    import numpy as np

    body = np.asarray(pix, dtype=np.uint8).tobytes()
    return (header or f"P6\n{w} {h}\n255\n").encode() + body


def test_decode_ppm_roundtrip_and_header_variants():
    import numpy as np

    from epstein_browser_spark import multimodal

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # plain header
    assert (multimodal.decode_image(_ppm(3, 2, img)) == img).all()
    # comment lines + exotic whitespace (the netpbm spec allows both)
    fancy = "P6\n# a comment\n3\t2 # trailing\n255\n"
    # a '#' comment after the dims would eat '255' — keep it simple:
    fancy = "P6\n# a comment\n3\t2\n255\n"
    assert (multimodal.decode_image(_ppm(3, 2, img, fancy)) == img).all()
    # trailing junk after the pixel block is ignored (count-bounded read)
    assert (
        multimodal.decode_image(_ppm(3, 2, img) + b"JUNK") == img
    ).all()


def test_decode_rejects_compressed_and_16bit():
    import numpy as np
    import pytest

    from epstein_browser_spark import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(_ppm(1, 1, img, "P6\n1 1\n65535\n"))


def test_resize_nearest_matches_loop_reference():
    import numpy as np

    from epstein_browser_spark import multimodal

    rng = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(7, 5, 3)
    out = multimodal.resize_nearest(rng, 3, 2)
    expect = np.empty((3, 2, 3), dtype=np.uint8)
    for i in range(3):
        for j in range(2):
            expect[i, j] = rng[(i * 7) // 3, (j * 5) // 2]
    assert (out == expect).all()
    # upscale is allowed too (index repetition)
    up = multimodal.resize_nearest(rng, 14, 10)
    assert up.shape == (14, 10, 3)
    assert (up[0, 0] == rng[0, 0]).all() and (up[-1, -1] == rng[-1, -1]).all()


def test_decoded_features_degrade_per_row(spark):
    """One undecodable payload must not fail the batch: it lands as
    decode_status='stubbed' with null stats while PPM rows decode."""
    import numpy as np

    from epstein_browser_spark import multimodal

    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    rows = [
        (0, "image", bytearray(_ppm(4, 4, img)), "image/x-portable-pixmap",
         4, 4, None),
        (1, "image", bytearray(b"\xff\xd8JPEGJUNK"), "image/jpeg",
         4, 4, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = (multimodal.extract_decoded_features(df)
           .toPandas().set_index("media_id"))
    assert out.loc[0, "decode_status"] == "decoded"
    assert out.loc[0, "r_mean"] == 7.0 and out.loc[0, "width"] == 4
    assert out.loc[1, "decode_status"] == "stubbed"
    assert pd.isna(out.loc[1, "r_mean"])


# ---------------------------------------------------------------------------
# dup_spans (q82), shard_shuffle (q83), lm_perplexity (q84)
# ---------------------------------------------------------------------------


def test_dup_spans_matches_hand_computation(spark):
    """Two docs share two separated 3-gram runs; a third is unique.
    Spans are maximal per-doc islands of duplicated gram positions."""
    shared1 = "alpha beta gamma delta"          # grams at 4 positions
    shared2 = "omega psi chi"                    # 1 gram
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            f"{shared1} unique0a unique0b {shared2} tail0a tail0b",
            f"lead1a lead1b {shared1} mid1a mid1b mid1c {shared2}",
            "totally different words with no repeats at all here",
        ],
    })
    out = (
        textstats.dup_spans(spark.createDataFrame(pdf), "text", "doc_id",
                            n=3, min_docs=2)
        .toPandas().sort_values(["id", "span_start"]).reset_index(drop=True)
    )
    # doc0: tokens [alpha beta gamma delta u0a u0b omega psi chi t0a t0b]
    #   dup 3-gram starts: 0,1 (alpha-beta-gamma, beta-gamma-delta) and
    #   6 (omega-psi-chi) -> spans [0,3] (2 grams) and [6,8] (1 gram)
    d0 = out[out.id == 0]
    assert [tuple(r) for r in d0[["span_start", "span_end", "n_grams"]]
            .itertuples(index=False)] == [(0, 3, 2), (6, 8, 1)]
    d1 = out[out.id == 1]
    assert [tuple(r) for r in d1[["span_start", "span_end", "n_grams"]]
            .itertuples(index=False)] == [(2, 5, 2), (9, 11, 1)]
    assert (out.id == 2).sum() == 0


def test_dup_spans_min_docs_threshold(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["one two three four"] * 3,
    })
    hits3 = textstats.dup_spans(spark.createDataFrame(pdf), "text",
                                "doc_id", n=4, min_docs=3).toPandas()
    assert len(hits3) == 3  # the whole doc is one span in each
    assert set(zip(hits3.span_start, hits3.span_end)) == {(0, 3)}
    hits4 = textstats.dup_spans(spark.createDataFrame(pdf), "text",
                                "doc_id", n=4, min_docs=4).toPandas()
    assert hits4.empty


def test_shard_shuffle_deterministic_and_complete(spark):
    from epstein_browser_spark import ordering

    pdf = pd.DataFrame({"doc_id": list(range(200))})
    df = spark.createDataFrame(pdf)
    a = ordering.shard_shuffle(df, n_shards=16, seed="epoch0").toPandas()
    b = (ordering.shard_shuffle(df.repartition(7), n_shards=16,
                                seed="epoch0").toPandas())
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partitioning-invariant
    # every doc exactly once; per-shard positions are 1..len(shard)
    assert sorted(a.doc_id) == list(range(200))
    for _, grp in a.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    # python reference: shard + rank from md5
    ref = pd.DataFrame({
        "doc_id": pdf.doc_id,
        "skey": [hashlib.md5(f"epoch0:{i}".encode()).hexdigest()
                 for i in pdf.doc_id],
    })
    ref["shard"] = ref.skey.str[:4].apply(lambda h: int(h, 16) % 16)
    ref["pos"] = ref.groupby("shard")["skey"].rank(method="first"
                                                   ).astype(int)
    m = a.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert (m.shard == m.shard_ref).all() and (m.pos == m.pos_ref).all()
    # a new epoch is a different permutation
    c = ordering.shard_shuffle(df, n_shards=16, seed="epoch1").toPandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert not ((merged.shard_a == merged.shard_c)
                & (merged.pos_a == merged.pos_c)).all()


def test_shard_shuffle_rejects_biased_counts(spark):
    from epstein_browser_spark import ordering
    import pytest as _pytest

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
    with _pytest.raises(ValueError, match="65536"):
        ordering.shard_shuffle(df, n_shards=100)


def test_lm_perplexity_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "dogs bark loudly at night",
        "the the the the",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (textstats.lm_perplexity(spark.createDataFrame(pdf), "text",
                                   "doc_id")
           .toPandas().sort_values("id").reset_index(drop=True))

    # pure-python reference with the same integer micro-nat quantization
    from collections import Counter
    toks = [t.lower().split() for t in texts]
    big = Counter()
    ctx = Counter()
    vocab = set()
    for ws in toks:
        vocab.update(ws)
        for x, y in zip(ws, ws[1:]):
            big[(x, y)] += 1
            ctx[x] += 1
    V = len(vocab)

    def lp_micro(x, y):
        return round(math.log((big[(x, y)] + 1) / (ctx[x] + V)) * 1e6)

    for i, ws in enumerate(toks):
        nll = -sum(lp_micro(x, y) for x, y in zip(ws, ws[1:]))
        n = len(ws) - 1
        row = out[out.id == i].iloc[0]
        assert int(row.nll_micro) == nll
        assert int(row.n_bigrams) == n
        assert float(row.score) == round(nll / 1e6 / n, 6)
    # repeated high-probability bigrams score as head; the unique-bigram
    # doc lands in the tail
    assert out[out.id == 3].bucket.iloc[0] == "head"
    assert out[out.id == 2].bucket.iloc[0] == "tail"


def test_lm_perplexity_partitioning_invariant(spark):
    pdf = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"w{i % 7} w{(i + 1) % 5} w{i % 3} w{(i + 2) % 7} "
                 f"w{i % 11} common tail" for i in range(40)],
    })
    df = spark.createDataFrame(pdf)
    a = (textstats.lm_perplexity(df, "text", "doc_id").toPandas()
         .sort_values("id").reset_index(drop=True))
    b = (textstats.lm_perplexity(df.repartition(13), "text", "doc_id")
         .toPandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert set(a.bucket) == {"head", "tail"}


# ---------------------------------------------------------------------------
# eval_containment (q85)
# ---------------------------------------------------------------------------


def test_eval_containment_scores_embedded_item_full(spark):
    """A short eval item embedded verbatim in a long training doc scores
    containment 1.0 — the case Jaccard misses (|A∩B|/|A∪B| -> small as
    the doc grows)."""
    item = "the quick brown fox jumps over the lazy sleeping dog"
    filler = " ".join(f"pad{i}" for i in range(60))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": [f"{filler} {item} {filler}", filler + " tail marker"],
    }))
    bench = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [100], "text": [item]}))
    out = textstats.eval_containment(
        corpus, bench, n=4, threshold=0.5).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.id, row.bench_id) == (0, 100)
    assert float(row.containment) == 1.0
    # Jaccard for the same pair is far below any useful threshold
    n_doc_grams = 2 * 61 + 10 - 3  # distinct 4-grams of the long doc
    assert row.n_shared / n_doc_grams < 0.1


def test_eval_containment_threshold_boundary_on_rounded_ratio(spark):
    """The keep decision compares the 6dp-ROUNDED ratio, and a pair at
    exactly threshold is kept: 5 of 9 item grams shared with n=4 and a
    13-token item -> containment round(5/9,6)=0.555556 >= 0.5 kept;
    4/9 = 0.444444 dropped."""
    # item: 12 tokens -> 9 distinct 4-grams
    item_toks = [f"t{i}" for i in range(12)]
    item = " ".join(item_toks)
    # doc shares the item's first 8 tokens -> grams 1..5 of 9
    doc = " ".join(item_toks[:8] + ["zzz", "yyy", "xxx", "www"])
    corpus = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "text": [doc]}))
    bench = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [100], "text": [item]}))
    kept = textstats.eval_containment(
        corpus, bench, n=4, threshold=0.5).toPandas()
    assert len(kept) == 1 and int(kept.n_shared.iloc[0]) == 5
    assert float(kept.containment.iloc[0]) == round(5 / 9, 6)
    # one fewer shared token -> 4/9 -> dropped at the same threshold
    doc4 = " ".join(item_toks[:7] + ["zzz", "yyy", "xxx", "www", "vvv"])
    corpus4 = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "text": [doc4]}))
    assert textstats.eval_containment(
        corpus4, bench, n=4, threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# ngram_novelty (q86)
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_hand_computation(spark):
    """doc0 shares its first 5 tokens (two 4-grams) with doc1; those
    grams are non-novel for both, everything else is unique."""
    shared = "alpha beta gamma delta epsilon"
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            f"{shared} zeta eta theta",            # 8 toks -> 5 grams
            f"{shared} iota kappa",                # 7 toks -> 4 grams
            "lambda mu nu xi omicron pi",          # 6 toks -> 3 grams
        ],
    }))
    out = (textstats.ngram_novelty(corpus, n=4).toPandas()
           .set_index("id").sort_index())
    assert list(out.index) == [0, 1, 2]
    assert list(out.n_grams) == [5, 4, 3]
    assert list(out.n_novel) == [3, 2, 3]
    assert list(out.novelty) == [round(3 / 5, 6), 0.5, 1.0]


def test_ngram_novelty_partitioning_invariant(spark):
    pdf = pd.DataFrame({
        "doc_id": range(30),
        "text": [" ".join(f"w{(i * 7 + j) % 19}" for j in range(12))
                 for i in range(30)],
    })
    df = spark.createDataFrame(pdf)
    a = (textstats.ngram_novelty(df, n=4).toPandas()
         .sort_values("id").reset_index(drop=True))
    b = (textstats.ngram_novelty(df.repartition(11), n=4).toPandas()
         .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# nb_quality_scores
# ---------------------------------------------------------------------------


def _py_nb(corpus, labeled, n_buckets=64):
    """Pure-Python reference of the micro-nat quantized NB score."""
    import re

    def toks(t):
        return [x for x in re.split("[^a-z]+", t.lower()) if x]

    def bkt(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:5], 16) % n_buckets

    pos, neg = {}, {}
    tot_pos = tot_neg = 0
    for _, t, y in labeled:
        for w in toks(t):
            b = bkt(w)
            if y:
                pos[b] = pos.get(b, 0) + 1
                tot_pos += 1
            else:
                neg[b] = neg.get(b, 0) + 1
                tot_neg += 1
    lr = {
        b: round(
            math.log(((pos.get(b, 0) + 1) / (tot_pos + n_buckets))
                     / ((neg.get(b, 0) + 1) / (tot_neg + n_buckets))) * 1e6
        )
        for b in range(n_buckets)
    }
    out = {}
    for i, t in corpus:
        s = n = 0
        for w in toks(t):
            s += lr[bkt(w)]
            n += 1
        if n:
            out[i] = s / n / 1e6
    return out


_NB_CORPUS = [
    (0, "stocks bonds markets finance trading"),
    (1, "stocks finance markets trading"),
    (2, "recipe flour sugar butter oven"),
    (3, "flour oven recipe sugar"),
    (4, "stocks oven"),            # mixed vocabulary
    (5, "zzzq yyxw"),              # vocabulary never seen in training
]


def test_nb_quality_scores_matches_python_reference(spark):
    labeled = [(0, _NB_CORPUS[0][1], True), (1, _NB_CORPUS[1][1], True),
               (2, _NB_CORPUS[2][1], False), (3, _NB_CORPUS[3][1], False)]
    cdf = spark.createDataFrame(
        pd.DataFrame(_NB_CORPUS, columns=["doc_id", "text"]))
    ldf = spark.createDataFrame(
        pd.DataFrame(labeled, columns=["doc_id", "text", "label"]))
    out = textstats.nb_quality_scores(cdf, ldf, n_buckets=64).toPandas()
    got = dict(zip(out["id"], out["nb_score"]))
    ref = _py_nb(_NB_CORPUS, labeled, n_buckets=64)
    assert got == ref  # bit-exact: integer micro-nat arithmetic
    # supervised ordering: positive-class vocab outscores negative-class
    assert min(got[0], got[1]) > got[4] > max(got[2], got[3])


def test_nb_unseen_vocabulary_scores_smoothing_default(spark):
    """A doc whose tokens hit only buckets absent from training must get
    the add-one default ln((1/(tot_pos+B))/(1/(tot_neg+B))) per token —
    NOT zero (a left join from corpus buckets into a training-only ratio
    table would silently zero them). Class totals are made unequal so
    the default itself is nonzero."""
    n_buckets = 1024
    # one negative token fewer than _NB_CORPUS: tot_pos=9 != tot_neg=8
    labeled = [(0, _NB_CORPUS[0][1], True), (1, _NB_CORPUS[1][1], True),
               (2, _NB_CORPUS[2][1], False), (3, "flour oven sugar", False)]

    def bkt(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:5],
                   16) % n_buckets

    trained = {bkt(w) for _, t, _ in labeled for w in t.split()}
    # pick two tokens whose buckets are PROVABLY untrained
    unseen = []
    i = 0
    while len(unseen) < 2:
        cand = f"zz{'abcdefghij'[i % 10]}{i // 10}x".replace("0", "o")
        cand = "".join(c for c in cand if c.isalpha())
        if bkt(cand) not in trained and cand not in unseen:
            unseen.append(cand)
        i += 1
    corpus = [(5, " ".join(unseen))]
    cdf = spark.createDataFrame(
        pd.DataFrame(corpus, columns=["doc_id", "text"]))
    ldf = spark.createDataFrame(
        pd.DataFrame(labeled, columns=["doc_id", "text", "label"]))
    out = textstats.nb_quality_scores(
        cdf, ldf, n_buckets=n_buckets).toPandas()
    row = out[out["id"] == 5].iloc[0]
    tot_pos = sum(len(t.split()) for _, t, y in labeled if y)
    tot_neg = sum(len(t.split()) for _, t, y in labeled if not y)
    default = round(
        math.log((1 / (tot_pos + n_buckets))
                 / (1 / (tot_neg + n_buckets))) * 1e6)
    assert default != 0
    assert row["score_micro"] == 2 * default
    assert row["nb_score"] != 0.0


# ---------------------------------------------------------------------------
# lsh_recall_eval
# ---------------------------------------------------------------------------


def _sh_set(t, n=5):
    s = t.strip().lower()
    return {s[i:i + n] for i in range(len(s) - n + 1)} if len(s) >= n else set()


def _py_true_pairs(docs, n=5, threshold=0.5):
    ids = sorted(docs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = _sh_set(docs[a], n), _sh_set(docs[b], n)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((a, b))
    return out


_EVAL_DOCS = {
    0: "the quick brown fox jumps over the lazy dog tonight",
    1: "the quick brown fox jumps over the lazy dog tonight",  # exact dup
    2: "the quick brown fox jumps over the lazy cat tonight",  # near dup
    3: "completely different words about gardens and rivers",
    4: "another unrelated sentence mentioning mountains only",
    5: "short text",
}


def test_lsh_recall_eval_matches_brute_force_truth(spark):
    from epstein_browser_spark import dedup

    pdf = pd.DataFrame(
        {"doc_id": list(_EVAL_DOCS), "text": list(_EVAL_DOCS.values())})
    sdf = spark.createDataFrame(pdf)
    row = dedup.lsh_recall_eval(
        sdf, n_perms=16, n_bands=4, shingle=5, threshold=0.5,
        max_bucket=200,
    ).toPandas().iloc[0]
    truth = _py_true_pairs(_EVAL_DOCS)
    assert row["n_true"] == len(truth) >= 2  # the exact AND the near dup
    # hits == what the production md5 pipeline would emit (candidates
    # verified at the same threshold) — the cross-operator invariant
    emitted = dedup.minhash_dedup_pairs_md5(
        sdf, n_perms=16, n_bands=4, shingle=5, threshold=0.5,
        max_bucket=200,
    ).count()
    assert row["n_hit"] == emitted
    # identical docs share every band key, so the (0,1) pair is always
    # a candidate: at least one hit, and counts are mutually consistent
    assert 1 <= row["n_hit"] <= min(row["n_true"], row["n_cand"])
    assert row["recall"] == round(row["n_hit"] / row["n_true"], 6)
    assert row["cand_precision"] == round(row["n_hit"] / row["n_cand"], 6)


def test_lsh_recall_eval_bucket_cap_costs_recall(spark):
    """max_bucket=1 drops every band bucket holding ≥2 docs — including
    the identical pair's — so the candidate stage goes empty: recall 0,
    precision NULL (0/0), while the truth count is unaffected."""
    from epstein_browser_spark import dedup

    pdf = pd.DataFrame(
        {"doc_id": list(_EVAL_DOCS), "text": list(_EVAL_DOCS.values())})
    row = dedup.lsh_recall_eval(
        spark.createDataFrame(pdf), n_perms=16, n_bands=4, shingle=5,
        threshold=0.5, max_bucket=1,
    ).toPandas().iloc[0]
    assert row["n_true"] == len(_py_true_pairs(_EVAL_DOCS))
    assert row["n_cand"] == 0 and row["n_hit"] == 0
    assert row["recall"] == 0.0
    assert pd.isna(row["cand_precision"])
