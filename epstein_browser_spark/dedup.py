"""Deduplication operators for training-data curation, Spark-first.

* exact           — md5 hash-groupBy (one shuffle on the hash)
* ngram_jaccard   — exact n-gram Jaccard over a bounded candidate set
* minhash_lsh     — MinHash signatures + banded LSH bucket join: the scale
                    path (candidate generation is a shuffle on (band, key),
                    never an all-pairs product)
* simhash         — 64-bit SimHash with hamming-ball grouping via band keys

The exact path generalizes the reference's content-hash idempotency dedup
(/root/reference/index_images.py:194-232). Everything is built-in column
expressions (xxhash64 / arrays / bit ops) — no Python UDFs — so the whole
thing stays inside whole-stage codegen.

Scale notes (100 TB): minhash_lsh is the only all-corpus near-dup that
survives 10^9+ docs — its cost is |docs| × n_perms hashing plus one shuffle
per band; the verify join only touches colliding buckets. AQE skew-join
handles hot buckets (e.g. boilerplate-identical docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epstein_browser_spark.textstats import char_ngrams


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (content_hash, n_docs, keep_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_col=None,
) -> DataFrame:
    """Exact Jaccard over char n-gram sets for candidate pairs.

    Candidates are blocked on ``block_col`` (default: shared first shingle —
    a cheap deterministic blocking key) so the join is equi, not a cross
    product. Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    g = df.select(
        F.col(id_col).alias("_id"),
        char_ngrams(F.col(text_col), n).alias("_grams"),
    ).filter(F.size("_grams") > 0)
    block = block_col if block_col is not None else F.element_at(
        F.array_sort("_grams"), 1
    )
    g = g.withColumn("_block", block)
    a = g.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"),
                 F.col("_block").alias("_b"))
    b = g.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"),
                 F.col("_block").alias("_b"))
    joined = a.join(b, "_b").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (
        joined.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_perms: int = 32,
                       n: int = 5) -> DataFrame:
    """(id, sig: array<long>) — MinHash over char n-gram shingles.

    Permutation i = min over shingles of xxhash64(shingle, seed=i); all
    JVM-side (transform + array_min), one pass over the data.
    """
    grams = char_ngrams(F.col(text_col), n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_perms - 1)),
        lambda i: F.array_min(
            F.transform(grams, lambda s: F.xxhash64(s, i))
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(F.size(grams) > 0, sig).otherwise(
            F.array().cast("array<bigint>")
        ).alias("sig"),
    ).filter(F.size("sig") > 0)


def minhash_lsh_candidates(sigs: DataFrame, n_bands: int = 8) -> DataFrame:
    """Banded LSH: docs sharing any band hash become candidate pairs.

    Shuffle profile: explode to |docs|×n_bands rows, one shuffle on
    (band, band_hash), pairs emitted per bucket. Output: (id_a, id_b)
    distinct.
    """
    n_perms = None  # derived from the signature length at runtime
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                "sig",
                                (b * (F.size("sig") / n_bands)).cast("int") + 1,
                                (F.size("sig") / n_bands).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perms: int = 32,
    n_bands: int = 8,
    shingle: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup path: MinHash → LSH candidates → exact-Jaccard verify.

    Verification joins the shingle sets back only for candidate pairs, so
    the expensive set ops run on the (small) candidate set.
    """
    sigs = minhash_signatures(df, text_col, id_col, n_perms, shingle)
    cands = minhash_lsh_candidates(sigs, n_bands)
    grams = df.select(
        F.col(id_col).alias("id"),
        char_ngrams(F.col(text_col), shingle).alias("grams"),
    )
    ga = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("_ga"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (
        cands.join(ga, "id_a").join(gb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_bits(col, n: int = 3):
    """64-bit SimHash over char n-gram shingles as a 64-char bit string.

    Per shingle, its 64 hash bits contribute ±1 to per-position counters
    (one F.aggregate with an array<long> accumulator); output bit b is 1 iff
    counter b > 0. Bit strings (via F.bin + lpad) avoid column-amount shift
    ops, which Spark only supports with literal shift counts."""
    grams = char_ngrams(col, n)
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    counters = F.aggregate(
        grams,
        zero,
        lambda acc, s: F.zip_with(
            acc,
            F.split(F.lpad(F.bin(F.xxhash64(s)), 64, "0"), "(?!$)"),
            lambda a, c: a + F.when(c == "1", 1).otherwise(-1),
        ),
    )
    return F.concat_ws(
        "", F.transform(counters, lambda v: F.when(v > 0, "1").otherwise("0"))
    )


def hamming_bits(a, b):
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, "(?!$)"), F.split(b, "(?!$)"),
                       lambda x, y: x != y),
            lambda v: v,
        )
    )


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3,
                      n: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, candidate
    generation via 4×16-bit band equality (any-band collision covers all
    pairs with hamming <= 3 by pigeonhole)."""
    h = df.select(F.col(id_col).alias("id"),
                  simhash_bits(F.col(text_col), n).alias("sh"))
    banded = h.select(
        "id", "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.col("sh").substr(b * 16 + 1, F.lit(16)),
            )
        ).alias("band", "key"),
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      "band", "key")
    b = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                hamming_bits(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
