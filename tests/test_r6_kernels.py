"""Round-6 optimization parity: the rewritten kernels must be
BIT-identical to the expression forms they replaced (the driver's value
hash is sensitive to every rendered digit, so float parity is checked at
the bit level, not at 6 dp)."""

import struct

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import similarity
from epstein_browser_spark.similarity import (
    cosine_near_dup_pairs_lsh,
    dot,
    dot_fixed,
    ivf_centroids,
    with_lsh_bucket,
)

DIM = 8
N = 300


@pytest.fixture(scope="module")
def vecs(spark):
    """Deterministic float32 vectors with duplicates and near-duplicates
    (so the pair kernel emits rows at any threshold)."""
    rows = []
    for i in range(N):
        base = [((i * 31 + j * 17) % 97 - 48) / 7.0 for j in range(DIM)]
        if i % 5 == 0 and i > 0:  # near-dup of an earlier vector
            base = [x + 0.001 for x in rows[i - 5][1]]
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.localCheckpoint(eager=True)


def _bits(rows):
    return sorted(
        (r[0], r[1], struct.pack("<d", float(r[2]))) for r in rows
    )


def _pairs_join_form(h, dim, threshold):
    """The pre-r6 JVM-expression pair stage (broadcast bucket join +
    unrolled dot) — the reference the numpy kernel must equal bitwise."""
    nrm = F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding"), dim))
    a = h.select(F.col("vec_id").alias("id_a"),
                 F.col("embedding").alias("_va"), nrm.alias("_na"), "bucket")
    b = h.select(F.col("vec_id").alias("id_b"),
                 F.col("embedding").alias("_vb"), nrm.alias("_nb"),
                 F.col("bucket").alias("_bucketb"))
    return (
        a.join(F.broadcast(b), (F.col("bucket") == F.col("_bucketb"))
               & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b",
                F.round(dot_fixed(F.col("_va"), F.col("_vb"), dim)
                        / (F.col("_na") * F.col("_nb")), 6)
                .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.2)
    )


def test_pair_kernel_bit_identical_to_join_form(spark, vecs):
    got = cosine_near_dup_pairs_lsh(
        vecs, dim=DIM, threshold=0.2, n_planes=4
    ).collect()
    h = with_lsh_bucket(vecs, DIM, 4, "embedding")
    exp = _pairs_join_form(h, DIM, 0.2).collect()
    assert len(got) > 0  # non-vacuous
    assert _bits(got) == _bits(exp)


def test_pair_kernel_blocking_covers_all_pairs(spark, vecs):
    """The blocked (B-anchor-rows × group) evaluation must emit every
    i<j pair exactly once even when the group is larger than one block
    (N=300 > the 256-row block)."""
    one_bucket = vecs.withColumn("bucket", F.lit(0)).select(
        F.col("vec_id").alias("_pid"), F.col("embedding").alias("_pv"),
        "bucket")
    kern = similarity._pair_cosine_kernel("_pid", "_pv")
    pdf = one_bucket.toPandas()
    out = kern(pdf)
    assert len(out) == N * (N - 1) // 2
    assert (out["id_a"] < out["id_b"]).all()
    assert len(out[["id_a", "id_b"]].drop_duplicates()) == len(out)


def test_assign_to_matches_crossjoin_reference(spark, vecs):
    """Map-only literal array_min assignment == the crossJoin +
    min(struct) aggregate it replaced (min distance, ties to lower cid)."""
    cents = ivf_centroids(vecs, 7, "vec_id", "embedding")
    got = similarity._assign_to(vecs, cents, "vec_id", "embedding",
                                dim=DIM).select("vec_id", "cell").collect()
    cref = cents.select("cid", "cvec",
                        dot(F.col("cvec"), F.col("cvec")).alias("_cc"))
    pairs = vecs.crossJoin(F.broadcast(cref)).select(
        "vec_id", "cid",
        (F.col("_cc")
         - 2 * dot_fixed(F.col("embedding"), F.col("cvec"), DIM)).alias("_d"),
    )
    exp = (
        pairs.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"))
        .select("vec_id", F.col("_m.cid").alias("cell"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_fused_lsh_candidates_match_join_form(spark):
    """sig_est=True (signatures carried through the bucket join, estimate
    computed in-join) must produce the identical candidate SET, verified
    pair set, and verify_prefilter metrics as the two-join form."""
    from epstein_browser_spark.dedup import (
        CapMetrics, minhash_features, minhash_lsh_candidates, verify_pairs,
    )

    rows = []
    for i in range(120):
        text = " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(30))
        if i % 4 == 0 and i > 0:  # near-dup: previous doc + tiny suffix
            text = rows[i - 4][1] + f" x{i}"
        rows.append((i, text))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    feats = minhash_features(d, "text", "doc_id").localCheckpoint(eager=True)

    c_old = minhash_lsh_candidates(feats.select("id", "sig"), 8,
                                   max_bucket=50)
    c_new = minhash_lsh_candidates(feats.select("id", "sig"), 8,
                                   max_bucket=50, n_perms=32, sig_est=True)
    assert sorted(map(tuple, c_old.collect())) == sorted(
        (r.id_a, r.id_b) for r in c_new.collect())

    m_old, m_new = CapMetrics(), CapMetrics()
    p_old = verify_pairs(c_old, feats, 0.5, 32, cap_metrics=m_old).collect()
    p_new = verify_pairs(c_new, feats, 0.5, 32, cap_metrics=m_new).collect()
    assert len(p_old) > 0  # non-vacuous
    assert sorted(map(tuple, p_old)) == sorted(map(tuple, p_new))
    assert (m_old.summary()["verify_prefilter"]
            == m_new.summary()["verify_prefilter"])


def test_assign_to_empty_centroids(spark, vecs):
    empty = vecs.filter(F.lit(False)).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"))
    out = similarity._assign_to(vecs, empty, "vec_id", "embedding", dim=DIM)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "embedding", "cell"]
