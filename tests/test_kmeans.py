"""Learned (k-means) quantizers behind the quantizer='kmeans' flag
(VERDICT r3 item 4): recall dominance over the rank-based sample on a
clustered corpus, exact determinism across partitionings (the decimal-sum
update), objective improvement, and PQ quantization-error improvement."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epstein_browser_spark import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    """200 vectors in 4 well-separated gaussian clusters, ids ordered so
    the rank-based seed (lowest 8 ids) lands ENTIRELY in cluster 0 — the
    worst case for the sampled quantizer, the motivating case for Lloyd
    refinement."""
    rng = np.random.default_rng(7)
    centers = np.array([[10, 0, 0, 0, 0, 0, 0, 0],
                        [0, 10, 0, 0, 0, 0, 0, 0],
                        [0, 0, 10, 0, 0, 0, 0, 0],
                        [0, 0, 0, 10, 0, 0, 0, 0]], dtype="float64")
    # ids 0..49 cluster 0, 50..99 cluster 1, ... (rank seed = cluster 0)
    vecs = np.concatenate([
        centers[c] + rng.normal(0, 0.5, size=(50, 8)) for c in range(4)
    ])
    pdf = pd.DataFrame({
        "vec_id": range(200),
        "embedding": [list(map(float, v)) for v in vecs],
    })
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(pdf, schema)


def _objective(spark, df, cents):
    """Sum of squared distances to the assigned centroid."""
    a = similarity._assign_to(df, cents, "vec_id", "embedding")
    j = a.join(cents, a["cell"] == cents["cid"])
    return j.select(
        F.sum(similarity.dist2(F.col("embedding"), F.col("cvec"))).alias("o")
    ).collect()[0]["o"]


def test_kmeans_improves_objective_and_recall(spark, clustered):
    rank_c = similarity.ivf_centroids(clustered, 8)
    km_c = similarity.kmeans_centroids(clustered, 8, n_iters=5)
    obj_rank = _objective(spark, clustered, rank_c)
    obj_km = _objective(spark, clustered, km_c)
    assert obj_km < obj_rank * 0.5  # Lloyd must fix the degenerate seed

    # recall@10 vs brute force for a query in cluster 3 (invisible to the
    # all-cluster-0 rank seed at nprobe=1)
    q = [0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0]
    truth = {r["vec_id"] for r in
             similarity.brute_force_topk(clustered, q, k=10).collect()}
    got_rank = {r["vec_id"] for r in similarity.ivf_topk(
        clustered, q, n_centroids=8, k=10).collect()}
    got_km = {r["vec_id"] for r in similarity.ivf_topk(
        clustered, q, n_centroids=8, k=10, quantizer="kmeans",
        n_iters=5).collect()}
    recall_rank = len(truth & got_rank) / 10
    recall_km = len(truth & got_km) / 10
    assert recall_km >= recall_rank
    assert recall_km == 1.0  # separated clusters: Lloyd finds cluster 3


def test_kmeans_deterministic_across_partitionings(spark, clustered):
    c1 = similarity.kmeans_centroids(clustered, 8, n_iters=4).collect()
    c2 = similarity.kmeans_centroids(
        clustered.repartition(13), 8, n_iters=4).collect()
    m1 = {r["cid"]: list(r["cvec"]) for r in c1}
    m2 = {r["cid"]: list(r["cvec"]) for r in c2}
    assert m1.keys() == m2.keys()
    for cid in m1:
        assert m1[cid] == m2[cid]  # EXACT equality — decimal-sum update


def test_kmeans_pq_books_improve_quantization_error(spark, clustered):
    rank_cb = similarity.pq_codebooks(clustered, m=4, k=8)
    km_cb = similarity.kmeans_pq_codebooks(clustered, m=4, k=8, n_iters=4)

    def qerr(cb):
        cb = cb.localCheckpoint(eager=True)
        codes = similarity.pq_encode(clustered, m=4, k=8, long_form=True,
                                     cb=cb)
        w = 2
        subv = clustered.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("sub"),
            F.col("embedding").alias("_v"),
        ).select("vec_id", "sub",
                 F.slice("_v", F.col("sub") * w + 1, w).alias("svec"))
        j = codes.join(subv, ["vec_id", "sub"]).join(cb, ["sub", "code"])
        return j.select(F.sum(
            similarity.dist2(F.col("svec"), F.col("cvec"))).alias("e")
        ).collect()[0]["e"]

    assert qerr(km_cb) < qerr(rank_cb)


def test_kmeans_pq_deterministic(spark, clustered):
    b1 = similarity.kmeans_pq_codebooks(clustered, m=4, k=8,
                                        n_iters=3).collect()
    b2 = similarity.kmeans_pq_codebooks(clustered.repartition(9), m=4, k=8,
                                        n_iters=3).collect()
    k1 = {(r["sub"], r["code"]): list(r["cvec"]) for r in b1}
    k2 = {(r["sub"], r["code"]): list(r["cvec"]) for r in b2}
    assert k1 == k2


def test_kmeans_empty_cluster_keeps_previous(spark):
    """Two far groups, 4 centroids seeded in group A: emptied centroids
    keep their previous value instead of crashing/NaN."""
    pdf = pd.DataFrame({
        "vec_id": range(8),
        "embedding": [[0.0, float(i)] for i in range(4)]
        + [[100.0, float(i)] for i in range(4)],
    })
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    df = spark.createDataFrame(pdf, schema)
    cents = similarity.kmeans_centroids(df, 4, n_iters=3).collect()
    assert len(cents) == 4
    for r in cents:
        assert all(np.isfinite(x) for x in r["cvec"])


def test_lsh_multiprobe_radius_two(spark):
    """n_flip=2 must generate the FULL 2-flip neighborhood (1 + C(n,1) +
    C(n,2) buckets), not silently degrade to radius 1 (r4 review)."""
    q = [1.0] + [0.0] * 63
    b1 = similarity.lsh_probe_buckets(64, 6, q, n_flip=1)
    b2 = similarity.lsh_probe_buckets(64, 6, q, n_flip=2)
    assert len(b1) == 1 + 6
    assert len(b2) == 1 + 6 + 15
    assert set(b1) <= set(b2)


def test_pq_corpus_dim_must_divide_m(spark):
    """A corpus whose dim % m != 0 raises instead of silently truncating
    the trailing dims out of codebooks and codes (r4 review)."""
    pdf = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[float(i) for i in range(10)]] * 3,
    })
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    df = spark.createDataFrame(pdf, schema)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebooks(df, m=4, k=2).collect()
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_encode(df, m=4, k=2).collect()
