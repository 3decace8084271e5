"""Distributed spherical k-means: numpy parity + Lloyd monotonicity."""

import numpy as np
from pyspark.sql import functions as F

from shopify_etl_spark.operators import clustering
from shopify_etl_spark.plans.catalog import load_table


def _numpy_lloyd(V, ids, init_idx, k, iters):
    """Reference implementation, identical math (unit-vector sums)."""
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    C = V[init_idx].astype(np.float64)
    history = []
    for _ in range(iters):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = Vn @ Cn.T
        cid = S.argmax(axis=1)
        history.append(float(S.max(axis=1).mean()))
        for c in range(k):
            m = cid == c
            if m.any():
                C[c] = Vn[m].sum(axis=0) / m.sum()
    return C, cid, history


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    k, iters, seed = 6, 4, 7
    cents, hist = clustering.kmeans_fit(emb, k=k, iters=iters, seed=seed)

    rows = emb.select(
        "vec_id", "embedding", F.xxhash64(F.col("vec_id"), F.lit(seed)).alias("h")
    ).collect()
    rows.sort(key=lambda r: r.vec_id)
    V = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    hs = np.array([r.h for r in rows])
    init_idx = np.argsort(hs, kind="stable")[:k]

    C_ref, cid_ref, hist_ref = _numpy_lloyd(V, ids, init_idx, k, iters)
    assert np.allclose(hist, hist_ref, rtol=1e-9)
    Cn_ref = C_ref / np.linalg.norm(C_ref, axis=1, keepdims=True)
    C_got = np.asarray(cents)
    Cn_got = C_got / np.linalg.norm(C_got, axis=1, keepdims=True)
    assert np.allclose(Cn_got, Cn_ref, atol=1e-9)

    # objective is non-decreasing (spherical Lloyd invariant)
    assert all(b >= a - 1e-12 for a, b in zip(hist, hist[1:]))

    # final assignment agrees with the reference scoring
    assigned = clustering.kmeans_assign(emb, cents)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    exp = (Vn @ Cn_ref.T).argmax(axis=1)
    agree = np.mean([got[i] == e for i, e in zip(ids, exp)])
    assert agree >= 0.999  # float-boundary points may flip, nothing else


def test_kmeans_all_points_assigned_once(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = clustering.kmeans_fit(emb, k=4, iters=2)
    a = clustering.kmeans_assign(emb, cents)
    assert a.count() == emb.count()
    assert a.select("vec_id").distinct().count() == emb.count()
    assert a.agg(F.min("cluster_id"), F.max("cluster_id")).first()[1] <= 3


def test_kmeans_fit_empty_corpus_raises_clean(spark):
    """An empty embeddings frame must fail loudly with a ValueError, not
    a raw IndexError from seeding centroids off zero rows."""
    import pytest

    from shopify_etl_spark.operators import clustering

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        clustering.kmeans_fit(emb, k=4, iters=1)


def test_kmeans_assign_keep_cols_id_collision(spark, sf_dir):
    """keep_cols naming id_col must not duplicate the field in the output
    schema (the pandas dict collapses to one column, so a duplicated
    schema entry would crash with a confusing Arrow schema mismatch)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    cents, _ = clustering.kmeans_fit(emb, k=3, iters=1)
    a = clustering.kmeans_assign(emb, cents, keep_cols=("vec_id", "embedding"))
    assert a.columns.count("vec_id") == 1
    assert a.count() == 50
