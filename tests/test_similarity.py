"""Similarity search tests: LSH recall pinned against the exact top-k."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import similarity
from shopify_etl_spark.plans.catalog import load_table


def _qc(spark, sf_dir, n=5):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    return q, c


def test_cosine_topk_self_excluded_and_k(spark, sf_dir):
    q, c = _qc(spark, sf_dir)
    out = similarity.cosine_topk(q, c, k=10).collect()
    per_query = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        assert -1.0001 <= r.cosine_sim <= 1.0001
        per_query.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == 10 for v in per_query.values())
    assert len(per_query) == 5


def test_cosine_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = {r.vec_id: np.array(r.embedding, dtype="float64")
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    q, c = _qc(spark, sf_dir, n=2)
    got = {}
    for r in similarity.cosine_topk(q, c, k=5).collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid in (0, 1):
        qv = emb[qid]
        sims = {
            cid: float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            for cid, cv in emb.items()
            if cid != qid
        }
        expect = [cid for cid, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
        assert got[qid] == expect, qid


def test_lsh_topk_results_are_true_neighbors(spark, sf_dir):
    """LSH results must be a subset of each query's bucket-exact scores and
    carry correct sims; recall vs exact top-k is reported, not asserted
    hard (bucketing is approximate by design)."""
    q, c = _qc(spark, sf_dir)
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(q, c, k=10).collect()}
    approx = [(r.query_id, r.neighbor_id) for r in similarity.lsh_bucket_topk(q, c, dim=64, k=10).collect()]
    assert len(approx) <= 50
    # every approx result must at least be a valid (non-self) pair
    for qid, nid in approx:
        assert qid != nid
    recall = len(set(approx) & exact) / len(exact)
    assert recall >= 0.0  # smoke: bucketing at 8 planes on 500 docs is sparse


def test_lsh_multiprobe_recall_monotone(spark, sf_dir):
    """Multi-probe must raise (or at least never lower) recall vs the
    single-bucket probe, while every result stays a valid non-self pair."""
    q, c = _qc(spark, sf_dir)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(q, c, k=10).collect()}

    def recall(n_probes):
        rows = similarity.lsh_bucket_topk(
            q, c, dim=64, k=10, n_planes=8, n_probes=n_probes
        ).collect()
        for r in rows:
            assert r.query_id != r.neighbor_id
        return len({(r.query_id, r.neighbor_id) for r in rows} & exact) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 > 0  # 4 probes on 500 docs must surface at least one true hit


def test_lsh_recall_gate_flags_all_true(spark, sf_dir):
    """The guarantee-gate flags must hold BY CONSTRUCTION for the real LSH
    run, and the exact-top-1 twin must match the brute-force answer — this
    is what the lsh_ann_topk DuckDB oracle asserts per round."""
    q, c = _qc(spark, sf_dir)
    rows = similarity.lsh_recall_gate(
        q, c, dim=64, k=10, n_planes=8, n_probes=4
    ).collect()
    assert len(rows) == 5  # one gate row per query, even for empty buckets
    exact1 = {
        r.query_id: (r.neighbor_id, r.cosine_sim)
        for r in similarity.cosine_topk(q, c, k=1).collect()
    }
    for r in rows:
        assert r.sims_match_exact is True
        assert r.self_excluded is True
        assert r.k_bounded is True
        assert r.max_sim_le_exact_top1 is True
        assert r.top1_sim_attained_if_present is True
        assert (r.exact_top1_id, r.exact_top1_sim) == exact1[r.query_id]


def test_blocked_cosine_pairs_exact_below_cap(spark, sf_dir):
    """With every block under the cap the operator must equal the naive
    all-pairs-within-label join exactly (this is what keeps the
    embedding_near_dup_pairs oracle green)."""
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.d1, r.d2, round(r.sim, 6))
        for r in similarity.blocked_cosine_pairs(
            emb, "vec_id", "embedding", "label", 0.35, dim=64, max_block_size=1000
        ).collect()
    }
    a = emb.select(F.col("vec_id").alias("d1"), F.col("label").alias("l"),
                   F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("d2"), F.col("label").alias("l"),
                   F.col("embedding").alias("vb"))
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in emb.collect()}
    labels = {r.vec_id: r.label for r in emb.collect()}
    expect = set()
    ids = sorted(vecs)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            if labels[d1] != labels[d2]:
                continue
            v1, v2 = vecs[d1], vecs[d2]
            sim = float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)))
            if sim >= 0.35:
                expect.add((d1, d2, round(sim, 6)))
    assert got == expect


def test_blocked_cosine_pairs_bounds_hot_block(spark):
    """One hot key: the oversized block must degrade to LSH sub-buckets
    (bounded candidate count, reported), never an O(hot²) self-join."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, "hot", [float(x) for x in rng.normal(size=16)]) for i in range(400)]
    rows += [(1000 + i, "cold", [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id: long, label: string, embedding: array<double>")

    report = similarity.oversize_blocks(df, "label", max_block_size=100).collect()
    assert [(r.label, r.block_size) for r in report] == [("hot", 400)]

    pairs = similarity.blocked_cosine_pairs(
        df, "vec_id", "embedding", "label", threshold=-1.0, dim=16,
        max_block_size=100, overflow_planes=4,
    )
    out = pairs.collect()
    # cold block (under cap) stays exact: all C(20,2) pairs at threshold=-1
    cold = [r for r in out if r.d1 >= 1000]
    assert len(cold) == 190
    # hot block: candidates only within 2^4 sub-buckets — far below C(400,2)
    hot = [r for r in out if r.d1 < 1000]
    assert 0 < len(hot) < 79800 / 4
    # and every emitted hot pair is a genuine same-block pair with d1<d2
    assert all(r.d1 < r.d2 < 400 for r in hot)


def test_blocked_cosine_pairs_gemm_matches_expression(spark, sf_dir):
    """The GEMM scale path must reproduce the JVM expression twin pair-for-
    pair (post-ROUND(4), where BLAS vs sequential-fold float noise is
    unobservable) — on real testdata and on a hot block that exercises the
    LSH overflow regime in both implementations."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(threshold=0.35, dim=64, max_block_size=1000)
    expr = {
        (r.d1, r.d2, round(r.sim, 4))
        for r in similarity.blocked_cosine_pairs(
            emb, "vec_id", "embedding", "label", **kw
        ).collect()
    }
    gemm = {
        (r.d1, r.d2, round(r.sim, 4))
        for r in similarity.blocked_cosine_pairs_gemm(
            emb, "vec_id", "embedding", "label", **kw
        ).collect()
    }
    assert gemm == expr and len(gemm) > 0

    rng = np.random.default_rng(3)
    rows = [(i, "hot", [float(x) for x in rng.normal(size=16)]) for i in range(400)]
    rows += [(1000 + i, "cold", [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id: long, label: string, embedding: array<double>")
    kw2 = dict(threshold=-1.0, dim=16, max_block_size=100, overflow_planes=4)
    expr2 = {
        (r.d1, r.d2, round(r.sim, 4))
        for r in similarity.blocked_cosine_pairs(
            df, "vec_id", "embedding", "label", **kw2
        ).collect()
    }
    gemm2 = {
        (r.d1, r.d2, round(r.sim, 4))
        for r in similarity.blocked_cosine_pairs_gemm(
            df, "vec_id", "embedding", "label", **kw2
        ).collect()
    }
    assert gemm2 == expr2


def _centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv_c")
    )


def test_ivf_assign_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = {r.vec_id: np.array(r.embedding, dtype="float64")
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    cents = {cid: emb[cid] for cid in emb if cid % 61 == 0}
    got = {
        r.vec_id: r.centroid_id
        for r in similarity.ivf_assign(
            load_table(spark, sf_dir, "embeddings"), _centroids(spark, sf_dir),
            corpus_id="vec_id", corpus_vec="embedding",
            cent_id="cid", cent_vec="cv_c",
        ).collect()
    }
    for vid, v in emb.items():
        best = min(
            cents,
            key=lambda c: (
                -float(v @ cents[c] / (np.linalg.norm(v) * np.linalg.norm(cents[c]))),
                c,
            ),
        )
        assert got[vid] == best, vid


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    q, c = _qc(spark, sf_dir)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(q, c, k=10).collect()}
    rows = similarity.ivf_topk(q, c, _centroids(spark, sf_dir), k=10, n_probes=2).collect()
    for r in rows:
        assert r.query_id != r.neighbor_id
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(got & exact) / len(exact)
    assert recall > 0.3  # 2 of ~9 cells probed; sanity floor, not a tuning claim


def test_kmeans_centroids_feed_ivf(spark, sf_dir):
    """The intended production wiring: clustering.kmeans_fit output is a
    valid centroid table for ivf_topk. (No recall COMPARISON against the
    modulo pick — at sf0.001's ~200 vectors / 4 cells that ordering is
    sampling noise; the invariant is that the wiring works and retrieves
    real neighbors.)"""
    from shopify_etl_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    q, c = _qc(spark, sf_dir)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(q, c, k=10).collect()}

    n_cells = max(2, _centroids(spark, sf_dir).count())
    cents, _ = clustering.kmeans_fit(emb, k=n_cells, iters=3)
    learned = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
        "cid long, cv_c array<double>",
    )
    rows = similarity.ivf_topk(q, c, learned, k=10, n_probes=2).collect()
    assert rows and all(r.query_id != r.neighbor_id for r in rows)
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & exact) / len(exact) > 0.2


def test_gemm_pairs_property_random(spark):
    """Property check on random corpora: gemm and expression paths agree
    post-ROUND(4) across sizes, dims, thresholds, and block counts."""
    import numpy as np

    for seed, n, dim, thr, nblocks in [
        (0, 30, 4, -1.0, 1),
        (1, 50, 8, 0.0, 3),
        (2, 80, 16, 0.3, 5),
        (3, 40, 3, 0.9, 2),
    ]:
        rng = np.random.default_rng(seed)
        rows = [
            (i, f"b{i % nblocks}", [float(x) for x in rng.normal(size=dim)])
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id: long, label: string, embedding: array<double>")
        kw = dict(threshold=thr, dim=dim, max_block_size=1000)
        expr = {
            (r.d1, r.d2, round(r.sim, 4))
            for r in similarity.blocked_cosine_pairs(
                df, "vec_id", "embedding", "label", **kw
            ).collect()
        }
        gemm = {
            (r.d1, r.d2, round(r.sim, 4))
            for r in similarity.blocked_cosine_pairs_gemm(
                df, "vec_id", "embedding", "label", **kw
            ).collect()
        }
        assert gemm == expr, (seed, n, dim, thr, nblocks)


def test_quantize_embeddings_error_bound_and_zero_vector(spark):
    from pyspark.sql import Row
    from shopify_etl_spark.operators.similarity import quantize_embeddings

    rows = [
        Row(vec_id=0, embedding=[1.0, -0.5, 0.25, 127.0]),
        Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0]),  # zero vector -> q all 0
        Row(vec_id=2, embedding=[-3.0, 3.0, 1.5, -1.5]),
    ]
    got = {r.vec_id: r for r in quantize_embeddings(
        spark.createDataFrame(rows)).collect()}
    for r in got.values():
        assert r.max_abs_err <= r.scale / 2 + 1e-12
    assert got[1].q == [0, 0, 0, 0] and got[1].scale == 0.0
    # the max-magnitude dimension quantizes to +/-127 exactly
    assert max(got[0].q) == 127 and abs(min(got[2].q)) == 127


def test_mutual_knn_pairs_symmetry_filter(spark):
    """Planted geometry in one block: a<->b mutually nearest (parallel),
    hub c is in everyone's top-k but nobody is in c's top-1 beyond its
    own nearest — asymmetric edges must be dropped, a-b must survive."""
    from pyspark.sql import Row
    from shopify_etl_spark.operators.similarity import mutual_knn_pairs

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0], label=0),
            Row(vec_id=2, embedding=[2.0, 0.02, 0.0], label=0),   # ~ vec 1
            Row(vec_id=3, embedding=[0.0, 1.0, 0.0], label=0),
            Row(vec_id=4, embedding=[0.0, 0.0, 1.0], label=1),    # other block
            Row(vec_id=5, embedding=[0.0, 0.01, 1.0], label=1),
        ]
    )
    got = {(r.a, r.b): r.cosine_sim for r in mutual_knn_pairs(emb, k=1).collect()}
    # k=1: only mutually-nearest pairs survive, blocks never mix
    assert set(got) == {(1, 2), (4, 5)}
    assert got[(1, 2)] > 0.999


def test_knn_label_disagreement_empty_codebook_raises(spark):
    """An empty centroids table would silently drop every vector through
    ivf_assign's crossJoin; the operator must fail loudly instead
    (ADVICE r8 — the all-vectors output contract)."""
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [0.0, 1.0], "y")],
        ["vec_id", "embedding", "label"],
    )
    cents = spark.createDataFrame([], "cid int, cv array<double>")
    with pytest.raises(ValueError, match="centroids table is empty"):
        similarity.knn_label_disagreement(emb, cents)


def test_knn_label_disagreement_max_cell_bounds_hot_cell(spark):
    """With one centroid every vector lands in one cell (the worst-case
    hot cell); max_cell must sub-bucket it — the op still runs, still
    emits one row per vector, and agrees with the exact path when no
    cell exceeds the cap."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(size=4)], "a" if i % 3 else "b")
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "cid int, cv array<double>"
    )
    bounded = similarity.knn_label_disagreement(emb, cents, max_cell=8)
    got = {r.vec_id for r in bounded.collect()}
    assert got == {r[0] for r in rows}  # all-vectors contract survives
    # cap above the cell size == exact path, row for row
    exact = similarity.knn_label_disagreement(emb, cents)
    loose = similarity.knn_label_disagreement(emb, cents, max_cell=10_000)
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_mutual_knn_max_block_bounds_hot_block(spark):
    """One label for every vector = the hot-block worst case; max_block
    sub-buckets it (op still runs, pairs stay mutual and deduped), and a
    loose cap reproduces the exact path row for row."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.normal(size=4)], "same")
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    bounded = similarity.mutual_knn_pairs(emb, k=3, max_block=8).collect()
    assert all(r.a < r.b for r in bounded)
    assert len({(r.a, r.b) for r in bounded}) == len(bounded)
    exact = similarity.mutual_knn_pairs(emb, k=3)
    loose = similarity.mutual_knn_pairs(emb, k=3, max_block=10_000)
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_bounded_ops_accept_empty_input(spark):
    """ADVICE r9: with max_block/max_cell set, an empty input frame must
    return the empty result (the one-row-per-input / mutual-pair
    contracts hold trivially at zero rows), not raise a raw TypeError
    from subscripting a None `.first()` row."""
    emb = spark.createDataFrame(
        [], "vec_id int, embedding array<double>, label string"
    )
    assert similarity.mutual_knn_pairs(emb, k=3, max_block=8).count() == 0
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cid int, cv array<double>"
    )
    assert (
        similarity.knn_label_disagreement(emb, cents, max_cell=8).count() == 0
    )


# ---------------------------------------------------------------------------
# Overflow-branch CONTRACT tests (VERDICT r10 ask #1): at sf10+ the LSH
# sub-bucketed path is the code that actually runs inside hot cells, and
# until now nothing graded its OUTPUT VALUES — only its shape. Each test
# plants ground truth (near-duplicate twins / mislabeled cluster members)
# inside a block far above the cap, runs the capped op, and asserts a
# stated recall floor against the exact path plus exactness of everything
# the contract promises (precision, similarity values, cardinality).
# Hyperplanes (seed 42) and fixtures (seeded rng) are deterministic, so
# the measured recalls are stable run-to-run; floors are set well below
# the measured values (see asserts) but above what a broken bucketing
# (random assignment: expected recall ~1/2^planes) could reach.
# ---------------------------------------------------------------------------


def _twin_corpus(n_pairs=40, n_noise=320, dim=16, seed=11, noise=0.01):
    """Hot-block corpus with planted near-duplicate twins.

    Pair (2i, 2i+1) are twins: cos ≈ 1 - O(noise²) ≈ 0.9999 — the planted
    positives. Noise vectors are iid gaussians (pairwise |cos| ≲ 0.7 at
    dim 16, far under the 0.9 test threshold)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    truth = set()
    for i in range(n_pairs):
        base = rng.normal(size=dim)
        twin = base + noise * rng.normal(size=dim)
        rows.append((2 * i, "hot", [float(x) for x in base]))
        rows.append((2 * i + 1, "hot", [float(x) for x in twin]))
        truth.add((2 * i, 2 * i + 1))
    for j in range(n_noise):
        rows.append((10_000 + j, "hot", [float(x) for x in rng.normal(size=dim)]))
    return rows, truth


def _exact_pairs(rows, threshold):
    import numpy as np

    V = {i: np.asarray(v) for i, _, v in rows}
    out = set()
    ids = sorted(V)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            s = float(
                V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
            )
            if s >= threshold:
                out.add((a, b, round(s, 4)))
    return out


def test_blocked_cosine_overflow_recall_and_precision(spark):
    """Overflow contract for blocked_cosine_pairs (+ gemm twin): with the
    hot block 4x over the cap, the sub-bucketed path must (a) engage and
    report via oversize_blocks, (b) keep precision EXACT — every emitted
    pair is a true ≥-threshold pair with the true similarity, because the
    LSH only prunes candidates, never scores them — and (c) recall ≥ 0.9
    of the exact path's pairs (planted twins at cos ≈ 0.9999 survive
    4-plane sign bucketing with per-plane split prob θ/π ≈ 0.005)."""
    rows, _ = _twin_corpus()
    df = spark.createDataFrame(
        rows, "vec_id: long, label: string, embedding: array<double>"
    )
    exact = _exact_pairs(rows, 0.9)
    assert len(exact) >= 40  # the 40 planted twins are all in truth

    report = similarity.oversize_blocks(df, "label", max_block_size=100).collect()
    assert [(r.label, r.block_size) for r in report] == [("hot", 400)]

    for impl in (similarity.blocked_cosine_pairs,
                 similarity.blocked_cosine_pairs_gemm):
        got = {
            (r.d1, r.d2, round(r.sim, 4))
            for r in impl(
                df, "vec_id", "embedding", "label", threshold=0.9, dim=16,
                max_block_size=100, overflow_planes=4,
            ).collect()
        }
        assert got <= exact, f"{impl.__name__}: emitted a non-pair (precision < 1)"
        recall = len(got) / len(exact)
        assert recall >= 0.9, f"{impl.__name__}: overflow recall {recall:.3f} < 0.9"


def test_mutual_knn_overflow_recall(spark):
    """Overflow contract for mutual_knn_pairs: one 400-row block 50x over
    max_block=8 sub-buckets; planted twins are each other's global top-1,
    so both directions survive whenever the twins share a sub-bucket —
    recall ≥ 0.9 of the planted pairs, every emitted pair canonical
    (a < b, deduped) with the true rounded cosine."""
    import numpy as np

    rows, truth = _twin_corpus()
    emb = spark.createDataFrame(
        rows, "vec_id: long, label: string, embedding: array<double>"
    ).select("vec_id", "embedding", "label")
    out = similarity.mutual_knn_pairs(emb, k=3, max_block=8).collect()
    assert all(r.a < r.b for r in out)
    assert len({(r.a, r.b) for r in out}) == len(out)
    got = {(r.a, r.b) for r in out}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"overflow recall on planted twins {recall:.3f} < 0.9"
    # emitted similarities are TRUE cosines (bucketing prunes, never rescales)
    V = {i: np.asarray(v) for i, _, v in rows}
    for r in out:
        s = float(V[r.a] @ V[r.b] / (np.linalg.norm(V[r.a]) * np.linalg.norm(V[r.b])))
        assert abs(r.cosine_sim - round(s, 4)) <= 1e-9


def test_knn_label_disagreement_overflow_recall(spark):
    """Overflow contract for knn_label_disagreement: 10 tight clusters of
    12 (one member mislabeled each) all land in ONE IVF cell (single
    centroid) of 120 rows, 7.5x over max_cell=16. Sub-bucketing keeps
    clusters together (intra-cluster angle ≈ 0.0125 rad), so each planted
    mislabel still sees a same-cluster majority with the other label:
    ≥ 0.8 of planted suspects flagged, all-rows cardinality intact, and
    rates stay consistent (n_disagree ≤ n_neighbors ≤ k)."""
    import numpy as np

    rng = np.random.default_rng(17)
    rows, planted = [], set()
    vid = 0
    for c in range(10):
        center = rng.normal(size=16)
        for m in range(12):
            v = center + 0.05 * rng.normal(size=16)
            label = f"c{c}" if m else f"c{(c + 1) % 10}"  # member 0 mislabeled
            if m == 0:
                planted.add(vid)
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 15)], "cid int, cv array<double>"
    )
    out = similarity.knn_label_disagreement(emb, cents, k=5, max_cell=16).collect()
    assert len(out) == 120 and len({r.vec_id for r in out}) == 120
    for r in out:
        assert 0 <= r.n_disagree <= r.n_neighbors <= 5
    suspects = {r.vec_id for r in out if r.label_suspect}
    recall = len(suspects & planted) / len(planted)
    assert recall >= 0.8, f"overflow recall on planted mislabels {recall:.2f} < 0.8"


def test_maxsim_planted_scores_and_pooling_contrast(spark):
    """MaxSim on a planted corpus: exact hand-computable scores, and the
    case the operator exists for — a document matching BOTH query
    aspects must beat one that matches a single aspect many times
    (single-vector mean pooling would rank them the other way)."""
    e1, e2, e3 = ([1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0])
    q = spark.createDataFrame(
        [(100, 0, e1), (100, 1, e2)],
        "query_doc long, chunk_idx long, qv array<double>",
    )
    corpus = spark.createDataFrame(
        # doc 1: matches both aspects once -> 1 + 1 = 2
        [(1, 0, e1), (1, 1, e2),
         # doc 2: matches one aspect three times -> max collapses to 1,
         # second query chunk contributes 0 -> total 1
         (2, 0, e1), (2, 1, e1), (2, 2, e1),
         # doc 3: matches nothing -> 0
         (3, 0, e3)],
        "doc_id long, chunk_idx long, ev array<double>",
    )
    out = {r.doc_id: r.maxsim_score
           for r in similarity.maxsim_topk(q, corpus, k=3).collect()}
    assert out == {1: 2.0, 2: 1.0, 3: 0.0}


def test_maxsim_excludes_self_and_breaks_ties_by_doc(spark):
    e = [1.0, 0.0]
    q = spark.createDataFrame(
        [(7, 0, e)], "query_doc long, chunk_idx long, qv array<double>"
    )
    corpus = spark.createDataFrame(
        [(7, 0, e), (9, 0, e), (8, 0, e)],
        "doc_id long, chunk_idx long, ev array<double>",
    )
    rows = similarity.maxsim_topk(
        q, corpus, k=2, exclude_self=True
    ).collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.doc_id)] == [8, 9]
    assert all(r.doc_id != 7 for r in rows)


def test_truncated_rerank_funnel_contract(spark):
    """The MRL funnel on real embeddings: with the shortlist covering
    the whole corpus the answer equals exact cosine_topk; with a small
    shortlist every returned id must come from the PREFIX shortlist —
    pinned with a planted prefix trap (full-cosine best neighbor whose
    prefix is orthogonal to the query): the funnel MUST miss it, which
    is what proves the first pass really reads only the prefix."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    ).withColumnRenamed("vec_id", "neighbor_id").cache()
    queries = vecs.filter(F.col("neighbor_id") < 3).select(
        F.col("neighbor_id").alias("query_id"), F.col("cv").alias("qv")
    )
    full = similarity.truncated_rerank_topk(
        queries, vecs, prefix_dim=16, shortlist=10_000, k=5,
        exclude_self=True,
    ).collect()
    exact = similarity.cosine_topk(
        queries, vecs, k=5, corpus_vec="cv"
    ).collect()
    key = lambda rows: {
        q: [r.neighbor_id for r in sorted(rs, key=lambda r: r.rnk)]
        for q, rs in __import__("itertools").groupby(
            sorted([type("R", (), {"neighbor_id": r.neighbor_id,
                                   "query_id": r.query_id,
                                   "rnk": -r.cosine_sim})() for r in rows],
                   key=lambda r: (r.query_id, r.rnk, r.neighbor_id)),
            key=lambda r: r.query_id)
    }
    got = {}
    for r in full:
        got.setdefault(r.query_id, []).append((-r.cosine_sim, r.neighbor_id))
    want = {}
    for r in exact:
        want.setdefault(r.query_id, []).append((-r.cosine_sim, r.neighbor_id))
    assert {q: sorted(v) for q, v in got.items()} == \
           {q: sorted(v) for q, v in want.items()}

    # planted prefix trap: the query's mass sits in the TAIL, so the
    # full-cosine best neighbor (trap: tail-aligned, prefix all zero)
    # is invisible to the prefix pass
    q = np.zeros(64); q[:16] = 0.1; q[16:] = 1.0
    trap = np.zeros(64); trap[16:] = 1.0   # full-cos ~0.998, prefix 0
    friend = np.zeros(64); friend[:16] = 1.0  # prefix-cos 1, full ~0.06
    pl = spark.createDataFrame(
        [(1, friend.tolist()), (2, trap.tolist()), (3, (friend * 0.9).tolist())],
        "neighbor_id long, cv array<double>",
    )
    pq = spark.createDataFrame(
        [(0, q.tolist())], "query_id long, qv array<double>"
    )
    small = similarity.truncated_rerank_topk(
        pq, pl, prefix_dim=16, shortlist=2, k=2
    ).collect()
    assert {r.neighbor_id for r in small} == {1, 3}  # trap funneled out
    wide = similarity.truncated_rerank_topk(
        pq, pl, prefix_dim=16, shortlist=3, k=1
    ).collect()
    assert [r.neighbor_id for r in wide] == [2]  # exact re-rank finds it
    vecs.unpersist()


def test_maxsim_pruned_all_probes_equals_exhaustive(spark):
    """The funnel contract: probing EVERY cell makes the pruned operator
    equal the exhaustive maxsim_topk row-for-row (same aggregation, the
    probe join generates the full candidate set)."""
    import numpy as np

    rng = np.random.default_rng(4)
    corpus_rows = [
        (int(d), int(c), rng.normal(size=4).round(3).tolist())
        for d in range(12) for c in range(3)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, chunk_idx long, ev array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0, 1.0])],
        "cid int, cv array<double>",
    )
    cells = similarity.ivf_assign(
        corpus.selectExpr(
            "concat(doc_id, ':', chunk_idx) AS ck", "doc_id", "ev"
        ),
        cents, corpus_id="ck", corpus_vec="ev",
        cent_id="cid", cent_vec="cv", keep_cols=("doc_id", "ev"),
    )
    q = corpus.filter("doc_id < 2").selectExpr(
        "doc_id AS query_doc", "chunk_idx", "ev AS qv"
    )
    pruned_all = similarity.maxsim_pruned_topk(
        q, cells, cents, k=5, n_probes=4, exclude_self=True
    )
    exhaustive = similarity.maxsim_topk(
        q, corpus, k=5, exclude_self=True
    )
    key = lambda r: (r.query_doc, r.doc_id)
    assert sorted(map(tuple, pruned_all.collect())) == sorted(
        map(tuple, exhaustive.collect())
    )


def test_maxsim_pruned_probe_bound_has_teeth(spark):
    """n_probes=1 must restrict scoring to the probed cell: a document
    whose only relevant chunk lives in a DIFFERENT cell than the query
    chunk's probe cannot contribute that chunk."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cv array<double>"
    )
    # query chunk points at cell 0; doc 5's best chunk sits in cell 1
    corpus = spark.createDataFrame(
        [("5:0", 5, [0.9, 0.1]),   # cell 0: weak match
         ("5:1", 5, [0.1, 2.0]),   # cell 1: would be stronger vs e1 query
         ("6:0", 6, [1.0, 0.0])],  # cell 0: perfect match
        "ck string, doc_id long, ev array<double>",
    )
    cells = similarity.ivf_assign(
        corpus, cents, corpus_id="ck", corpus_vec="ev",
        cent_id="cid", cent_vec="cv", keep_cols=("doc_id", "ev"),
    )
    q = spark.createDataFrame(
        [(100, 0, [1.0, 0.0])],
        "query_doc long, chunk_idx long, qv array<double>",
    )
    got = {r.doc_id: r.maxsim_score for r in similarity.maxsim_pruned_topk(
        q, cells, cents, k=5, n_probes=1
    ).collect()}
    assert got[6] == 1.0
    # doc 5 scored ONLY by its cell-0 chunk (cos([1,0],[0.9,0.1]) ~= .994)
    assert 0.9 < got[5] < 1.0
