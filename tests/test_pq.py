"""Product quantization (operators/pq.py): Lloyd invariants, exactness
on codebook-reconstructible corpora, ADC-vs-true-distance identity, and
a measured recall gate against exact L2 search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators import pq


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.cache().count()
    return df


class TestTrain:
    def test_codebook_shapes_and_determinism(self, spark, emb):
        books, hist = pq.pq_train(emb, m=8, k=16, iters=2, init_by="id")
        assert len(books) == 8
        assert all(len(b) == 16 and len(b[0]) == 8 for b in books)
        books2, hist2 = pq.pq_train(emb, m=8, k=16, iters=2, init_by="id")
        assert books == books2 and hist == hist2

    def test_lloyd_distortion_non_increasing(self, spark, emb):
        _books, hist = pq.pq_train(emb, m=4, k=8, iters=3, init_by="id")
        assert len(hist) == 3
        assert hist[0] >= hist[1] >= hist[2] - 1e-9

    def test_dim_must_divide(self, spark, emb):
        with pytest.raises(ValueError, match="divisible"):
            pq.pq_train(emb, m=7, k=8, iters=1)


class TestAssignReconstruct:
    def test_codes_in_range_and_keep_cols(self, spark, emb):
        books, _ = pq.pq_train(emb, m=8, k=16, iters=1, init_by="id")
        coded = pq.pq_assign(
            emb.withColumn("tag", F.col("vec_id") % 3),
            books, keep_cols=("tag",),
        )
        row = coded.agg(
            F.min(F.array_min("codes")).alias("lo"),
            F.max(F.array_max("codes")).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("codes")).alias("m_total"),
        ).collect()[0]
        assert row.lo >= 0 and row.hi < 16
        assert row.m_total == row.n * 8
        assert "tag" in coded.columns

    def test_exact_on_codebook_points(self, spark):
        """A corpus whose vectors ARE codebook reconstructions must code
        and reconstruct with ZERO distortion — pins the argmin, the
        code-index convention AND pq_reconstruct's element_at layout."""
        rng = np.random.default_rng(3)
        books = rng.normal(size=(4, 8, 4)).round(3).tolist()  # m=4, k=8
        rows = []
        for i in range(64):
            codes = [int(c) for c in rng.integers(0, 8, 4)]
            vec = [x for j, c in enumerate(codes) for x in books[j][c]]
            rows.append((i, vec, codes))
        df = spark.createDataFrame(
            [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
        )
        got = {
            r.vec_id: list(r.codes)
            for r in pq.pq_assign(df, books).collect()
        }
        # ties are possible only if two codebook rows coincide (they
        # don't at 3 decimals of N(0,1)); assignment must be exact
        for i, _v, codes in rows:
            assert got[i] == codes, i
        rec = pq.pq_assign(df, books).select(
            "vec_id", pq.pq_reconstruct(books)(F.col("codes")).alias("rv")
        )
        back = {r.vec_id: list(r.rv) for r in rec.collect()}
        for i, v, _ in rows:
            assert np.allclose(back[i], v, atol=1e-12), i


class TestSearch:
    def test_adc_equals_true_distance_on_reconstructible_corpus(self, spark):
        """When corpus vectors are exact reconstructions, the ADC sum IS
        the true squared L2 distance — table lookups and the JVM
        aggregate must reproduce it to float tolerance."""
        rng = np.random.default_rng(4)
        books = rng.normal(size=(4, 8, 4)).round(3).tolist()
        corpus = []
        for i in range(40):
            codes = [int(c) for c in rng.integers(0, 8, 4)]
            vec = np.array(
                [x for j, c in enumerate(codes) for x in books[j][c]]
            )
            corpus.append((i, vec))
        cdf = pq.pq_assign(
            spark.createDataFrame(
                [(i, v.tolist()) for i, v in corpus],
                "neighbor_id long, embedding array<double>",
            ),
            books, vec_col="embedding", id_col="neighbor_id",
        )
        qvecs = [(100 + i, rng.normal(size=16).tolist()) for i in range(3)]
        qdf = spark.createDataFrame(qvecs, "query_id long, qv array<double>")
        got = pq.pq_topk(qdf, cdf, books, k=40, corpus_id="neighbor_id")
        rows = {(r.query_id, r.neighbor_id): r.adc_dist for r in got.collect()}
        for qid, qv in qvecs:
            q = np.array(qv)
            for i, v in corpus:
                true = round(float(((q - v) ** 2).sum()), 4)
                assert abs(rows[(qid, i)] - true) <= 1e-3, (qid, i)

    def test_shortlist_recall_vs_exact_l2(self, spark, emb):
        """End-to-end gate on real embeddings, in the operator's
        production role: the ADC top-k is a RE-RANK SHORTLIST, not the
        final answer (the IVF-PQ paper's ADC+R). Trained m=8/k=64 codes
        over this 500-vector corpus: the ADC top-50 must contain most of
        the exact L2 top-10 — measured 0.96 mean recall@10; the gate is
        pinned at 0.8 so codebook jitter can't flake the suite, while a
        broken table/lookup (a random 50-of-500 shortlist recalls ~0.1)
        still fails hard. Direct ADC top-10 on THIS corpus is the
        hard case for PQ (i.i.d. gaussian dims: distances concentrate,
        measured 0.40-0.56 at 32-64 bits) — which is exactly why the
        shortlist+re-rank contract is the one worth pinning."""
        books, _ = pq.pq_train(emb, m=8, k=64, iters=2, init_by="id")
        coded = pq.pq_assign(
            emb, books, id_col="vec_id"
        ).withColumnRenamed("vec_id", "neighbor_id")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        approx = pq.pq_topk(queries, coded, books, k=50)
        approx_sets = {
            q: {r.neighbor_id for r in rows}
            for q, rows in __import__("itertools").groupby(
                sorted(approx.collect(), key=lambda r: r.query_id),
                key=lambda r: r.query_id,
            )
        }
        # exact L2 top-10 (brute force on the driver: sf0.001 is small)
        vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
        recalls = []
        for qid in range(5):
            q = vecs[qid]
            exact = sorted(
                ((float(((q - v) ** 2).sum()), i) for i, v in vecs.items()),
            )[:10]
            exact_ids = {i for _, i in exact}
            recalls.append(len(exact_ids & approx_sets[qid]) / 10.0)
        assert sum(recalls) / len(recalls) >= 0.8, recalls

    def test_plan_is_jvm_on_the_corpus_side(self, spark, emb):
        """The corpus-sized hot path must not contain a Python stage:
        the only Arrow evals are the tiny query-table pass and the
        one-time assign — scoring is zip_with/aggregate in codegen."""
        books, _ = pq.pq_train(emb, m=8, k=16, iters=1, init_by="id")
        coded = pq.pq_assign(emb, books).withColumnRenamed(
            "vec_id", "neighbor_id"
        ).localCheckpoint()  # materialize: the plan below is search-only
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        plan = pq.pq_topk(queries, coded, books, k=5)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BatchEvalPython" not in plan
        # exactly one Arrow stage: the query-side ADC-table builder
        assert plan.count("MapInPandas") == 1


class TestIvfPq:
    """The composed IVF-PQ search (ivf_pq_topk): probe bound, exact
    re-rank parity with similarity.ivf_topk, and the residual (IVFADC)
    encoding's zero-distortion case."""

    @pytest.fixture(scope="class")
    def setup(self, spark, emb):
        from shopify_etl_spark.operators import similarity

        rows = [
            (r.vec_id, (np.array(r.embedding, dtype=np.float64)
                        / np.linalg.norm(r.embedding)).tolist())
            for r in emb.collect()
        ]
        unit = spark.createDataFrame(rows, "vec_id long, u array<double>")
        unit.cache().count()
        rng = np.random.default_rng(11)
        cents = rng.normal(size=(8, 64)).round(3).tolist()
        cents_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cid int, cv array<double>",
        )
        cells = similarity.ivf_assign(
            unit, cents_df, corpus_id="vec_id", corpus_vec="u",
            keep_cols=("u",),
        )
        cells.cache().count()
        return unit, cents, cents_df, cells, dict(rows)

    def test_rerank_parity_with_ivf_topk_and_probe_bound(
        self, spark, emb, setup
    ):
        """With a shortlist covering every candidate, ADC+R re-rank must
        return EXACTLY similarity.ivf_topk's answer (same probes, same
        tie-breaks; L2² order == cosine order on unit vectors) — and the
        probe bound is real: the answer equals exact search RESTRICTED
        to the probed cells, which for this corpus differs from
        unrestricted exact search (so scanning beyond the probed cells
        would fail the test)."""
        from shopify_etl_spark.operators import pq as pqm
        from shopify_etl_spark.operators import similarity

        unit, cents, cents_df, cells, vecs = setup
        books, _ = pqm.pq_train(
            unit, vec_col="u", id_col="vec_id", m=4, k=16, iters=2,
            init_by="id",
        )
        codes = pqm.pq_assign(
            cells, books, vec_col="u", id_col="vec_id",
            keep_cols=("centroid_id",),
        ).withColumnRenamed("vec_id", "neighbor_id")
        queries = unit.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), F.col("u").alias("qv")
        )
        got = pqm.ivf_pq_topk(
            queries, codes, books, cents_df, k=10, n_probes=2,
            shortlist=1000, rerank_vecs=unit.withColumnRenamed(
                "vec_id", "neighbor_id"),
            exclude_self=True,
        ).collect()
        got_ids = {}
        for r in sorted(got, key=lambda r: (r.query_id, r.exact_sqdist,
                                            r.neighbor_id)):
            got_ids.setdefault(r.query_id, []).append(r.neighbor_id)

        ref = similarity.ivf_topk(
            queries, unit.withColumnRenamed("vec_id", "neighbor_id"),
            cents_df, k=10, n_probes=2, corpus_vec="u",
            cent_vec="cv",
        ).collect()
        ref_ids = {}
        for r in sorted(ref, key=lambda r: (r.query_id, -r.cosine_sim,
                                            r.neighbor_id)):
            ref_ids.setdefault(r.query_id, []).append(r.neighbor_id)
        assert got_ids == ref_ids

        # probe-bound teeth: driver-side exact search, restricted vs not
        C = np.array(cents)
        cell_of = {r.vec_id: r.centroid_id for r in cells.collect()}
        restricted_differs = 0
        for qid in range(4):
            q = np.array(vecs[qid])
            csim = (C @ q) / (np.linalg.norm(C, axis=1) * np.linalg.norm(q))
            probed = set(np.lexsort((np.arange(8), -csim))[:2])
            full = sorted(
                (float(((q - np.array(v)) ** 2).sum()), i)
                for i, v in vecs.items() if i != qid
            )[:10]
            restricted = sorted(
                (float(((q - np.array(v)) ** 2).sum()), i)
                for i, v in vecs.items()
                if i != qid and cell_of[i] in probed
            )[:10]
            assert got_ids[qid] == [i for _, i in restricted], qid
            if [i for _, i in full] != [i for _, i in restricted]:
                restricted_differs += 1
        assert restricted_differs > 0, (
            "probing restricted nothing — the bound test has no teeth"
        )

    def test_residual_encoding_zero_distortion_case(self, spark):
        """IVFADC residual path: when every vector IS cent[cell] + an
        exact codebook reconstruction of the residual, residual codes
        carry zero distortion, so ADC distances (with residual tables)
        equal true distances and the top-k is the exact answer."""
        from shopify_etl_spark.operators import pq as pqm

        rng = np.random.default_rng(7)
        books = rng.normal(scale=0.1, size=(4, 8, 4)).round(3).tolist()
        cents = (rng.normal(size=(3, 16)) * 5).round(3)
        rows = []
        for i in range(60):
            cell = int(i % 3)
            codes = [int(c) for c in rng.integers(0, 8, 4)]
            resid = np.array(
                [x for j, c in enumerate(codes) for x in books[j][c]]
            )
            rows.append((i, cell, (cents[cell] + resid).tolist(), codes))
        df = spark.createDataFrame(
            [(i, c, v) for i, c, v, _ in rows],
            "vec_id long, centroid_id int, u array<double>",
        )
        coded = pqm.pq_assign_residual(
            df, books, cents.tolist(), vec_col="u", id_col="vec_id"
        )
        got_codes = {r.vec_id: list(r.codes) for r in coded.collect()}
        for i, _c, _v, codes in rows:
            assert got_codes[i] == codes, i

        cents_df = spark.createDataFrame(
            [(i, c.tolist()) for i, c in enumerate(cents)],
            "cid int, cv array<double>",
        )
        queries = spark.createDataFrame(
            [(100, (cents[0] + rng.normal(scale=0.05, size=16)).tolist())],
            "query_id long, qv array<double>",
        )
        got = pqm.ivf_pq_topk(
            queries,
            coded.withColumnRenamed("vec_id", "neighbor_id"),
            books, cents_df, k=60, n_probes=3, shortlist=100,
            residual=True,
        ).collect()
        q = np.array(queries.collect()[0].qv)
        true = {i: round(float(((q - np.array(v)) ** 2).sum()), 4)
                for i, _c, v, _ in rows}
        assert len(got) == 60
        for r in got:
            assert abs(r.adc_dist - true[r.neighbor_id]) <= 1e-3, r

    def test_composed_plan_stays_jvm_and_broadcast(self, spark, emb, setup):
        """The corpus-sized side of the composed search: no Python
        stage, candidates joined via broadcast (never a shuffle of the
        code table against the probe frame)."""
        from shopify_etl_spark.operators import pq as pqm

        unit, cents, cents_df, cells, _vecs = setup
        books, _ = pqm.pq_train(
            unit, vec_col="u", id_col="vec_id", m=4, k=16, iters=1,
            init_by="id",
        )
        codes = pqm.pq_assign(
            cells, books, vec_col="u", id_col="vec_id",
            keep_cols=("centroid_id",),
        ).withColumnRenamed("vec_id", "neighbor_id").localCheckpoint()
        queries = unit.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("u").alias("qv")
        )
        plan = pqm.ivf_pq_topk(
            queries, codes, books, cents_df, k=5, n_probes=2,
            rerank_vecs=unit.withColumnRenamed("vec_id", "neighbor_id")
            .localCheckpoint(),
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        # Arrow stages: the probe-table builder only (assign was
        # materialized above)
        assert plan.count("MapInPandas") == 1



class TestProbeEconomics:
    """VERDICT r13 #3: the IVF probe bound's SCALING claim, measured.

    The catalog queries pin n_cells=8 for oracle determinism, so their
    sf1 rows scan 10x more candidates per probe; the production sizing
    grows cells with the corpus (C ∝ √N keeps probe-scoring and
    candidate-scanning balanced). This test measures per-query candidate
    counts — the size of the probe-bounded join — through the engine's
    own kmeans_fit + ivf_assign at 1x/8-cells and 10x/25-cells and pins
    both halves of the economics:

    * the formula: mean candidates ≈ |corpus| · n_probes / n_cells at
      BOTH sizes (within skew tolerance);
    * the consequence: growing cells 8 → 25 holds candidate growth to
      ~N·8/25 ≈ 3.2x for 10x rows (sublinear), while the fixed-cells
      control grows the full ~10x.
    """

    N_PROBES = 2

    def _mean_candidates(self, spark, corpus, n_cells, n_queries=8):
        from shopify_etl_spark.operators.clustering import kmeans_fit
        from shopify_etl_spark.operators.similarity import ivf_assign

        cents, _ = kmeans_fit(
            corpus, vec_col="ev", id_col="vec_id", k=n_cells, iters=2,
            init_by="id",
        )
        cents_df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(cents)],
            "cid int, cv array<double>",
        )
        cells = ivf_assign(
            corpus, cents_df, corpus_id="vec_id", corpus_vec="ev"
        )
        sizes = {
            r.centroid_id: r.n
            for r in cells.groupBy("centroid_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        C = np.array(cents)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        qs = corpus.orderBy("vec_id").limit(n_queries).collect()
        cands = []
        for r in qs:
            q = np.array(r.ev)
            sim = Cn @ (q / np.linalg.norm(q))
            probed = np.lexsort((np.arange(n_cells), -sim))[: self.N_PROBES]
            cands.append(sum(sizes.get(int(c), 0) for c in probed))
        return float(np.mean(cands))

    def test_candidates_track_formula_and_grow_sublinearly(self, spark):
        base = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("ev"),
            )
        )
        n_base = base.count()
        # 10x corpus: replicas get disjoint ids and a small deterministic
        # per-replica perturbation on one coordinate (so the 25-cell fit
        # sees distinct points, not 10 coincident copies)
        reps = [
            base.select(
                (F.col("vec_id") + F.lit(r * n_base)).alias("vec_id"),
                F.transform(
                    "ev",
                    lambda x, i: x
                    + F.when(
                        i == F.lit(r % 64), F.lit(0.01 * r)
                    ).otherwise(F.lit(0.0)),
                ).alias("ev"),
            )
            for r in range(10)
        ]
        big = reps[0]
        for df in reps[1:]:
            big = big.unionAll(df)
        big = big.localCheckpoint()
        n_big = big.count()
        assert n_big == 10 * n_base

        m_base = self._mean_candidates(spark, base, 8)
        m_big = self._mean_candidates(spark, big, 25)
        m_fixed = self._mean_candidates(spark, big, 8)

        # the probe-bound formula, both sizes (skew tolerance: real
        # k-means cells are unequal, but the mean over queries must stay
        # the right order of magnitude around N·p/C)
        for m, n, c in ((m_base, n_base, 8), (m_big, n_big, 25)):
            expect = n * self.N_PROBES / c
            assert 0.35 * expect <= m <= 2.5 * expect, (m, expect)

        # the economics: cells growing with the corpus hold candidate
        # growth near N·(8/25) ≈ 3.2x; frozen cells pay the full ~10x
        growth_scaled = m_big / m_base
        growth_fixed = m_fixed / m_base
        assert growth_scaled < 0.6 * growth_fixed, (
            growth_scaled, growth_fixed,
        )
        assert growth_scaled <= 6.0, growth_scaled
        assert growth_fixed >= 6.0, growth_fixed


class TestBalancedAllocation:
    def test_permutation_and_product_balance(self, spark):
        """The allocation is a true permutation, deals exactly dim/m
        dims per subspace, and equalizes per-subspace variance products
        on a decayed spectrum (max/min geometric-mean ratio collapses
        from ~70x contiguous to <1.5x balanced)."""
        v = [1.0 / (1 + j) ** 2 for j in range(64)]
        perm = pq.balanced_dim_allocation(v, 4)
        assert sorted(perm) == list(range(64))

        def gms(order):
            return [
                float(
                    np.prod([v[d] for d in order[16 * m:16 * m + 16]])
                ) ** (1 / 16)
                for m in range(4)
            ]

        nat, bal = gms(list(range(64))), gms(perm)
        assert max(nat) / min(nat) > 50
        assert max(bal) / min(bal) < 1.5

    def test_apply_dim_permutation_reorders(self, spark):
        df = spark.createDataFrame(
            [(0, [float(x) for x in range(4)])],
            "vec_id long, ev array<double>",
        )
        out = pq.apply_dim_permutation(df, [3, 1, 0, 2], "ev").collect()[0]
        assert out.ev == [3.0, 1.0, 0.0, 2.0]

    def test_dim_variances_match_numpy(self, spark, emb):
        got = pq.dim_variances(
            emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("ev"),
            ),
            "ev", 64,
        )
        X = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
        want = X.var(axis=0)
        assert np.allclose(got, want, atol=1e-9)

    def test_balanced_layout_improves_recall_on_decayed_spectrum(
        self, spark, emb
    ):
        """The OPQ claim, end to end through the catalog query: on the
        1/(1+dim) spectrum the balanced layout's total exact-neighbor
        hits strictly exceed the natural layout's (measured 0.556 vs
        0.275 mean recall@10 at sf0.001 — gate one notch under)."""
        from shopify_etl_spark.plans import QUERIES

        rows = QUERIES["opq_balanced_pq"].builder(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(rows) == 8
        assert all(r.balanced_not_worse for r in rows)
        mean_p = sum(r.recall_plain for r in rows) / 8
        mean_b = sum(r.recall_balanced for r in rows) / 8
        assert mean_b >= mean_p + 0.15, (mean_p, mean_b)
