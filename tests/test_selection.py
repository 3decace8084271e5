"""DSIR importance weighting, novelty scoring, and the deterministic
embedding decompositions (JL projection, Gram/PCA power iteration)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators.dedup import doc_novelty
from shopify_etl_spark.operators.selection import dsir_importance_weights
from shopify_etl_spark.operators.similarity import (
    _jl_signs,
    gram_matrix,
    jl_project,
    pca_power_scores,
)


def _md5_bucket(tok: str, n_buckets: int = 8192) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets


class TestDsir:
    def test_hand_computed_two_docs(self, spark):
        # target doc: "a a b"; raw-only doc: "c c b"
        df = spark.createDataFrame(
            [(1, "a a b", True), (2, "c c b", False)],
            "doc_id long, text string, tgt boolean",
        )
        out = {
            r["doc_id"]: r
            for r in dsir_importance_weights(
                df, F.col("tgt"), n_buckets=8192
            ).collect()
        }
        # token model: target counts {a:2, b:1}, raw counts {a:2, b:2, c:2}
        # n_t = 3, n_r = 6, B = 8192, alpha = 1
        def lr(c_t, c_r):
            return math.log((c_t + 1) / (3 + 8192)) - math.log(
                (c_r + 1) / (6 + 8192)
            )

        w1 = 2 * lr(2, 2) + lr(1, 2)
        w2 = 2 * lr(0, 2) + lr(1, 2)
        assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 3
        assert out[1]["is_target"] is True and out[2]["is_target"] is False
        assert out[1]["dsir_logw"] == pytest.approx(round(w1, 4), abs=1e-4)
        assert out[2]["dsir_logw"] == pytest.approx(round(w2, 4), abs=1e-4)
        # target-looking text must outscore raw-only text
        assert out[1]["dsir_logw"] > out[2]["dsir_logw"]

    def test_resampling_direction_on_shared_vocab(self, spark):
        # docs sharing the target's vocabulary rank above docs that don't,
        # even when neither is in the target slice
        rows = [
            (1, "spark shuffle join", True),
            (2, "spark shuffle agg", True),
            (3, "spark shuffle scan", False),  # target-like, not in target
            (4, "cat dog fish", False),  # off-distribution
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
        out = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_importance_weights(df, F.col("tgt")).collect()
        }
        assert out[3] > out[4]

    def test_bucket_hash_matches_reference(self):
        # the Spark-side pmod(md5-prefix) bucketing must equal the
        # portable Python/DuckDB construction the oracle uses
        assert _md5_bucket("spark") == int(
            hashlib.md5(b"spark").hexdigest()[:15], 16
        ) % 8192


class TestDocNovelty:
    def test_planted_copy_and_half_copy(self, spark):
        a = "w1 w2 w3 w4 w5 w6"  # 4 distinct 3-gram shingles
        c = "w4 w5 w6 w7 w8 w9"  # shares shingle "w4 w5 w6" with A
        df = spark.createDataFrame(
            [(1, a), (2, a), (3, c)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in doc_novelty(df).collect()}
        assert out[1]["novelty"] == 1.0  # first occurrence of everything
        assert out[2]["novelty"] == 0.0  # exact copy, all shingles seen
        # doc 3: shingles {456,567,678,789}; only 456 first-occurs in doc 1
        assert out[3]["n_shingles"] == 4 and out[3]["n_novel"] == 3
        assert out[3]["novelty"] == 0.75

    def test_short_docs_drop(self, spark):
        df = spark.createDataFrame(
            [(1, "only two"), (2, "a b c")], "doc_id long, text string"
        )
        out = doc_novelty(df).collect()
        assert [r["doc_id"] for r in out] == [2]


class TestJlProject:
    def test_numpy_parity_and_determinism(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.randn(20, 64).astype(np.float32) * 0.3
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        out = jl_project(df).collect()
        signs = np.array(_jl_signs(16, 64, "jl-v1"))
        q = np.rint(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
        expect = (q @ signs.T) / 4_000_000.0
        for r in out:
            assert r["val"] == expect[r["vec_id"], r["j"]]
        # rerun is bit-identical (the matrix is a function, not state)
        again = jl_project(df).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_norm_preservation_jl_bound(self, spark):
        rng = np.random.RandomState(11)
        vecs = rng.randn(50, 64).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        rows = jl_project(df).collect()
        proj = np.zeros((50, 16))
        for r in rows:
            proj[r["vec_id"], r["j"]] = r["val"]
        orig = np.linalg.norm(vecs, axis=1)
        new = np.linalg.norm(proj, axis=1)
        # ±1 projections preserve norms in expectation; allow wide JL slack
        ratio = new / orig
        assert 0.5 < ratio.mean() < 1.5
        assert (ratio > 0.3).all() and (ratio < 2.0).all()


class TestPcaPower:
    def _toy(self, spark, n=40):
        rng = np.random.RandomState(3)
        # strong first component along a fixed direction
        d1 = rng.randn(64)
        d1 /= np.linalg.norm(d1)
        coefs = rng.randn(n, 1) * 2.0
        noise = rng.randn(n, 64) * 0.05
        vecs = (coefs @ d1[None, :] + noise).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        return df, vecs, d1

    def test_gram_matches_numpy(self, spark):
        df, vecs, _ = self._toy(spark)
        got = {(r["i"], r["j"]): r["gv"] for r in gram_matrix(df).collect()}
        q = np.rint(vecs.astype(np.float64) * 1000).astype(np.int64)
        G = q.T @ q
        iu, ju = np.triu_indices(64)
        for i, j in zip(iu, ju):
            assert got[(i + 1, j + 1)] == G[i, j]
        assert len(got) == 64 * 65 // 2

    def test_scores_match_numpy_power_iteration(self, spark):
        df, vecs, _ = self._toy(spark)
        out = {r["vec_id"]: r["pc1_score"] for r in pca_power_scores(df).collect()}
        q = np.rint(vecs.astype(np.float64) * 1000).astype(np.int64)
        G = (q.T @ q).astype(np.float64)
        v = np.ones(64)
        for _ in range(3):
            y = G @ v
            v = np.round(y / np.abs(y).max(), 10)
        expect = (q @ v) / 1000.0
        for i in range(len(vecs)):
            assert out[i] == pytest.approx(expect[i], abs=2e-4)

    def test_pc1_captures_planted_direction(self, spark):
        df, vecs, d1 = self._toy(spark)
        out = {r["vec_id"]: r["pc1_score"] for r in pca_power_scores(df).collect()}
        scores = np.array([out[i] for i in range(len(vecs))])
        true_coef = vecs.astype(np.float64) @ d1
        corr = abs(np.corrcoef(scores, true_coef)[0, 1])
        assert corr > 0.99


class TestJlBucketNearDups:
    def test_planted_near_identical_pair_found(self, spark):
        from shopify_etl_spark.operators.similarity import jl_bucket_near_dups

        rng = np.random.RandomState(5)
        base = rng.randn(64).astype(np.float32)
        near = base + rng.randn(64).astype(np.float32) * 0.01
        noise = [rng.randn(64).astype(np.float32) for _ in range(10)]
        rows = [(0, base.tolist()), (1, near.tolist())] + [
            (i + 2, v.tolist()) for i, v in enumerate(noise)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {(r["d1"], r["d2"]): r["cosine_sim"]
                 for r in jl_bucket_near_dups(df, threshold=0.9).collect()}
        # identical-direction vectors share every sign bit -> same bucket
        assert (0, 1) in pairs
        assert pairs[(0, 1)] > 0.99

    def test_opposite_vectors_never_pair(self, spark):
        from shopify_etl_spark.operators.similarity import jl_bucket_near_dups

        v = np.random.RandomState(9).randn(64).astype(np.float32)
        df = spark.createDataFrame(
            [(0, v.tolist()), (1, (-v).tolist())],
            "vec_id long, embedding array<float>",
        )
        # every projection sign flips (no zero components in practice),
        # so the pair lands in different buckets and is never scored
        assert jl_bucket_near_dups(df, threshold=-1.0).count() == 0


class TestOovRates:
    def test_hand_computed(self, spark):
        from shopify_etl_spark.operators.text import oov_rates

        rows = [
            (1, "a a b", "s1"),
            (2, "a c d", "s2"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        # freqs: a=3, b=1, c=1, d=1; vocab_size=2 -> {a, b} (ties by token)
        out = {r["source"]: r for r in oov_rates(df, vocab_size=2).collect()}
        assert out["s1"]["n_tokens"] == 3 and out["s1"]["n_oov"] == 0
        assert out["s2"]["n_tokens"] == 3 and out["s2"]["n_oov"] == 2
        assert out["s2"]["oov_rate"] == pytest.approx(0.6667)


class TestPagerank:
    @staticmethod
    def _reference(edges, damping=0.85, iters=3):
        # mirror of the fixed recipe: symmetrize, uniform init, per-step
        # round(10), final round(4)
        sym = {}
        for a, b in edges:
            sym.setdefault(a, set()).add(b)
            sym.setdefault(b, set()).add(a)
        n = len(sym)
        r = {v: 1.0 / n for v in sym}
        for _ in range(iters):
            nxt = {}
            for v in sym:
                s = sum(r[u] / len(sym[u]) for u in sym[v])
                nxt[v] = round((1.0 - damping) / n + damping * s, 10)
            r = nxt
        return {v: round(x, 4) for v, x in r.items()}

    def test_star_graph_hand_values(self, spark):
        from shopify_etl_spark.operators.graph import pagerank

        edges = [(0, 1), (0, 2), (0, 3)]
        df = spark.createDataFrame(edges, "d1 long, d2 long")
        got = {r["node"]: r for r in pagerank(df).collect()}
        expect = self._reference(edges)
        for v, pr in expect.items():
            assert got[v]["pagerank"] == pytest.approx(pr, abs=1e-4)
        assert got[0]["degree"] == 3 and got[1]["degree"] == 1
        # the hub dominates
        assert got[0]["pagerank"] > 3 * got[1]["pagerank"]

    def test_symmetric_pair_stays_uniform(self, spark):
        from shopify_etl_spark.operators.graph import pagerank

        df = spark.createDataFrame([(7, 9)], "d1 long, d2 long")
        out = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
        assert out[7] == out[9] == 0.5

    def test_rank_mass_conserved(self, spark):
        from shopify_etl_spark.operators.graph import pagerank

        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
        df = spark.createDataFrame(edges, "d1 long, d2 long")
        total = sum(r["pagerank"] for r in pagerank(df).collect())
        # undirected graph, no dangling mass: total rank ~ 1
        assert total == pytest.approx(1.0, abs=1e-3)

    def test_degree_cap_bounds_edges_keeps_all_nodes(self, spark):
        """max_degree sparsification: a hub with 6 spokes keeps only its 2
        strongest outgoing edges, every node survives (incl. spokes whose
        only in-edge the hub dropped — they keep teleport-only rank), and
        the hub still dominates because every spoke keeps its edge TO it."""
        from shopify_etl_spark.operators.graph import pagerank

        # hub 0 with 6 spokes; weights rank spoke 1 > 2 > ... > 6
        edges = [(0, i, 1.0 - 0.1 * i) for i in range(1, 7)]
        df = spark.createDataFrame(edges, "d1 long, d2 long, jaccard double")
        got = {r["node"]: r for r in pagerank(df, max_degree=2).collect()}
        assert set(got) == {0, 1, 2, 3, 4, 5, 6}  # no node vanishes
        assert got[0]["degree"] == 2  # hub capped from 6 outgoing to 2
        assert all(got[i]["degree"] == 1 for i in range(1, 7))  # spokes keep hub edge
        assert all(got[0]["pagerank"] > got[i]["pagerank"] for i in range(1, 7))
        # spokes the hub dropped (3..6) get identical teleport-only-in ranks
        assert len({got[i]["pagerank"] for i in range(3, 7)}) == 1
        # retained spokes (1, 2) receive hub mass on top
        assert got[1]["pagerank"] > got[3]["pagerank"]

    def test_degree_cap_noop_below_cap(self, spark):
        """A cap larger than every degree must reproduce the uncapped
        answer exactly (the capped query's oracle twin relies on this)."""
        from shopify_etl_spark.operators.graph import pagerank

        edges = [(0, 1, 0.9), (1, 2, 0.8), (2, 3, 0.7), (3, 0, 0.6), (0, 2, 0.5)]
        df = spark.createDataFrame(edges, "d1 long, d2 long, jaccard double")
        plain = {(r["node"], r["degree"], r["pagerank"])
                 for r in pagerank(df.select("d1", "d2")).collect()}
        capped = {(r["node"], r["degree"], r["pagerank"])
                  for r in pagerank(df, max_degree=10).collect()}
        assert plain == capped


class TestTokenEntropy:
    def test_hand_computed(self, spark):
        from shopify_etl_spark.operators.text import token_entropy

        df = spark.createDataFrame(
            [(1, "a a b b"), (2, "x x x x"), (3, "p q r s")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in token_entropy(df).collect()}
        # uniform over 2 types -> 1 bit; constant -> 0; uniform over 4 -> 2
        assert out[1]["token_entropy"] == pytest.approx(1.0)
        assert out[2]["token_entropy"] == pytest.approx(0.0)
        assert out[3]["token_entropy"] == pytest.approx(2.0)
        assert out[1]["ttr"] == 0.5 and out[2]["ttr"] == 0.25 and out[3]["ttr"] == 1.0
        assert out[1]["n_types"] == 2 and out[1]["n_tokens"] == 4

    def test_empty_docs_drop(self, spark):
        from shopify_etl_spark.operators.text import token_entropy

        df = spark.createDataFrame(
            [(1, "   "), (2, "a b")], "doc_id long, text string"
        )
        assert [r["doc_id"] for r in token_entropy(df).collect()] == [2]


class TestPcaTop2:
    def test_matches_numpy_deflation(self, spark):
        from shopify_etl_spark.operators.similarity import pca_top2_scores

        rng = np.random.RandomState(13)
        d1 = rng.randn(64); d1 /= np.linalg.norm(d1)
        d2 = rng.randn(64); d2 -= (d2 @ d1) * d1; d2 /= np.linalg.norm(d2)
        vecs = (
            rng.randn(40, 1) * 2.0 @ d1[None, :]
            + rng.randn(40, 1) * 1.0 @ d2[None, :]
            + rng.randn(40, 64) * 0.03
        ).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: r for r in pca_top2_scores(df).collect()}

        q = np.rint(vecs.astype(np.float64) * 1000).astype(np.int64)
        Gs = (q.T @ q).astype(np.float64) / float(1 << 33)

        def it(M):
            v = np.ones(64)
            for _ in range(3):
                y = M @ v
                v = np.round(y / np.abs(y).max(), 10)
            return v

        v1 = it(Gs)
        nv = v1 @ v1
        lam = np.round((v1 @ Gs @ v1) / nv, 10)
        v2 = it(np.round(Gs - (lam * np.outer(v1, v1)) / nv, 10))
        e1 = (q @ v1) / 1000.0
        e2 = (q @ v2) / 1000.0
        for i in range(40):
            assert out[i]["pc1_score"] == pytest.approx(e1[i], abs=2e-4)
            assert out[i]["pc2_score"] == pytest.approx(e2[i], abs=2e-4)

    def test_components_capture_orthogonal_directions(self, spark):
        from shopify_etl_spark.operators.similarity import pca_top2_scores

        rng = np.random.RandomState(21)
        d1 = rng.randn(64); d1 /= np.linalg.norm(d1)
        d2 = rng.randn(64); d2 -= (d2 @ d1) * d1; d2 /= np.linalg.norm(d2)
        c1 = rng.randn(60, 1) * 3.0
        c2 = rng.randn(60, 1) * 1.5
        vecs = (c1 @ d1[None, :] + c2 @ d2[None, :]
                + rng.randn(60, 64) * 0.02).astype(np.float32)
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        rows = pca_top2_scores(df).collect()
        s1 = np.array([r["pc1_score"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        s2 = np.array([r["pc2_score"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        # pc1 tracks the dominant planted direction, pc2 the second,
        # and the two score vectors are (nearly) uncorrelated
        assert abs(np.corrcoef(s1, c1[:, 0])[0, 1]) > 0.99
        assert abs(np.corrcoef(s2, c2[:, 0])[0, 1]) > 0.97
        assert abs(np.corrcoef(s1, s2)[0, 1]) < 0.2


class TestPsiDrift:
    def test_identical_segments_score_zero(self, spark):
        from shopify_etl_spark.operators.stats import psi_drift

        rows = [("a", float(v)) for v in range(0, 500, 10)] + [
            ("b", float(v)) for v in range(0, 500, 10)
        ]
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = {r["event_type"]: r["psi"] for r in psi_drift(df).collect()}
        # both segments == the population -> PSI ~ 0 (not exactly: the
        # smoothing denominators differ between segment and population)
        assert out["a"] == out["b"]
        assert abs(out["a"]) < 0.001

    def test_shifted_segment_scores_high(self, spark):
        from shopify_etl_spark.operators.stats import psi_drift

        low = [("low", float(v % 100)) for v in range(200)]
        high = [("high", 400.0 + v % 100) for v in range(200)]
        df = spark.createDataFrame(low + high, "event_type string, value double")
        out = {r["event_type"]: r["psi"] for r in psi_drift(df).collect()}
        # each half concentrates in disjoint buckets vs the mixed
        # population -> strong drift on both sides
        assert out["low"] > 0.25 and out["high"] > 0.25

    def test_nulls_excluded(self, spark):
        from shopify_etl_spark.operators.stats import psi_drift

        df = spark.createDataFrame(
            [("a", 10.0), ("a", None), ("a", 20.0)],
            "event_type string, value double",
        )
        assert psi_drift(df).collect()[0]["n_rows"] == 2


class TestDsirCrossCorpus:
    def test_unseen_buckets_get_smoothed_ratio_not_dropped(self, spark):
        from shopify_etl_spark.operators.selection import (
            dsir_fit,
            dsir_score,
            dsir_token_stream,
        )

        fit_docs = spark.createDataFrame(
            [(1, "a a b", True), (2, "b c", False)],
            "doc_id long, text string, tgt boolean",
        )
        model = dsir_fit(dsir_token_stream(fit_docs, F.col("tgt"), n_buckets=512))
        # score a DIFFERENT corpus: token 'z' hashes to a bucket with no
        # fitted row and must contribute the zero-count smoothed ratio,
        # not silently drop
        new_docs = spark.createDataFrame(
            [(10, "a z z", False)], "doc_id long, text string, tgt boolean"
        )
        stream = dsir_token_stream(new_docs, F.col("tgt"), n_buckets=512)
        row = dsir_score(stream, model, n_buckets=512).collect()[0]
        assert row["n_tokens"] == 3  # all three tokens counted
        # hand-compute: model counts a:(r2,t2) b:(r2,t1) c:(r1,t0);
        # n_r=5, n_t=3, B=512, alpha=1
        def lr(ct, cr):
            return math.log((ct + 1) / (3 + 512)) - math.log((cr + 1) / (5 + 512))

        expect = lr(2, 2) + 2 * lr(0, 0)  # 'a' seen, 'z' unseen twice
        assert row["dsir_logw"] == pytest.approx(round(expect, 4), abs=1e-4)


class TestPsiLoOffset:
    def test_nonzero_lo_buckets_correctly(self, spark):
        from shopify_etl_spark.operators.stats import psi_drift

        # values in [100, 200): with lo=100 the histogram must spread
        # across buckets, not collapse into the top clamp
        rows = [("a", 100.0 + v) for v in range(0, 100, 5)] + [
            ("b", 100.0 + v) for v in range(0, 100, 5)
        ]
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = {r["event_type"]: r["psi"]
               for r in psi_drift(df, lo=100.0, hi=200.0, n_buckets=10).collect()}
        # identical segments over a correctly-offset histogram: PSI ~ 0
        assert abs(out["a"]) < 0.001 and out["a"] == out["b"]


class TestPsiBetweenHistograms:
    def test_identical_windows_score_zero(self, spark):
        from shopify_etl_spark.operators.stats import (
            psi_between_histograms,
            value_histogram,
        )

        rows = [("a", float(v)) for v in range(0, 500, 25)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        h = value_histogram(df)
        out = psi_between_histograms(h, h).collect()[0]
        # same histogram on both sides: identical smoothing -> exactly 0
        assert out["psi"] == 0.0
        assert out["n_ref_rows"] == out["n_cur_rows"] == 20

    def test_bucket_count_mismatch_fails_loudly(self, spark):
        """A histogram built with MORE buckets than the PSI call assumes
        must raise in-plan, not silently drop the out-of-range buckets'
        mass from the PSI terms while keeping it in the denominators."""
        from shopify_etl_spark.operators.stats import (
            psi_between_histograms,
            psi_from_histogram,
            value_histogram,
        )

        df = spark.createDataFrame(
            [("a", float(v)) for v in range(0, 500, 10)],
            "event_type string, value double",
        )
        h40 = value_histogram(df, n_buckets=40)  # buckets 0..39
        with pytest.raises(Exception, match="bucket-count mismatch"):
            psi_from_histogram(h40, n_buckets=20).collect()
        with pytest.raises(Exception, match="bucket-count mismatch"):
            psi_between_histograms(h40, h40, n_buckets=20).collect()
        # matching counts still score
        assert psi_from_histogram(h40, n_buckets=40).collect()

    def test_shifted_window_scores_high(self, spark):
        from shopify_etl_spark.operators.stats import (
            psi_between_histograms,
            value_histogram,
        )

        ref = value_histogram(spark.createDataFrame(
            [("a", float(v % 100)) for v in range(100)],
            "event_type string, value double",
        ))
        cur = value_histogram(spark.createDataFrame(
            [("a", 400.0 + v % 100) for v in range(100)],
            "event_type string, value double",
        ))
        out = psi_between_histograms(ref, cur).collect()[0]
        assert out["psi"] > 0.25

    def test_segment_missing_from_reference_reads_as_drift(self, spark):
        from shopify_etl_spark.operators.stats import (
            psi_between_histograms,
            value_histogram,
        )

        ref = value_histogram(spark.createDataFrame(
            [("a", 10.0)], "event_type string, value double",
        ))
        cur = value_histogram(spark.createDataFrame(
            [("a", 10.0)] + [("new_seg", 300.0)] * 50,
            "event_type string, value double",
        ))
        out = {r["event_type"]: r for r in psi_between_histograms(ref, cur).collect()}
        assert "new_seg" in out  # never silently dropped
        assert out["new_seg"]["n_ref_rows"] == 0
        # 50 concentrated rows vs the uniform smoothed prior = loud drift
        # (a single row would stay quiet — smoothing treats tiny samples
        # as weak evidence, which is the intended behavior)
        assert out["new_seg"]["psi"] > 0.25


class TestPagerankDirected:
    @staticmethod
    def _reference(edges, damping=0.85, iters=3):
        # mirror of the pinned directed recipe: weighted out-splits,
        # uniform init over ALL endpoints, dangling mass evaporates,
        # per-step round(10), final round(4)
        nodes = {v for e in edges for v in e[:2]}
        out = {}
        for s, t, w in edges:
            out.setdefault(s, []).append((t, w))
        ow = {s: sum(w for _, w in ts) for s, ts in out.items()}
        n = len(nodes)
        r = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            msg = {v: 0.0 for v in nodes}
            for s, ts in out.items():
                for t, w in ts:
                    msg[t] += r[s] * w / ow[s]
            r = {
                v: round((1 - damping) / n + damping * msg[v], 10)
                for v in nodes
            }
        return {v: round(x, 4) for v, x in r.items()}

    def test_weighted_hand_values(self, spark):
        from shopify_etl_spark.operators.graph import pagerank_directed

        edges = [
            (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0),
            (2, 0, 1.0), (3, 0, 5.0),
        ]
        df = spark.createDataFrame(edges, "src long, dst long, w double")
        got = {
            r["node"]: r
            for r in pagerank_directed(df, weight="w").collect()
        }
        for v, pr in self._reference(edges).items():
            assert got[v]["pagerank"] == pytest.approx(pr, abs=1e-4), v
        # out-degrees are post-aggregation edge counts
        assert got[0]["out_degree"] == 2 and got[3]["out_degree"] == 1

    def test_direction_matters(self, spark):
        """A pure sink accumulates rank a pure source never gets —
        the property the undirected operator cannot express."""
        from shopify_etl_spark.operators.graph import pagerank_directed

        df = spark.createDataFrame(
            [(0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
            "src long, dst long, w double",
        )
        got = {
            r["node"]: r["pagerank"]
            for r in pagerank_directed(df, weight="w").collect()
        }
        assert got[2] > got[3] > got[0] == got[1]

    def test_weight_proportional_split(self, spark):
        """Mass splits along out-edges by weight: with 9:1 weights the
        heavy target's received mass is 9x the light one's."""
        from shopify_etl_spark.operators.graph import pagerank_directed

        df = spark.createDataFrame(
            # 1 and 2 link back so every node has out-edges
            [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
            "src long, dst long, w double",
        )
        got = {
            r["node"]: r["pagerank"]
            for r in pagerank_directed(df, weight="w").collect()
        }
        ref = self._reference(
            [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
        )
        for v, pr in ref.items():
            assert got[v] == pytest.approx(pr, abs=1e-4)
        assert got[1] > got[2]

    def test_dangling_receiver_supported(self, spark):
        """A node with only in-edges still ranks (receives mass; its own
        mass evaporates by the pinned recipe — documented)."""
        from shopify_etl_spark.operators.graph import pagerank_directed

        df = spark.createDataFrame(
            [(0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, w double"
        )
        got = {
            r["node"]: r
            for r in pagerank_directed(df, weight="w").collect()
        }
        assert set(got) == {0, 1, 2}
        assert got[1]["out_degree"] == 0
        assert got[1]["pagerank"] == got[2]["pagerank"] > got[0]["pagerank"]

    def test_unweighted_default(self, spark):
        from shopify_etl_spark.operators.graph import pagerank_directed

        df = spark.createDataFrame(
            [(0, 1), (1, 0)], "src long, dst long"
        )
        got = {
            r["node"]: r["pagerank"]
            for r in pagerank_directed(df).collect()
        }
        assert got[0] == got[1] == pytest.approx(0.5, abs=1e-4)
