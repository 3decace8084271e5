"""Linear quality probe (operators/classifier.py): GD convergence,
determinism, numpy ground-truth parity, and the distillation claim
(accuracy strictly above the base rate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators import classifier as C


@pytest.fixture(scope="module")
def frame(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    f = C.quality_probe_frame(docs).localCheckpoint()
    f.count()
    return f


@pytest.fixture(scope="module")
def fitted(frame):
    mus, sds, n = C.feature_stats(frame)
    w = C.probe_train(frame, mus, sds, n, iters=16, lr=0.4)
    return mus, sds, n, w


class TestTrain:
    def test_deterministic(self, frame, fitted):
        mus, sds, n, w = fitted
        mus2, sds2, n2 = C.feature_stats(frame)
        w2 = C.probe_train(frame, mus2, sds2, n2, iters=16, lr=0.4)
        assert mus == mus2 and sds == sds2 and w == w2

    def test_matches_numpy_ground_truth(self, frame, fitted):
        """The distributed fit must replicate a single-machine numpy GD
        on the same standardization, to float tolerance (summation-order
        ulp only)."""
        mus, sds, n, w = fitted
        rows = frame.collect()
        y = np.array([r.y for r in rows])
        raw = np.array([[r.x1, r.x2, r.x3] for r in rows])
        Z = (raw - np.array(mus)) / np.array(sds)
        X = np.concatenate([np.ones((len(y), 1)), Z], axis=1)
        wn = np.zeros(4)
        for _ in range(16):
            g = X.T @ (X @ wn - y)
            wn = wn - 0.4 * (2.0 * g / len(y))
        assert np.allclose(w, wn, atol=1e-9)

    def test_loss_decreases(self, frame, fitted):
        """Squared loss after 16 steps strictly below the zero-weight
        loss, and below the 4-step loss — GD is actually descending."""
        mus, sds, n, _ = fitted
        rows = frame.collect()
        y = np.array([r.y for r in rows])
        raw = np.array([[r.x1, r.x2, r.x3] for r in rows])
        Z = (raw - np.array(mus)) / np.array(sds)
        X = np.concatenate([np.ones((len(y), 1)), Z], axis=1)

        def loss(wv):
            return float(((X @ np.array(wv) - y) ** 2).mean())

        w4 = C.probe_train(frame, mus, sds, n, iters=4, lr=0.4)
        w16 = C.probe_train(frame, mus, sds, n, iters=16, lr=0.4)
        assert loss(w16) < loss(w4) < loss([0.0] * 4)


class TestScore:
    def test_accuracy_beats_base_rate(self, spark, frame, fitted):
        """The distillation claim: the student agrees with the teacher
        more often than always-guessing the majority class."""
        mus, sds, n, w = fitted
        scored = C.probe_score(frame, w, mus, sds)
        row = scored.agg(
            F.avg((F.col("pred_keep") == F.col("keep")).cast("double")).alias(
                "acc"
            ),
            F.avg("y").alias("rate"),
        ).collect()[0]
        base = max(row.rate, 1.0 - row.rate)
        assert row.acc > base + 0.01

    def test_score_is_projection_of_features(self, frame, fitted):
        """probe_score recomputes z inline — pin it against manual z."""
        mus, sds, _, w = fitted
        one = frame.limit(1).collect()[0]
        z = [
            (x - mu) / sd
            for x, mu, sd in zip([one.x1, one.x2, one.x3], mus, sds)
        ]
        expect = w[0] + w[1] * z[0] + w[2] * z[1] + w[3] * z[2]
        got = (
            C.probe_score(frame.limit(1), w, mus, sds)
            .collect()[0]
            .score
        )
        assert abs(got - expect) < 1e-12

    def test_empty_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "the a of and to " * 10), (2, "   "), (3, "")],
            ["doc_id", "text"],
        )
        got = C.quality_probe_frame(df).select("doc_id").collect()
        assert [r.doc_id for r in got] == [1]
