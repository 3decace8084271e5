"""Trained linear quality probe: distill an expensive curation gate into
a cheap linear scorer (the fastText-classifier move every LLM curation
pipeline makes — CCNet distills a Wikipedia-vs-crawl signal; here the
teacher is the engine's own Gopher-style composite gate, whose
``repetitive_bigram`` rule costs a full bigram fold per document, and
the student is a dot product over three cheap token statistics).

Why this shape at 100 TB: the teacher gate is affordable once, on a
sample; the student scores EVERY document with a 4-term fused
expression — no bigram materialization, no distinct-fold, no Python.
Training is full-batch gradient descent on the squared loss over
STANDARDIZED features:

* **featurize** (:func:`quality_probe_frame`): ONE narrow projection
  computes the three features AND the teacher label per document —
  token fold, stopword count, distinct fold, bigram fold — exactly
  ``text.quality_filter``'s rules, inlined so features and label come
  out of the same pass (joining the verdict back by id would
  re-evaluate the upstream subtree).
* **standardize** (:func:`feature_stats`): one aggregate pass yields
  per-feature SUM/SUMSQ/COUNT; ``mu = s/n``, ``sd = sqrt(sq/n − mu²)``
  in the driver (6 scalars). Standardization is what makes plain GD
  converge — the raw Gram matrix is ill-conditioned (token counts are
  O(50), ratios O(0.05)) and unscaled GD stalls at the base rate.
* **train** (:func:`probe_train`): ``iters`` full-batch GD steps, each
  ONE aggregate over the (checkpointed, feature-frame-sized) corpus:
  ``g_j = Σ (pred − y)·z_j``, ``w_j ← w_j − lr·(2·g_j/n)``. The weight
  vector (4 doubles) lives in the driver — the same centroid-only
  collect discipline as ``clustering.kmeans_fit``, and the whole fit is
  SQL-reproducible: deterministic zero init, fixed iteration count, and
  every update a polynomial in SUM aggregates (the only cross-engine
  divergence channel is summation order at ~1e-16).
* **score** (:func:`probe_score`): zero-shuffle projection; weights
  ride as literals.

No transcendentals anywhere (squared loss, not logistic) — sigmoid's
``exp`` is not bit-reproducible across engines, while +/·/sqrt are, so
the DuckDB oracle can re-run the EXACT training to the last ulp channel
the rest of the trained family already accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, _bigrams, _fold_stats, tokens


def quality_probe_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_distinct_ratio: float = 0.35,
    max_top_bigram_frac: float = 0.20,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """(id, x1=n_tokens, x2=stopword_ratio, x3=distinct_ratio, y) in ONE
    projection — the cheap features plus the EXPENSIVE teacher verdict
    (``text.quality_filter``'s five rules, bigram fold included; the
    bigram signal reaches the student only through the label).

    Empty documents are excluded (no tokens → no ratios, and the gate
    would reject them anyway — the probe's serving path short-circuits
    them the same way).
    """
    staged = df.select(
        id_col, tokens(text_col).alias("_toks")
    ).select(
        id_col,
        "_toks",
        _bigrams("_toks").alias("_bg"),
        F.size("_toks").alias("_n"),
    ).filter(F.col("_n") > 0)
    tok = _fold_stats("_toks")
    bgf = _fold_stats("_bg")
    stop_hits = F.size(
        F.filter(F.col("_toks"), lambda x: x.isin(*STOPWORDS))
    )
    dr = tok["nd"] / F.col("_n")
    tbf = bgf["top"] / F.nullif(F.size("_bg"), F.lit(0))
    sr = stop_hits / F.col("_n")
    keep = (
        (F.col("_n") >= min_tokens)
        & (F.col("_n") <= max_tokens)
        & (dr >= F.lit(min_distinct_ratio))
        & F.coalesce(tbf <= F.lit(max_top_bigram_frac), F.lit(True))
        & (sr >= F.lit(min_stopword_ratio))
    )
    return staged.select(
        id_col,
        F.col("_n").cast("double").alias("x1"),
        sr.alias("x2"),
        dr.alias("x3"),
        keep.alias("keep"),
        keep.cast("double").alias("y"),
    )


def feature_stats(
    frame: DataFrame, feature_cols: tuple[str, ...] = ("x1", "x2", "x3")
) -> tuple[list, list, int]:
    """(mus, sds, n) from ONE aggregate pass: ``mu = Σx/n``,
    ``sd = sqrt(Σx²/n − mu·mu)`` (one-pass moments; values are O(1)–
    O(100) so the cancellation keeps ~12 significant digits, far inside
    the accepted 1e-16 summation channel). Constant features degrade to
    ``sd = 1.0`` — mirrored verbatim in the SQL oracle."""
    row = frame.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"s_{c}") for c in feature_cols],
        *[F.sum(F.col(c) * F.col(c)).alias(f"q_{c}") for c in feature_cols],
    ).collect()[0]
    n = int(row["n"])
    mus, sds = [], []
    for c in feature_cols:
        mu = row[f"s_{c}"] / n
        var = row[f"q_{c}"] / n - mu * mu
        import math

        sd = math.sqrt(var) if var > 0 else 1.0
        mus.append(mu)
        sds.append(sd)
    return mus, sds, n


def _z_cols(mus: list, sds: list, feature_cols: tuple[str, ...]):
    return [
        ((F.col(c) - F.lit(mu)) / F.lit(sd)).alias(f"z{i + 1}")
        for i, (c, mu, sd) in enumerate(zip(feature_cols, mus, sds))
    ]


def probe_train(
    frame: DataFrame,
    mus: list,
    sds: list,
    n: int,
    iters: int = 16,
    lr: float = 0.4,
    feature_cols: tuple[str, ...] = ("x1", "x2", "x3"),
    label_col: str = "y",
) -> list:
    """Full-batch GD on the squared loss; returns ``[w0, w1, …]`` (bias
    first). One aggregate per iteration over the (tiny, feature-wide)
    frame — checkpoint the input so the corpus-sized featurization runs
    once, not ``iters`` times."""
    d = len(feature_cols)
    zf = frame.select(
        F.col(label_col).alias("y"), *_z_cols(mus, sds, feature_cols)
    )
    w = [0.0] * (d + 1)
    for _ in range(iters):
        pred = F.lit(w[0])
        for j in range(d):
            pred = pred + F.lit(w[j + 1]) * F.col(f"z{j + 1}")
        r = pred - F.col("y")
        row = zf.agg(
            F.sum(r).alias("g0"),
            *[
                F.sum(r * F.col(f"z{j + 1}")).alias(f"g{j + 1}")
                for j in range(d)
            ],
        ).collect()[0]
        w = [
            w[j] - lr * (2.0 * row[f"g{j}"] / n)
            for j in range(d + 1)
        ]
    return w


def probe_score(
    frame: DataFrame,
    weights: list,
    mus: list,
    sds: list,
    feature_cols: tuple[str, ...] = ("x1", "x2", "x3"),
    threshold: float = 0.5,
) -> DataFrame:
    """Adds ``score`` (the raw linear output) and ``pred_keep`` — a
    zero-shuffle projection with the trained weights as literals; this
    is the expression a 100 TB serving pass runs instead of the
    teacher's bigram fold."""
    score = F.lit(weights[0])
    for j, (c, mu, sd) in enumerate(zip(feature_cols, mus, sds)):
        score = score + F.lit(weights[j + 1]) * (
            (F.col(c) - F.lit(mu)) / F.lit(sd)
        )
    return frame.withColumn("score", score).withColumn(
        "pred_keep", F.col("score") >= F.lit(threshold)
    )
