"""Trained scalar (int8) and binary (sign/Hamming) vector quantization —
the two non-PQ compression paths of the ANN serving stack (reference
extension brief: similarity search at 100 TB; ``operators/pq.py`` covers
the codebook path, this module covers the per-dimension ones).

Why both exist at 100 TB:

* **Scalar quantization (SQ)** stores one uint8 per dimension against a
  TRAINED per-dimension ``[min, max]`` grid — 4× smaller than float32
  with near-exact recall, and search is *asymmetric*: the query stays
  float and candidates are compared via their dequantized values
  ``min + code·step``, so no query-side quantization error enters the
  ranking (Faiss ``SQ8`` / Lucene ``int8_hnsw`` semantics).
* **Binary quantization (BQ)** keeps one SIGN BIT per dimension against
  a trained per-dimension mean threshold, packed into 32-bit words —
  a 32× compression whose Hamming distance is a monotone proxy for
  angular distance (Charikar hyperplane bound). Production use is a
  SHORTLIST: Hamming top-``shortlist`` from the packed codes, then an
  exact re-rank of that tiny candidate set (the same ADC+R discipline
  as ``pq.pq_topk``).

Scale shapes:

* **train** is ONE aggregate pass producing ``2·dim`` (SQ) or ``dim``
  (BQ) scalars via map-side partial aggregation — no explode, nothing
  row-sized ever reaches the driver (the collected model is 64–128
  doubles).
* **encode** is a zero-shuffle projection: the trained grid rides in
  the plan as array literals and each row is a single codegen'd
  ``transform``/fold; codes never join back to the float table.
* **search** broadcasts the (tiny) query frame; the corpus-sized side
  is scanned once with pure JVM expressions — dequantize-and-accumulate
  fused into one ``aggregate`` fold (SQ), XOR + ``bit_count`` word fold
  (BQ). Top-k windows partition by query (bounded shortlist role, the
  same accepted shape as ``similarity.cosine_topk``); ties break on
  neighbor id, then exact re-rank ties on id again.

Determinism: training reduces to per-dimension MIN/MAX (order-free) or
MEAN (summation-order noise ~1e-16 — same channel as every trained
query in ``plans/catalog_ext5``); encode uses ``floor(x + 0.5)`` so
both engines run the identical IEEE sequence with no rounding-mode
dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Scalar quantization (int8, trained per-dimension grid)
# ---------------------------------------------------------------------------


def sq_train(df: DataFrame, vec_col: str, dim: int) -> tuple[list, list]:
    """Per-dimension ``(mins, steps)`` for a ``levels``-point uniform grid.

    ONE aggregate pass with ``2·dim`` min/max expressions — map-side
    partial aggregation, no explode, no shuffle wider than the partial
    rows. The returned model is ``2·dim`` floats (driver-side, bounded
    and documented — the same centroid-only-collect discipline as
    ``clustering.kmeans_fit``).
    """
    row = df.agg(
        *[
            F.min(F.element_at(vec_col, i + 1)).alias(f"mn{i}")
            for i in range(dim)
        ],
        *[
            F.max(F.element_at(vec_col, i + 1)).alias(f"mx{i}")
            for i in range(dim)
        ],
    ).collect()[0]
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _grid(mins: list, maxs: list, levels: int) -> tuple[list, list]:
    # constant dimension -> step 1.0 (all codes 0), mirrored verbatim in
    # the SQL oracle so both engines degrade identically
    steps = [
        (mx - mn) / (levels - 1) if mx > mn else 1.0
        for mn, mx in zip(mins, maxs)
    ]
    return mins, steps


def sq_encode(
    df: DataFrame,
    mins: list,
    maxs: list,
    vec_col: str,
    id_col: str,
    levels: int = 256,
    keep_vec: bool = False,
) -> DataFrame:
    """int codes per dimension on the trained grid (zero-shuffle projection).

    ``code = clamp(floor((x - min)/step + 0.5), 0, levels-1)`` — floor of
    the shifted value, NOT round(): Spark rounds HALF_UP, DuckDB half away
    from zero, and ``floor(x + 0.5)`` is the same IEEE sequence on both.
    ``keep_vec`` retains the float column (index stores that pair codes
    with an exact re-rank path, mirroring :func:`bq_encode`).
    """
    mins, steps = _grid(mins, maxs, levels)
    mn_arr = F.array(*[F.lit(v) for v in mins])
    st_arr = F.array(*[F.lit(v) for v in steps])
    codes = F.zip_with(
        F.col(vec_col),
        F.arrays_zip(mn_arr, st_arr),
        lambda x, g: F.greatest(
            F.lit(0),
            F.least(
                F.lit(levels - 1),
                F.floor((x - g["0"]) / g["1"] + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    keep = [c for c in df.columns if keep_vec or c != vec_col]
    return df.select(*keep, codes.alias("codes"))


def sq_topk(
    queries: DataFrame,
    codes: DataFrame,
    mins: list,
    maxs: list,
    k: int = 10,
    levels: int = 256,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "neighbor_id",
) -> DataFrame:
    """Asymmetric top-k: float query vs dequantized candidate codes.

    The query frame broadcasts; the corpus-sized side is ONE codegen'd
    fold per (candidate, query): dequantize ``min + code·step`` and
    accumulate the squared difference inside a single ``aggregate`` over
    ``zip_with`` — no Python, no second scan, no join back to floats.
    """
    mins, steps = _grid(mins, maxs, levels)
    mn_arr = F.array(*[F.lit(v) for v in mins])
    st_arr = F.array(*[F.lit(v) for v in steps])
    grid = F.arrays_zip(mn_arr, st_arr)
    pairs = codes.crossJoin(F.broadcast(queries)).filter(
        F.col(corpus_id) != F.col(query_id)
    )
    diffs = F.zip_with(
        F.zip_with(
            F.col("codes"),
            grid,
            lambda c, g: g["0"] + c.cast("double") * g["1"],
        ),
        F.col(query_vec),
        lambda xhat, q: (q - xhat) * (q - xhat),
    )
    dist = F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy(query_id).orderBy(
        F.asc("sq_dist"), F.asc(corpus_id)
    )
    return (
        pairs.select(query_id, corpus_id, dist.alias("sq_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id, corpus_id, F.round("sq_dist", 4).alias("sq_dist")
        )
    )


# ---------------------------------------------------------------------------
# Binary quantization (trained mean thresholds, 32-bit packed words)
# ---------------------------------------------------------------------------


def bq_train(df: DataFrame, vec_col: str, dim: int) -> list:
    """Per-dimension MEAN thresholds (one aggregate pass, ``dim`` scalars).

    Mean-centering balances the bit distribution (a 0-threshold on
    non-centered data wastes bits on always-on dimensions), which is what
    makes Hamming distance track angular distance.
    """
    row = df.agg(
        *[
            F.avg(F.element_at(vec_col, i + 1)).alias(f"m{i}")
            for i in range(dim)
        ]
    ).collect()[0]
    return [float(row[f"m{i}"]) for i in range(dim)]


def bq_encode(
    df: DataFrame,
    thresholds: list,
    vec_col: str,
    id_col: str,
    word_bits: int = 32,
    keep_vec: bool = False,
) -> DataFrame:
    """Sign bits vs trained thresholds, packed into ``word_bits``-bit words.

    32-bit words (not 64) so every packed value fits a BIGINT without
    touching the sign bit — ``1 << 63`` is engine-dependent two's-
    complement territory; ``1 << 31`` is portably positive in both Spark
    and DuckDB. Zero-shuffle projection; ``dim/32`` longs per row (a 16×
    compression at dim=64 before even counting the dropped float table).
    """
    dim = len(thresholds)
    if dim % word_bits:
        raise ValueError(f"bq: dim {dim} not divisible by {word_bits}")
    words = []
    for w0 in range(0, dim, word_bits):
        bits = [
            F.when(
                F.element_at(vec_col, w0 + b + 1) >= F.lit(thresholds[w0 + b]),
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(word_bits)
        ]
        acc = bits[0]
        for bcol in bits[1:]:
            acc = acc + bcol
        words.append(acc)
    keep = [
        c for c in df.columns if keep_vec or c != vec_col
    ]  # dropping the float column is the point — unless the caller's
    # store deliberately keeps it for an exact re-rank (keep_vec)
    return df.select(*keep, F.array(*words).alias("bits"))


def bq_hamming_rerank(
    queries: DataFrame,
    packed: DataFrame,
    exact: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_col: str = "ev",
    exact_id: str = "vec_id",
) -> DataFrame:
    """Hamming shortlist from packed codes, then exact-cosine re-rank.

    Stage 1 scans the packed table once per query (queries broadcast):
    distance = XOR + ``bit_count`` word fold, pure JVM. Stage 2 joins
    ONLY the ``|queries|·shortlist`` survivors back to the float table
    for exact cosine — the expensive vectors are touched for a bounded
    shortlist, never the whole corpus. ``exact`` must carry
    (``exact_id``, ``vec_col``) for both query and neighbor ids.
    """
    qp = queries.select(
        F.col(query_id), F.col("bits").alias("qbits")
    )
    pairs = packed.crossJoin(F.broadcast(qp)).filter(
        F.col(corpus_id) != F.col(query_id)
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("bits"),
            F.col("qbits"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w1 = Window.partitionBy(query_id).orderBy(
        F.asc("hamming"), F.asc(corpus_id)
    )
    short = (
        pairs.select(query_id, corpus_id, ham.alias("hamming"))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= shortlist)
        .drop("rn")
    )
    qv = exact.select(
        F.col(exact_id).alias(query_id), F.col(vec_col).alias("_qv")
    )
    nv = exact.select(
        F.col(exact_id).alias(corpus_id), F.col(vec_col).alias("_nv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_nv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(F.col(c), F.lit(0.0), lambda a, x: a + x * x)
        )

    w2 = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc(corpus_id)
    )
    return (
        F.broadcast(short.join(F.broadcast(qv), query_id))
        .join(nv, corpus_id)
        .select(
            query_id,
            corpus_id,
            "hamming",
            (dot / (_norm("_qv") * _norm("_nv"))).alias("cosine_sim"),
        )
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(
            query_id,
            corpus_id,
            "hamming",
            F.round("cosine_sim", 4).alias("cosine_sim"),
        )
    )
