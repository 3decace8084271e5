"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

* **Brute-force cosine top-k** — the exact baseline. Dot products and
  norms are JVM-side array expressions (`zip_with` + `aggregate`), the
  query side is broadcast, and ranking is a per-query window. Exact, one
  pass over the corpus; right up to the point where queries × corpus
  stops fitting a scan budget.
* **LSH-bucketed top-k (scale path)** — random-hyperplane signatures
  (SimHash for vectors) bucket the corpus; each query only scores its own
  bucket's candidates. Hyperplanes are derived deterministically from a
  seed, JVM-side, so results are reproducible without shipping matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"0D, (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "neighbor_id",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    The query set is broadcast (small by construction); the corpus never
    moves. Ranking window partitions by query, ties break on neighbor id
    for determinism.
    """
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(corpus_id) != F.col(query_id)
    )
    sim = (_dot(query_vec, corpus_vec) / (_norm(query_vec) * _norm(corpus_vec))).alias("sim")
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        pairs.select(query_id, corpus_id, sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, F.round("sim", 4).alias("cosine_sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (±1 components from an LCG).

    Rademacher (±1) hyperplanes are a valid random-projection family for
    angular LSH and keep the plan free of external matrix shipping.
    """
    planes, state = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "neighbor_id",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    Signature = sign bits against ``n_planes`` fixed hyperplanes, packed
    into an int. Equi-join on the bucket replaces the cross join — the
    scan per query drops from |corpus| to |bucket| (expected |corpus|/2^n).
    Recall can be raised with multi-probe (flip one bit) — exposed later.
    """

    # Signature = packed sign bits of vec·plane across the fixed hyperplanes.
    def sig_col(vec_col: str):
        total = F.lit(0)
        for i, plane in enumerate(_hyperplanes(dim, n_planes)):
            arr = F.array(*[F.lit(v) for v in plane])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            total = total + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return total

    cq = queries.withColumn("bucket", sig_col(query_vec))
    cc = corpus.withColumn("bucket", sig_col(corpus_vec))
    pairs = cc.join(F.broadcast(cq), "bucket").filter(F.col(corpus_id) != F.col(query_id))
    sim = (_dot(query_vec, corpus_vec) / (_norm(query_vec) * _norm(corpus_vec))).alias("sim")
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        pairs.select(query_id, corpus_id, sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, F.round("sim", 4).alias("cosine_sim"))
    )
