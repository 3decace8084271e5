"""Keyword relevance search (TF-IDF / BM25) over a document corpus.

Ranked keyword retrieval is the workhorse query of corpus exploration
and hard-negative mining in training-data pipelines. For a bounded query
term set (the interactive case), the whole computation is expressible
without ever exploding or shuffling the token stream: per-term term
frequencies are per-row ``size(filter(tokens))`` counts (one codegen'd
projection), and the corpus statistics (N, avgdl, per-term document
frequencies) reduce to a SINGLE one-row global aggregate that broadcasts
back. Scan → project → tiny agg → broadcast → top-k; the corpus text
never leaves its partition.

For open vocabularies (every term scored, not a query set) the
inverted-index path is :func:`bm25_index` / :func:`bm25_champions`;
``text.vocabulary`` supplies the raw posting statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

_MAX_QUERY_TERMS = 64  # per-term columns; beyond this use the inverted index


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    idf(t) = ln((N - df_t + 0.5)/(df_t + 0.5) + 1)       (Lucene form —
    non-negative even for terms in more than half the corpus)
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Deterministic result: ordered by the ROUNDED score (4 dp) descending
    then id ascending, so last-ulp FP noise cannot reorder the top-k
    across engines.
    """
    if not (0 < len(query_terms) <= _MAX_QUERY_TERMS):
        raise ValueError(f"query_terms must have 1..{_MAX_QUERY_TERMS} terms")
    toks = tokens(text_col)

    # Factory, not a default-arg lambda: PySpark infers higher-order-function
    # arity from the Python signature, so `lambda x, t=t` would be bound as a
    # two-arg (element, index) lambda.
    def _eq(term):
        return lambda x: x == F.lit(term)

    per_doc = df.select(
        id_col,
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    idf = lambda i: F.log(  # noqa: E731
        (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
    )
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    parts = [
        F.when(
            F.col(f"tf_{i}") > 0,
            idf(i) * (F.col(f"tf_{i}") * (k1 + 1)) / (F.col(f"tf_{i}") + norm),
        ).otherwise(F.lit(0.0))
        for i in range(len(query_terms))
    ]
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    ranked = scored.select(
        id_col, F.round(total, 4).alias("bm25")
    ).filter(F.col("bm25") > 0)
    return ranked.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Open-vocabulary BM25 posting weights — the inverted-index path.

    Where :func:`bm25_topk` scores a bounded interactive term set with
    zero token shuffles, this builds the full retrieval artifact: one
    row per (token, doc) posting with its BM25 weight, for EVERY term in
    the corpus. The shuffle is keyed by token — the inverted index IS a
    shuffle by term, and that is the scalable shape: postings per
    partition are O(corpus tokens / partitions), corpus stats stay one
    broadcast row, per-term document frequencies ride the same
    aggregation that builds the postings.

    Returns (token, doc_id, tf, dft, bm25_w) with the weight rounded to
    4 dp (same determinism discipline as bm25_topk).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select(
        "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("token")
    )
    post = base.groupBy("token", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tstat = post.groupBy("token").agg(
        F.count(F.lit(1)).alias("dft"), F.sum("tf").alias("term_freq")
    )
    stats = df.select(tokens(text_col).alias("_t")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("_t")).alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5) + 1.0
    )
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return (
        post.join(tstat, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            "doc_id",
            "tf",
            "dft",
            "term_freq",
            F.round(
                idf * (F.col("tf") * (k1 + 1)) / (F.col("tf") + norm), 4
            ).alias("bm25_w"),
        )
    )


def bm25_champions(
    df: DataFrame,
    top_terms: int = 50,
    per_term: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Champion lists over the open-vocabulary index: for each of the
    ``top_terms`` highest-frequency terms, the ``per_term`` best docs by
    BM25 weight. The classic precomputed-retrieval artifact: query time
    touches only champion rows, never the full posting lists. Ranking is
    over the ROUNDED weight with doc_id tie-break, so the lists are
    deterministic and oracle-comparable."""
    from pyspark.sql import Window

    idx = bm25_index(df, text_col, id_col, k1, b)
    terms = (
        idx.select("token", "term_freq")
        .distinct()
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(top_terms)
    )
    w = Window.partitionBy("token").orderBy(F.desc("bm25_w"), F.asc("doc_id"))
    return (
        idx.join(F.broadcast(terms.select("token")), "token", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_term)
        .select("token", "doc_id", "tf", "bm25_w", F.col("rn").alias("rank"))
    )


def hard_negative_pairs(
    docs: DataFrame,
    embeddings: DataFrame,
    top_terms: int = 50,
    per_term: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative candidate mining: lexically co-relevant, semantically
    distant document pairs.

    The contrastive-training recipe: a good hard negative LOOKS relevant
    (shares top retrieval terms) but isn't (low embedding cosine). Pairs
    come from the champion lists — two docs that are both top-ranked for
    the same high-frequency term are exactly the pairs a BM25 retriever
    confuses — and each pair is scored with its embedding cosine so the
    consumer cuts at whatever margin its loss needs.

    Scale shape: champion lists are bounded (top_terms × per_term rows),
    so the pair space is bounded at top_terms × C(per_term,2) before
    dedup — the embedding join touches only those few ids (broadcast),
    never the corpus. Output: (d1, d2, n_shared_terms, cosine_sim),
    ordered for determinism.
    """
    from .similarity import _dot, _norm

    # The champion table is tiny (≤ top_terms × per_term rows) but its
    # lineage is the whole inverted-index pipeline — checkpoint so the
    # a/b self-join below doesn't run that pipeline twice.
    champs = (
        bm25_champions(
            docs, top_terms=top_terms, per_term=per_term,
            text_col=text_col, id_col=id_col,
        )
        .select("token", "doc_id")
        .localCheckpoint(eager=False)
    )
    a, b = champs.alias("a"), champs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_terms"))
    )
    emb = embeddings.select(
        F.col(vec_id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    e1 = emb.select(F.col("_id").alias("d1"), F.col("_v").alias("_v1"))
    e2 = emb.select(F.col("_id").alias("d2"), F.col("_v").alias("_v2"))
    cos = _dot("_v1", "_v2") / (_norm("_v1") * _norm("_v2"))
    # pairs is bounded (champion-list sized) — broadcast it through both
    # embedding lookups so the corpus-sized embedding table never shuffles
    return (
        F.broadcast(pairs)
        .join(e1, "d1")
        .join(e2, "d2")
        .select("d1", "d2", "n_shared_terms", F.round(cos, 4).alias("cosine_sim"))
        .orderBy("d1", "d2")
    )


def sparse_shingle_topk(
    docs: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Lexical retrieval: top-k corpus documents per query document by
    word-3-gram Jaccard, through the shared dedup inverted index
    (``dedup.shingle_postings`` — 8-byte shingle keys).

    The query side (docs with id < ``n_queries``) is broadcast into the
    posting join, so candidate generation is a map-side probe of the
    corpus postings: only documents sharing at least one shingle with a
    query are scored, the sparse-retrieval pruning that replaces a full
    corpus scan. Jaccard stays integer until one final float64 division,
    so ranks are reproducible cross-engine without rounding tricks.
    """
    from .dedup import shingle_postings

    post = postings if postings is not None else shingle_postings(docs, text_col, id_col)
    sizes = post.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    q_post = post.filter(F.col("doc") < n_queries).select(
        F.col("doc").alias("query_id"), "s"
    )
    q_sizes = sizes.filter(F.col("doc") < n_queries).select(
        F.col("doc").alias("query_id"), F.col("n_sh").alias("qn")
    )
    shared = (
        post.withColumnRenamed("doc", "neighbor_id")
        .join(F.broadcast(q_post), "s")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = (
        shared.join(sizes.withColumnRenamed("doc", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(q_sizes), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("shared")
                / (F.col("qn") + F.col("n_sh") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("neighbor_id"))
    return (
        jac.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("jaccard", 4).alias("jaccard"))
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the dense (exact
    cosine top-k) and sparse (shingle-Jaccard top-k) rankers —

        rrf(d) = Σ_r 1 / (k0 + rank_r(d)),   absent rank contributes 0

    the standard zero-tuning way to combine lexical and semantic
    retrieval (Cormack et al., SIGIR'09). Both per-ranker lists are
    already top-k (bounded), so the fusion join touches ≤ 2k rows per
    query regardless of corpus size; ranks are recomputed on the ROUNDED
    scores + id so the fused order is reproducible cross-engine.
    ``doc_id`` and ``vec_id`` are the aligned key (one embedding per
    document in the corpus data model).
    """
    from .similarity import cosine_topk

    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    dw = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    dense = (
        cosine_topk(queries, corpus, k=k)
        .withColumn("rank_dense", F.row_number().over(dw))
        .select("query_id", "neighbor_id", "rank_dense")
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), F.asc("neighbor_id")
    )
    sparse = (
        sparse_shingle_topk(docs, n_queries=n_queries, k=k)
        .withColumn("rank_sparse", F.row_number().over(sw))
        .select("query_id", "neighbor_id", "rank_sparse")
    )
    fused = dense.join(sparse, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        "rank_dense",
        "rank_sparse",
        (
            F.coalesce(1.0 / (F.lit(k0) + F.col("rank_dense")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("rank_sparse")), F.lit(0.0))
        ).alias("_rrf"),
    )
    fw = Window.partitionBy("query_id").orderBy(F.desc("_rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # sentinel 0 = not retrieved by that ranker (rank is 1-based);
            # keeps the column int-typed through pandas fetches
            F.coalesce("rank_dense", F.lit(0)).alias("rank_dense"),
            F.coalesce("rank_sparse", F.lit(0)).alias("rank_sparse"),
            F.round("_rrf", 6).alias("rrf_score"),
        )
    )
