"""Token-budget shard packing for training-data batch construction.

Training jobs consume fixed-token shards, not ragged documents. This
operator assigns each document to a shard such that consecutive
documents (in a deterministic order) accumulate until the token budget
rolls over — greedy sequential packing, the standard pre-tokenization
sharding step.

Scale shape: one window aggregation partitioned by the shard grouping
key (``group_col``). Packing is inherently sequential *within* a group
— the cumulative sum is the definition — so parallelism comes from the
grouping key, exactly like every production packer: pack per
(source, date) slice, never one global sequence. A single global window
partition would serialize 100 TB through one task; this operator
deliberately has no global mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_shards(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Assign each document a shard id within its group.

    Documents are ordered by ``id_col`` (deterministic, reproducible);
    ``shard_id`` = floor(tokens-before-this-doc / budget), so a shard
    holds at least ``budget`` tokens once full and overruns by at most
    one document (the straddling doc belongs to the shard it started
    in). Output: id, group, n_tokens, shard_id.
    """
    n_tok = token_count(text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(id_col, group_col, n_tok.alias("n_tokens"))
        .withColumn("shard_id", F.floor(cum_before / budget).cast("long"))
        .withColumn("n_tokens", F.col("n_tokens").cast("long"))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """GPT-style sequence packing with document-boundary spans.

    Training batches are FIXED-LENGTH token sequences; documents are
    concatenated in deterministic ``id_col`` order within each group and
    cut every ``seq_len`` tokens, so a document can straddle sequence
    boundaries. The trainer needs the boundary map — which doc occupies
    which slice of which sequence — to build its attention mask
    (cross-document attention masked out) and loss mask; this operator
    emits exactly that map, one row per (sequence, document chunk):

    ``(group, seq_id, doc_id, seq_start, doc_offset, chunk_len)``

    where ``seq_start`` is the chunk's offset inside the sequence,
    ``doc_offset`` the chunk's offset inside the document, and chunks of
    one doc across consecutive sequences partition its tokens exactly
    (pinned in tests). Empty documents pack nothing and emit nothing.

    Shape: the same per-group cumulative window as :func:`pack_shards`
    (packing is sequential within a group BY DEFINITION; parallelism
    comes from the grouping key — a global window would serialize the
    corpus through one task), then a per-row ``sequence()`` explode over
    the sequence ids the doc spans — at most ``1 + n_tokens/seq_len``
    rows per doc, linear in the token stream. Every expression is
    JVM-side; SQL-expressible end to end, so the whole packer is
    oracle-checkable.
    """
    n_tok = token_count(text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    base = (
        df.select(id_col, group_col, n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("_start", start)
    )
    first_seq = F.floor(F.col("_start") / seq_len)
    last_seq = F.floor((F.col("_start") + F.col("n_tokens") - 1) / seq_len)
    seq_lo = F.col("seq_id") * seq_len
    chunk_lo = F.greatest(F.col("_start"), seq_lo)
    chunk_hi = F.least(F.col("_start") + F.col("n_tokens"), seq_lo + seq_len)
    return (
        base.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
        .select(
            group_col,
            F.col("seq_id").cast("long"),
            id_col,
            (chunk_lo - seq_lo).cast("long").alias("seq_start"),
            (chunk_lo - F.col("_start")).cast("long").alias("doc_offset"),
            (chunk_hi - chunk_lo).cast("long").alias("chunk_len"),
        )
    )
