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
