"""End-to-end corpus curation: boilerplate strip → quality gate → exact
dedup, as one composable pipeline.

The canonical order of a training-data cleaning run: line-level
boilerplate removal FIRST (so quality signals score real content, and
docs that were all chrome fall to the length gate), the cheap per-row
quality rules SECOND (drop before paying any shuffle for them), and
corpus-wide exact dedup LAST (on the cleaned text, so trivially
differing wrappers dedup together). Near-dup clustering
(``operators.dedup``) runs downstream of this on the survivors — see
``dedup_corpus``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text as text_ops


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    **quality_kwargs,
) -> DataFrame:
    """Survivors of strip-boilerplate → quality-filter → exact-dedup.

    Returns (id, clean_text, n_tokens): one row per surviving document,
    where a duplicate group survives as its minimum id. All three stages
    are the existing operators chained — the pipeline adds no new
    shuffle beyond theirs (strip: line explode + broadcast anti-join;
    quality: zero-shuffle fold; dedup: one groupBy on the cleaned
    text's fingerprint-sized key).
    """
    stripped = text_ops.strip_boilerplate(
        docs, text_col=text_col, id_col=id_col, min_docs=min_docs
    )
    # ONE linear chain: the quality verdict is computed in the same
    # narrow pass that carries clean_text (keep_cols), instead of
    # joining the verdict back by id — that join re-evaluates the whole
    # strip subtree (measured 20 s → 5 s at sf0.1).
    kept = text_ops.quality_filter(
        stripped,
        text_col="clean_text",
        id_col=id_col,
        keep_cols=("clean_text",),
        **quality_kwargs,
    ).filter(F.col("keep"))
    canon = kept.groupBy("clean_text").agg(
        F.min(id_col).alias(id_col),
        F.min_by("n_tokens", id_col).alias("n_tokens"),
    )
    return canon.select(id_col, "clean_text", "n_tokens")


def curation_report(docs: DataFrame, curated: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One-row funnel report: input docs → survivors (+ drop count)."""
    n_in = docs.select(F.count(F.lit(1)).alias("n_input"))
    n_out = curated.select(F.count(F.lit(1)).alias("n_survivors"))
    return n_in.crossJoin(n_out).select(
        "n_input",
        "n_survivors",
        (F.col("n_input") - F.col("n_survivors")).alias("n_dropped"),
    )
