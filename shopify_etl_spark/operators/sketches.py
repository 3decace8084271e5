"""Mergeable distinct-count sketches (Datasketches HLL, Spark 3.5+).

The 100 TB pattern: COUNT(DISTINCT) over a year of raw events rescans
everything, every time. Instead, aggregate once into per-grain HLL
sketches (a few KB each), persist them, and answer any coarser rollup —
weekly, monthly, arbitrary ranges, cross-dimension unions — by UNIONING
sketches, never touching raw data again. Sketch union is associative
and lossless w.r.t. the sketch state, so pre-aggregation commutes with
rollup: build daily, merge to weekly, the answer is identical to
sketching the week directly (pinned in tests).

Accuracy regime: Datasketches HLL is EXACT below its sparse-mode
threshold (far above this corpus's cardinalities at ``lg_k=14``), then
~0.8 % RSE beyond — which is why the catalog query carries a real
COUNT(DISTINCT) oracle here, while unbounded-cardinality use stays the
documented approximate path (`approx_event_stats`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sparse-mode headroom for every test SF (exact ≪ 2^14 distincts/group).
DEFAULT_LG_K = 14


def distinct_sketches(
    df: DataFrame, key_col: str, group_cols: list[str], lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """One HLL sketch of ``key_col`` per ``group_cols`` value — the
    persistable pre-aggregate (binary column ``sk``)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sk")
    )


def rollup_distinct(
    sketches: DataFrame, group_cols: list[str], estimate_col: str = "distinct_keys"
) -> DataFrame:
    """Roll finer-grain sketches up to ``group_cols`` by sketch union and
    estimate — no raw-data access."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(estimate_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)
