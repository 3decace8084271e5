"""Distribution-based value cleaning (winsorization / outlier clipping).

Clipping values at per-group percentile bounds is the standard
robust-statistics pre-step before aggregation or model features. Bounds
come from one grouped pass; the clip itself is a broadcast join + one
projection over the fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interp(v: str, p: float):
    """Exact interpolated percentile over a pre-sorted array column —
    the same ``lo + (hi-lo)*frac`` form as the SQL oracles, so the
    doubles are bit-identical across engines (engine-internal percentile
    routines interpolate in different FP order)."""
    n1 = (F.size(v) - F.lit(1)).cast("double")
    pos = n1 * F.lit(p)
    lo = F.element_at(v, (F.floor(pos) + 1).cast("int"))
    hi = F.element_at(v, (F.ceil(pos) + 1).cast("int"))
    return lo + (hi - lo) * (pos - F.floor(pos))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    id_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its group's [lower, upper] exact percentile
    band; emits the original value, the clipped value, and a flag.

    Exact percentiles buffer each group's values once (sorted array in
    the aggregate) — right for bounded-cardinality groups; at 100 TB
    with huge groups swap the bounds stage for ``approx_percentile``
    (single-pass, bounded memory) and keep the identical clip stage.
    The bounds table is |groups| rows → broadcast; the fact stream never
    shuffles.
    """
    g = df.groupBy(group_col).agg(
        F.sort_array(F.collect_list(value_col)).alias("_v")
    )
    bounds = g.select(
        group_col,
        _interp("_v", lower).alias("_lo"),
        _interp("_v", upper).alias("_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    cols = [id_col] if id_col else []
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(
            *cols,
            group_col,
            F.col(value_col),
            clipped.alias(f"{value_col}_winsorized"),
            (
                (F.col(value_col) < F.col("_lo"))
                | (F.col(value_col) > F.col("_hi"))
            ).alias("was_clipped"),
        )
    )
