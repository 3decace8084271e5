"""Snapshot diff: change-data capture between two versions of a keyed
table.

The merge layer applies changes; this operator derives them — the
inverse you need when a source only hands you full snapshots (the
reference's full-refresh entities, M1-M3) but downstream wants a
change feed: ``diff(yesterday, today)`` → inserted / deleted / changed
rows, which then drives an incremental merge instead of a full rewrite.

Shape: ONE full-outer join on the key, change classification from
null-sides, column comparison with null-safe equality (``<=>`` — a
value flipping to/from NULL is a change, two NULLs are not). Hashing
the compared columns first (``xxhash64(struct)``) would shrink the
comparison to 8 bytes per side at the cost of hash-collision blindness;
both modes are exposed, exact compare is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Rows of ``new`` vs ``old``: (key, change) with change ∈
    {'inserted','deleted','changed'}; unchanged rows are absent.

    ``compare_cols`` defaults to all shared non-key columns. With
    ``hashed=True`` the per-column null-safe comparison collapses to one
    xxhash64 per side (cheaper wide rows, collision-blind)."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - {key})

    if hashed:
        o_cmp = [F.xxhash64(*[F.col(c) for c in compare_cols]).alias("_h")]
        n_cmp = [F.xxhash64(*[F.col(c) for c in compare_cols]).alias("_h")]
        same = F.col(f"o._h") == F.col(f"n._h")
    else:
        o_cmp = [F.col(c) for c in compare_cols]
        n_cmp = [F.col(c) for c in compare_cols]
        same = None
        for c in compare_cols:
            clause = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            same = clause if same is None else same & clause

    o = old.select(F.col(key).alias("_ok"), *o_cmp).alias("o")
    n = new.select(F.col(key).alias("_nk"), *n_cmp).alias("n")
    joined = o.join(n, F.col("_ok") == F.col("_nk"), "full_outer")
    return joined.select(
        F.coalesce(F.col("_nk"), F.col("_ok")).alias(key),
        F.when(F.col("_ok").isNull(), F.lit("inserted"))
        .when(F.col("_nk").isNull(), F.lit("deleted"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit(None))
        .alias("change"),
    ).filter(F.col("change").isNotNull())
