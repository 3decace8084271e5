"""Data-quality checks as DataFrame operators (violation reports).

The reference validates loads with record counts (bulk loop:
"Objects found: N" vs rows landed; run-log audit rows). This module
generalizes that into the standard warehouse DQ suite — each check
returns a VIOLATIONS DataFrame (empty = pass) so callers can count,
sample, or quarantine; ``dq_report`` runs a set of checks and returns
one row per check, which is what lands next to the run-log.

Scale notes: uniqueness is one groupBy on the key; referential
integrity is a left-anti join against the parent's key projection
(broadcastable whenever the parent key set is a dimension); null and
freshness checks are single-pass aggregates. Nothing here collects
rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups appearing more than once: (key cols…, n_rows)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (orphans)."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(parents, child_key, "left_anti")


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows where any required column is NULL."""
    cond = None
    for c in cols:
        clause = F.col(c).isNull()
        cond = clause if cond is None else cond | clause
    return df.filter(cond)


def accepted_values_violations(
    df: DataFrame, col: str, allowed: list
) -> DataFrame:
    """Rows whose ``col`` value is outside the allowed set."""
    return df.filter(~F.col(col).isin(allowed) | F.col(col).isNull())


def freshness_lag(df: DataFrame, ts_col: str, as_of: Column) -> DataFrame:
    """One row: newest ``ts_col`` and its lag (seconds) behind ``as_of``."""
    return df.agg(
        F.max(ts_col).alias("max_ts"),
        (as_of.cast("long") - F.max(ts_col).cast("long")).alias("lag_seconds"),
    )


def dq_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Run named checks (name → violations frame) into one report:
    (check_name, n_violations, passed). Counts run as one job per check —
    unions of aggregates, no driver-side rows."""
    parts = [
        v.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
        for name, v in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )
