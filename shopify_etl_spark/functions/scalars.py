"""Scalar Column functions — the reference's inline-Python transform layer
(SURVEY.md §2.4 F1-F10) as pure JVM Column expressions.

No Python UDFs: every function returns a Column built from
``pyspark.sql.functions``, so the whole scalar layer stays inside
whole-stage codegen and Catalyst can fold/push/prune through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_id(col: Column | str, prefix: str = "") -> Column:
    """F1 — GID ``gid://shopify/Order/123`` → ``"{prefix}123"``; null-safe.

    Reference incremental_loaders.py:63-65 (rsplit('/')[-1] with prefix).
    """
    c = F.col(col) if isinstance(col, str) else col
    tail = F.element_at(F.split(c, "/"), -1)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit(prefix), tail)
    )


def safe_num(col: Column | str, typ: str = "double", default: float = 0.0) -> Column:
    """F2 — try-cast with typed default on null/garbage.

    Reference safe_val, incremental_loaders.py:67-69.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string").try_cast(typ), F.lit(default).cast(typ))


def get_money(col: Column | str) -> Column:
    """F3 for money-SET structs: ``x.shopMoney.amount`` else 0.0, double.

    Reference get_money (incremental_loaders.py:71-77) branches at
    runtime between money-sets and bare money dicts; Spark columns are
    schema-typed, so the two shapes are separate functions — use
    :func:`get_money_bare` for bare ``{amount, currencyCode}`` structs
    (passing the wrong shape fails at analysis time, not silently).
    Missing/null structs resolve to the 0.0 default either way.
    """
    c = F.col(col) if isinstance(col, str) else col
    shop = c.getField("shopMoney").getField("amount")
    return F.coalesce(
        shop.try_cast("double"),
        F.lit(0.0),
    )


def get_money_bare(col: Column | str) -> Column:
    """F3 variant for bare money structs ({amount, currencyCode})."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.getField("amount").try_cast("double"), F.lit(0.0))


def tags_csv(col: Column | str) -> Column:
    """F4 — tags array → comma-joined string ("," join of [] → '').

    Reference incremental_loaders.py:148,235,292.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit("")).otherwise(F.concat_ws(",", c))


def strip_hash(col: Column | str) -> Column:
    """F5 — order name '#1234' → '1234'. Reference incremental_loaders.py:228."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "#", "")


def bool_str(col: Column | str) -> Column:
    """F6 — boolean → Python-style 'True'/'False'/'None' string for parity
    with the reference's str(bool) (incremental_loaders.py:147)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit("None")).otherwise(F.initcap(c.cast("string")))


def norm_sku(col: Column | str) -> Column:
    """F7 — UPPER(TRIM(sku)). Reference run_logs.txt:346-347,361."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))


def non_empty(col: Column | str) -> Column:
    """F9 — sku IS NOT NULL AND TRIM(sku) <> ''. Reference run_logs.txt:359,378."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.trim(c) != "")


def iso_ts(col: Column | str) -> Column:
    """F8/§1.2 — ISO-8601 string → TimestampType. The reference keeps
    timestamps as strings and compares lexicographically
    (incremental_loaders.py:128-131); we use real timestamps, which also
    fixes the mixed-offset ordering trap noted in SURVEY §7.4."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")
