"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (enabled in session.py) handles most runtime skew
by splitting oversized partitions, but it only works for sort-merge joins
and after stats exist. Salting is the explicit, planner-independent tool
for *known* hot keys (SURVEY §7.4: hot SKUs): the skewed side gets a
random salt in [0, n); the other side is replicated n× with every salt
value, and the join key becomes (key, salt) — one hot key fans out over
n partitions instead of melting one executor.

Replication multiplies the small side by ``n_salts``; use for
big-skewed ⋈ small-ish joins (dimension lookups against a skewed fact),
never for two huge sides (use AQE + bucketing there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key_cols,
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    sub-keys. Result equals ``skewed.join(other, key_cols, how)`` for
    'inner' and 'left' joins (each skewed row matches exactly its salt's
    replica of the other side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics proof only holds there)")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    salted_left = skewed.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_right = other.select("*", salts)
    out = salted_left.join(replicated_right, [*key_cols, "_salt"], how)
    return out.drop("_salt")
