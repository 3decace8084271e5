"""Fuzzy string matching (edit-distance joins) via deletion-neighborhood
blocking — the FastSS / SymSpell scheme on DataFrames.

A naive edit-distance join is O(n²) levenshtein calls — a scan-killer at
any scale. Deletion neighborhoods make it an equi-join: for threshold 1,
``lev(a, b) ≤ 1  ⟹  D(a) ∩ D(b) ≠ ∅`` where ``D(s) = {s} ∪ {s with one
char deleted}`` (a substitution deletes the differing char from both
sides; an insertion puts the shorter string inside the longer one's
neighborhood). So candidates come from an equi-join on the variant key —
shuffle-partitionable, no cross product — and a final true-levenshtein
filter removes the false positives the implication allows (shared
variant ⟹ distance ≤ 2). Recall is exact by construction, verified
against the naive join in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col) -> "F.Column":
    """{s} ∪ all strings with one character deleted (distinct)."""
    one_del = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substr(col, F.lit(1), i - 1),
            F.substr(col, i + 1, F.length(col)),
        ),
    )
    return F.array_distinct(F.concat(F.array(col), one_del))


def fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 1,
    expand_ids: bool = True,
) -> DataFrame:
    """All pairs with levenshtein(name_a, name_b) ≤ ``max_dist`` (id_a <
    id_b), found via deletion-neighborhood equi-join instead of an n²
    cross product.

    Only ``max_dist`` ≤ 1 carries the recall guarantee of 1-deletion
    neighborhoods; higher thresholds would need k-deletion variants
    (variant count grows ~len^k — the standard FastSS trade).

    ``expand_ids=False`` returns the NAME-level match map instead:
    (name1, name2, dist, n_id_pairs). Duplicated keys make the id-level
    output quadratic in group size while carrying no information beyond
    the group cross product — at scale, keep the match map and expand
    lazily where a downstream join actually needs ids.
    """
    if max_dist > 1:
        raise ValueError("deletion-1 blocking guarantees recall only for max_dist <= 1")
    ids = df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_name"))

    # The variant join runs on DISTINCT names: duplicated keys would pair
    # quadratically *inside the join* (each dup pair re-found once per
    # shared variant); on distinct names the join is |vocabulary|-sized
    # and the quadratic part is only the unavoidable output re-expansion.
    dn = ids.select("_name").distinct()
    v = dn.select(
        "_name", F.explode(_deletion_variants(F.col("_name"))).alias("_v")
    )
    a, b = v.alias("a"), v.alias("b")
    near = (
        a.join(
            b,
            (F.col("a._v") == F.col("b._v"))
            & (F.col("a._name") < F.col("b._name")),
        )
        .select(F.col("a._name").alias("_na"), F.col("b._name").alias("_nb"))
        .distinct()
        .filter(F.levenshtein("_na", "_nb") <= max_dist)
    )

    if not expand_ids:
        counts = ids.groupBy("_name").agg(F.count(F.lit(1)).alias("_c"))
        same_map = counts.filter(F.col("_c") >= 2).select(
            F.col("_name").alias("name1"),
            F.col("_name").alias("name2"),
            F.lit(0).cast("long").alias("dist"),
            (F.col("_c") * (F.col("_c") - 1) / 2).cast("long").alias("n_id_pairs"),
        )
        ca = counts.select(F.col("_name").alias("_na"), F.col("_c").alias("_ca"))
        cb = counts.select(F.col("_name").alias("_nb"), F.col("_c").alias("_cb"))
        near_map = (
            near.join(ca, "_na")
            .join(cb, "_nb")
            .select(
                F.col("_na").alias("name1"),
                F.col("_nb").alias("name2"),
                F.levenshtein("_na", "_nb").cast("long").alias("dist"),
                (F.col("_ca") * F.col("_cb")).cast("long").alias("n_id_pairs"),
            )
        )
        return same_map.unionByName(near_map)

    # same-name pairs (distance 0): expand id groups directly
    ga = ids.select(F.col("_id").alias("_ia"), F.col("_name").alias("_na"))
    gb = ids.select(F.col("_id").alias("_ib"), F.col("_name").alias("_nb"))
    same = ga.join(
        gb, (F.col("_na") == F.col("_nb")) & (F.col("_ia") < F.col("_ib"))
    ).select("_ia", "_ib", "_na", "_nb")

    # near-name pairs: re-expand each name pair to its id combinations,
    # then order each pair by id (output contract: id1 < id2, name1
    # belongs to id1)
    cross = (
        near.join(ga, "_na")
        .join(gb, "_nb")
        .select(
            F.least("_ia", "_ib").alias("_ia"),
            F.greatest("_ia", "_ib").alias("_ib"),
            F.when(F.col("_ia") < F.col("_ib"), F.col("_na"))
            .otherwise(F.col("_nb"))
            .alias("_na"),
            F.when(F.col("_ia") < F.col("_ib"), F.col("_nb"))
            .otherwise(F.col("_na"))
            .alias("_nb"),
        )
    )
    out = same.unionByName(cross)
    return out.select(
        F.col("_ia").alias("id1"),
        F.col("_ib").alias("id2"),
        F.col("_na").alias("name1"),
        F.col("_nb").alias("name2"),
        F.levenshtein("_na", "_nb").cast("long").alias("dist"),
    )
