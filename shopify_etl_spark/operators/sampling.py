"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus can't use ``rand()`` for train/val/test assignment or
subsampling: the assignment must be reproducible across runs, engines,
and cluster sizes, and a document's split must never change when other
documents are added or removed (otherwise val leaks into train between
corpus versions).

The standard trick: hash a stable key with a salt and threshold the
hash. We use ``md5(salt || key)`` and compare the first 8 hex chars
*lexicographically* against precomputed hex thresholds — fixed-width
lowercase hex compares identically to its numeric value, both Spark and
DuckDB emit lowercase hex md5, so the assignment is bit-reproducible in
both engines (which is what makes these operators oracle-checkable,
unlike ``TABLESAMPLE`` / ``df.sample``).

Everything is a pure JVM projection — no shuffle, no UDF; at 100 TB the
split is a free map-side column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 1 << 32  # first 8 hex chars of the digest


def _hash_hex(key_col, salt: str):
    """First 8 hex chars of md5(salt || key) as a Column."""
    return F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 8)


def _threshold(frac_cum: float) -> str:
    """Cumulative fraction -> zero-padded 8-char lowercase hex threshold.

    Fractions >= 1 map to ``"g"``: every hex digest compares below it
    (``'f' < 'g'`` byte-wise in both Spark and DuckDB), so ``h < 'g'``
    keeps *all* rows — avoiding an off-by-one at ``0xffffffff``.
    """
    if frac_cum >= 1.0:
        return "g"
    return format(int(frac_cum * _HEX_SPAN), "08x")


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a deterministic named split (train/val/test…).

    ``weights`` maps split name -> relative weight (normalized here);
    assignment order follows dict insertion order, so the same weights
    dict always produces the same thresholds. Adds a ``split`` column.

    Reference analog: the reference pipeline has no sampling layer (it
    moves whole tables); this is part of the beyond-reference
    training-data surface.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    h = _hash_hex(F.col(key_col), salt)
    expr, cum = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def hash_split_thresholds(
    weights: dict[str, float], salt: str = "split-v1"
) -> list[tuple[str, str]]:
    """(split name, upper hex threshold) pairs — exposed so oracle SQL /
    documentation can reproduce the exact CASE expression."""
    total = sum(weights.values())
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append((name, _threshold(cum)))
    out.append((list(weights)[-1], "ffffffff"))
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff
    ``hash(salt||key) < frac[stratum]``.

    The per-source mixing knob of a training-data pipeline ("2% of
    common-crawl, 100% of books"). Same guarantees as :func:`hash_split`:
    engine-reproducible, growth-stable, shuffle-free. Strata missing from
    ``fractions`` fall back to ``default_frac``.
    """
    h = _hash_hex(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(_threshold(frac))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(_threshold(default_frac)) if thr is None else thr.otherwise(
        F.lit(_threshold(default_frac))
    )
    return df.filter(h < thr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows
    (Efraimidis–Spirakis A-Res), deterministic across runs and engines.

    Each row draws a uniform u from its own hash (``xxhash64(id, seed)``
    mapped to (0,1)) and scores ``u^(1/w)``; the top-k scores are the
    sample — provably equivalent to sequential weighted draws without
    replacement. Hash-derived uniforms replace ``rand()`` so the sample
    is a pure function of (ids, weights, seed): reproducible on replay,
    stable under repartitioning, and re-runnable incrementally — the
    properties corpus subsampling needs in a training pipeline.

    Plan shape: per-row score projection + TakeOrdered(k) — partial
    top-k per partition then a k-row merge on the driver side of the
    exchange; no global sort materializes.
    """
    # xxhash64 → uniform in (0,1): shift to 53-bit mantissa precision,
    # +0.5 keeps u strictly inside the interval (u=0 would pin log u = -inf
    # for every weight; u=1 would tie every row at score 1)
    u = (F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 11) + 0.5) / F.lit(
        float(1 << 53)
    )
    # rank by u^(1/w) descending ⇔ by ln(u)/w descending (monotone, avoids
    # pow underflow for tiny weights)
    score = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wscore", score)
        .orderBy(F.desc("_wscore"), F.asc(id_col))
        .limit(k)
        .drop("_wscore")
    )


def epoch_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Weighted corpus mixing by deterministic repetition: a row from a
    group with weight w appears ``floor(w) + Bernoulli(frac(w))`` times.

    The standard "epochs per domain" knob of LLM data recipes (books ×2.5,
    common-crawl ×0.5, …): integer part = guaranteed repeats, fractional
    part decided per-document by the same salted-md5 threshold as
    :func:`stratified_sample`, so the realized mix is reproducible across
    runs, engines, and cluster sizes, and each document's fate is
    independent of the rest of the corpus. Groups absent from ``weights``
    are dropped (weight 0).

    Shape: pure projection + ``explode(sequence(1, n))`` — no shuffle;
    output carries ``n_copies`` and ``copy_idx`` (1-based) so downstream
    shuffling/sharding can tell copies apart.
    """
    import math

    pairs: list = []
    thr_pairs: list = []
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}")
        pairs += [F.lit(g), F.lit(float(math.floor(w)))]
        thr_pairs += [F.lit(g), F.lit(_threshold(w - math.floor(w)))]
    base_map = F.create_map(*pairs)
    thr_map = F.create_map(*thr_pairs)
    base = F.coalesce(base_map[F.col(group_col)], F.lit(-1.0))
    h = _hash_hex(F.col(key_col), salt)
    extra = (h < F.coalesce(thr_map[F.col(group_col)], F.lit(""))).cast("long")
    n = (base.cast("long") + extra).alias("n_copies")
    staged = df.withColumn("n_copies", n).filter(F.col("n_copies") > 0)
    return staged.select(
        *df.columns,
        "n_copies",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
            "copy_idx"
        ),
    )


def capped_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    cap: int,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per key, by ascending ``order_col``
    (ties impossible when the order column is unique, e.g. a doc id) —
    the per-domain cap every crawl-curation pipeline applies before
    training (anti-SEO/spam: one host must not dominate the corpus).

    Scale shape: a bare ``row_number() OVER (PARTITION BY key)`` would
    total-sort a possibly corpus-dominant key in ONE task. This is the
    exact two-phase top-N instead (the ``pq.ivf_pq_topk`` shortlist
    discipline): phase 1 ranks within each (input partition, key) —
    bounded by the partition size — and drops everything past ``cap``,
    which is lossless because a key's global top-``cap`` rows are
    contained in the union of its per-partition top-``cap`` rows; phase
    2 ranks the ≤ ``cap · n_partitions`` survivors per key. The heavy
    window never sees more than one partition's rows for any key.
    """
    from pyspark.sql import Window

    w1 = Window.partitionBy("_pid", key_col).orderBy(F.asc(order_col))
    w2 = Window.partitionBy(key_col).orderBy(F.asc(order_col))
    pruned = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_pid", "_r1")
    )
    out = pruned.withColumn("_rank", F.row_number().over(w2)).filter(
        F.col("_rank") <= cap
    )
    return out if keep_rank else out.drop("_rank")
