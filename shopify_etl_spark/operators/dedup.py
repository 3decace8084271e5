"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Generalizes the reference's latest-per-key window dedup (SURVEY.md §2.7 W1,
run_logs.txt:346-361) to the document-dedup surface a training-data
pipeline needs. Scale strategy:

* **exact**: hash-groupBy on a 64-bit fingerprint — shuffle volume is
  8 bytes/row regardless of document size.
* **n-gram Jaccard (exact)**: inverted-index self-join on shingles.
  Quadratic only within a shingle's posting list; correct but reserved
  for verification / small-SF oracles.
* **MinHash + LSH (scale path)**: k permutations → b bands — candidate
  pairs come from same-band-bucket joins, so cost scales with the number
  of *near-duplicate* pairs, not all pairs. This is the 100 TB algorithm.
* **SimHash**: 64-bit signature; near-dups differ in few bits.

All signature math is JVM-side (xxhash64 + integer ops in one projection);
no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Deterministic permutation parameters for MinHash: h_i(x) = (a_i*x + b_i) mod p.
# p is the largest 31-bit prime (Mersenne 2^31-1); a/b derive from a fixed seed
# so signatures are reproducible run-to-run (required for idempotent re-runs).
_MINHASH_P = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    # Deterministic LCG (no Python `random` so the sequence is frozen forever).
    params, state = [], seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_MINHASH_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MINHASH_P
        params.append((a, b))
    return params


def word_shingles(text_col, n: int = 3):
    """Distinct n-word shingles (ArrayType<String>); empty when < n tokens.

    Guarded with ``when(size >= n)`` because Spark's ``sequence(1, 0)``
    generates a *descending* sequence instead of an empty one.
    """
    toks = tokens(text_col)
    k = F.size(toks) - (n - 1)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(1), k), shingle_at)),
    ).otherwise(F.array().cast("array<string>"))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one canonical id + copy count per text."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    shingle → (doc, shingle) posting list → self-join on shingle →
    shared-count per pair → Jaccard = shared / (|A| + |B| - shared).
    Integer arithmetic until the final division, so Spark and any SQL
    oracle agree bit-for-bit.

    The posting list carries ``xxhash64(shingle)`` instead of the shingle
    text: the self-join shuffles 8-byte keys, not multi-word strings
    (~4× less shuffle volume; a 64-bit collision merging two distinct
    shingles has p≈n²/2⁶⁴ — irrelevant at any realistic corpus size, and
    results still match the string-keyed oracle on the test corpora).
    """
    sh = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(text_col, n)).alias("s_raw"),
        )
        .select("doc", F.xxhash64("s_raw").alias("s"))
        # Lazy localCheckpoint: the posting list feeds three consumers
        # (both self-join sides + the per-doc sizes); as a plain DataFrame
        # subtree Spark re-evaluates the scan+explode for each, ~2× the
        # total cost. The checkpoint collapses lineage to one RDD that
        # computes once per job. Lives in executor storage for the
        # session; a cluster deployment would materialize the posting
        # list as a staging table instead.
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    left = sh.alias("a")
    right = sh.alias("b")
    shared = (
        left.join(right, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))
    return (
        shared.join(sa, "d1")
        .join(sb, "d2")
        .filter(jac >= threshold)
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: array<long> of length ``num_perm``.

    Shape chosen for scale (same as simhash): explode shingles → hash each
    shingle ONCE → one hash-aggregate computing all ``num_perm`` mins
    (map-side partials; the shuffle rows are (doc, num_perm longs), the
    shingle text never shuffles). The tempting no-shuffle formulation —
    ``array_min(transform(shingles, ...))`` per permutation — duplicates
    the whole shingle-building expression tree per permutation and ran
    ~40× slower at sf0.1.

    Documents with fewer than ``shingle_n`` tokens produce no shingles and
    are absent from the output (nothing to MinHash).
    """
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, shingle_n)).alias("s"),
    ).select(id_col, F.pmod(F.xxhash64("s"), F.lit(_MINHASH_P)).alias("h"))
    # h < p < 2^31 and a < p, so a*h + b < 2^62 — no LongType overflow.
    mins = [
        F.min(F.pmod(F.col("h") * a + b, F.lit(_MINHASH_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]
    grouped = exploded.groupBy(id_col).agg(*mins)
    return grouped.select(
        id_col, F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Each signature splits into ``bands`` bands of ``num_perm/bands`` rows;
    docs sharing any band hash become candidates. The only shuffle is the
    groupBy on (band, band_hash) — at 100 TB the bucket join touches
    candidate pairs only, never the full cross product. Buckets with a
    single doc are dropped before the pair expansion; `self-join within
    bucket` is done via a compact collect_list + posexplode pair expansion
    per bucket (buckets are tiny by construction for near-dup workloads).
    """
    rows = num_perm // bands
    banded = signatures.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws("_", *[F.col("signature")[i * rows + j].cast("string") for j in range(rows)]))
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) -> "
                "transform(slice(docs, i + 2, size(docs) - i - 1), y -> struct(x AS d1, y AS d2))))"
            )
        ).alias("p")
    )
    return pairs.select("p.d1", "p.d2").distinct()


def minhash_dedup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """shingle → MinHash → band → bucket-join candidate pair pipeline."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    return lsh_candidate_pairs(sigs, id_col, num_perm, bands)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (near-dups differ in few bits).

    Shape chosen for scale: explode tokens → hash once per token →
    one hash-aggregate computing all 64 signed bit sums (conditional
    sums, map-side partials) → pack signs into one BIGINT. The shuffle
    rows are (doc_id, 64 longs); token text never shuffles.
    """
    tok_hash = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .select(id_col, F.xxhash64("tok").alias("h"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok_hash.groupBy(id_col).agg(*bit_sums)
    packed = None
    for b in range(64):
        # shiftleft, not 1 << b in Python: (1 << 63) overflows LongType.
        bit = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return sums.select(id_col, packed.alias("simhash64"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 8
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Blocking with **max_hamming + 1** bit-blocks: a pair differing in at
    most ``max_hamming`` bits cannot touch every block (pigeonhole), so
    at least one block matches exactly and the pair becomes a join
    candidate — *guaranteed* recall, unlike a fixed block count which
    silently misses pairs whose differing bits spread across all blocks.
    Candidates are then verified with the true bit_count distance.
    """
    n_blocks = max_hamming + 1
    if n_blocks > 64:
        raise ValueError("max_hamming must be < 64")
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    sigs = simhash(df, text_col, id_col)
    blocked = sigs.select(
        F.col(id_col).alias("doc"),
        "simhash64",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash64", off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in zip(offsets, widths)
                ]
            )
        ).alias("block", "block_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.expr("bit_count(a.simhash64 ^ b.simhash64)").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
