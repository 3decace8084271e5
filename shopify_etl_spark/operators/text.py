"""Text-analysis operators for large-scale document pipelines.

All hot-path expressions are JVM-side Column functions (no Python UDFs),
so they stay inside whole-stage codegen and scale linearly with executors.
Generalizes the reference's scalar/text handling (tags CSV, SKU
normalization — SURVEY.md §2.4) to the document-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword language
#: heuristic. Deliberately small and deterministic — a real deployment
#: would swap in proper profiles; the *plumbing* (score-and-argmax over
#: language profiles, all JVM-side) is what matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "los", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "and", "to")


# spread_small fires below this optimizer size estimate. Generous on
# purpose: the frames it protects feed explode/shingle stages that
# amplify rows 10-100x, so "small" is measured BEFORE amplification; a
# sub-256MB frame's extra round-robin exchange costs one bounded pass at
# any scale, while a production corpus scan estimates far above it and
# skips the shuffle entirely.
_SPREAD_MAX_BYTES = 256 << 20


def spread_small(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input is small
    enough to arrive under-partitioned (e.g. one small parquet file → one
    task, or an AQE-coalesced single post-shuffle partition). Explode
    stages amplify rows 10-100×, so a single input partition serializes
    the whole downstream computation (measured 7.5× on the shingle stage
    and ~4× on the bigram-LM scorer at sf0.1). A large input (by the
    optimizer's static size estimate) skips the shuffle entirely — at
    100 TB this is a no-op.

    The decision reads ``optimizedPlan().stats().sizeInBytes`` — a pure
    plan-time estimate. The r2–r16 implementation asked the ACTUAL
    partition count via ``df.rdd.getNumPartitions()``, which under AQE
    must finalize the adaptive plan: for a frame downstream of a shuffle
    or a ``persist()`` boundary that EXECUTES every upstream stage at
    query-construction time (measured: the whole LM-gate chain of
    curation_v2_corpus ran during builder construction). The estimate
    needs no execution and is exactly as accurate at the two ends that
    matter (raw file scans: true bytes; 100 TB corpora: huge)."""
    sc = df.sparkSession.sparkContext
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est < _SPREAD_MAX_BYTES:
        return df.repartition(sc.defaultParallelism)
    return df


def spread_groups(df: DataFrame, *keys: str) -> DataFrame:
    """The :func:`spread_small` decision for a frame about to feed a
    KEYED Python group stage (``groupBy(keys).applyInPandas``).

    AQE coalesces post-shuffle partitions by BYTES (parallelism-first
    floor is ``minPartitionSize`` = 1 MB), which is the right call for
    codegen'd JVM operators but serializes Python stages whose cost per
    byte is orders of magnitude higher: a 0.9 MB shuffle output collapsed
    to ONE partition put an entire synth→parse→extract crawl chain on a
    single core (measured 4.1 s of a 5.2 s query in one task). For a
    small input (static estimate), pre-partitioning BY THE GROUP KEYS to
    the cluster's parallelism satisfies the group stage's required
    distribution — same single exchange, but user-specified
    (REPARTITION_BY_NUM), which AQE does not coalesce. A large input
    skips this and lets the group stage's own exchange + AQE sizing
    handle it — at 100 TB bytes-based sizing is correct even for Python
    stages because every partition is long past the per-task floor."""
    sc = df.sparkSession.sparkContext
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est < _SPREAD_MAX_BYTES:
        return df.repartition(sc.defaultParallelism, *keys)
    return df


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (ArrayType<String>).

    Splits on runs of ANY whitespace (``\\s+``), not just the space
    character — real corpora contain tabs and newlines, and a tokenizer
    that misses them corrupts every downstream count/shingle/signature.
    """
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the retrieval-side prep every
    embedding/RAG index runs before vectorizing: fixed-size character
    windows with overlap so no span is split without context, stable
    (doc, chunk_idx) addressing so a hit maps back to its source offset.

    One row per chunk: ``(id, chunk_idx, chunk_start, chunk_len,
    chunk_text, n_tokens)``. Chunk starts advance by
    ``chunk_chars - overlap``; a window is emitted while its start lands
    before ``len - overlap`` (so a would-be tail window fully contained
    in the previous one is dropped — the LangChain/llama-index splitter
    convention), and every non-empty document emits at least one chunk.
    Empty documents emit none.

    Scale shape: pure JVM expressions — ``sequence`` for the starts,
    one ``explode``, ``substring`` per chunk. Zero shuffles, zero UDFs;
    cost is the scan plus output size, exactly like the flatteners.
    The token-window twin (``chunk_documents`` below) and the
    sequence-packer (``packing.pack_sequences``) are the training-side
    counterparts; this is the indexing-side one (per-doc windows, CHAR
    offsets — the coordinates a retrieval hit needs to map back to its
    source span).
    """
    if overlap < 0 or chunk_chars <= overlap:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_chars, got "
            f"chunk_chars={chunk_chars} overlap={overlap}"
        )
    step = chunk_chars - overlap
    n = F.length(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    chunk = F.substring(
        F.col(text_col), F.col("chunk_start") + 1, chunk_chars
    )
    return (
        df.filter(n > 0)
        .select(id_col, text_col, F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            (F.col("chunk_start") / step).cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            chunk.alias("chunk_text"),
            F.size(tokens(chunk)).cast("long").alias("n_tokens"),
        )
    )


#: GPT-2-style pre-tokenizer pattern (ASCII subset, non-capturing groups
#: only — portable across Java regex and RE2): contractions, space-prefixed
#: letter runs, space-prefixed digit runs, space-prefixed punctuation runs,
#: whitespace runs. This is the split every byte-pair tokenizer applies
#: BEFORE merges, so its match count is the upper bound on BPE token count
#: and the standard cheap proxy for it.
BPE_PRETOKEN_PATTERN = (
    r"(?:'s|'t|'re|'ve|'m|'ll|'d)"
    r"| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"
)


def bpe_pretokens(col: Column | str) -> Column:
    """BPE pre-token array (full regex matches, group 0 explicitly — Spark
    defaults to group 1 when the pattern contains groups)."""
    return F.regexp_extract_all(
        F.col(col) if isinstance(col, str) else col,
        F.lit(BPE_PRETOKEN_PATTERN),
        0,
    )


def bpe_merge_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20, sep: str = "|"
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts — the statistic each BPE
    merge step maximizes (pick the most frequent pair, merge, repeat).

    The scale shape tokenizer training actually uses: counts come from
    the pretoken FREQUENCY DICT, not the raw corpus — pretokens are
    counted first (word-count shuffle, vocabulary-sized output), then
    each DISTINCT pretoken explodes into its character pairs weighted by
    its count. A 100 TB corpus has a few million distinct pretokens; the
    pair explosion touches |vocab|·avg_len rows, not corpus tokens.
    First-merge-step counts only (symbols = single chars); an iterative
    trainer re-runs this over the re-segmented dict per merge, driver
    loop + this operator, exactly like the k-means fixed-point pattern.
    """
    pre = df.select(F.explode(bpe_pretokens(text_col)).alias("w"))
    wc = pre.groupBy("w").agg(F.count(F.lit(1)).alias("wn"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            "wn",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.concat(
                        F.col("w").substr(i, F.lit(1)),
                        F.lit(sep),
                        F.col("w").substr(i + F.lit(1), F.lit(1)),
                    ),
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_k)
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size token chunks per document — the context-
    window split that precedes shard packing (`token_budget_shards`)
    in a training pipeline.

    Chunk starts advance by ``chunk_size - overlap``; the final chunk is
    short rather than padded (padding is a tokenizer-side concern). All
    JVM: tokenize once, `sequence` of starts, explode, `slice` — the
    token array is materialized in its own projection so it evaluates
    once per document, not once per chunk (CollapseProject keeps
    non-cheap shared exprs out of the explode fan-out)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks")).filter(
        F.size("_toks") > 0
    )
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    chunked = toked.select(
        id_col, "_toks", F.explode(starts).alias("_start")
    )
    chunk = F.slice("_toks", F.col("_start") + 1, chunk_size)
    return chunked.select(
        F.col(id_col),
        (F.col("_start") / stride).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scores: token count, average token length,
    stopword ratio, punctuation count.

    Length/punct/stopword-ratio style scoring is the standard cheap
    pre-filter in training-data pipelines; one projection, no shuffle.
    """
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    word_chars = F.length(F.regexp_replace(text_col, r"\s", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    # nullif guards empty/whitespace-only documents: ratios become NULL
    # (visibly absent) instead of a divide-by-zero artifact
    denom = F.nullif(n_tokens, F.lit(0))
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        word_chars.alias("n_word_chars"),
        F.round(word_chars.cast("double") / denom, 4).alias("avg_token_len"),
        F.round(stop_hits.cast("double") / denom, 4).alias("stopword_ratio"),
        F.length(F.regexp_replace(text_col, r"[^.,!?;:]", "")).alias("n_punct"),
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts.

    Score computation is a handful of `size(filter(tokens))` expressions —
    one codegen'd projection per document, embarrassingly parallel.
    Ties resolve to the lexicographically first language (deterministic).
    ``keep_cols`` ride through the same projection (no re-scan / re-join
    for callers that need grouping keys downstream).
    """
    toks = tokens(F.lower(F.col(text_col)))

    # Factory, not a default-arg lambda: PySpark infers higher-order-function
    # arity from the Python signature, so `lambda x, m=...` would be bound as
    # a (element, index) two-arg lambda.
    def _in_set(values):
        return lambda x: x.isin(*values)

    scores = [
        F.size(F.filter(toks, _in_set(markers))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(id_col, *keep_cols, *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select(
        id_col, *keep_cols, pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def _pushdown_barrier(df: DataFrame) -> DataFrame:
    """Stop predicate pushdown below this point.

    Catalyst's PushDownPredicate substitutes a filter condition through
    every deterministic Project down to the scan, re-expanding non-cheap
    expressions once per reference — ``filter(keep)`` on the quality
    gate re-evaluated the token/bigram folds ~8× (measured 2.4 s → 20.6 s
    at sf0.1; codegen subexpression elimination cannot rescue it because
    expressions containing lambdas are exempt). CollapseProject knows
    better (it keeps boundaries for non-cheap multi-referenced exprs)
    but the pushdown rule does not.

    Implementation: route every row through a single-element ``explode``.
    Predicates referencing a Generate's output cannot push below it, and
    unlike a non-deterministic always-true filter (which the optimizer
    deletes — it can prove ``rand() >= -1``), a Generate is never
    optimized away. Cost: one array+struct wrap per row, no shuffle.
    """
    return df.select(
        F.explode(F.array(F.struct(*df.columns))).alias("_row")
    ).select("_row.*")


def _fold_stats(arr) -> Column:
    """struct(nd=|distinct|, top=max multiplicity) in ONE pass over the
    sorted array — distinct count via value transitions, top frequency via
    max run length. A single ``F.aggregate`` fold references the array
    once, so it dodges the nested-lambda re-expansion trap (see
    :func:`repetition_signals`); zero shuffle, zero explode."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("top"),
            F.lit(0).cast("long").alias("nd"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.top,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("top"),
            F.when(x == acc.prev, acc.nd).otherwise(acc.nd + 1).alias("nd"),
        ),
        lambda acc: F.struct(acc.nd.alias("nd"), acc.top.alias("top")),
    )


def _bigrams(toks) -> Column:
    """Word-bigram strings ("w1 w2"); empty array below 2 tokens (the
    ``when`` guard exists because Spark's ``sequence(1, 0)`` is a
    DESCENDING sequence, not an empty one)."""
    return (
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): docs
    dominated by repeated tokens/bigrams/lines are boilerplate, spam, or
    scraper artifacts and get filtered before training.

    * ``distinct_token_ratio`` — |distinct tokens| / |tokens| (low =
      repetitive).
    * ``top_token_frac`` — share of the most frequent token.
    * ``top_bigram_frac`` — share of the most frequent word bigram.
    * ``dup_line_frac`` — fraction of non-blank lines that are duplicates
      of an earlier line.

    Shape: zero-shuffle single pass. Each family (tokens, bigrams, lines)
    is ``array_sort`` + ONE ``F.aggregate`` fold computing (distinct,
    top-run-length) per row — purely narrow, no explode, no shuffle, no
    joins. Two prior traps, both avoided deliberately:

    * nested array lambdas (``transform(array_distinct(a), x ->
      size(filter(a, …)))``) re-expand the array expression per element —
      measured ~40× slower. A single fold references the array ONCE.
    * the arrays are materialized in their own ``select`` before use:
      CollapseProject keeps the projection boundary when a non-cheap
      expression is referenced more than once, so tokenization runs once
      per row, and downstream lambdas see cheap column attributes.

    An earlier explode → groupBy(doc,item) → groupBy(doc) → 3-way join
    version was correct but paid ~9 shuffle stages for a per-document
    computation (9.1 s → sub-second at sf0.1).
    Ratios are NULL for empty docs (nullif guard), matching the oracle.
    """
    fold_stats = _fold_stats
    staged = df.select(
        id_col,
        tokens(text_col).alias("_toks"),
        F.filter(F.split(text_col, r"\n"), lambda x: F.trim(x) != "").alias("_lines"),
    ).select(id_col, "_toks", "_lines", _bigrams("_toks").alias("_bg"))
    folded = staged.select(
        id_col,
        F.size("_toks").alias("tok_n"),
        fold_stats("_toks").alias("tok"),
        F.size("_bg").alias("bg_n"),
        fold_stats("_bg").alias("bg"),
        F.size("_lines").alias("line_n"),
        fold_stats("_lines").alias("line"),
    )
    return _pushdown_barrier(folded).select(
        id_col,
        F.col("tok_n").cast("long").alias("n_tokens"),
        F.round(
            F.col("tok.nd").cast("double") / F.nullif("tok_n", F.lit(0)), 4
        ).alias("distinct_token_ratio"),
        F.round(
            F.col("tok.top").cast("double") / F.nullif("tok_n", F.lit(0)), 4
        ).alias("top_token_frac"),
        F.round(
            F.col("bg.top").cast("double") / F.nullif("bg_n", F.lit(0)), 4
        ).alias("top_bigram_frac"),
        F.round(
            (F.col("line_n") - F.col("line.nd")).cast("double")
            / F.nullif("line_n", F.lit(0)),
            4,
        ).alias("dup_line_frac"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` tokens by term frequency, with
    document frequency — the first artifact of any tokenizer/BPE build.

    Classic word-count shape: explode → groupBy(token) with map-side
    partial aggregation, so the shuffle carries one row per distinct
    token per partition, not per occurrence. The dual (count, count
    distinct doc) aggregate uses Spark's expand strategy; the global
    top-k runs on the aggregated vocabulary (≪ corpus) via
    TakeOrdered — no single-partition sort of the full corpus.
    Tie-break (term_freq desc, token asc) is total, so the top-k set is
    deterministic and oracle-comparable.
    """
    return (
        df.select(F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("_doc").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(top_k)
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit document fingerprint over normalized text (xxhash64).

    The dedup key for exact-dup removal at scale: grouping on an 8-byte
    hash instead of multi-KB text bodies keeps shuffle volume flat no
    matter how long the documents are.
    """
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return df.select(
        id_col,
        F.xxhash64(norm).alias("fp64"),
        F.length(text_col).alias("n_chars"),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Portable md5 document fingerprint over the same normalization.

    Oracle-checkable twin of ``fingerprint``: md5 exists in every engine
    (Spark, DuckDB, Postgres, …) so cross-engine parity can be asserted
    value-for-value. The scale default stays ``fingerprint`` (xxhash64):
    an 8-byte integer key shuffles/groups ~4× cheaper than a 32-char hex
    string and hashes faster; use md5 when fingerprints must be portable
    across engines or survive in external systems.
    """
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return df.select(
        id_col,
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.length(text_col).alias("n_chars"),
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information.

    PMI(x,y) = ln( p(xy) / (p(x)·p(y)) ) over corpus-wide bigram/unigram
    frequencies — the classic collocation detector ("new york" scores
    high, "of the" does not), and a standard vocabulary/tokenizer-prep
    artifact next to :func:`vocabulary`.

    Shape: two word-count pipelines (explode → groupBy(token) with
    map-side partial aggregation — shuffle carries one row per distinct
    key per partition), two joins of the bigram table against the
    unigram table on the word key (vocabulary-sized, not corpus-sized;
    AQE picks broadcast iff it fits), and a TakeOrdered top-k on the
    surviving ≥ ``min_count`` rows. The ``min_count`` filter runs BEFORE
    the joins — rare-bigram rows (the long tail, most of the table)
    never reach the shuffle.

    The PMI expression is written in ratio-of-ratios form and must stay
    textually parallel with the SQL oracle: a mathematically equivalent
    rearrangement (e.g. ln(c_xy·N²/(N_bg·c_x·c_y))) rounds differently
    in the last ulp.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("_doc"), toks.alias("_w"))
    uni = (
        base.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bg = (
        base.select(F.explode(_bigrams("_w")).alias("b"))
        .select(
            F.split_part("b", F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part("b", F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    # both sides are one-row aggregates; the explicit hint keeps this a
    # broadcast NL join even with auto-broadcast off (without it the
    # optimizer may plan a true CartesianProduct — caught by the
    # whole-catalog hygiene gate)
    totals = uni.agg(F.sum("c_w").alias("n_uni")).crossJoin(
        F.broadcast(bg.agg(F.sum("c_xy").alias("n_bg")))
    )
    scored = (
        bg.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c_xy"),
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n_bg"))
                    / ((F.col("c_x") / F.col("n_uni")) * (F.col("c_y") / F.col("n_uni")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(top_k)


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide repeated lines: (line, n_docs) for every trimmed
    non-blank line appearing in ≥ ``min_docs`` distinct documents.

    The CCNet-style boilerplate detector — navigation chrome, cookie
    banners, and license headers repeat across unrelated pages and are
    removed line-wise, not document-wise. Explode lines → distinct per
    doc → count distinct docs per line; the shuffle key is the line text
    (a production run at 100 TB would key on xxhash64(line) like the
    shingle postings — kept as text here so the output is directly
    joinable/readable).
    """
    lines = F.array_distinct(
        F.transform(
            F.filter(F.split(text_col, r"\n"), lambda x: F.trim(x) != ""),
            lambda x: F.trim(x),
        )
    )
    return (
        df.select(F.col(id_col).alias("_doc"), F.explode(lines).alias("line"))
        .groupBy("line")
        .agg(F.countDistinct("_doc").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Remove corpus-wide boilerplate lines from every document.

    Two-pass: :func:`boilerplate_lines` builds the repeated-line set,
    then each document drops its lines that appear in it. The membership
    test is a broadcast left-anti join at the LINE level (explode with
    position → anti-join → re-assemble with array_sort + array_join), so
    line order inside each document is preserved and documents that lose
    nothing round-trip byte-identical.

    Returns (id, clean_text, n_lines_removed). The boilerplate set is
    vocabulary-sized (lines repeated across docs), far smaller than the
    corpus; if it outgrows broadcast, AQE falls back to a shuffled anti
    join on the line key.
    """
    bp = boilerplate_lines(df, text_col, id_col, min_docs).select("line")
    lines = F.filter(F.split(text_col, r"\n"), lambda x: F.trim(x) != "")
    exploded = df.select(
        F.col(id_col).alias("_doc"),
        F.size(lines).alias("_n_lines"),
        F.posexplode(lines).alias("pos", "raw_line"),
    ).withColumn("line", F.trim("raw_line"))
    kept = exploded.join(bp, "line", "left_anti")
    out = kept.groupBy("_doc", "_n_lines").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "raw_line"))),
                lambda s: s.raw_line,
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    result = out.select(
        F.col("_doc").alias(id_col),
        "clean_text",
        (F.col("_n_lines") - F.col("_n_kept")).cast("long").alias("n_lines_removed"),
    )
    # documents whose EVERY line was boilerplate vanish from the groupBy;
    # resurrect them as empty texts so the output covers the input corpus
    all_ids = df.select(id_col, F.size(lines).alias("_n_lines_all"))
    return (
        all_ids.join(result, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce(
                "n_lines_removed", F.col("_n_lines_all").cast("long")
            ).alias("n_lines_removed"),
        )
    )


#: (rule name, reason emitted) — order is the emission order in
#: quality_filter's reasons string and must match the oracle SQL.
QUALITY_RULES = (
    "too_short",
    "too_long",
    "low_distinct",
    "repetitive_bigram",
    "low_stopword",
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_distinct_ratio: float = 0.35,
    max_top_bigram_frac: float = 0.20,
    min_stopword_ratio: float = 0.01,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Composite Gopher-style quality gate: every rule evaluated in ONE
    narrow projection (token/bigram folds, no shuffle), emitting
    (id, n_tokens, keep, reasons) where ``reasons`` is a
    semicolon-joined list of failed rules in :data:`QUALITY_RULES` order.

    This is the filter documents actually flow through in a curation
    pipeline — individual signal queries (:func:`quality_metrics`,
    :func:`repetition_signals`) exist for analysis, but re-joining them
    per-document would shuffle the corpus twice for what one projection
    computes for free. Thresholds are constructor arguments; defaults
    drop both tails on the synthetic corpus.

    ``keep_cols`` pass through unchanged, so pipelines can keep payload
    columns (e.g. the text itself) in the SAME narrow pass — joining
    the verdict back by id would re-evaluate the upstream subtree
    (measured 20 s → 5 s on the curation pipeline at sf0.1).
    """
    staged = df.select(
        id_col, *keep_cols, tokens(text_col).alias("_toks")
    ).select(
        id_col,
        *keep_cols,
        "_toks",
        _bigrams("_toks").alias("_bg"),
        F.size("_toks").alias("_n"),
    )
    tok = _fold_stats("_toks")
    bgf = _fold_stats("_bg")
    stop_hits = F.size(F.filter(F.col("_toks"), lambda x: x.isin(*STOPWORDS)))
    denom = F.nullif(F.col("_n"), F.lit(0))
    folded = staged.select(
        id_col,
        *keep_cols,
        F.col("_n").cast("long").alias("n_tokens"),
        (tok["nd"] / denom).alias("_dr"),
        (bgf["top"] / F.nullif(F.size("_bg"), F.lit(0))).alias("_tbf"),
        (stop_hits / denom).alias("_sr"),
    )
    fails = [
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
        F.when(F.col("_dr") < min_distinct_ratio, F.lit("low_distinct")),
        F.when(F.col("_tbf") > max_top_bigram_frac, F.lit("repetitive_bigram")),
        F.when(F.col("_sr") < min_stopword_ratio, F.lit("low_stopword")),
    ]
    reasons = F.concat_ws(";", *fails)
    # barrier: a downstream filter(keep) must evaluate the folds ONCE in
    # this projection, not re-expand them into the pushed-down predicate
    return _pushdown_barrier(folded).select(
        id_col,
        *keep_cols,
        "n_tokens",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document bigram language-model score — the CCNet-style quality
    signal: documents whose token transitions are improbable under a
    corpus LM (boilerplate, gibberish, wrong-language fragments) score
    high bits-per-bigram and get filtered or bucketed.

    Model: add-k (Laplace) smoothed bigram LM trained on the corpus
    itself —

        P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

    with ``c(w1·)`` the bigram-PREFIX count (sum over continuations, so
    the distribution normalizes exactly) and V the corpus vocabulary.
    Score = mean −log2 P over the document's bigrams (bits per bigram;
    perplexity is 2^score).

    Scale shape: bigram extraction is one array transform per row (no
    token-stream shuffle for the doc side); the model is two grouped
    counts keyed by 8-byte-hashable bigram/prefix strings — vocabulary-
    sized, not corpus-sized — and scoring is two equi-joins back on
    those keys. V rides in as one broadcast row. Docs with <2 tokens
    have no bigrams and drop out (no probability is defined for them;
    the quality_filter length gate catches them separately).

    ``keep_cols`` ride the tokenized frame through to the output (e.g.
    ``lang`` for the CCNet tercile consumers), so a downstream bucketing
    pass needs NO second join back to the corpus — the source table is
    scanned exactly once per query.

    Materialization (VERDICT r7): FOUR consumers hang off the tokenized
    corpus — the bigram stream feeds scoring rows + bigram counts +
    prefix counts, and the vocab count needs the raw tokens (every token
    of a >=2-token doc appears in some bigram, but tokens that occur
    ONLY in 1-token docs would be missed by a bigram-derived vocab) — so
    the tokenize pass is checkpointed once and everything re-derives
    from its blocks. Without it the scan+tokenize re-executes per
    consumer: AQE never fires ReusedExchange across these stage
    boundaries (measured: 0 reuses, 4 parquet scans).
    """
    from .materialize import checkpoint_tracked

    tokd = checkpoint_tracked(
        spread_small(df).select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            tokens(text_col).alias("_tk"),
        )
    )
    doc_bigrams = (
        tokd.select(
            F.col(id_col),
            *keep_cols,
            F.explode(_bigrams(F.col("_tk"))).alias("bg"),
        )
        .select(
            id_col,
            *keep_cols,
            "bg",
            F.substring_index("bg", " ", 1).alias("w1"),
        )
    )
    bg_counts = doc_bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    prefix_counts = doc_bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = tokd.select(F.explode("_tk").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    logp = F.log2(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        doc_bigrams.join(bg_counts, "bg")
        .join(prefix_counts, "w1")
        .join(F.broadcast(vocab))
        .groupBy(id_col, *keep_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-logp), 4).alias("avg_nll_bits"),
        )
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    max_pretokens: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` ranked BPE merges from the corpus.

    The distributed part is exactly the pretoken frequency dict (one
    word-count shuffle, vocabulary-sized output — the input every real
    BPE trainer consumes); the merge loop itself runs driver-side over
    that dict, the same bounded-driver-fold pattern as the k-means
    centroid collect (``clustering.py``). A 100 TB corpus changes the
    DICT COUNTS, not the loop's size: iterations touch |vocab|·avg_len
    symbols regardless of corpus scale. First-step pair counts agree
    with :func:`bpe_merge_pair_counts` by construction (pinned in
    tests).

    The driver fold is HARD-BOUNDED (VERDICT r8 #6): on open web text
    the distinct-pretoken count is not a constant, so only the top
    ``max_pretokens`` pretokens by frequency are collected (count desc,
    then lexicographic — deterministic). Dropping the sub-threshold tail
    is standard BPE practice (frequency-pruned word counts): the tail's
    total pair mass is negligible by construction at a 1M cap, and the
    top-K itself is a distributed TakeOrdered, never a full sort.

    Tie-break: highest count, then lexicographic pair — deterministic
    across runs and cluster layouts.
    """
    wc = (
        df.select(F.explode(bpe_pretokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .orderBy(F.desc("wn"), F.asc("w"))
        .limit(max_pretokens)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r.w): r.wn for r in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for word, n in vocab.items():
            for a, b in zip(word, word[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for word, n in vocab.items():
            syms: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    syms.append(merged)
                    i += 2
                else:
                    syms.append(word[i])
                    i += 1
            key = tuple(syms)
            out[key] = out.get(key, 0) + n
        vocab = out
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Segment every document with learned BPE merges (the tokenizer
    APPLY step every training pipeline runs over the full corpus).

    Greedy rank-order merging is inherently iterative per pretoken (each
    merge can enable the next), so this is genuine Pandas-UDF territory:
    an Arrow-batched ``mapInPandas`` with the merge table broadcast in
    the closure and a per-batch pretoken memo — each DISTINCT pretoken
    in a batch is segmented once regardless of its frequency, the same
    dict-not-corpus economics as training. Emits per-document BPE token
    counts plus the segmented tokens; deterministic for a fixed merge
    table. ``keep_cols`` ride through unchanged (the engine-wide
    ride-along pattern), so a downstream grouping (e.g. the per-source
    shard export) needs no corpus join back to the input.
    """
    import re as _re

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {pair: r for r, pair in enumerate(merges)}
    pattern = _re.compile(BPE_PRETOKEN_PATTERN)

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[word] = syms
        return syms

    # the id column keeps the CALLER's name and type — hardcoding
    # doc_id/int64 here broke joins for any other id column (and crashed
    # the Arrow worker on string ids)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            *[
                StructField(c, df.schema[c].dataType, True)
                for c in keep_cols
            ],
            StructField("n_bpe_tokens", LongType(), False),
            StructField("bpe_tokens", ArrayType(StringType()), False),
        ]
    )

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            memo: dict = {}
            ns, toks = [], []
            for txt in pdf[text_col]:
                out: list[str] = []
                for w in pattern.findall(txt or ""):
                    out.extend(encode_word(w, memo))
                ns.append(len(out))
                toks.append(out)
            cols = {id_col: pdf[id_col].reset_index(drop=True)}
            for c in keep_cols:
                cols[c] = pdf[c].reset_index(drop=True)
            cols["n_bpe_tokens"] = pd.Series(ns, dtype="int64")
            cols["bpe_tokens"] = pd.Series(toks, dtype=object)
            yield pd.DataFrame(cols)

    return df.select(id_col, *keep_cols, text_col).mapInPandas(seg, schema)


def oov_rates(
    df: DataFrame,
    vocab_size: int = 100,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per group against the corpus top-``vocab_size``
    token vocabulary — the tokenizer-coverage diagnostic run before
    committing a vocab: which sources will fragment into byte-fallback
    (high OOV) under a vocabulary fitted on the whole mix.

    Vocabulary = top tokens by corpus frequency, ties broken by token
    string for determinism. Scale shape: token counts are one grouped
    agg (vocabulary-sized), the top-V cut is a TakeOrdered (partial
    per-partition top-V, no global sort), and the membership check is a
    broadcast LEFT join of the V-row vocab onto the per-group token
    stream — the corpus never shuffles by token for scoring; the
    per-group rollup partial-aggregates map-side.
    """
    toks = (
        spread_small(df)
        .select(F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("t"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("_freq"))
        .orderBy(F.desc("_freq"), F.asc("t"))
        .limit(vocab_size)
        .select("t", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-distribution entropy and type-token ratio —
    the repetitiveness signals a quality gate reads: low entropy means
    a few tokens dominate (templates, keyword stuffing, boilerplate),
    low TTR means low lexical diversity even when no single n-gram
    repeats (what `repetition_signals`' top-gram fractions can miss).

    Everything is per-row higher-order functions over the token array
    (distinct -> per-type counts -> -Σ p·log2 p fold): a pure map-side
    projection, zero shuffles, zero UDFs — at 100 TB this is a free
    rider on whatever scan already reads the text. Cost per doc is
    O(tokens · types); for the pathological one-doc-huge-vocab case
    the exploded groupBy variant wins, but that shape is exactly what
    the length gates upstream exclude.

    Docs with zero tokens have no distribution and drop out (the
    quality_filter length gate owns them).
    """
    toks = tokens(text_col)
    df = df.select(F.col(id_col), toks.alias("_w")).filter(F.size("_w") > 0)
    counts = F.transform(
        F.array_distinct("_w"),
        lambda c: F.size(F.filter(F.col("_w"), lambda t: t == c)),
    )
    n = F.size("_w").cast("double")
    ent = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc - (k.cast("double") / n) * F.log2(k.cast("double") / n),
    )
    return df.select(
        id_col,
        F.size("_w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_w")).cast("long").alias("n_types"),
        F.round(ent, 4).alias("token_entropy"),
        # deliberately unrounded: types/tokens is an exact-integer
        # division, bit-identical in every engine, while ROUND(x,4)
        # hits exact .xxxx5 boundaries for denominators like 160
        # where Spark and DuckDB rounding disagree (the JL lesson)
        (F.size(F.array_distinct("_w")) / n).alias("ttr"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by smoothed tf-idf — the classic keyword
    extractor (and the lexical feature a curation pipeline hands to a
    topic router or a near-dup explainer).

    ``idf = ln((N+1)/(df+1)) + 1`` (sklearn's smooth variant: never zero,
    never divides by zero, unseen-term-safe). Shapes for 100 TB: the
    token explode feeds ONE partial-aggregated groupBy per (doc, term);
    the document-frequency table is vocabulary-sized (Heaps' law: ~√corpus)
    and broadcasts back onto the tf stream, so nothing corpus-sized
    shuffles twice; the final top-k is one window per doc partition.

    Ranking ties: the window orders by the score rounded to 10 decimals
    (collapsing cross-engine last-ulp differences in ``ln`` — the PCA
    lesson), then term ascending, so the emitted rows are a total,
    engine-independent order.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            F.col("tf")
            * (F.log((F.col("_n") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round("_score", 10)), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("term_rank").cast("int").alias("term_rank"),
            F.round("_score", 4).alias("tfidf"),
        )
    )


def zipf_fit(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf-law fit per group: OLS of ln(freq) on ln(rank) over the
    top-``top_n`` terms — slope ≈ -1 for natural language, much flatter
    for template/spam text and steeper for keyword-stuffed text, so the
    (slope, r²) pair is a corpus-level quality fingerprint a datasheet
    reports next to entropy/TTR.

    Ranks are exact-integer ordered (freq desc, term asc), the OLS runs
    on ≤ top_n points per group via closed-form sums, and everything
    upstream is the same vocabulary-sized frequency table the other text
    diagnostics ride — per-group cost is O(top_n), corpus cost is the
    token explode.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(by), F.explode(tokens(text_col)).alias("term"))
    freq = toks.groupBy(by, "term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(by).orderBy(F.desc("freq"), F.asc("term"))
    top = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    pts = top.select(
        by,
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    agg = pts.groupBy(by).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / vx
    return agg.select(
        by,
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "zipf_intercept"
        ),
        F.round((cov * cov) / (vx * vy), 4).alias("r2"),
    ).orderBy(by)


def tercile_thresholds(
    df: DataFrame,
    group_col: str = "lang",
    score_col: str = "score_bits",
) -> DataFrame:
    """Per-group tercile score thresholds (t1, t2) from VALUE COUNTS —
    the scale path for CCNet-style perplexity bucketing (VERDICT r6: the
    previous ``ntile(3)`` over ``Window.partitionBy(lang)`` total-sorts
    each language in ONE task; a dominant language is most of a corpus,
    so that window is a 100 TB killer).

    Shape: one partial-aggregated groupBy on (group, score) collapses
    the corpus to its distinct rounded score values — the scores are
    4-decimal-rounded bits-per-bigram in a bounded range, so the
    per-group state is VALUE-DOMAIN-bounded (tens of thousands of
    entries), not corpus-bounded — then one per-group sorted fold over
    that array finds the cumulative-count boundaries. No window touches
    corpus-sized data; the output is |groups| rows, broadcast back.

    Semantics: value terciles with integer-only boundary arithmetic —
    ``t1 = min score with 3*cum(score) >= n`` and ``t2`` likewise at
    ``2n`` — so rows tied at a boundary score share the lower bucket
    (threshold-on-perplexity, the CCNet paper's actual rule) and the
    result is bit-exact reproducible in any engine: no float percentile
    interpolation to drift by an ulp.

    Bucket rule for consumers: ``score <= t1`` -> head,
    ``score <= t2`` -> middle, else tail (see :func:`ppl_bucket_col`).
    """
    counts = df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per = counts.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(score_col).alias("s"), F.col("_c").alias("c"))
            )
        ).alias("_sc"),
        F.sum("_c").alias("_n"),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("t1"),
        F.lit(None).cast("double").alias("t2"),
    )

    def step(acc, x):
        cum = acc["cum"] + x["c"]
        return F.struct(
            cum.alias("cum"),
            F.coalesce(
                acc["t1"], F.when(cum * 3 >= F.col("_n"), x["s"])
            ).alias("t1"),
            F.coalesce(
                acc["t2"], F.when(cum * 3 >= 2 * F.col("_n"), x["s"])
            ).alias("t2"),
        )

    folded = per.select(
        group_col, F.aggregate("_sc", zero, step).alias("_t")
    )
    return folded.select(
        group_col,
        F.col("_t.t1").alias("t1"),
        F.col("_t.t2").alias("t2"),
    )


def ppl_bucket_col(
    score_col: str = "score_bits", t1: str = "t1", t2: str = "t2"
) -> Column:
    """head/middle/tail CASE over :func:`tercile_thresholds` output —
    comparisons against the threshold SCORES themselves (no arithmetic),
    so bucket membership is deterministic across engines."""
    return (
        F.when(F.col(score_col) <= F.col(t1), "head")
        .when(F.col(score_col) <= F.col(t2), "middle")
        .otherwise("tail")
    )
