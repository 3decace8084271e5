"""Dedup operator tests: the probabilistic paths are pinned to the exact
oracle variants (MinHash candidates must cover every true Jaccard pair;
fingerprint collisions must equal exact text equality)."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import dedup, text
from shopify_etl_spark.plans.catalog import load_table


def test_minhash_candidates_cover_true_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    true_pairs = {
        (r.d1, r.d2) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    candidates = {
        (r.d1, r.d2) for r in dedup.minhash_dedup_candidates(docs).collect()
    }
    assert true_pairs, "testdata should contain planted near-duplicates"
    missed = true_pairs - candidates
    assert not missed, f"LSH missed true near-dup pairs: {missed}"


def test_fingerprint_collisions_equal_exact_dups(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),
        (3, "the  quick   brown fox"),  # whitespace-normalized → same fp
        (4, "a different document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = text.fingerprint(df).collect()
    by_id = {r.doc_id: r.fp64 for r in fps}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[4] != by_id[1]


def test_exact_duplicates_counts(spark):
    rows = [(1, "aaa"), (2, "aaa"), (3, "bbb")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.text: (r.canonical_id, r.n_copies) for r in dedup.exact_duplicates(df).collect()}
    assert out == {"aaa": (1, 2), "bbb": (3, 1)}


def test_word_shingles_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, "x  y   z")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.sh
        for r in df.select("doc_id", dedup.word_shingles("text", 3).alias("sh")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # fewer tokens than n → empty, not descending-sequence garbage
    assert out[3] == []
    assert out[4] == ["x y z"]  # empty tokens from runs of spaces are dropped


def test_simhash_near_pairs_finds_planted_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sim_pairs = {
        (r.d1, r.d2)
        for r in dedup.simhash_near_pairs(docs, max_hamming=8).collect()
    }
    true_pairs = {
        (r.d1, r.d2) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    # SimHash is a different similarity notion; require it to catch most
    # of the strongly-near-duplicate (J>=0.8) pairs.
    caught = len(true_pairs & sim_pairs)
    assert caught >= 0.7 * len(true_pairs), (caught, len(true_pairs))


def test_df_cap_keeps_planted_pairs_and_bounds_stop_shingles(spark, sf_dir):
    """The df_max candidate cap must not lose any true near-dup pair on the
    test corpus (every planted pair shares under-cap shingles), and a
    synthetic boilerplate corpus shows the cap actually prunes."""
    docs = load_table(spark, sf_dir, "documents")
    capped = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8, df_max=100).collect()
    }
    uncapped = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8, df_max=None).collect()
    }
    assert capped == uncapped and capped

    # boilerplate corpus: one stop-shingle in every doc; cap must prune it
    # from candidate generation (docs share ONLY boilerplate → no pairs),
    # while true near-dups (doc 100/101) still surface with exact scores.
    boiler = [(i, f"common header line word{i} tail{i} end{i}") for i in range(50)]
    boiler += [(100, "alpha beta gamma delta epsilon zeta"),
               (101, "alpha beta gamma delta epsilon eta")]
    bdf = spark.createDataFrame(boiler, ["doc_id", "text"])
    out = dedup.ngram_jaccard_pairs(bdf, threshold=0.5, df_max=10).collect()
    assert {(r.d1, r.d2) for r in out} == {(100, 101)}
    # exact verify phase scored over FULL postings: J(100,101) = 3 shared
    # of (4+4-3) = 0.6 — not a capped approximation
    assert abs(out[0].jaccard - 0.6) < 1e-9


def test_duplicate_clusters_chain_and_components(spark):
    """A 6-node chain (diameter > one round) plus a separate triangle and
    an isolated pair: every node must get its component's min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain 1..6
         (10, 11), (11, 12), (10, 12),             # triangle
         (20, 21)],                                 # pair
        ["d1", "d2"],
    )
    out = {r.doc: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_clusters_respects_iteration_cap(spark):
    """With max_iterations=1 a long chain cannot fully converge — the cap
    must bound work (and the caller sees partial labels, not a hang)."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], ["d1", "d2"])
    partial = {
        r.doc: r.cluster_id
        for r in dedup.duplicate_clusters(pairs, max_iterations=1).collect()
    }
    full = {
        r.doc: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert full == {i: 1 for i in range(1, 9)}
    assert partial[8] > 1  # one round can only pull labels one hop


def test_minhash_signature_deterministic(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    s1 = dedup.minhash_signatures(df).collect()[0].signature
    s2 = dedup.minhash_signatures(df).collect()[0].signature
    assert s1 == s2
    assert len(s1) == 32


def test_cross_contamination_hand_computed(spark):
    from shopify_etl_spark.operators.dedup import cross_contamination

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares a run with eval 10
            (2, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [
            # 5 tokens -> 3 shingles; 'alpha beta gamma','beta gamma delta' shared
            (10, "alpha beta gamma delta nu"),
            (11, "totally unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    rows = cross_contamination(train, ev, threshold=0.2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.eval_id, r.train_id, r.shared) == (10, 1, 2)
    assert r.contam_frac == round(2 / 3, 4)


def test_cross_contamination_threshold_excludes(spark):
    from shopify_etl_spark.operators.dedup import cross_contamination

    train = spark.createDataFrame([(1, "a b c x y z")], ["doc_id", "text"])
    ev = spark.createDataFrame([(10, "a b c q r s t u")], ["doc_id", "text"])
    # eval has 6 shingles, 1 shared ('a b c') -> frac 1/6 < 0.2
    assert cross_contamination(train, ev, threshold=0.2).count() == 0
    got = cross_contamination(train, ev, threshold=0.1).collect()
    assert [(r.eval_id, r.train_id, r.shared) for r in got] == [(10, 1, 1)]


def test_apply_dedup_keeps_canonicals(spark):
    from shopify_etl_spark.operators.dedup import apply_dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    # clusters: {1,3,5} canonical 1; {2,4} canonical 2; doc 0 untouched
    clusters = spark.createDataFrame(
        [(1, 1), (3, 1), (5, 1), (2, 2), (4, 2)], ["doc", "cluster_id"]
    )
    kept = sorted(r.doc_id for r in apply_dedup(docs, clusters).collect())
    assert kept == [0, 1, 2]


def test_apply_dedup_best_keeps_highest_quality(spark):
    """Quality-aware apply: each cluster keeps its best-scoring member
    (ties -> smallest id); unclustered docs always survive."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7), (5, 50)], ["doc_id", "q"]
    )
    clusters = spark.createDataFrame(
        # cluster {1,2,3} labeled by min id 1; doc 4 is its own cluster
        # (self-cluster rows exist for every clustered node); 5 untouched
        [(1, 1), (2, 1), (3, 1), (4, 4)], ["doc", "cluster_id"]
    )
    kept = sorted(
        r.doc_id
        for r in dedup.apply_dedup_best(docs, clusters, "q").collect()
    )
    # best of {1,2,3} is q=99 tie -> min id 2; 4 survives its own cluster;
    # 5 never clustered
    assert kept == [2, 4, 5]

    # contrast: min-id rule keeps 1 instead
    kept_min = sorted(r.doc_id for r in dedup.apply_dedup(docs, clusters).collect())
    assert kept_min == [1, 4, 5]


def test_source_overlap_matrix_hand_computed(spark):
    """Two sources sharing exactly one planted 3-gram, a third disjoint:
    shared counts and set-Jaccard match hand math; pairs with zero
    overlap emit no row."""
    from pyspark.sql import Row
    from shopify_etl_spark.operators.dedup import source_overlap_matrix

    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text="alpha beta gamma delta"),
        Row(doc_id=2, source="b", text="alpha beta gamma other words here"),
        Row(doc_id=3, source="c", text="totally different content entirely"),
    ])
    got = {(r.src1, r.src2): r for r in source_overlap_matrix(df).collect()}
    # a: {abg, bgd}; b: {abg, bgo, gow, owh}; shared = {abg} -> 1/(2+4-1)
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r.n_shared == 1
    assert r.shingle_jaccard == round(1 / 5, 4)


class TestDuplicateSpans:
    def test_duplicate_span_stats_hand_case(self, spark):
        """Two docs sharing a 5-token run -> exactly the 2 overlapping
        4-token windows flagged in each; sub-width docs drop out; a doc
        with no cross-doc window reports 0 with full window count."""
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d e f g h"),
                Row(doc_id=2, text="x a b c d e y z"),
                Row(doc_id=3, text="short text"),
                Row(doc_id=4, text="p q r s t u v w"),
            ]
        )
        got = {r.doc_id: r for r in
               dedup.duplicate_span_stats(docs, width=4).collect()}
        assert set(got) == {1, 2, 4}
        assert (got[1].n_windows, got[1].n_dup_windows) == (5, 2)
        assert (got[2].n_windows, got[2].n_dup_windows) == (5, 2)
        assert got[1].dup_window_frac == 0.4
        assert (got[4].n_windows, got[4].n_dup_windows) == (5, 0)

    def test_duplicate_span_intra_doc_repeat_counts_positions(self, spark):
        """A span repeated twice inside one doc AND present in another:
        both positions count (positional windows, not distinct)."""
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="m n o p Z m n o p"),
                Row(doc_id=2, text="q r m n o p s t"),
            ]
        )
        got = {r.doc_id: r for r in
               dedup.duplicate_span_stats(docs, width=4).collect()}
        # doc 1: windows at pos 0 ("m n o p") and pos 5 ("m n o p") both dup
        assert got[1].n_dup_windows == 2
        assert got[2].n_dup_windows == 1

    def test_duplicate_span_intervals_islands(self, spark):
        """Overlapping dup windows merge into one maximal interval;
        disjoint runs stay separate islands."""
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d e Q R S m n o p x"),
                Row(doc_id=2, text="a b c d e Z Z Z m n o p y"),
            ]
        )
        got = sorted(
            dedup.duplicate_span_intervals(docs, width=4).collect(),
            key=lambda r: (r.doc_id, r.span_start),
        )
        assert [(r.doc_id, r.span_start, r.span_end, r.n_tokens) for r in got] == [
            (1, 0, 4, 5), (1, 8, 11, 4), (2, 0, 4, 5), (2, 8, 11, 4),
        ]

    def test_trim_repeated_spans_apply(self, spark):
        """Trim removes exactly the interval tokens; untouched docs pass
        through with raw text (whitespace preserved); n_kept matches."""
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d e Q R S m n o p x"),
                Row(doc_id=2, text="a b c d e Z Z Z m n o p y"),
                Row(doc_id=3, text="untouched  doc   stays whole"),
            ]
        )
        got = {r.doc_id: r for r in
               dedup.trim_repeated_spans(docs, width=4).collect()}
        assert got[1].trimmed_text == "Q R S x"
        assert got[2].trimmed_text == "Z Z Z y"
        assert (got[1].n_kept_tokens, got[2].n_kept_tokens) == (4, 4)
        # raw text preserved (double spaces intact), token count from split
        assert got[3].trimmed_text == "untouched  doc   stays whole"
        assert got[3].n_kept_tokens == 4

    def test_trim_fully_duplicated_doc_empties(self, spark):
        """A doc that is one big duplicated window trims to ''/0."""
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d"),
                Row(doc_id=2, text="a b c d"),
            ]
        )
        got = {r.doc_id: r for r in
               dedup.trim_repeated_spans(docs, width=4).collect()}
        assert got[1].trimmed_text == "" and got[1].n_kept_tokens == 0
        assert got[2].trimmed_text == "" and got[2].n_kept_tokens == 0


def test_cross_corpus_near_dups_asymmetric(spark):
    """New batch screened against a reference store: only cross pairs
    emit (never ref x ref or new x new), and Jaccard matches hand math."""
    from pyspark.sql import Row

    base = " ".join(f"t{i}" for i in range(20))
    ref = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=base)]  # internal dup
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=10, text=base),                     # dup of store
            Row(doc_id=11, text="fresh unique words " * 5),
        ]
    )
    got = dedup.cross_corpus_near_dups(new, ref).collect()
    assert {(r.new_id, r.ref_id) for r in got} == {(10, 1), (10, 2)}
    assert all(r.jaccard == 1.0 for r in got)
