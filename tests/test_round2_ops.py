"""Round-2 operators: BM25 retrieval, PMI collocations, boilerplate
removal, composite quality filter, gap-fill resample, containment dedup.

Planted-case invariants that the hash-oracle can't express (ranking
behavior, removal semantics, asymmetric-vs-symmetric dedup)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shopify_etl_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from shopify_etl_spark.operators.search import bm25_topk
from shopify_etl_spark.operators.text import (
    pmi_bigrams,
    boilerplate_lines,
    strip_boilerplate,
    quality_filter,
)
from shopify_etl_spark.operators.timeseries import resample_daily


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestBM25:
    def test_term_frequency_ranks_first_and_absent_docs_excluded(self, spark):
        docs = _docs(
            spark,
            [
                "spark spark spark engine engine",   # heavy on the query term
                "spark appears once here today",      # light
                "nothing relevant in this one at all",  # absent -> excluded
            ],
        )
        got = bm25_topk(docs, ("spark",), k=10).collect()
        assert [r.doc_id for r in got] == [0, 1]
        assert got[0].bm25 > got[1].bm25 > 0

    def test_rare_term_outweighs_common_term(self, spark):
        # 'rare' is in 1/4 docs, 'common' in 4/4: one hit of each ->
        # the rare-term doc must outscore a common-term-only doc.
        docs = _docs(
            spark,
            [
                "common rare filler filler",
                "common filler filler filler",
                "common filler filler filler extra",
                "common filler filler filler extra2",
            ],
        )
        got = {r.doc_id: r.bm25 for r in bm25_topk(docs, ("rare", "common"), k=10).collect()}
        assert got[0] > got[1]

    def test_rejects_empty_and_oversized_query(self, spark):
        docs = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            bm25_topk(docs, ())
        with pytest.raises(ValueError):
            bm25_topk(docs, tuple(f"t{i}" for i in range(65)))


class TestPMI:
    def test_planted_collocation_beats_independent_pair(self, spark):
        # "neural network" always adjacent; "data" and "table" both common
        # but never adjacent to each other except rarely.
        rows = ["neural network is here today"] * 6 + [
            "data big table small data row table col data x table y"
        ] * 6
        got = pmi_bigrams(_docs(spark, rows), min_count=5, top_k=50).collect()
        scores = {(r.w1, r.w2): r.pmi for r in got}
        assert ("neural", "network") in scores
        indep = [v for (a, b), v in scores.items() if {a, b} <= {"data", "table"}]
        assert all(scores[("neural", "network")] > v for v in indep)

    def test_min_count_prunes_rare_bigrams(self, spark):
        got = pmi_bigrams(
            _docs(spark, ["one off pair"] * 2), min_count=5, top_k=10
        ).collect()
        assert got == []


class TestBoilerplate:
    FIXTURE = [
        "COOKIE BANNER\nreal content one\nfooter text",
        "COOKIE BANNER\nreal content two\nfooter text",
        "COOKIE BANNER\nfooter text",          # all lines boilerplate
        "totally unique document\nwith two lines",
    ]

    def test_report_counts_distinct_docs(self, spark):
        got = {
            r.line: r.n_docs
            for r in boilerplate_lines(_docs(spark, self.FIXTURE), min_docs=2).collect()
        }
        assert got == {"COOKIE BANNER": 3, "footer text": 3}

    def test_strip_preserves_order_and_resurrects_empty_docs(self, spark):
        got = {
            r.doc_id: (r.clean_text, r.n_lines_removed)
            for r in strip_boilerplate(_docs(spark, self.FIXTURE), min_docs=2).collect()
        }
        assert got[0] == ("real content one", 2)
        assert got[1] == ("real content two", 2)
        assert got[2] == ("", 2)  # every line was boilerplate
        # untouched doc round-trips byte-identical
        assert got[3] == (self.FIXTURE[3], 0)


class TestQualityFilter:
    def test_each_rule_fires_and_clean_doc_keeps(self, spark):
        filler = " ".join(f"w{i}" for i in range(30))
        clean = "the quick brown fox jumps over a lazy dog near the river " + filler
        docs = _docs(
            spark,
            [
                clean,                                    # keeps
                "too short",                              # too_short (+low_stopword)
                "the " + "spam spam " * 30 + "end",       # low_distinct + repetitive
                filler + " tail tokens here",             # low_stopword
            ],
        )
        got = {r.doc_id: r for r in quality_filter(docs).collect()}
        assert got[0].keep and got[0].reasons == ""
        assert "too_short" in got[1].reasons
        assert "low_distinct" in got[2].reasons
        assert "repetitive_bigram" in got[2].reasons
        assert got[3].reasons == "low_stopword"
        # reasons order is the declared rule order
        assert got[2].reasons == "low_distinct;repetitive_bigram"


class TestResample:
    def test_gap_days_zero_filled(self, spark):
        base = dt.datetime(2024, 3, 1, 12, 0)
        ev = spark.createDataFrame(
            [
                Row(user_id=1, ts=base, value=10.0),
                Row(user_id=1, ts=base + dt.timedelta(days=3), value=5.0),
                Row(user_id=1, ts=base + dt.timedelta(days=3, hours=2), value=1.0),
                Row(user_id=2, ts=base, value=2.0),
            ]
        )
        got = {
            (r.user_id, str(r.day)): (r.n_events, r.sum_value)
            for r in resample_daily(ev, value_col="value").collect()
        }
        assert got[(1, "2024-03-01")] == (1, 10.0)
        assert got[(1, "2024-03-02")] == (0, 0.0)
        assert got[(1, "2024-03-03")] == (0, 0.0)
        assert got[(1, "2024-03-04")] == (2, 6.0)
        assert got[(2, "2024-03-01")] == (1, 2.0)
        assert len(got) == 5  # span-bounded: no days outside [min, max]


class TestContainment:
    BIG = " ".join(f"tok{i}" for i in range(40))
    SMALL = " ".join(f"tok{i}" for i in range(10, 20))  # strict subset run

    def test_subset_doc_scores_1_where_jaccard_misses(self, spark):
        docs = _docs(spark, [self.BIG, self.SMALL, "unrelated words only here now"])
        cont = containment_pairs(docs, threshold=0.6).collect()
        assert [(r.d1, r.d2, r.containment) for r in cont] == [(0, 1, 1.0)]
        # the same pair is invisible to symmetric Jaccard at any real threshold
        jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        assert jac == []

    def test_df_cap_with_stop_shingles_matches_uncapped(self, spark):
        # Every doc ends with the same stop phrase (df=4 > cap), but each
        # true pair also shares under-cap shingles — the bound+correct
        # phases must recover the stop-shingle contribution exactly.
        stop = " zz the end marker zz"
        a = " ".join(f"a{i}" for i in range(30))
        b = " ".join(f"a{i}" for i in range(8, 22))  # subset of a
        c = " ".join(f"c{i}" for i in range(30))
        d = " ".join(f"c{i}" for i in range(25)) + " tail x y"
        docs = _docs(spark, [a + stop, b + stop, c + stop, d + stop])
        capped = sorted(
            (r.d1, r.d2, r.containment)
            for r in containment_pairs(docs, threshold=0.5, df_max=3).collect()
        )
        uncapped = sorted(
            (r.d1, r.d2, r.containment)
            for r in containment_pairs(docs, threshold=0.5, df_max=None).collect()
        )
        assert capped == uncapped and len(uncapped) >= 2


class TestFuzzy:
    def test_id_expansion_matches_naive_all_pairs(self, spark):
        from pyspark.sql import Row
        from pyspark.sql import functions as F
        from shopify_etl_spark.operators.fuzzy import fuzzy_pairs

        names = ["red gear", "red bear", "red gears", "blue bolt", "red gear",
                 "blux bolt", "wholly unrelated thing"]
        df = spark.createDataFrame(
            [Row(pid=i, name=n) for i, n in enumerate(names)]
        )
        got = sorted(
            (r.id1, r.id2, r.dist)
            for r in fuzzy_pairs(df, "name", "pid").collect()
        )
        a = df.select(F.col("pid").alias("i1"), F.col("name").alias("n1"))
        b = df.select(F.col("pid").alias("i2"), F.col("name").alias("n2"))
        naive = sorted(
            (r.i1, r.i2, r.d)
            for r in a.join(b, F.col("i1") < F.col("i2"))
            .select("i1", "i2", F.levenshtein("n1", "n2").alias("d"))
            .filter(F.col("d") <= 1)
            .collect()
        )
        assert got == naive and len(naive) >= 4

    def test_match_map_counts(self, spark):
        from pyspark.sql import Row
        from shopify_etl_spark.operators.fuzzy import fuzzy_pairs

        df = spark.createDataFrame(
            [Row(pid=i, name=n) for i, n in enumerate(
                ["dup", "dup", "dup", "dux", "other"])]
        )
        got = {
            (r.name1, r.name2): (r.dist, r.n_id_pairs)
            for r in fuzzy_pairs(df, "name", "pid", expand_ids=False).collect()
        }
        assert got[("dup", "dup")] == (0, 3)   # C(3,2)
        assert got[("dup", "dux")] == (1, 3)   # 3 x 1


class TestWinsorize:
    def test_clips_tails_only(self, spark):
        from shopify_etl_spark.operators.stats import winsorize

        vals = list(range(1, 101))  # 1..100
        df = spark.createDataFrame(
            [Row(eid=i, grp="a", v=float(x)) for i, x in enumerate(vals)]
        )
        got = {r.eid: r for r in winsorize(
            df, value_col="v", group_col="grp", lower=0.05, upper=0.95, id_col="eid"
        ).collect()}
        assert len(got) == 100
        clipped = [r for r in got.values() if r.was_clipped]
        # exact p5/p95 of 1..100 are 5.95 and 95.05: values 1-5 and 96-100 clip
        assert len(clipped) == 10
        lo = min(r.v_winsorized for r in got.values())
        hi = max(r.v_winsorized for r in got.values())
        assert abs(lo - 5.95) < 1e-9 and abs(hi - 95.05) < 1e-9
        untouched = [r for r in got.values() if not r.was_clipped]
        assert all(r.v == r.v_winsorized for r in untouched)


class TestCuration:
    def test_pipeline_order_and_dedup(self, spark):
        from shopify_etl_spark.pipeline.curation import curate_corpus, curation_report

        filler = " ".join(f"w{i}" for i in range(25))
        good = "the quick brown fox jumps over a lazy dog by the river " + filler
        docs = _docs(
            spark,
            [
                "BOILER\n" + good,      # 0: survives (stripped)
                "BOILER\n" + good,      # 1: exact dup of 0 after strip -> dropped
                "BOILER\nshort one",    # 2: all content fails too_short
                good + " extra tail",   # 3: survives, distinct
            ],
        )
        # min_docs=3: "BOILER" (3 docs) strips, but the duplicated content
        # line (2 docs) survives to be handled by the DEDUP stage — at
        # min_docs=2 exact-dup docs would be hollowed out line-wise first
        # (both end states drop the dup; the survivor id differs)
        out = curate_corpus(docs, min_docs=3)
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {0, 3}
        assert rows[0].clean_text == good  # boilerplate gone, dup collapsed to min id
        rep = curation_report(docs, out).collect()[0]
        assert (rep.n_input, rep.n_survivors, rep.n_dropped) == (4, 2, 2)


class TestHistory:
    def test_scd2_compresses_runs_and_flags_current(self, spark):
        from shopify_etl_spark.operators.history import scd2_history

        base = dt.datetime(2024, 1, 1)
        rows = [
            Row(k=1, ts=base + dt.timedelta(hours=h), state=s)
            for h, s in enumerate(["a", "a", "b", "b", "b", "a"])
        ] + [Row(k=2, ts=base, state="x")]
        got = scd2_history(
            spark.createDataFrame(rows), key_col="k", ts_col="ts", attr_col="state"
        ).collect()
        k1 = sorted(
            [(r.state, r.valid_from.hour, r.valid_to.hour if r.valid_to else None,
              r.is_current) for r in got if r.k == 1]
        , key=lambda t: t[1])
        assert k1 == [("a", 0, 2, False), ("b", 2, 5, False), ("a", 5, None, True)]
        k2 = [r for r in got if r.k == 2]
        assert len(k2) == 1 and k2[0].is_current

    def test_merge_rollup_equals_full_recompute(self, spark):
        import random
        from shopify_etl_spark.operators.history import merge_rollup, rollup_state

        rng = random.Random(3)
        rows = [
            Row(g=rng.choice("abc"), v=round(rng.uniform(-50, 50), 2))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows)
        a, b = df.limit(200), df.subtract(df.limit(200))
        # split differently: deterministic split on value sign
        a = df.filter("v < 0")
        b = df.filter("v >= 0")
        merged = {
            r.g: r
            for r in merge_rollup(
                rollup_state(a, ["g"], "v"), rollup_state(b, ["g"], "v"), ["g"]
            ).collect()
        }
        full = {r.g: r for r in rollup_state(df, ["g"], "v").collect()}
        for g in full:
            assert merged[g].n == full[g].n
            assert merged[g].min_v == full[g].min_v
            assert merged[g].max_v == full[g].max_v
            assert abs(merged[g].sum_v - full[g].sum_v) < 1e-9

    def test_merge_rollup_one_sided_groups_pass_through(self, spark):
        from shopify_etl_spark.operators.history import merge_rollup, rollup_state

        a = spark.createDataFrame([Row(g="only_a", v=1.0)])
        b = spark.createDataFrame([Row(g="only_b", v=2.0), Row(g="only_b", v=4.0)])
        got = {r.g: r for r in merge_rollup(
            rollup_state(a, ["g"], "v"), rollup_state(b, ["g"], "v"), ["g"]
        ).collect()}
        assert got["only_a"].n == 1 and got["only_a"].sum_v == 1.0
        assert got["only_b"].n == 2 and got["only_b"].min_v == 2.0 and got["only_b"].max_v == 4.0


class TestBM25OpenVocab:
    def test_index_matches_hand_bm25(self, spark):
        """Two tiny docs, one shared and one exclusive term: posting
        weights equal the hand-applied Lucene BM25 formula."""
        import math

        from shopify_etl_spark.operators.search import bm25_index

        docs = _docs(spark, ["a a b", "a c"])
        got = {
            (r.token, r.doc_id): r
            for r in bm25_index(docs).collect()
        }
        assert set(got) == {("a", 0), ("a", 1), ("b", 0), ("c", 1)}
        n_docs, avgdl = 2, 2.5

        def w(tf, dft, dl):
            idf = math.log((n_docs - dft + 0.5) / (dft + 0.5) + 1.0)
            return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)

        assert got[("a", 0)].bm25_w == pytest.approx(w(2, 2, 3))
        assert got[("b", 0)].bm25_w == pytest.approx(w(1, 1, 3))
        assert got[("c", 1)].bm25_w == pytest.approx(w(1, 1, 2))
        assert got[("a", 0)].dft == 2 and got[("b", 0)].dft == 1

    def test_champions_keep_best_docs_per_term(self, spark):
        from shopify_etl_spark.operators.search import bm25_champions

        docs = _docs(
            spark,
            ["x x x", "x x filler words here", "x plus other content data", "y only"],
        )
        got = bm25_champions(docs, top_terms=1, per_term=2).collect()
        # 'x' is the top term by frequency; its champions are the two
        # highest-weight docs (short, term-dense doc 0 first)
        assert {r.token for r in got} == {"x"}
        ranked = sorted(got, key=lambda r: r.rank)
        assert [r.doc_id for r in ranked] == [0, 1]
        assert ranked[0].bm25_w >= ranked[1].bm25_w


class TestCMSHeavyHitters:
    def test_sample_candidates_and_estimates_bound_truth(self, spark):
        from shopify_etl_spark.operators.sketches import cms_heavy_hitters

        rows = []
        # key 'hot' everywhere, 'warm' on even ids, singletons elsewhere
        for i in range(40):
            rows.append(Row(doc_id=i, token="hot"))
            rows.append(Row(doc_id=i, token="warm" if i % 2 == 0 else f"cold{i}"))
        df = spark.createDataFrame(rows)
        got = {
            r.token: r
            for r in cms_heavy_hitters(
                df, "token", F.pmod(F.col("doc_id"), F.lit(10)) == 0,
                n_candidates=3, width=64, depth=3,
            ).collect()
        }
        # candidates come from the 1-in-10 sample; heavy keys dominate it
        assert "hot" in got and "warm" in got
        assert got["hot"].sample_n == 4 and got["warm"].sample_n == 4
        # CMS lower bound: estimate >= full-stream truth, always
        assert got["hot"].cms_count >= 40
        assert got["warm"].cms_count >= 20


class TestHardNegativePairs:
    def test_pairs_come_from_shared_champion_terms_with_cosine(self, spark):
        """Planted case: docs 0,1 dominate the top term 'x' champion list
        but have opposite embeddings (cosine -1); doc pairs never sharing
        a champion term emit nothing."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.search import hard_negative_pairs

        docs = _docs(
            spark,
            ["x x x x", "x x x other", "y y y y completely apart"],
        )
        emb = spark.createDataFrame([
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[-1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
        ])
        got = hard_negative_pairs(docs, emb, top_terms=1, per_term=2).collect()
        # top term is 'x' (freq 7 > y's 4); its champions are docs 0,1
        assert [(r.d1, r.d2, r.n_shared_terms) for r in got] == [(0, 1, 1)]
        assert got[0].cosine_sim == -1.0  # lexically twins, semantically opposite


class TestHybridRetrieval:
    def test_sparse_shingle_topk_planted_duplicate(self, spark):
        """A corpus doc that shares every shingle with query doc 0 must
        rank first for it with jaccard 1.0; an unrelated doc never
        appears; self-matches are excluded."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.search import sparse_shingle_topk

        base = "alpha beta gamma delta epsilon zeta"
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text=base),
                Row(doc_id=10, text=base),                       # exact dup
                Row(doc_id=11, text="alpha beta gamma other words here"),
                Row(doc_id=12, text="totally unrelated text tokens only"),
            ]
        )
        got = sparse_shingle_topk(docs, n_queries=1, k=10).collect()
        assert all(r.query_id == 0 and r.neighbor_id != 0 for r in got)
        by_n = {r.neighbor_id: r.jaccard for r in got}
        assert by_n[10] == 1.0
        assert 0 < by_n[11] < 1.0
        assert 12 not in by_n
        # rank: dup first
        top = max(got, key=lambda r: (r.jaccard, -r.neighbor_id))
        assert top.neighbor_id == 10

    def test_hybrid_rrf_hand_computed(self, spark):
        """Planted geometry: neighbor A is rank-1 in BOTH rankers ->
        rrf = 2/61; neighbor B dense-only rank 2 -> 1/62; fusion order
        and sentinel-0 ranks verified by hand."""
        import math

        from pyspark.sql import Row
        from shopify_etl_spark.operators.search import hybrid_rrf_topk

        # texts: doc 1 shares trigrams with query doc 0; doc 2 does not
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="one two three four five"),
                Row(doc_id=1, text="one two three four five"),
                Row(doc_id=2, text="unrelated words entirely different here"),
            ]
        )
        # embeddings: vec 1 parallel to query 0 (cos 1), vec 2 orthogonal-ish
        emb = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[1.0, 0.0]),
                Row(vec_id=1, embedding=[2.0, 0.0]),
                Row(vec_id=2, embedding=[0.0, 3.0]),
            ]
        )
        got = {r.neighbor_id: r for r in
               hybrid_rrf_topk(docs, emb, n_queries=1, k=2).collect()}
        a = got[1]
        assert (a.rank_dense, a.rank_sparse) == (1, 1)
        assert math.isclose(a.rrf_score, round(2 / 61, 6), abs_tol=1e-9)
        b = got[2]
        assert (b.rank_dense, b.rank_sparse) == (2, 0)  # dense-only
        assert math.isclose(b.rrf_score, round(1 / 62, 6), abs_tol=1e-9)
        assert a.rrf_score > b.rrf_score


class TestBpeTrainApply:
    def test_bpe_train_classic_corpus(self, spark):
        """The textbook low/lower/newest/widest corpus: merges follow the
        max-count (lexicographic tie-break) schedule; first merge equals
        bpe_merge_pair_counts' top pair."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.text import bpe_merge_pair_counts, bpe_train

        docs = spark.createDataFrame(
            [Row(doc_id=1,
                 text=" ".join(["low"] * 5 + ["lower"] * 2
                               + ["newest"] * 6 + ["widest"] * 3))]
        )
        merges = bpe_train(docs, n_merges=4)
        # 'es' appears in newest+widest (9) > 'lo' (7); then 'es'+'t' (9)
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        top = bpe_merge_pair_counts(docs, top_k=1).collect()[0]
        assert top.pair == "|".join(merges[0])

    def test_bpe_apply_matches_reference_encoder(self, spark):
        """Distributed segmentation == a pure-Python greedy reference on
        every doc (rank order decides, not position order)."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.text import (
            BPE_PRETOKEN_PATTERN,
            bpe_apply,
            bpe_train,
        )
        import re

        texts = {
            1: "low lower lowest newest news",
            2: "the newest low is lower than the widest",
            3: "zz z zz",
        }
        docs = spark.createDataFrame(
            [Row(doc_id=k, text=v) for k, v in texts.items()]
        )
        merges = bpe_train(docs, n_merges=8)
        ranks = {p: r for r, p in enumerate(merges)}

        def ref(word):
            syms = list(word)
            while len(syms) > 1:
                cands = [(ranks[(a, b)], i) for i, (a, b) in
                         enumerate(zip(syms, syms[1:])) if (a, b) in ranks]
                if not cands:
                    break
                _, i = min(cands)
                syms[i:i + 2] = [syms[i] + syms[i + 1]]
            return syms

        got = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
        pat = re.compile(BPE_PRETOKEN_PATTERN)
        for did, txt in texts.items():
            want = [s for w in pat.findall(txt) for s in ref(w)]
            assert list(got[did].bpe_tokens) == want
            assert got[did].n_bpe_tokens == len(want)

    def test_bpe_apply_zero_merges_is_chars(self, spark):
        from pyspark.sql import Row
        from shopify_etl_spark.operators.text import bpe_apply

        docs = spark.createDataFrame([Row(doc_id=1, text="ab cd")])
        (r,) = bpe_apply(docs, []).collect()
        assert list(r.bpe_tokens) == ["a", "b", " ", "c", "d"]


def test_bpe_apply_honors_custom_id_column(spark):
    """The output id column keeps the caller's NAME and TYPE — a string
    order_id must survive (the old hardcoded doc_id/int64 schema broke
    downstream joins and crashed the Arrow worker on string ids)."""
    from shopify_etl_spark.operators.text import bpe_apply

    df = spark.createDataFrame(
        [("ord-1", "aa ab"), ("ord-2", "bb")],
        "order_id string, body string",
    )
    out = bpe_apply(df, [("a", "a")], text_col="body", id_col="order_id")
    assert out.columns[0] == "order_id"
    rows = {r["order_id"]: r for r in out.collect()}
    # pretokens: "aa", " ", "ab"; only the (a,a) merge applies
    assert rows["ord-1"]["bpe_tokens"] == ["aa", " ", "a", "b"]
    assert rows["ord-2"]["n_bpe_tokens"] == 2


class TestBpeTrainBound:
    def test_bpe_train_driver_fold_is_capped(self, spark):
        """The pretoken collect is hard-bounded by max_pretokens (VERDICT
        r8 #6): a wide-vocab corpus must only ship the top-K most frequent
        pretokens driver-side, and the learned merges must come from that
        head — identical to training on the head alone."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.text import bpe_train

        # 500 singleton letter-only pretokens of tail noise + a
        # high-frequency head (digits would pretokenize into their own
        # high-count pieces under the GPT-style pattern)
        head = " ".join(["low"] * 50 + ["lowest"] * 40)
        tail = " ".join(
            "".join(chr(97 + int(d)) for d in str(i)) + "qz"
            for i in range(500)
        )
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=head), Row(doc_id=2, text=tail)]
        )
        head_only = spark.createDataFrame([Row(doc_id=1, text=head)])
        capped = bpe_train(docs, n_merges=4, max_pretokens=2)
        assert capped == bpe_train(head_only, n_merges=4, max_pretokens=2)

    def test_bpe_train_cap_deterministic_on_count_ties(self, spark):
        """Tied counts at the cap boundary break lexicographically, so the
        collected head (and thus the merges) is stable across layouts."""
        from pyspark.sql import Row
        from shopify_etl_spark.operators.text import bpe_train

        docs = spark.createDataFrame(
            [Row(doc_id=1, text="bb aa cc dd bb aa cc dd")]
        ).repartition(8)
        # leading 'bb' has no space, so the count-2 tie is
        # {' aa', ' cc', ' dd'} and the lexicographic cap keeps exactly
        # those; merges then go (' ','a'), (' ','c') deterministically
        a = bpe_train(docs, n_merges=2, max_pretokens=3)
        b = bpe_train(docs, n_merges=2, max_pretokens=3)
        assert a == b == [(" ", "a"), (" ", "c")]
