"""Deterministic sampling/splitting tests: reproducibility, growth
stability, and proportion sanity."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import sampling
from shopify_etl_spark.plans.catalog import load_table


def test_hash_split_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w).collect()}
    b = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w).collect()}
    assert a == b  # bit-reproducible
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()  # every row assigned
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.6 < frac_train < 0.95  # 500 docs: loose binomial bound


def test_hash_split_growth_stable(spark, sf_dir):
    """A doc's split must not change when the corpus shrinks/grows —
    the property rand()-based splitting lacks."""
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w).collect()}
    sub = {
        r.doc_id: r.split
        for r in sampling.hash_split(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id", w
        ).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_hash_split_salt_changes_assignment(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.5, "test": 0.5}
    a = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w, salt="s1").collect()}
    b = {r.doc_id: r.split for r in sampling.hash_split(docs, "doc_id", w, salt="s2").collect()}
    assert a != b  # different salt reshuffles


def test_stratified_sample_subset_and_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fr = {"src0": 1.0, "src1": 0.5}
    out = sampling.stratified_sample(docs, "source", fr, default_frac=0.0)
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    assert ids <= {r.doc_id for r in docs.collect()}
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    n0 = docs.filter(F.col("source") == "src0").count()
    assert by_src["src0"] == n0  # frac 1.0 keeps everything ('g' threshold)
    assert 0 < by_src.get("src1", 0) < docs.filter(F.col("source") == "src1").count()
    assert set(by_src) == {"src0", "src1"}  # default 0.0 drops the rest


def test_threshold_hex_bounds():
    assert sampling._threshold(0.0) == "00000000"
    assert sampling._threshold(1.0) == "g"
    assert sampling._threshold(0.5) == "80000000"
    # every md5 hex prefix sorts below the frac>=1 sentinel
    assert "ffffffff" < "g"


def test_epoch_mix_repetition_and_determinism(spark):
    from pyspark.sql import Row
    from shopify_etl_spark.operators.sampling import epoch_mix

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="books" if i < 50 else "web") for i in range(100)]
    )
    mixed = epoch_mix(docs, {"books": 2.5, "web": 0.5}, group_col="source")
    rows = mixed.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    # books docs appear 2 or 3 times, web docs 0 or 1; copy_idx is 1..n
    for doc, idxs in per_doc.items():
        n = len(idxs)
        assert sorted(idxs) == list(range(1, n + 1))
        assert n in ((2, 3) if doc < 50 else (1,))
    n_books = sum(len(v) for d, v in per_doc.items() if d < 50)
    assert 100 <= n_books <= 150  # 50 docs x [2,3]
    # deterministic: second run identical
    again = epoch_mix(docs, {"books": 2.5, "web": 0.5}, group_col="source").collect()
    assert sorted((r.doc_id, r.copy_idx) for r in again) == sorted(
        (r.doc_id, r.copy_idx) for r in rows
    )
    # unknown groups are dropped
    assert epoch_mix(docs, {"books": 1.0}).filter("source = 'web'").count() == 0


def test_weighted_sample_deterministic_biased_and_bounded_plan(spark):
    from shopify_etl_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")

    s1 = {r.doc_id for r in weighted_sample(df, "w", 100, seed=7).collect()}
    s2 = {r.doc_id for r in weighted_sample(df, "w", 100, seed=7).collect()}
    s3 = {r.doc_id for r in weighted_sample(df, "w", 100, seed=8).collect()}
    assert s1 == s2 and len(s1) == 100   # pure function of (ids, weights, seed)
    assert s1 != s3                      # seed actually matters

    # 10x-weighted half should dominate the sample (expected ~90/100)
    heavy = sum(1 for d in s1 if d < 500)
    assert heavy >= 70

    # zero/negative weights are excluded outright
    z = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "doc_id: long, w: double")
    assert [r.doc_id for r in weighted_sample(z, "w", 10).collect()] == [3]

    # top-k is TakeOrdered, not a global sort
    plan = weighted_sample(df, "w", 100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Near-duplicate docs (one cluster) must land in the SAME split for
    any salt — the property a per-doc split violates."""
    from pyspark.sql import Row
    from shopify_etl_spark.plans.catalog_ext2 import leakage_safe_split as q  # noqa: F401
    from shopify_etl_spark.operators import dedup, sampling

    base = "w" + " w".join(str(i) for i in range(30))  # 30 distinct tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=100, text=base),
            Row(doc_id=205, text=base + " tail"),   # near-dup of 100
            Row(doc_id=300, text="entirely different words " * 6),
        ]
    )
    clusters = dedup.duplicate_clusters(
        dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    ).withColumnRenamed("doc", "doc_id")
    keyed = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS group_key")
    )
    got = {
        r.doc_id: r
        for r in sampling.hash_split(
            keyed, "group_key", {"train": 0.5, "val": 0.25, "test": 0.25},
            salt="leakfree-v1",
        ).collect()
    }
    assert got[100].group_key == got[205].group_key == 100
    assert got[100].split == got[205].split  # never straddles the boundary
    assert got[300].group_key == 300


class TestCappedPerKey:
    def test_cap_and_partitioning_invariance(self, spark):
        """capped_per_key keeps exactly the first `cap` rows per key by
        order (the global answer), regardless of how the input is
        partitioned — the two-phase prune is lossless."""
        from shopify_etl_spark.operators.sampling import capped_per_key

        rows = [(f"k{i % 3}", i) for i in range(60)]
        want = {}
        for k, i in sorted(rows, key=lambda t: t[1]):
            want.setdefault(k, [])
            if len(want[k]) < 5:
                want[k].append(i)
        for nparts in (1, 7, 32):
            df = spark.createDataFrame(
                rows, "host string, doc_id long"
            ).repartition(nparts)
            got = {}
            for r in sorted(
                capped_per_key(df, "host", "doc_id", cap=5).collect(),
                key=lambda r: r.doc_id,
            ):
                got.setdefault(r.host, []).append(r.doc_id)
            assert got == want, nparts

    def test_keep_rank(self, spark):
        from shopify_etl_spark.operators.sampling import capped_per_key

        df = spark.createDataFrame(
            [("a", 10), ("a", 3), ("a", 7)], "host string, doc_id long"
        )
        got = sorted(
            capped_per_key(df, "host", "doc_id", 2, keep_rank=True)
            .collect(),
            key=lambda r: r._rank,
        )
        assert [(r.doc_id, r._rank) for r in got] == [(3, 1), (7, 2)]
