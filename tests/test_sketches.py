"""HLL sketch pre-aggregation: rollup commutes with sketching; exact
in the sparse regime."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import sketches
from shopify_etl_spark.plans.catalog import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start"),
    )


def test_rollup_commutes_with_sketching(spark, sf_dir):
    """union(daily sketches) must estimate identically to sketching the
    week directly — the property that makes persisted sketch tables
    answer arbitrary rollups without raw-data access."""
    ev = _events(spark, sf_dir)
    daily = sketches.distinct_sketches(ev, "user_id", ["week_start", "day"])
    via_daily = {
        r.week_start: r.distinct_keys
        for r in sketches.rollup_distinct(daily, ["week_start"]).collect()
    }
    direct = {
        r.week_start: r.distinct_keys
        for r in sketches.rollup_distinct(
            sketches.distinct_sketches(ev, "user_id", ["week_start"]), ["week_start"]
        ).collect()
    }
    assert via_daily == direct


def test_sketch_exact_in_sparse_regime(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact = {
        r.week_start: r.n
        for r in ev.groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r.week_start: int(r.distinct_keys)
        for r in sketches.rollup_distinct(
            sketches.distinct_sketches(ev, "user_id", ["week_start", "day"]),
            ["week_start"],
        ).collect()
    }
    assert got == exact

    # global rollup (no group): one number, still exact here
    total = sketches.rollup_distinct(
        sketches.distinct_sketches(ev, "user_id", ["day"]), []
    ).collect()[0].distinct_keys
    assert int(total) == ev.select("user_id").distinct().count()


def test_cms_merge_commutes_and_bounds(spark):
    """CMS invariants: (1) cellwise merge of per-source sketches is
    IDENTICAL to sketching the whole corpus (associativity — the property
    that makes per-shard build + union work at scale); (2) estimates never
    undercount; (3) absent keys probe to 0."""
    from shopify_etl_spark.operators import sketches

    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", f"k{i % 7}") for i in range(500)],
        ["i", "src", "key"],
    )
    whole = sketches.cms_build(df, "key", width=64, depth=3)
    parts = [
        sketches.cms_build(df.filter(F.col("src") == s), "key", width=64, depth=3)
        for s in ("even", "odd")
    ]
    merged = sketches.cms_merge(*parts)
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    keys = df.select("key").distinct()
    est = {r.key: r.cms_count for r in
           sketches.cms_query(merged, keys, "key", width=64, depth=3).collect()}
    exact = {r.key: r.n for r in
             df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)  # lower bound holds ALWAYS

    ghost = spark.createDataFrame([("never-seen",)], ["key"])
    [(row)] = sketches.cms_query(whole, ghost, "key", width=64, depth=3).collect()
    # tiny width=64 grid may collide with real keys, but a fresh key in an
    # EMPTY sketch must be exactly 0
    empty = sketches.cms_build(df.filter(F.lit(False)), "key", width=64, depth=3)
    [(row0)] = sketches.cms_query(empty, ghost, "key", width=64, depth=3).collect()
    assert row0.cms_count == 0


def test_cms_weighted_counts(spark):
    from shopify_etl_spark.operators import sketches

    df = spark.createDataFrame([("a", 3), ("a", 2), ("b", 10)], ["key", "w"])
    sk = sketches.cms_build(df, "key", weight_col="w", width=128, depth=4)
    est = {r.key: r.cms_count for r in
           sketches.cms_query(sk, df.select("key"), "key", width=128, depth=4).collect()}
    assert est["a"] >= 5 and est["b"] >= 10


def test_cms_lower_bound_property(spark):
    """Property sweep without per-example Spark jobs: many random
    multisets, one parallelized check — CMS estimates NEVER undercount,
    for any key distribution, at any (width, depth)."""
    import random

    from shopify_etl_spark.operators import sketches

    rng = random.Random(1234)
    for trial in range(5):
        width = rng.choice([16, 64, 256])
        depth = rng.choice([2, 3, 5])
        n_keys = rng.randint(1, 40)
        rows = [(f"key-{rng.randint(0, n_keys)}",) for _ in range(rng.randint(1, 800))]
        df = spark.createDataFrame(rows, ["key"])
        sk = sketches.cms_build(df, "key", width=width, depth=depth)
        joined = (
            sketches.cms_query(sk, df.select("key"), "key", width=width, depth=depth)
            .join(df.groupBy("key").agg(F.count(F.lit(1)).alias("n")), "key")
        )
        bad = joined.filter(F.col("cms_count") < F.col("n")).collect()
        assert not bad, (trial, width, depth, bad)


class TestCmsInnerProduct:
    def test_exact_on_collision_free_grid(self, spark):
        from shopify_etl_spark.operators import sketches

        a = spark.createDataFrame([("u1",)] * 3 + [("u2",)] * 2, ["k"])
        b = spark.createDataFrame([("u1",)] * 4 + [("u3",)] * 5, ["k"])
        sa = sketches.cms_build(a, "k", width=2048, depth=4)
        sb = sketches.cms_build(b, "k", width=2048, depth=4)
        est = sketches.cms_inner_product(sa, sb).collect()[0]["join_size_est"]
        # true join size = 3*4 (only u1 overlaps); wide grid -> collision-free
        assert est == 12

    def test_lower_bound_holds_on_collision_heavy_grid(self, spark):
        from shopify_etl_spark.operators import sketches

        rows = [(f"k{i}",) for i in range(60) for _ in range(i % 4 + 1)]
        a = spark.createDataFrame(rows, ["k"])
        b = spark.createDataFrame(rows[::2], ["k"])
        true = (
            a.groupBy("k").count().withColumnRenamed("count", "na")
            .join(b.groupBy("k").count().withColumnRenamed("count", "nb"), "k")
            .selectExpr("sum(na * nb) v").collect()[0]["v"]
        )
        # width 8 forces heavy collisions: estimate must still never undercount
        sa = sketches.cms_build(a, "k", width=8, depth=3)
        sb = sketches.cms_build(b, "k", width=8, depth=3)
        est = sketches.cms_inner_product(sa, sb).collect()[0]["join_size_est"]
        assert est >= true

    def test_disjoint_sides_estimate_small_and_empty_side_zero(self, spark):
        from shopify_etl_spark.operators import sketches

        a = spark.createDataFrame([("a1",), ("a2",)], ["k"])
        b = spark.createDataFrame([("b1",), ("b2",)], ["k"])
        sa = sketches.cms_build(a, "k", width=2048, depth=4)
        sb = sketches.cms_build(b, "k", width=2048, depth=4)
        est = sketches.cms_inner_product(sa, sb).collect()[0]["join_size_est"]
        assert est == 0  # wide grid: disjoint keys share no cells
        empty = sketches.cms_build(
            spark.createDataFrame([], "k string"), "k", width=2048, depth=4
        )
        assert (
            sketches.cms_inner_product(sa, empty).collect()[0]["join_size_est"] == 0
        )

    def test_merge_then_estimate_equals_whole(self, spark):
        from shopify_etl_spark.operators import sketches

        a1 = spark.createDataFrame([("x",)] * 2 + [("y",)], ["k"])
        a2 = spark.createDataFrame([("x",)] * 3, ["k"])
        b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 4, ["k"])
        whole = sketches.cms_build(a1.unionAll(a2), "k", width=256, depth=4)
        merged = sketches.cms_merge(
            sketches.cms_build(a1, "k", width=256, depth=4),
            sketches.cms_build(a2, "k", width=256, depth=4),
        )
        sb = sketches.cms_build(b, "k", width=256, depth=4)
        e1 = sketches.cms_inner_product(whole, sb).collect()[0]["join_size_est"]
        e2 = sketches.cms_inner_product(merged, sb).collect()[0]["join_size_est"]
        assert e1 == e2


class TestHllOverlap:
    def test_overlap_estimate_near_truth(self, spark):
        from shopify_etl_spark.operators import sketches

        a = spark.createDataFrame([(f"u{i}",) for i in range(200)], ["k"])
        b = spark.createDataFrame([(f"u{i}",) for i in range(150, 400)], ["k"])
        r = sketches.hll_overlap(a, b, "k").collect()[0]
        # true overlap = u150..u199 = 50; sparse regime -> near-exact
        assert abs(r["est_overlap"] - 50) <= 5
        assert abs(r["est_a"] - 200) <= 5 and abs(r["est_b"] - 250) <= 6

    def test_disjoint_overlap_near_zero(self, spark):
        from shopify_etl_spark.operators import sketches

        a = spark.createDataFrame([(f"a{i}",) for i in range(100)], ["k"])
        b = spark.createDataFrame([(f"b{i}",) for i in range(100)], ["k"])
        r = sketches.hll_overlap(a, b, "k").collect()[0]
        assert abs(r["est_overlap"]) <= 5


class TestBloom:
    def test_no_false_negatives_and_definitive_false(self, spark):
        from shopify_etl_spark.operators import sketches

        keys = spark.createDataFrame(
            [(f"key-{i}",) for i in range(200)], ["f"]
        )
        bloom = sketches.bloom_build(keys, "f", m=1024, k=3)
        assert bloom.count() <= 1024  # fixed-size no matter the input
        # every built key must answer TRUE (the Bloom guarantee)
        hits = sketches.bloom_probe(bloom, keys, "f", m=1024, k=3).collect()
        assert all(r.might_contain for r in hits) and len(hits) == 200
        # fresh keys: FALSE answers are definitive non-members; at this
        # load factor most of them must come back FALSE
        fresh = spark.createDataFrame(
            [(f"other-{i}",) for i in range(200)], ["f"]
        )
        out = sketches.bloom_probe(bloom, fresh, "f", m=1024, k=3).collect()
        n_false = sum(1 for r in out if not r.might_contain)
        assert n_false >= 150  # fpr bound is ~ (k*n/m)^k << 25%

    def test_mergeable_union_is_filter_of_union(self, spark):
        from shopify_etl_spark.operators import sketches

        a = spark.createDataFrame([(f"a-{i}",) for i in range(50)], ["f"])
        b = spark.createDataFrame([(f"b-{i}",) for i in range(50)], ["f"])
        merged = (
            sketches.bloom_build(a, "f").unionByName(sketches.bloom_build(b, "f"))
            .distinct()
        )
        whole = sketches.bloom_build(a.unionByName(b), "f")
        assert sorted(r.pos for r in merged.collect()) == sorted(
            r.pos for r in whole.collect()
        )
