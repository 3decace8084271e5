"""Shard packing tests: budget rollover, straddle rule, group isolation."""

from shopify_etl_spark.operators import packing


def test_pack_shards_hand_computed(spark):
    # source A: docs of 4, 3, 5, 2 tokens; budget 6.
    # cum_before: 0, 4, 7, 12 -> shards 0, 0, 1, 2
    df = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (2, "a b c", "A"),
            (3, "a b c d e", "A"),
            (4, "a b", "A"),
            (10, "x y z w v u t", "B"),  # other group restarts at shard 0
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        r.doc_id: (r.shard_id, r.n_tokens)
        for r in packing.pack_shards(df, budget=6).collect()
    }
    assert got == {1: (0, 4), 2: (0, 3), 3: (1, 5), 4: (2, 2), 10: (0, 7)}


def test_pack_shards_deterministic(spark, sf_dir):
    from shopify_etl_spark.plans.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, packing.pack_shards(docs, budget=1000).collect()))
    b = sorted(map(tuple, packing.pack_shards(docs, budget=1000).collect()))
    assert a == b
