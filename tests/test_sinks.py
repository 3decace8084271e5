"""Sink tests: envelope round-trip, JSONL round-trip, bucketed joins."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import sinks
from shopify_etl_spark.sources import read_envelope, read_jsonl

from tests.shopify_fixtures import make_fixture_set


def test_envelope_round_trip(spark, tmp_path):
    paths = make_fixture_set(tmp_path / "raw")
    nodes = read_envelope(spark, str(paths["retail_orders"]), "orders")
    out = sinks.write_json_envelope(nodes, str(tmp_path / "out.json"), "retail", "orders")
    back = read_envelope(spark, out, "orders")
    orig = sorted(r.node.id for r in nodes.select("node").collect())
    rt = sorted(r.node.id for r in back.select("node").collect())
    assert rt == orig
    assert back.count() == 40


def test_jsonl_round_trip(spark, tmp_path):
    paths = make_fixture_set(tmp_path / "raw")
    nodes = read_envelope(spark, str(paths["retail_customers"]), "customers")
    sinks.write_jsonl(nodes, str(tmp_path / "out_jsonl"))
    back = read_jsonl(spark, str(tmp_path / "out_jsonl"), "customers")
    assert back.count() == 30
    assert sorted(r.node.id for r in back.collect()) == sorted(
        r.node.id for r in nodes.collect()
    )


def test_bucketed_join_exchange_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast path
    try:
        orders = spark.range(0, 1000).select(
            F.col("id").alias("order_id"), (F.col("id") % 7).alias("status")
        )
        items = spark.range(0, 5000).select(
            (F.col("id") % 1000).alias("order_id"), F.col("id").alias("item_id")
        )
        sinks.save_bucketed(orders, "b_orders", "order_id", n_buckets=8)
        sinks.save_bucketed(items, "b_items", "order_id", n_buckets=8)
        assert sinks.bucketed_join_is_exchange_free(spark, "b_orders", "b_items", "order_id")
        joined = spark.table("b_orders").join(spark.table("b_items"), "order_id")
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    import json as _json

    from tests.shopify_fixtures import gen_order
    import random

    rng = random.Random(3)
    good = [_json.dumps(gen_order(rng, i)) for i in range(5)]
    bad = ['{"id": "gid://shopify/Order/99", "name": ', "not json at all"]
    src = tmp_path / "mixed.jsonl"
    src.write_text("\n".join(good[:3] + [bad[0]] + good[3:] + [bad[1]]))

    df = read_jsonl(spark, str(src), "orders", keep_corrupt=True)
    ok = df.filter("_corrupt_record IS NULL")
    quarantined = df.filter("_corrupt_record IS NOT NULL")
    assert ok.count() == 5
    assert quarantined.count() == 2
    # quarantined rows carry the raw offending text for the report
    texts = [r._corrupt_record for r in quarantined.collect()]
    assert "not json at all" in texts
    # default (strict parity) path still nulls silently, like the reference
    silent = read_jsonl(spark, str(src), "orders")
    assert silent.count() == 7
