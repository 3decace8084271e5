"""Structured Streaming tests: AvailableNow micro-batch upsert with
checkpointed exactly-once-ish semantics, windowed aggregation."""

import json
import random

import pytest

from shopify_etl_spark.streaming import stream_upsert_orders, windowed_order_counts

from tests.shopify_fixtures import gen_order


def _write_jsonl(path, orders):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(o) for o in orders))


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": tmp_path / "landing",
        "target": str(tmp_path / "fact_orders"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_stream_upsert_two_batches(spark, dirs):
    rng = random.Random(7)
    batch1 = [gen_order(rng, i) for i in range(20)]
    _write_jsonl(dirs["src"] / "b1.jsonl", batch1)
    q = stream_upsert_orders(spark, str(dirs["src"]), dirs["target"], dirs["ckpt"])
    q.awaitTermination(120)
    out1 = spark.read.parquet(dirs["target"])
    assert out1.count() == 20

    # batch 2: 5 updates (newer updatedAt) + 5 new orders
    updates = [gen_order(rng, i, updated_day=28) for i in range(5)]
    news = [gen_order(rng, 100 + i) for i in range(5)]
    _write_jsonl(dirs["src"] / "b2.jsonl", updates + news)
    q2 = stream_upsert_orders(spark, str(dirs["src"]), dirs["target"], dirs["ckpt"])
    q2.awaitTermination(120)

    out2 = spark.read.parquet(dirs["target"])
    assert out2.count() == 25  # 20 + 5 new, updates absorbed
    assert out2.groupBy("order_id").count().filter("count>1").count() == 0
    upd = out2.filter("order_id = 'R-0'").collect()[0]
    assert upd.updated_at.day == 28

    # restart with the same checkpoint and no new files → no-op, same table
    q3 = stream_upsert_orders(spark, str(dirs["src"]), dirs["target"], dirs["ckpt"])
    q3.awaitTermination(120)
    assert spark.read.parquet(dirs["target"]).count() == 25


def test_windowed_counts(spark, dirs, tmp_path):
    rng = random.Random(11)
    orders = [gen_order(rng, i, updated_day=(i % 3) + 1) for i in range(30)]
    _write_jsonl(dirs["src"] / "w.jsonl", orders)
    agg = windowed_order_counts(spark, str(dirs["src"]))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts ORDER BY day_start").collect()
    assert sum(r.n_orders for r in rows) == 30
    assert len(rows) == 3  # days 1..3


def test_stream_dedup_docs(spark, dirs, tmp_path):
    """Duplicate fingerprints within the watermark window pass exactly
    once, across micro-batches and query restarts (checkpointed state)."""
    from shopify_etl_spark.streaming import stream_dedup_docs

    src = tmp_path / "docfeed"
    ckpt = str(tmp_path / "dedup_ckpt")
    out = str(tmp_path / "deduped")

    def run_batch(name, rows):
        _write_jsonl(src / name, rows)
        q = (
            stream_dedup_docs(spark, str(src), watermark_delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = "2024-05-01T10:{m:02d}:00.000Z"
    run_batch("b1.jsonl", [
        {"doc_id": 1, "text": "alpha beta gamma", "ingested_at": t.format(m=0)},
        {"doc_id": 2, "text": "Alpha  beta GAMMA", "ingested_at": t.format(m=1)},  # same after normalization
        {"doc_id": 3, "text": "something else", "ingested_at": t.format(m=2)},
    ])
    got1 = spark.read.parquet(out)
    assert got1.count() == 2  # doc 2 deduped against doc 1

    # a later batch re-sends the same text and adds a new one; state from
    # the checkpoint still suppresses the dup
    run_batch("b2.jsonl", [
        {"doc_id": 4, "text": "alpha beta gamma", "ingested_at": t.format(m=5)},
        {"doc_id": 5, "text": "brand new text", "ingested_at": t.format(m=6)},
    ])
    got2 = spark.read.parquet(out)
    assert got2.count() == 3
    assert sorted(r.doc_id for r in got2.collect()) in ([1, 3, 5], [2, 3, 5])
