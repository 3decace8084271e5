"""Custom Shopify DataSource tests: registration, partitioned scan,
filter pushdown into the source query, rate limiting, flattener compat."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from shopify_etl_spark.operators import flatten
from shopify_etl_spark.schemas import NODE_SCHEMAS
from shopify_etl_spark.sources.shopify_api import (
    ShopifyDataSource,
    ShopifyReader,
    build_graphql_query,
)

from tests.shopify_fixtures import make_fixture_set


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    return make_fixture_set(tmp_path_factory.mktemp("shopify_ds"))


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ShopifyDataSource)
    return spark


def _read(spark, path, entity="orders", **opts):
    r = spark.read.format("shopify").option("entity", entity).option("path", str(path))
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_full_scan_matches_envelope(registered, fixture_paths):
    df = _read(registered, fixture_paths["retail_orders"], page_size=7, num_partitions=3)
    assert df.schema == NODE_SCHEMAS["orders"]
    assert df.count() == 40
    assert df.rdd.getNumPartitions() == 3  # partitioned scan (S1)


def test_filter_pushdown_updated_at(registered, fixture_paths):
    df = _read(registered, fixture_paths["retail_orders"])
    filtered = df.filter(F.col("updatedAt") > "2025-11-20")
    rows = filtered.collect()
    assert 0 < len(rows) < 40
    assert all(r.updatedAt > "2025-11-20" for r in rows)


def test_push_filters_unit():
    reader = ShopifyReader({"entity": "orders", "path": "x"}, NODE_SCHEMAS["orders"])
    gt = GreaterThan(("updatedAt",), "2025-11-20")
    other = EqualTo(("name",), "#1001")
    remaining = list(reader.pushFilters([gt, other]))
    assert reader.updated_at_min == "2025-11-20"
    assert remaining == [other]  # non-pushable filter stays in Spark
    # tightest bound wins
    reader.pushFilters([GreaterThan(("updatedAt",), "2025-11-10")])
    assert reader.updated_at_min == "2025-11-20"


def test_graphql_query_builder_s2():
    q = build_graphql_query("orders", 100, "2025-11-20T00:00:00Z")
    assert "updated_at:>'2025-11-20T00:00:00Z'" in q  # reference extract_table.py:183-191
    assert "pageInfo { hasNextPage endCursor }" in q
    assert "first: 100" in q


def test_rate_limit_spacing(registered, fixture_paths):
    t0 = time.monotonic()
    _read(
        registered,
        fixture_paths["retail_orders"],
        page_size=10,  # 40 nodes → 4 pages
        num_partitions=1,
        rate_limit_s=0.2,
    ).count()
    # 4 pages in one partition with 0.2s spacing → ≥ 0.6s between fetches
    assert time.monotonic() - t0 >= 0.6


def test_datasource_feeds_flatteners(registered, fixture_paths):
    nodes = _read(registered, fixture_paths["retail_orders"]).select(
        F.struct("*").alias("node")
    )
    orders = flatten.flatten_orders(nodes, "retail")
    assert orders.count() == 40
    assert orders.filter(F.col("order_id").startswith("R-")).count() == 40


def test_streaming_source_incremental_offsets(registered, tmp_path):
    """spark.readStream.format('shopify'): micro-batches advance an
    updatedAt offset through the checkpoint — restart emits nothing,
    a grown source emits only the delta."""
    import random

    from tests.shopify_fixtures import gen_order, write_envelope

    rng = random.Random(3)
    first = [gen_order(rng, i, updated_day=(i % 3) + 1) for i in range(12)]
    env = tmp_path / "stream_env" / "orders.json"
    write_envelope(env, "retail", "orders", first)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = (
            registered.readStream.format("shopify")
            .option("entity", "orders")
            .option("path", str(env))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got1 = registered.read.parquet(out)
    assert got1.count() == 12

    # unchanged source + same checkpoint → no re-emission
    run()
    assert registered.read.parquet(out).count() == 12

    # source grows: only rows past the committed offset are emitted
    newer = [gen_order(rng, 100 + i, updated_day=20) for i in range(5)]
    write_envelope(env, "retail", "orders", first + newer)
    run()
    got3 = registered.read.parquet(out)
    assert got3.count() == 17
    assert got3.select("id").distinct().count() == 17


def test_streaming_source_backpressure_cap(registered, tmp_path):
    """stream_max_records caps each micro-batch at a timestamp boundary
    (rows sharing an updatedAt never straddle batches) and availableNow
    drains the source across several batches without loss or dups."""
    import random

    from tests.shopify_fixtures import gen_order, write_envelope

    rng = random.Random(5)
    # 12 orders across 4 distinct updated days (3 per day)
    orders = [gen_order(rng, i, updated_day=(i % 4) + 1) for i in range(12)]
    env = tmp_path / "bp" / "orders.json"
    write_envelope(env, "retail", "orders", orders)

    out, ckpt = str(tmp_path / "bp_out"), str(tmp_path / "bp_ckpt")

    def run():
        q = (
            registered.readStream.format("shopify")
            .option("entity", "orders")
            .option("path", str(env))
            .option("stream_max_records", "4")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return registered.read.parquet(out).count()

    # each cron-style AvailableNow run drains one capped chunk, stretched
    # to the updatedAt boundary: 3-per-day data + cap 4 -> 6 per run
    counts = [run()]
    while counts[-1] < 12 and len(counts) < 6:
        counts.append(run())
    assert counts == [6, 12]  # capped progress, no loss
    got = registered.read.parquet(out)
    assert got.select("id").distinct().count() == 12
