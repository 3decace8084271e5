"""Flattener tests on Shopify-shaped fixtures: cardinalities, null-safety,
scalar semantics, schema conformance to SCHEMA_MAP."""

import json

import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators import flatten
from shopify_etl_spark.schemas import SCHEMA_MAP, project_declared
from shopify_etl_spark.sources import read_envelope

from tests.shopify_fixtures import make_fixture_set


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    return make_fixture_set(tmp_path_factory.mktemp("shopify"))


def test_customers_flatten(spark, fixture_paths):
    nodes = read_envelope(spark, str(fixture_paths["retail_customers"]), "customers")
    out = flatten.flatten_customers(nodes, "retail")
    assert out.count() == 30
    assert out.columns == SCHEMA_MAP["dim_customers"]
    rows = out.collect()
    for r in rows:
        assert r.customer_id.startswith("R-")
        assert not r.customer_id.startswith("R-gid")  # GID tail extracted
        assert r.tax_exempt in ("True", "False", "None")
        assert r.amount_spent is not None  # missing money → 0.0 default
    raw = json.loads(fixture_paths["retail_customers"].read_text())
    null_addr = [e["node"]["id"] for e in raw["data"] if e["node"]["defaultAddress"] is None]
    if null_addr:  # null nested object → null columns, not an error
        rid = "R-" + null_addr[0].rsplit("/", 1)[-1]
        row = next(r for r in rows if r.customer_id == rid)
        assert row.city is None


def test_orders_flatten_and_items(spark, fixture_paths):
    nodes = read_envelope(spark, str(fixture_paths["retail_orders"]), "orders")
    orders = flatten.flatten_orders(nodes, "retail")
    items = flatten.explode_order_items(nodes, "retail")
    assert orders.count() == 40
    assert orders.columns == SCHEMA_MAP["fact_orders"]
    # items carry transient parent version/created-at columns for merge-time
    # dedup and partition scoping; project_declared drops them before any
    # warehouse write
    assert items.columns == SCHEMA_MAP["fact_order_items"] + [
        "_parent_updated_at",
        "_parent_created_at",
    ]
    # per-order aggregates match the exploded child rows (A2/A3)
    agg = items.groupBy("order_id").agg(
        F.count("*").alias("n"), F.sum("quantity").alias("q")
    )
    joined = orders.join(agg, "order_id").collect()
    assert len(joined) == 40
    for r in joined:
        assert r.line_items_count == r.n
        assert r.total_quantity == r.q
    for r in orders.collect():
        assert not r.order_number.startswith("#")
        assert r.total_price >= 0.0


def test_products_variants_inventory(spark, fixture_paths):
    nodes = read_envelope(spark, str(fixture_paths["retail_products"]), "products")
    products = flatten.flatten_products(nodes)
    variants = flatten.explode_variants(nodes)
    inv = flatten.inventory_from_products(nodes, "retail")
    assert products.count() == 15
    assert products.columns == SCHEMA_MAP["dim_products"]
    assert variants.columns == SCHEMA_MAP["dim_product_variants"]
    raw = json.loads(fixture_paths["retail_products"].read_text())
    n_variants = sum(len(e["node"]["variants"]["edges"]) for e in raw["data"])
    assert variants.count() == n_variants
    assert inv.count() == n_variants  # one inventory row per variant

    # pivot-sum parity with a hand-computed node
    node0 = raw["data"][0]["node"]["variants"]["edges"][0]["node"]
    inv_item = node0["inventoryItem"]
    expect = dict.fromkeys(flatten.INVENTORY_MEASURES, 0)
    if inv_item:
        for lvl in inv_item["inventoryLevels"]["edges"]:
            for q in lvl["node"]["quantities"]:
                expect[q["name"]] += q["quantity"]
    vid = node0["id"].rsplit("/", 1)[-1]
    row = next(r for r in inv.collect() if r.variant_id == vid)
    for m in flatten.INVENTORY_MEASURES:
        assert row[m] == expect[m], m


def test_project_declared_drops_and_strict_raises(spark):
    df = spark.createDataFrame([(1, "x", "extra")], ["order_id", "order_number", "junk"])
    out = project_declared(df, "fact_orders")
    assert out.columns == ["order_id", "order_number"]  # intersection, order kept
    with pytest.raises(ValueError, match="schema drift"):
        project_declared(df, "fact_orders", strict=True)


def test_watermark_max(spark, fixture_paths):
    nodes = read_envelope(spark, str(fixture_paths["retail_orders"]), "orders")
    wm = flatten.max_updated_at(nodes)
    assert wm is not None and wm.startswith("2025-11-")
