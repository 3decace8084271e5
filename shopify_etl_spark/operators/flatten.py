"""Nested-document flatteners: GraphQL connection docs → star-schema rows.

Spark-first re-expression of the reference's row-at-a-time Python loaders
(reference incremental_loaders.py:112-355, P1-P8 in SURVEY.md §2.3):
every flattener is a single ``select`` over nested fields — null structs
propagate null fields automatically (the reference's ``or {}`` safe
navigation, :133-136), explodes are generators fused into the scan stage,
and the per-order line-item aggregates use array expressions instead of a
shuffle (the items are co-nested with their parent, so no groupBy is ever
needed — A2/A3 at :205-207,253).

Input contract: a DataFrame with a ``node`` struct column (from
``sources.json_raw.read_envelope`` / ``read_jsonl``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    bool_str,
    clean_id,
    get_money,
    get_money_bare,
    iso_ts,
    non_empty,
    safe_num,
    strip_hash,
    tags_csv,
)

#: Store → ID prefix (reference incremental_loaders.py:83).
STORE_PREFIX = {"retail": "R-", "wholesale": "W-"}


def _prefix(store: str) -> str:
    return STORE_PREFIX.get(store, f"{store[:1].upper()}-")


def flatten_customers(nodes: DataFrame, store: str) -> DataFrame:
    """P1 — customer doc → one 26-col dim_customers row
    (reference incremental_loaders.py:125-165)."""
    p = _prefix(store)
    n = F.col("node")
    return nodes.select(
        clean_id(n.getField("id"), p).alias("customer_id"),
        n.getField("firstName").alias("first_name"),
        n.getField("lastName").alias("last_name"),
        n.getField("email").alias("email"),
        n.getField("phone").alias("phone"),
        iso_ts(n.getField("createdAt")).alias("created_at"),
        iso_ts(n.getField("updatedAt")).alias("updated_at"),
        n.getField("state").alias("state"),
        bool_str(n.getField("taxExempt")).alias("tax_exempt"),
        tags_csv(n.getField("tags")).alias("tags"),
        n.getField("note").alias("note"),
        safe_num(n.getField("numberOfOrders"), "int", 0).alias("number_of_orders"),
        n.getField("lifetimeDuration").alias("lifetime_duration"),
        get_money_bare(n.getField("amountSpent")).alias("amount_spent"),
        n.getField("amountSpent").getField("currencyCode").alias("currency"),
        n.getField("defaultAddress").getField("address1").alias("address1"),
        n.getField("defaultAddress").getField("address2").alias("address2"),
        n.getField("defaultAddress").getField("city").alias("city"),
        n.getField("defaultAddress").getField("province").alias("province"),
        n.getField("defaultAddress").getField("country").alias("country"),
        n.getField("defaultAddress").getField("zip").alias("zip"),
        n.getField("defaultAddress").getField("company").alias("company"),
        clean_id(n.getField("lastOrder").getField("id"), p).alias("last_order_id"),
        iso_ts(n.getField("lastOrder").getField("createdAt")).alias("last_order_date"),
        n.getField("statistics").getField("predictedSpendTier").alias("predicted_spend_tier"),
        n.getField("statistics").getField("rfmGroup").alias("rfm_group"),
    )


def flatten_orders(nodes: DataFrame, store: str) -> DataFrame:
    """P2 + A2/A3 — order doc → one 28-col fact_orders row
    (reference incremental_loaders.py:185-255).

    ``line_items_count``/``total_quantity`` are array expressions over the
    co-nested items (size / aggregate) — zero shuffles, unlike a flatten-
    then-groupBy formulation.
    """
    p = _prefix(store)
    n = F.col("node")
    edges = n.getField("lineItems").getField("edges")
    total_qty = F.aggregate(
        F.coalesce(edges, F.array()),
        F.lit(0),
        lambda acc, e: acc + F.coalesce(e.getField("node").getField("quantity"), F.lit(0)),
    )
    ship = n.getField("shippingAddress")
    return nodes.select(
        clean_id(n.getField("id"), p).alias("order_id"),
        strip_hash(n.getField("name")).alias("order_number"),
        iso_ts(n.getField("createdAt")).alias("created_at"),
        iso_ts(n.getField("updatedAt")).alias("updated_at"),
        iso_ts(n.getField("processedAt")).alias("processed_at"),
        iso_ts(n.getField("cancelledAt")).alias("cancelled_at"),
        n.getField("cancelReason").alias("cancel_reason"),
        bool_str(n.getField("confirmed")).alias("confirmed"),
        tags_csv(n.getField("tags")).alias("tags"),
        n.getField("displayFulfillmentStatus").alias("fulfillment_status"),
        get_money(n.getField("subtotalPriceSet")).alias("subtotal"),
        n.getField("totalPriceSet").getField("shopMoney").getField("currencyCode").alias("currency"),
        get_money(n.getField("totalPriceSet")).alias("total_price"),
        get_money(n.getField("totalTaxSet")).alias("total_tax"),
        get_money(n.getField("totalDiscountsSet")).alias("total_discounts"),
        get_money(n.getField("totalShippingPriceSet")).alias("total_shipping"),
        clean_id(n.getField("customer").getField("id"), p).alias("customer_id"),
        ship.getField("address1").alias("shipping_address1"),
        ship.getField("address2").alias("shipping_address2"),
        ship.getField("city").alias("shipping_city"),
        ship.getField("province").alias("shipping_province"),
        ship.getField("country").alias("shipping_country"),
        ship.getField("zip").alias("shipping_zip"),
        ship.getField("phone").alias("shipping_phone"),
        ship.getField("company").alias("shipping_company"),
        F.coalesce(F.size(edges), F.lit(0)).alias("line_items_count"),
        total_qty.alias("total_quantity"),
        n.getField("sourceName").alias("source_name"),
    )


def explode_order_items(nodes: DataFrame, store: str) -> DataFrame:
    """P3 — lineItems.edges[] → N fact_order_items rows keyed to the parent
    order (reference incremental_loaders.py:198-221). The explode is a
    generator in the scan stage; parent keys ride along, no join."""
    p = _prefix(store)
    n = F.col("node")
    items = nodes.select(
        clean_id(n.getField("id"), p).alias("order_id"),
        iso_ts(n.getField("updatedAt")).alias("_parent_updated_at"),
        # parent created_at rides along so the merge layer can scope the
        # delete+reload to the parent's month partition (M7 at scale);
        # dropped by project_declared before the warehouse write
        iso_ts(n.getField("createdAt")).alias("_parent_created_at"),
        F.explode(n.getField("lineItems").getField("edges")).alias("edge"),
    )
    li = F.col("edge").getField("node")
    return items.select(
        "order_id",
        clean_id(li.getField("id"), p).alias("line_item_id"),
        F.coalesce(li.getField("quantity"), F.lit(0)).alias("quantity"),
        clean_id(li.getField("variant").getField("id")).alias("variant_id"),
        clean_id(li.getField("product").getField("id")).alias("product_id"),
        li.getField("title").alias("title"),
        get_money(li.getField("originalUnitPriceSet")).alias("original_price"),
        get_money(li.getField("discountedUnitPriceSet")).alias("discounted_price"),
        # transient columns: version for merge-time winner-dedup, created_at
        # for month-partition scoping (dropped by project_declared before
        # the warehouse write)
        "_parent_updated_at",
        "_parent_created_at",
    )


def flatten_products(nodes: DataFrame) -> DataFrame:
    """P-dim — product doc → dim_products row
    (reference incremental_loaders.py:283-294). Product/variant ids carry
    no store prefix (incremental_loaders.py:282)."""
    n = F.col("node")
    return nodes.select(
        clean_id(n.getField("id")).alias("product_id"),
        n.getField("title").alias("title"),
        n.getField("handle").alias("handle"),
        n.getField("productType").alias("product_type"),
        n.getField("vendor").alias("vendor"),
        n.getField("status").alias("status"),
        iso_ts(n.getField("createdAt")).alias("created_at"),
        iso_ts(n.getField("updatedAt")).alias("updated_at"),
        tags_csv(n.getField("tags")).alias("tags"),
        bool_str(n.getField("tracksInventory")).alias("tracks_inventory"),
    )


def explode_variants(nodes: DataFrame) -> DataFrame:
    """P4 — variants.edges[] → dim_product_variants rows
    (reference incremental_loaders.py:296-313)."""
    n = F.col("node")
    rows = nodes.select(
        clean_id(n.getField("id")).alias("product_id"),
        F.explode(n.getField("variants").getField("edges")).alias("edge"),
    )
    v = F.col("edge").getField("node")
    return rows.select(
        clean_id(v.getField("id")).alias("variant_id"),
        "product_id",
        v.getField("sku").alias("sku"),
        safe_num(v.getField("price")).alias("price"),
        safe_num(v.getField("compareAtPrice")).alias("compare_at_price"),
        bool_str(v.getField("availableForSale")).alias("available_for_sale"),
        iso_ts(v.getField("createdAt")).alias("created_at"),
        iso_ts(v.getField("updatedAt")).alias("updated_at"),
    )


#: The five inventory measures (reference incremental_loaders.py:318-323).
INVENTORY_MEASURES = ("available", "on_hand", "committed", "incoming", "reserved")


def inventory_from_products(nodes: DataFrame, store: str) -> DataFrame:
    """P5 — per variant: explode inventory levels, pivot the
    quantities[{name,quantity}] pairs into measure columns, summing across
    locations (reference incremental_loaders.py:315-334).

    All level/quantity structures are co-nested with the variant, so the
    pivot-sum is a flatten + filtered array-aggregate per measure — pure
    expressions, no shuffle (vs the naive explode ×2 + groupBy which would
    shuffle every location row).
    """
    n = F.col("node")
    rows = nodes.select(
        clean_id(n.getField("id")).alias("product_id"),
        F.explode(n.getField("variants").getField("edges")).alias("edge"),
    )
    v = F.col("edge").getField("node")
    levels = v.getField("inventoryItem").getField("inventoryLevels").getField("edges")
    all_q = F.flatten(
        F.transform(
            F.coalesce(levels, F.array()),
            lambda e: F.coalesce(e.getField("node").getField("quantities"), F.array()),
        )
    )

    def measure_sum(name: str):
        return F.aggregate(
            F.filter(all_q, lambda q: q.getField("name") == name),
            F.lit(0),
            lambda acc, q: acc + F.coalesce(q.getField("quantity"), F.lit(0)),
        ).alias(name)

    return rows.select(
        v.getField("sku").alias("sku"),
        *[measure_sum(m) for m in INVENTORY_MEASURES],
        clean_id(v.getField("id")).alias("variant_id"),
        "product_id",
        F.lit(store).alias("source_system"),
        iso_ts(v.getField("createdAt")).alias("created_at"),
    )


def max_updated_at(nodes: DataFrame) -> str | None:
    """A1 — running-max watermark over the batch's ``updatedAt``
    (reference incremental_loaders.py:123-131) as a real timestamp max.
    Driver-side scalar by design: it parameterizes the NEXT extraction."""
    row = nodes.select(F.max(iso_ts(F.col("node").getField("updatedAt"))).alias("m")).first()
    return row.m.isoformat() if row and row.m else None
