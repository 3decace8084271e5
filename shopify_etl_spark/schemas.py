"""Schema registry: nested source documents + warehouse star schema.

The source side mirrors the GraphQL connection documents the reference
consumes (envelope + edges/node, FIXTURES.md §A; field accesses at
reference incremental_loaders.py:125-348). The warehouse side mirrors
SCHEMA_MAP (reference incremental_loaders.py:22-57) with real Spark types
instead of the reference's stringly-typed staging (SURVEY.md §1.2):
timestamps are TimestampType, money DoubleType, counts ints.

``project_declared`` reproduces the reference's permissive projection
(incremental_loaders.py:103-104): keep the intersection of declared and
present columns — missing source fields are dropped, with an optional
drift report instead of silent loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _struct(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


_MONEY = _struct(("amount", StringType()), ("currencyCode", StringType()))
_MONEY_SET = _struct(("shopMoney", _MONEY))
_ADDRESS = _struct(
    ("address1", StringType()),
    ("address2", StringType()),
    ("city", StringType()),
    ("province", StringType()),
    ("country", StringType()),
    ("zip", StringType()),
    ("phone", StringType()),
    ("company", StringType()),
)

CUSTOMER_NODE = _struct(
    ("id", StringType()),
    ("firstName", StringType()),
    ("lastName", StringType()),
    ("email", StringType()),
    ("phone", StringType()),
    ("createdAt", StringType()),
    ("updatedAt", StringType()),
    ("state", StringType()),
    ("taxExempt", BooleanType()),
    ("note", StringType()),
    ("tags", ArrayType(StringType())),
    ("numberOfOrders", StringType()),
    ("lifetimeDuration", StringType()),
    ("amountSpent", _MONEY),
    ("defaultAddress", _ADDRESS),
    ("lastOrder", _struct(("id", StringType()), ("createdAt", StringType()))),
    (
        "statistics",
        _struct(("predictedSpendTier", StringType()), ("rfmGroup", StringType())),
    ),
)

LINE_ITEM_NODE = _struct(
    ("id", StringType()),
    ("title", StringType()),
    ("quantity", IntegerType()),
    ("variant", _struct(("id", StringType()))),
    ("product", _struct(("id", StringType()))),
    ("originalUnitPriceSet", _MONEY_SET),
    ("discountedUnitPriceSet", _MONEY_SET),
)

ORDER_NODE = _struct(
    ("id", StringType()),
    ("name", StringType()),
    ("createdAt", StringType()),
    ("updatedAt", StringType()),
    ("processedAt", StringType()),
    ("cancelledAt", StringType()),
    ("cancelReason", StringType()),
    ("confirmed", BooleanType()),
    ("tags", ArrayType(StringType())),
    ("displayFulfillmentStatus", StringType()),
    ("sourceName", StringType()),
    ("subtotalPriceSet", _MONEY_SET),
    ("totalPriceSet", _MONEY_SET),
    ("totalTaxSet", _MONEY_SET),
    ("totalDiscountsSet", _MONEY_SET),
    ("totalShippingPriceSet", _MONEY_SET),
    ("customer", _struct(("id", StringType()))),
    ("shippingAddress", _ADDRESS),
    (
        "lineItems",
        _struct(("edges", ArrayType(_struct(("node", LINE_ITEM_NODE))))),
    ),
)

_QUANTITY = _struct(("name", StringType()), ("quantity", IntegerType()))
INVENTORY_LEVEL_NODE = _struct(("quantities", ArrayType(_QUANTITY)),)
VARIANT_NODE = _struct(
    ("id", StringType()),
    ("sku", StringType()),
    ("price", StringType()),
    ("compareAtPrice", StringType()),
    ("availableForSale", BooleanType()),
    ("createdAt", StringType()),
    ("updatedAt", StringType()),
    (
        "inventoryItem",
        _struct(
            ("id", StringType()),
            (
                "inventoryLevels",
                _struct(("edges", ArrayType(_struct(("node", INVENTORY_LEVEL_NODE))))),
            ),
        ),
    ),
)

PRODUCT_NODE = _struct(
    ("id", StringType()),
    ("title", StringType()),
    ("handle", StringType()),
    ("productType", StringType()),
    ("vendor", StringType()),
    ("status", StringType()),
    ("createdAt", StringType()),
    ("updatedAt", StringType()),
    ("tags", ArrayType(StringType())),
    ("tracksInventory", BooleanType()),
    ("variants", _struct(("edges", ArrayType(_struct(("node", VARIANT_NODE)))))),
)

NODE_SCHEMAS = {
    "customers": CUSTOMER_NODE,
    "orders": ORDER_NODE,
    "products": PRODUCT_NODE,
}


def envelope_schema(entity: str) -> StructType:
    """Raw JSON envelope {metadata, data:[{cursor?, node}]} — reference
    extract_table.py:231-241 persists exactly this shape."""
    node = NODE_SCHEMAS[entity]
    return StructType(
        [
            StructField(
                "metadata",
                _struct(
                    ("store_type", StringType()),
                    ("entity_type", StringType()),
                    ("extracted_at", StringType()),
                    ("record_count", LongType()),
                    ("shop_name", StringType()),
                ),
                True,
            ),
            StructField(
                "data",
                ArrayType(_struct(("cursor", StringType()), ("node", node))),
                True,
            ),
        ]
    )


#: Declared warehouse column lists — the Spark twin of SCHEMA_MAP
#: (reference incremental_loaders.py:22-57). Order is the canonical
#: column order of each target table.
SCHEMA_MAP: dict[str, list[str]] = {
    "dim_customers": [
        "customer_id", "first_name", "last_name", "email", "phone",
        "created_at", "updated_at", "state", "tax_exempt", "tags", "note",
        "number_of_orders", "lifetime_duration", "amount_spent", "currency",
        "address1", "address2", "city", "province", "country", "zip",
        "company", "last_order_id", "last_order_date",
        "predicted_spend_tier", "rfm_group",
    ],
    "dim_products": [
        "product_id", "title", "handle", "product_type", "vendor", "status",
        "created_at", "updated_at", "tags", "tracks_inventory",
    ],
    "dim_product_variants": [
        "variant_id", "product_id", "sku", "price", "compare_at_price",
        "available_for_sale", "created_at", "updated_at",
    ],
    "fact_current_inventory": [
        "sku", "available", "committed", "on_hand", "incoming", "reserved",
        "variant_id", "product_id", "source_system",
    ],
    "inventory_snapshot": [
        "sku", "snapshot_date", "available", "committed", "on_hand",
        "incoming", "reserved",
    ],
    "fact_orders": [
        "order_id", "order_number", "created_at", "updated_at",
        "processed_at", "cancelled_at", "cancel_reason", "confirmed", "tags",
        "fulfillment_status", "subtotal", "currency", "total_price",
        "total_tax", "total_discounts", "total_shipping", "customer_id",
        "shipping_address1", "shipping_address2", "shipping_city",
        "shipping_province", "shipping_country", "shipping_zip",
        "shipping_phone", "shipping_company", "line_items_count",
        "total_quantity", "source_name",
    ],
    "fact_order_items": [
        "order_id", "line_item_id", "quantity", "variant_id", "product_id",
        "title", "original_price", "discounted_price",
    ],
}

#: Merge keys per target (reference run_logs.txt:420,455,510,551).
MERGE_KEYS: dict[str, list[str]] = {
    "fact_current_inventory": ["sku"],
    "inventory_snapshot": ["sku", "snapshot_date"],
    "fact_orders": ["order_id"],
    "fact_order_items": ["order_id", "line_item_id"],
    "dim_customers": ["customer_id"],
    "dim_products": ["product_id"],
    "dim_product_variants": ["variant_id"],
}


def project_declared(
    df: DataFrame, table: str, strict: bool = False, keep: tuple = ()
) -> DataFrame:
    """Project to declared∩present columns (permissive, like the reference);
    ``strict=True`` raises on drift instead of dropping silently. ``keep``
    names pass-through plumbing columns (e.g. a physical partition column)
    retained after the declared set without being part of the contract."""
    declared = SCHEMA_MAP[table]
    present = [c for c in declared if c in df.columns]
    present += [c for c in keep if c in df.columns and c not in present]
    if strict:
        missing = [c for c in declared if c not in df.columns]
        extra = [c for c in df.columns if c not in declared and c not in keep]
        if missing or extra:
            raise ValueError(f"schema drift for {table}: missing={missing} extra={extra}")
    return df.select(*present)
