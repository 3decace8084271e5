"""Deterministic Shopify-shaped fixture generator (FIXTURES.md §A).

Seeded `random.Random` → identical fixtures every run. Exercises the
null-safety paths (nested objects null with p≈0.1), dirty SKUs (null /
empty / padded / case-variant), two-store SKU overlap, and order-update
overlap between batches.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _gid(typ: str, n: int) -> str:
    return f"gid://shopify/{typ}/{n}"


def _ts(rng: random.Random, day_lo: int = 1, day_hi: int = 28) -> str:
    return (
        f"2025-11-{rng.randint(day_lo, day_hi):02d}T"
        f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}Z"
    )


def _maybe(rng: random.Random, value, p_null: float = 0.1):
    return None if rng.random() < p_null else value


def _money(rng: random.Random):
    return {"amount": f"{rng.uniform(1, 500):.2f}", "currencyCode": "USD"}


def _money_set(rng: random.Random):
    return {"shopMoney": _money(rng)}


def _address(rng: random.Random):
    return {
        "address1": f"{rng.randint(1,999)} Main St",
        "address2": _maybe(rng, "Suite 1"),
        "city": rng.choice(["Springfield", "Rivertown", "Lakeside"]),
        "province": rng.choice(["ON", "BC", "QC"]),
        "country": "Canada",
        "zip": f"K{rng.randint(1,9)}A{rng.randint(0,9)}B{rng.randint(0,9)}",
        "phone": _maybe(rng, f"+1-555-{rng.randint(1000,9999)}"),
        "company": _maybe(rng, "ACME Inc", 0.5),
    }


def gen_customer(rng: random.Random, cid: int) -> dict:
    return {
        "id": _gid("Customer", cid),
        "firstName": rng.choice(["Ada", "Grace", "Alan", "Edsger"]),
        "lastName": rng.choice(["Lovelace", "Hopper", "Turing", "Dijkstra"]),
        "email": f"user{cid}@example.com",
        "phone": _maybe(rng, f"+1-555-{rng.randint(1000,9999)}"),
        "createdAt": _ts(rng, 1, 10),
        "updatedAt": _ts(rng, 11, 28),
        "state": rng.choice(["ENABLED", "DISABLED", "INVITED"]),
        "taxExempt": _maybe(rng, rng.random() < 0.3),
        "note": _maybe(rng, "vip", 0.7),
        "tags": rng.sample(WORDS, rng.randint(0, 4)),
        "numberOfOrders": str(rng.randint(0, 40)),
        "lifetimeDuration": f"{rng.randint(1, 60)} months",
        "amountSpent": _maybe(rng, _money(rng)),
        "defaultAddress": _maybe(rng, _address(rng)),
        "lastOrder": _maybe(rng, {"id": _gid("Order", rng.randint(1, 999)), "createdAt": _ts(rng)}),
        "statistics": _maybe(
            rng,
            {"predictedSpendTier": rng.choice(["HIGH", "MEDIUM", "LOW"]),
             "rfmGroup": rng.choice(["CHAMPIONS", "AT_RISK", "LOYAL"])},
        ),
    }


def gen_line_item(rng: random.Random, oid: int, idx: int) -> dict:
    return {
        "node": {
            "id": _gid("LineItem", oid * 100 + idx),
            "title": " ".join(rng.sample(WORDS, 2)),
            "quantity": rng.randint(1, 5),
            "variant": _maybe(rng, {"id": _gid("ProductVariant", rng.randint(1, 200))}),
            "product": _maybe(rng, {"id": _gid("Product", rng.randint(1, 60))}),
            "originalUnitPriceSet": _money_set(rng),
            "discountedUnitPriceSet": _money_set(rng),
        }
    }


def gen_order(rng: random.Random, oid: int, updated_day: int | None = None) -> dict:
    n_items = rng.randint(1, 6)
    upd = (
        f"2025-11-{updated_day:02d}T12:00:00Z" if updated_day else _ts(rng, 11, 28)
    )
    return {
        "id": _gid("Order", oid),
        "name": f"#{1000 + oid}",
        "createdAt": _ts(rng, 1, 10),
        "updatedAt": upd,
        "processedAt": _maybe(rng, _ts(rng, 1, 10)),
        "cancelledAt": _maybe(rng, _ts(rng, 11, 28), 0.9),
        "cancelReason": _maybe(rng, "CUSTOMER", 0.9),
        "confirmed": rng.random() < 0.9,
        "tags": rng.sample(WORDS, rng.randint(0, 3)),
        "displayFulfillmentStatus": rng.choice(["FULFILLED", "UNFULFILLED", "PARTIALLY_FULFILLED"]),
        "sourceName": rng.choice(["web", "pos", "shopify_draft_order"]),
        "subtotalPriceSet": _money_set(rng),
        "totalPriceSet": _money_set(rng),
        "totalTaxSet": _money_set(rng),
        "totalDiscountsSet": _money_set(rng),
        "totalShippingPriceSet": _maybe(rng, _money_set(rng)),
        "customer": _maybe(rng, {"id": _gid("Customer", rng.randint(1, 50))}),
        "shippingAddress": _maybe(rng, _address(rng)),
        "lineItems": {"edges": [gen_line_item(rng, oid, i) for i in range(n_items)]},
    }


DIRTY_SKUS = [None, "", "  ", " sku-pad ", "SKU-case", "sku-CASE"]


def gen_product(rng: random.Random, pid: int, sku_pool: list[str]) -> dict:
    n_variants = rng.randint(1, 4)
    variants = []
    for v in range(n_variants):
        vid = pid * 10 + v
        sku = rng.choice(sku_pool + DIRTY_SKUS) if rng.random() < 0.3 else f"SKU-{vid}"
        n_levels = rng.randint(0, 3)
        levels = [
            {
                "node": {
                    "quantities": [
                        {"name": m, "quantity": rng.randint(0, 50)}
                        for m in rng.sample(
                            ["available", "on_hand", "committed", "incoming", "reserved"],
                            rng.randint(1, 5),
                        )
                    ]
                }
            }
            for _ in range(n_levels)
        ]
        variants.append(
            {
                "node": {
                    "id": _gid("ProductVariant", vid),
                    "sku": sku,
                    "price": f"{rng.uniform(5, 200):.2f}",
                    "compareAtPrice": _maybe(rng, f"{rng.uniform(5, 250):.2f}", 0.4),
                    "availableForSale": rng.random() < 0.8,
                    "createdAt": _ts(rng, 1, 28),
                    "updatedAt": _ts(rng, 11, 28),
                    "inventoryItem": _maybe(
                        rng,
                        {"id": _gid("InventoryItem", vid), "inventoryLevels": {"edges": levels}},
                    ),
                }
            }
        )
    return {
        "id": _gid("Product", pid),
        "title": " ".join(rng.sample(WORDS, 3)).title(),
        "handle": f"product-{pid}",
        "productType": rng.choice(["Shirt", "Mug", "Poster"]),
        "vendor": rng.choice(["VendorA", "VendorB"]),
        "status": rng.choice(["ACTIVE", "ACTIVE", "ACTIVE", "DRAFT", "ARCHIVED"]),
        "createdAt": _ts(rng, 1, 10),
        "updatedAt": _ts(rng, 11, 28),
        "tags": rng.sample(WORDS, rng.randint(0, 3)),
        "tracksInventory": rng.random() < 0.9,
        "variants": {"edges": variants},
    }


def write_envelope(path: Path, store: str, entity: str, nodes: list[dict]) -> Path:
    """Persist the raw envelope exactly as the reference does
    (extract_table.py:231-241)."""
    doc = {
        "metadata": {
            "store_type": store,
            "entity_type": entity,
            "extracted_at": "2025-11-28T05:45:00Z",
            "record_count": len(nodes),
            "shop_name": f"{store}-shop",
        },
        "data": [{"cursor": f"c{i}", "node": n} for i, n in enumerate(nodes)],
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(doc))
    return path


def make_fixture_set(tmp: Path, seed: int = 42) -> dict[str, Path]:
    """Full two-store fixture set with overlapping SKUs and order updates."""
    rng = random.Random(seed)
    shared = [f"SHARED-{i}" for i in range(5)]
    paths = {}
    for store, base in (("retail", 0), ("wholesale", 5000)):
        customers = [gen_customer(rng, base + i) for i in range(30)]
        orders = [gen_order(rng, base + i) for i in range(40)]
        products = [gen_product(rng, base + i, shared) for i in range(15)]
        paths[f"{store}_customers"] = write_envelope(
            tmp / store / "customers.json", store, "customers", customers
        )
        paths[f"{store}_orders"] = write_envelope(
            tmp / store / "orders.json", store, "orders", orders
        )
        paths[f"{store}_products"] = write_envelope(
            tmp / store / "products.json", store, "products", products
        )
        # Batch 2: ~20% of orders re-appear with newer updatedAt + 10 new
        updates = [gen_order(rng, base + i, updated_day=28) for i in range(0, 8)]
        news = [gen_order(rng, base + 100 + i) for i in range(10)]
        paths[f"{store}_orders_b2"] = write_envelope(
            tmp / store / "orders_b2.json", store, "orders", updates + news
        )
    return paths
