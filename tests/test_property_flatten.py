"""Property-based flatten/merge invariants (SURVEY §5 strategy item 4):
randomized nested documents with missing/null subtrees must flatten
without errors and preserve structural invariants."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shopify_etl_spark.operators import flatten, merge
from shopify_etl_spark.sources import read_envelope

from tests.shopify_fixtures import write_envelope

# Order-node strategy: every nested object may be absent; arrays vary 0..4.
money = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {"shopMoney": st.one_of(st.none(), st.fixed_dictionaries(
            {"amount": st.one_of(st.none(), st.from_regex(r"[0-9]{1,4}\.[0-9]{2}", fullmatch=True)),
             "currencyCode": st.just("USD")}))}
    ),
)
line_item = st.fixed_dictionaries(
    {
        "node": st.fixed_dictionaries(
            {
                "id": st.integers(1, 99999).map(lambda i: f"gid://shopify/LineItem/{i}"),
                "quantity": st.one_of(st.none(), st.integers(0, 9)),
                "title": st.one_of(st.none(), st.text(max_size=10)),
                "variant": st.one_of(st.none(), st.fixed_dictionaries(
                    {"id": st.just("gid://shopify/ProductVariant/1")})),
                "product": st.none(),
                "originalUnitPriceSet": money,
                "discountedUnitPriceSet": money,
            }
        )
    }
)
order_node = st.fixed_dictionaries(
    {
        "id": st.integers(1, 10**6).map(lambda i: f"gid://shopify/Order/{i}"),
        "name": st.one_of(st.none(), st.integers(1, 9999).map(lambda i: f"#{i}")),
        "createdAt": st.just("2025-11-01T00:00:00Z"),
        "updatedAt": st.one_of(st.none(), st.just("2025-11-20T10:30:00Z")),
        "confirmed": st.one_of(st.none(), st.booleans()),
        "tags": st.one_of(st.none(), st.lists(st.sampled_from(["a", "b", "c"]), max_size=4)),
        "totalPriceSet": money,
        "customer": st.one_of(st.none(), st.fixed_dictionaries(
            {"id": st.just("gid://shopify/Customer/5")})),
        "shippingAddress": st.none(),
        "lineItems": st.one_of(
            st.none(),
            st.fixed_dictionaries({"edges": st.lists(line_item, max_size=4)}),
        ),
    }
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(order_node, min_size=1, max_size=8, unique_by=lambda n: n["id"]))
def test_flatten_orders_invariants(spark, tmp_path_factory, nodes):
    tmp = tmp_path_factory.mktemp("prop")
    path = write_envelope(tmp / "orders.json", "retail", "orders", nodes)
    raw = read_envelope(spark, str(path), "orders")
    orders = flatten.flatten_orders(raw, "retail")
    items = flatten.explode_order_items(raw, "retail")
    rows = orders.collect()
    item_rows = items.collect()

    # row-count invariants
    assert len(rows) == len(nodes)
    expect_items = sum(
        len((n.get("lineItems") or {}).get("edges") or []) for n in nodes
    )
    assert len(item_rows) == expect_items

    by_id = {r.order_id: r for r in rows}
    for n in nodes:
        r = by_id["R-" + n["id"].rsplit("/", 1)[-1]]
        li = (n.get("lineItems") or {}).get("edges") or []
        assert r.line_items_count == len(li)
        assert r.total_quantity == sum((e["node"].get("quantity") or 0) for e in li)
        assert r.total_price >= 0.0  # missing money → typed default, never null

    # key uniqueness after upsert with itself (idempotence invariant)
    merged = merge.upsert(orders, orders, "order_id")
    assert merged.count() == len(nodes)
