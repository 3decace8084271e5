"""HttpTransport integration test against a stdlib http.server fixture
(VERDICT r2 item 8 / r3 item 6): real POSTs, cursor pagination, the
pushdown-rendered query string, and rate-limit spacing.

The fake server implements the connection contract the transport speaks
(reference extract_table.py:134-174): parse ``first:``/``query:`` from the
GraphQL text, page the node list by the ``cursor`` variable, answer with
``edges`` + ``pageInfo {hasNextPage endCursor}`` — and record every
request body + arrival time for the assertions.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from shopify_etl_spark.sources.shopify_api import (
    HttpTransport,
    ShopifyDataSource,
)

NODES = [
    {
        "id": f"gid://shopify/Order/{i}",
        "name": f"#10{i}",
        "createdAt": f"2025-11-0{(i % 9) + 1}T00:00:00Z",
        "updatedAt": f"2025-11-{10 + i:02d}T00:00:00Z",
    }
    for i in range(10)
]


class _GraphQLHandler(BaseHTTPRequestHandler):
    log: list[tuple[float, dict]] = []  # (monotonic arrival, request body)

    def do_POST(self):  # noqa: N802 (http.server API name)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _GraphQLHandler.log.append((time.monotonic(), body))
        query = body["query"]
        page_size = int(re.search(r"first: (\d+)", query).group(1))
        m = re.search(r"updated_at:(>=|>)'([^']+)'", query)
        nodes = NODES
        if m:
            op, bound = m.groups()
            nodes = [
                n
                for n in nodes
                if (n["updatedAt"] >= bound if op == ">=" else n["updatedAt"] > bound)
            ]
        cursor = body.get("variables", {}).get("cursor")
        start = int(cursor) if cursor else 0
        page = nodes[start : start + page_size]
        payload = {
            "data": {
                "orders": {
                    "edges": [{"cursor": str(start + k), "node": n} for k, n in enumerate(page)],
                    "pageInfo": {
                        "hasNextPage": start + page_size < len(nodes),
                        "endCursor": str(start + page_size),
                    },
                }
            }
        }
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GraphQLHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _GraphQLHandler.log = []
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def test_http_transport_paginates_and_sends_token(server):
    tr = HttpTransport(server, token="tok-123", entity="orders", page_size=4)
    pages = [tr.fetch_page(i) for i in range(4)]
    assert [len(p) for p in pages] == [4, 4, 2, 0]  # 10 nodes, size-4 pages
    got = [n["id"] for p in pages for n in p]
    assert got == [n["id"] for n in NODES]
    # serial cursor chain: exactly 3 POSTs (the past-the-end page is known
    # from pageInfo, never fetched), each with the advancing cursor
    cursors = [b.get("variables", {}).get("cursor") for _, b in _GraphQLHandler.log]
    assert cursors == [None, "4", "8"]
    # re-reading a known page must not re-walk the chain
    n_before = len(_GraphQLHandler.log)
    assert tr.fetch_page(3) == []
    assert len(_GraphQLHandler.log) == n_before


def test_http_transport_renders_pushdown_filter(server):
    tr = HttpTransport(
        server, token="", entity="orders", page_size=100,
        updated_at_min="2025-11-15T00:00:00Z", inclusive=True,
    )
    rows = tr.fetch_page(0)
    # the server applied the filter IT received — proves the query string
    # carried the bound, not the client post-filtering
    assert "updated_at:>='2025-11-15T00:00:00Z'" in _GraphQLHandler.log[-1][1]["query"]
    assert [n["updatedAt"] for n in rows] == [
        n["updatedAt"] for n in NODES if n["updatedAt"] >= "2025-11-15T00:00:00Z"
    ]
    # strict > drops the boundary row the inclusive bound kept
    tr2 = HttpTransport(
        server, token="", entity="orders", page_size=100,
        updated_at_min="2025-11-15T00:00:00Z", inclusive=False,
    )
    assert len(tr2.fetch_page(0)) == len(rows) - 1


def test_http_datasource_end_to_end_with_pushdown_and_rate_limit(spark, server):
    spark.dataSource.register(ShopifyDataSource)
    t0 = time.monotonic()
    df = (
        spark.read.format("shopify")
        .option("entity", "orders")
        .option("transport", "http")
        .option("shop_url", server)
        .option("token", "tok-xyz")
        .option("page_size", "3")
        .option("rate_limit_s", "0.3")
        .load()
        .filter("updatedAt > '2025-11-12T00:00:00Z'")
    )
    rows = df.select("id", "updatedAt").collect()
    wall = time.monotonic() - t0
    expect = [n for n in NODES if n["updatedAt"] > "2025-11-12T00:00:00Z"]
    assert sorted(r.id for r in rows) == sorted(n["id"] for n in expect)
    # the executor-side requests carried the PUSHED filter (S2 through the
    # datasource pushFilters path, not a Spark-side post-filter)...
    exec_bodies = [b for _, b in _GraphQLHandler.log if b.get("variables") is not None]
    assert all("updated_at:>'2025-11-12T00:00:00Z'" in b["query"] for b in exec_bodies)
    # ...across 3 size-3 pages of the 7 matching nodes (serial, 1 partition)
    arrivals = sorted(t for t, _ in _GraphQLHandler.log)
    assert len(arrivals) == 3
    # S8 rate limiting: consecutive fetches spaced >= rate_limit_s (small
    # scheduling slack), so the whole scan takes at least 2 intervals
    gaps = [b - a for a, b in zip(arrivals, arrivals[1:])]
    assert all(g >= 0.28 for g in gaps), gaps
    assert wall >= 0.56
