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
        # the client's rate-limiter stamp (same-process monotonic clock),
        # tucked into the body record so the log tuple shape is unchanged
        body["_client_send"] = self.headers.get("X-Client-Send")
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
    # S8 rate limiting, asserted on the CLIENT's clock: the limiter's
    # post-sleep stamps ride in as X-Client-Send, and successive stamps
    # are >= rate_limit_s apart by sleep arithmetic — deterministic under
    # any machine load (server-ARRIVAL gaps wobble with socket/thread
    # scheduling and flaked at 0.181 s under CPU contention; VERDICT r7).
    stamps = sorted(float(b["_client_send"]) for _, b in _GraphQLHandler.log)
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    assert all(g >= 0.3 - 1e-6 for g in gaps), gaps
    # server-side sanity bound only: the whole scan spans >= ~2 intervals
    # end to end (generous slack for scheduling)
    assert arrivals[-1] - arrivals[0] >= 0.3
    assert wall >= 0.56


class _FlakyHandler(_GraphQLHandler):
    """Scripted failures ahead of the normal connection contract: each
    request pops one planned behavior (HTTP 429, in-band THROTTLED,
    permanent GraphQL error) before falling through to the base paging."""

    plan: list[str] = []

    def do_POST(self):  # noqa: N802 (http.server API name)
        if _FlakyHandler.plan:
            action = _FlakyHandler.plan.pop(0)
            self.rfile.read(int(self.headers["Content-Length"]))
            if action == "429":
                self.send_response(429)
                self.send_header("Retry-After", "0.05")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if action == "500":
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            payload = {
                "errors": [
                    {"message": "Throttled", "extensions": {"code": "THROTTLED"}}
                ]
                if action == "throttle"
                else [{"message": "Field 'bogus' doesn't exist"}]
            }
            if action == "errors-null-data":
                # the GraphQL-spec execution-error shape: data present
                # but explicitly null alongside errors
                payload = {
                    "data": None,
                    "errors": [{"message": "Field 'bogus' doesn't exist"}],
                }
            out = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
            return
        super().do_POST()


@pytest.fixture()
def flaky_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _GraphQLHandler.log = []
    _FlakyHandler.plan = []
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def test_http_transport_retries_429_500_and_throttled(flaky_server):
    _FlakyHandler.plan = ["429", "500", "throttle"]
    tr = HttpTransport(flaky_server, token="", entity="orders", page_size=100)
    rows = tr.fetch_page(0)
    assert [n["id"] for n in rows] == [n["id"] for n in NODES]
    assert _FlakyHandler.plan == []  # all three transient failures consumed


def test_http_transport_graphql_errors_raise_descriptively(flaky_server):
    _FlakyHandler.plan = ["errors"]
    tr = HttpTransport(flaky_server, token="", entity="orders", page_size=100)
    with pytest.raises(RuntimeError, match="Field 'bogus'"):
        tr.fetch_page(0)


def test_http_transport_null_data_error_shape_raises_descriptively(flaky_server):
    # spec-compliant servers return {"data": null, "errors": [...]} — the
    # gate must fire on data-is-None, not key-absence, or fetch_page dies
    # on a TypeError instead of the descriptive error
    _FlakyHandler.plan = ["errors-null-data"]
    tr = HttpTransport(flaky_server, token="", entity="orders", page_size=100)
    with pytest.raises(RuntimeError, match="Field 'bogus'"):
        tr.fetch_page(0)


def test_http_transport_429_exhausts_retries(flaky_server):
    import urllib.error

    _FlakyHandler.plan = ["429"] * (HttpTransport.MAX_RETRIES + 1)
    tr = HttpTransport(flaky_server, token="", entity="orders", page_size=100)
    with pytest.raises(urllib.error.HTTPError):
        tr.fetch_page(0)


class _GappyHandler(_GraphQLHandler):
    """A filtered connection shape: the middle page has ZERO edges but
    hasNextPage=true — legal on the Admin API, and the scan must follow
    the cursor through it instead of truncating."""

    def do_POST(self):  # noqa: N802 (http.server API name)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _GraphQLHandler.log.append((time.monotonic(), body))
        cursor = body.get("variables", {}).get("cursor")
        page_idx = int(cursor) if cursor else 0
        pages = [NODES[:2], [], NODES[2:4]]
        page = pages[page_idx]
        payload = {
            "data": {
                "orders": {
                    "edges": [{"cursor": str(page_idx), "node": n} for n in page],
                    "pageInfo": {
                        "hasNextPage": page_idx + 1 < len(pages),
                        "endCursor": str(page_idx + 1),
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


def test_reader_follows_cursor_through_empty_page(monkeypatch):
    from shopify_etl_spark.sources.shopify_api import ShopifyReader
    from shopify_etl_spark.schemas import NODE_SCHEMAS

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GappyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _GraphQLHandler.log = []
    try:
        reader = ShopifyReader(
            {
                "entity": "orders",
                "transport": "http",
                "shop_url": f"http://127.0.0.1:{srv.server_port}",
                "page_size": "2",
                "max_pages": "10",
            },
            NODE_SCHEMAS["orders"],
        )
        parts = reader.partitions()
        assert len(parts) == 1  # cursor scans are serial
        rows = [r for p in parts for r in reader.read(p)]
        # all four nodes arrive — the empty middle page did not end the scan
        assert len(rows) == 4
    finally:
        srv.shutdown()
        srv.server_close()
