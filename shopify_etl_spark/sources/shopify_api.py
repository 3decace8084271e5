"""Shopify connection scan as a native PySpark DataSource (S1-S4, S8).

The reference fetches Shopify GraphQL connections with a driver-side
cursor loop (reference extract_table.py:134-174) — serial, rate-limited,
everything through one process. Here the scan is a first-class Spark
datasource:

* **Partitioned scan (S1)** — page ranges become ``InputPartition``s, so
  executors fetch concurrently. (The real cursor API is serial by nature;
  production slicing uses updated_at date ranges per partition — the
  partition planner below is pluggable. The bulk-JSONL path, S5, is
  already fully parallel via ``spark.read.json``.)
* **Predicate pushdown (S2)** — ``pushFilters`` accepts
  ``updatedAt > X`` / ``>= X`` filters and compiles them into the source
  query (the reference builds ``updated_at:>'X'`` into the GraphQL query
  string, extract_table.py:183-191). Remaining filters stay in Spark.
* **Rate limiting (S8)** — a minimum interval between page fetches *per
  partition* (reference _rate_limit, extract_table.py:44-46).

Transports are pluggable and picklable (they ship to executors):
``file://`` reads an envelope fixture and simulates cursor pagination —
the test/CI path; ``GraphQLQueryBuilder`` renders the exact query the
HTTP transport would send (network is unavailable in this environment,
so the HTTP call site raises with a clear message).

Usage::

    spark.dataSource.register(ShopifyDataSource)
    df = (spark.read.format("shopify")
          .option("entity", "orders")
          .option("path", "/raw/retail/orders.json")
          .option("page_size", "100")
          .option("num_partitions", "8")
          .load()
          .filter(F.col("updatedAt") > "2025-11-20"))   # pushed to source
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..schemas import NODE_SCHEMAS


def field_selection(schema, indent: int = 0) -> str:
    """Render a GraphQL field selection from a Spark StructType.

    Reconstructs the reference's missing ``graphql_queries/`` files
    (referenced at extract_table.py:194,206,213 but absent from the tree;
    SURVEY §0 recovers them from the loaders' field accesses — which are
    exactly what NODE_SCHEMAS encodes). One source of truth: the schema
    both types the DataFrame AND prunes the columns requested from the
    API — source-side column pruning, the GraphQL analog of ReadSchema.

    Connection-shaped structs ({edges:[{node}]}) render in connection
    syntax automatically.
    """
    from pyspark.sql.types import ArrayType
    from pyspark.sql.types import StructType as ST

    pad = "  " * indent
    lines = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, ST):
            lines.append(f"{pad}{f.name} {{\n{field_selection(dt, indent + 1)}\n{pad}}}")
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, ST):
            lines.append(
                f"{pad}{f.name} {{\n{field_selection(dt.elementType, indent + 1)}\n{pad}}}"
            )
        else:
            lines.append(f"{pad}{f.name}")
    return "\n".join(lines)


def build_graphql_query(
    entity: str,
    page_size: int,
    updated_at_min: str | None,
    inclusive: bool = False,
) -> str:
    """Render the connection query with the source-side filter baked in —
    the S2 pushdown exactly as the reference builds it
    (extract_table.py:183-191: ``query: "updated_at:>'X'"``) — and the
    full field selection derived from the entity schema. ``inclusive``
    renders ``>=`` (a pushed GreaterThanOrEqual must not drop the
    boundary row)."""
    op = ">=" if inclusive else ">"
    filter_arg = (
        f", query: \"updated_at:{op}'{updated_at_min}'\"" if updated_at_min else ""
    )
    selection = field_selection(NODE_SCHEMAS[entity], indent=3)
    return (
        f"query($cursor: String) {{\n"
        f"  {entity}(first: {page_size}, after: $cursor{filter_arg}) {{\n"
        f"    edges {{\n      cursor\n      node {{\n{selection}\n      }}\n    }}\n"
        f"    pageInfo {{ hasNextPage endCursor }}\n"
        f"  }}\n}}"
    )


@dataclass
class FileTransport:
    """Envelope-fixture transport simulating cursor pagination.

    Picklable (path + scalars); each executor partition re-opens the file
    once (the parsed node list is cached per instance — a partition
    scanning P pages must not re-parse the file P times).
    ``updated_at_min`` is applied source-side, mirroring a server that
    filters before paginating; ``inclusive`` distinguishes a pushed
    ``>=`` from ``>`` so boundary rows aren't silently dropped.
    """

    path: str
    page_size: int = 100
    updated_at_min: str | None = None
    inclusive: bool = False

    def _nodes(self) -> list[dict]:
        cached = getattr(self, "_node_cache", None)
        if cached is not None:
            return cached
        with open(self.path) as f:
            doc = json.load(f)
        nodes = [e["node"] for e in doc.get("data", [])]
        if self.updated_at_min:
            if self.inclusive:
                nodes = [
                    n for n in nodes if (n.get("updatedAt") or "") >= self.updated_at_min
                ]
            else:
                nodes = [
                    n for n in nodes if (n.get("updatedAt") or "") > self.updated_at_min
                ]
        self._node_cache = nodes
        return nodes

    def page_count(self) -> int:
        n = len(self._nodes())
        return max((n + self.page_size - 1) // self.page_size, 1)

    def fetch_page(self, page_idx: int) -> list[dict]:
        nodes = self._nodes()
        return nodes[page_idx * self.page_size : (page_idx + 1) * self.page_size]

    def scan_exhausted(self) -> bool:
        """A slice scan has known extent: an empty page IS the end."""
        return True


class HttpTransport:
    """Cursor-paginated GraphQL connection scan over real HTTP (stdlib
    urllib — no extra deps). The live twin of the reference's driver-side
    cursor loop (reference extract_table.py:134-174): POST the rendered
    query with a ``$cursor`` variable, follow ``pageInfo.endCursor`` until
    ``hasNextPage`` is false.

    A connection API is SERIAL by nature — page ``i``'s cursor comes from
    page ``i-1``'s response — so the instance caches the cursor chain and
    ``fetch_page(i)`` walks forward from the nearest known cursor (a
    partition reading pages in order never re-fetches). ``page_count`` is
    unknowable up front and reports the configured cap; the reader plans a
    SINGLE partition for this transport (parallelism for live APIs comes
    from updated_at-range slicing or the bulk-JSONL path, not page ranges).

    Picklable (scalars + dicts only), like every transport — it ships to
    executors inside the InputPartition read closure.
    """

    def __init__(
        self,
        shop_url: str,
        token: str,
        entity: str,
        page_size: int = 100,
        max_pages: int = 1000,
        updated_at_min: str | None = None,
        inclusive: bool = False,
    ):
        self.shop_url, self.token = shop_url.rstrip("/"), token
        self.entity, self.page_size = entity, page_size
        self.max_pages = max_pages
        self.updated_at_min = updated_at_min
        self.inclusive = inclusive
        self._cursors: dict[int, str | None] = {0: None}
        self._end: int | None = None  # first page index past the data
        # set by the reader's rate limiter: its post-sleep monotonic
        # stamp, echoed in the X-Client-Send header so a test (or a
        # server-side audit) can verify S8's spacing guarantee on the
        # CLIENT's clock — server-arrival gaps wobble with socket and
        # thread scheduling under load, the limiter's own stamps cannot
        # (tests/test_http_transport.py was load-flaky on arrivals).
        self._send_stamp: float | None = None

    def query_for_page(self) -> str:
        return build_graphql_query(
            self.entity, self.page_size, self.updated_at_min, self.inclusive
        )

    #: (retries, base backoff seconds) for throttle/server errors — the
    #: Admin API throttles routinely, so a single 429 must not abort a
    #: scan (reference extract_table.py retry loop).
    MAX_RETRIES = 4
    BACKOFF_S = 0.5

    def _post(self, cursor: str | None) -> dict:
        import urllib.error
        import urllib.request

        body = json.dumps(
            {"query": self.query_for_page(), "variables": {"cursor": cursor}}
        ).encode("utf-8")
        headers = {
            "Content-Type": "application/json",
            "X-Shopify-Access-Token": self.token,
        }
        if self._send_stamp is not None:
            headers["X-Client-Send"] = repr(self._send_stamp)
        for attempt in range(self.MAX_RETRIES + 1):
            req = urllib.request.Request(
                f"{self.shop_url}/admin/api/graphql.json",
                data=body,
                headers=headers,
            )
            delay = self.BACKOFF_S * (2 ** attempt)
            try:
                with urllib.request.urlopen(req) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                # 429 / 5xx are transient on the Admin API: back off and
                # retry, honoring Retry-After when the server names a wait.
                if e.code == 429 or e.code >= 500:
                    if attempt == self.MAX_RETRIES:
                        raise
                    retry_after = (e.headers or {}).get("Retry-After")
                    try:
                        delay = max(float(retry_after), 0.0)
                    except (TypeError, ValueError):
                        pass
                    time.sleep(delay)
                    continue
                raise
            errors = payload.get("errors")
            if errors and payload.get("data") is None:
                # GraphQL-level failure arrives as HTTP 200 — either with
                # no 'data' key at all or (the spec-compliant execution-
                # error shape) with an explicit "data": null, so the gate
                # is data-is-None, not key-absence. THROTTLED is the
                # in-band twin of 429 — retry; anything else (bad query,
                # auth) is permanent and must surface descriptively
                # instead of a TypeError on the null 'data'.
                codes = {
                    (e.get("extensions") or {}).get("code")
                    for e in errors
                    if isinstance(e, dict)
                }
                if "THROTTLED" in codes and attempt < self.MAX_RETRIES:
                    time.sleep(delay)
                    continue
                msgs = "; ".join(
                    str(e.get("message", e)) if isinstance(e, dict) else str(e)
                    for e in errors
                )
                raise RuntimeError(
                    f"GraphQL errors from {self.shop_url} ({self.entity}): {msgs}"
                )
            return payload
        raise RuntimeError(f"unreachable retry fall-through for {self.shop_url}")

    def page_count(self) -> int:
        return self.max_pages

    def fetch_page(self, page_idx: int) -> list[dict]:
        if self._end is not None and page_idx >= self._end:
            return []
        nodes: list[dict] = []
        start = max(i for i in self._cursors if i <= page_idx)
        for i in range(start, page_idx + 1):
            if self._end is not None and i >= self._end:
                return []
            conn = self._post(self._cursors[i])["data"][self.entity]
            nodes = [e["node"] for e in conn["edges"]]
            info = conn.get("pageInfo") or {}
            if info.get("hasNextPage"):
                self._cursors[i + 1] = info.get("endCursor")
            else:
                self._end = i + 1
        return nodes

    def scan_exhausted(self) -> bool:
        """True only once pageInfo reported the connection's real end. A
        filtered connection can legally answer an EMPTY page with
        ``hasNextPage`` still true — treating that as the end would
        silently truncate the scan instead of following the cursor."""
        return self._end is not None


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class ShopifyReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema
        self.entity = options.get("entity", "orders")
        self.page_size = int(options.get("page_size", "100"))
        self.num_partitions = int(options.get("num_partitions", "4"))
        self.rate_limit_s = float(options.get("rate_limit_s", "0"))
        self.max_pages = int(options.get("max_pages", "1000"))  # S1 page cap
        self.updated_at_min: str | None = options.get("updated_at_min")
        # option-provided bounds mirror the reference's > semantics
        self.inclusive: bool = options.get("updated_at_inclusive", "false") == "true"

    def _transport(self):
        if self.options.get("transport", "file") == "http":
            return HttpTransport(
                shop_url=self.options["shop_url"],
                token=self.options.get("token", ""),
                entity=self.entity,
                page_size=self.page_size,
                max_pages=self.max_pages,
                updated_at_min=self.updated_at_min,
                inclusive=self.inclusive,
            )
        return FileTransport(
            path=self.options["path"],
            page_size=self.page_size,
            updated_at_min=self.updated_at_min,
            inclusive=self.inclusive,
        )

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (Spark API name)
        """Consume updatedAt lower-bound filters (S2); everything else
        stays in Spark. Column paths arrive as tuples like ('updatedAt',).
        Strictness is tracked per bound: consuming a >= filter but
        applying > at the source would silently drop boundary rows."""
        remaining = []
        for f in filters:
            if (
                isinstance(f, (GreaterThan, GreaterThanOrEqual))
                and tuple(f.attribute) == ("updatedAt",)
                and isinstance(f.value, str)
            ):
                inclusive = isinstance(f, GreaterThanOrEqual)
                # keep the tightest bound: higher value wins; at equal
                # values the strict (>) bound is tighter than >=
                if (
                    self.updated_at_min is None
                    or f.value > self.updated_at_min
                    or (f.value == self.updated_at_min and not inclusive)
                ):
                    self.updated_at_min = f.value
                    self.inclusive = inclusive
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        pages = min(self._transport().page_count(), self.max_pages)
        # A live cursor API is serial (page i needs page i-1's cursor):
        # splitting its page range across executors would make every
        # partition re-walk the chain from 0. One partition; parallel
        # live extraction belongs to updated_at-range slicing or S5 bulk.
        n = 1 if self.options.get("transport") == "http" else min(
            self.num_partitions, pages
        )
        per = (pages + n - 1) // n
        return [_PageRange(i * per, min((i + 1) * per, pages)) for i in range(n)]

    def read(self, partition: _PageRange):
        transport = self._transport()
        last_fetch = 0.0
        for page in range(partition.start, partition.end):
            # S8 rate limit: minimum interval between page fetches
            if self.rate_limit_s > 0:
                wait = self.rate_limit_s - (time.monotonic() - last_fetch)
                if wait > 0:
                    time.sleep(wait)
            last_fetch = time.monotonic()
            # export the limiter's stamp so the transport can echo it
            # (X-Client-Send): successive stamps are >= rate_limit_s
            # apart by construction — the verifiable S8 guarantee
            if hasattr(transport, "_send_stamp"):
                transport._send_stamp = last_fetch
            nodes = transport.fetch_page(page)
            if not nodes:
                # Stop only when the TRANSPORT says the data ended (slice
                # scans: any empty page; cursor scans: pageInfo reported
                # the real end) — a live filtered connection can answer an
                # empty page mid-stream with more pages behind it. The
                # break also keeps the rate limiter from sleeping through
                # every phantom page to the cap.
                if transport.scan_exhausted():
                    break
                continue
            for node in nodes:
                yield _node_to_tuple(node, self.schema)


def _node_to_tuple(value, dtype):
    """Recursively convert a node dict to a tuple matching the schema
    (Spark's Python datasource consumes tuples/Rows, not dicts)."""
    from pyspark.sql.types import ArrayType
    from pyspark.sql.types import StructType as ST

    if value is None:
        return None
    if isinstance(dtype, ST):
        return tuple(
            _node_to_tuple(value.get(f.name), f.dataType) for f in dtype.fields
        ) if isinstance(value, dict) else None
    if isinstance(dtype, ArrayType):
        return [_node_to_tuple(v, dtype.elementType) for v in value]
    if dtype.typeName() in ("integer", "long"):
        return int(value) if value is not None else None
    return value


class ShopifyStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch scan: each micro-batch pulls the nodes
    whose ``updatedAt`` is strictly after the last committed offset — the
    source-level analog of the reference's persisted watermark loop
    (daily_scheduler cron + run-log ``source_updated_at``), but with the
    offset managed by the streaming checkpoint instead of a run-log
    table.

    Offsets are ``{"updated_at": <max seen>}``; ``readBetweenOffsets``
    re-derives exactly the committed interval from the source on replay,
    which is what makes checkpoint recovery exactly-once (pinned in
    tests: restart re-emits nothing, a grown source emits only the
    delta).
    """

    def __init__(self, options: dict, schema: StructType):
        self.options, self.schema = options, schema
        self.page_size = int(options.get("page_size", "100"))
        # backpressure: cap records per micro-batch. The offset is an
        # updatedAt watermark, so the cap stretches to the next timestamp
        # boundary — rows sharing an updatedAt can never straddle batches
        # (splitting them would make the offset ambiguous on replay).
        self.max_records = int(options.get("stream_max_records", "0"))

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"updated_at": ""}

    def _nodes(self, lo: str, hi: str | None = None) -> list[dict]:
        transport = FileTransport(
            path=self.options["path"],
            page_size=self.page_size,
            updated_at_min=lo or None,
            inclusive=False,
        )
        nodes = sorted(transport._nodes(), key=lambda n: n.get("updatedAt") or "")
        if hi is not None:
            nodes = [n for n in nodes if (n.get("updatedAt") or "") <= hi]
        return nodes

    def read(self, start: dict):
        nodes = self._nodes(start["updated_at"])
        if not nodes:
            return iter([]), start
        if self.max_records and len(nodes) > self.max_records:
            cut = self.max_records
            cut_ts = nodes[cut - 1].get("updatedAt") or ""
            while cut < len(nodes) and (nodes[cut].get("updatedAt") or "") == cut_ts:
                cut += 1  # stretch to the timestamp boundary
            nodes = nodes[:cut]
        hi = max(n.get("updatedAt") or "" for n in nodes)
        rows = [_node_to_tuple(n, self.schema) for n in nodes]
        return iter(rows), {"updated_at": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        nodes = self._nodes(start["updated_at"], end["updated_at"])
        return iter([_node_to_tuple(n, self.schema) for n in nodes])


class ShopifyDataSource(DataSource):
    """``spark.read.format("shopify")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "shopify"

    def schema(self) -> StructType:
        return NODE_SCHEMAS[self.options.get("entity", "orders")]

    def reader(self, schema: StructType) -> ShopifyReader:
        return ShopifyReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> ShopifyStreamReader:  # noqa: N802
        return ShopifyStreamReader(dict(self.options), schema)
