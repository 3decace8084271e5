"""S5 — bulk-operation driver loop: submit → poll → stream-download → read.

The reference runs Shopify bulk operations as a first-class extraction
path (observed at reference run_logs.txt:17-147: "Starting bulk operation
for customers..." → "Waiting for Shopify to prepare the file..." →
"Status: RUNNING... sleeping 15s" ×N → "Ready! Objects found: 383165" →
"Streaming download to …/temp_customers_<ts>.jsonl..." → "Saved safely
to: …/customers_<ts>.jsonl"). The driver code itself is absent from the
reference tree, so the log line sequence is the contract this module
re-implements:

* submit returns an operation id; the API prepares a JSONL export
  asynchronously.
* poll every ``poll_interval_s`` until status COMPLETED (with an object
  count and a download url), FAILED, or ``timeout_s``.
* stream-download in chunks to a ``temp_`` sibling — never the final
  name — then validate the line count against the reported object count
  and atomically rename. A crashed download leaves only a temp file;
  re-runs overwrite it.
* the landed JSONL is line-splittable, so the Spark read
  (``read_jsonl``) parallelizes across executors with no driver
  involvement — this is why bulk is the 100 TB extraction path while the
  cursor scan (shopify_api.py) stays the incremental path.

Transports are pluggable; ``FakeBulkTransport`` simulates the API from
an envelope fixture with configurable poll latency (the test/CI path,
same seam as ``FileTransport``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .json_raw import read_jsonl


class BulkOperationError(RuntimeError):
    pass


@dataclass
class FakeBulkTransport:
    """Simulated bulk-operation API backed by an envelope fixture.

    ``submit`` snapshots the fixture's nodes as JSONL content;
    ``poll`` reports RUNNING for ``running_polls`` calls, then COMPLETED
    with the object count and an opaque download url; ``download`` yields
    the content in ``chunk_size``-byte chunks. ``fail`` makes the
    operation end FAILED (error-path testing); ``lie_count`` inflates the
    reported object count (count-validation testing).
    """

    path: str
    running_polls: int = 2
    chunk_size: int = 1 << 16
    fail: bool = False
    lie_count: int = 0
    _ops: dict = field(default_factory=dict)

    def submit(self, entity: str) -> str:
        with open(self.path) as f:
            doc = json.load(f)
        lines = [json.dumps(e["node"]) for e in doc.get("data", [])]
        op_id = f"gid://shopify/BulkOperation/{len(self._ops) + 1}"
        self._ops[op_id] = {"lines": lines, "polls": 0, "entity": entity}
        return op_id

    def poll(self, op_id: str) -> dict:
        op = self._ops[op_id]
        op["polls"] += 1
        if op["polls"] <= self.running_polls:
            return {"status": "RUNNING"}
        if self.fail:
            return {"status": "FAILED", "errorCode": "INTERNAL_SERVER_ERROR"}
        return {
            "status": "COMPLETED",
            "objectCount": len(op["lines"]) + self.lie_count,
            "url": op_id,  # opaque handle; download() resolves it
        }

    def download(self, url: str):
        payload = ("\n".join(self._ops[url]["lines"]) + "\n").encode()
        for i in range(0, len(payload), self.chunk_size):
            yield payload[i : i + self.chunk_size]


@dataclass
class BulkResult:
    path: str
    n_records: int
    polls: int
    elapsed_s: float


def run_bulk_operation(
    transport,
    entity: str,
    dest_path: str,
    poll_interval_s: float = 15.0,
    timeout_s: float = 3600.0,
    validate_count: bool = True,
    log=None,
) -> BulkResult:
    """Drive one bulk operation end-to-end (run_logs.txt:17-147 semantics).

    Submit, poll every ``poll_interval_s`` (the reference sleeps 15 s,
    run_logs.txt:19), stream-download to ``<dir>/temp_<name>`` and
    atomically rename to ``dest_path`` only after the line count matches
    the reported object count — a partial download can never be mistaken
    for a completed export.
    """
    say = log or (lambda msg: None)
    t0 = time.monotonic()
    op_id = transport.submit(entity)
    say(f"Starting bulk operation for {entity}...")
    say("Waiting for the export file...")

    polls = 0
    while True:
        status = transport.poll(op_id)
        polls += 1
        if status["status"] == "COMPLETED":
            break
        if status["status"] == "FAILED":
            raise BulkOperationError(
                f"bulk operation {op_id} failed: {status.get('errorCode')}"
            )
        if time.monotonic() - t0 > timeout_s:
            raise BulkOperationError(
                f"bulk operation {op_id} still {status['status']} after {timeout_s}s"
            )
        say(f"Status: {status['status']}... sleeping {poll_interval_s}s")
        time.sleep(poll_interval_s)

    expected = int(status["objectCount"])
    say(f"Ready! Objects found: {expected}")

    dest_dir, dest_name = os.path.split(dest_path)
    if dest_dir:
        os.makedirs(dest_dir, exist_ok=True)
    tmp_path = os.path.join(dest_dir, f"temp_{dest_name}")
    say(f"Streaming download to {tmp_path}...")
    n_lines = 0
    with open(tmp_path, "wb") as out:
        tail = b""
        for chunk in transport.download(status["url"]):
            out.write(chunk)
            n_lines += chunk.count(b"\n")
            tail = chunk[-1:] if chunk else tail
        if tail not in (b"", b"\n"):  # unterminated final line still counts
            n_lines += 1

    if validate_count and n_lines != expected:
        raise BulkOperationError(
            f"record-count mismatch: downloaded {n_lines} lines, "
            f"operation reported {expected} objects — keeping {tmp_path} "
            f"for inspection, not installing {dest_path}"
        )
    os.replace(tmp_path, dest_path)
    say(f"Saved safely to: {dest_path}")
    return BulkResult(
        path=dest_path,
        n_records=n_lines,
        polls=polls,
        elapsed_s=round(time.monotonic() - t0, 3),
    )


def bulk_extract_to_dataframe(
    spark: SparkSession,
    transport,
    entity: str,
    dest_path: str,
    poll_interval_s: float = 15.0,
    timeout_s: float = 3600.0,
) -> DataFrame:
    """Full S5 path: drive the bulk operation, then hand the landed JSONL
    to the parallel reader — the node-contract frame the flatten layer
    consumes (same contract as ``read_envelope``)."""
    run_bulk_operation(
        transport, entity, dest_path, poll_interval_s=poll_interval_s,
        timeout_s=timeout_s,
    )
    return read_jsonl(spark, dest_path, entity)
