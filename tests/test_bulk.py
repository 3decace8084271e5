"""S5 bulk-operation driver-loop tests: submit → poll → ready → download,
count validation, failure paths, and the daily-runner hook."""

import os

import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.pipeline import PipelineConfig, run_daily
from shopify_etl_spark.sources.bulk import (
    BulkOperationError,
    FakeBulkTransport,
    bulk_extract_to_dataframe,
    run_bulk_operation,
)

from tests.shopify_fixtures import gen_customer, write_envelope
import random


@pytest.fixture()
def customers_envelope(tmp_path):
    rng = random.Random(11)
    nodes = [gen_customer(rng, i) for i in range(25)]
    return write_envelope(tmp_path / "bulk_customers.json", "retail", "customers", nodes)


def test_bulk_submit_poll_download_rename(tmp_path, customers_envelope):
    transport = FakeBulkTransport(path=str(customers_envelope), running_polls=3,
                                  chunk_size=256)
    logs = []
    dest = str(tmp_path / "landing" / "customers.jsonl")
    res = run_bulk_operation(
        transport, "customers", dest, poll_interval_s=0, log=logs.append
    )
    assert res.n_records == 25
    assert res.polls == 4  # 3 RUNNING + 1 COMPLETED
    assert os.path.exists(dest)
    assert not os.path.exists(str(tmp_path / "landing" / "temp_customers.jsonl"))
    with open(dest) as f:
        assert sum(1 for _ in f) == 25
    # log line sequence mirrors the reference's (run_logs.txt:17-147)
    assert any("Ready! Objects found: 25" in m for m in logs)
    assert sum("sleeping" in m for m in logs) == 3


def test_bulk_count_mismatch_keeps_temp_not_dest(tmp_path, customers_envelope):
    transport = FakeBulkTransport(path=str(customers_envelope), running_polls=0,
                                  lie_count=5)
    dest = str(tmp_path / "customers.jsonl")
    with pytest.raises(BulkOperationError, match="record-count mismatch"):
        run_bulk_operation(transport, "customers", dest, poll_interval_s=0)
    assert not os.path.exists(dest)  # partial export never installed
    assert os.path.exists(str(tmp_path / "temp_customers.jsonl"))


def test_bulk_failed_status_raises(tmp_path, customers_envelope):
    transport = FakeBulkTransport(path=str(customers_envelope), running_polls=1,
                                  fail=True)
    with pytest.raises(BulkOperationError, match="failed"):
        run_bulk_operation(
            transport, "customers", str(tmp_path / "c.jsonl"), poll_interval_s=0
        )


def test_bulk_to_dataframe_node_contract(spark, tmp_path, customers_envelope):
    transport = FakeBulkTransport(path=str(customers_envelope))
    df = bulk_extract_to_dataframe(
        spark, transport, "customers", str(tmp_path / "c.jsonl"), poll_interval_s=0
    )
    assert df.columns == ["node"]
    assert df.count() == 25
    assert df.select(F.col("node.id")).filter("node.id IS NOT NULL").count() == 25


def test_runner_stages_from_bulk_transport(spark, tmp_path, customers_envelope):
    """The S5 runner hook: customers staged via bulk, no envelope path."""
    cfg = PipelineConfig(
        raw_paths={},
        warehouse_dir=str(tmp_path / "wh"),
        run_log_dir=str(tmp_path / "runlog"),
        stores=("retail",),
        bulk_transports={"retail_customers": FakeBulkTransport(path=str(customers_envelope))},
        bulk_poll_interval_s=0,
    )
    res = run_daily(spark, cfg, ingest_ts="2025-11-28 06:00:00")
    assert res["staging"][("retail", "customers")] is True
    assert res["merge"]["customers"] is True
    out = spark.read.parquet(f"{tmp_path}/wh/dim_customers")
    assert out.count() == 25
    # landed JSONL is in the warehouse landing zone
    assert os.path.exists(f"{tmp_path}/wh/landing/retail/customers.jsonl")
