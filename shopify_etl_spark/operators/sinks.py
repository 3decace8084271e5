"""Sinks: raw-zone JSON envelope writer (K1), JDBC bulk writer (K2),
bucketed warehouse tables (co-located joins).

K1/K2 cite SURVEY.md §2.2 (reference extract_table.py:217-244 /
incremental_loaders.py:100-109).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_json_envelope(
    nodes: DataFrame, path: str, store: str, entity: str, shop_name: str | None = None
) -> str:
    """K1 — persist a batch as the reference's raw envelope
    ``{metadata:{...}, data:[{node}]}`` (extract_table.py:231-241).

    Executor-side: each partition serializes its nodes to JSONL in
    parallel; the driver then assembles the (small) envelope header + the
    collected lines. Raw-zone parity format — the scale path remains
    plain JSONL (``df.write.json``), which needs no driver assembly.
    """
    rows = nodes.select(F.to_json("node").alias("j")).collect()
    doc = {
        "metadata": {
            "store_type": store,
            "entity_type": entity,
            "extracted_at": datetime.now(timezone.utc).isoformat(),
            "record_count": len(rows),
            "shop_name": shop_name or f"{store}-shop",
        },
        "data": [{"cursor": f"c{i}", "node": json.loads(r.j)} for i, r in enumerate(rows)],
    }
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(doc))
    return str(p)


def write_jsonl(nodes: DataFrame, path: str) -> None:
    """K1 scale path — bulk JSONL, fully parallel, no driver assembly."""
    nodes.select(F.to_json("node").alias("value")).write.mode("overwrite").text(path)


def write_jdbc(
    df: DataFrame, url: str, table: str, batchsize: int = 5000, mode: str = "append", **props
) -> None:
    """K2 — chunked bulk insert to an RDBMS (the reference's pandas
    ``to_sql(chunksize=5000, method='multi')``,
    incremental_loaders.py:100-109). ``batchsize`` maps 1:1; each
    partition opens its own connection, so total parallelism =
    partitions × batchsize. No database exists in this environment, so
    this is exercised only for option plumbing."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in props.items():
        writer = writer.option(k, str(v))
    writer.mode(mode).save()


def save_bucketed(
    df: DataFrame, table: str, bucket_cols, n_buckets: int = 32, sort_cols=None
) -> None:
    """Bucketed warehouse table: pre-shuffles once at write time so every
    future equi-join/aggregation on ``bucket_cols`` is exchange-free on
    this side — the classic 100 TB trick for fact-fact joins that repeat
    daily (orders ⋈ order_items on order_id).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join_is_exchange_free(spark: SparkSession, left: str, right: str, key: str) -> bool:
    """Plan probe: join two bucketed tables and report whether the plan
    contains any Exchange (it must not when bucket counts match)."""
    j = spark.table(left).join(spark.table(right), key)
    plan = j._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
