"""Raw-zone JSON sources.

Two shapes, matching the reference's persistence formats:

* **Envelope** ``{metadata:{...}, data:[{node:...}]}`` — one JSON document
  per extraction batch (reference extract_table.py:231-241, S6 loaders at
  incremental_loaders.py:115-120). Read with an explicit schema
  (never inferred — inference is a full extra pass and nondeterministic
  under drift), then ``explode(data)`` to one row per node.
* **Bulk JSONL** — one node per line (the bulk-operations path observed
  at reference run_logs.txt:143-147, S5). Native ``spark.read.json``:
  line-splittable, so a 100 TB export parallelizes across executors with
  no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import NODE_SCHEMAS, envelope_schema


def read_envelope(spark: SparkSession, path: str, entity: str) -> DataFrame:
    """Envelope file(s) → one row per node (+ metadata columns).

    ``multiLine=True`` because the envelope is a single JSON document;
    fine for raw-zone batch files (each file is one task). The bulk/scale
    path is ``read_jsonl``.
    """
    raw = spark.read.json(path, schema=envelope_schema(entity), multiLine=True)
    return raw.select(
        F.col("metadata.store_type").alias("_store_type"),
        F.col("metadata.entity_type").alias("_entity_type"),
        F.col("metadata.extracted_at").alias("_extracted_at"),
        F.explode("data").alias("edge"),
    ).select("_store_type", "_entity_type", "_extracted_at", F.col("edge.node").alias("node"))


def read_jsonl(
    spark: SparkSession, path: str, entity: str, keep_corrupt: bool = False
) -> DataFrame:
    """Bulk JSONL (one node per line) → one row per node.

    ``keep_corrupt=True`` adds a ``_corrupt_record`` column carrying the
    raw text of unparseable lines (PERMISSIVE mode) so bad data is
    *reported*, not silently nulled — the drift-visibility upgrade over
    the reference's silent column drops (SURVEY §7.4 risk 4). Callers
    split on ``_corrupt_record IS NULL`` and route the rest to a
    quarantine sink.
    """
    if keep_corrupt:
        from pyspark.sql.types import StringType, StructField, StructType

        # Copy, never .add() on the registry schema: StructType.add MUTATES
        # in place and would pollute the shared NODE_SCHEMAS entry.
        schema = StructType(
            list(NODE_SCHEMAS[entity].fields)
            + [StructField("_corrupt_record", StringType(), True)]
        )
        raw = spark.read.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(path, schema=schema)
        node_cols = [f.name for f in NODE_SCHEMAS[entity].fields]
        out = raw.select(
            F.struct(*node_cols).alias("node"), F.col("_corrupt_record")
        )
        # Spark forbids queries that reference ONLY the corrupt-record
        # column of a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
        # CORRUPT_RECORD_COLUMN); caching the parsed frame is the
        # documented remedy and what a quarantine split needs anyway
        # (both halves read the same parse).
        return out.cache()
    return spark.read.json(path, schema=NODE_SCHEMAS[entity]).select(
        F.struct("*").alias("node")
    )
