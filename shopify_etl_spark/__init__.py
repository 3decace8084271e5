"""shopify_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``vivek-neenopal/shopify-etl``
(see SURVEY.md): nested-document flattening, two-store merge semantics
(union / window-dedup / anti-join priority fill / upsert / delete-reload /
snapshot), incremental watermark orchestration — plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns).

Everything is declared through the DataFrame API / Spark SQL so Catalyst +
Tungsten plan the physical execution (predicate pushdown, column pruning,
broadcast joins, AQE, whole-stage codegen). No RDDs, no driver-side loops.
"""

__version__ = "0.1.0"
