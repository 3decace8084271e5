"""Interchange-format round-trips: parquet / ORC / JSON-lines / CSV.

The warehouse default everywhere in this engine is parquet (columnar,
typed, min/max footers for file skipping). Real pipelines still touch
the other three at the edges — ORC from Hive-era warehouses, JSONL and
CSV from vendor drops — so this module pins the round-trip contracts:

* **parquet / ORC** — self-describing and type-complete: a round-trip
  needs no schema and preserves decimals, dates, timestamps and nested
  arrays/structs exactly. Reading either is the same columnar scan
  machinery (pushdown + pruning both apply).
* **JSONL** — schema-on-read: types must be SUPPLIED back (otherwise
  Spark infers longs/doubles and decimal precision silently widens);
  nested arrays survive, binary does not (no JSON encoding).
* **CSV** — flat rows only: complex types (array/map/struct) are
  REJECTED at write by Spark, and we surface that contract instead of
  stringifying data behind the caller's back. Decimals/dates/timestamps
  survive only because the reader re-applies the writer's schema.

``write_table``/``read_table`` are thin wrappers whose value is the
schema handling + the pinned tests (`tests/test_formats.py`): value
parity across every format that claims a type, loud failure where a
format can't represent the data. Reference analog: the reference moves
CSV/JSON payloads into staging tables (extract_table.py); here every
format lands in the same DataFrame contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

#: formats whose files carry their own complete type information
SELF_DESCRIBING = ("parquet", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite).

    CSV writes get a header row (column names survive) and explicit
    timestamp formatting; complex-typed columns make Spark raise — by
    design, see module docstring.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        )
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``; ``schema`` is REQUIRED for the
    schema-on-read formats (json/csv) — inference would silently widen
    decimals to double and strings to longs, which is exactly the kind
    of quiet corruption a staging layer must not introduce."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt)
    if fmt in SELF_DESCRIBING:
        if schema is not None:
            r = r.schema(schema)
    else:
        if schema is None:
            raise ValueError(
                f"{fmt} is schema-on-read: pass the writer's schema "
                "(inference widens types silently)"
            )
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        )
    return r.load(path)


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time): ``mergeSchema`` unions the file
    footers, and rows from files that predate a column read NULL for it.

    The contract this wrapper pins (tests/test_formats.py): ADDING a
    column is safe and retroactively nullable; CHANGING a column's type
    fails the read loudly (Spark refuses to merge int vs string) —
    never a silent cast. Schema merging reads every file footer, so at
    100 TB prefer declaring the target schema explicitly once known;
    this path is for the discovery/backfill window where the writer
    fleet is mid-migration.
    """
    return spark.read.option("mergeSchema", True).parquet(path)
