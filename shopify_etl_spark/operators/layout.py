"""Data-layout operators: range/sort and z-order clustering for parquet
min/max file skipping.

Partition pruning handles the coarse dimension (e.g. snapshot day,
`operators/merge.py`); within a partition, the scan planner skips whole
files/row-groups whose footer min/max can't satisfy a pushed filter —
but only if the write LAYOUT made those ranges narrow. These operators
produce that layout:

* :func:`write_range_layout` — ``repartitionByRange`` + in-file sort on
  one ordering; perfect skipping on the leading column(s), none on
  others. The right choice when one predicate dominates (time-series).
* :func:`zorder_key` / :func:`write_zorder_layout` — bit-interleaved
  Morton key over two int dimensions; each file covers a compact region
  of BOTH, so either predicate alone skips most files. The standard
  multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER) as
  a plain Spark expression — no table format required.
* :func:`file_skipping_report` — reads parquet footers (pyarrow, driver-
  side metadata only — no data IO) and reports each file's min/max per
  column plus the fraction of files a given point/range predicate could
  skip. This is the observability half: layout quality as a number, not
  a hope.

Everything here is public-API Spark + pyarrow; the z-order fold compiles
as a loop (see the codegen-compile trap on wide unrolled expressions).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(x: str | Column, y: str | Column, bits: int = 21) -> Column:
    """Morton (z-order) key: interleave the low ``bits`` bits of two
    non-negative int columns into one long (x even positions, y odd).

    21+21 bits fit a LongType with room; values are clamped to the bit
    budget so outliers degrade to coarse clustering instead of wrapping.
    The interleave is a fold over bit positions, not a 42-term unrolled
    OR chain — the unrolled form costs seconds of whole-stage-codegen
    compile per cold query.
    """
    cap = F.lit((1 << bits) - 1)
    xv = F.least(F.col(x).cast("long") if isinstance(x, str) else x.cast("long"), cap)
    yv = F.least(F.col(y).cast("long") if isinstance(y, str) else y.cast("long"), cap)
    pair = F.struct(xv.alias("x"), yv.alias("y"))

    def step(acc: Column, i: Column) -> Column:
        xbit = F.call_function("shiftright", pair.getField("x"), i.cast("int")).bitwiseAND(F.lit(1))
        ybit = F.call_function("shiftright", pair.getField("y"), i.cast("int")).bitwiseAND(F.lit(1))
        return (
            acc.bitwiseOR(F.call_function("shiftleft", xbit, (i * 2).cast("int")))
            .bitwiseOR(F.call_function("shiftleft", ybit, (i * 2 + 1).cast("int")))
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)), F.lit(0).cast("long"), step
    )


def write_range_layout(
    df: DataFrame, path: str, cols: list[str], n_files: int = 32
) -> None:
    """Range-partition on ``cols`` and sort within files: disjoint
    per-file min/max on the leading column → near-perfect skipping for
    predicates on it."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int = 32,
    bits: int = 21,
) -> None:
    """Cluster files along the Morton curve of (x, y): ranges stay
    narrow on BOTH columns, so single-column predicates on either one
    skip most files. The key is dropped before write — layout is a
    physical property, not a schema change."""
    keyed = df.withColumn("_zk", zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zk"))
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into right-sized files (the small-file
    compaction every streaming sink eventually needs — epoch/micro-batch
    appends produce file counts that grow with trigger frequency, and
    at scale the NameNode/listing/task-scheduling overhead of tiny files
    dominates the read cost).

    Atomic: writes to a ``_compact_tmp`` sibling, swaps directories on
    success (same tmp-swap discipline as ``pipeline.runner``'s
    ``atomic_overwrite``). Optional ``sort_cols`` re-establishes a
    range layout in the same pass (compaction is the natural moment to
    fix layout). Returns {files_before, files_after, rows}.
    """
    import glob
    import shutil

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    n_files = max(1, (rows + target_rows_per_file - 1) // target_rows_per_file)

    tmp = path.rstrip("/") + "_compact_tmp"
    if sort_cols:
        write_range_layout(df, tmp, sort_cols, n_files=n_files)
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    old = path.rstrip("/") + "_compact_old"
    shutil.move(path, old)
    try:
        shutil.move(tmp, path)
    except Exception:
        shutil.move(old, path)  # roll back: original stays live
        raise
    shutil.rmtree(old)
    files_after = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def file_skipping_report(path: str, column: str) -> list[dict]:
    """Per-file [min, max] of ``column`` from parquet footers only
    (driver-side metadata read — this is what a scan planner sees)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                col = grp.column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                s = col.statistics
                lo = s.min if lo is None or s.min < lo else lo
                hi = s.max if hi is None or s.max > hi else hi
        out.append({"file": name, "min": lo, "max": hi})
    return out


def skippable_fraction(report: list[dict], point) -> float:
    """Fraction of files whose footer range excludes ``point`` — i.e.
    what an equality predicate on that value could skip without reading
    data."""
    files = [r for r in report if r["min"] is not None]
    if not files:
        return 0.0
    skipped = sum(1 for r in files if not (r["min"] <= point <= r["max"]))
    return skipped / len(files)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a BUCKETED managed table: rows are hashed
    on ``bucket_col`` into ``n_buckets`` files per partition at WRITE
    time, so any later equi-join or aggregation on that column reads
    co-located data and plans with ZERO Exchange on the bucketed side —
    the big-fact-join answer when broadcast is impossible (both sides
    huge) and per-query repartition would shuffle the table every time.

    This is the pay-once-shuffle-forever layout decision: at 100 TB the
    fact tables are written bucketed by their join key (order id /
    customer id) and every downstream merge/upsert/rollup on that key
    skips its shuffle. ``sort_col`` additionally sorts within buckets
    (sort-merge joins then skip the sort too). Spark requires
    ``saveAsTable`` for bucketing (the bucket spec lives in the
    catalog, not the files).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
