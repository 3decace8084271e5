"""Tracked materialization of shared plan subtrees.

A query with a fan-out (one expensive subtree, two+ consumers) must run
that subtree ONCE — AQE never fires ``ReusedExchange`` across stage
boundaries for these shapes (VERDICT r7: without a materialization,
``mutual_knn_pairs`` re-scanned the embeddings table ~12x).

Mechanism (r17): ``df.persist()``. The r7–r16 implementation was a lazy
``localCheckpoint(eager=False)``, which has the same compute-once
execution semantics but a hidden DRIVER cost: constructing the
checkpointed Dataset calls ``queryExecution.toRdd``, which runs the full
analyzer/optimizer/physical-planning (and whole-stage codegen) pipeline
for the subtree AT BUILD TIME, serially, before any job starts. Measured
across the r17 catalog sweep that planning was ~1s per checkpoint call
per run — ~45% of total bench wall was driver-side query construction.
``persist()`` just registers the plan with the CacheManager (no planning
at build); the first action plans it once, materializes the
InMemoryRelation on first touch, and every other consumer reads the
cached blocks — identical execution sharing, zero build-time planning.
It also keeps lineage (a lost cached block recomputes from source —
strictly better fault behavior at 100 TB than a lineage-truncating
localCheckpoint, whose lost blocks are unrecoverable), and the cache is
storage-evictable under memory pressure where checkpoint blocks are not.
Subtrees whose recomputation would be NON-deterministic (RangePartitioner
sampling, ``spark_partition_id`` layouts) must keep an eager
``localCheckpoint`` — see ``operators/indexing.py`` — because an evicted
cache partition recomputes; everything materialized through this module
is deterministic by the engine's oracle discipline.

Plan visibility: a persisted subtree appears in consumer plans as an
``InMemoryRelation`` block (the checkpoint's ``Scan ExistingRDD`` hid it
entirely). The plan gate (``tests/test_plan_gate.py``) strips those
blocks before counting — the cached subtree executes once, and the gate
audits it through the capture list exactly as it audited checkpointed
subtrees. ``checkpoint_tracked`` records the pre-persist DataFrame in an
(opt-in) capture list so the gate can union the final plan with every
materialized subtree's plan and assert each source table is scanned at
most twice per executed query.

Use ``checkpoint_tracked`` (or ``persist_shared`` where gate capture is
not wanted) instead of a bare materialization whenever the frame has more
than one downstream consumer; single-consumer frames need none at all.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Capture list for the plan gate: ``None`` (the default) means tracking is
# off and checkpoint_tracked is exactly df.persist().
_capture: list[DataFrame] | None = None


def persist_shared(df: DataFrame) -> DataFrame:
    """Materialize a shared subtree once (lazy ``persist()``: the cache is
    registered now, planned once at the first action, computed by the
    first consuming stage, then reused by every other consumer) WITHOUT
    recording it for the plan gate — the drop-in replacement for the
    former bare ``localCheckpoint(eager=False)`` call sites."""
    return df.persist()


def checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Materialize a shared subtree once (see module docstring) and record
    the pre-persist plan for the scans-per-table gate.

    The capture snapshots the subtree's physical-plan STRING eagerly,
    BEFORE ``persist()`` registers the plan with the CacheManager — after
    registration the same analyzed plan re-plans as a bare
    ``InMemoryTableScan`` and the gate would see no scans at all. Eager
    planning here costs nothing in production: ``_capture`` is only
    non-None inside the test-only ``capture_subtrees`` block."""
    global _capture
    if _capture is not None:
        jvm = df.sparkSession._jvm
        _capture.append(
            jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
    return df.persist()


@contextmanager
def capture_subtrees():
    """Record every ``checkpoint_tracked`` subtree built inside the block.

    Yields the list the pre-persist physical-plan STRINGS are appended
    to; the plan gate walks ``[final_plan] + subtrees`` to count
    per-table scans across the WHOLE executed query. Nested captures are
    not supported (tests run one builder at a time)."""
    global _capture
    prev = _capture
    _capture = []
    try:
        yield _capture
    finally:
        _capture = prev
