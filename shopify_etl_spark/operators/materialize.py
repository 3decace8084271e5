"""Tracked materialization of shared plan subtrees.

``localCheckpoint`` is how a query with a fan-out (one expensive subtree,
two+ consumers) runs that subtree ONCE: the checkpointed RDD's blocks are
computed by the first stage that needs them and every later consumer reads
the persisted blocks (VERDICT r7: without it, ``ReusedExchange`` never
fires across AQE stage boundaries and the subtree — scan included —
re-executes per consumer; ``mutual_knn_pairs`` re-scanned the embeddings
table ~12x).

The cost of a checkpoint is plan OPACITY: the consumer's DataFrame plan
is truncated at a ``Scan ExistingRDD``, so the plan-regression gate
(``tests/test_plan_gate.py``) can no longer see the subtree's scans and
shuffles. ``checkpoint_tracked`` fixes that: it records the PRE-checkpoint
DataFrame in an (opt-in) capture list, so the gate can union the final
plan with every materialized subtree's plan and assert the property the
checkpoint exists to guarantee — each source table is scanned at most
twice per executed query, no matter how many consumers hang off the
shared frame.

Use ``checkpoint_tracked`` instead of a bare ``df.localCheckpoint()``
whenever the frame has more than one downstream consumer; single-consumer
frames need no materialization at all.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Capture list for the plan gate: ``None`` (the default) means tracking is
# off and checkpoint_tracked is exactly df.localCheckpoint(eager=False).
_capture: list[DataFrame] | None = None


def checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Materialize a shared subtree once (lazy localCheckpoint: blocks are
    computed by the first consuming stage of the SAME action, then reused
    by every other consumer) and record the pre-checkpoint plan for the
    scans-per-table gate."""
    global _capture
    if _capture is not None:
        _capture.append(df)
    return df.localCheckpoint(eager=False)


@contextmanager
def capture_subtrees():
    """Record every ``checkpoint_tracked`` subtree built inside the block.

    Yields the list the pre-checkpoint DataFrames are appended to; the
    plan gate walks ``[final_plan] + [s.plan for s in subtrees]`` to count
    per-table scans across the WHOLE executed query. Nested captures are
    not supported (tests run one builder at a time)."""
    global _capture
    prev = _capture
    _capture = []
    try:
        yield _capture
    finally:
        _capture = prev
