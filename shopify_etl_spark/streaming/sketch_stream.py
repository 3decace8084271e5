"""Streaming sketch maintenance: merge per-batch CMS grids into a
persisted frequency sketch.

The scale problem: "token/key frequencies over everything ingested so
far" as an exact table grows with the key space and needs a full
re-aggregation (or an ever-larger state store) per refresh. The
mergeable-sketch pattern keeps a FIXED-SIZE answer instead: each
micro-batch builds its own count-min grid — O(batch) work, width×depth
rows out — and cellwise-SUMs it into the persisted sketch
(``operators/sketches.py::cms_merge`` is associative and exact, so
batch-at-a-time merging equals sketching the whole history in one pass;
pinned in tests). Any key's running frequency estimate is then a
``cms_query`` probe against a table of at most width×depth rows, raw
history never re-read.

Exactly-once discipline matches the other foreachBatch sinks here
(near_dedup_stream): each epoch's contribution lands under an
``epoch=<id>`` subdirectory and replayed epochs are skipped — but only
when the epoch COMMITTED (``_SUCCESS`` present; a crash mid-write
leaves the dir without the marker and replay rewrites it). Crash
replays therefore converge instead of double-counting — the property
that matters for a SUM-mergeable state, where a replayed increment is
silent corruption, not a visible duplicate row.

Operational invariant: a sketch store is PAIRED with its stream
checkpoint — epoch ids come from the checkpoint's batch counter, so
pointing a FRESH checkpoint at an existing store would collide new
batch 0 with the old ``epoch=0`` and skip it. Reset both together (or
neither), exactly like any foreachBatch sink keyed by batch id. The
invariant is ENFORCED, not just documented (:func:`check_store_pairing`,
called by every store-writing stream in this package): the store records
its checkpoint's query id on first write and refuses batches from a
different checkpoint, and a batch id below the store's max committed
epoch refuses outright — the documented operational trap is an error,
never a silent skip.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches


def _epoch_dir(base: str, epoch: int) -> str:
    return os.path.join(base, f"epoch={epoch}")


def _grid_range(name: str) -> tuple[int, int] | None:
    """Epoch-id range a store subdirectory covers, or None for foreign dirs.

    ``epoch=<i>`` covers [i, i]; ``compact=<lo>-<hi>`` covers [lo, hi].
    Encoding the subsumed range IN THE NAME is what makes compaction
    crash-safe without a manifest: a single atomic rename publishes both
    the merged grid and the fact that it supersedes the epochs in its
    range — there is no separate marker write to crash between.
    """
    if name.startswith("epoch="):
        try:
            i = int(name.split("=", 1)[1])
        except ValueError:
            return None
        return (i, i)
    if name.startswith("compact="):
        lo, sep, hi = name.split("=", 1)[1].partition("-")
        if not sep:
            return None
        try:
            return (int(lo), int(hi))
        except ValueError:
            return None
    return None


def live_grid_dirs(spark: SparkSession, base: str) -> list[str]:
    """Committed, non-superseded grid dirs — the store's current contents.

    A dir counts only if its write committed (``_SUCCESS``) AND no other
    committed dir's epoch range contains its range. That containment rule
    is the reader-side half of compaction's crash safety: at every point
    during a compaction (before the rename, after it, mid-cleanup) the
    set of live dirs covers each epoch exactly once.
    """
    from ..pipeline.runner import _hadoop_fs

    fs, root = _hadoop_fs(spark, base)
    if not fs.exists(root):
        return []
    entries = []  # (lo, hi, path)
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        rng = _grid_range(name)
        if rng is None:
            continue
        if not fs.exists(spark._jvm.org.apache.hadoop.fs.Path(
                st.getPath(), "_SUCCESS")):
            continue
        entries.append((rng[0], rng[1], os.path.join(base, name)))
    live = [
        (lo, hi, p)
        for lo, hi, p in entries
        if not any(
            (olo <= lo and hi <= ohi) and (olo, ohi, op) != (lo, hi, p)
            for olo, ohi, op in entries
        )
    ]
    return [p for _, _, p in sorted(live)]


_BINDING_FILE = "_store_binding"


def _checkpoint_identity(spark: SparkSession, checkpoint_dir: str) -> str | None:
    """The streaming checkpoint's query id (``<checkpoint>/metadata``,
    written by StreamExecution at stream start, before batch 0 runs).
    Stable across restarts of the SAME checkpoint; a deleted/recreated
    checkpoint — even at the same path — gets a fresh uuid, which is
    exactly the identity the pairing check needs (a path comparison
    would miss an in-place reset)."""
    import json

    from ..pipeline.runner import fs_read_text

    try:
        raw = fs_read_text(spark, os.path.join(checkpoint_dir, "metadata"))
        return json.loads(raw).get("id") if raw else None
    except Exception:  # malformed/foreign metadata: fall back to epoch check
        return None


def check_store_pairing(
    spark: SparkSession, store_dir: str, checkpoint_dir: str, epoch: int
) -> None:
    """Enforce the store/checkpoint pairing invariant before a batch
    touches the store. Two independent refusals:

    1. **Identity binding** — on first write the store records its
       checkpoint's query id in ``_store_binding``; a batch arriving from
       a DIFFERENT checkpoint (fresh checkpoint pointed at an old store —
       the silent-skip trap) raises instead of colliding its restarted
       batch counter with committed epochs. Catches the trap even when
       the store holds only ``epoch=0`` (where the counter check below
       cannot distinguish a replay from a restart).
    2. **Epoch monotonicity** — a batch id BELOW the store's max
       committed epoch can only come from a reset batch counter (a
       legitimate crash replay re-delivers the LAST batch, never an
       older one); refuse. Covers pre-binding legacy stores and
       checkpoints whose metadata is unreadable.

    The binding is written only after both checks pass, so a refused
    batch never adopts the store.
    """
    from ..pipeline.runner import _hadoop_fs, fs_read_text, fs_write_text

    binding_path = os.path.join(store_dir, _BINDING_FILE)
    ident = _checkpoint_identity(spark, checkpoint_dir)
    bound = fs_read_text(spark, binding_path)
    if bound is not None and ident is not None and bound.strip() != ident:
        raise RuntimeError(
            f"store/checkpoint pairing violation: {store_dir} was written "
            f"by checkpoint id {bound.strip()!r} but this batch comes from "
            f"{ident!r} ({checkpoint_dir}). A fresh checkpoint restarts its "
            "batch counter at 0 and would collide with (and silently skip) "
            "this store's committed epochs. Reset the store and checkpoint "
            f"TOGETHER, or delete {binding_path} to deliberately rebind."
        )
    ranges = [
        _grid_range(st.getPath().getName())
        for fs, root in [_hadoop_fs(spark, store_dir)]
        if fs.exists(root)
        for st in fs.listStatus(root)
        if st.isDirectory()
        and _epoch_committed(spark, os.path.join(store_dir, st.getPath().getName()))
    ]
    max_hi = max((r[1] for r in ranges if r is not None), default=None)
    if max_hi is not None and epoch < max_hi:
        raise RuntimeError(
            f"store/checkpoint pairing violation: batch {epoch} arrived at "
            f"{store_dir} whose max committed epoch is {max_hi}. Structured "
            "Streaming only ever replays the LAST batch, so a lower batch "
            "id means the checkpoint's counter was reset against a live "
            "store. Reset the store and checkpoint together."
        )
    if bound is None and ident is not None:
        fs_write_text(spark, binding_path, ident)


def _epoch_committed(spark: SparkSession, epoch_dir: str) -> bool:
    """True only if the epoch's write COMMITTED (``_SUCCESS`` present).

    Bare directory existence is not enough: Spark's output committer
    creates the target dir before committing task files, so a crash
    mid-write leaves the dir present but the grid partial or empty.
    Skipping such an epoch on replay would silently lose that batch's
    contribution to the SUM-merged sketch — the exact corruption the
    replay-skip exists to prevent. Checked via the Hadoop FS API so the
    discipline holds on any filesystem scheme, not just file://.
    """
    from ..pipeline.runner import _hadoop_fs

    fs, marker = _hadoop_fs(spark, os.path.join(epoch_dir, "_SUCCESS"))
    return bool(fs.exists(marker))


def stream_cms(
    feed: DataFrame,
    key_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 41,
):
    """Maintain a CMS over a streaming key column; returns the started query.

    The persisted layout is one parquet subdir per epoch holding that
    batch's grid; the CURRENT sketch is ``read_sketch`` (cellwise SUM over
    the live grids — ≤ width×depth rows per grid). Long-lived stores are
    folded by :func:`compact_sketch_epochs` without changing any estimate
    (associativity again).
    """

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(sketch_dir, epoch)
        spark = batch.sparkSession
        check_store_pairing(spark, sketch_dir, checkpoint_dir, epoch)
        if _epoch_committed(spark, out):  # replayed AND committed — already merged
            return
        # mode("overwrite") below makes the rewrite of a partial epoch safe:
        # the uncommitted dir is replaced wholesale, never appended to.
        grid = sketches.cms_build(
            batch.select(key_col), key_col, width=width, depth=depth, seed=seed
        )
        grid.write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Current sketch = cellwise SUM across the live grids.

    Reads only committed, non-superseded dirs (:func:`live_grid_dirs`) —
    a crashed epoch's partial files and a mid-compaction store both read
    consistently.
    """
    dirs = live_grid_dirs(spark, sketch_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed sketch grids under {sketch_dir}")
    return (
        spark.read.parquet(*dirs)
        .groupBy("row", "cell")
        .agg(F.sum("c").alias("c"))
    )


def compact_sketch_epochs(
    spark: SparkSession, sketch_dir: str, merge=None
) -> str | None:
    """Fold the store's live grids (except the newest epoch) into one dir.

    Without compaction a long-lived stream accumulates one grid dir per
    micro-batch and every :func:`read_sketch` unions all of them — read
    cost grows with stream AGE, defeating the fixed-size-answer pitch.
    Compaction rewrites their merge (associative, so no estimate changes
    — pinned in tests) into a single ``compact=<lo>-<hi>`` dir.

    Crash safety, step by step:

    1. merged grid → a dot-prefixed tmp dir (invisible to readers);
    2. ONE atomic rename publishes it as ``compact=<lo>-<hi>`` — from
       this instant the readers' range-containment rule supersedes the
       inputs, so the store never double-counts;
    3. the subsumed dirs are deleted (pure space reclaim — a crash
       mid-cleanup leaves dirs the readers already ignore, and a rerun
       finishes the job).

    The NEWEST epoch is never compacted: only the latest batch can be in
    the data-committed-but-checkpoint-uncommitted state, and its replay
    gate looks for its ``epoch=<id>`` dir by name — folding it away would
    turn that replay into a double count. ``merge`` defaults to the CMS
    cellwise SUM; pass a different fold for other mergeable states
    (:func:`compact_distinct_epochs`).

    Run between stream runs (maintenance window), like any foreachBatch
    sink's file maintenance — the availableNow trigger makes "between
    runs" a natural state rather than a coordination problem.

    Returns the new dir path, or None if there was nothing to compact.
    """
    from ..pipeline.runner import _hadoop_fs

    if merge is None:
        def merge(df: DataFrame) -> DataFrame:
            return df.groupBy("row", "cell").agg(F.sum("c").alias("c"))

    # Finish any interrupted cleanup first: committed dirs whose range is
    # contained in another committed dir are invisible to readers but
    # still consume space — a rerun sweeps them even when there is
    # nothing new to fold.
    fs_root, root = _hadoop_fs(spark, sketch_dir)
    if fs_root.exists(root):
        live = set(live_grid_dirs(spark, sketch_dir))
        for st in fs_root.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            # a crash between writing .compact-<lo>-<hi>.tmp and the
            # publishing rename leaves a tmp dir no reader sees and no
            # future compaction reuses (the next <lo>-<hi> differs once
            # the store advances) — sweep it here or it leaks forever
            if name.startswith(".compact-") and name.endswith(".tmp"):
                fs_root.delete(st.getPath(), True)
                continue
            if _grid_range(name) is None:
                continue
            full = os.path.join(sketch_dir, name)
            committed = fs_root.exists(
                spark._jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            )
            if committed and full not in live:
                fs_root.delete(st.getPath(), True)

    dirs = live_grid_dirs(spark, sketch_dir)
    if len(dirs) < 3:  # nothing to fold besides the protected newest epoch
        return None
    inputs = dirs[:-1]  # never the newest epoch
    lo = _grid_range(os.path.basename(inputs[0]))[0]
    hi = _grid_range(os.path.basename(inputs[-1]))[1]
    tmp = os.path.join(sketch_dir, f".compact-{lo}-{hi}.tmp")
    out = os.path.join(sketch_dir, f"compact={lo}-{hi}")

    merge(spark.read.parquet(*inputs)).write.mode("overwrite").parquet(tmp)
    fs, out_p = _hadoop_fs(spark, out)
    tmp_p = _hadoop_fs(spark, tmp)[1]
    if fs.exists(out_p):  # leftover from an identical interrupted run
        fs.delete(out_p, True)
    if not fs.rename(tmp_p, out_p):
        raise IOError(f"compact_sketch_epochs: failed to publish {out}")
    for d in inputs:
        fs.delete(_hadoop_fs(spark, d)[1], True)
    return out


def compact_distinct_epochs(
    spark: SparkSession, sketch_dir: str, group_cols: list[str]
) -> str | None:
    """:func:`compact_sketch_epochs` for the HLL store: the fold is a
    per-group sketch-state union (``hll_union_agg`` — lossless w.r.t.
    sketch state, so every downstream rollup estimate is unchanged)."""
    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_cols).agg(F.hll_union_agg("sk").alias("sk"))

    return compact_sketch_epochs(spark, sketch_dir, merge=merge)


def stream_distinct_sketches(
    feed: DataFrame,
    key_col: str,
    group_cols: list[str],
    sketch_dir: str,
    checkpoint_dir: str,
    lg_k: int = 14,
):
    """The HLL twin of :func:`stream_cms`: maintain per-group distinct-
    count sketches over a stream. Each micro-batch writes its own
    per-group HLL sketches under an epoch dir (O(batch) work, one row
    per group out); the running answer for any rollup is an
    ``hll_union_agg`` over the epoch sketches (:func:`read_distinct`) —
    union is associative and lossless w.r.t. sketch state, so the
    incremental answer EQUALS sketching the full history (pinned in
    tests, exact in the sparse regime). Same epoch-replay-skip
    discipline: a replayed union would be harmless for HLL (idempotent,
    unlike CMS sums) but skipping keeps the layout canonical.
    """

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(sketch_dir, epoch)
        spark = batch.sparkSession
        check_store_pairing(spark, sketch_dir, checkpoint_dir, epoch)
        if _epoch_committed(spark, out):
            return
        sketches.distinct_sketches(batch, key_col, group_cols, lg_k).write.mode(
            "overwrite"
        ).parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct(
    spark: SparkSession, sketch_dir: str, group_cols: list[str],
    estimate_col: str = "distinct_keys",
) -> DataFrame:
    """Current distinct estimates = sketch-union rollup over the live
    grids (committed, non-superseded — same discipline as
    :func:`read_sketch`)."""
    dirs = live_grid_dirs(spark, sketch_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed sketch grids under {sketch_dir}")
    return sketches.rollup_distinct(
        spark.read.parquet(*dirs), group_cols, estimate_col
    )
