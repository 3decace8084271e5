"""Snapshot diff: classification, null transitions, hashed-mode parity."""

from shopify_etl_spark.operators.diff import snapshot_diff


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k: long, s: string, v: int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 22), (3, None, 30), (5, "e", 50)],
        "k: long, s: string, v: int",
    )
    return old, new


def test_snapshot_diff_classification(spark):
    old, new = _frames(spark)
    got = {r.k: r.change for r in snapshot_diff(old, new, "k").collect()}
    assert got == {
        2: "changed",   # NULL -> 22 is a change (null-safe compare)
        3: "changed",   # "c" -> NULL is a change
        4: "deleted",
        5: "inserted",
    }  # key 1 unchanged: absent


def test_snapshot_diff_hashed_mode_agrees(spark):
    old, new = _frames(spark)
    exact = {(r.k, r.change) for r in snapshot_diff(old, new, "k").collect()}
    hashed = {(r.k, r.change) for r in snapshot_diff(old, new, "k", hashed=True).collect()}
    assert hashed == exact
