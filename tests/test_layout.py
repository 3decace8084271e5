"""Layout operators: range/z-order clustering and footer-based skipping."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import layout


def _morton(x: int, y: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 4095), (2**21 + 7, 2)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = {
        (r.x, r.y): r.zk
        for r in df.withColumn("zk", layout.zorder_key("x", "y")).collect()
    }
    cap = (1 << 21) - 1
    for x, y in rows:
        assert got[(x, y)] == _morton(min(x, cap), min(y, cap))


def test_range_layout_skips_on_leading_column(spark, sf_dir, tmp_path):
    from shopify_etl_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = str(tmp_path / "ev_by_ts")
    layout.write_range_layout(ev, out, ["ts"], n_files=8)

    # same rows, different physical order
    assert spark.read.parquet(out).count() == ev.count()

    rep = layout.file_skipping_report(out, "ts")
    spans = sorted((r["min"], r["max"]) for r in rep if r["min"] is not None)
    assert len(spans) >= 4
    # disjoint ranges: each file starts at or after the previous file's end
    assert all(spans[i][0] >= spans[i - 1][1] for i in range(1, len(spans)))
    # an equality/point predicate touches ~1 file
    probe = spans[len(spans) // 2][0]
    assert layout.skippable_fraction(rep, probe) >= (len(spans) - 2) / len(spans)


def test_compact_parquet_preserves_data_and_shrinks_files(spark, tmp_path):
    p = str(tmp_path / "many")
    # simulate a chatty streaming sink: 40 tiny appends
    for i in range(40):
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k")
        ).write.mode("append").parquet(p)
    before = {r.k for r in spark.read.parquet(p).collect()}

    stats = layout.compact_parquet(spark, p, target_rows_per_file=200)
    assert stats["rows"] == 400
    assert stats["files_after"] <= 2 < stats["files_before"]
    assert {r.k for r in spark.read.parquet(p).collect()} == before

    # compaction + sort re-establishes a skippable layout in one pass
    stats2 = layout.compact_parquet(
        spark, p, target_rows_per_file=100, sort_cols=["k"]
    )
    assert stats2["rows"] == 400
    rep = layout.file_skipping_report(p, "k")
    spans = sorted((r["min"], r["max"]) for r in rep if r["min"] is not None)
    assert all(spans[i][0] >= spans[i - 1][1] for i in range(1, len(spans)))


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    # repartitionByRange picks file boundaries from a SAMPLE whose seed
    # derives from the session's RDD-id counter — so boundary quality
    # varies with whatever ran before in a shared session (measured
    # zx 0.44-0.69 across seeds at the default 100 samples/partition,
    # flaking the 0.5 floor in full-suite runs while passing isolated).
    # Pin a large sample so boundaries are tight and the assertion tests
    # the LAYOUT property, not sampler luck.
    saved = spark.conf.get("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "5000")
    try:
        _zorder_layout_body(spark, tmp_path)
    finally:
        spark.conf.set(
            "spark.sql.execution.rangeExchange.sampleSizePerPartition", saved
        )


def _zorder_layout_body(spark, tmp_path):
    n, side = 1 << 16, 1 << 8
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.hash("id").bitwiseAND(F.lit(side - 1)).cast("long")).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    layout.write_zorder_layout(df, zpath, "x", "y", n_files=16, bits=9)
    layout.write_range_layout(df, rpath, ["x"], n_files=16)

    assert spark.read.parquet(zpath).count() == n

    probe = side // 2
    # z-order: BOTH dimensions skip most files
    zx = layout.skippable_fraction(layout.file_skipping_report(zpath, "x"), probe)
    zy = layout.skippable_fraction(layout.file_skipping_report(zpath, "y"), probe)
    assert zx >= 0.5 and zy >= 0.5
    # single-column range layout: leading column skips nearly everything,
    # the other dimension nothing — the gap z-order exists to close
    rx = layout.skippable_fraction(layout.file_skipping_report(rpath, "x"), probe)
    ry = layout.skippable_fraction(layout.file_skipping_report(rpath, "y"), probe)
    assert rx >= 0.8 and ry == 0.0


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Pay-once-shuffle-forever: two tables bucketed+sorted on the join
    key must sort-merge-join with ZERO Exchange on either input — the
    only shuffle in the plan is the later groupBy on a different key.
    (At 100 TB this is the fact-fact join strategy when neither side
    broadcasts.)"""
    import re

    from shopify_etl_spark.operators.layout import write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'")
    try:
        orders = spark.createDataFrame(
            [(i, "OK" if i % 2 else "F") for i in range(200)],
            "o_orderkey long, o_orderstatus string",
        )
        items = spark.createDataFrame(
            [(i % 150, i) for i in range(400)], "o_orderkey long, qty long"
        )
        write_bucketed(orders, "bkt.b_orders", "o_orderkey", 4,
                       sort_col="o_orderkey")
        write_bucketed(items, "bkt.b_items", "o_orderkey", 4,
                       sort_col="o_orderkey")
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table("bkt.b_orders")
                .join(spark.table("bkt.b_items"), "o_orderkey")
                .groupBy("o_orderstatus")
                .agg(F.sum("qty").alias("q"))
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            n_ex = len(re.findall(
                r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
                plan,
            ))
            assert plan.count("SortMergeJoin") == 1
            assert n_ex == 1, plan  # ONLY the groupBy-on-status exchange
            # and the join result is still correct
            got = {r.o_orderstatus: r.q for r in j.collect()}
            want = {"OK": sum(i for i in range(400) if (i % 150) % 2),
                    "F": sum(i for i in range(400) if not (i % 150) % 2)}
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")
