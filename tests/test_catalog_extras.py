"""Extended-surface checks that the oracle can't express exactly:
approximate aggregates pinned within tolerance of their exact twins."""

from pyspark.sql import functions as F

from shopify_etl_spark.plans import QUERIES
from shopify_etl_spark.plans.catalog import load_table


def test_approx_event_stats_within_tolerance(spark, sf_dir):
    """The catalog query now ships its own guarantee gate (exact twins +
    in-bounds flags, oracle-checked); this test independently recomputes
    approx-vs-exact from the raw table and pins the same tolerances, so a
    sketch regression is caught even if the query's flag logic broke."""
    out = {
        r.event_type: r
        for r in QUERIES["approx_event_stats"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    both = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("median"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("approx_median"),
        )
        .collect()
    }
    assert set(out) == set(both)
    for et, r in out.items():
        e = both[et]
        assert r.exact_users == e.users, et
        assert r.users_within_3rsd and r.median_within_rank_bounds, (et, r)
        assert abs(e.approx_users - e.users) <= max(0.05 * e.users, 2), et
        assert abs(e.approx_median - e.median) <= max(0.05 * abs(e.median), 0.5), et


def test_every_query_has_doc_and_runs_lazily(catalog_plans):
    """Contract hygiene: every catalog entry documents its operator
    coverage and builds a plan that yields columns. The build itself
    happens ONCE per session in the shared ``catalog_plans`` fixture
    (tests/_plan_cache.py) — the r17 version re-built all ~200 builders
    here on top of the plan gate's rebuilds, which helped blow the
    driver's verify budget."""
    for name, spec in QUERIES.items():
        assert spec.doc and len(spec.doc) > 20, name
        assert catalog_plans[name]["columns"], name


def test_hash_embed_contract(spark):
    """Embed-stub contract: deterministic (same text, same vector),
    fixed dim, never the zero vector, dim bounded by md5's 32 hex
    digits."""
    import pytest

    from shopify_etl_spark.operators import similarity

    df = spark.createDataFrame(
        [("alpha",), ("alpha",), ("beta",), ("",)], ["t"]
    )
    rows = df.select(similarity.hash_embed("t", dim=16).alias("ev")).collect()
    assert all(len(r.ev) == 16 for r in rows)
    assert rows[0].ev == rows[1].ev          # deterministic
    assert rows[0].ev != rows[2].ev          # text-sensitive
    assert all(any(abs(x) >= 9 for x in r.ev) for r in rows)  # never zero
    with pytest.raises(ValueError, match="32 hex digits"):
        similarity.hash_embed("t", dim=33)


def test_retrieval_index_manifest_accounts_for_every_chunk(spark, sf_dir):
    """The manifest's cells partition the chunk set exactly: n_chunks
    sums to the chunker's output count, n_docs never exceeds the
    corpus, cells are the declared 8-cell codebook, and avg_sim is a
    valid cosine."""
    out = QUERIES["retrieval_index_manifest"].builder(spark, sf_dir).collect()
    n_chunks_total = (
        QUERIES["document_chunks"].builder(spark, sf_dir).count()
    )
    assert sum(r.n_chunks for r in out) == n_chunks_total
    assert all(0 <= r.centroid_id <= 7 for r in out)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert all(0 < r.n_docs <= n_docs for r in out)
    assert all(-1.0001 <= r.avg_sim <= 1.0001 for r in out)


def test_retrieval_chunk_search_invariants(spark, sf_dir):
    """Search-side contract: exactly the 3 declared queries, top-5 each,
    self excluded, similarities valid cosines, and every neighbor is a
    real chunk of the corpus (the index only returns what it ingested)."""
    out = QUERIES["retrieval_chunk_search"].builder(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_doc, []).append(r)
    assert set(by_q) == {0, 1, 2}
    chunk_set = {
        (r.doc_id, r.chunk_idx)
        for r in QUERIES["document_chunks"].builder(spark, sf_dir).collect()
    }
    for qd, rows in by_q.items():
        assert len(rows) == 5
        assert all((r.neighbor_doc, r.neighbor_chunk) != (qd, 0) for r in rows)
        assert all((r.neighbor_doc, r.neighbor_chunk) in chunk_set for r in rows)
        assert all(-1.0001 <= r.cosine_sim <= 1.0001 for r in rows)
