"""Scale-growth harness: measure how the dedup/clustering family grows
from sf0.1 to a ~sf1 corpus (10× documents / embeddings).

The driver ships no sf1 testdata, so the harness BUILDS one by replicating
sf0.1 ten times with two properties that make the timing honest:

* every replica's doc_ids/vec_ids are shifted into a disjoint range;
* replica ``i>0`` bijectively remaps every whitespace token (prefix
  ``"<i>x"``), so within-replica similarity structure is IDENTICAL to the
  original corpus while cross-replica shingle overlap is zero (shingles
  are word 3-grams; every token differs). A 10× corpus therefore carries
  ~10× the near-dup pairs — linear, like a real corpus growing — instead
  of the quadratic pair explosion verbatim copies would fabricate.

Usage::

    python tools/scale_harness.py            # build + measure, prints JSON
    python tools/scale_harness.py --runs 2   # best-of-2 per cell

Results belong in SCALE.md (sf1/sf0.1 wall ratios; the bound argued there
is ≤ ~12× ≈ linear × log).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shopify_etl_spark.plans import QUERIES  # noqa: E402
from shopify_etl_spark.session import get_spark  # noqa: E402

REPLICAS = 10
ID_OFFSET = 1_000_000
FAMILY = (
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "minhash_dedup_candidates",
    "dedup_clusters",
    "kmeans_doc_clusters",
    # round-4 additions
    "train_eval_contamination",
    "cms_token_counts",
    "dedup_corpus_best",
    # 10x embeddings with unchanged labels grow every label block 10x —
    # exercises blocked_cosine's max_block_size degradation path (hot
    # blocks fall back to LSH sub-buckets instead of O(block^2))
    "embedding_near_dup_pairs",
    # round-5 additions: sample→sketch→probe pipeline (fixed-size CMS,
    # output bounded at 20), the full inverted-index build (postings AND
    # vocabulary both grow 10x under the bijective token remap), the
    # bigram-LM scorer (model joins vocabulary-sized both sides), and the
    # SemDeDup pipeline (kmeans blocks grow 10x — exercises the blocked
    # operator's hot-block LSH degradation inside clusters)
    "cms_heavy_hitters",
    "bm25_champion_lists",
    "lm_bigram_scores",
    "semantic_dedup_docs",
    "source_overlap_matrix",
    # round-5 session additions: span windows grow linearly with tokens
    # (positional, cross-replica overlap zero under the token remap), the
    # trim apply adds the interval join-back, and the RRF fusion's sparse
    # probe is bounded by the (unchanged) 5-query posting lists
    "duplicate_span_stats",
    "trim_repeated_spans",
    "hybrid_rrf_topk",
    "ccnet_ppl_buckets",
    # later round-5 additions: mutual kNN (now IVF-blocked + max_block
    # hard bound; replica-collapsed cells exercise the sub-bucket path,
    # measured r10: 3.61x bounded vs 4.2x unbounded for ~9x rows), the
    # asymmetric
    # ingest screen (cross overlap stays within-replica by the token
    # remap), and the full gate→trim→split chain
    "mutual_knn_pairs",
    "cross_corpus_near_dups",
    "curation_v2_corpus",
    # session-2 additions: DSIR's model stays bucket-sized (8192) while
    # the token stream grows 10x; novelty rides the same postings shape
    # as the Jaccard family; JL/PCA are map-only (PCA's Gram stays 2080
    # rows at any corpus size); the JL bucket join is a deliberate
    # worst case — replicated embeddings put 10 IDENTICAL copies of
    # every vector in the same bucket, so pairs grow ~100x (quadratic
    # in-bucket, like mutual_knn's fixed-label blocks); OOV's vocab
    # count grows 10x under the token remap but stays a grouped agg
    "dsir_importance_weights",
    "doc_novelty_scores",
    "jl_projection_docs",
    "pca_power_scores",
    "jl_bucket_near_dups",
    "oov_rates_by_source",
    # graph edges grow linearly (cross-replica overlap is zero under the
    # token remap — 10 disjoint copies of the same graph), so each
    # message-passing round is a linear-sized join; entropy is map-only
    "dup_graph_pagerank",
    "token_entropy_docs",
    "pca_top2_scores",
    # late session-2: the curriculum chain rides the LM scorer's ~linear
    # growth; cluster stats share dedup_clusters' clustering cost with a
    # cluster-count-sized rollup on top
    "curriculum_mix_docs",
    "dedup_cluster_stats",
    # events-table family (events replicated since session 2)
    "psi_value_drift",
    "psi_time_drift",
    "cms_join_size",
    "hll_key_overlap",
    # round 6: per-source window packer, fixed-size bloom screen,
    # Arrow-parallel codec round-trip, degree-capped message passing
    "training_sequence_spans",
    "bloom_ingest_screen",
    "jpeg_roundtrip_stats",
    "pagerank_degree_capped",
    # rounds 7–9: the trained-quantizer ANN chain (k-means partials fold
    # stays k-row at any scale; assignment is map-side broadcast), the
    # IVF-cell-blocked label-noise screen (cells grow 10x — in-cell
    # quadratic pressure, same shape as mutual_knn blocks), the two-phase
    # prefix-sum packer (bucket count tracks doc count via build-time
    # min/max — r9's double-cast bucketing), the progressive-JPEG and
    # audio codec chains (0-shuffle Arrow maps, must grow ~linearly),
    # and the BPE surface under a 10x pretoken vocabulary (r9's capped
    # driver fold: the top-K TakeOrdered replaces the unbounded collect)
    "trained_ivf_topk",
    "knn_label_disagreement",
    "token_budget_shards",
    "shard_balance_report",
    "progressive_jpeg_stats",
    "audio_demux_stats",
    "bpe_pretoken_counts",
    "bpe_apply_one_merge",
    # round 10: the reference-parity merge layer gets measured growth
    # rows too (VERDICT r9 #7) — replicated relational tables with
    # lockstep-shifted join keys: window dedup/upsert partitions grow in
    # COUNT not size, the reload anti-join and inventory agg+join grow
    # linearly, so all four should track ~10x rows at well under 10x wall
    "upsert_orders",
    "delete_reload_items",
    "current_inventory_analog",
    "latest_order_per_customer",
    "priority_gap_fill",
    # r10: char-window chunking is map-only (sequence->explode->substr,
    # 0 shuffles) — must grow ~linearly with the corpus
    "document_chunks",
    # r11: the retrieval-prep chain is chunking + a map-side broadcast
    # cross-score + one 8-group aggregate (should track document_chunks'
    # ~linear growth); the QM-coder gate is a 0-shuffle Arrow map like
    # its progressive twin
    "retrieval_index_manifest",
    "arith_jpeg_stats",
    "gif_roundtrip_stats",       # 0-shuffle Arrow map, ~linear like its twins
    "embedding_outlier_screen",  # broadcast cross-score + cells-sized rollup
    # r12: the trained retrieval chain — k-means on the 10x chunk frame
    # (partials fold stays k-row), trained-codebook assign + 2-cell probe
    # (cells grow 10x, probe candidates grow 10x; broadcast sides fixed)
    "retrieval_trained_search",
    "lossless_jpeg_stats",       # 0-shuffle Arrow map, ~linear like its twins
    "g711_roundtrip_stats",      # 0-shuffle Arrow map, vectorized companding
    "prog_arith_jpeg_stats",     # 0-shuffle Arrow map, QM-coder constant
    # r13: the PQ retrieval family — training folds stay (m x k)-row at
    # any scale, assignment/encoding are map-side GEMMs, the ADC scan is
    # corpus x 8 broadcast lookups (pq_adc) or probe-bounded (ivf_pq /
    # residual), re-rank joins are shortlist-sized broadcasts; expected
    # growth well under 10x wall for 10x vectors (job-overhead dominated
    # at these row counts, like retrieval_trained_search's 1.1x)
    "pq_adc_topk",
    "ivf_pq_search",
    "residual_pq_search",
    # r13 late additions: MaxSim rides the chunk frame (query side fixed
    # at 3 docs' chunks, corpus chunks grow 10x -> cross-score and the
    # max/sum aggregates grow linearly); the MRL funnel's prefix pass
    # grows linearly, shortlist/re-rank fixed
    "maxsim_late_interaction",
    "mrl_truncated_search",
    # r13 session-2 additions: SQ's grid train is one 128-expression agg
    # (map-side partials; model size fixed), encode/search are map-side
    # folds over 10x codes; BQ's threshold train is one 64-expression
    # agg, Hamming scan grows linearly, re-rank stays shortlist-sized;
    # the probe's featurize projection grows 10x while every GD step
    # aggregates to 4 doubles (driver-latency dominated — 17 tiny jobs);
    # the two new codec gates are 0-shuffle Arrow maps like their twins
    "sq_int8_search",
    "bq_hamming_search",
    "quality_probe_distill",
    "arith_lossless_jpeg_stats",
    "hier_jpeg_stats",
)


def build_sf1(spark, src_dir: str, out_dir: str) -> None:
    """Replicate documents/embeddings 10× (disjoint ids, token-remapped)."""
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    parts = []
    for i in range(REPLICAS):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_OFFSET))
        if i > 0:
            # bijective token remap: same similarity structure inside the
            # replica, zero 3-gram shingle overlap across replicas
            r = r.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"{i}x$1")
            )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_OFFSET))
        for i in range(REPLICAS)
    ]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # events: shift event_id AND user_id per replica — per-user event
    # multiplicities (the join-size / overlap / PSI inputs) replicate
    # exactly, so true answers scale by known factors. load_table owns
    # the TIMESTAMP(NANOS) handling; the rewrite stores micros.
    from shopify_etl_spark.plans.catalog import load_table

    ev = load_table(spark, src_dir, "events")
    vparts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * ID_OFFSET))
        .withColumn("user_id", F.col("user_id") + F.lit(i * ID_OFFSET))
        for i in range(REPLICAS)
    ]
    vout = vparts[0]
    for p in vparts[1:]:
        vout = vout.unionByName(p)
    vout.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # merge-layer analogs (VERDICT r9 #7): replicate the relational
    # tables with every join key shifted in lockstep, so intra-replica
    # join relationships are exact copies — group counts grow 10x,
    # per-group sizes stay constant (the shape a sharded production
    # upsert/reload actually has)
    rel = {
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
        "part": ("p_partkey",),
    }
    for tbl, keys in rel.items():
        t = spark.read.parquet(f"{src_dir}/{tbl}.parquet")
        tparts = []
        for i in range(REPLICAS):
            r = t
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * ID_OFFSET))
            tparts.append(r)
        tout = tparts[0]
        for p in tparts[1:]:
            tout = tout.unionByName(p)
        tout.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )


def time_query(spark, name: str, sf_dir: str, runs: int) -> tuple[float, int]:
    """Time a noop-sink write (full pipeline materialized executor-side).

    count() is NOT a valid timing target here: Catalyst prunes unused
    columns and eliminates unique-key left joins under a bare count, so
    map-shaped queries (trim_repeated_spans, duplicate_span_stats) would
    measure a fraction of their real work. Row counts are taken in a
    separate untimed pass for the report."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    rows = QUERIES[name].builder(spark, sf_dir).count()
    return round(best, 3), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--build-dir", default="/root/repo/.scratch/sf1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--keep", action="store_true", help="keep the built corpus")
    ap.add_argument("--only", nargs="*", default=None,
                    help="measure only these FAMILY queries")
    ap.add_argument("--build-only", action="store_true",
                    help="build the sf1 corpus and exit (implies the dir "
                    "is kept; the sf1 oracle tier consumes it)")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scale-harness", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # pre-warm both Python worker pools to full width, like bench.py —
    # otherwise the first mapInPandas cell absorbs a ~32-worker fork storm
    # and the sf0.1/sf1 ratio is distorted (r9 root cause, SCALE.md)
    n_cpus = int(cpus) if cpus.isdigit() else 32

    def _touch_pandas(it):
        import pandas  # noqa: F401

        yield from it

    spark.range(n_cpus * 10, numPartitions=n_cpus).mapInPandas(
        _touch_pandas, "id long"
    ).write.format("noop").mode("overwrite").save()

    def _touch_rdd(x):
        import pandas  # noqa: F401

        return x

    spark.sparkContext.parallelize(range(n_cpus * 10), n_cpus).map(
        _touch_rdd
    ).count()

    t0 = time.time()
    build_sf1(spark, args.sf_dir, args.build_dir)
    build_secs = round(time.time() - t0, 3)

    if args.build_only:
        print(json.dumps({"build_secs": build_secs, "dir": args.build_dir}))
        spark.stop()
        return

    report = {"build_secs": build_secs, "replicas": REPLICAS, "queries": {}}
    for name in (args.only or FAMILY):
        base_s, base_rows = time_query(spark, name, args.sf_dir, args.runs)
        big_s, big_rows = time_query(spark, name, args.build_dir, args.runs)
        report["queries"][name] = {
            "sf0.1_secs": base_s,
            "sf1_secs": big_s,
            "ratio": round(big_s / base_s, 2) if base_s > 0 else None,
            "sf0.1_rows": base_rows,
            "sf1_rows": big_rows,
            "row_growth": round(big_rows / base_rows, 2) if base_rows else None,
        }
        print(f"{name}: {base_s}s -> {big_s}s "
              f"(x{report['queries'][name]['ratio']}), "
              f"rows {base_rows} -> {big_rows}", file=sys.stderr)

    print(json.dumps(report))
    if not args.keep:
        shutil.rmtree(args.build_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
