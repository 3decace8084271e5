from .catalog import QUERIES, QuerySpec, load_table, register  # noqa: F401
from . import catalog_ext  # noqa: F401,E402  (registers extension queries)
from . import catalog_ext2  # noqa: F401,E402  (round-2 extension queries)
from . import catalog_ext3  # noqa: F401,E402  (round-5 session-2 queries)
from . import catalog_ext4  # noqa: F401,E402  (round-6 session-2 queries)
from . import catalog_ext5  # noqa: F401,E402  (round-13 PQ retrieval family)
from . import catalog_ext6  # noqa: F401,E402  (round-14 raw-crawl ingest)
from . import catalog_ext7  # noqa: F401,E402  (round-15 crawl fidelity)
from . import catalog_ext8  # noqa: F401,E402  (round-16 routing/revisit)
from . import catalog_ext9  # noqa: F401,E402  (round-17 decoder/redirect/cdxj)

# ---------------------------------------------------------------------------
# Catalog ordering.
#
# The driver's correctness gate samples the FIRST 50 entries of
# ``__spark_entry__.queries()`` per round. Every query has at least one
# official row (r01∪…∪r04), so the standing policy is freshness: front-load
# (1) queries that are NEW or whose code changed this round, then (2) the
# queries the PREVIOUS round did not sample (stalest official evidence),
# then the previous round's sampled set. Pure re-ordering: every QuerySpec
# keeps its builder/oracle unchanged.
# ---------------------------------------------------------------------------
_R03_SAMPLED = [
    "purchase_click_asof",
    "purchase_error_range_join",
    "hash_split_assign",
    "stratified_sample_docs",
    "vocabulary_topk",
    "pii_scrub_customers",
    "token_budget_shards",
    "ivf_assignments",
    "ivf_ann_topk",
    "dedup_corpus",
    "bm25_search_topk",
    "strip_boilerplate_docs",
    "quality_filter_docs",
    "daily_user_resample",
    "containment_dedup_pairs",
    "event_value_histogram",
    "window_rank_surface",
    "epoch_mix_docs",
    "stats_agg_surface",
    "unpivot_measures",
    "fuzzy_name_pairs",
    "funnel_conversion",
    "cohort_retention_weekly",
    "winsorize_event_values",
    "variant_json_stats",
    "curated_corpus",
    "grouping_sets_revenue",
    "array_functions_surface",
    "embedding_quantization",
    "scd2_user_state",
    "incremental_rollup_merge",
    "conditional_agg_surface",
    "regex_extract_surface",
    "lateral_top_orders",
    "map_functions_surface",
    "bpe_pretoken_counts",
    "trailing_window_revenue",
    "null_safe_join_surface",
    "weekly_distinct_from_daily",
    "chunked_documents",
    "global_doc_index",
    "dq_report_core",
    "snapshot_diff_orders",
    "multimodal_features",
    "minhash_dedup_candidates",
    "simhash_near_pairs",
    "lsh_ann_topk",
]

# Queries the round-4 driver sampled (CORRECTNESS_r04.json keys): their
# evidence is freshest, so they sort LAST under the freshness policy.
_R04_SAMPLED = [
    "approx_event_stats", "bpe_merge_pair_counts", "cms_token_counts",
    "cube_order_stats", "cumulative_customer_revenue",
    "current_inventory_analog", "customer_except_years",
    "customer_intersect_years", "customers_without_orders",
    "daily_event_snapshot", "date_functions_surface", "dedup_clusters",
    "dedup_corpus_best", "delete_reload_items", "distinct_flag_status",
    "doc_fingerprints", "event_type_pivot", "events_json_extract",
    "exact_dedup_docs", "first_last_event_per_user",
    "full_outer_nation_counts", "kmeans_doc_clusters", "lang_id_heuristic",
    "latest_order_per_customer", "ngram_jaccard_pairs",
    "orders_with_heavy_items", "part_brand_volume", "pmi_collocations",
    "price_quantiles_by_brand", "priority_gap_fill",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "repetition_signals", "rollup_returns", "scalar_surface",
    "session_window_counts", "sessionize_events",
    "sql_interface_nation_stats", "string_surface_extended",
    "text_quality_scores", "token_count_by_source", "token_explode_counts",
    "train_eval_contamination", "union_two_sources", "upsert_orders",
    "watermark_max_ts", "weekly_revenue",
]

# New or code-changed in round 5 — sample these first.
_CHANGED_R05 = [
    "dsir_importance_weights",     # new s2 (DSIR target-vs-raw selection)
    "jl_bucket_near_dups",         # new s2 (oracle-able angular LSH)
    "dup_graph_pagerank",          # new s2 (duplication centrality)
    "token_entropy_docs",          # new s2 (entropy/TTR quality signal)
    "pca_top2_scores",             # new s2 (PC1+PC2 via deflation)
    "cms_join_size",               # new s2 (sketch join cardinality)
    "hll_key_overlap",             # new s2 (sketch key overlap)
    "psi_value_drift",             # new s2 (PSI distribution drift)
    "curriculum_mix_docs",         # new s2 (tercile-weighted epoch mix)
    "dedup_cluster_stats",         # new s2 (cluster-size histogram)
    "psi_time_drift",              # new s2 (first-vs-second-half drift)
    "corpus_datasheet",            # new s2 (dataset-card summary row)
    "lang_id_confusion",           # new s2 (classifier confusion matrix)
    "shard_balance_report",        # new s2 (packer balance rollup)
    "oov_rates_by_source",         # new s2 (vocab coverage diagnostic)
    "doc_novelty_scores",          # new s2 (first-occurrence novelty)
    "jl_projection_docs",          # new s2 (deterministic JL compression)
    "pca_power_scores",            # new s2 (Gram fold + power iteration)
    "audio_demux_stats",           # new (WAV codec round-trip pipeline)
    "ccnet_ppl_buckets",           # new (per-lang perplexity terciles)
    "kmeans_fixed_init_clusters",  # new (cross-engine Lloyd oracle twin)
    "cms_heavy_hitters",           # new (sample->sketch->probe pipeline)
    "bm25_champion_lists",         # new (open-vocab inverted index)
    "lm_bigram_scores",            # new (CCNet-style LM quality scoring)
    "semantic_dedup_docs",         # new (SemDeDup cluster+cosine pipeline)
    "source_mixture_weights",      # new (temperature mixing weights)
    "source_overlap_matrix",       # new (cross-source shingle overlap)
    "hard_negative_pairs",         # new (lexical x semantic mining)
    "hybrid_rrf_topk",             # new (RRF dense+sparse fusion)
    "duplicate_span_stats",        # new (exact substring-dup signal)
    "duplicate_span_intervals",    # new (maximal repeated intervals)
    "trim_repeated_spans",         # new (substring-dedup apply step)
    "leakage_safe_split",          # new (cluster-keyed split)
    "bpe_apply_one_merge",         # new (tokenizer apply, oracled slice)
    "mutual_knn_pairs",            # new (symmetric kNN filter)
    "cross_corpus_near_dups",      # new (ingest dedup screen)
    "curation_v2_corpus",          # new (gate->trim->split chain)
    "daily_value_ohlc",            # new (OHLC resample bars)
    "robust_value_outliers",       # new (median/MAD outliers)
    "trained_ivf_topk",            # new (kmeans-trained IVF ANN)
    "image_decode_stats",          # new (PNG round-trip pipeline)
    "approx_event_stats",          # null-user_id filter + left-join carry
]

# Queries the round-5 driver sampled (CORRECTNESS_r05.json keys): their
# evidence is freshest, so they sort last among the unchanged.
_R05_SAMPLED = [
    "dsir_importance_weights", "jl_bucket_near_dups", "dup_graph_pagerank",
    "token_entropy_docs", "pca_top2_scores", "cms_join_size",
    "hll_key_overlap", "psi_value_drift", "curriculum_mix_docs",
    "dedup_cluster_stats", "psi_time_drift", "corpus_datasheet",
    "lang_id_confusion", "shard_balance_report", "oov_rates_by_source",
    "doc_novelty_scores", "jl_projection_docs", "pca_power_scores",
    "audio_demux_stats", "ccnet_ppl_buckets", "kmeans_fixed_init_clusters",
    "cms_heavy_hitters", "bm25_champion_lists", "lm_bigram_scores",
    "semantic_dedup_docs", "source_mixture_weights", "source_overlap_matrix",
    "hard_negative_pairs", "hybrid_rrf_topk", "duplicate_span_stats",
    "duplicate_span_intervals", "trim_repeated_spans", "leakage_safe_split",
    "bpe_apply_one_merge", "mutual_knn_pairs", "cross_corpus_near_dups",
    "curation_v2_corpus", "daily_value_ohlc", "robust_value_outliers",
    "trained_ivf_topk", "image_decode_stats", "approx_event_stats",
    "minhash_dedup_candidates", "simhash_near_pairs", "ann_cosine_topk",
    "lsh_ann_topk", "multimodal_features", "embedding_near_dup_pairs",
    "purchase_click_asof", "purchase_error_range_join",
]

# New or code-changed in round 6 — sample these first.
_CHANGED_R06 = [
    "tfidf_top_terms",          # new s2 (smoothed tf-idf keyword top-3)
    "token_js_divergence",      # new s2 (source-vs-corpus JS divergence)
    "zipf_law_fit",             # new s2 (Zipf slope/r2 fingerprint)
    "knn_label_disagreement",   # new s2 (IVF-blocked label-noise screen)
    "lsh_ann_topk",             # now the guarantee-gate view (oracled)
    "pagerank_degree_capped",   # new (worst-case-bounded edge build)
    "jpeg_roundtrip_stats",     # new (baseline JPEG encode/decode gate)
    "training_sequence_spans",  # new (attention-mask boundary packing)
    "bloom_ingest_screen",      # new (fixed-size membership screen)
    "dup_graph_pagerank",       # pagerank() iteration refactor (same values)
    "shard_balance_report",     # overrun_tokens clamped at 0
    "oov_rates_by_source",      # dead id_col parameter dropped
    "pca_power_scores",         # driver rounding now SQL-ROUND semantics
    "pca_top2_scores",          # driver rounding now SQL-ROUND semantics
    "psi_value_drift",          # in-plan bucket-count guard
    "psi_time_drift",           # in-plan bucket-count guard
]

# New or code-changed in round 8 — sample these first.
_CHANGED_R08 = [
    "progressive_jpeg_stats",   # new (SOF2 cross-path bit-exact gate)
    "lm_bigram_scores",         # tokenize-once checkpoint + keep_cols
    "ccnet_ppl_buckets",        # checkpointed scored frame (scan x1)
    "curation_v2_corpus",       # checkpointed scored frame
    "curriculum_mix_docs",      # checkpointed scored frame
    "mutual_knn_pairs",         # checkpointed ivf_assign + knn list
    "knn_label_disagreement",   # checkpointed assigned frame
    "token_budget_shards",      # stats-sized buckets + checkpointed count
    "training_sequence_spans",  # same packer change
    "shard_balance_report",     # same packer change
    "jpeg_roundtrip_stats",     # decoder marker dispatch touched (SOF2)
]

# New or code-changed in round 10 — sample these first.
_CHANGED_R10 = [
    "document_chunks",          # NEW: char-window retrieval-side chunking
    "kmeans_doc_clusters",      # now guarantee-gate oracled (was no_oracle)
    "knn_label_disagreement",   # pinned to max_cell=128 scale-safe config
    "mutual_knn_pairs",         # checkpointed sub-bucket frame; empty guard
    "semantic_dedup_docs",      # keep_cols ride-along (corpus join dropped)
    "audio_demux_stats",        # wav/y4m untrusted-bytes hardening
    "adpcm_roundtrip_stats",    # same decoder change
    "image_decode_stats",       # png/jpeg untrusted-bytes hardening
    "jpeg_roundtrip_stats",     # jpeg zero-sampling-factor ValueError
    "progressive_jpeg_stats",   # same decoder change + 16-bit DQT
]

# New or code-changed in round 15 — sample these first.
_CHANGED_R15 = [
    "crawl_http_fidelity",   # NEW: chunked/gzip/deflate/charset fidelity
    "url_canonical_dedup",   # NEW: canonical-URL re-fetch dedup
    "training_shard_export",  # NEW: uint16 token shards + manifest
    "host_link_pagerank",    # NEW: directed weighted host-graph centrality
    "wet_export_roundtrip",  # NEW: WET writer + double split round-trip
    "cdx_index_coverage",    # NEW: CDX byte coordinates + tiling flags
    "crawl_language_routing",  # NEW: per-archive lang-ID partition step
    "robots_compliance_audit",  # RFC 9309 Allow/longest-match semantics
    # html_to_text changed (numeric entities, unterminated-container
    # fallbacks) — every extraction consumer re-fronted:
    "html_extract_docs",
    "crawl_curation_chain",
    "crawl_multimodal_stats",
    # warc parse_record changed (HTTP transport peel, status hardening):
    "warc_ingest_stats",
    "crawl_domain_caps",
]

# New or code-changed in round 14 — sample these first.
_CHANGED_R14 = [
    "warc_ingest_stats",     # NEW: .warc.gz member split + record inventory
    "html_extract_docs",     # NEW: lossless crawl-chain HTML→text gate
    "crawl_curation_chain",  # NEW: end-to-end crawl→extract→quality gate
    "interleaved_mm_spans",  # NEW: image-text interleaved packing manifest
    "opq_balanced_pq",       # NEW: OPQ variance-balanced allocation gate
    "crawl_multimodal_stats",  # NEW: mime-routed HTML+PNG crawl accounting
    "crawl_domain_caps",     # NEW: per-domain cap via two-phase top-N
    "robots_compliance_audit",  # NEW: robots rules parsed from archives
    "quality_probe_distill",  # classifier feature_stats untouched; probe
    #   family re-fronted for the stream-monitor empty-batch fix
]

# New or code-changed in round 13 — sample these first.
_CHANGED_R13 = [
    "pq_adc_topk",           # NEW: trained PQ codes + ADC top-k
    "ivf_pq_search",         # NEW: IVFADC probe-bounded search + re-rank
    "residual_pq_search",    # NEW: residual-encoded IVF-PQ variant
    "image_decode_stats",    # png decoder: gray/RGB tRNS color-key alpha
    "audio_demux_stats",     # y4m decoder: odd-dim subsampled rejection
    "prog_arith_jpeg_stats",  # SOF10 decoder: DRI restart segments
    "lossless_jpeg_stats",   # SOF3 decoder: DRI restart anchors
    "maxsim_late_interaction",  # NEW: ColBERT-family multi-vector scoring
    "mrl_truncated_search",  # NEW: Matryoshka prefix funnel + re-rank
    "sq_int8_search",        # NEW: trained int8 SQ asymmetric search
    "bq_hamming_search",     # NEW: binary sign codes + Hamming re-rank
    "quality_probe_distill",  # NEW: GD-trained linear gate distillation
    "arith_lossless_jpeg_stats",  # NEW: SOF11 QM lossless cross-path gate
    "hier_jpeg_stats",       # NEW: Annex J hierarchical pyramid gate
    "maxsim_pruned_search",  # NEW: IVF-bounded MaxSim serving shape
]

# New or code-changed in round 12 — sample these first.
_CHANGED_R12 = [
    "retrieval_trained_search",  # NEW: k-means-trained chunk index + probe
    "lossless_jpeg_stats",       # NEW: SOF3 predictive round-trip gate
    "g711_roundtrip_stats",      # NEW: mu-law/A-law companding gate
    "prog_arith_jpeg_stats",     # NEW: SOF10 four-way cross-path gate
    "gif_roundtrip_stats",       # gif decoder: disposal 2/3 + pixel cap
    "arith_jpeg_stats",          # jpeg: non-interleaved SOF9 + DAC check
    "jpeg_roundtrip_stats",      # same decoder dispatch touched
    "progressive_jpeg_stats",    # same decoder dispatch touched
    "image_decode_stats",        # same decoder dispatch touched
]

# New or code-changed in round 11 — sample these first.
_CHANGED_R11 = [
    "retrieval_index_manifest",  # NEW: chunk->embed-stub->IVF->manifest chain
    "retrieval_chunk_search",    # NEW: probe-search side of the chunk index
    "arith_jpeg_stats",          # NEW: SOF9 QM-coder cross-path gate
    "embedding_outlier_screen",  # NEW: per-cell prototypicality gate
    "gif_roundtrip_stats",       # NEW: lossless GIF/LZW cross-path gate
    "curation_v2_corpus",        # checkpointed gated frame (trim reads once)
    "kmeans_doc_clusters",       # gate tolerance unified at 1e-6
    "kmeans_fixed_init_clusters",  # same clustering module (keep_cols guard)
    "jpeg_roundtrip_stats",      # decoder marker dispatch touched (SOF9/DAC)
    "progressive_jpeg_stats",    # same decoder change
    "image_decode_stats",        # same decoder change
]

# Freshness order: round-13 changes, then round-12, round-11, round-10,
# round-8, round-6, then everything whose latest official row predates r05
# (stalest first by construction of the earlier lists), then the
# r05-sampled set.
_SAMPLE_FIRST = _CHANGED_R15 + [
    n for n in _CHANGED_R14 if n not in _CHANGED_R15
] + [
    n for n in _CHANGED_R13 if n not in _CHANGED_R14 + _CHANGED_R15
] + [
    n for n in _CHANGED_R12
    if n not in _CHANGED_R13 + _CHANGED_R14 + _CHANGED_R15
] + [
    n for n in _CHANGED_R11
    if n not in _CHANGED_R12 + _CHANGED_R13 + _CHANGED_R14 + _CHANGED_R15
] + [
    n for n in _CHANGED_R10
    if n not in _CHANGED_R11 + _CHANGED_R12 + _CHANGED_R13 + _CHANGED_R14
    + _CHANGED_R15
] + [
    n for n in _CHANGED_R08
    if n not in _CHANGED_R10 + _CHANGED_R11 + _CHANGED_R12 + _CHANGED_R13
    + _CHANGED_R14 + _CHANGED_R15
] + [
    n for n in _CHANGED_R06
    if n not in _CHANGED_R08 + _CHANGED_R10 + _CHANGED_R11 + _CHANGED_R12
    + _CHANGED_R13 + _CHANGED_R14 + _CHANGED_R15
] + [
    n for n in QUERIES
    if n not in _CHANGED_R15
    and n not in _CHANGED_R14
    and n not in _CHANGED_R13
    and n not in _CHANGED_R12
    and n not in _CHANGED_R11
    and n not in _CHANGED_R10
    and n not in _CHANGED_R08
    and n not in _CHANGED_R06
    and n not in _R05_SAMPLED
]

# New or code-changed in round 16 — sample these first (prepended to
# the freshness order below; the comprehension keeps it duplicate-free).
_CHANGED_R16 = [
    "sitemap_coverage_audit",    # NEW: sharded-sitemap frontier audit
    "wat_export_roundtrip",      # NEW: WAT metadata derivative round-trip
    "crawl_snapshot_diff",       # NEW: dump-over-dump delta by digest
    "crawl_encoding_routing",    # NEW: per-label extracted-vs-skipped gate
    "warc_revisit_resolution",   # NEW: CC revisit digest resolution
    "cdx_surt_lookup",           # NEW: SURT key + ranged-read recovery
    "training_shard_export_bpe",  # NEW: subword shard export
    "robots_compliance_audit",   # RFC 9309 §2.2.1 group selection
    "crawl_http_fidelity",       # br leg in the fixture + is_decoded
    # html_to_text rules 3-4 now quoted-attribute-aware + _extracted
    # gained the transport-routing predicate — extraction consumers
    # re-fronted:
    "html_extract_docs",
    "crawl_curation_chain",
    "crawl_language_routing",
    "wet_export_roundtrip",
    "crawl_multimodal_stats",
    "url_canonical_dedup",
    # warc record schema gained refers_to/payload_digest; cdx gained
    # the surt column; shard_token_stream gained tokens_col; bpe_apply
    # gained keep_cols:
    "warc_ingest_stats",
    "cdx_index_coverage",
    "host_link_pagerank",
    "crawl_domain_caps",
    "training_shard_export",
    "bpe_apply_one_merge",
]
_SAMPLE_FIRST = _CHANGED_R16 + [
    n for n in _SAMPLE_FIRST if n not in _CHANGED_R16
]

# New or code-changed in round 17 — sample these first (prepended to
# the freshness order below; the comprehension keeps it duplicate-free).
_CHANGED_R17 = [
    "crawl_decoder_registry",     # NEW: pluggable transport decoders
    "crawl_redirect_resolution",  # NEW: 3xx chain following + loop/dangle
    "cdxj_export_roundtrip",      # NEW: SURT-sorted CDXJ artifact trip
    "crawl_dedup_revisit",        # NEW: revisit-aware canonical dedup
    "warc_request_pairing",       # NEW: Concurrent-To pairing + orphans
    "sitemap_recrawl_priority",   # NEW: sitemapindex + lastmod ranking
    "crawl_alias_crediting",      # NEW: chain-resolved alias credit mass
    "crawl_multimodal_stats",     # re-oracled: text/plain curation route
    "warc_revisit_resolution",    # duplicate-digest-safe (digest,url) join
    "wat_export_roundtrip",       # html_outlinks broadened (3 attr forms)
    "host_link_pagerank",         # same shared link definition
    # warc record schema gained http_location/concurrent_to/warc_date;
    # the streaming fronts gained redirect + plain routes:
    "warc_ingest_stats",
    "crawl_curation_chain",
    "url_canonical_dedup",
    "cdx_surt_lookup",
]
_SAMPLE_FIRST = _CHANGED_R17 + [
    n for n in _SAMPLE_FIRST if n not in _CHANGED_R17
]

# _SAMPLE_FIRST must stay duplicate-free by construction — the dict
# rebuild below would silently hide a repeat introduced by a future
# _CHANGED_R1X edit, so assert it here instead.
if len(_SAMPLE_FIRST) != len(set(_SAMPLE_FIRST)):  # pragma: no cover
    _dupes = sorted({n for n in _SAMPLE_FIRST if _SAMPLE_FIRST.count(n) > 1})
    raise RuntimeError(f"_SAMPLE_FIRST contains duplicates: {_dupes}")

_missing = [
    n
    for n in _SAMPLE_FIRST + _R05_SAMPLED + _R04_SAMPLED + _R03_SAMPLED
    if n not in QUERIES
]
if _missing:  # pragma: no cover - guards against a renamed query
    raise RuntimeError(f"catalog ordering references unknown queries: {_missing}")

_ordered = {n: QUERIES[n] for n in _SAMPLE_FIRST}
_ordered.update({n: s for n, s in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)
