"""Engine operator surface (SURVEY.md §2.3) — importing this package
registers every verified query into ``s3spark.registry.REGISTRY``.

Registration order matters operationally: the driver's correctness
window records keys in *registration order* and caps how many it
verifies (~50/round).  Rounds 1-3 witnessed 121 distinct green keys
(union of CORRECTNESS_r01-r03); ``_rotate_registry()`` below rebuilds
the dict each import so the window always lands on dirty/rewritten
keys first, then never-witnessed keys, then witnessed ones — the
key-level rotation the round-2 verdict asked for, tightened in round
3 to count only GREEN rows as witnessed.
"""

from s3spark.queries import (  # noqa: F401
    ann2,
    # --- §2.3 core engine surface (register first) ---
    scans,
    filters,
    fileops,
    joins,
    aggregates,
    # llm + eventtime promoted ahead of windows/sorts/sets/scalars:
    # the LLM-data surface is graded first-class and round 1's ~50-key
    # driver window cut off at position 50, leaving dedup_* unwitnessed
    llm,
    eventtime,
    windows,
    sorts,
    sets,
    scalars,
    udx,
    # --- long-tail coverage modules ---
    advanced,
    analytics,
    analytics2,
    analytics3,
    analytics4,
    behavior,
    bucketing,
    coverage3,
    coverage4,
    coverage5,
    curation,
    curation2,
    curation3,
    etl,
    formats,
    matching,
    mlprep,
    mlprep2,
    multimodal,
    pipeline2,
    pipeline4,
    pipeline5,
    planner2,
    quality,
    relational5,
    relational6,
    robustness,
    scalars2,
    scalars3,
    scale4,
    scale_ops,
    sketches,
    sources2,
    sqlsurface,
    streaming2,
    text2,
    timeseries,
    udx2,
    # round-5/6 additions register LAST: new keys are unwitnessed and
    # must not displace older unwitnessed keys from the ~50-key driver
    # window mid-rotation
    pipeline6,
    pipeline7,
    pipeline8,
    pipeline9,
    pipeline10,
    pipeline11,
    pipeline12,
    pipeline13,
    pipeline14,
    pipeline15,
    pipeline16,
    pipeline17,
    pipeline18,
)

# Keys with a green row in CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json
# (driver-witnessed), the static fallback for _witnessed_keys() below.
_WITNESSED_R1_R2 = frozenset({
    "agg_approx_distinct", "agg_corr_stddev", "agg_count_distinct",
    "agg_cube", "agg_global", "agg_groupby", "agg_grouping_sets",
    "agg_having", "agg_histogram", "agg_percentiles", "agg_regression",
    "agg_rollup", "agg_salted_skew", "agg_string_ordered",
    "array_set_algebra", "dedup_clusters", "dedup_embedding_cosine",
    "dedup_exact", "dedup_fuzzy_minhash", "dedup_ngram_jaccard",
    "dedup_simhash", "doc_fingerprint", "filter_comparison",
    "filter_compound", "filter_like", "filter_null", "filter_rlike",
    "join_anti", "join_asof", "join_broadcast", "join_bucketed_colocated",
    "join_full", "join_inner_equi", "join_left", "join_multiway",
    "join_range_bucketed", "join_right", "join_semi", "join_theta_range",
    "merge_upsert", "pivot_status_counts", "project_arith", "project_case",
    "project_rename_enumerate", "q10_returned_items", "q14_promo_share",
    "q18_large_orders", "q19_disjunctive", "q22_dormant_customers",
    "q2_min_supplier_per_part", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "rollup_reuse_hourly_daily", "scan_parquet",
    "scan_projection_pushdown", "sim_ann_ivf", "sim_ann_lsh",
    "sim_cosine_topk", "sink_csv_roundtrip",
    "sink_dynamic_partition_overwrite", "sink_json_roundtrip",
    "sink_orc_roundtrip", "sink_parquet_roundtrip",
    "sink_partitioned_pruning", "source_listing", "stream_session",
    "stream_sliding", "stream_stateful_user_stats", "stream_tumbling",
    "stream_watermark_dedup", "subquery_above_avg", "subquery_scalar_global",
    "text_lang_quality", "text_stats", "text_token_bpe", "window_analytic",
    "window_ranking",
})


# Keys whose IMPLEMENTATION changed after their last driver-witnessed
# round: a prior green row no longer vouches for the current code, so
# they are treated as unwitnessed (and ordered first) until the driver
# re-records them.  Maintained by hand per round — add a key here when
# rewriting it, remove it once a post-rewrite CORRECTNESS row lands.
_DIRTY_KEYS = frozenset({
    # Rewritten AGAIN in round 8 (round-7 ADVICE): the unconditional
    # customer-chain broadcast traded a stats hazard for a guaranteed
    # OOM at large SF — now only region⋈nation broadcasts and both
    # fact edges carry MERGE hints.  Its green r7 row predates this.
    "join_multiway",
    # Round 8: dropped the trailing full-output global orderBy (the
    # only super-linear scale-panel key, 12.95× at 10× docs).
    "doc_chunk_overlap",
    # Round 8: shared prefix-sum helper promoted to _prefix.py with
    # the overflow-safe division-only bucket formula (values are
    # provably bucket-boundary-independent, but the code changed).
    "stats_mann_whitney_u",
    "timeseries_theil_sen",
    # Round 8: helper change above + dropped the forced x-rank-map
    # broadcast hint (its size grows with SF; auto-broadcast decides).
    "stats_spearman_corr",
    # Round 8: hash rows now the four 32-bit words of ONE md5 per key
    # (bucket layout changed; oracle updated in lockstep; 2.6x faster).
    "agg_countmin_sketch",
    # Round 8 tier-2 sweep: dup-pair / survivor outputs that scale
    # with the corpus (measured 8-10x rows at 10x docs) lose their
    # trailing sorts too.
    "dedup_fuzzy_minhash",
    "dedup_incremental_minhash",
    "dedup_exact_normalized",
# Round 8: the registry-wide trailing-sort audit removed the
# decorative full-output global orderBy from every row-count-scale
# key (see ROUND_NOTES.md round-8 table).  Values are order-
# insensitive under the driver hash, but the code changed, so each
# needs a fresh witness.  Exceeds one ~50-key window; the rotation
# fronts them and the remainder re-witnesses in round 9.
    "agg_having",
    "array_set_algebra",
    "attribution_last_touch",
    "cdc_apply_tombstones",
    "dedup_exact",
    "dedup_keep_latest",
    "dedup_minhash_survivors",
    "dedup_simhash",
    "dedup_url_canonical",
    "doc_boilerplate_strip",
    "doc_fingerprint",
    "doc_segment_dedup",
    "embedding_quantize_int8",
    "feature_target_encode",
    "filter_rlike",
    "generator_explode_outer",
    "graph_bfs_distance",
    "incremental_agg_maintenance",
    "interval_coalesce",
    "interval_max_concurrency",
    "interval_subtract_measure",
    "join_asof",
    "join_asof_nearest",
    "join_asof_tolerance",
    "join_fuzzy_edit_distance",
    "join_interval_overlap",
    "join_null_safe",
    "join_pit_features",
    "join_scd2_point_in_time",
    "join_spatial_grid",
    "mm_audio_fingerprint_dedup",
    "mm_binary_meta",
    "mm_decode_png",
    "mm_frame_sample_wav",
    "mm_image_phash_dedup",
    "mm_image_resize",
    "pack_sequences_greedy",
    "project_rename_enumerate",
    "quality_classifier_hashed",
    "quality_gopher_rules",
    "sample_hash_based",
    "scalar_binary_encode",
    "scalar_bitwise",
    "scalar_conditional",
    "scalar_datetime_extended",
    "scalar_hash_json",
    "scalar_json_malformed",
    "scalar_string_extended",
    "scalar_try_error_safe",
    "scalar_url_parse",
    "scan_text_regex_parse",
    "scan_xml",
    "scd2_dimension",
    "sessionize_gaps",
    "set_union_missing_columns",
    "sim_ann_lsh",
    "split_leakage_safe",
    "stream_session",
    "subquery_above_avg",
    "subquery_scalar_global",
    "text_bigram_logprob",
    "text_bm25_rank",
    "text_edit_distance",
    "text_lang_quality",
    "text_langid_char_ngram",
    "text_pii_scrub",
    "text_repetition_filter",
    "text_stats",
    "text_tfidf_topterms",
    "text_token_bpe",
    "text_unicode_normalize",
    "text_unigram_logprob",
    "timeseries_downsample_lttb",
    "timeseries_gapfill",
    "timeseries_interpolate_linear",
    "timeseries_ohlc_bars",
    "tokenizer_vocab_coverage",
    "udf_arrow_map",
    "udtf_python_custom",
    "window_count_distinct",
    "window_cumulative_reset",
    "window_distribution",
    "window_forward_fill",
    "window_islands_value_runs",
    "window_moving_zscore",
    "window_pattern_match",
    "window_rolling_median",
    "window_time_decay",
})


def _witnessed_keys() -> frozenset:
    """Keys with a GREEN row in ANY CORRECTNESS_r*.json at the repo
    root: ``err is None and hash_match`` for oracled keys, or an
    executed rows-only row (``err == 'no_oracle'`` with a recorded
    spark_rows) for approximate keys.  A key that ran and FAILED
    (a real err, or hash/rows mismatch) stays un-witnessed so the
    rotation keeps it at the front of the driver's verification
    window until a green row lands.  Keys in ``_DIRTY_KEYS`` are
    excluded regardless — their implementation changed after the row
    was recorded.  Falls back to the static rounds-1+2 list if the
    files are unreadable."""
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: set = set()
    found = False
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path, encoding="utf-8") as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        found = True
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("err") is None and row.get("hash_match") is True
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green or rows_only:
                seen.add(key)
    base = frozenset(seen) if found else _WITNESSED_R1_R2
    return base - _DIRTY_KEYS


# Within the dirty set, these re-witness FIRST: keys whose round-8
# change was substantive (join strategy, shared-helper arithmetic,
# broadcast-hint semantics), ahead of the 88 order-only sort strips.
# The dirty set exceeds one ~50-key driver window this round, and the
# substantive changes must not queue behind value-neutral ones —
# registration order alone would put the late-module stats keys last.
_DIRTY_PRIORITY = (
    "join_multiway",
    "doc_chunk_overlap",
    "stats_mann_whitney_u",
    "stats_spearman_corr",
    "timeseries_theil_sen",
    "agg_countmin_sketch",
)


def _rotate_registry() -> None:
    from s3spark.registry import REGISTRY

    witnessed = _witnessed_keys()
    # order: dirty-but-registered keys first (rewritten code with a
    # stale green row; substantive rewrites before order-only strips),
    # then never-witnessed keys, then witnessed.
    dirty = {
        k: REGISTRY[k] for k in _DIRTY_PRIORITY if k in REGISTRY
    }
    dirty.update(
        {k: v for k, v in REGISTRY.items() if k in _DIRTY_KEYS}
    )
    unseen = {
        k: v
        for k, v in REGISTRY.items()
        if k not in witnessed and k not in _DIRTY_KEYS
    }
    seen = {k: v for k, v in REGISTRY.items() if k in witnessed}
    REGISTRY.clear()
    REGISTRY.update(dirty)
    REGISTRY.update(unseen)
    REGISTRY.update(seen)


_rotate_registry()
