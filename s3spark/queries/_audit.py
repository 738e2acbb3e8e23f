"""Single source for registry audit bookkeeping (round-8 ADVICE item:
the 92-key order-only sweep list was duplicated verbatim in
``s3spark/queries/__init__.py`` ``_DIRTY_KEYS`` and
``tests/test_plans.py`` ``_ROW_SCALE_SORT_FREE``; the two copies were
consistent but guaranteed to drift as rounds clear dirty keys while the
plan gate must persist).  Both consumers now import from here.

``SORT_FREE_KEYS``
    Every key whose OUTPUT row count scales with the input and whose
    semantics declare no ordering.  The round-8 registry-wide audit
    stripped the decorative trailing global ``orderBy`` from each (a
    presentational sort range-shuffles a corpus-sized output at 100 TB
    for nothing — ``doc_chunk_overlap``'s sort alone measured 12.95x at
    the 10x docs step; the driver value-hash is order-insensitive).
    The plan gate in ``tests/test_plans.py`` pins the invariant: no
    global Sort node anywhere in these keys' optimized plans, ever.
    This list only GROWS (new row-scale keys join it); it never shrinks
    with witness status.

``DIRTY_SINCE``
    key -> round whose code change invalidated the key's prior driver
    witness.  A key is *effectively* dirty until a green
    ``CORRECTNESS_r{N}.json`` row with ``N >= DIRTY_SINCE[key]`` exists
    at the repo root — computed at import by
    ``s3spark.queries._effective_dirty()``, never by hand-editing a
    second list.  Entries whose evidence has landed are inert and are
    pruned opportunistically; stale entries cost nothing.
"""

from __future__ import annotations

# Round-8 trailing-sort audit (ROUND_NOTES.md round-8 table): 88
# tier-1 strips + 3 corpus-scaling tier-2 strips (dedup_fuzzy_minhash,
# dedup_incremental_minhash, dedup_exact_normalized) + doc_chunk_overlap.
SORT_FREE_KEYS: tuple = (
    "agg_having", "array_set_algebra", "attribution_last_touch",
    "cdc_apply_tombstones", "dedup_exact", "dedup_exact_normalized",
    "dedup_fuzzy_minhash", "dedup_incremental_minhash",
    "dedup_keep_latest", "dedup_minhash_survivors", "dedup_simhash",
    "dedup_url_canonical", "doc_boilerplate_strip", "doc_chunk_overlap",
    "doc_fingerprint", "doc_segment_dedup", "embedding_quantize_int8",
    "feature_target_encode", "filter_rlike", "generator_explode_outer",
    "graph_bfs_distance", "incremental_agg_maintenance",
    "interval_coalesce", "interval_max_concurrency",
    "interval_subtract_measure", "join_asof", "join_asof_nearest",
    "join_asof_tolerance", "join_fuzzy_edit_distance",
    "join_interval_overlap", "join_null_safe", "join_pit_features",
    "join_scd2_point_in_time", "join_spatial_grid",
    "mm_audio_fingerprint_dedup", "mm_binary_meta", "mm_decode_png",
    "mm_frame_sample_wav", "mm_image_phash_dedup", "mm_image_resize",
    "pack_sequences_greedy", "project_rename_enumerate",
    "quality_classifier_hashed", "quality_gopher_rules",
    "sample_hash_based", "scalar_binary_encode", "scalar_bitwise",
    "scalar_conditional", "scalar_datetime_extended", "scalar_hash_json",
    "scalar_json_malformed", "scalar_string_extended",
    "scalar_try_error_safe", "scalar_url_parse", "scan_text_regex_parse",
    "scan_xml", "scd2_dimension", "sessionize_gaps",
    "set_union_missing_columns", "sim_ann_lsh", "split_leakage_safe",
    "stream_session", "subquery_above_avg", "subquery_scalar_global",
    "text_bigram_logprob", "text_bm25_rank", "text_edit_distance",
    "text_lang_quality", "text_langid_char_ngram", "text_pii_scrub",
    "text_repetition_filter", "text_stats", "text_tfidf_topterms",
    "text_token_bpe", "text_unicode_normalize", "text_unigram_logprob",
    "timeseries_downsample_lttb", "timeseries_gapfill",
    "timeseries_interpolate_linear", "timeseries_ohlc_bars",
    "tokenizer_vocab_coverage", "udf_arrow_map", "udtf_python_custom",
    "window_count_distinct", "window_cumulative_reset",
    "window_distribution", "window_forward_fill",
    "window_islands_value_runs", "window_moving_zscore",
    "window_pattern_match", "window_rolling_median", "window_time_decay",
)

# Round-9 additions: new row-scale keys BORN sort-free (never had a
# trailing sort to strip — the audit invariant applies from their
# first commit, so the plan gate covers them; they are NOT round-8
# rewrites and carry no DIRTY_SINCE entry from the sweep).
_R9_SORT_FREE_NEW: tuple = (
    "join_phonetic_soundex",
    "scalar_point_in_polygon",
    "join_bitemporal",
)

SORT_FREE_KEYS = SORT_FREE_KEYS + _R9_SORT_FREE_NEW

# Round-11 keys born sort-free (row-scale outputs, no decorative
# global orderBy ever shipped; listed here so the plan gate pins the
# invariant from birth — these carry no DIRTY_SINCE entry).
_R11_SORT_FREE_NEW: tuple = (
    "dedup_substring_exact",
    "dedup_substring_mask",
    "sim_pq_codebook_assign",
)

SORT_FREE_KEYS = SORT_FREE_KEYS + _R11_SORT_FREE_NEW

# All round-8 rewrites: the 92 sort strips above plus the 5 substantive
# rewrites (join strategy / shared-helper arithmetic / broadcast-hint
# semantics).  50 of these cleared via green CORRECTNESS_r08 rows the
# moment that artifact landed; the remaining 47 front the round-9
# window and clear themselves when CORRECTNESS_r09.json is committed.
DIRTY_SINCE: dict = {
    **{
        k: 8
        for k in SORT_FREE_KEYS
        if k not in _R9_SORT_FREE_NEW and k not in _R11_SORT_FREE_NEW
    },
    "join_multiway": 8,
    "agg_countmin_sketch": 8,
    # Round 9: the three classical-stat tails gain degenerate-
    # denominator guards in the shared expression text (|rho| = 1,
    # constant columns, empty/single-row cohorts, all-tied corpora —
    # ANSI Spark throws DIVIDE_BY_ZERO and DuckDB returns NULL where
    # the statistic calls for NaN/Infinity; found by the hypothesis
    # differential tests, unreachable on the fixture).
    "stats_spearman_corr": 9,
    "stats_mann_whitney_u": 9,
    "stats_welch_ttest": 9,
    "stats_ab_proportion_ztest": 9,
    "stats_ks_two_sample": 9,
    # Round 9: median selection rewritten — equi-depth range buckets
    # over raw slope rows (the equi-width cell scheme put 98.8% of
    # pairs in one bucket), local daily relation, driver-exact k1/k2.
    "timeseries_theil_sen": 9,
    # Round 9: sentinel fixture write repartition(1) instead of
    # coalesce(1) (the 2-row local-relation coalesce stalled ~5 s on
    # scheduler locality wait); values untouched, code changed.
    "stream_outer_join_watermark": 9,
    # Round 9: dim rows keep their real event_id so same-timestamp
    # version ties break like the oracle's validity tiling (was
    # partition-order luck; differential-test finding).
    "join_scd2_point_in_time": 9,
    # Round-9 extension: the degenerate-denominator sweep applied
    # BEYOND the stats16 family — zero-variance Pearson (builtin corr
    # throws under ANSI), singular normal equations, constant-series
    # ACF, empty-feed Benford, single-token Zipf (incl. the flag),
    # zero-norm cosine exclusion, and the time-decay λ-safe horizon
    # guard.  Fixture values unchanged (sims green at 3 SFs × 5/8
    # partitions); expression texts changed.
    "agg_corr_stddev": 9,
    "ml_linreg_normal_eq": 9,
    "timeseries_autocorrelation": 9,
    "dq_benford_first_digit": 9,
    "text_zipf_fit": 9,
    "sim_cosine_topk": 9,
    "dedup_embedding_cosine": 9,
    "window_time_decay": 9,
    # Full-registry degenerate sweep, second pass: empty-cohort PSI
    # (na/nb = 0 → NULL terms + NULL verdict) and single-cohort /
    # degenerate-permutation mean diffs in the permutation test.
    "dq_drift_psi": 9,
    "stats_permutation_test": 9,
    # Empty-input crash sweep: write-then-re-read keys gain explicit
    # read schemas (an empty source writes no partitions to infer
    # from), all-pruned/zero-file scans become explicit empty
    # relations, and the zero-batch stream merge target is guarded.
    # Fixture values unchanged (sims green x4 configs).
    "scan_incremental_manifest_diff": 9,
    "sink_dynamic_partition_overwrite": 9,
    "sink_partitioned_pruning": 9,
    "join_partition_pruning_dynamic": 9,
    "stream_foreach_batch_upsert": 9,
    # Round 10 (verdict item 3): source+tampered fingerprints fused
    # into ONE lineitem scan (stack over the 1-row conditional
    # aggregate); values identical, plan changed.
    "dq_table_checksum": 10,
    # Round 10 (r9 ADVICE): scoring cross-joins the bounded class list
    # and LEFT-joins the sparse model, so a class sharing zero tokens
    # with a doc still competes in the argmax with its true prior-only
    # score.  Fixture values unchanged (shared vocabulary makes the
    # old inner join coincide); SQL text changed on both engines.
    "ml_naive_bayes_text": 10,
    # Round 10 (r9 ADVICE): pruned LEAF-file reads carry the data-
    # column schema only — leaf reads get no partition discovery, so
    # including fb silently materialized it as all-NULL.  Output
    # never projected fb; values unchanged, read schema changed.
    "scan_manifest_prune": 10,
    # Round 11 (r10 ADVICE): min/max aggregate on the NATIVE column
    # (decimal/date) and canonicalize AFTER the reduction — the old
    # MIN(CAST(c AS STRING)) form reported lexicographic extremes on
    # numeric columns.  VALUES CHANGED on both engines (oracle too).
    "dq_column_profile": 11,
    # Round 11 (r10 ADVICE): sig_95 critical value selected by a
    # per-df literal CASE on k-1 (df 1..10, NULL beyond) instead of
    # the hardcoded df=4 quantile.  Fixture value unchanged (k=5);
    # expression text changed on both engines.
    "stats_kruskal_wallis": 11,
    # Round 11 (verdict item 5): stages 1-3 factored into
    # _e2e_clean/_e2e_survivors for the survivors-equivalence test;
    # plan and values unchanged, code moved.
    "curation_pipeline_e2e": 11,
    # Round 12 (ADVICE): n_matched now counts only band-matched aligned
    # scenes (was COUNT(*), vacuously equal to n_scenes for equal-count
    # pairs), enforcing the documented per-scene band-match semantics in
    # both engine and oracle.  Fixture output unchanged (planted pairs
    # differ <=2 bits/scene, so >=2 of 4 bands always match).
    "mm_video_phash_dedup": 12,
}
