"""Driver-window coverage ledger (round 12).

The driver's correctness gate checks only the catalog's FIRST 50
entries, so which entries have EVER been inside that window is part
of the engine's verification record.  ``PREVIOUSLY_WINDOWED`` is the
frozen union of all driver-recorded windows (CORRECTNESS_r02..r11 —
97 entries); it must only ever GROW by unioning in a shipped round's
window, never shrink or mutate, so the rotation tests can pin that
every round retires >= 25 entries of never-windowed debt and that the
backlog drains within a bounded number of rounds (the cursor rule in
tests/test_catalog_window.py: rotating slots come from the HEAD of
``window_backlog()`` plus the round's new families).
"""

from __future__ import annotations

#: union of CORRECTNESS_r02..r11 driver windows — FROZEN history
PREVIOUSLY_WINDOWED = frozenset({
    "agg_count_distinct",
    "agg_count_filtered",
    "agg_count_total",
    "agg_extrema",
    "agg_ohlc_daily",
    "approx_distinct_tokens",
    "approx_qhist_quality",
    "approx_qhist_quantiles",
    "approx_qhist_registers",
    "cumulative_distinct_users",
    "curate_data_card",
    "curate_leakage_safe_split",
    "curate_pack_bins",
    "curate_ppl_buckets",
    "curate_ppl_gate_from_model",
    "curate_release_pipeline",
    "curate_split_from_state",
    "curate_temperature_mixture",
    "curate_token_budget_head",
    "curate_training_docs",
    "curate_training_order",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signature",
    "dedup_near_clusters",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_norms",
    "filter_between_ts",
    "filter_point_lookup",
    "filter_trailing_window",
    "first_last_by_order",
    "flagship_daily_indicators",
    "join_broadcast_region_revenue",
    "join_range_binned",
    "mm_audio_windows",
    "mm_block_hash",
    "mm_block_hash_near_dup",
    "mm_byte_features",
    "mm_decode_stub",
    "mm_frame_sample",
    "mm_metadata",
    "phys_zorder_code",
    "phys_zorder_layout_stats",
    "phys_zorder_prune_report",
    "project_filter_literal",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "scalar_regex_battery",
    "search_bm25_topk",
    "session_paths",
    "sim_bq_recall",
    "sim_bq_recall_sweep",
    "sim_bq_topk",
    "sim_centroid_drift",
    "sim_cosine_topk",
    "sim_cosine_topk_fast",
    "sim_embedding_near_dup",
    "sim_ivf_recall",
    "sim_ivf_topk",
    "sim_ivfpq_from_index",
    "sim_ivfpq_topk",
    "sim_lsh_recall",
    "sim_lsh_topk",
    "sim_rrf_recall",
    "sim_rrf_topk",
    "sink_table_append_ignore",
    "sink_table_upsert",
    "text_bigram_from_model",
    "text_bigram_logprob",
    "text_bpe_encode_from_model",
    "text_bpe_merges",
    "text_cms_counts",
    "text_cms_from_sketch",
    "text_dup_span_scrub",
    "text_encode_from_vocab",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_token_stats",
    "text_tokenizer_report",
    "text_unigram_encode",
    "text_unigram_from_model",
    "text_unigram_vocab",
    "text_vocab_build",
    "text_vocab_coverage",
    "text_wordpiece_encode",
    "text_wordpiece_from_model",
    "train_test_split",
    "win_ma30",
    "win_ma7",
    "win_pct_change",
    "win_vol10",
    "win_vol30",
})


def window_backlog():
    """Oracle-backed catalog entries never yet inside a driver window
    (catalog order) — the queue the next round's rotation MUST draw
    from the head of."""
    from airflow_crypto_btc_spark.plans.catalog import (
        ALL_QUERIES,
        _WINDOW_PRIORITY,
    )

    ever = PREVIOUSLY_WINDOWED | set(_WINDOW_PRIORITY)
    return [
        k
        for k, v in ALL_QUERIES.items()
        if k not in ever and v.sql is not None
    ]
