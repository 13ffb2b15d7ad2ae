"""PySpark-native data-profiling / analytics engine.

A brand-new engine with the query and data-processing capabilities of
okkam-it/flink-descriptive-stats (reference at /root/reference, studied via
SURVEY.md), re-expressed idiomatically on Spark DataFrames:

- the whole per-column profile (counts, nulls, min/max/mean, central moments,
  derived standard errors, Jarque-Bera, lengths, latent-type inference) is ONE
  shuffle-light ``df.agg(...)`` — Spark's partial+final HashAggregate is the
  same algebraic-merge model as the reference's ``StatsPojo.reduce``
  (reference: src/main/java/org/apache/flink/stats/StatsPojo.java:101-155).
- top-K frequent values / character patterns are ONE multiplexed grouped job
  over a melted (column, token) frame, with Spark's WindowGroupLimit
  rank-limit pushdown bounding the per-column funnel (reference runs 2
  serial parallelism-1 sorts per string column, ProfileJob.java:195-208 —
  an anti-pattern at scale).
- the same aggregate bundle runs under Structured Streaming windows.

Extensions beyond the reference surface: distinct counts, quartiles,
histograms, outliers, correlation (the reference's own declared roadmap,
ProfileJob.java:67-71) plus large-scale pipeline operators: dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine), similarity search,
text analysis, multimodal column plumbing.
"""

__version__ = "0.5.0"

from flink_descriptive_stats_spark.session import get_spark  # noqa: F401

# Lazy top-level API (PEP 562): the engine's headline operators are
# importable as `from flink_descriptive_stats_spark import profile, ...`
# without paying every submodule's import cost up front.
_API = {
    "profile": ("operators.profile", "profile"),
    "complete_row_count": ("operators.profile", "complete_row_count"),
    "topk_tokens": ("operators.topk", "topk_tokens"),
    "jb_report": ("report", "jb_report"),
    "render_profile": ("report", "render_profile"),
    "distinct_counts": ("operators.extras", "distinct_counts"),
    "quantiles": ("operators.extras", "quantiles"),
    "histogram": ("operators.extras", "histogram"),
    "outlier_counts": ("operators.extras", "outlier_counts"),
    "correlation_matrix": ("operators.extras", "correlation_matrix"),
    "psi_drift": ("operators.extras", "psi_drift"),
    "exact_dedup": ("operators.dedup", "exact_dedup"),
    "keep_first": ("operators.dedup", "keep_first"),
    "decontaminate": ("operators.dedup", "decontaminate"),
    "minhash_dedup_pairs": ("operators.dedup", "minhash_dedup_pairs"),
    "neardup_clusters": ("operators.dedup", "neardup_clusters"),
    "dedup_corpus": ("operators.dedup", "dedup_corpus"),
    "embedding_near_dup_pairs": ("operators.dedup",
                                 "embedding_near_dup_pairs"),
    "embedding_near_dup_pairs_lsh": ("operators.dedup",
                                     "embedding_near_dup_pairs_lsh"),
    "ngram_containment_pairs": ("operators.dedup",
                                "ngram_containment_pairs"),
    "duplicated_ngram_fraction": ("operators.dedup",
                                  "duplicated_ngram_fraction"),
    "contamination_report": ("operators.dedup", "contamination_report"),
    "brute_force_topk": ("operators.similarity", "brute_force_topk"),
    "lsh_topk": ("operators.similarity", "lsh_topk"),
    "ivf_topk": ("operators.similarity", "ivf_topk"),
    "text_stats": ("operators.text", "text_stats"),
    "quality_filter": ("operators.text", "quality_filter"),
    "pii_scan": ("operators.text", "pii_scan"),
    "pii_redact": ("operators.text", "pii_redact"),
    "repetition_stats": ("operators.text", "repetition_stats"),
    "hash_split": ("operators.sampling", "hash_split"),
    "mixture_sample": ("operators.sampling", "mixture_sample"),
    "pack_sequences": ("operators.sampling", "pack_sequences"),
    "asof_join": ("operators.joins", "asof_join"),
    "range_join": ("operators.joins", "range_join"),
    "windowed_profile": ("streaming.profile_stream", "windowed_profile"),
    "write_bucketed": ("sources.layout", "write_bucketed"),
    "write_partitioned": ("sources.layout", "write_partitioned"),
    # round-5 families
    "column_entropy": ("operators.extras", "column_entropy"),
    "referential_integrity": ("operators.extras", "referential_integrity"),
    "benford_digits": ("operators.extras", "benford_digits"),
    "histogram_equidepth": ("operators.extras", "histogram_equidepth"),
    "categorical_association": ("operators.extras",
                                "categorical_association"),
    "profile_compare": ("operators.extras", "profile_compare"),
    "ks_drift": ("operators.extras", "ks_drift"),
    "winsorize": ("operators.extras", "winsorize"),
    "tfidf_top_terms": ("operators.text", "tfidf_top_terms"),
    "char_entropy": ("operators.text", "char_entropy"),
    "bigram_conditional_entropy": ("operators.text",
                                   "bigram_conditional_entropy"),
    "cluster_size_histogram": ("operators.dedup", "cluster_size_histogram"),
    "weighted_sample": ("operators.sampling", "weighted_sample"),
    "funnel": ("operators.events", "funnel"),
    "retention_cohorts": ("operators.events", "retention_cohorts"),
    "resample": ("operators.events", "resample"),
    "countmin_topk": ("operators.sketch", "countmin_topk"),
    # round-5 session-2 families
    "check_constraints": ("operators.quality", "check_constraints"),
    "autocorrelation": ("operators.events", "autocorrelation"),
    "transition_matrix": ("operators.events", "transition_matrix"),
    "rollup_profile": ("operators.events", "rollup_profile"),
    "trend": ("operators.events", "trend"),
    "typo_pairs": ("operators.text", "typo_pairs"),
    "lm_score": ("operators.text", "lm_score"),
    "lang_confusion": ("operators.text", "lang_confusion"),
    "semdedup": ("operators.similarity", "semdedup"),
    "histogram2d": ("operators.extras", "histogram2d"),
    "start_constraint_monitor": ("streaming.pipeline_stream",
                                 "start_constraint_monitor"),
    "spearman_matrix": ("operators.extras", "spearman_matrix"),
    "woe_iv": ("operators.extras", "woe_iv"),
    "null_pattern_report": ("operators.extras", "null_pattern_report"),
    "event_paths": ("operators.events", "event_paths"),
    "session_summary": ("streaming.pipeline_stream", "session_summary"),
    "doc_feature_vectors": ("operators.text", "doc_feature_vectors"),
    "doc_clusters": ("operators.text", "doc_clusters"),
    "cluster_balanced_sample": ("operators.sampling",
                                "cluster_balanced_sample"),
    "js_drift": ("operators.extras", "js_drift"),
    "seasonality_profile": ("operators.events", "seasonality_profile"),
    "cusum_changepoint": ("operators.events", "cusum_changepoint"),
    "start_drift_monitor": ("streaming.pipeline_stream",
                            "start_drift_monitor"),
    "profile_state": ("operators.moments", "profile_state"),
    "merge_profile_states": ("operators.moments", "merge_profile_states"),
    "finalize_profile_state": ("operators.moments",
                               "finalize_profile_state"),
    "start_profile_monitor": ("streaming.pipeline_stream",
                              "start_profile_monitor"),
    "embedding_diversity": ("operators.similarity", "embedding_diversity"),
    "embedding_drift": ("operators.similarity", "embedding_drift"),
    "latest_by_key": ("operators.events", "latest_by_key"),
    "pareto_share": ("operators.events", "pareto_share"),
    "audio_spectral_features": ("operators.multimodal",
                                "audio_spectral_features"),
    "image_texture_features": ("operators.multimodal",
                               "image_texture_features"),
    "readability": ("operators.text", "readability"),
    "charset_audit": ("operators.text", "charset_audit"),
    "collocations": ("operators.text", "collocations"),
    "schema_suggestions": ("operators.extras", "schema_suggestions"),
    "check_constraints_by": ("operators.quality", "check_constraints_by"),
    "type_affinity": ("operators.events", "type_affinity"),
    "histogram_log": ("operators.extras", "histogram_log"),
    "percentile_rank_transform": ("operators.extras",
                                  "percentile_rank_transform"),
    "corpus_overlap": ("operators.dedup", "corpus_overlap"),
    "interarrival_profile": ("operators.events", "interarrival_profile"),
    "shared_prefix_groups": ("operators.dedup", "shared_prefix_groups"),
    "late_arrival_audit": ("operators.events", "late_arrival_audit"),
    "join_cardinality_estimate": ("operators.joins",
                                  "join_cardinality_estimate"),
    # round-5 session-3 operators
    "canonical_dedup": ("operators.dedup", "canonical_dedup"),
    "keep_best_canonical": ("operators.dedup", "keep_best_canonical"),
    "ngram_jaccard_pairs_prefix": ("operators.dedup",
                                   "ngram_jaccard_pairs_prefix"),
    "minhash_calibration": ("operators.dedup", "minhash_calibration"),
    "cross_source_dups": ("operators.dedup", "cross_source_dups"),
    "paragraph_dedup": ("operators.dedup", "paragraph_dedup"),
    "dup_rate_by_source": ("operators.dedup", "dup_rate_by_source"),
    "incremental_dedup_report": ("operators.dedup",
                                 "incremental_dedup_report"),
    "dedup_corpus_keep_best": ("operators.dedup",
                               "dedup_corpus_keep_best"),
    "pq_codebooks": ("operators.similarity", "pq_codebooks"),
    "pq_encode": ("operators.similarity", "pq_encode"),
    "pq_topk": ("operators.similarity", "pq_topk"),
    "ivf_pq_topk": ("operators.similarity", "ivf_pq_topk"),
    "label_separation": ("operators.similarity", "label_separation"),
    "label_purity": ("operators.similarity", "label_purity"),
    "compression_ratio": ("operators.text", "compression_ratio"),
    "token_fertility": ("operators.text", "token_fertility"),
    "vocab_growth": ("operators.text", "vocab_growth"),
    "windowed_quantiles": ("streaming.profile_stream",
                           "windowed_quantiles"),
    "start_ingest_dedup_monitor": ("streaming.pipeline_stream",
                                   "start_ingest_dedup_monitor"),
    "join_advisor": ("operators.joins", "join_advisor"),
    "temporal_split": ("operators.sampling", "temporal_split"),
    "pack_sequences_bfd": ("operators.sampling", "pack_sequences_bfd"),
    "k_anonymity": ("operators.quality", "k_anonymity"),
    "quality_ensemble": ("operators.quality", "quality_ensemble"),
    "curate_corpus": ("operators.quality", "curate_corpus"),
    "distinct_rollup_hll": ("operators.extras", "distinct_rollup_hll"),
    "key_candidates": ("operators.extras", "key_candidates"),
    "fuzzy_key_join": ("operators.joins", "fuzzy_key_join"),
    "load_binary_dir": ("sources.tables", "load_binary_dir"),
    "load_text_dir": ("sources.tables", "load_text_dir"),
    # round 6: scale-path siblings, PQ index lifecycle, mixing
    "ks_drift_approx": ("operators.extras", "ks_drift_approx"),
    "pq_calibration": ("operators.similarity", "pq_calibration"),
    "write_pq_index": ("operators.similarity", "write_pq_index"),
    "pq_index_topk": ("operators.similarity", "pq_index_topk"),
    "append_pq_index": ("operators.similarity", "append_pq_index"),
    "write_ivf_pq_index": ("operators.similarity", "write_ivf_pq_index"),
    "ivf_pq_index_topk": ("operators.similarity", "ivf_pq_index_topk"),
    "append_ivf_pq_index": ("operators.similarity",
                            "append_ivf_pq_index"),
    "temperature_mixture_sample": ("operators.sampling",
                                   "temperature_mixture_sample"),
    "dataset_card": ("operators.quality", "dataset_card"),
    "dataset_card_by_source": ("operators.quality",
                               "dataset_card_by_source"),
    # round 7: index lifecycle health + streaming index maintenance
    "index_stats": ("operators.similarity", "index_stats"),
    "pq_index_calibration": ("operators.similarity",
                             "pq_index_calibration"),
    "start_index_append_stream": ("streaming.pipeline_stream",
                                  "start_index_append_stream"),
    "covariance_matrix": ("operators.extras", "covariance_matrix"),
    "decontaminate_bloom": ("operators.dedup", "decontaminate_bloom"),
    "grouped_correlation": ("operators.extras", "grouped_correlation"),
    "image_phash": ("operators.multimodal", "image_phash"),
    "image_neardup_pairs": ("operators.multimodal", "image_neardup_pairs"),
    "bpe_learn": ("operators.text", "bpe_learn"),
    "bpe_token_stats": ("operators.text", "bpe_token_stats"),
}

__all__ = ["get_spark", *sorted(_API)]


def __getattr__(name: str):
    if name in _API:
        import importlib
        mod, attr = _API[name]
        return getattr(importlib.import_module(f"{__name__}.{mod}"), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
