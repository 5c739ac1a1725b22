"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``culvert_spark`` — this module only
assembles the registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from culvert_spark import queries as _q

_REGISTRIES = [_q]

try:  # text / dedup / similarity ops (filled in incrementally)
    from culvert_spark import textops as _t

    _REGISTRIES.append(_t)
except ImportError:  # pragma: no cover
    pass

try:  # multimodal (binary payload) ops — rows-only driver checks
    from culvert_spark import multimodal as _m

    _REGISTRIES.append(_m)
except ImportError:  # pragma: no cover
    pass

try:  # Arrow/pandas-UDF vectorized ops
    from culvert_spark import vectorops as _v

    _REGISTRIES.append(_v)
except ImportError:  # pragma: no cover
    pass

try:  # training-data pipeline ops batch 2 (redaction/chunking/sampling/...)
    from culvert_spark import pipelineops as _p

    _REGISTRIES.append(_p)
except ImportError:  # pragma: no cover
    pass

try:  # analytics batch 3 (EWMA / transitions / count-min sketch)
    from culvert_spark import analyticsops as _a

    _REGISTRIES.append(_a)
except ImportError:  # pragma: no cover
    pass

try:  # SQL-text entry surface
    from culvert_spark import sqlrunner as _s

    _REGISTRIES.append(_s)
except ImportError:  # pragma: no cover
    pass

try:  # training-data prep batch (round 3: shuffle/truncation/gopher/semdedup)
    from culvert_spark import trainprep as _tp

    _REGISTRIES.append(_tp)
except ImportError:  # pragma: no cover
    pass

try:  # corpus analysis + Spark 4 SQL surface (round 3 batch 2)
    from culvert_spark import corpusops as _c

    _REGISTRIES.append(_c)
except ImportError:  # pragma: no cover
    pass


#: Driver CORRECTNESS verification covers the first N registered queries in
#: registration order (50-query window per round).  Rounds 1+2 verified 97
#: queries (90 hash-green, 7 rows-only-by-design, 0 failures) — those keep
#: their CORRECTNESS rows and do not need re-checking.  Round 3 front-loads
#: the queries that still have no driver row (the "ROUND-3 ROTATION" list
#: from round 2), plus the queries whose code or oracle changed this round
#: (q_basket_part_pairs / q_graph_triangles: Apriori prefilter;
#: q_dau_wau_mau: oracle rewrite; v_user_value_zscores /
#: v_grouped_agg_median: newly oracled via ROUND(x, 6)).  Names missing
#: from the registries are ignored; registered names missing from this list
#: keep their module registration order after the priority block.
#:
#: ROUND-4 ROTATION (do this at the start of round 4, after CORRECTNESS_r03
#: lands): replace this list with the remaining unchecked names —
#: q_table_fingerprint, q_embedding_dim_stats, q_trending_event_types,
#: q_mom_revenue_growth, t_bigram_lm_top, q_churned_users,
#: t_length_band_filter, t_dedup_keep_best, q_rfm_segments,
#: q_robust_outlier_stats, q_histogram_2d, q_gini_concentration,
#: q_yoy_revenue_growth, q_new_vs_returning, q_cumulative_distinct_users,
#: q_conversion_latency, q_pareto_coverage, t_vocab_growth,
#: q_weekday_seasonality, q_null_profile, q_json_key_profile (21 from the
#: r2 overflow), the 10 queries added in round 3 — t_deterministic_shuffle,
#: t_context_truncation_stats, t_quality_percentile_filter,
#: t_gopher_quality_rules, s_semantic_dedup_rep, q_ols_daily_revenue_trend,
#: q_chi2_priority_status, t_mix_temperature_weights, t_char_class_profile,
#: t_token_coverage_topk, t_pretrain_pipeline_e2e — the 9 corpusops
#: queries added later in round 3 (t_doc_entropy, t_boilerplate_ngrams,
#: t_hashed_ngram_features, t_incremental_dedup, q_bfs_reachable_parts,
#: q_sql_pipe_interface, q_collation_group_ci, q_try_functions,
#: q_from_xml_events), t_multimodal_manifest, t_lang_id_confusion, and the rows-only
#: v_pq_ann_topk + t_bpe_learn_merges + t_bpe_tokenize_stats — and the
#: queries whose implementation changed after the r3 window was frozen
#: (candidate generation restructured to bucket assembly / post-verify
#: dedup, oracles unchanged: t_minhash_lsh_pairs, t_dedup_clusters;
#: q01_pricing_summary moved to the integer-scaled cents sum path with
#: its oracle changed in lockstep; degree-oriented triangles:
#: q_graph_triangles re-verifies inside the r3 window already, as does
#: s_near_dup_lsh_verified).  That is 47 names;
#: pad the remaining ~3 window slots with the highest-value already-green
#: queries.  After round 4 every registered query has a driver row
#: against its current code.
_PRIORITY = [
    # training-data pipeline ops (repetition/packing/contamination/
    # redaction/normalize/chunking/sampling/quantization/LM scoring)
    "t_repetition_metrics", "t_pack_sequences", "t_contamination_check",
    "s_near_dup_lsh_verified", "q_fuzzy_name_match", "q_string_agg_names",
    "q_runtime_filter_prefilter_join", "t_pii_redaction", "t_text_normalize",
    "t_doc_chunks", "t_stratified_sample", "t_hash_sample_rate",
    "s_embedding_quantize_int8", "t_unigram_lm_score", "q_hll_sketch_users",
    # time series / ops / product analytics
    "q_timeseries_gapfill", "q_skew_report", "q_funnel_steps",
    "q_cohort_retention", "q_nullsafe_join", "m_image_dedup_groups",
    "q_variant_props", "v_arrow_vector_norms", "q_ewma_user_daily",
    "q_event_transitions", "q_cms_heavy_hitters", "q_ohlc_downsample",
    "t_dup_spans", "q_full_outer_join",
    # CDC / SCD2 / maintenance / spatial / quality
    "q_merge_upsert", "q_scd2_intervals", "q_sql_text_interface",
    "q_spatial_grid_nn", "q_data_quality_audit", "q_snapshot_diff",
    "q_equidepth_histogram", "q_incremental_agg_refresh",
    "q_lateral_topk_per_nation", "q_equidepth_approx",
    "q_pattern_match_sequences", "t_token_budget_mixture",
    "q_interval_bucket_join", "q_session_window_batch",
    "q_sliding_distinct_users", "t_weighted_sample",
    # changed this round — re-verify under the driver
    "q_basket_part_pairs", "q_graph_triangles", "q_dau_wau_mau",
    # newly oracled this round (no_oracle → ROUND(x,6) hash oracle)
    "v_user_value_zscores", "v_grouped_agg_median",
]


def _ordered(maps: list[dict]) -> dict:
    merged: dict = {}
    for m in maps:
        merged.update(m)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update(merged)  # remaining names keep module registration order
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _q.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _REGISTRIES])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLE for mod in _REGISTRIES])
