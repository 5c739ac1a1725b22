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

try:  # streaming batch-replay parity queries (round 4)
    from culvert_spark import streaming as _st

    _REGISTRIES.append(_st)
except ImportError:  # pragma: no cover
    pass

try:  # Hive-compatible bucket ids (round 4)
    from culvert_spark import hivebucket as _hb

    _REGISTRIES.append(_hb)
except ImportError:  # pragma: no cover
    pass


#: Driver CORRECTNESS verification covers the first N registered queries in
#: registration order (50-query window per round).  Rounds 1–3 verified 145
#: queries (139 hash-green, 6 rows-only-by-design, 0 failures) — those keep
#: their CORRECTNESS rows and do not need re-checking.  Round 4 executes the
#: ROUND-4 ROTATION from the round-3 verdict: the 46 registered queries with
#: no driver row yet, plus the four highest-risk re-verifications: the
#: post-r3-freeze restructures (t_minhash_lsh_pairs: bucket-assembly
#: candidate generation; q01_pricing_summary: integer-scaled cents sums,
#: oracle in lockstep) and the two queries whose OUTPUT SCHEMA changed
#: this round (q_cms_heavy_hitters / q_hll_sketch_users: est_if_deviant
#: debuggability column — their r3 rows are stale).  Names missing from
#: the registries are ignored; registered names missing from this list
#: keep their module registration order after the priority block.  After
#: round 4 every query registered through round 3 has a driver row, with
#: four narrow exceptions deferred to round 5 below.
#:
#: ROUND-5 ROTATION (do this at the start of round 5, after CORRECTNESS_r04
#: lands): front-load (a) the queries registered this round — the five
#: streaming batch-replay parity queries (st_tumbling_counts_replay,
#: st_session_window_replay, st_dedup_digest_replay,
#: st_merge_dedup_replay, st_restart_recovery_replay), t_cdc_chunk_dedup,
#: t_incremental_dedup_persisted, q_hive_bucket_histogram,
#: q_graph_pagerank,
#: q_embedding_covariance, and v_gram_matrix (rows-only) — plus
#: q_approx_distinct, whose output schema gained *_est_if_deviant
#: columns this round — (b) the deliberate
#: deferrals: t_dedup_clusters (label-propagation logic unchanged since its
#: r1-green row; its candidate input path is proven via t_minhash_lsh_pairs
#: this round) and q_sessionize_events (plan-only adaptive-guard change;
#: output pinned identical by the two-mode property test and local
#: full-registry emulation), and (c) the BPE pair with their new oracles if
#: this window could not run them.  Pad with the highest-value
#: already-green queries.
_PRIORITY = [
    # r2-overflow product analytics / time series / profiling (21)
    "q_table_fingerprint", "q_embedding_dim_stats", "q_trending_event_types",
    "q_mom_revenue_growth", "t_bigram_lm_top", "q_churned_users",
    "t_length_band_filter", "t_dedup_keep_best", "q_rfm_segments",
    "q_robust_outlier_stats", "q_histogram_2d", "q_gini_concentration",
    "q_yoy_revenue_growth", "q_new_vs_returning", "q_cumulative_distinct_users",
    "q_conversion_latency", "q_pareto_coverage", "t_vocab_growth",
    "q_weekday_seasonality", "q_null_profile", "q_json_key_profile",
    # round-3 training-data prep / statistics batch (11)
    "t_deterministic_shuffle", "t_context_truncation_stats",
    "t_quality_percentile_filter", "t_gopher_quality_rules",
    "s_semantic_dedup_rep", "q_ols_daily_revenue_trend",
    "q_chi2_priority_status", "t_mix_temperature_weights",
    "t_char_class_profile", "t_token_coverage_topk", "t_pretrain_pipeline_e2e",
    # round-3 corpusops / Spark-4 SQL surface batch (9)
    "t_doc_entropy", "t_boilerplate_ngrams", "t_hashed_ngram_features",
    "t_incremental_dedup", "q_bfs_reachable_parts", "q_sql_pipe_interface",
    "q_collation_group_ci", "q_try_functions", "q_from_xml_events",
    # round-3 stragglers (2) + rows-only trio (3)
    "t_multimodal_manifest", "t_lang_id_confusion",
    "v_pq_ann_topk", "t_bpe_learn_merges", "t_bpe_tokenize_stats",
    # changed after the r3 window froze / schema changed this round (4)
    "t_minhash_lsh_pairs", "q01_pricing_summary",
    "q_cms_heavy_hitters", "q_hll_sketch_users",
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
