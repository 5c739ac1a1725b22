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

try:  # skew-mitigation parity rows (round 5)
    from culvert_spark import skew as _sk

    _REGISTRIES.append(_sk)
except ImportError:  # pragma: no cover
    pass

try:  # custom Python DataSource connector row (round 6)
    from culvert_spark import pydatasource as _pds

    _REGISTRIES.append(_pds)
except ImportError:  # pragma: no cover
    pass


#: Driver CORRECTNESS verification covers the first N registered queries in
#: registration order (50-query window per round).  Rounds 1–4 recorded 191
#: of the 202 queries registered through round 4 (184 hash-green, 7
#: rows-only-by-design, 0 failures) — those keep their CORRECTNESS rows.
#: Round 5 executes the ROUND-5 ROTATION from the round-4 verdict:
#: (a) the 11 round-4 registrations with no driver row yet (st_* replay ×5,
#: t_cdc_chunk_dedup, t_incremental_dedup_persisted, q_hive_bucket_histogram,
#: q_graph_pagerank, q_embedding_covariance, v_gram_matrix rows-only),
#: (b) q_approx_distinct (schema gained *_est_if_deviant columns in r4 —
#: its r2 row is stale) and the two documented deferrals t_dedup_clusters
#: and q_sessionize_events, (c) the three queries REGISTERED in round 5
#: (st_late_drop_replay: finite-watermark late-drop semantics;
#: q_sliding_distinct_hll + t_quality_percentile_filter_approx: the
#: tolerance-oracle approx scale-twins), (d) the five queries whose
#: implementation or oracle CHANGED in round 5 and therefore need fresh
#: rows — q_session_window_batch (oracle boundary `>=`→`>`, matching
#: Spark's merge-at-exact-gap), s_near_dup_lsh_verified / s_ann_lsh_top1 /
#: s_semantic_dedup_rep (hyperplane projections rebuilt as unrolled
#: signed-sum F.expr columns in a dedicated Project stage —
#: textops.with_hyperplane_projections — so whole-stage codegen splits
#: them into JIT-able submethods), and q_hive_bucket_histogram (v1 hash
#: now folds signed UTF-8 bytes; already in (a)) — padded to 50 with the
#: highest-value already-green re-verifies (the 12 bench headliners and
#: the dedup/training-prep workhorses).  Names missing from the registries
#: are ignored; registered names missing from this list keep their module
#: registration order after the priority block.
#:
#: ROUND-6 ROTATION (do this at the start of round 6, after CORRECTNESS_r05
#: lands): no round-5 change is left without a scheduled row — the r5
#: window covers every new registration and every output-affecting change
#: (the hugeMethodLimit=8000 execution-contract change is perf-only; no
#: output changed outside this window).  Round 6 should therefore rotate
#: for FRESHNESS: front-load any query whose round-5 row failed (expected:
#: none), then the ~50 queries with the OLDEST driver rows (r1/r2
#: vintage — the TPC-H Q2–Q22 block, window-rank suite, set ops, scalar
#: functions), then any round-6 registrations/changes.  Keep the invariant:
#: every query whose implementation or oracle changes in a round gets a
#: fresh row in that round's window.
_PRIORITY = [
    # (a) round-4 registrations without driver rows (11)
    "st_tumbling_counts_replay", "st_session_window_replay",
    "st_dedup_digest_replay", "st_merge_dedup_replay",
    "st_restart_recovery_replay", "t_cdc_chunk_dedup",
    "t_incremental_dedup_persisted", "q_hive_bucket_histogram",
    "q_graph_pagerank", "q_embedding_covariance", "v_gram_matrix",
    # (b) stale schema + documented deferrals (3)
    "q_approx_distinct", "t_dedup_clusters", "q_sessionize_events",
    # (c) new round-5 registrations (6)
    "st_late_drop_replay", "q_sliding_distinct_hll",
    "t_quality_percentile_filter_approx", "q_hive_bucket_write_layout",
    "st_sliding_counts_replay", "t_bm25_topk",
    "st_stream_stream_join_replay", "st_stateful_totals_replay",
    "st_dedup_expiry_replay",
    # (d) changed in round 5 (4)
    "q_session_window_batch", "s_near_dup_lsh_verified", "s_ann_lsh_top1",
    "s_semantic_dedup_rep",
    # padding: bench headliners (11)
    "q01_pricing_summary", "q03_shipping_priority", "q05_regional_revenue",
    "q06_revenue_forecast", "q_top3_orders_per_customer", "q_asof_prior_view",
    "q_hourly_event_counts", "q_pivot_user_event_values", "t_token_top20",
    "t_minhash_lsh_pairs", "s_cosine_topk",
    # padding: dedup / training-prep workhorses (12)
    "t_exact_dedup_stats", "t_exact_dedup_groups", "t_dedup_keep_best",
    "t_dup_spans", "t_simhash_fingerprint", "t_ngram_jaccard_pairs",
    "t_incremental_dedup", "t_pretrain_pipeline_e2e",
    "t_pack_sequences", "t_gopher_quality_rules",
    # new round-5 registration (late): salting parity
    "q_salted_join_parity",
    # padding: sketches / analytics (1)
    "q_graph_triangles",
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
