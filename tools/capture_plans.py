#!/usr/bin/env python
"""Capture .explain("formatted") for a set of registered queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence files).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" | "after" (file name suffix)
  query:  registered names; default = bench headline + extended set.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) with the same
get_spark() session bench.py uses, so the captured shape is the shape the
bench times. Capture is planning-only (no job runs).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLAN_TAG", "r13")

DEFAULT = [
    # bench.py HEADLINE
    "q01_pricing_summary", "q06_revenue_forecast", "q03_shipping_priority",
    "q05_regional_revenue", "q_top3_orders_per_customer", "q_asof_prior_view",
    "q_hourly_event_counts", "q_sessionize_events", "q_pivot_user_event_values",
    "t_token_top20", "t_minhash_lsh_pairs", "s_cosine_topk",
    # bench.py EXTENDED
    "q_ewma_user_daily", "t_dup_spans", "q_spatial_grid_nn", "q_merge_upsert",
    "q_cms_heavy_hitters", "q_scd2_intervals", "q_interval_bucket_join",
    "q_pattern_match_sequences", "q_graph_triangles", "q_session_window_batch",
    "t_cdc_chunk_dedup", "q_embedding_covariance", "q_graph_pagerank",
    "q_sliding_distinct_users", "q_sliding_distinct_hll",
    "t_quality_percentile_filter", "t_quality_percentile_filter_approx",
    "t_bm25_topk",
    # bench.py SF_LARGE extras
    "t_pack_sequences", "s_semantic_dedup_rep", "t_exact_substring_spans",
    "s_near_dup_lsh_verified",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", TAG,
    )
    os.makedirs(outdir, exist_ok=True)

    from culvert_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="culvert_capture_plans")
    registry = entrymod.queries()
    for name in names:
        if name not in registry:
            print(f"skip (unregistered): {name}")
            continue
        try:
            df = registry[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
