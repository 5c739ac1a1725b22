"""The bench's final stdout line must fit the driver's 2000-char tail
capture: BENCH_r09..r12 all recorded "parsed": null because the line
outgrew the window and lost its head. These tests pin the size-budgeted
assembler (bench._final_line) without running Spark."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import FINAL_LINE_BUDGET, _final_line  # noqa: E402


def _mandatory() -> dict:
    # Realistic shape/sizes of the contract keys (12 headline queries,
    # ingest + streaming + sf_large compact blocks).
    return {
        "metric": "headline_queries_total",
        "value": 6.357,
        "unit": "sec",
        "queries": {f"q_headline_query_name_{i:02d}": 0.123 for i in range(12)},
        "late_rerun_total_sec": 6.357,
        "sf": 0.1,
        "ingest": {
            "rows": 8_000_000,
            "sec": 2.683,
            "rows_per_sec": 2_981_410,
            "early_rows_per_sec": 2_631_919,
        },
        "streaming_ingest": {
            "rows_committed": 114_000_000,
            "window_ms": 45_000,
            "rows_per_sec": 2_629_036,
            "best_window_rows_per_sec": 2_640_086,
            "whole_run_rows_per_sec": 2_533_333,
            "early_run_rows_per_sec": 2_591_714,
        },
        "sf_large": {
            "sf": 0.4,
            "queries": {f"t_sf_large_query_name_{i}": 4.567 for i in range(7)},
        },
    }


def test_mandatory_keys_always_survive_and_fit():
    line = _final_line(_mandatory(), [])
    assert len(line) <= FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert len(parsed["queries"]) == 12
    assert parsed["ingest"]["rows_per_sec"] == 2_981_410


def test_optional_blocks_added_until_budget():
    big = {"filler": "x" * 3000}  # never fits
    small = {"a_sec": 1.0, "b_sec": 2.0}
    line = _final_line(
        _mandatory(), [("huge_block", big), ("small_block", small)]
    )
    assert len(line) <= FINAL_LINE_BUDGET
    parsed = json.loads(line)
    # the oversized block is dropped; the later small one still fits
    assert "huge_block" not in parsed
    assert parsed["small_block"] == small


def test_line_parses_even_when_everything_is_large():
    # Adversarial: every optional block oversized — the line must still
    # be valid JSON with the contract keys, under budget.
    blocks = [(f"blk{i}", {"filler": "y" * 2500}) for i in range(5)]
    line = _final_line(_mandatory(), blocks)
    assert len(line) <= FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert "queries" in parsed


def test_r12_shaped_payload_now_fits():
    # The actual r12 final line was >2000 chars; feeding the same block
    # families through the assembler must stay under the window.
    optional = [
        ("scaling_exponents", {"triangles": 0.91, "near_dup": 0.62,
                               "ess": 0.78, "html": 0.78}),
        ("crawl", {"url_urls_per_sec": 81_000, "robots_urls_per_sec": 186_000,
                   "sitemap_entries_per_sec": 472_000,
                   "warc_pages_per_sec": 20_900, "wet_pages_per_sec": 21_000}),
        ("sessionize_ab", {"rows": 24_000_000, "single_sec": 9.253,
                           "two_level_sec": 11.821, "auto_picks": "two_level"}),
        ("uuid_ab", {"coupled_sec": 0.794, "salted_sec": 2.17,
                     "rotated_sec": 2.012}),
        ("stream_sink_ab", {"file_median_rps": 2_629_036,
                            "foreachbatch_median_rps": 2_626_271}),
        ("incdedup_amortization", {"build_sec": 1.006,
                                   "inc_secs": [0.891, 0.814, 0.768],
                                   "full_recompute_sec": 1.348}),
        ("cosine_ab", {"early_sec": 0.917, "late_sec": 0.967}),
        ("ess_knob_regime", {"off_shuffle_mb": 753.3,
                             "bucket_shuffle_mb": 328.7,
                             "winnow_shuffle_mb": 245.3}),
    ]
    line = _final_line(_mandatory(), optional)
    assert len(line) <= FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"]  # head keys intact — the r09..r12 failure mode
