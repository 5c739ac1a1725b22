#!/usr/bin/env python
"""Time driver-side query CONSTRUCTION (registry[name](spark, sf_dir) —
no action) for a set of registered queries: min of N repeats after one
warmup, printed as one JSON line. Used for the round-13 SQL-string
construction A/B (guide §5 — construction runs inside the bench's timed
region)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("CONSTRUCT_REPEATS", "5"))


def main() -> None:
    names = sys.argv[1:]
    from culvert_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="culvert_time_construction")
    registry = entrymod.queries()
    out = {}
    for name in names:
        fn = registry[name]
        fn(spark, SF_DIR)  # warmup (fills schema/count memos both sides)
        best = min(
            (lambda t0: (fn(spark, SF_DIR), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(REPEATS)
        )
        out[name] = round(best * 1000, 1)
    print("CONSTRUCT_MS " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
