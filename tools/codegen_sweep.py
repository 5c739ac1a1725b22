"""Whole-registry codegen sweep: run EVERY registered query under
``spark.sql.codegen.fallback=false`` (any expression or stage that cannot
whole-stage/expression-compile raises instead of silently interpreting)
and report failures. This is the gate that caught the round-6
s_embedding_near_dup Janino 64 KB hard-fail class.

Vanilla session + the one config; each query is executed to a noop sink
at sf0.01 (override via ``$SPARK_GRAFT_SWEEP_SF`` or ``--sf <dir>``).
Usage: ``python tools/codegen_sweep.py [--sf DIR] [names...]`` (subset
via argv, full registry otherwise). Expect ``SWEEP: ALL COMPILED``.
The repo root is derived from this file's location (like bench.py), so
the sweep imports the tree it lives in regardless of cwd or checkout
path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("codegen-sweep")
    .master(os.environ.get("CONTRACT_MASTER", "local[8]"))
    .config("spark.sql.codegen.fallback", "false")
    .getOrCreate()
)
import __spark_entry__ as e

sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
if len(sys.argv) > 2 and sys.argv[1] == "--sf":
    sf = sys.argv[2]
    del sys.argv[1:3]
qs = e.queries()
if len(sys.argv) > 1:
    want = set(sys.argv[1:])
    unknown = want - qs.keys()
    if unknown:  # a typo must not produce a false-green 0/0 sweep
        print(f"SWEEP: UNKNOWN QUERY NAMES {sorted(unknown)}")
        sys.exit(2)
    qs = {k: v for k, v in qs.items() if k in want}
fails = []
for name, fn in sorted(qs.items()):
    try:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        print(f"  {name}: compiled+ran")
    except Exception as exc:  # noqa: BLE001 — report and continue
        fails.append(name)
        print(f"  {name}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
print(
    f"SWEEP: {'ALL COMPILED' if not fails else 'FAILURES'} "
    f"({len(qs) - len(fails)}/{len(qs)})"
    + (f" failed={fails}" if fails else "")
)
sys.exit(1 if fails else 0)
