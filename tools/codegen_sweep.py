"""Whole-registry codegen sweep: run EVERY registered query under
``spark.sql.codegen.fallback=false`` (any expression or stage that cannot
whole-stage/expression-compile raises instead of silently interpreting)
and report failures. This is the gate that caught the round-6
s_embedding_near_dup Janino 64 KB hard-fail class.

Vanilla session + the one config; each query is executed to a noop sink
at sf0.01 (override via ``$SPARK_GRAFT_SWEEP_SF`` or ``--sf <dir>``).
Usage: ``python tools/codegen_sweep.py [--watchdog] [--sf DIR] [names...]``
(subset via argv, full registry otherwise). Expect ``SWEEP: ALL COMPILED``.
The repo root is derived from this file's location (like bench.py), so
the sweep imports the tree it lives in regardless of cwd or checkout
path.

``--watchdog`` (round-10 verdict ask): the sweep very rarely HANGS —
not fails — on a session-shutdown race during a streaming-replay stop
(RejectedExecutionException in TaskSchedulerImpl statusUpdate after the
scheduler pool is terminated; observed once in round 9 and once in
round 10, clean on re-run both times, ~1/400 incidence). The sweep
prints one line per query as it completes, so staleness is detectable:
the watchdog runs the sweep as a child process, and if the child
produces NO output for ``$SWEEP_STALL_SECS`` (default 300 — every
sf0.01 query completes in well under a minute), kills it and relaunches
with only the not-yet-reported queries (parsed from the child's own
per-query lines), up to ``$SWEEP_MAX_RESTARTS`` (default 2) restarts,
merging pass/fail counts across attempts into the same final verdict
line a plain run prints. The query in flight at the hang is re-run, not
failed: the race is in session shutdown, not the query.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(argv: list[str]) -> int:
    """Supervise ``python -u codegen_sweep.py <argv>`` with stale-output
    kill + restart-from-remaining. Returns the exit code to propagate.

    Plumbing invariants (self-review findings): the child runs with
    ``-u`` so its per-query lines reach the pipe as they print (a
    block-buffered child would look stale for the whole sweep and get
    killed while healthy); a pump THREAD is the single reader/parser of
    child stdout, so burst-buffered lines can't be lost to a
    select/readline mismatch, and after a stall kill the thread drains
    whatever the pipe still holds (completed-query lines written before
    the hang keep their credit — only genuinely unreported work
    re-runs)."""
    import signal
    import subprocess
    import threading
    import time

    stall = float(os.environ.get("SWEEP_STALL_SECS", "300"))
    max_restarts = int(os.environ.get("SWEEP_MAX_RESTARTS", "2"))

    sf_args: list[str] = []
    names = list(argv)
    if len(names) >= 2 and names[0] == "--sf":
        sf_args, names = names[:2], names[2:]

    done: dict[str, bool] = {}  # name -> passed

    # Anchored to the sweep's OWN per-query line shape (2-space indent,
    # one token, the two literal verdict forms). The child's stderr is
    # merged into the pipe, so a free-text scan would credit any
    # Spark/log4j line containing ": FAILED " into ``done`` under a
    # bogus name and flip the merged verdict (round-11 review); the
    # final verdict additionally drops names outside the known registry.
    import re

    line_re = re.compile(r"^  (\S+): (compiled\+ran|FAILED )")

    def note(line: str) -> None:
        m = line_re.match(line)
        if m:
            done[m.group(1)] = m.group(2) == "compiled+ran"

    for attempt in range(max_restarts + 1):
        remaining = [n for n in names if n not in done] if names else []
        if names and not remaining:
            break
        cmd = (
            [sys.executable, "-u", os.path.abspath(__file__)]
            + sf_args
            + remaining
        )
        child = subprocess.Popen(
            cmd,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            start_new_session=True,  # kill the JVM with the driver
        )
        state = {"last": time.monotonic()}

        def pump(stream=child.stdout, state=state) -> None:
            for line in stream:  # EOF after exit OR kill (pipe drains)
                sys.stdout.write(line)
                sys.stdout.flush()
                note(line)
                state["last"] = time.monotonic()

        pumper = threading.Thread(target=pump, daemon=True)
        pumper.start()
        hung = False
        while child.poll() is None:
            if time.monotonic() - state["last"] > stall:
                hung = True
                print(
                    f"WATCHDOG: no output for {stall:.0f}s "
                    f"(attempt {attempt + 1}) — killing and restarting "
                    "from the first unreported query",
                    flush=True,
                )
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                break
            time.sleep(min(5.0, stall / 10))
        # the pump thread drains the pipe to EOF in both exits
        pumper.join(timeout=30)
        if not hung:
            child.wait()
            if not names:
                return child.returncode  # full run completed: its own
                # verdict line is authoritative
            break
        if not names:
            # full-registry run: learn the registry so the restart can
            # name the remaining queries explicitly.
            import __spark_entry__ as entry_mod

            names = list(entry_mod.queries())
    if names:  # drop any line-noise residue the regex let through
        done = {n: ok for n, ok in done.items() if n in set(names)}
    fails = sorted(n for n, ok in done.items() if not ok)
    missing = sorted(n for n in names if n not in done)
    verdict = "ALL COMPILED" if not (fails or missing) else "FAILURES"
    print(
        f"SWEEP (merged over restarts): {verdict} "
        f"({len(done) - len(fails)}/{len(names)})"
        + (f" failed={fails}" if fails else "")
        + (f" never_reported={missing}" if missing else "")
    )
    return 1 if (fails or missing) else 0


if len(sys.argv) > 1 and sys.argv[1] == "--watchdog":
    sys.exit(_watchdog(sys.argv[2:]))
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
