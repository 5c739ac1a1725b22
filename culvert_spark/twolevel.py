"""Giant-partition-key guards: two-level (segment-and-stitch) windows.

The window/sessionize family partitions by user_id, so ONE user with 10⁹
events pins a single window task to 10⁹ rows (SURVEY §9 "first thing to
break" for those rows). q_ewma_user_daily dodges this by pre-aggregating
to a daily grain before its window; this module generalizes that pattern
to operators whose semantics need event-level adjacency and therefore
cannot simply pre-aggregate:

1. Run the heavy ordered computation inside (user_id, time-bucket)
   sub-partitions — each task sees one bucket of one user, so the biggest
   partition is bounded by events-per-bucket, not events-per-user.
2. Stitch across bucket boundaries with a second window whose partition is
   the per-user BUCKET (or session-run) list — rows bounded by active
   buckets (days), never by events.

Both helpers are exact: segmenting an ordered stream into contiguous
buckets loses only the adjacencies that cross a boundary, and the stitch
level restores exactly those. Results are row-identical to the
single-window formulation at any parallelism (pinned by
tests/test_properties.py::test_two_level_* against naive single-window
twins on a synthetic hot key).

The bucket column is named ``_bucket`` on purpose: plan-quality gates
assert it appears in the Window partition specs of the guarded queries,
proving the sub-partitioning survived Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 30-minute inactivity gap in microseconds (the sessionization default).
GAP_US = 1_800_000_000


def with_bucket(df: DataFrame, ts_col: str = "ts", grain: str = "day") -> DataFrame:
    """Add the ``_bucket`` coarse-time sub-partition column."""
    return df.withColumn("_bucket", F.date_trunc(grain, ts_col))


def segmented_lead_pairs(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    payload: str,
    ts_col: str = "ts",
    grain: str = "day",
) -> DataFrame:
    """All adjacent (from_val, to_val) pairs of ``payload`` per key, in
    ``order`` — the pairs a plain ``LEAD() OVER (PARTITION BY keys ORDER
    BY order)`` would emit — computed without ever materializing one
    user's full stream in a single task.

    Intra-bucket pairs come from LEAD over (keys, _bucket); the one pair
    that crosses each bucket boundary is rebuilt from per-bucket
    first/last payloads (min_by/max_by over the order key — an ordinary
    aggregation with partial merge) LEAD-joined over the per-user bucket
    list. The stitch window's partitions hold one row per active bucket.
    """
    b = with_bucket(df, ts_col, grain)
    wseg = Window.partitionBy(*keys, "_bucket").orderBy(*order)
    intra = (
        b.withColumn("_to", F.lead(payload).over(wseg))
        .where(F.col("_to").isNotNull())
        .select(*keys, F.col(payload).alias("from_val"), F.col("_to").alias("to_val"))
    )
    ord_key = F.struct(*[F.col(c) for c in order])
    seg = b.groupBy(*keys, "_bucket").agg(
        F.min_by(payload, ord_key).alias("_first"),
        F.max_by(payload, ord_key).alias("_last"),
    )
    wb = Window.partitionBy(*keys).orderBy("_bucket")
    cross = (
        seg.withColumn("_to", F.lead("_first").over(wb))
        .where(F.col("_to").isNotNull())
        .select(*keys, F.col("_last").alias("from_val"), F.col("_to").alias("to_val"))
    )
    return intra.unionByName(cross)


def sessionize_session_rows(
    events: DataFrame,
    gap_us: int = GAP_US,
    grain: str = "day",
) -> DataFrame:
    """Session-level rows (user_id, session_id, n_events, min_us, max_us)
    under a ``gap_us`` inactivity rule, two-level.

    Level 1 sessionizes inside (user_id, _bucket): lag → gap flag →
    running sum → per-local-session aggregate. Level 2 merges adjacent
    local sessions across bucket boundaries with the SAME gap rule over
    session rows: two runs merge iff the next run's first event follows
    the previous run's last event within the gap — exactly the condition
    under which the single-pass sessionizer would not have split. Runs
    inside one bucket never merge (they are separated by > gap by
    construction), so the merge is exact, including sessions chaining
    across several midnights.

    The stitch partition is bounded structurally: a new session needs a
    > gap silence, so one (user, day) holds at most 86 400 s/gap_s + 1
    local sessions (48 for the 30-min default) — level 2 is tiny no
    matter how many events a hot user produces."""
    # The level-1 shuffle carries (user_id, us, event_id, _bucket) only:
    # the bucket is the integer epoch day (identical day boundaries to
    # date_trunc under the pinned UTC session, one long instead of a
    # timestamp) and ordering by us == ordering by ts (unix_micros is
    # monotone), so the original timestamp column never enters the
    # exchange.
    b = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    ).withColumn("_bucket", F.expr("us div 86400000000"))
    wseg = Window.partitionBy("user_id", "_bucket").orderBy("us", "event_id")
    marked = b.withColumn(
        "_new",
        F.when(
            F.lag("us").over(wseg).isNull()
            | ((F.col("us") - F.lag("us").over(wseg)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    wrun = wseg.rowsBetween(Window.unboundedPreceding, 0)
    local = marked.withColumn("_loc", F.sum("_new").over(wrun))
    runs = local.groupBy("user_id", "_bucket", "_loc").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("min_us"),
        F.max("us").alias("max_us"),
    )
    w2 = Window.partitionBy("user_id").orderBy("min_us")
    stitched = runs.withColumn(
        "_newg",
        F.when(
            F.lag("max_us").over(w2).isNull()
            | ((F.col("min_us") - F.lag("max_us").over(w2)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w2run = w2.rowsBetween(Window.unboundedPreceding, 0)
    glob = stitched.withColumn("session_id", F.sum("_newg").over(w2run))
    return glob.groupBy("user_id", "session_id").agg(
        F.sum("n_events").alias("n_events"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
    )
