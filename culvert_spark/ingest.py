"""Rate-governed, transactional, partitioned ingest (reference parity).

Reproduces the reference engine's core behavior — P parallel streams writing
rate-governed synthetic rows through transactional batched commits into a
partitioned, bucketed columnar table, then reporting committed-row
throughput (Culvert.java:100-171, Stream.java:168-235 in /root/reference) —
on Spark's execution model:

- one reference Stream thread        → one Structured Streaming query
- Hive txn (begin/write/commitN)     → one micro-batch epoch committed via
                                       the streaming file sink's manifest
                                       log (ManifestFileCommitProtocol):
                                       tasks write data files directly and
                                       the batch commit atomically appends
                                       ONE manifest entry — files from an
                                       uncommitted batch are invisible to
                                       metadata-log readers, the genuine
                                       analog of an uncommitted Hive txn
- commitAfterNRows                   → trigger interval sized so one
                                       micro-batch ≈ N rows at the given rate
- per-row sleep throttle             → rate source rowsPerSecond
  (Stream.java:203-205)                (aggregate eps semantics, SURVEY §7.3)
- static partition (year, stream_i)  → lit columns + partitionBy
  (Culvert.java:182,226)
- dynamic partition (year, month)    → generated columns + partitionBy
  (Stream.java:77-80)
- clustered by (user_id) 32 buckets  → batch: bucketBy(32); streaming:
  (README.md:62-63)                    repartition(32, user_id) (Spark can't
                                       bucketBy in writeStream; SURVEY §7.1)
- txn-batch pre-allocation (-b), ORC auto-flush (-f), streaming
  optimizations (-s) are Hive-library levers with no Spark analog — accepted
  and recorded as no-ops for CLI parity (SURVEY §2 Tier A dispositions).

The final report mirrors the reference's output contract
(Culvert.java:165-171):

    Total rows committed: <N>
    Throughput: <N/timeout_s> rows/second

Concurrency note: the reference runs P independent writer threads against
one Hive table; Spark's analog is ONE streaming query whose source has P
partitions (SURVEY §1.1 "Stream" row), NOT P concurrent queries — a
streaming table directory has ONE ``_spark_metadata`` manifest log, which
is single-writer by design (concurrent queries would collide on batch ids
in it; the foreachBatch fallback likewise races on FileOutputCommitter's
shared ``_temporary/0`` staging dir — observed: one job's cleanup deletes
the other's task attempts). Stream i of the reference maps to the rows
with ``row_id % P == i``; per-stream committed counts are reported per
micro-batch exactly like Stream.java:199-200.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.generator import (
    ColumnSpec,
    default_event_columns,
    generate,
    generate_stream,
)

STATIC_YEAR = 2018  # Culvert.java:182 — static mode writes (year=2018, month=i)
DEFAULT_BUCKETS = 32  # README.md:62-63 (code comment says 8; README wins)


# ---------------------------------------------------------------------------
# Batch ingest
# ---------------------------------------------------------------------------


def batch_ingest(
    df: DataFrame,
    path: str | None = None,
    table: str | None = None,
    fmt: str = "orc",
    partition_by: tuple[str, ...] = (),
    bucket_by: tuple[int, str] | None = None,
    mode: str = "append",
) -> None:
    """Partitioned (and, for managed tables, bucketed) batch write.

    Spark path-writes cannot carry bucket metadata, so ``bucket_by`` with a
    ``path`` pre-shuffles into ``n`` files per partition via repartition —
    the data layout of bucketing without the catalog metadata."""
    writer = df.write.format(fmt).mode(mode)
    if bucket_by and table:
        n, col = bucket_by
        writer = writer.bucketBy(n, col).sortBy(col)
    elif bucket_by:
        n, col = bucket_by
        df = df.repartition(n, F.col(col))
        writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if table:
        writer.saveAsTable(table)
    else:
        writer.save(path)


def _table_dest(
    spark: SparkSession, table: str | None, db: str
) -> str | None:
    """Resolve a ``--table``/``--db`` pair to a qualified saved-table name,
    creating the database on demand (the reference's metastore `db.table`
    destination, CulvertCLI.java:36-47)."""
    if not table:
        return None
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    return f"`{db}`.`{table}`"


def static_partition_ingest(
    spark: SparkSession,
    num_rows: int,
    path: str | None,
    stream_id: int = 0,
    columns: list[ColumnSpec] | None = None,
    seed: int = 42,
    fmt: str = "orc",
    table: str | None = None,
    db: str = "default",
    buckets: int | None = None,
) -> None:
    """Static-partition mode: every row of stream i lands in partition
    (year=2018, month=i) — 'month' is a stream id, exactly as the reference
    abuses it (Culvert.java:182).  With ``table`` the write goes to a
    managed (optionally bucketed) table instead of ``path`` — the catalog
    analog of the reference's Hive destination."""
    df = generate(
        spark, num_rows, columns or default_event_columns(), seed=seed,
        start_row=stream_id * num_rows,
    )
    df = df.withColumn("year", F.lit(STATIC_YEAR)).withColumn(
        "month", F.lit(stream_id)
    )
    batch_ingest(
        df, path=path, table=_table_dest(spark, table, db), fmt=fmt,
        partition_by=("year", "month"),
        bucket_by=(buckets, "user_id") if buckets else None,
    )


def static_parallel_ingest(
    spark: SparkSession,
    num_streams: int,
    rows_per_stream: int,
    path: str,
    columns: list[ColumnSpec] | None = None,
    seed: int = 42,
    fmt: str = "orc",
) -> None:
    """The reference's benchmark configuration (BASELINE.md: 64 parallel
    streams, static partitions) as ONE fused Spark job: stream i owns the
    contiguous row range [i*n, (i+1)*n) (exactly static_partition_ingest's
    start_row convention), and ``month = row_id div n`` aligns 1:1 with the
    range source's partition boundaries — so every task writes exactly one
    (year, month) directory with NO shuffle and no cross-task file fan-out.
    This is how P reference writer threads map to Spark batch (cf. the
    single-query design note above for streaming)."""
    total = num_streams * rows_per_stream
    df = generate(
        spark, total, columns or default_event_columns(), seed=seed,
        num_partitions=num_streams, keep_row_id=True,
    )
    df = (
        df.withColumn("year", F.lit(STATIC_YEAR))
        .withColumn(
            "month",
            (F.col("row_id") / F.lit(rows_per_stream)).cast("int"),
        )
        .drop("row_id")
    )
    batch_ingest(df, path=path, fmt=fmt, partition_by=("year", "month"))


def dynamic_partition_ingest(
    spark: SparkSession,
    num_rows: int,
    path: str | None,
    columns: list[ColumnSpec] | None = None,
    seed: int = 42,
    fmt: str = "orc",
    table: str | None = None,
    db: str = "default",
    buckets: int | None = None,
) -> None:
    """Dynamic-partition mode: generated year ∈ [2000,2050), month ∈ [0,12)
    route each row (Stream.java:77-80, Culvert.java:226)."""
    df = generate(
        spark, num_rows, columns or default_event_columns(dynamic_partition=True),
        seed=seed,
    )
    # Cluster rows by the partition keys before the write: without this,
    # every task writes a file into every (year, month) directory —
    # tasks x partitions tiny files (measured 25k rows/s); with it, each
    # directory is written by one task (measured ~40x faster) and the
    # downstream table has ~600 well-sized files instead of ~19,000.
    df = df.repartition(F.col("year"), F.col("month"))
    batch_ingest(
        df, path=path, table=_table_dest(spark, table, db), fmt=fmt,
        partition_by=("year", "month"),
        bucket_by=(buckets, "user_id") if buckets else None,
    )


def reference_ddl_view(df: DataFrame) -> DataFrame:
    """Compatibility view matching the reference table DDL byte-for-byte:
    the reference declares ``event_time string`` holding ISO-8601 instants
    (README.md:59; values are Instant.toString() per Column.java:59) while
    our native schema uses a real timestamp (SURVEY §7.5). Apply this view
    when a consumer expects the reference's column shapes."""
    if "event_time" not in df.columns:
        return df
    return df.withColumn(
        "event_time",
        F.date_format(
            F.col("event_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ),
    )


# ---------------------------------------------------------------------------
# Streaming ingest with throughput report
# ---------------------------------------------------------------------------


@dataclass
class StreamStats:
    """Per-stream committed counters (Stream.java rowsCommitted /
    txnBatchesCommitted)."""

    name: str
    rows_committed: int = 0
    txns_committed: int = 0


@dataclass
class IngestReport:
    """Aggregate throughput report (Culvert.java:165-171).

    ``samples`` is a (monotonic_seconds, total_rows_committed) time series
    recorded at every progress drain — consumers can compute steady-state
    window rates from it (bench.py takes the median of three sub-window
    rates to beat host-level run-to-run variance)."""

    timeout_ms: int
    streams: list[StreamStats] = field(default_factory=list)
    samples: list[tuple[float, int]] = field(default_factory=list)
    #: committed rows from batches whose progress carried no observe row
    #: (defensive path only) — counted in the total, attributed to no
    #: stream rather than mis-split from a guessed base offset
    unattributed_rows: int = 0

    @property
    def total_rows_committed(self) -> int:
        return sum(s.rows_committed for s in self.streams) + (
            self.unattributed_rows
        )

    @property
    def rows_per_second(self) -> int:
        secs = max(1, self.timeout_ms // 1000)
        return self.total_rows_committed // secs

    def render(self) -> str:
        lines = [
            f"Stream [{s.name}] committed {s.txns_committed} transactions "
            f"[rows: {s.rows_committed}]"
            for s in self.streams
        ]
        lines.append(f"Total rows committed: {self.total_rows_committed}")
        lines.append(f"Throughput: {self.rows_per_second} rows/second")
        return "\n".join(lines)


def _trigger_seconds(commit_after_rows: int, events_per_second: int) -> float:
    """Micro-batch ≈ ``commit_after_rows`` per stream: trigger = N / eps
    seconds, bounded so tiny test configs still commit several batches, and
    millisecond-rounded — Spark's interval parser rejects repeating decimals
    like ``0.3333333333333333 seconds`` (nanosecond precision cap)."""
    return round(
        min(10.0, max(0.2, commit_after_rows / max(1, events_per_second))), 3
    )


def _residue_counts(lo: int, hi: int, p: int) -> list[int]:
    """``|{v ∈ [lo, hi) : v ≡ i (mod p)}|`` for each stream i — the
    per-stream split of a committed batch's contiguous value range
    (stream i ↔ value ≡ i mod p; property-tested against brute force in
    tests/test_properties.py)."""
    return [(hi - i + p - 1) // p - (lo - i + p - 1) // p for i in range(p)]


_SINKS = ("file", "foreachBatch")


def run_streaming_ingest(
    spark: SparkSession,
    output_path: str,
    checkpoint_root: str,
    num_streams: int = 1,
    commit_after_rows: int = 1_000_000,
    events_per_second: int = 10_000,
    timeout_ms: int = 60_000,
    dynamic_partitioning: bool = False,
    stream_launch_delay_ms: int = 0,
    transaction_batch_size: int = 1,  # no-op: txn ids have no Spark analog
    enable_auto_flush: bool = True,  # no-op: Spark manages writer memory
    streaming_optimizations: bool = True,  # no-op profile toggle
    columns: list[ColumnSpec] | None = None,
    seed: int = 42,
    buckets: int | None = None,
    fmt: str = "orc",
    quiet: bool = False,
    fixed_rows_per_batch: int | None = None,
    sink: str = "file",
) -> IngestReport:
    """The full reference run loop (Culvert.startCulvert → run → report):
    launch P rate-governed streaming queries (optionally staggered), each
    committing a micro-batch ≈ every ``commit_after_rows`` rows, stop them
    at ``timeout_ms``, and aggregate committed-row throughput.

    Each micro-batch is one transaction. ``sink="file"`` (default) writes
    through the native streaming file sink: tasks stream data files straight
    into the partition directories (no ``_temporary`` staging, no rename
    pass) and the batch commit atomically appends one ``_spark_metadata``
    manifest entry — a partly-written batch is invisible to metadata-log
    readers exactly like an open Hive txn, and checkpoint + manifest give
    exactly-once across restarts (SURVEY §7.2). ``sink="foreachBatch"``
    keeps the explicit per-batch batch-write body for formats with no
    streaming file sink; it commits through FileOutputCommitter v1 whose
    per-batch setup + task-rename + sequential job-commit pass is the
    measured difference between the two (in-session A/B, 32 streams,
    3M-row batches, ORC, 30 s windows: file sink 3.32M rows/s steady
    median with addBatch 832 ms vs foreachBatch 2.28-2.62M rows/s with
    addBatch 1013-1541 ms — +27-45%; committer v2 and
    spark.sql.maxConcurrentOutputFileWriters moved nothing, so the cost is
    the commit protocol itself, not the dynamic-partition sort).

    Scale posture: committed throughput tracks source parallelism —
    in-session sweep at a constant 187.5k rows per stream-txn measured
    steady medians 0.46M / 1.04M / 1.72M / 2.94M rows/s at 4 / 8 / 16 / 32
    streams (near-linear until the 32 local cores saturate). Parallelism
    is P source partitions of ONE query, so on a cluster P scales with
    executors while the per-batch driver work stays one manifest append +
    two WAL writes (~75 ms measured) regardless of P.
    """
    del enable_auto_flush, streaming_optimizations, transaction_batch_size
    # Fused single-query design: nothing to stagger — P streams are P source
    # partitions of one query. For reference-shaped P *independent* queries
    # with staggered launches (CLI -l), see run_streaming_ingest_multi.
    del stream_launch_delay_ms
    if sink not in _SINKS:
        raise ValueError(f"unknown sink {sink!r}: expected one of {_SINKS}")
    stats = [StreamStats(name=f"stream-{i}") for i in range(num_streams)]
    trigger_s = _trigger_seconds(commit_after_rows, events_per_second)

    cols = columns or default_event_columns(dynamic_partition=dynamic_partitioning)
    src = generate_stream(
        spark,
        # eps is per stream in the reference (Stream.java:55); the single
        # source carries the aggregate rate across P partitions.
        rows_per_second=events_per_second * num_streams,
        columns=cols,
        seed=seed,
        num_partitions=num_streams,
        keep_row_id=True,
        fixed_rows_per_batch=fixed_rows_per_batch,
    )
    if fixed_rows_per_batch is not None:
        # Fixed-size batches run back-to-back: the sink's sustained
        # throughput, not the offer, paces commits (see generate_stream).
        trigger_s = 0.0
    # Committed-row counters (Stream.java:199-200) ride along with the
    # write via TWO observed metrics folded into the same pass that writes
    # the batch (the old groupBy-count second pass cost ~30% of the batch):
    # the batch's row count and its MEASURED base offset (min row id — a
    # checkpoint resume continues values from the prior run's offset, so a
    # tracked "starts at 0" base would misattribute rows after a restart).
    # The per-stream split is then arithmetic: stream i ↔ value ≡ i (mod P)
    # over the batch's contiguous value range [lo, lo + n). A 32-expression
    # count_if-per-stream observe was measured costing ~15% of steady
    # throughput (2.86-2.91M vs 3.09-3.34M rows/s, addBatch 887-1057 ms vs
    # 840-853 ms, same session) for information the source contract
    # already determines.
    src = src.observe(
        "stream_counts",
        F.count(F.lit(1)).alias("n"),
        F.min("row_id").alias("lo"),
    )
    # Reference stream i ↔ rows with row_id % P == i.
    src = src.withColumn(
        "stream_id", F.pmod(F.col("row_id"), F.lit(num_streams)).cast("int")
    ).drop("row_id")

    if dynamic_partitioning:
        out = src.drop("stream_id")
    else:
        # Static mode: (year=2018, month=stream_id) — Culvert.java:182.
        # rate/rate-micro-batch distribute values round-robin across source
        # partitions (value % P == partition id, probed), so every task
        # already holds exactly one month value and writes exactly one
        # partition directory — no file fan-out, no shuffle.
        out = src.withColumn("year", F.lit(STATIC_YEAR)).withColumn(
            "month", F.col("stream_id")
        ).drop("stream_id")
    if buckets:
        out = out.repartition(buckets, F.col("user_id"))

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.format(fmt)
            .mode("append")
            .partitionBy("year", "month")
            .save(output_path)
        )

    seen_batches: set[int] = set()
    unattributed = [0]  # committed rows from batches with no observe row

    def drain_progress(q) -> None:
        # A batch's progress (with its observed metrics) is published only
        # after its sink commit — counting from progress is therefore
        # committed-rows semantics, same as the reference.
        for p in sorted(q.recentProgress, key=lambda p: p["batchId"]):
            bid = p["batchId"]
            if bid in seen_batches:
                continue
            seen_batches.add(bid)
            row = (p.get("observedMetrics") or {}).get("stream_counts")
            if row is None:
                # The observe node always publishes for a data batch, so
                # this is defensive only — and with no measured base
                # offset a per-stream split would be a guess (assuming
                # lo=0 misattributes after a checkpoint resume, the exact
                # bug the observed min(row_id) base exists to prevent).
                # Count the rows toward the total, unattributed.
                unattributed[0] += p["numInputRows"] or 0
                continue
            n_total = row["n"]
            if not n_total:
                continue
            lo = row["lo"]
            for i, n in enumerate(
                _residue_counts(lo, lo + n_total, num_streams)
            ):
                if n:
                    s = stats[i]
                    s.rows_committed += n
                    s.txns_committed += 1
                    if not quiet:
                        print(
                            f"Stream [{s.name}] committed "
                            f"{s.txns_committed} transactions "
                            f"[rows: {s.rows_committed}]"
                        )

    ckpt = os.path.join(checkpoint_root, "ingest")
    if sink == "file":
        q = (
            out.writeStream.format(fmt)
            .option("path", output_path)
            .option("checkpointLocation", ckpt)
            .partitionBy("year", "month")
            .trigger(processingTime=f"{trigger_s} seconds")
            .start()
        )
    else:
        q = (
            out.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{trigger_s} seconds")
            .start()
        )
    # Timeout analog (Stream.java:217-223): wait (draining progress as
    # batches commit, so the recentProgress ring buffer can't overflow on
    # long runs), then stop.
    deadline = time.monotonic() + timeout_ms / 1000.0
    samples: list[tuple[float, int]] = []
    while time.monotonic() < deadline:
        time.sleep(min(0.5, max(0.0, deadline - time.monotonic())))
        drain_progress(q)
        samples.append(
            (time.monotonic(),
             sum(s.rows_committed for s in stats) + unattributed[0])
        )
    exc = q.exception()
    q.stop()
    try:
        q.awaitTermination(60)
    except Exception:
        pass
    drain_progress(q)
    samples.append(
        (time.monotonic(),
         sum(s.rows_committed for s in stats) + unattributed[0])
    )
    if exc is not None:
        raise RuntimeError(f"streaming ingest query failed: {exc}")

    report = IngestReport(
        timeout_ms=timeout_ms, streams=stats, samples=samples,
        unattributed_rows=unattributed[0],
    )
    if not quiet:
        print(report.render())
    return report


def run_streaming_ingest_multi(
    spark: SparkSession,
    output_path: str,
    checkpoint_root: str,
    num_streams: int = 1,
    commit_after_rows: int = 1_000_000,
    events_per_second: int = 10_000,
    timeout_ms: int = 60_000,
    stream_launch_delay_ms: int = 0,
    columns: list[ColumnSpec] | None = None,
    seed: int = 42,
    fmt: str = "orc",
    quiet: bool = False,
    sink: str = "file",
) -> IngestReport:
    """Reference-shaped parallel ingest: P *independent* streaming queries,
    launched with a stagger of ``stream_launch_delay_ms`` between starts —
    exactly the reference's thread-launch loop (Culvert.java:105-108, CLI
    ``-l`` CulvertCLI.java:87-93) — each with its own checkpoint, its own
    rate governor, and its own output directory.

    The fused single-query mode (run_streaming_ingest) is the better Spark
    design (one scheduler, shared batch clock, no committer contention) and
    remains the default; this mode exists for parity when the *ramp-up
    behavior itself* is what's being benchmarked, and as the shape you'd
    use to ingest P genuinely unrelated topics/tables.

    Isolation notes:
    - separate output dirs per stream (``stream-i/``): each query commits
      through its own ``_spark_metadata`` manifest log, which is
      single-writer by design — two queries sharing one directory would
      collide on batch ids in the shared log (and the foreachBatch
      fallback's FileOutputCommitter races on the shared ``_temporary/0``
      staging dir) — distinct roots make every commit private (on a
      cluster, a DSv2/table-format sink would serialize commits instead);
    - separate checkpoints: each query's commit log is its own exactly-once
      domain, so one stream restarting never replays another's batches;
    - per-stream seed offset keeps generated rows globally distinct
      (stream i generates the same deterministic stream as a reference
      writer thread with its own RNG).
    """
    if sink not in _SINKS:
        raise ValueError(f"unknown sink {sink!r}: expected one of {_SINKS}")
    stats = [StreamStats(name=f"stream-{i}") for i in range(num_streams)]
    trigger_s = _trigger_seconds(commit_after_rows, events_per_second)
    cols = columns or default_event_columns()

    queries = []
    seen: list[set[int]] = [set() for _ in range(num_streams)]

    def drain(i: int, q) -> None:
        for p in q.recentProgress:
            bid = p["batchId"]
            if bid in seen[i]:
                continue
            seen[i].add(bid)
            row = (p.get("observedMetrics") or {}).get("committed")
            if row is None or not row["n"]:
                continue
            s = stats[i]
            s.rows_committed += row["n"]
            s.txns_committed += 1
            if not quiet:
                print(
                    f"Stream [{s.name}] committed {s.txns_committed} "
                    f"transactions [rows: {s.rows_committed}]"
                )

    for i in range(num_streams):
        src = (
            generate_stream(
                spark,
                rows_per_second=events_per_second,
                columns=cols,
                seed=seed + i,
                num_partitions=1,
            )
            .observe("committed", F.count(F.lit(1)).alias("n"))
            .withColumn("year", F.lit(STATIC_YEAR))
            .withColumn("month", F.lit(i))
        )
        stream_dir = os.path.join(output_path, f"stream-{i}")
        if sink == "file":
            writer = (
                src.writeStream.format(fmt)
                .option("path", stream_dir)
                .partitionBy("year", "month")
            )
        else:  # foreachBatch: formats with no streaming file sink

            def write_batch(
                batch_df: DataFrame, epoch_id: int, _dest: str = stream_dir
            ) -> None:
                (
                    batch_df.write.format(fmt)
                    .mode("append")
                    .partitionBy("year", "month")
                    .save(_dest)
                )

            writer = src.writeStream.foreachBatch(write_batch)
        q = (
            writer.option(
                "checkpointLocation",
                os.path.join(checkpoint_root, f"stream-{i}"),
            )
            .trigger(processingTime=f"{trigger_s} seconds")
            .queryName(f"culvert-stream-{i}")
            .start()
        )
        queries.append(q)
        # The reference sleeps BETWEEN launches, including after the last
        # (Culvert.java:105-108 sleeps inside the loop body).
        if stream_launch_delay_ms and i < num_streams - 1:
            time.sleep(stream_launch_delay_ms / 1000.0)

    deadline = time.monotonic() + timeout_ms / 1000.0
    while time.monotonic() < deadline:
        time.sleep(min(0.5, max(0.0, deadline - time.monotonic())))
        for i, q in enumerate(queries):
            drain(i, q)
    excs = [q.exception() for q in queries]
    for q in queries:
        q.stop()
    for q in queries:
        try:
            q.awaitTermination(60)
        except Exception:
            pass
    for i, q in enumerate(queries):
        drain(i, q)
    for exc in excs:
        if exc is not None:
            raise RuntimeError(f"streaming ingest query failed: {exc}")

    report = IngestReport(timeout_ms=timeout_ms, streams=stats)
    if not quiet:
        print(report.render())
    return report
