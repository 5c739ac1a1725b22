"""Streaming semantics tests (SURVEY.md §5.4): watermark late-data drop,
streaming dedup, stream-static join, session windows, custom stateful op,
and exactly-once across a restart.

Batch boundaries are made deterministic by running one availableNow round
per staged input file against a shared checkpoint: each round processes only
the newly added file, and the watermark persists in the checkpoint between
rounds.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from culvert_spark import streaming as st

SCHEMA = (
    "user_id string, event_id bigint, ts timestamp, "
    "event_type string, value double"
)


def ts(s: str):
    return pd.Timestamp(s)


def write_batch(src_dir: str, idx: int, rows: list[tuple]) -> None:
    """Stage one parquet file = one future micro-batch."""
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(src_dir, f"batch_{idx}.parquet"),
    )


def run_round(spark, src_dir, transform, ckpt, out_dir, output_mode="append"):
    """One availableNow round: process newly staged files, append finalized
    rows to the parquet sink, stop."""
    src = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        transform(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sink(spark, out_dir) -> pd.DataFrame:
    return spark.read.parquet(out_dir).toPandas()


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    xform = lambda df: st.tumbling_counts(df, "1 hour", watermark="30 minutes")
    # Round 1: two rows in the 10:00 window, one at 11:45 → watermark 11:15.
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:05:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:15:00"), "view", 1.0),
        ("u1", 3, ts("2024-01-01 11:45:00"), "view", 1.0),
    ])
    run_round(spark, src, xform, ckpt, out)
    # Round 2: a LATE row for the (already finalized) 10:00 window — must be
    # dropped — plus a 14:00 row that advances the watermark to 13:30.
    write_batch(src, 2, [
        ("u1", 4, ts("2024-01-01 10:07:00"), "view", 1.0),
        ("u1", 5, ts("2024-01-01 14:00:00"), "view", 1.0),
    ])
    run_round(spark, src, xform, ckpt, out)
    # Round 3: push the watermark far ahead to flush remaining windows.
    write_batch(src, 3, [("u2", 6, ts("2024-01-01 20:00:00"), "view", 1.0)])
    run_round(spark, src, xform, ckpt, out)

    sink = read_sink(spark, out)
    by_start = {
        r.window_start.isoformat(): int(r.n) for r in sink.itertuples()
    }
    # 10:00 window finalized with 2 rows — the late event_id=4 was dropped.
    assert by_start["2024-01-01T10:00:00"] == 2
    assert by_start["2024-01-01T11:00:00"] == 1
    assert by_start["2024-01-01T14:00:00"] == 1


def test_dedup_within_watermark(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    xform = lambda df: st.dedup_within_watermark(
        df, "event_id", delay="30 minutes"
    )
    write_batch(src, 1, [
        ("u1", 100, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 100, ts("2024-01-01 10:05:00"), "view", 1.0),  # dup, same batch
        ("u2", 200, ts("2024-01-01 10:06:00"), "click", 1.0),
    ])
    run_round(spark, src, xform, ckpt, out)
    write_batch(src, 2, [
        ("u1", 100, ts("2024-01-01 10:10:00"), "view", 1.0),  # dup, next batch
        ("u3", 300, ts("2024-01-01 10:20:00"), "view", 1.0),
    ])
    run_round(spark, src, xform, ckpt, out)

    sink = read_sink(spark, out)
    counts = sink.groupby("event_id").size().to_dict()
    assert counts == {100: 1, 200: 1, 300: 1}


def test_stream_static_join(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    dim = spark.createDataFrame(
        [("u1", "GOLD"), ("u2", "SILVER")], "user_id string, tier string"
    )
    xform = lambda df: st.stream_static_enrich(df, dim, on="user_id")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u2", 2, ts("2024-01-01 10:01:00"), "view", 1.0),
        ("u9", 3, ts("2024-01-01 10:02:00"), "view", 1.0),  # no dim row
    ])
    run_round(spark, src, xform, ckpt, out)
    sink = read_sink(spark, out)
    assert len(sink) == 2
    assert set(sink["tier"]) == {"GOLD", "SILVER"}


def test_session_windows(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    xform = lambda df: st.session_counts(df, gap="30 minutes")
    # u1: 10:00 + 10:10 merge into one session; 11:30 starts another
    # (gap from 10:10 is 80 min > 30 min).
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:10:00"), "view", 1.0),
        ("u1", 3, ts("2024-01-01 11:30:00"), "view", 1.0),
    ])
    run_round(spark, src, xform, ckpt, out)
    # Advance watermark far past both session ends to flush them.
    write_batch(src, 2, [("u2", 4, ts("2024-01-01 20:00:00"), "view", 1.0)])
    run_round(spark, src, xform, ckpt, out)

    sink = read_sink(spark, out)
    u1 = sink[sink.user_id == "u1"].sort_values("session_start")
    assert len(u1) == 2
    first, second = u1.itertuples()
    assert first.n_events == 2
    assert first.session_start.isoformat() == "2024-01-01T10:00:00"
    assert first.session_end.isoformat() == "2024-01-01T10:40:00"  # last+gap
    assert second.n_events == 1
    assert second.session_start.isoformat() == "2024-01-01T11:30:00"


def test_exactly_once_across_restart(spark, tmp_path):
    """Restarting from the same checkpoint must not duplicate rows — the
    Spark analog of the Hive txn guarantee (SURVEY §7.2)."""
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    xform = lambda df: df.select("user_id", "event_id", "ts")
    write_batch(src, 1, [
        ("u1", i, ts("2024-01-01 10:00:00"), "view", 1.0) for i in range(10)
    ])
    run_round(spark, src, xform, ckpt, out)
    # "Restart": a second query from the same checkpoint; batch 1 must NOT
    # be reprocessed, only the new file.
    write_batch(src, 2, [
        ("u2", 100 + i, ts("2024-01-01 11:00:00"), "view", 1.0)
        for i in range(5)
    ])
    run_round(spark, src, xform, ckpt, out)

    sink = read_sink(spark, out)
    assert len(sink) == 15
    assert sink["event_id"].is_unique


def test_running_totals_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates per-key state across micro-batches
    within one run (two staged files, maxFilesPerTrigger=1)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 2.0),
        ("u1", 2, ts("2024-01-01 10:01:00"), "view", 3.0),
        ("u2", 3, ts("2024-01-01 10:02:00"), "view", 5.0),
    ])
    write_batch(src, 2, [
        ("u1", 4, ts("2024-01-01 10:10:00"), "view", 10.0),
    ])
    src_df = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.running_totals_stateful(src_df)
        .writeStream.format("memory")
        .queryName("running_totals_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.sql("SELECT * FROM running_totals_sink").toPandas()
    final = (
        pdf.sort_values("n_events").groupby("user_id").last().to_dict("index")
    )
    assert final["u1"]["n_events"] == 3
    assert final["u1"]["total_value"] == pytest.approx(15.0)
    assert final["u2"]["n_events"] == 1
    assert final["u2"]["total_value"] == pytest.approx(5.0)


def test_complete_mode_aggregation(spark, tmp_path):
    """Complete output mode re-emits the full aggregate each micro-batch."""
    src = str(tmp_path / "src")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:01:00"), "view", 1.0),
        ("u2", 3, ts("2024-01-01 10:02:00"), "click", 1.0),
    ])
    agg = (
        spark.readStream.schema(SCHEMA).parquet(src)
        .groupBy("event_type")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("complete_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_type: r["count"]
        for r in spark.sql("SELECT * FROM complete_counts").collect()
    }
    assert got == {"view": 2, "click": 1}


def test_write_stream_to_table(spark, tmp_path):
    """writeStream.toTable: streaming append into a catalog table."""
    src = str(tmp_path / "src")
    write_batch(src, 1, [
        ("u1", i, ts("2024-01-01 10:00:00"), "view", 1.0) for i in range(7)
    ])
    spark.sql("DROP TABLE IF EXISTS stream_sink_tbl")
    q = (
        spark.readStream.schema(SCHEMA).parquet(src)
        .writeStream.option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .toTable("stream_sink_tbl")
    )
    q.awaitTermination()
    assert spark.table("stream_sink_tbl").count() == 7
    spark.sql("DROP TABLE stream_sink_tbl")


def test_merge_dedup_sink_idempotent(spark, tmp_path):
    """Re-delivered keys across batches must not duplicate in the sink
    (at-least-once upstream → exactly-once sink contents)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:01:00"), "view", 1.0),
    ])
    q = st.merge_dedup_sink(
        spark.readStream.schema(SCHEMA).parquet(src), out,
        str(tmp_path / "ck1"),
    )
    q.awaitTermination()
    # Batch 2 re-delivers event 2 (fresh checkpoint = a replaying upstream)
    # and adds event 3.
    write_batch(src, 2, [
        ("u1", 2, ts("2024-01-01 10:01:00"), "view", 1.0),  # duplicate
        ("u1", 3, ts("2024-01-01 10:02:00"), "view", 1.0),
    ])
    q = st.merge_dedup_sink(
        spark.readStream.schema(SCHEMA).parquet(src), out,
        str(tmp_path / "ck2"),  # new checkpoint: batch 1 files replay too
    )
    q.awaitTermination()
    sink = read_sink(spark, out)
    assert sorted(sink["event_id"]) == [1, 2, 3]


def test_running_totals_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API) accumulates the
    same per-key state across micro-batches as the applyInPandasWithState
    twin — typed ValueState instead of the GroupState tuple.

    Runs on the host-bundled pure-Python protobuf runtime discovered by
    culvert_spark.pbshim (round-5 verdict item 2); skips only when no
    runtime exists anywhere — the TWS state-server protocol is
    protobuf-based."""
    from culvert_spark import pbshim

    if not pbshim.ensure_protobuf():
        pytest.skip("no google.protobuf runtime available on this host")
    pbshim.ensure_worker_env(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 2.0),
        ("u1", 2, ts("2024-01-01 10:01:00"), "view", 3.0),
        ("u2", 3, ts("2024-01-01 10:02:00"), "view", 5.0),
    ])
    write_batch(src, 2, [
        ("u1", 4, ts("2024-01-01 10:10:00"), "view", 10.0),
    ])
    src_df = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.running_totals_tws(src_df)
        .writeStream.format("memory")
        .queryName("tws_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.sql("SELECT * FROM tws_sink").toPandas()
    final = (
        pdf.sort_values("n_events").groupby("user_id").last().to_dict("index")
    )
    assert final["u1"]["n_events"] == 3
    assert final["u1"]["total_value"] == pytest.approx(15.0)
    assert final["u2"]["n_events"] == 1
    assert final["u2"]["total_value"] == pytest.approx(5.0)


def test_last_k_events_tws_list_and_map_state(spark, tmp_path):
    """ListState + MapState on transformWithStateInPandas — the typed
    collection handles the successor API adds over the single GroupState
    tuple: a bounded last-k buffer (ListState.put after truncate) and
    key-wise per-event-type counts (MapState.updateValue, no whole-blob
    rewrite). Two replayed micro-batches; the second must see the
    first's list and map contents."""
    from culvert_spark import pbshim

    if not pbshim.ensure_protobuf():
        pytest.skip("no google.protobuf runtime available on this host")
    pbshim.ensure_worker_env(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:01:00"), "click", 1.0),
        ("u1", 5, ts("2024-01-01 10:02:00"), "view", 1.0),
    ])
    write_batch(src, 2, [
        ("u1", 9, ts("2024-01-01 10:10:00"), "view", 1.0),
        ("u1", 3, ts("2024-01-01 10:11:00"), "buy", 1.0),
        ("u2", 7, ts("2024-01-01 10:12:00"), "view", 1.0),
    ])
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.last_k_events_tws(sdf, k=3)
        .writeStream.format("memory")
        .queryName("lastk_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.sql("SELECT * FROM lastk_sink").toPandas()
    rows = sorted(
        (r.user_id, list(r.recent_ids), r.n_total)
        for r in pdf.itertuples()
    )
    # u1 batch 1: ids [1,2,5]; batch 2 folds in {9,3} → last-3 = [3,5,9]
    # and the MapState total spans view=3, click=1, buy=1.
    assert rows == [
        ("u1", [1, 2, 5], 3),
        ("u1", [3, 5, 9], 5),
        ("u2", [7], 1),
    ]


def test_session_finalize_tws_event_time_timers(spark, tmp_path):
    """EVENT-TIME TIMERS on transformWithStateInPandas: sessions are
    emitted by handleExpiredTimer exactly when the watermark passes
    last_seen + gap, and an unclosed session emits NOTHING.

    Watermark contract (measured, pinned elsewhere in this file): the
    eviction/timer watermark during batch k is max_ts(batches 0..k-1)
    minus the delay. So with gap=30m and delay=10m:
      batch 1 (u1@10:00, u1@10:05, u2@10:10) registers timers at 10:35
        and 10:40;
      batch 2 (u3@13:00) runs under wm = 10:10-10m = 10:00 — nothing
        fires;
      batch 3 (u3@13:01) runs under wm = 13:00-10m = 12:50 — both
        timers fire, u1/u2 sessions emit, state clears; u3's timer
        (13:31) stays pending and u3 must be absent from the sink."""
    from culvert_spark import pbshim

    if not pbshim.ensure_protobuf():
        pytest.skip("no google.protobuf runtime available on this host")
    pbshim.ensure_worker_env(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    write_batch(src, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u1", 2, ts("2024-01-01 10:05:00"), "view", 1.0),
        ("u2", 3, ts("2024-01-01 10:10:00"), "view", 1.0),
    ])
    write_batch(src, 2, [
        ("u3", 4, ts("2024-01-01 13:00:00"), "view", 1.0),
    ])
    write_batch(src, 3, [
        ("u3", 5, ts("2024-01-01 13:01:00"), "view", 1.0),
    ])
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.session_finalize_tws(sdf, gap_minutes=30, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_tws_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.sql("SELECT * FROM sess_tws_sink").toPandas()

    def ms(s):
        return int(pd.Timestamp(s).value // 1_000_000)

    rows = sorted(
        (r.user_id, r.start_ms, r.end_ms, r.n_events)
        for r in pdf.itertuples()
    )
    assert rows == [
        ("u1", ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 2),
        ("u2", ms("2024-01-01 10:10:00"), ms("2024-01-01 10:10:00"), 1),
    ]


def test_rocksdb_state_store_windowed_agg(spark, tmp_path):
    """The RocksDB state-store provider (the large-state path at scale:
    state spills to local disk instead of living on the JVM heap) must
    produce the same windowed aggregation results as the default HDFS-
    backed store, across TWO rounds sharing one checkpoint — proving state
    written by RocksDB in round 1 is read back correctly in round 2."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ck")
        out = str(tmp_path / "out")
        write_batch(src, 1, [
            ("u1", 1, ts("2024-01-01 10:00:10"), "view", 1.0),
            ("u1", 2, ts("2024-01-01 10:00:40"), "view", 2.0),
            ("u2", 3, ts("2024-01-01 10:01:10"), "view", 3.0),
        ])

        def windowed(df):
            return (
                df.withWatermark("ts", "30 seconds")
                .groupBy(
                    F.window("ts", "1 minute").alias("w"), "user_id"
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .select("w.start", "user_id", "n")
            )

        run_round(spark, src, windowed, ckpt, out)
        # Round 2: late-but-in-watermark row lands in the SAME window as
        # round 1's state (10:00 window for u1), plus an advancing row.
        write_batch(src, 2, [
            ("u1", 4, ts("2024-01-01 10:00:50"), "view", 4.0),
            ("u2", 5, ts("2024-01-01 10:05:00"), "view", 5.0),
        ])
        run_round(spark, src, windowed, ckpt, out)
        got = {
            (str(r["start"]), r["user_id"]): r["n"]
            for r in spark.read.parquet(out).collect()
        }
        # u1's 10:00 window must count ALL THREE u1 rows — two from round
        # 1 plus the round-2 arrival merged into RocksDB-restored state.
        u1 = [v for (s, u), v in got.items() if u == "u1" and "10:00" in s]
        assert u1 == [3], f"RocksDB state not merged across rounds: {got}"
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_streaming_near_dup_filter(spark, tmp_path):
    """Cross-batch near-dup detection: a doc arriving in batch 2 that is
    byte-identical to a batch-1 doc is flagged against that anchor in all
    4 bands; a unique doc emits nothing; an intra-batch duplicate pair is
    caught too. Signatures must equal the batch textops pipeline's."""
    docs_schema = "doc_id bigint, text string"
    dup = "the quick brown fox jumps over the lazy dog tonight again"
    uniq = "completely different content with no overlapping shingles present"
    third = "yet another entirely unrelated set of words goes right here"
    fourth = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    src = str(tmp_path / "docs_src")
    os.makedirs(src, exist_ok=True)

    def write_docs(idx, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(src, f"b{idx}.parquet"),
        )

    # batch 1: two unique docs.  batch 2 (staged up front; one file per
    # micro-batch): an exact dup of doc 1 (collides in all 4 bands),
    # another unique doc, and an intra-batch duplicate pair (7, 8).
    write_docs(1, [(1, dup), (2, uniq)])
    write_docs(2, [(5, dup), (6, third), (7, fourth), (8, fourth)])
    ckpt = str(tmp_path / "ck")

    sdf = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.near_dup_stream_filter(sdf)
        .writeStream.format("memory")
        .queryName("near_dup_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM near_dup_sink").toPandas()
    assert set(out["doc_id"]) == {5, 8}, "batch-1 docs must not be flagged"
    five = out[out["doc_id"] == 5]
    assert set(five["anchor_doc"]) == {1} and len(five) == 4  # all bands
    eight = out[out["doc_id"] == 8]
    assert set(eight["anchor_doc"]) == {7}


def test_streaming_minhash_matches_batch_signatures(spark):
    """The per-row band signatures must be bit-identical to the batch
    (explode + groupBy) pipeline in textops for the same docs."""
    from culvert_spark.queries import t as scan
    from culvert_spark.streaming import _minhash_band_cols
    from culvert_spark.textops import _minhash_from_docs

    from tests.conftest import SF_SMALL

    d = scan(spark, SF_SMALL, "documents").where(F.col("doc_id") < 40)
    mh, _ = _minhash_band_cols()
    row_side = {
        (r.doc_id, i): getattr(r, f"mh_{i}")
        for r in d.select("doc_id", "text").select("doc_id", *mh).collect()
        for i in range(12)
    }
    sig, _cand = _minhash_from_docs(d)
    batch_side = {
        (r.doc_id, i): getattr(r, f"mh_{i}")
        for r in sig.collect()
        for i in range(12)
    }
    assert row_side == batch_side and len(batch_side) > 0


def test_replay_stream_parity_on_synthetic(spark):
    """The batch-replay harness (replay_stream): a tiny synthetic frame
    streamed as 3 one-file micro-batches through a complete-mode tumbling
    aggregation must equal the batch groupBy exactly — pinning the
    harness the registered st_* parity queries stand on, independent of
    the test-data tables."""
    import datetime as dt

    from culvert_spark.streaming import replay_stream, tumbling_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=17 * i), f"t{i % 3}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )
    out = replay_stream(
        spark,
        df,
        lambda s: tumbling_counts(s, "1 hour", watermark="3650 days"),
        "replay_synth",
        n_files=3,
    )
    got = {
        (r.window_start, r.event_type, r.n)
        for r in out.select("window_start", "event_type", "n").collect()
    }
    want = {
        (r.w, r.event_type, r.n)
        for r in df.groupBy(
            F.date_trunc("hour", "ts").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_late_filter_uses_previous_batch_watermark(spark, tmp_path):
    """Pins the EXACT late-drop contract st_late_drop_replay's oracle
    encodes (measured on this Spark): the late-event filter for batch k
    uses the watermark computed from data through batch k-2 (one-batch
    lag: Spark splits watermarkForLateEvents = previous batch's value from
    watermarkForEviction = current), and the boundary is DROP iff
    window_end <= wm. Batches: [03:30] -> [05:00] -> probes at 01:30
    (end 02:00 < 03:00: drop), 02:10 (end 03:00 == wm: drop), 03:10
    (end 04:00 > wm: keep)."""
    import datetime as dt

    T = dt.datetime(2020, 1, 1)
    H, M = dt.timedelta(hours=1), dt.timedelta(minutes=1)

    def frame(rows):
        return spark.createDataFrame(rows, "ts timestamp, event_type string")

    base = str(tmp_path / "late")
    os.makedirs(base)
    src = st.write_ordered_replay_files(
        spark,
        [
            frame([(T + 3 * H + 30 * M, "a")]),
            frame([(T + 5 * H, "a")]),
            frame(
                [
                    (T + 1 * H + 30 * M, "b"),
                    (T + 2 * H + 10 * M, "c"),
                    (T + 3 * H + 10 * M, "d"),
                ]
            ),
        ],
        base,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = st.tumbling_counts(stream, "1 hour", watermark="30 minutes")
    spark.catalog.dropTempView("late_probe_sink")
    q = st.run_to_memory_sink(
        agg, "late_probe_sink", str(tmp_path / "ck"), "update"
    )
    q.awaitTermination()
    got = {
        (r.window_start.hour, r.event_type)
        for r in spark.table("late_probe_sink").collect()
    }
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    # b (end 02:00 < wm 03:00) and c (end 03:00 == wm) dropped; d kept.
    assert dropped == 2
    assert got == {(3, "a"), (5, "a"), (3, "d")}


def test_stateful_replay_under_rocksdb_state_store(spark, tmp_path):
    """The SURVEY §9 large-state profile actually runs: a windowed
    aggregation replay executes under the RocksDB state-store provider
    (spill-capable off-heap state + changelog checkpoints) and produces
    byte-identical results to the default heap provider — proving the
    stateful operators are provider-agnostic and the profile is wired
    correctly (a typo'd providerClass fails the query start)."""
    from culvert_spark.session import ROCKSDB_STATE_CONF, rocksdb_state_profile

    prev = {
        k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF
    }
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, h, m), f"t{h % 3}")
        for h in range(6)
        for m in (0, 15, 40)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    baseline = st.replay_stream(
        spark,
        df,
        lambda s: st.tumbling_counts(s, "1 hour", watermark="3650 days"),
        "rocks_base",
        n_files=3,
    )
    base_rows = {
        (r.window_start, r.event_type, r.n)
        for r in baseline.select("window_start", "event_type", "n").collect()
    }
    rocksdb_state_profile(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            .endswith("RocksDBStateStoreProvider")
        )
        out = st.replay_stream(
            spark,
            df,
            lambda s: st.tumbling_counts(s, "1 hour", watermark="3650 days"),
            "rocks_probe",
            n_files=3,
        )
        got = {
            (r.window_start, r.event_type, r.n)
            for r in out.select("window_start", "event_type", "n").collect()
        }
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # 6 hourly windows, one event_type per hour, 3 events each.
    assert got == base_rows
    assert got == {
        (dt.datetime(2024, 1, 1, h), f"t{h % 3}", 3) for h in range(6)
    }


def test_dedup_within_watermark_expiry(spark, tmp_path):
    """Pins the dropDuplicatesWithinWatermark eviction contract
    st_dedup_expiry_replay's oracle encodes: (a) a duplicate arriving
    while the key's state exists is DROPPED regardless of expiry; (b)
    state is evicted at end of batch k using the watermark from data
    through batch k-1; (c) removal is INCLUSIVE at expiry == watermark
    (key G: first 01:00 + 30min delay -> expiry 01:30; every pre-dup
    eviction sees wm = 02:00 - 30min = 01:30 exactly; G's re-delivery
    IS re-emitted); (d) a re-delivery after eviction is re-admitted as
    a new row (key E), while a key whose expiry has not been crossed by
    the lagged watermark stays deduped (key F)."""
    import datetime as dt

    T = dt.datetime(2020, 1, 1)
    H, M = dt.timedelta(hours=1), dt.timedelta(minutes=1)

    def frame(rows):
        return spark.createDataFrame(rows, "ts timestamp, k string")

    base = str(tmp_path / "ddw")
    os.makedirs(base)
    src = st.write_ordered_replay_files(
        spark,
        [
            # E expiry 01:30; F expiry 02:00; G expiry 01:30.
            frame([(T + 1 * H, "E"), (T + 1 * H, "G"),
                   (T + 1 * H + 30 * M, "F"), (T + 2 * H, "W1")]),
            frame([(T + 2 * H, "W2")]),   # wm stays 01:30 for evictions
            frame([(T + 20 * H, "E"), (T + 20 * H, "F"),
                   (T + 20 * H, "G")]),
        ],
        base,
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ded = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["k"]
    )
    spark.catalog.dropTempView("ddw_expiry_sink")
    q = st.run_to_memory_sink(
        ded, "ddw_expiry_sink", str(tmp_path / "ck"), "append"
    )
    q.awaitTermination()
    got = {(r.ts.hour, r.k) for r in spark.table("ddw_expiry_sink").collect()}
    # E and G re-admitted at 20:00 (expiry 01:30 <= lagged wm 01:30 —
    # inclusive); F still deduped (expiry 02:00 > 01:30).
    assert got == {
        (1, "E"), (1, "G"), (1, "F"), (2, "W1"), (2, "W2"),
        (20, "E"), (20, "G"),
    }


def test_statestore_reader_matches_batch_agg(spark):
    """The `statestore` checkpoint reader returns exactly the per-key
    aggregation buffers batch SQL computes, and `state-metadata`
    describes the operator (numPartitions mirrors the session's shuffle
    partitions — the reason the registered row does not project it)."""
    from pyspark.sql import functions as F

    from culvert_spark import streaming as st
    from culvert_spark.queries import t
    from tests.conftest import SF_SMALL

    sf = SF_SMALL
    ck = st._statestore_checkpoint(spark, sf)
    state = (
        spark.read.format("statestore").load(ck)
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.count").alias("n_events"),
            F.col("value.sum").alias("sum_ids"),
        )
    )
    batch = (
        t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("event_id").cast("long").alias("sum_ids"))
    )
    assert state.exceptAll(batch).count() == 0
    assert batch.exceptAll(state).count() == 0
    md = spark.read.format("state-metadata").load(ck).collect()
    assert len(md) == 1
    row = md[0]
    assert row.operatorName == "stateStoreSave"
    assert (row.minBatchId, row.maxBatchId) == (0, 2)
    assert row.numPartitions == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # second call reuses the session checkpoint (no re-run)
    assert st._statestore_checkpoint(spark, sf) == ck
