"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the shipped testdata — the cheap way to sweep the edge-case
space (empty groups, all-duplicate keys, single-token docs, pathological
skew) that fixed fixtures never cover.

Each property runs few examples (Spark round-trips are ~100 ms each) but
hypothesis shrinks failures to minimal counterexamples, which is where the
value is."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from culvert_spark import skew

_FEW = settings(max_examples=8, deadline=None)

# Keys drawn from a tiny alphabet so duplicates and hot keys are common.
_keys = st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=30)


@_FEW
@given(big_keys=_keys, small_keys=_keys)
def test_salted_join_equals_plain_join(spark, big_keys, small_keys):
    """salted_join must be row-for-row identical to the plain equi-join for
    every key distribution, including empty sides, no-match keys, and a
    single key carrying 100% of the rows (the case salting exists for)."""
    big = spark.createDataFrame(
        [(k, i) for i, k in enumerate(big_keys)], "k int, payload int"
    )
    small = spark.createDataFrame(
        [(k, k * 10) for k in sorted(set(small_keys))], "k int, dim int"
    )
    plain = sorted(
        tuple(r) for r in big.join(small, "k", "inner").collect()
    )
    salted = sorted(
        tuple(r) for r in skew.salted_join(big, small, "k", salts=4).collect()
    )
    assert salted == plain


@_FEW
@given(counts=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=20))
def test_salted_count_equals_group_count(spark, counts):
    """salted_count's two-phase (key, salt) partial sum must equal the
    direct groupBy count for any per-key multiplicity."""
    rows = [(f"k{i}",) for i, n in enumerate(counts) for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    direct = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r["k"]: r["n"] for r in skew.salted_count(df, "k", salts=4).collect()}
    assert salted == direct


@_FEW
@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=25)
)
def test_chunking_covers_every_token_exactly(spark, n_tokens):
    """The chunker (64-token window, stride 48) must cover every token of
    every document: chunk starts tile [0, n) with no hole wider than the
    stride, the first chunk starts at 0, and consecutive chunks overlap by
    exactly chunk-stride tokens (except the possibly-short tail)."""
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(n_tokens)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    chunks = (
        d.select(
            "doc_id",
            F.expr("split(text, '\\\\s+')").alias("toks"),
            F.explode(F.expr("sequence(0, size(split(text, '\\\\s+')) - 1, 48)")).alias(
                "start"
            ),
        )
        .select(
            "doc_id",
            "start",
            F.expr("slice(toks, start + 1, 64)").alias("chunk"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["chunk"]))
    for i, n in enumerate(n_tokens):
        got = sorted(by_doc[i])
        starts = [s for s, _ in got]
        assert starts[0] == 0
        assert all(b - a == 48 for a, b in zip(starts, starts[1:]))
        covered = set()
        for s, chunk in got:
            assert len(chunk) == min(64, n - s)
            covered.update(range(s, s + len(chunk)))
        assert covered == set(range(n)), "hole in chunk coverage"


@_FEW
@given(
    vals=st.lists(
        st.integers(min_value=-10_000_000, max_value=10_000_000),
        min_size=2,
        max_size=12,
    ),
    gaps=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=11),
)
def test_linear_interpolation_bounded_by_neighbors(spark, vals, gaps):
    """The integer-micros interpolation formula used by q_timeseries_gapfill
    must always land within [min(prev, next), max(prev, next)] and hit the
    endpoints exactly at zero distance — for any neighbor values (including
    negatives) and any gap width."""
    # Build a sparse series: known points at cumulative gap offsets.
    pts = []
    pos = 0
    for v, g in zip(vals, gaps + [0] * len(vals)):
        pts.append((pos, v))
        pos += g + 1
    df = spark.createDataFrame(pts, "x long, v long")
    # Densify [0, max_x] then interpolate exactly as the operator does.
    max_x = pts[-1][0]
    grid = spark.range(0, max_x + 1).withColumnRenamed("id", "x")
    joined = grid.join(df, "x", "left")
    from pyspark.sql.window import Window

    wp = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("x").rowsBetween(0, Window.unboundedFollowing)
    vx = F.when(F.col("v").isNotNull(), F.col("x"))
    ctx = joined.select(
        "x",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(vx, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(vx, ignorenulls=True).over(wn).alias("nt"),
    )
    from culvert_spark.pipelineops import floordiv_sql

    interp = F.expr(
        floordiv_sql("2 * (pv * (nt - x) + nv * (x - pt)) + (nt - pt)", "2 * (nt - pt)")
    )
    out = ctx.select(
        "x",
        "v",
        "pv",
        "nv",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
        .alias("f"),
    ).collect()
    for r in out:
        if r["v"] is not None:
            assert r["f"] == r["v"], "known points must be exact"
        else:
            lo, hi = min(r["pv"], r["nv"]), max(r["pv"], r["nv"])
            assert lo <= r["f"] <= hi, "interpolation escaped neighbor bounds"


def test_lsh_mega_bucket_cap_bounds_candidates(spark):
    """A corpus-wide boilerplate cluster must NOT generate quadratic LSH
    candidate pairs: buckets over _BUCKET_CAP docs are dropped before the
    pair join, while genuine small duplicate clusters survive exactly.

    Synthetic corpus: 1,000 byte-identical boilerplate docs (one LSH
    bucket per band of size 1,000) plus one genuine duplicate pair with
    different text. With the cap at 50 the boilerplate contributes ZERO
    pairs and the real pair survives; with the cap effectively off, the
    same corpus explodes to C(1000,2) + 1 pairs — the quadratic shape the
    cap exists to prevent."""
    from culvert_spark.textops import _minhash_from_docs

    boiler = "terms of service apply to all content provided herein thanks"
    real = "the quick brown fox jumps over the lazy dog tonight again"
    rows = [(i, boiler) for i in range(1000)] + [(5001, real), (5002, real)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    _, capped = _minhash_from_docs(docs, bucket_cap=50)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(5001, 5002)}, f"cap leaked/overcut: {len(got)} pairs"

    _, uncapped = _minhash_from_docs(docs, bucket_cap=10**9)
    assert uncapped.count() == 1000 * 999 // 2 + 1


def _hot_key_events(spark):
    """One hot user (2,000 events crossing two midnights, incl. sessions
    spanning midnight and same-ts ties) plus a quiet control user."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 23, 0, 0)
    rows = []
    eid = 0
    for k in range(2000):
        # bursts of 5 events 1s apart, bursts 40min apart -> many sessions,
        # several crossing midnight as the stream marches over 3 days
        ts = base + dt.timedelta(minutes=40 * (k // 5), seconds=k % 5)
        rows.append((eid, ts, 7, "vcep"[eid % 4] + "x"))
        eid += 1
    rows.append((eid, base, 8, "view"))       # control user, same-ts tie
    rows.append((eid + 1, base, 8, "purchase"))
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_two_level_lead_pairs_match_single_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from culvert_spark.twolevel import segmented_lead_pairs

    ev = _hot_key_events(spark)
    two = (
        segmented_lead_pairs(ev, ["user_id"], ["ts", "event_id"], "event_type")
        .groupBy("user_id", "from_val", "to_val")
        .count()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_val"),
            F.lead("event_type").over(w).alias("to_val"),
        )
        .where(F.col("to_val").isNotNull())
        .groupBy("user_id", "from_val", "to_val")
        .count()
    )
    assert {tuple(r) for r in two.collect()} == {tuple(r) for r in naive.collect()}


def test_sessionize_auto_mode_decision(spark):
    """auto_mode is the exact branch mode="auto" takes: "single" when no
    user can exceed the cutoff — total rows under it, or (round-14
    skew-aware guard) the measured max rows per user under it — else
    "two_level"; and sessionize_session_rows(small_rows=...) produces
    identical session rows either way (the decision changes the PLAN,
    never the result). The fixture's hot user owns max_key of the n
    rows, so the cutoffs below exercise every branch: total-bound pass,
    max-key-probe pass (total above cutoff, hottest user below), max-key
    probe fail (hottest user above cutoff), and the degenerate 0."""
    import pyspark.sql.functions as F

    from culvert_spark.twolevel import auto_mode, sessionize_session_rows

    ev = _hot_key_events(spark)
    n = ev.count()
    max_key = ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert max_key < n  # fixture sanity: a second user exists
    assert auto_mode(ev, small_rows=n) == "single"
    # total above the cutoff but the hottest user under it: the round-14
    # skew probe keeps the cheaper single-window plan (the safety bound
    # holds EXACTLY — the largest possible window partition is max_key)
    assert auto_mode(ev, small_rows=n - 1) == "single"
    assert auto_mode(ev, small_rows=max_key) == "single"
    # a user genuinely over the budget engages the guard
    assert auto_mode(ev, small_rows=max_key - 1) == "two_level"
    assert auto_mode(ev, small_rows=0) == "two_level"
    via_single = {
        (r.user_id, r.n_events, r.min_us, r.max_us)
        for r in sessionize_session_rows(ev, mode="auto", small_rows=n).collect()
    }
    via_two = {
        (r.user_id, r.n_events, r.min_us, r.max_us)
        for r in sessionize_session_rows(ev, mode="auto", small_rows=0).collect()
    }
    assert via_single == via_two and len(via_single) > 0


def test_two_level_sessionize_matches_single_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from culvert_spark.twolevel import sessionize_session_rows

    ev = _hot_key_events(spark)
    # Force the guarded plan: the adaptive default would route this small
    # hot-key fixture to the single-window path and the two-level proof
    # would silently stop testing anything.
    two = {
        (r.user_id, r.n_events, r.min_us, r.max_us)
        for r in sessionize_session_rows(ev, mode="two_level").collect()
    }
    single = {
        (r.user_id, r.n_events, r.min_us, r.max_us)
        for r in sessionize_session_rows(ev, mode="single").collect()
    }
    us = F.unix_micros(F.col("ts"))
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wseq.rowsBetween(Window.unboundedPreceding, 0)
    marked = ev.withColumn("us", us).withColumn(
        "new_s",
        F.when(
            F.lag("us").over(wseq).isNull()
            | ((F.col("us") - F.lag("us").over(wseq)) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    naive = {
        (r.user_id, r.n_events, r.min_us, r.max_us)
        for r in marked.withColumn("sid", F.sum("new_s").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("min_us"),
            F.max("us").alias("max_us"),
        )
        .collect()
    }
    assert two == naive and len(two) > 10
    assert single == naive


def test_deterministic_shuffle_is_stable_permutation(spark):
    """The training shuffle must be a bijection doc_id <-> (shard, pos)
    with dense per-shard positions, and identical under different input
    partitionings (pure function of doc_id, no RDD-order dependence)."""
    import __spark_entry__ as entrymod

    from tests.conftest import SF_SMALL

    fn = entrymod.queries()["t_deterministic_shuffle"]
    rows = fn(spark, SF_SMALL).collect()
    docs = [r.doc_id for r in rows]
    assert len(docs) == len(set(docs)), "a doc appears twice"
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), (
            f"shard {shard}: positions not dense from 1"
        )
    # Re-run with a different shuffle partitioning: same assignment.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows2 = fn(spark, SF_SMALL).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_mixture_weights_normalize_and_monotone(spark):
    """Temperature weights must sum to ~1 and preserve the size order of
    sources while compressing it (temperature flattens the head: the
    largest source's weight share must not exceed its raw share)."""
    import __spark_entry__ as entrymod

    from tests.conftest import SF_SMALL

    rows = entrymod.queries()["t_mix_temperature_weights"](
        spark, SF_SMALL
    ).collect()
    total_w = sum(r.temp_weight for r in rows)
    assert abs(total_w - 1.0) < 1e-4
    top = max(rows, key=lambda r: r.tokens)
    assert top.temp_weight <= top.raw_share + 1e-9
    bottom = min(rows, key=lambda r: r.tokens)
    assert bottom.temp_weight >= bottom.raw_share - 1e-9


def test_cdc_chunks_tile_and_localize_edits(spark):
    """Content-defined chunking: (1) chunks tile each doc exactly (sizes
    sum to the token count, every chunk non-empty); (2) the CDC property —
    inserting one token at the FRONT of a long doc leaves the chunk
    digest multiset identical except for a bounded prefix, where a
    fixed-stride chunker would change every span."""
    import pyspark.sql.functions as F

    from culvert_spark.textops import cdc_chunk_rows

    toks = [f"w{(i * 37) % 211}" for i in range(400)]
    base = " ".join(toks)
    shifted = "INSERTED " + base
    d = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id bigint, text string"
    )
    rows = cdc_chunk_rows(d).collect()
    by_doc = {1: [], 2: []}
    for r in rows:
        by_doc[r.doc_id].append((r.h, r.sz))
    n = {r.doc_id: r.n for r in rows}
    assert sum(sz for _, sz in by_doc[1]) == n[1] == 400
    assert sum(sz for _, sz in by_doc[2]) == n[2] == 401
    assert all(sz >= 1 for doc in by_doc.values() for _, sz in doc)
    # Suffix stability: after the first boundary beyond the edit settles,
    # all remaining chunks agree. Compare digest multisets: the shared
    # tail must cover most of the doc (the edit only reshapes the head).
    from collections import Counter

    c1, c2 = Counter(h for h, _ in by_doc[1]), Counter(h for h, _ in by_doc[2])
    shared = sum((c1 & c2).values())
    assert shared >= len(by_doc[1]) - 3, (
        f"front insertion reshaped {len(by_doc[1]) - shared} chunks; "
        "CDC should localize the edit"
    )


@given(
    lo=st.integers(min_value=0, max_value=10**12),
    n=st.integers(min_value=0, max_value=50_000),
    p=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_ingest_residue_split_is_exact(lo, n, p):
    """The ingest drain splits a committed batch's row count across P
    streams arithmetically (stream i owns value ≡ i mod P over the
    batch's contiguous value range [lo, lo+n) — rate sources are
    round-robin). The production closed form must equal brute force for
    every interval and stream count, and the shares must sum to the
    total."""
    from culvert_spark.ingest import _residue_counts

    counts = _residue_counts(lo, lo + n, p)
    assert sum(counts) == n
    if n <= 5_000:  # brute-force check on small intervals
        brute = [0] * p
        for v in range(lo, lo + n):
            brute[v % p] += 1
        assert counts == brute


def test_spread_memo_exact_and_still_spreads(spark):
    """spread()'s memoized scan-partition probe (round-13): a memo hit
    must decide exactly like the direct probe — same repartition
    decision for a small unsplittable scan — and the memo must key on
    the file set (different tables don't alias). Round-14: the memo is
    weak-keyed on the session (session -> {probe key: count})."""
    from culvert_spark.queries import _SPREAD_MEMO, spread, t
    from tests.conftest import SF_SMALL

    target = spark.sparkContext.defaultParallelism
    d = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    _SPREAD_MEMO.clear()
    first = spread(d)  # direct probe, fills the memo
    assert len(_SPREAD_MEMO[spark]) == 1
    direct_n = first.rdd.getNumPartitions()
    second = spread(t(spark, SF_SMALL, "documents").select("doc_id"))
    assert second.rdd.getNumPartitions() == direct_n == max(
        target, d.rdd.getNumPartitions()
    )
    # a different file set gets its own entry, not the cached decision
    spread(t(spark, SF_SMALL, "embeddings").select("vec_id"))
    assert len(_SPREAD_MEMO[spark]) == 2


def test_twolevel_count_probe_memo_exact(spark):
    """The sessionize auto-guard's memoized row-count probe (round-13)
    must decide exactly like the direct count and key on the file set.
    Round-14: the memo is weak-keyed on the session."""
    from culvert_spark.queries import t
    from culvert_spark.twolevel import _COUNT_MEMO, _MAXKEY_MEMO, auto_mode
    from tests.conftest import SF_SMALL

    ev = t(spark, SF_SMALL, "events")
    _COUNT_MEMO.clear()
    _MAXKEY_MEMO.clear()
    first = auto_mode(ev)
    assert len(_COUNT_MEMO[spark]) == 1
    assert next(iter(_COUNT_MEMO[spark].values())) == ev.count()
    # memo hit returns the same decision; forcing a tiny cutoff through
    # the SAME cached count still flips the branch (the memo caches the
    # count, never the decision)
    assert auto_mode(t(spark, SF_SMALL, "events")) == first
    assert auto_mode(ev, small_rows=0) == "two_level"
    assert len(_COUNT_MEMO[spark]) == 1
    # the cutoff-0 call above escalated to the max-rows-per-key probe
    # (total > 0); its memoized value is the exact per-user max
    from pyspark.sql import functions as F

    true_max = (
        ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    assert next(iter(_MAXKEY_MEMO[spark].values())) == true_max


def test_probe_memos_weakref_no_stale_hits(spark):
    """Round-14 memo-key hygiene (r13 verdict item 6): the probe memos
    are weak-keyed on the SparkSession object, so a dead session's
    entries cannot leak into a new session that happens to reuse the
    old object's id() — the failure mode of the old id(session) tuple
    keys. Simulated with plain objects (the memos only rely on
    weakref + dict semantics of their keys)."""
    import gc
    import weakref

    from culvert_spark import twolevel

    class FakeSession:
        pass

    memo = weakref.WeakKeyDictionary()
    s1 = FakeSession()
    memo[s1] = {("files",): 123}
    assert memo[s1][("files",)] == 123
    del s1
    gc.collect()
    assert len(memo) == 0  # dead session's entries are GONE
    s2 = FakeSession()  # may reuse the collected object's id()
    assert memo.get(s2) is None  # a new session can never see them
    # and the production memos are this type
    from culvert_spark.queries import _SPREAD_MEMO
    from culvert_spark.textops import _CHARS_PROBE_MEMO

    for m in (
        twolevel._COUNT_MEMO,
        twolevel._MAXKEY_MEMO,
        _SPREAD_MEMO,
        _CHARS_PROBE_MEMO,
    ):
        assert isinstance(m, weakref.WeakKeyDictionary)
