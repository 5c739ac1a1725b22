"""Hand-computed values, invariants, and plan gates for the corpusops
batch (entropy / boilerplate / hashed features / BFS / Spark 4 SQL
surface). Oracle parity runs in test_oracle_queries.py; these pin the
math on inputs the shipped fixtures don't cover and the plan shapes the
scale story depends on."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.test_plan_quality import executed_plan

QUERIES = entrymod.queries()


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_doc_entropy_hand_values(spark, tmp_path):
    """H = log2(n) - (Σ c·log2 c)/n against by-hand cases: a 2/3-1/3 split
    (0.918296), a single token (0 bits), and a uniform 4-way split
    (exactly 2 bits)."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a a b", "en", "s"),
            (2, "x", "en", "s"),
            (3, "a b c d", "en", "s"),
        ],
    )
    rows = {r.doc_id: r for r in QUERIES["t_doc_entropy"](spark, d).collect()}
    assert rows[1].n_tokens == 3
    assert rows[1].token_entropy == pytest.approx(0.918296, abs=1e-6)
    assert rows[1].low_entropy
    assert rows[2].token_entropy == 0.0 and rows[2].low_entropy
    assert rows[3].token_entropy == 2.0 and rows[3].low_entropy


def test_doc_entropy_partition_invariant(spark):
    """The rounded-DECIMAL term sum must make entropy identical under any
    shuffle partitioning (no float-order dependence)."""
    fn = QUERIES["t_doc_entropy"]
    a = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0


def test_boilerplate_shared_shingles_flagged(spark, tmp_path):
    """A shingle shared by >= 4 docs of ONE source is boilerplate there;
    the same text in another source (below the threshold) is not — corpus
    frequency is source-scoped."""
    boiler = "terms of service apply now"  # 3 fully-shared shingles in s1
    rows = [
        (i, f"{boiler} unique{i} tail{i} words{i} here{i}", "en", "s1")
        for i in range(5)
    ]
    rows.append((99, f"{boiler} other{99} tail{99} words{99} here{99}", "en", "s2"))
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: r for r in QUERIES["t_boilerplate_ngrams"](spark, d).collect()
    }
    # each doc: 9 tokens -> 7 shingles; the 3 shingles made purely of the
    # 5-token shared prefix appear in all five s1 docs, the 4 touching a
    # unique token don't.
    assert got[0].n_shingles == 7
    assert got[0].n_boiler == 3
    assert all(got[i].n_boiler == 3 and got[i].keep for i in range(5))
    assert got[99].n_boiler == 0 and got[99].keep


def test_bfs_hand_chain(spark, tmp_path):
    """Chain 1-10-20-30-40 via shared baskets: seed (part 1) is depth 0,
    each hop adds 1, and part 40 (4 hops away) is unreachable at cap 3."""
    d = str(tmp_path)
    rows = [
        (1, 1), (1, 10),
        (2, 10), (2, 20),
        (3, 20), (3, 30),
        (4, 30), (4, 40),
    ]
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        (r.part_id, r.depth)
        for r in QUERIES["q_bfs_reachable_parts"](spark, d).collect()
    }
    assert got == {(1, 0), (10, 1), (20, 2), (30, 3)}


def test_hashed_features_conserve_bigram_mass(spark):
    """Per doc, feature counts must sum to the doc's bigram count
    (n_tokens - 1) and bucket ids must lie in [0, 32)."""
    import pyspark.sql.functions as F

    from culvert_spark.corpusops import _FEAT_BUCKETS, _FEAT_DOC_CAP
    from culvert_spark.queries import t as scan

    feats = QUERIES["t_hashed_ngram_features"](spark, SF_SMALL)
    per_doc = {
        r.doc_id: (r.total, r.bmin, r.bmax)
        for r in feats.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("total"),
            F.min("bucket").alias("bmin"),
            F.max("bucket").alias("bmax"),
        )
        .collect()
    }
    expected = {
        r.doc_id: r.n - 1
        for r in scan(spark, SF_SMALL, "documents")
        .where(F.col("doc_id") < _FEAT_DOC_CAP)
        .select("doc_id", F.size(F.split("text", r"\s+")).alias("n"))
        .collect()
        if r.n >= 2
    }
    assert {k: v[0] for k, v in per_doc.items()} == expected
    assert all(0 <= v[1] and v[2] < _FEAT_BUCKETS for v in per_doc.values())


def test_hashed_features_filter_pushed_to_scan(spark):
    """The doc_id cap must reach the parquet reader as a pushed filter —
    at 100 TB this is the difference between scanning 50 docs and the
    corpus."""
    plan = executed_plan(spark, "t_hashed_ngram_features")
    assert "PushedFilters" in plan and "LessThan(doc_id,50)" in plan


def test_bfs_plan_all_equijoins(spark):
    """Every BFS round must be an equi-join on the node key — a cartesian
    anywhere here means the frontier expansion is O(frontier x edges)."""
    plan = executed_plan(spark, "q_bfs_reachable_parts")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_doc_entropy_no_window_no_sort_shuffle(spark):
    """Entropy is two hash aggregates — the sorted-partition shapes
    (Window, global sort before the final ORDER BY) must not appear in
    the aggregation path."""
    plan = executed_plan(spark, "t_doc_entropy")
    assert "Window" not in plan


def test_incremental_dedup_statuses(spark, tmp_path):
    """All three classifications on a hand corpus: an incoming doc byte-
    identical to a base doc is exact_dup (and also band-collides), a
    shingle-overlapping variant is near_dup, an unrelated doc is unique.
    doc_id % 5 == 0 marks incoming."""
    base_text = "the quick brown fox jumps over the lazy dog tonight again"
    near_text = "the quick brown fox jumps over the lazy dog tonight maybe"
    rows = [
        (1, base_text, "en", "s"),          # base
        (2, "totally different words entirely here now", "en", "s"),  # base
        (5, base_text, "en", "s"),          # incoming: exact dup of 1
        (10, near_text, "en", "s"),         # incoming: near dup of 1
        (15, "unrelated content about completely other topics", "en", "s"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.status, r.n_exact_base, r.n_near_base)
        for r in QUERIES["t_incremental_dedup"](spark, d).collect()
    }
    assert got[5][0] == "exact_dup" and got[5][1] == 1 and got[5][2] >= 1
    assert got[10] == ("near_dup", 0, got[10][2]) and got[10][2] >= 1
    assert got[15] == ("unique", 0, 0)


def test_bpe_merges_hand_trace(spark):
    """Full by-hand BPE trace on the classic low/lower/newest corpus:
    pair counts, lexicographic tie-breaks, and greedy non-overlapping
    re-tokenization all pinned for 5 rounds."""
    from culvert_spark.corpusops import bpe_learn_merges

    docs = spark.createDataFrame(
        [("low low low",), ("lower lower",), ("newest",)], "text string"
    )
    assert bpe_learn_merges(docs) == [
        (1, "l", "o", "lo", 5),       # l-o ties o-w at 5; 'l' < 'o'
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),       # e-r ties low-e at 2; 'e' < 'low'
        (4, "low", "er", "lower", 2),
        (5, "e", "s", "es", 1),       # 5-way tie; (e,s) lexicographic min
    ]


def test_bpe_greedy_merge_handles_runs(spark):
    """Merging (a,a) over 'aaa'/'aaaa' must be greedy left-to-right and
    non-overlapping: aaa -> [aa, a], aaaa -> [aa, aa] (so round 2 counts
    the aa-aa pair, not an overlapping phantom)."""
    from culvert_spark.corpusops import bpe_learn_merges

    docs = spark.createDataFrame([("aaa aaaa",)], "text string")
    got = bpe_learn_merges(docs, n_merges=2)
    assert got[0] == (1, "a", "a", "aa", 5)  # 2 adjacent pairs + 3
    # round 2: [aa,a] and [aa,aa] -> aa-a ties aa-aa; 'a' < 'aa'
    assert got[1] == (2, "aa", "a", "aaa", 1)


def test_multimodal_manifest_offsets_dense(spark):
    """Per shard: positions dense from 1 and token_offset equal to the
    running sum of earlier docs' token counts."""
    rows = QUERIES["t_multimodal_manifest"](spark, SF_SMALL).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 4
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        run = 0
        for r in rs:
            assert r.token_offset == run
            run += r.n_tokens


def test_bpe_tokenize_roundtrip(spark, tmp_path):
    """learn -> apply round trip on the hand corpus: with merges
    (l,o),(lo,w),(e,r),(low,er),(e,s), 'low low low' packs to 3 symbols,
    'lower lower' to 2, and 'newest' to 5 (n,e,w,es,t)."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "low low low", "en", "s"),
            (2, "lower lower", "en", "s"),
            (3, "newest", "en", "s"),
        ],
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_symbols, r.symbols_per_word)
        for r in QUERIES["t_bpe_tokenize_stats"](spark, d).collect()
    }
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (1, 5, 5.0)


def test_incremental_dedup_plan_no_cartesian(spark):
    """Both dedup paths must be equi-joins (digest; band+bsig) — a
    cartesian/nested-loop anywhere means incoming x base blew up."""
    plan = executed_plan(spark, "t_incremental_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_multimodal_manifest_plan_single_join(spark):
    """The manifest is one id equi-join plus one shard-grain window: no
    cartesian, and exactly one SortMergeJoin/BroadcastHashJoin pair of
    inputs (docs, embeddings)."""
    plan = executed_plan(spark, "t_multimodal_manifest")
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 1
    assert "Window" in plan


def test_incremental_dedup_signature_store_equivalent(spark, tmp_path):
    """The steady-state path (persisted base signature table + increment-
    only hashing) must classify incoming docs identically to the
    recompute-everything query on the shipped corpus."""
    import pyspark.sql.functions as F

    from culvert_spark.corpusops import (
        _INC_MOD,
        build_signature_table,
        incremental_dedup_vs_signatures,
    )
    from culvert_spark.queries import t as scan

    d = scan(spark, SF_SMALL, "documents")
    base = d.where(F.col("doc_id") % _INC_MOD != 0)
    inc = d.where(F.col("doc_id") % _INC_MOD == 0)

    sig_path = os.path.join(str(tmp_path), "base_sigs.parquet")
    build_signature_table(base).write.mode("overwrite").parquet(sig_path)
    persisted = spark.read.parquet(sig_path)

    steady = [
        tuple(r)
        for r in incremental_dedup_vs_signatures(inc, persisted).collect()
    ]
    full = [
        tuple(r) for r in QUERIES["t_incremental_dedup"](spark, SF_SMALL).collect()
    ]
    assert steady == full and len(steady) > 0


# ---------------------------------------------------------------------------
# t_exact_substring_spans: planted-case semantics (parity with the DuckDB
# oracle runs in test_oracle_queries.py; a blind spot shared by both
# engines needs hand-planted ground truth)
# ---------------------------------------------------------------------------


def _filler(seed: str, n: int) -> str:
    """Deterministic non-repeating filler: md5 keystream, hex alphabet."""
    import hashlib

    out = []
    i = 0
    while sum(len(s) for s in out) < n:
        out.append(hashlib.md5(f"{seed}|{i}".encode()).hexdigest())
        i += 1
    return "".join(out)[:n]


def test_exact_substring_spans_planted(spark, tmp_path):
    """Ground-truth spans: a 60-char substring shared by two docs is
    recovered as exactly [offset, offset+59] in each; a 45-char substring
    repeated WITHIN one doc yields two spans (within-doc semantics);
    a unique doc yields none. Offsets differ per doc to prove the span is
    anchored by content, not position."""
    shared = "S" * 20 + "HARED-BLOCK-" + "0123456789" * 2 + "-END" + "Z" * 4
    assert len(shared) == 60
    rep = "R" * 30 + "EPEATED-WITHIN-"  # 45 chars
    assert len(rep) == 45
    # docB: shared at pos 11 (1-based); docC: shared at pos 101.
    docB = _filler("b", 10) + shared + _filler("b2", 200)
    docC = _filler("c", 100) + shared + _filler("c2", 50)
    # docD: rep at pos 1 and pos 146 (gap 100 > L=40 so islands split).
    docD = rep + _filler("d", 100) + rep + _filler("d2", 60)
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, _filler("a", 300), "en", "s"),
            (2, docB, "en", "s"),
            (3, docC, "en", "s"),
            (4, docD, "en", "s"),
        ],
    )
    rows = [
        tuple(r)
        for r in QUERIES["t_exact_substring_spans"](spark, d).collect()
    ]
    assert rows == [
        (2, 11, 70, 60),
        (3, 101, 160, 60),
        (4, 1, 45, 45),
        (4, 146, 190, 45),
    ]


def test_exact_substring_spans_adjacent_merge(spark, tmp_path):
    """Two duplicated regions whose coverage is exactly adjacent (next
    anchor at prev + L) merge into ONE maximal span; at prev + L + 1 (a
    1-char uncovered gap) they stay separate — pins the island threshold
    off-by-one on both sides of the boundary."""
    a = "A" * 40
    b = "B" * 40
    # doc1+doc2 share block a; doc1+doc3 share block b.
    # doc1 lays them back-to-back: anchors 1 and 41 = one merged span.
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, a + b + _filler("x", 80), "en", "s"),
            (2, _filler("y", 50) + a + _filler("y2", 50), "en", "s"),
            (3, _filler("z", 90) + b + _filler("z2", 10), "en", "s"),
            # doc4/doc5 share c-block; doc4 separates its two duplicated
            # regions by one filler char => two spans.
            (4, "C" * 40 + _filler("w", 1) + "D" * 40, "en", "s"),
            (5, _filler("v", 20) + "C" * 40 + "." + "D" * 40, "en", "s"),
        ],
    )
    rows = [
        tuple(r)
        for r in QUERIES["t_exact_substring_spans"](spark, d).collect()
    ]
    by_doc: dict[int, list[tuple]] = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    assert by_doc[1] == [(1, 1, 80, 80)]  # adjacent => merged
    assert by_doc[4] == [(4, 1, 40, 40), (4, 42, 81, 40)]  # gap => split
    assert by_doc[5] == [(5, 21, 60, 40), (5, 62, 101, 40)]


def test_exact_substring_spans_plan_shape(spark):
    """Scale gates: in the exact regime the gram fan-out runs exactly
    ONCE (round-13: the window-count dup filter replaced the count
    aggregate + recomputed-lineage semi-join, which materialized the
    explode twice), the whole pipeline is JVM-only, and no cartesian
    product appears."""
    # AQE's toString repeats the tree under "== Initial Plan ==" — count
    # nodes in the final section only.
    plan = executed_plan(spark, "t_exact_substring_spans")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate") == 1, "gram fan-out must run once"
    assert "Window" in final
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"unexpected {marker} in plan"


def _ess_brute_force(texts: dict[int, str], L: int) -> list[tuple]:
    """Independent O(n²) reference for t_exact_substring_spans: collect
    every (doc, pos) whose L-gram occurs 2+ times corpus-wide, then merge
    positions with gap <= L into maximal spans."""
    from collections import Counter

    counts = Counter()
    for text in texts.values():
        for i in range(len(text) - L + 1):
            counts[text[i : i + L]] += 1
    spans = []
    for doc_id in sorted(texts):
        text = texts[doc_id]
        hits = [
            i + 1  # 1-based
            for i in range(len(text) - L + 1)
            if counts[text[i : i + L]] >= 2
        ]
        start = prev = None
        for p in hits:
            if prev is not None and p - prev <= L:
                prev = p
                continue
            if start is not None:
                spans.append((doc_id, start, prev + L - 1, prev + L - start))
            start = prev = p
        if start is not None:
            spans.append((doc_id, start, prev + L - 1, prev + L - start))
    return spans


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exact_substring_spans_random_cross_check(spark, tmp_path, seed):
    """Randomized corpora from a 4-char alphabet (dense with natural
    repeats, overlaps, and exact-adjacency edges) must match an
    independent brute-force implementation of the span semantics —
    guards against a blind spot shared by the Spark plan and the DuckDB
    oracle (which mirror each other's shape)."""
    import random

    rng = random.Random(seed)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(30, 300)))
        for i in range(1, 25)
    }
    # Plant a couple of exact long repeats so the >=L grams aren't only
    # chance collisions (at L=40 a 4-char alphabet rarely repeats 40-grams
    # by luck; the planted blocks create real cross-doc structure).
    block = "".join(rng.choice("abcd") for _ in range(70))
    texts[3] = texts[3][:10] + block + texts[3][10:]
    texts[17] = block + texts[17]
    texts[17] += texts[17][:55]  # within-doc tail repeat of its own head
    d = _write_docs(
        spark,
        tmp_path,
        [(i, s, "en", "s") for i, s in sorted(texts.items())],
    )
    from culvert_spark.textops import _ESS_L

    got = [
        tuple(r)
        for r in QUERIES["t_exact_substring_spans"](spark, d).collect()
    ]
    assert got == _ess_brute_force(texts, _ESS_L)


@pytest.mark.parametrize("seed", [5, 6])
def test_exact_substring_prune_equality(spark, tmp_path, seed):
    """The 100 TB bucket pre-prune is RESULT-IDENTICAL to the plain
    exact plan — on a random planted corpus, prune="bucket" (forced, and
    with a tiny bucket domain to force real bucket collisions through
    the false-positive path) matches prune="off" AND the independent
    brute force."""
    import random

    from culvert_spark.textops import _ESS_L, exact_substring_spans

    rng = random.Random(seed)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(30, 300)))
        for i in range(1, 20)
    }
    block = "".join(rng.choice("abcd") for _ in range(90))
    texts[2] = block + texts[2]
    texts[11] = texts[11][:35] + block + texts[11][35:]
    texts[11] += texts[11][:48]  # within-doc repeat
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    plain = exact_substring_spans(docs, prune="off")
    # n_buckets=7 guarantees collisions between unrelated grams, so the
    # exact pass after the broadcast filter is genuinely exercised.
    pruned = exact_substring_spans(docs, prune="bucket", n_buckets=7)
    want = _ess_brute_force(texts, _ESS_L)
    assert [tuple(r) for r in plain.collect()] == want
    assert [tuple(r) for r in pruned.collect()] == want


@pytest.mark.parametrize("seed", [7, 8])
def test_exact_substring_dup_filter_equality(spark, tmp_path, seed):
    """The round-13 window-count dup filter is RESULT-IDENTICAL to the
    original count-aggregate + semi-join shape: on a random planted
    corpus both forced modes match each other AND the independent brute
    force, and the window plan materializes the gram fan-out exactly
    once (one Generate) where the semi plan runs it twice."""
    import random

    from culvert_spark.textops import _ESS_L, exact_substring_spans

    rng = random.Random(seed)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(30, 300)))
        for i in range(1, 20)
    }
    block = "".join(rng.choice("abcd") for _ in range(90))
    texts[4] = block + texts[4]
    texts[13] = texts[13][:20] + block + texts[13][20:]
    texts[13] += texts[13][:48]  # within-doc repeat
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    windowed = exact_substring_spans(docs, dup_filter="window")
    semi = exact_substring_spans(docs, dup_filter="semi")
    want = _ess_brute_force(texts, _ESS_L)
    assert [tuple(r) for r in windowed.collect()] == want
    assert [tuple(r) for r in semi.collect()] == want
    # AQE's toString repeats the tree under "== Initial Plan ==" — count
    # nodes in the final section only.
    win_plan = (
        windowed._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    semi_plan = (
        semi._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert win_plan.count("Generate") == 1
    assert semi_plan.count("Generate") == 2 and "LeftSemi" in semi_plan
    with pytest.raises(ValueError, match="dup_filter"):
        exact_substring_spans(docs, dup_filter="bogus").collect()


def test_exact_substring_prune_modes(spark, tmp_path):
    """auto mode routes on the char-count probe (threshold 0 engages the
    bucket plan, the default threshold keeps the plain plan at test
    scale); the bucket plan broadcasts the hot-bucket set (no
    cartesian/BNLJ) and stays JVM-only; unknown modes raise."""
    from culvert_spark.textops import exact_substring_spans

    d = _write_docs(
        spark,
        tmp_path,
        [(1, "A" * 60 + _filler("p", 40), "en", "s"),
         (2, _filler("q", 25) + "A" * 60, "en", "s")],
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    rows_off = exact_substring_spans(docs, prune="auto").collect()
    auto_bucket = exact_substring_spans(
        docs, prune="auto", prune_threshold_chars=0
    )
    assert [tuple(r) for r in auto_bucket.collect()] == [
        tuple(r) for r in rows_off
    ]
    auto_bucket.collect()
    plan = auto_bucket._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and plan.count("LeftSemi") >= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"unexpected {marker} in prune plan"
    with pytest.raises(ValueError, match="prune"):
        exact_substring_spans(docs, prune="bogus").collect()
    with pytest.raises(ValueError, match="anchor"):
        exact_substring_spans(docs, anchor="stride2").collect()
    with pytest.raises(ValueError, match="winnow_w"):
        exact_substring_spans(docs, anchor="winnow", winnow_w=0).collect()
    # w > L would let intra-repeat anchor gaps exceed the island-merge
    # threshold and silently split covered repeats (review finding r8)
    with pytest.raises(ValueError, match="must be <= L"):
        exact_substring_spans(docs, anchor="winnow", winnow_w=41).collect()


def test_exact_substring_winnow_w1_identity(spark, tmp_path):
    """winnow_w=1 degenerates to stride-1 (every window is one gram, so
    every position is its own minimizer) — results must be identical on
    a repeat-dense random corpus."""
    import random

    from culvert_spark.textops import exact_substring_spans

    rng = random.Random(9)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(30, 250)))
        for i in range(1, 15)
    }
    block = "".join(rng.choice("abcd") for _ in range(80))
    texts[4] += block
    texts[9] = block + texts[9]
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    exact = [tuple(r) for r in exact_substring_spans(docs).collect()]
    win1 = [
        tuple(r)
        for r in exact_substring_spans(
            docs, anchor="winnow", winnow_w=1
        ).collect()
    ]
    assert win1 == exact and len(exact) > 0


@pytest.mark.parametrize("w", [4, 16])
def test_exact_substring_winnow_guarantees(spark, tmp_path, w):
    """The two winnowing contracts, on randomized corpora with a planted
    repeat of EXACTLY L + w - 1 chars (the guarantee boundary):

    - zero false positives: every winnow span is contained in an exact
      stride-1 span of the same doc;
    - detection: the planted block is reported in BOTH docs, inside the
      planted range, with span length >= L."""
    import random

    from culvert_spark.textops import _ESS_L, exact_substring_spans

    rng = random.Random(100 + w)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(60, 300)))
        for i in range(1, 15)
    }
    block = "".join(rng.choice("xyz") for _ in range(_ESS_L + w - 1))
    # Plant at known offsets. The two planted docs get DISJOINT flank
    # alphabets ("ab" vs "cd"): a shared flanking char would legitimately
    # extend the true duplicated region past the planted range (observed
    # at 1-in-4 per boundary with a common alphabet) and break the
    # ground-truth bounds below.
    off5, off12 = 13, 41
    f5 = "".join(rng.choice("ab") for _ in range(len(texts[5])))
    f12 = "".join(rng.choice("cd") for _ in range(len(texts[12])))
    texts[5] = f5[:off5] + block + f5[off5:]
    texts[12] = f12[:off12] + block + f12[off12:]
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    exact = [tuple(r) for r in exact_substring_spans(docs).collect()]
    got = [
        tuple(r)
        for r in exact_substring_spans(
            docs, anchor="winnow", winnow_w=w
        ).collect()
    ]
    # subset guarantee
    for doc_id, s, e, _ln in got:
        assert any(
            xd == doc_id and xs <= s and e <= xe for xd, xs, xe, _ in exact
        ), f"winnow span ({doc_id},{s},{e}) not inside any exact span"
    # detection guarantee at the boundary length
    for doc_id, off in ((5, off5), (12, off12)):
        start, end = off + 1, off + len(block)  # 1-based planted range
        hits = [
            (s, e, ln)
            for xd, s, e, ln in got
            if xd == doc_id and s >= start and e <= end
        ]
        assert hits, f"planted block not detected in doc {doc_id}"
        assert max(ln for _, _, ln in hits) >= _ESS_L


def test_exact_substring_winnow_positional_guarantee(spark, tmp_path):
    """The per-window detection contract, checked POSITIONALLY against
    an independent brute force on a repeat-dense corpus (2-char
    alphabet, L=8, w=3): for EVERY position p whose (L+w-1)-gram occurs
    2+ times corpus-wide, some winnow span must cover [p+w-1, p+L-1] —
    i.e. the guaranteed shared anchor q ∈ [p, p+w-1] was sampled as a
    duplicated hit in this doc. Dense natural repeats exercise tie
    selection (identical grams inside one window) far harder than the
    planted-block tests."""
    import random
    from collections import Counter

    from culvert_spark.textops import exact_substring_spans

    L, w = 8, 3
    rng = random.Random(77)
    texts = {
        i: "".join(rng.choice("ab") for _ in range(rng.randint(20, 120)))
        for i in range(1, 31)
    }
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    got = [
        tuple(r)
        for r in exact_substring_spans(
            docs, L=L, anchor="winnow", winnow_w=w
        ).collect()
    ]
    by_doc: dict[int, list[tuple]] = {}
    for doc_id, s, e, _ln in got:
        by_doc.setdefault(doc_id, []).append((s, e))
    glen = L + w - 1
    counts = Counter()
    for text in texts.values():
        for i in range(len(text) - glen + 1):
            counts[text[i : i + glen]] += 1
    checked = 0
    for doc_id, text in texts.items():
        for i in range(len(text) - glen + 1):
            if counts[text[i : i + glen]] < 2:
                continue
            p = i + 1  # 1-based
            checked += 1
            assert any(
                s <= p + w - 1 and e >= p + L - 1
                for s, e in by_doc.get(doc_id, [])
            ), f"duplicated {glen}-gram at doc {doc_id} pos {p} not covered"
    # subset guarantee against the exact spans at the same L
    exact = [tuple(r) for r in exact_substring_spans(docs, L=L).collect()]
    for doc_id, s, e, _ln in got:
        assert any(
            xd == doc_id and xs <= s and e <= xe for xd, xs, xe, _ in exact
        )
    assert checked > 50, f"corpus too sparse to exercise the property ({checked})"
    # the two scale knobs COMPOSE: bucket-pruning the winnowed anchor
    # stream (tiny domain to force FP-path collisions) changes nothing
    composed = [
        tuple(r)
        for r in exact_substring_spans(
            docs, L=L, anchor="winnow", winnow_w=w, prune="bucket",
            n_buckets=5,
        ).collect()
    ]
    assert composed == got


def test_winnow_duckdb_oracle_parity(spark, tmp_path):
    """Cross-engine parity for the winnow selection (staged round-9
    registration path): Spark's array-HOF winnowing with the md5-hex60
    selection hash must equal DuckDB executing winnow_oracle_sql() —
    two sliding window passes per doc — on the same corpus, byte for
    byte. Also sanity-checks that the md5hex60 and xxhash64 selection
    hashes (different minimizers) both satisfy the subset guarantee."""
    import random

    import duckdb

    from culvert_spark.textops import (
        exact_substring_spans,
        winnow_oracle_sql,
    )

    L, w = 12, 4
    rng = random.Random(321)
    texts = {
        i: "".join(rng.choice("abc") for _ in range(rng.randint(30, 200)))
        for i in range(1, 25)
    }
    block = "".join(rng.choice("abc") for _ in range(60))
    texts[3] += block
    texts[18] = block + texts[18]
    d = _write_docs(
        spark, tmp_path, [(i, s, "en", "s") for i, s in sorted(texts.items())]
    )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    got = [
        tuple(r)
        for r in exact_substring_spans(
            docs, L=L, anchor="winnow", winnow_w=w, winnow_hash="md5hex60"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(d, 'documents.parquet', '*.parquet')}'"
    )
    want = [
        tuple(int(v) for v in row)
        for row in con.execute(winnow_oracle_sql(L=L, w=w)).fetchall()
    ]
    assert got == want and len(want) > 0
    # both selection hashes honor the subset guarantee vs exact spans
    exact = [tuple(r) for r in exact_substring_spans(docs, L=L).collect()]
    for hash_mode in ("xxhash64", "md5hex60"):
        spans = [
            tuple(r)
            for r in exact_substring_spans(
                docs, L=L, anchor="winnow", winnow_w=w,
                winnow_hash=hash_mode,
            ).collect()
        ]
        for doc_id, s, e, _ln in spans:
            assert any(
                xd == doc_id and xs <= s and e <= xe
                for xd, xs, xe, _ in exact
            )
    with pytest.raises(ValueError, match="winnow_hash"):
        exact_substring_spans(docs, anchor="winnow", winnow_hash="crc")


# ---------------------------------------------------------------------------
# Independent-reference cross-checks, round 8 batch: the window-function
# analytics rows whose DuckDB oracles MIRROR the Spark construction
# (conditional-MIN funnel, LEAD adjacency, gaps-and-islands SCD2). The
# reference implementations below are from-scratch Python over the raw
# parquet rows (fetched via duckdb as a plain row source, epoch-integer
# timestamps) — a blind spot shared by both engines' window semantics
# would fail here.
# ---------------------------------------------------------------------------


def _raw_events():
    import duckdb

    return duckdb.sql(
        "SELECT user_id, epoch_us(ts) AS us, event_id, event_type "
        f"FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()


def test_funnel_steps_independent_reference(spark):
    """First-touch strict-order funnel recomputed from scratch: per user
    min timestamp per step, strict > comparisons, None never converts."""
    rows = _raw_events()
    first: dict[int, dict[str, int]] = {}
    for uid, us, _eid, etype in rows:
        d = first.setdefault(uid, {})
        if etype in ("view", "click", "purchase"):
            if etype not in d or us < d[etype]:
                d[etype] = us
    n_users = len(first)
    s1 = s2 = s3 = 0
    for d in first.values():
        v, c, p = d.get("view"), d.get("click"), d.get("purchase")
        if v is not None:
            s1 += 1
            if c is not None and c > v:
                s2 += 1
                if p is not None and p > c:
                    s3 += 1
    got = QUERIES["q_funnel_steps"](spark, SF_SMALL).collect()[0]
    assert (got.n_users, got.step1_view, got.step2_click,
            got.step3_purchase) == (n_users, s1, s2, s3)
    assert n_users > 0 and s1 > 0


def test_event_transitions_independent_reference(spark):
    """First-order transition matrix recomputed from scratch: per-user
    (ts, event_id) sort, consecutive pairs, per-from_type normalization.
    Also pins the two-level segmented-LEAD guard against a plain sorted
    pairing (the guard must be invisible in the result)."""
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for uid, us, eid, etype in _raw_events():
        by_user[uid].append((us, eid, etype))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    totals = Counter()
    for (a, _b), n in pairs.items():
        totals[a] += n
    want = {
        (a, b): (n, round(n / totals[a], 6)) for (a, b), n in pairs.items()
    }
    got = QUERIES["q_event_transitions"](spark, SF_SMALL).collect()
    assert len(got) == len(want)
    for r in got:
        n, prob = want[(r.from_type, r.to_type)]
        assert r.transitions == n
        assert abs(r.prob - prob) <= 1e-6
    assert len(got) > 10


def test_scd2_intervals_independent_reference(spark):
    """Gaps-and-islands SCD2 recomputed from scratch: per-user (ts,
    event_id) sort, island break on type change (None opens one),
    valid_to = next island's valid_from in ISLAND order, open interval
    ends None."""
    import calendar
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, us, eid, etype in _raw_events():
        by_user[uid].append((us, eid, etype))
    want = []
    for uid in sorted(by_user):
        seq = sorted(by_user[uid])
        islands = []  # (event_type, valid_from_us, n)
        prev_type = object()  # sentinel != anything incl. None
        for us, _eid, etype in seq:
            if etype != prev_type:
                islands.append([etype, us, 0])
                prev_type = etype
            islands[-1][2] += 1
        for i, (etype, vf, n) in enumerate(islands):
            vt = islands[i + 1][1] if i + 1 < len(islands) else None
            want.append((uid, etype, vf, vt, n))

    def us_of(dt):
        if dt is None:
            return None
        return calendar.timegm(dt.utctimetuple()) * 1_000_000 + dt.microsecond

    got = [
        (r.user_id, r.event_type, us_of(r.valid_from), us_of(r.valid_to),
         r.n_events)
        for r in QUERIES["q_scd2_intervals"](spark, SF_SMALL).collect()
    ]
    assert got == want and len(want) > 100


def test_ewma_independent_reference(spark):
    """EWMA(α=1/2, 10 lags) recomputed from scratch: per-user daily
    counts from epoch-day truncation, then Σ cnt_{t-k}·2^-k over the
    user's ordered day sequence. The dyadic weights make every term
    exact in binary floating point, so equality is EXACT — any drift in
    the window frame, lag coalescing, or day truncation shows as a hard
    mismatch."""
    import calendar
    from collections import defaultdict

    DAY_US = 86_400_000_000
    daily = defaultdict(int)
    for uid, us, _eid, _etype in _raw_events():
        daily[(uid, us // DAY_US)] += 1
    series = defaultdict(list)  # uid -> sorted [(day, cnt)]
    for (uid, day), cnt in sorted(daily.items()):
        series[uid].append((day, cnt))
    want = {}
    for uid, seq in series.items():
        for t, (day, cnt) in enumerate(seq):
            ewma = sum(
                seq[t - k][1] / 2.0**k for k in range(10) if t - k >= 0
            )
            want[(uid, day)] = (cnt, ewma)

    def day_of(dt):
        return (
            calendar.timegm(dt.utctimetuple()) * 1_000_000 + dt.microsecond
        ) // DAY_US

    got = QUERIES["q_ewma_user_daily"](spark, SF_SMALL).collect()
    assert len(got) == len(want)
    for r in got:
        cnt, ewma = want[(r.user_id, day_of(r.day))]
        assert r.cnt == cnt and r.ewma10 == ewma
    assert len(got) > 100


def test_ols_trend_independent_reference(spark):
    """Closed-form OLS recomputed from scratch with EXACT arithmetic:
    daily revenue summed as integer cents (duckdb DECIMAL fetch), the
    five sufficient statistics as Python ints, then the same
    closed-form float division. Slope/intercept/r² must match the
    registered row within 2e-6 (one rounding step of slack for the
    decimal→double cast orders)."""
    from collections import defaultdict
    from datetime import date
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(o_orderdate AS DATE), "
        "CAST(o_totalprice AS DECIMAL(18,2)) "
        f"FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    epoch = date(1992, 1, 1)
    daily = defaultdict(int)  # x -> cents
    for d, price in rows:
        daily[(d - epoch).days] += int(price * 100)
    n = len(daily)
    sx = sum(daily.keys())
    sxx = sum(x * x for x in daily)
    sy = sum(daily.values())          # cents
    sxy = sum(x * y for x, y in daily.items())
    syy = sum(y * y for y in daily.values())
    # convert the y-carrying sums back to dollars exactly
    num = n * sxy / 100 - sx * (sy / 100)
    denx = float(n * sxx - sx * sx)
    deny = n * (syy / 10000) - (sy / 100) ** 2
    slope = num / denx
    intercept = (sy / 100 - slope * sx) / n
    r2 = num * num / (denx * deny)
    got = QUERIES["q_ols_daily_revenue_trend"](spark, SF_SMALL).collect()[0]
    assert got.n_days == n
    assert abs(got.slope - round(slope, 6)) <= 2e-6
    assert abs(got.intercept - round(intercept, 6)) <= 2e-6
    assert abs(got.r2 - round(r2, 6)) <= 2e-6
    assert 0.0 <= got.r2 <= 1.0 and n > 100


def test_identifier_binding_rejects_injection(spark):
    """The injection-safety claim in q_params_identifier's docstring:
    IDENTIFIER(:tbl) binds the parameter as ONE identifier, so a value
    carrying statement syntax fails to resolve instead of splicing into
    the statement; a bound predicate parameter is likewise a literal."""
    from culvert_spark.sqlrunner import register_views

    register_views(spark, SF_SMALL)
    with pytest.raises(Exception):  # invalid/unresolvable identifier
        spark.sql(
            "SELECT COUNT(*) AS n FROM IDENTIFIER(:tbl)",
            args={"tbl": "orders; DROP VIEW orders"},
        ).collect()
    # The view is untouched and still queryable afterwards.
    assert spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n > 0
    # A predicate parameter carrying SQL text is compared as a string
    # literal (zero rows), never parsed as syntax.
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :s",
        args={"s": "' OR 1=1 --"},
    ).collect()[0].n
    assert n == 0


# ---------------------------------------------------------------------------
# min_label_components_doubling: the round-8 swap target for
# t_dedup_clusters (pointer doubling closes the 15-round diameter cap
# flagged as round 7's known scale edge)
# ---------------------------------------------------------------------------


def _union_find_components(n_nodes, edge_list):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # Min node id per component, for every node that appears in an edge.
    touched = sorted({x for e in edge_list for x in e})
    comp_min: dict[int, int] = {}
    for x in touched:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in touched}


def _run_doubling(spark, edge_list):
    from culvert_spark.textops import (
        _reliable_ckpt,
        min_label_components_doubling,
    )

    sym = {(a, b) for a, b in edge_list} | {(b, a) for a, b in edge_list}
    edges = spark.createDataFrame(
        sorted(sym), "src bigint, dst bigint"
    )
    out = min_label_components_doubling(edges, _reliable_ckpt(spark))
    return {r.doc_id: r.cluster_id for r in out.collect()}


@pytest.mark.parametrize("seed", [0, 1])
def test_components_doubling_matches_union_find(spark, seed):
    import random

    rng = random.Random(seed)
    n = 40
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(30)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    assert _run_doubling(spark, edge_list) == _union_find_components(
        n, edge_list
    )


def test_components_doubling_closes_long_chain(spark):
    """A 120-hop chain: the plain one-hop-per-round recurrence cannot
    close it in 15 rounds (round 7's documented t_dedup_clusters scale
    edge); pointer doubling must label every node with the chain head
    inside the same cap."""
    edge_list = [(i, i + 1) for i in range(120)]
    got = _run_doubling(spark, edge_list)
    assert got == {i: 0 for i in range(121)}


# ---------------------------------------------------------------------------
# q_graph_triangles: randomized brute-force cross-check (degree
# orientation + wedge canonicalization is the most intricate relational
# logic in the registry; oracle parity only exercises the shipped corpus)
# ---------------------------------------------------------------------------


def _triangles_brute_force(baskets):
    """Edges = part pairs sharing >= 2 baskets; per-node triangle counts;
    top-15 by (count DESC, node) — the registered row's exact contract."""
    from collections import Counter
    from itertools import combinations

    pair_support = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(set(parts)), 2):
            pair_support[(a, b)] += 1
    edges = {p for p, s in pair_support.items() if s >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c once per triangle
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    ranked = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    return [(node, n) for node, n in ranked]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_graph_triangles_random_cross_check(spark, tmp_path, seed):
    """Random basket corpora (dense enough that support>=2 edges form
    real triangle structure, including hubs that stress the degree
    orientation) must match the brute-force per-node triangle count."""
    import random

    rng = random.Random(seed)
    n_parts, n_orders = 30, 120
    baskets = {
        ok: [rng.randrange(n_parts) for _ in range(rng.randint(2, 6))]
        for ok in range(n_orders)
    }
    rows = [
        (ok, p)
        for ok, parts in baskets.items()
        for p in parts
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = [
        (r.node, r.n_triangles)
        for r in QUERIES["q_graph_triangles"](spark, d).collect()
    ]
    assert got == _triangles_brute_force(baskets)


# ---------------------------------------------------------------------------
# t_minhash_lsh_pairs: randomized cross-check against an independent
# Python reference (the DuckDB oracle mirrors the Spark construction;
# this is a third implementation from the written contract)
# ---------------------------------------------------------------------------


def _minhash_brute_force(texts, n_hashes=12, band_size=3):
    import hashlib
    from collections import defaultdict

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    sigs = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        if len(toks) < 3:
            continue  # no shingles -> no signature -> never a candidate
        shingles = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        sigs[doc_id] = [
            min(md5hex(f"{i}|{sh}") for sh in shingles)
            for i in range(n_hashes)
        ]
    buckets = defaultdict(list)
    for doc_id, mh in sorted(sigs.items()):
        for b in range(n_hashes // band_size):
            bsig = md5hex(",".join(mh[b * band_size : (b + 1) * band_size]))
            buckets[(b, bsig)].append(doc_id)
    shared = defaultdict(int)
    for (_b, _s), members in buckets.items():
        for i, a in enumerate(members):
            for c in members[i + 1 :]:
                shared[(min(a, c), max(a, c))] += 1
    out = []
    for (a, c), n_bands in sorted(shared.items()):
        n_eq = sum(x == y for x, y in zip(sigs[a], sigs[c]))
        out.append((a, c, n_bands, round(n_eq / n_hashes, 6)))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_minhash_lsh_random_cross_check(spark, tmp_path, seed):
    """Random corpora with exact duplicates and one-token-edit near-dups
    must produce the identical candidate-pair set, shared-band counts,
    and estimated Jaccard as the independent reference."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(18):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))
    # Exact duplicates and near-duplicates of existing docs.
    texts[100] = texts[0]
    texts[101] = texts[1]
    t2 = texts[2].split(" ")
    t2[len(t2) // 2] = "EDITED"
    texts[102] = " ".join(t2)
    texts[103] = texts[3] + " " + " ".join(texts[3].split(" ")[:5])
    d = _write_docs(
        spark,
        tmp_path,
        [(i, s, "en", "s") for i, s in sorted(texts.items())],
    )
    got = [
        (r.doc_a, r.doc_b, r.shared_bands, r.est_jaccard)
        for r in QUERIES["t_minhash_lsh_pairs"](spark, d).collect()
    ]
    want = _minhash_brute_force(texts)
    assert got == want
    # The planted exact dupes must be among the candidates at jaccard 1.
    pairs = {(a, b): (nb, ej) for a, b, nb, ej in got}
    assert pairs[(0, 100)] == (4, 1.0)
    assert pairs[(1, 101)] == (4, 1.0)


# ---------------------------------------------------------------------------
# q_graph_pagerank: randomized cross-check (third implementation beside
# the Spark loop and its unrolled-CTE oracle; pins the integer-unit
# arithmetic, floor divisions, dangling/left-join handling and tie-break)
# ---------------------------------------------------------------------------


def _pagerank_brute_force(baskets, iters=3, scale=10**12):
    from collections import Counter
    from itertools import combinations

    pair_support = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(set(parts)), 2):
            pair_support[(a, b)] += 1
    und = [p for p, s in pair_support.items() if s >= 2]
    edges = und + [(b, a) for a, b in und]
    deg = Counter(src for src, _ in edges)
    nodes = sorted(deg)
    n = len(nodes)
    if n == 0:
        return []
    rank = {x: scale // n for x in nodes}
    for _ in range(iters):
        inc = Counter()
        for src, dst in edges:
            inc[dst] += rank[src] // deg[src]
        rank = {
            x: (15 * scale) // (100 * n) + (85 * inc[x]) // 100
            for x in nodes
        }
    ranked = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    return [(part, r) for part, r in ranked]


@pytest.mark.parametrize("seed", [0, 1])
def test_graph_pagerank_random_cross_check(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    n_parts, n_orders = 25, 100
    baskets = {
        ok: [rng.randrange(n_parts) for _ in range(rng.randint(2, 6))]
        for ok in range(n_orders)
    }
    rows = [(ok, p) for ok, parts in baskets.items() for p in parts]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = [
        (r.part, r.rank_e12)
        for r in QUERIES["q_graph_pagerank"](spark, d).collect()
    ]
    assert got == _pagerank_brute_force(baskets)


# ---------------------------------------------------------------------------
# t_bpe_learn_merges: randomized cross-check (third implementation of
# the training contract beside the Spark loop and the unrolled-CTE
# oracle; pins overlapping pair counting, the lexicographic tie-break,
# and the greedy left-to-right merge fold)
# ---------------------------------------------------------------------------


def _bpe_brute_force(texts, n_merges=5):
    from collections import Counter

    vocab = Counter()
    for text in texts.values():
        for tok in text.split(" "):
            vocab[tok] += 1
    words = {tok: list(tok) for tok in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for tok, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[tok]
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, cnt))
        for tok, syms in words.items():
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            words[tok] = acc
    return merges


@pytest.mark.parametrize("seed", [0, 1])
def test_bpe_learn_random_cross_check(spark, tmp_path, seed):
    """Random corpora over a tiny alphabet (dense pair-count ties and
    runs like 'aaa' that exercise overlapping counting vs non-overlapping
    rewrite) must learn the identical merge sequence."""
    import random

    rng = random.Random(seed)
    texts = {
        i: " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 20))
        )
        for i in range(12)
    }
    d = _write_docs(
        spark,
        tmp_path,
        [(i, s, "en", "s") for i, s in sorted(texts.items())],
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in QUERIES["t_bpe_learn_merges"](spark, d).collect()
    ]
    assert got == _bpe_brute_force(texts)


# ---------------------------------------------------------------------------
# q_bfs_reachable_parts: randomized cross-check (min-depth BFS over the
# co-occurrence graph, depth cap 3, seeds = parts with id <= 3)
# ---------------------------------------------------------------------------


def _bfs_brute_force(baskets, seed_max=3, max_depth=3):
    from itertools import combinations

    adj: dict[int, set[int]] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(set(parts)), 2):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    all_parts = {p for parts in baskets.values() for p in parts}
    frontier = {p for p in all_parts if p <= seed_max}
    depth = {p: 0 for p in frontier}
    for d in range(1, max_depth + 1):
        nxt = set()
        for p in frontier:
            nxt |= adj.get(p, set())
        nxt -= depth.keys()
        for p in nxt:
            depth[p] = d
        frontier = nxt
    return sorted(depth.items())


@pytest.mark.parametrize("seed", [0, 1])
def test_bfs_reachable_random_cross_check(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    n_parts, n_orders = 40, 60  # sparse: some parts stay unreachable
    baskets = {
        ok: [rng.randrange(n_parts) for _ in range(rng.randint(1, 4))]
        for ok in range(n_orders)
    }
    rows = [(ok, p) for ok, parts in baskets.items() for p in parts]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = [
        (r.part_id, r.depth)
        for r in QUERIES["q_bfs_reachable_parts"](spark, d).collect()
    ]
    assert got == _bfs_brute_force(baskets)


# ---------------------------------------------------------------------------
# t_cdc_chunk_dedup + t_simhash_fingerprint: randomized cross-checks
# (both algorithms are authored on BOTH engine sides — the remaining
# same-author rows without an independent third implementation)
# ---------------------------------------------------------------------------


def _cdc_brute_force(texts, w=4):
    import hashlib
    from collections import defaultdict

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    chunks_by_doc = {}
    for doc_id, text in sorted(texts.items()):
        toks = text.split(" ")
        n = len(toks)
        bounds = (
            [
                p
                for p in range(2, n - w + 2)  # sequence(2, n - w + 1)
                if md5hex(" ".join(toks[p - 1 : p - 1 + w]))[0] < "2"
            ]
            if n >= w + 1
            else []
        )
        starts = [1] + bounds
        ends = [b - 1 for b in bounds] + [n]
        chunks_by_doc[doc_id] = [
            (md5hex(" ".join(toks[s - 1 : e])), e - s + 1)
            for s, e in zip(starts, ends)
        ]
    docs_per_digest = defaultdict(set)
    for doc_id, chunks in chunks_by_doc.items():
        for h, _sz in chunks:
            docs_per_digest[h].add(doc_id)
    out = []
    for doc_id, chunks in sorted(chunks_by_doc.items()):
        n = len(texts[doc_id].split(" "))
        dup = [(h, sz) for h, sz in chunks if len(docs_per_digest[h]) >= 2]
        dup_tokens = sum(sz for _h, sz in dup)
        out.append(
            (
                doc_id,
                n,
                len(chunks),
                len(dup),
                dup_tokens,
                round(dup_tokens / n, 6),
            )
        )
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_cdc_chunk_dedup_random_cross_check(spark, tmp_path, seed):
    """Random corpora where several docs embed the same ~20-token run at
    DIFFERENT offsets: content-defined boundaries must re-synchronize so
    the shared run dedups despite the shift — checked against a
    from-scratch chunker."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(20))
    texts = {}
    for i in range(14):
        body = [rng.choice(vocab) for _ in range(rng.randint(6, 40))]
        if i % 3 == 0:  # plant the shared run at a doc-specific offset
            at = rng.randint(0, len(body))
            body = body[:at] + shared.split(" ") + body[at:]
        texts[i] = " ".join(body)
    d = _write_docs(
        spark,
        tmp_path,
        [(i, s, "en", "s") for i, s in sorted(texts.items())],
    )
    got = [
        tuple(r) for r in QUERIES["t_cdc_chunk_dedup"](spark, d).collect()
    ]
    want = _cdc_brute_force(texts)
    assert got == want
    # CDC's defining property actually fired: some doc has duplicated
    # chunks even though every planted offset differs.
    assert any(row[3] > 0 for row in got)


def _simhash_brute_force(texts, bits=60):
    import hashlib

    def hex60(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return sum(int(h[p], 16) << (4 * p) for p in range(15))

    out = []
    for doc_id, text in sorted(texts.items()):
        toks = text.split(" ")
        sig = 0
        for j in range(bits):
            s = sum(1 if (hex60(t) >> j) & 1 else -1 for t in toks)
            if s > 0:
                sig |= 1 << j
        out.append((doc_id, sig))
    return out


def test_simhash_random_cross_check(spark, tmp_path):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
        for i in range(12)
    }
    d = _write_docs(
        spark,
        tmp_path,
        [(i, s, "en", "s") for i, s in sorted(texts.items())],
    )
    got = [
        (r.doc_id, r.simhash)
        for r in QUERIES["t_simhash_fingerprint"](spark, d).collect()
    ]
    assert got == _simhash_brute_force(texts)

def test_registered_winnow_row_subset_of_stride1(spark):
    """The round-9 registered t_exact_substring_spans_winnow row must
    honor the subset guarantee on the REAL shipped corpus: every
    sampled-anchor span lies inside some stride-1 exact span of the
    registered t_exact_substring_spans row (anchors are a subset, so a
    winnow span can never leave an exact repeat region), with identical
    schema."""
    import __spark_entry__ as entrymod

    from tests.conftest import SF_SMALL

    qs = entrymod.queries()
    win_df = qs["t_exact_substring_spans_winnow"](spark, SF_SMALL)
    exact_df = qs["t_exact_substring_spans"](spark, SF_SMALL)
    assert win_df.schema == exact_df.schema
    exact = [tuple(r) for r in exact_df.collect()]
    spans = [tuple(r) for r in win_df.collect()]
    assert spans, "winnow row found no spans on the shipped corpus"
    for doc_id, s, e, _ln in spans:
        assert any(
            xd == doc_id and xs <= s and e <= xe for xd, xs, xe, _ in exact
        ), (doc_id, s, e)
