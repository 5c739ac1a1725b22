"""WARC custom Python DataSource (culvert_spark.warcsource) — staged
round 12 for round-13/14 registration: batch partition planning, page
fidelity vs the html design constants, the staged DuckDB oracles,
filename-watermark streaming (live append, restart exactly-once, the
monotonic-naming contract), and composition with the two-phase-commit
JSONL sink."""

from __future__ import annotations

import json
import os
import time

import pytest

from culvert_spark import warcsource as W
from culvert_spark.htmlops import html_for_doc
from culvert_spark.warcops import _HTML_DOCS, _WARC_SPLIT


def _expected_pages() -> list[tuple]:
    rows = []
    for name, specs in zip(
        W._WS_NAMES, (_HTML_DOCS[:_WARC_SPLIT], _HTML_DOCS[_WARC_SPLIT:])
    ):
        for i, s in enumerate(specs, start=1):
            rows.append(
                (name, i, f"https://fixture.example/doc{s[0]}",
                 html_for_doc(*s))
            )
    return rows


@pytest.fixture()
def crawl_dir(spark, tmp_path):
    W.register(spark)
    d = str(tmp_path / "crawl")
    W.write_warc_fixture(d)
    return d


def test_batch_pages_match_design_verbatim(spark, crawl_dir):
    """The connector must deliver every HTTP-200 text/html page of both
    archive layouts BYTE-faithfully (chunked/gzip body encodings are
    framing, not content), with deterministic in-archive page order,
    and skip the noise records entirely."""
    got = [
        tuple(r)
        for r in spark.read.format("culvert_warc")
        .option("path", crawl_dir)
        .load()
        .orderBy("archive", "page_no")
        .collect()
    ]
    assert got == _expected_pages()


def test_one_partition_per_archive(spark, crawl_dir):
    """The file IS the input split (the 100 TB posture: a 1 GB crawl
    archive per task; the driver lists names, never payload bytes)."""
    df = spark.read.format("culvert_warc").option("path", crawl_dir).load()
    assert df.rdd.getNumPartitions() == 2


def test_batch_empty_directory_is_empty_table(spark, tmp_path):
    W.register(spark)
    d = str(tmp_path / "empty")
    os.makedirs(d)
    assert (
        spark.read.format("culvert_warc").option("path", d).load().count()
        == 0
    )


def test_glob_option_filters_archives(spark, crawl_dir):
    df = (
        spark.read.format("culvert_warc")
        .option("path", crawl_dir)
        .option("glob", "*.warc.gz")
        .load()
    )
    assert {r.archive for r in df.collect()} == {W._WS_NAMES[1]}


def test_malformed_archive_raises_with_offset(spark, tmp_path):
    """The warcops single-exception contract surfaces through the
    connector: a corrupt archive fails its task with the byte offset
    (quarantine-able), never silently drops records."""
    W.register(spark)
    d = str(tmp_path / "bad")
    os.makedirs(d)
    with open(os.path.join(d, "crawl-9.warc"), "wb") as fh:
        fh.write(b"NOTAWARC record garbage")
    with pytest.raises(Exception, match="WARC version line"):
        spark.read.format("culvert_warc").option("path", d).load().count()


def test_staged_batch_oracle_matches(spark):
    import duckdb

    spdf = W.warc_source_pages(spark).toPandas()
    ddf = duckdb.connect().execute(W.warc_pages_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_staged_stream_replay_matches_oracle(spark):
    """The live-append replay (archive 1 lands mid-stream) accumulates
    exactly the oracle's page set — the watermark advanced and nothing
    was duplicated or lost."""
    import duckdb

    spdf = W.warc_stream_replay(spark).toPandas()
    ddf = duckdb.connect().execute(W.warc_pages_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_stream_restart_exactly_once(spark, tmp_path):
    """Stop after archive 0, land archive 1, restart from the SAME
    checkpoint: the watermark offset resumes — archive 0 is not
    re-delivered, archive 1 arrives once. Driven through the
    two-phase-commit JSONL sink (the memory sink refuses checkpoint
    recovery), so the committed-file union is the exactly-once
    witness."""
    from culvert_spark import pydatasource

    W.register(spark)
    pydatasource.register(spark)
    d = str(tmp_path / "crawl")
    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    os.makedirs(out)
    names = W.write_warc_fixture(d)
    second = os.path.join(d, names[1])
    # a sibling subdirectory: a suffixed file would still match *.warc*
    staging = str(tmp_path / "staging")
    os.makedirs(staging)
    staged = os.path.join(staging, names[1])
    os.rename(second, staged)

    def start():
        return (
            spark.readStream.format("culvert_warc")
            .option("path", d)
            .load()
            .select("archive", "page_no", "target_uri")
            .writeStream.format("culvert_jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )

    def committed_keys() -> list[tuple]:
        log = os.path.join(out, "_commits.jsonl")
        if not os.path.exists(log):
            return []
        keys = []
        with open(log) as fh:
            for line in fh:
                for f in json.loads(line)["files"]:
                    with open(os.path.join(out, f["file"])) as data:
                        keys.extend(
                            (
                                json.loads(r)["archive"],
                                json.loads(r)["page_no"],
                            )
                            for r in data
                        )
        return keys

    q = start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and len(committed_keys()) < _WARC_SPLIT:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    assert len(committed_keys()) == _WARC_SPLIT

    os.rename(staged, second)
    q = start()
    try:
        deadline = time.time() + 120
        while (
            time.time() < deadline
            and len(committed_keys()) < len(_HTML_DOCS)
        ):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    # every page exactly ONCE across both runs: archive 0 was committed
    # before the stop and must not be re-delivered by the restart.
    assert sorted(committed_keys()) == sorted(
        (r[0], r[1]) for r in _expected_pages()
    )


def test_stream_ignores_non_monotonic_late_file(spark, tmp_path):
    """The documented contract: a file that arrives sorting BELOW the
    watermark is ignored (crawl naming is monotonic; re-processing
    risk outranks silent pickup). Pinned so the trade-off is explicit
    and a future change to a ledger-offset design must revisit it."""
    W.register(spark)
    d = str(tmp_path / "crawl")
    W.write_warc_fixture(d)
    sink = "warc_nonmono"
    q = (
        spark.readStream.format("culvert_warc")
        .option("path", d)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while (
            time.time() < deadline
            and spark.table(sink).count() < len(_HTML_DOCS)
        ):
            time.sleep(0.5)
        # sorts between the two processed names -> below the watermark
        from culvert_spark.warcops import _warc_pages, encode_warc

        late = os.path.join(d, "crawl-00000a.warc")
        with open(late, "wb") as fh:
            fh.write(encode_warc(_warc_pages(_HTML_DOCS[:1])))
        for _ in range(6):  # several triggers' worth of settle time
            time.sleep(0.5)
        assert spark.table(sink).count() == len(_HTML_DOCS)
    finally:
        q.stop()
        q.awaitTermination()


def test_stream_offset_never_regresses_after_restart(tmp_path):
    """Round-12 review: restart + transiently empty listing must not
    redeliver. Driven on the reader class directly (the sequence is a
    driver-side offset dance, no Spark needed): run A commits through
    archive 1; run B (fresh instance) sees an EMPTY listing first —
    Spark plans the inverted batch (committed, "") — then the listing
    recovers and the next batch ("", latest) must exclude everything
    already committed."""
    d = str(tmp_path / "crawl")
    names = W.write_warc_fixture(d)
    committed = {"watermark": names[-1]}

    # run B, fresh instance, directory transiently unreadable
    rb = W.WarcStreamReader({"path": str(tmp_path / "gone")})
    assert rb.latestOffset() == {"watermark": ""}  # regressed offset
    parts = rb.partitions(committed, {"watermark": ""})  # inverted batch
    assert [p.name for p in parts] == [""]  # empty sentinel, no re-read
    rb.commit({"watermark": ""})  # Spark commits the regressed offset

    # listing recovers (point the same instance at the real directory)
    rb.path = d
    assert rb.latestOffset() == committed  # clamped back up
    parts = rb.partitions({"watermark": ""}, committed)
    assert [p.name for p in parts] == [""], (
        "files at or below the recovered mark must not be re-planned"
    )
    # genuinely new archives after the mark still flow
    late = os.path.join(d, "crawl-00002.warc")
    from culvert_spark.warcops import _warc_pages, encode_warc

    with open(late, "wb") as fh:
        fh.write(encode_warc(_warc_pages(_HTML_DOCS[:1])))
    nxt = rb.latestOffset()
    assert nxt == {"watermark": "crawl-00002.warc"}
    parts = rb.partitions(committed, nxt)
    assert [p.name for p in parts] == ["crawl-00002.warc"]


def test_stream_double_restart_with_empty_listing_never_redelivers(tmp_path):
    """Round-12 verdict: the residual DOUBLE-restart window — run A
    commits through archive 1; run B (fresh instance) starts against a
    transiently EMPTY listing and is killed; run C starts after the
    listing recovers.  Without a durable mark, run B would emit and
    commit a regressed offset and run C would re-read everything.
    With the ledger, every fresh instance seeds from the last COMMITTED
    watermark, so no offset ever regresses and nothing is redelivered.
    Driven on the reader class directly (a driver-side offset dance)."""
    d = str(tmp_path / "crawl")
    names = W.write_warc_fixture(d)

    # run A: from scratch through both archives, committed
    ra = W.WarcStreamReader({"path": d})
    assert ra.initialOffset() == {"watermark": ""}
    end_a = ra.latestOffset()
    assert end_a == {"watermark": names[-1]}
    assert [p.name for p in ra.partitions({"watermark": ""}, end_a)] == names
    ra.commit(end_a)  # persists the ledger beside the archives
    assert os.path.exists(os.path.join(d, "_culvert_watermark"))
    # the ledger sidecar is metadata: invisible to every listing glob
    assert W._list_archives(d, "*") == names

    # run B: fresh process, archives transiently missing from the
    # listing (moved aside — e.g. a mount that came up empty)
    hidden = str(tmp_path / "hidden")
    os.makedirs(hidden)
    for n in names:
        os.rename(os.path.join(d, n), os.path.join(hidden, n))
    rb = W.WarcStreamReader({"path": d})
    # the durable mark wins over the empty listing: NO regressed offset
    assert rb.latestOffset() == end_a
    assert [p.name for p in rb.partitions(end_a, rb.latestOffset())] == [""]
    rb.commit(end_a)
    # run B dies here (instance discarded) — the poison commit of a
    # sub-committed offset can no longer happen

    # run C: fresh process, listing recovered + one genuinely new file
    for n in names:
        os.rename(os.path.join(hidden, n), os.path.join(d, n))
    late = os.path.join(d, "crawl-00002.warc")
    from culvert_spark.warcops import _warc_pages, encode_warc

    with open(late, "wb") as fh:
        fh.write(encode_warc(_warc_pages(_HTML_DOCS[:1])))
    rc = W.WarcStreamReader({"path": d})
    end_c = rc.latestOffset()
    assert end_c == {"watermark": "crawl-00002.warc"}
    assert [p.name for p in rc.partitions(end_a, end_c)] == [
        "crawl-00002.warc"
    ], "only the new archive flows; nothing committed is redelivered"


def test_stream_ledger_off_and_explicit_path(tmp_path):
    """option('ledger', 'off') reverts to the instance-only guard (no
    sidecar written); an explicit ledger path is honored and keeps the
    source directory untouched."""
    d = str(tmp_path / "crawl")
    names = W.write_warc_fixture(d)

    r_off = W.WarcStreamReader({"path": d, "ledger": "off"})
    end = r_off.latestOffset()
    r_off.commit(end)
    assert not os.path.exists(os.path.join(d, "_culvert_watermark"))
    # fresh instance with ledger off: no durable seed
    assert W.WarcStreamReader({"path": d, "ledger": "off"})._mark == ""

    led = str(tmp_path / "state" / "mark.json")
    os.makedirs(os.path.dirname(led))
    r_ex = W.WarcStreamReader({"path": d, "ledger": led})
    r_ex.commit(r_ex.latestOffset())
    assert os.path.exists(led)
    assert not os.path.exists(os.path.join(d, "_culvert_watermark"))
    # a fresh RESTART instance seeds from the explicit ledger...
    assert W.WarcStreamReader({"path": d, "ledger": led})._mark == names[-1]
    # ...but a NEW query (engine calls initialOffset: no checkpointed
    # offset exists) supersedes and clears it — fresh queries read all
    r_new = W.WarcStreamReader({"path": d, "ledger": led})
    assert r_new.initialOffset() == {"watermark": ""}
    assert not os.path.exists(led)
    assert r_new._mark == ""


def test_compose_with_two_phase_jsonl_sink(spark, tmp_path):
    """End-to-end crawl pipeline through BOTH custom connectors: WARC
    source -> main-content projection -> two-phase-commit JSONL sink;
    the committed files hold exactly the fixture's page keys and the
    commit log covers them atomically."""
    from pyspark.sql import functions as F

    from culvert_spark import pydatasource

    W.register(spark)
    pydatasource.register(spark)
    d = str(tmp_path / "crawl")
    W.write_warc_fixture(d)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    q = (
        spark.readStream.format("culvert_warc")
        .option("path", d)
        .load()
        .select("archive", "page_no", "target_uri",
                F.length("html").alias("n_html_chars"))
        .writeStream.format("culvert_jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120

        def committed_rows() -> int:
            log = os.path.join(out, "_commits.jsonl")
            if not os.path.exists(log):
                return 0
            with open(log) as fh:
                return sum(
                    sum(f["rows"] for f in json.loads(line)["files"])
                    for line in fh
                )

        while time.time() < deadline and committed_rows() < len(_HTML_DOCS):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()

    with open(os.path.join(out, "_commits.jsonl")) as fh:
        commits = [json.loads(line) for line in fh]
    keys = []
    for c in commits:
        for f in c["files"]:
            p = os.path.join(out, f["file"])
            assert os.path.exists(p)
            with open(p) as fh:
                for line in fh:
                    row = json.loads(line)
                    assert row["n_html_chars"] > 0
                    keys.append((row["archive"], row["page_no"]))
    assert sorted(keys) == sorted(
        (r[0], r[1]) for r in _expected_pages()
    )
    assert os.listdir(os.path.join(out, "_tmp")) == []


def test_connector_pages_feed_html_doc_stats(spark, crawl_dir):
    """The connector output composes with the registered extraction
    operator unchanged: key the pages, run html_doc_stats, and the
    stats equal the design expectations (the same truth the registered
    h_html_doc_stats row pins over html_corpus)."""
    from pyspark.sql import functions as F

    from culvert_spark.htmlops import _expected_doc, html_doc_stats

    pages = (
        spark.read.format("culvert_warc").option("path", crawl_dir).load()
    )
    keyed = pages.select(
        (
            F.when(F.col("archive") == W._WS_NAMES[0], 0)
            .otherwise(_WARC_SPLIT)
            + F.col("page_no") - 1
        ).cast("bigint").alias("doc_id"),
        "html",
    )
    got = {
        r.doc_id: (r.title, r.n_headings, r.n_links, r.n_tokens,
                   r.n_chars, r.text_digest)
        for r in html_doc_stats(keyed).collect()
    }
    want = {}
    for spec in _HTML_DOCS:
        e = _expected_doc(spec)
        want[e["doc_id"]] = (
            e["title"], e["n_headings"], e["n_links"], e["n_tokens"],
            e["n_chars"], e["text_digest"],
        )
    assert got == want
