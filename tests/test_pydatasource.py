"""Custom Python DataSource (Spark 4 extension point): determinism,
partitioning, and downstream-operator compatibility."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from culvert_spark import pydatasource


@pytest.fixture(scope="module")
def synth(spark):
    pydatasource.register(spark)
    return spark.read.format("culvert_synth").option("rows", 200).option(
        "parts", 4
    )


def test_row_count_and_schema(spark, synth):
    df = synth.load()
    assert df.count() == 200
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]


def test_partition_fanout(spark, synth):
    """partitions() shards the id space: 4 requested shards → 4 tasks,
    each generating only its slice (no driver-side materialization)."""
    df = synth.load()
    assert df.rdd.getNumPartitions() == 4


def test_deterministic_across_reads(spark, synth):
    a = sorted(tuple(r) for r in synth.load().collect())
    b = sorted(tuple(r) for r in synth.load().collect())
    assert a == b
    # Pure function of doc_id: spot-check against the generator directly.
    expected = pydatasource._doc_row(7)
    got = next(r for r in a if r[0] == 7)
    assert tuple(got) == expected


def test_n_chars_consistent(spark, synth):
    bad = synth.load().filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_downstream_operator_compat(spark, synth):
    """The connector's frame feeds the same operators as the parquet
    documents table: whitespace tokenization + per-lang stats run
    unchanged."""
    df = synth.load()
    stats = (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("tokens"),
        )
        .collect()
    )
    assert sum(r["n_docs"] for r in stats) == 200
    assert all(r["tokens"] > 0 for r in stats)


def test_stream_reader_micro_batches(spark, tmp_path):
    """readStream through the connector: the offset advances one
    rows_per_batch per trigger (a rate-limited source), so draining
    max_rows=120 at 40 rows/batch takes >= 3 micro-batches; rows are the
    same deterministic ids as the batch reader and the offset log
    checkpoints plain-dict offsets."""
    import time

    pydatasource.register(spark)
    q = (
        spark.readStream.format("culvert_synth")
        .option("rows_per_batch", 40)
        .option("max_rows", 120)
        .option("parts", 2)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM synth_stream").first()["c"] >= 120:
                break
            time.sleep(0.5)
        rows = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM synth_stream").collect()
        )
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert len(rows) == 120
    assert [r[0] for r in rows] == list(range(120))
    assert tuple(rows[7]) == pydatasource._doc_row(7)
    assert n_batches >= 3, "rate-limited source must take multiple batches"


def test_stream_writer_two_phase_commit(spark, tmp_path):
    """Custom Python streaming SINK: every committed micro-batch appears
    atomically (commit-log line + renamed files, no _tmp leftovers), and
    the union of committed files holds exactly the streamed rows."""
    import json
    import os

    pydatasource.register(spark)
    out = str(tmp_path / "jsonl_sink")
    os.makedirs(out)
    q = (
        spark.readStream.format("culvert_synth")
        .option("rows_per_batch", 50)
        .option("max_rows", 150)
        .option("parts", 2)
        .load()
        .writeStream.format("culvert_jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        def committed_rows():
            log = os.path.join(out, "_commits.jsonl")
            if not os.path.exists(log):
                return 0
            with open(log) as fh:
                return sum(
                    sum(f["rows"] for f in json.loads(line)["files"])
                    for line in fh
                )
        while time.time() < deadline and committed_rows() < 150:
            time.sleep(0.5)
    finally:
        q.stop()

    with open(os.path.join(out, "_commits.jsonl")) as fh:
        commits = [json.loads(line) for line in fh]
    assert sum(sum(f["rows"] for f in c["files"]) for c in commits) == 150
    assert len(commits) >= 3, "expected one commit per micro-batch"
    # Every logged file exists; no uncommitted temp files linger.
    ids = []
    for c in commits:
        for f in c["files"]:
            p = os.path.join(out, f["file"])
            assert os.path.exists(p)
            with open(p) as fh:
                ids.extend(json.loads(line)["doc_id"] for line in fh)
    assert sorted(ids) == list(range(150))
    assert os.listdir(os.path.join(out, "_tmp")) == []


def test_stream_writer_replayed_batch_commits_once(tmp_path):
    """A batch REPLAYED after restart (offsets-log entry without a
    commits-log entry, but the sink's own commit already landed) must be
    a no-op: one _commits.jsonl line per batchId, no duplicate delivery,
    and the replay's temp files cleaned up. Driver-side logic only — no
    Spark session needed."""
    import json
    import os

    out = str(tmp_path / "sink")
    os.makedirs(os.path.join(out, "_tmp"))
    writer = pydatasource.JsonlSinkWriter({"path": out})

    def staged(name, rows):
        p = os.path.join(out, "_tmp", name)
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps({"doc_id": r}) + "\n")
        return pydatasource._FileCommit(path=p, rows=len(rows))

    writer.commit([staged("part-0-aa.jsonl", [0, 1])], batchId=0)
    # Restart replays batch 0: new temp files, same batchId.
    writer.commit([staged("part-0-bb.jsonl", [0, 1])], batchId=0)
    writer.commit([staged("part-0-cc.jsonl", [2])], batchId=1)

    with open(os.path.join(out, "_commits.jsonl")) as fh:
        commits = [json.loads(line) for line in fh]
    assert [c["batch"] for c in commits] == [0, 1]
    ids = []
    for c in commits:
        for f in c["files"]:
            with open(os.path.join(out, f["file"])) as fh:
                ids.extend(json.loads(line)["doc_id"] for line in fh)
    assert sorted(ids) == [0, 1, 2]
    assert os.listdir(os.path.join(out, "_tmp")) == []
