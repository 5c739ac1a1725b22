"""WARC crawl archives as a first-class Spark connector (custom Python
DataSource, the Spark 4 ``pyspark.sql.datasource`` extension point).

``warcops.py`` proved the crawl-ingest HOP (container → HTTP → HTML →
main text) over ``binaryFile``-shaped inputs; this module makes the
container a CONNECTOR, so a crawl directory is readable with
``spark.read.format("culvert_warc")`` / ``spark.readStream`` like any
other source — the round-11 verdict's first-choice staging target.

1. **Batch** (`WarcReader`): ``option("path", dir)`` [+ ``glob``] —
   the driver lists the directory once and plans ONE input partition
   per archive file (crawl archives ship as ~1 GB files; the file IS
   the input split — same posture as the binaryFile path,
   SURVEY §9). Each task opens only its archive, walks records
   member-at-a-time (peak memory = one inflated member) and emits one
   row per HTTP-200 ``text/html`` response: ``(archive, page_no,
   target_uri, html)``. Extraction stays a downstream operator
   (``htmlops.html_doc_stats``) — the connector's job is faithful
   page delivery, so the html column is the response body VERBATIM
   (after the transfer/content-encoding layers, which are framing,
   not content).
2. **Stream** (`WarcStreamReader`): a live crawl directory. The
   offset is a lexicographic filename WATERMARK — one string in the
   checkpoint log, not an unbounded processed-file ledger — and each
   trigger processes exactly the files named ABOVE the previous
   watermark. The contract is MONOTONIC ARCHIVE NAMING (new files
   sort after processed ones), which is how crawl tooling names
   segment files (timestamp/sequence prefixes); a file that arrives
   sorting below the watermark is deliberately ignored (pinned by
   test) rather than risking double-processing on restart.
   ``read(partition)`` is a pure function of the file, so task
   retries are idempotent and Structured Streaming's exactly-once
   contract holds across restarts — pinned by the restart test, and
   composable with the two-phase-commit JSONL sink
   (``pydatasource.JsonlSinkDataSource``) for an end-to-end
   crawl-to-committed-files pipeline. The committed watermark is
   additionally DURABLE: ``commit`` writes it to a one-string ledger
   sidecar (default ``_culvert_watermark`` beside the archives;
   ``option("ledger", path|"off")``) that fresh instances seed from,
   so a restart against a transiently empty listing can never emit a
   regressed offset (see the ``WarcStreamReader`` docstring).

Scale notes (100 TB): ``partitions()`` returns one shard per archive;
workers fetch only their file (the driver never reads payload bytes —
it lists names). Python DataSources run in Python workers (Arrow-
batched but the slow path vs a JVM scan); they are the extensibility
story for sources with no JVM connector — crawl buckets with custom
auth, in-house storage — not a parquet replacement. The stream
reader's driver state is ONE filename (the watermark); a directory
listing per trigger is the same cost class as Spark's own file
source, and a real deployment would swap ``_list_archives`` for an
object-store listing with the same monotonic-key contract.

Reference scope: prasanthj/culvert has no WARC/connector surface
(SURVEY §0); this extends the crawl-ingest family mandated by the
build brief (ISO 28500 via ``warcops``).

Staged in round 12 for a round-13/14 registration slot (the round-12
window is fully allocated — see ``__spark_entry__.py``): the staged
rows below (``warc_source_pages`` / ``warc_stream_replay``) have
constant-folding oracles over the shared html design constants.
"""

from __future__ import annotations

import fnmatch
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_GLOB_DEFAULT = "*.warc*"

WARC_SOURCE_SCHEMA = (
    "archive string, page_no int, target_uri string, html string"
)


def _list_archives(path: str, pattern: str) -> list[str]:
    """Sorted archive names under ``path`` matching ``pattern``; an
    absent/empty directory is an EMPTY crawl, not an error (the
    forgiving-listing rule: a stream may start before its first
    archive lands). Names starting with ``_`` or ``.`` are metadata,
    never archives — the same convention Spark's own file source uses
    — so the stream's watermark LEDGER sidecar can live beside the
    archives without matching any glob."""
    try:
        names = os.listdir(path)
    except (FileNotFoundError, NotADirectoryError):
        return []
    return sorted(
        n
        for n in names
        if n[:1] not in ("_", ".") and fnmatch.fnmatch(n, pattern)
    )


class _ArchiveFile(InputPartition):
    """One archive file = one input partition (empty name = planning
    sentinel for a no-new-files micro-batch)."""

    def __init__(self, path: str, name: str):
        self.path = path
        self.name = name


def _read_archive(path: str, name: str):
    """(archive, page_no, target_uri, html) rows of one archive —
    executor-side; the warcops import happens here so only the file
    coordinates travel in the task closure."""
    from culvert_spark.warcops import warc_html_payloads

    with open(os.path.join(path, name), "rb") as fh:
        blob = fh.read()
    for i, (uri, html) in enumerate(warc_html_payloads(blob), start=1):
        yield (name, i, uri, html)


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.pattern = options.get("glob", _GLOB_DEFAULT)

    def partitions(self):
        names = _list_archives(self.path, self.pattern)
        if not names:
            return [_ArchiveFile(self.path, "")]  # empty crawl, 0 rows
        return [_ArchiveFile(self.path, n) for n in names]

    def read(self, partition: _ArchiveFile):
        if not partition.name:
            return
        yield from _read_archive(partition.path, partition.name)


class WarcStreamReader(DataSourceStreamReader):
    """Filename-watermark micro-batch reader (see the module
    docstring). Offsets are plain dicts (JSON'd into the checkpoint),
    carrying exactly one string.

    Regression guard (round-12 review, closed round 13): the reader
    cannot READ Spark's checkpoint, so after a restart a transiently
    empty/shrunken directory listing could make ``latestOffset``
    return a watermark BELOW the committed one; Spark would then plan
    an inverted batch and — were that regressed offset committed and
    the process killed again — redeliver everything once the listing
    recovered. Two layers close this:

    1. Instance guard: every offset the planner hands this instance
       (``partitions`` start/end, ``commit`` end) feeds a DELIVERED
       high-water mark, and ``partitions`` clamps its range's low end
       to it — an inverted batch is empty and the follow-up batch
       excludes everything at or below the recovered mark.
    2. Durable LEDGER (round-13, closing the former double-restart
       window): ``commit`` persists the committed watermark to a
       sidecar file (atomic tmp+rename) and a FRESH instance seeds
       its EMITTED mark from it (never the partitions clamp — a
       stale ledger must not out-rank the checkpoint's batch start),
       so ``latestOffset`` can never fall below
       the last committed watermark even when the first listing after
       a restart is empty — no regressed offset is ever emitted, and
       a crash at ANY point degrades to Spark's own checkpoint
       replay (the ledger is written only after the engine commits,
       so a lost write merely re-plans the committed batch's range,
       which the clamp then empties).

    Ledger location: ``option("ledger", path)`` names the file;
    default is ``_culvert_watermark`` BESIDE the archives (invisible
    to any glob — ``_``/``.``-prefixed names are metadata by the
    file-source convention); ``option("ledger", "off")`` disables
    persistence (reverting to the instance-level guard alone, e.g.
    for a read-only source directory — best-effort writes degrade
    the same way). Like Spark's checkpoint, one ledger serves ONE
    query: concurrent streams over the same directory should name
    distinct ledger paths."""

    def __init__(self, options):
        self.path = options["path"]
        self.pattern = options.get("glob", _GLOB_DEFAULT)
        ledger = options.get("ledger", "")
        if ledger == "off":
            self._ledger = None
        else:
            self._ledger = ledger or os.path.join(
                self.path, "_culvert_watermark"
            )
        # _mark: highest watermark this instance EMITS — seeded from
        # the durable ledger so a post-restart latestOffset can never
        # fall below the committed mark (the double-restart closure).
        # _delivered: highest offset the PLANNER handed this instance —
        # deliberately NOT seeded from the ledger: the partitions()
        # clamp must never exceed the checkpoint-recovered batch start,
        # or a stale/foreign ledger (two queries sharing a directory
        # against the documented contract) would silently SKIP files
        # the checkpoint still owes this query (round-13 review).
        self._mark = self._load_ledger()
        self._delivered = ""

    def _load_ledger(self) -> str:
        if not self._ledger:
            return ""
        try:
            with open(self._ledger, encoding="utf-8") as fh:
                mark = json.load(fh).get("watermark", "")
            return mark if isinstance(mark, str) else ""
        except (OSError, ValueError):
            return ""  # absent/corrupt ledger: instance guard only

    def _store_ledger(self, mark: str) -> None:
        if not self._ledger or not mark:
            return
        try:
            tmp = self._ledger + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump({"watermark": mark}, fh)
            os.replace(tmp, self._ledger)  # atomic on POSIX
        except OSError:
            pass  # read-only source dir: degrade to instance guard

    def initialOffset(self):
        # The engine calls this ONLY when the query has no checkpointed
        # offset — a NEW query, which supersedes any ledger a previous
        # query left over this directory (a RESTART recovers offsets
        # from the checkpoint and never lands here, so the ledger seed
        # above survives exactly the restart case it exists for).
        self._mark = ""
        self._delivered = ""
        if self._ledger:
            try:
                os.remove(self._ledger)
            except OSError:
                pass
        return {"watermark": ""}

    def latestOffset(self):
        names = _list_archives(self.path, self.pattern)
        # Monotonic high-water mark: a shrinking listing (archives
        # compacted/aged out) must never move the offset backwards,
        # and never below anything the planner already handed us.
        if names and names[-1] > self._mark:
            self._mark = names[-1]
        if self._delivered > self._mark:
            self._mark = self._delivered
        return {"watermark": self._mark}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["watermark"], end["watermark"]
        lo = max(lo, self._delivered)  # never re-plan delivered files
        names = [
            n
            for n in _list_archives(self.path, self.pattern)
            if lo < n <= hi
        ]
        self._delivered = max(self._delivered, lo, hi)
        if not names:
            return [_ArchiveFile(self.path, "")]
        return [_ArchiveFile(self.path, n) for n in names]

    def read(self, partition: _ArchiveFile):
        if not partition.name:
            return
        yield from _read_archive(partition.path, partition.name)

    def commit(self, end: dict) -> None:
        # nothing to clean (archives are the upstream's to manage);
        # fold the committed offset into the delivered mark and make
        # it durable so the NEXT process starts at or above it.
        self._delivered = max(self._delivered, end["watermark"])
        self._store_ledger(self._delivered)


class WarcDataSource(DataSource):
    """``format("culvert_warc")`` — register with
    ``spark.dataSource.register(WarcDataSource)``. Batch and
    micro-batch stream over a directory of ``.warc`` / ``.warc.gz``
    files."""

    @classmethod
    def name(cls) -> str:
        return "culvert_warc"

    def schema(self) -> str:
        return WARC_SOURCE_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the WARC connector."""
    spark.dataSource.register(WarcDataSource)


# ---------------------------------------------------------------------------
# Design-exact fixture + staged oracles (round-13/14 registration
# candidates; NOT registered in round 12 — the window is allocated)
# ---------------------------------------------------------------------------

#: The fixture DIRECTORY mirrors warcops.warc_corpus exactly — archive
#: 0 raw WARC (first _WARC_SPLIT html design docs), archive 1
#: member-per-record .warc.gz (the rest, cycling the HTTP body
#: encodings) — under MONOTONIC names, so one oracle serves the
#: binaryFile row, the connector batch row, and the stream replay.
_WS_NAMES = ["crawl-00000.warc", "crawl-00001.warc.gz"]


def write_warc_fixture(path: str) -> list[str]:
    """Write the two fixture archives into ``path``; returns names."""
    from culvert_spark.warcops import (
        _HTML_DOCS,
        _WARC_BODY_ENCODINGS,
        _WARC_SPLIT,
        _warc_pages,
        encode_warc,
        encode_warc_gz,
    )

    blobs = [
        encode_warc(_warc_pages(_HTML_DOCS[:_WARC_SPLIT])),
        encode_warc_gz(
            [
                (u, h, _WARC_BODY_ENCODINGS[i % len(_WARC_BODY_ENCODINGS)])
                for i, (u, h) in enumerate(
                    _warc_pages(_HTML_DOCS[_WARC_SPLIT:])
                )
            ]
        ),
    ]
    os.makedirs(path, exist_ok=True)
    for name, blob in zip(_WS_NAMES, blobs):
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(blob)
    return list(_WS_NAMES)


def warc_pages_oracle() -> str:
    """Constant-folding DuckDB oracle for the connector rows: every
    fixture page stated VERBATIM from the shared html design constants
    (the connector must deliver response bodies byte-faithfully; the
    chunked/gzip body encodings are framing, not content)."""
    from culvert_spark.warcops import _HTML_DOCS, _WARC_SPLIT, _warc_pages

    def q(s: str) -> str:  # SQL single-quote escaping (house rule)
        return s.replace("'", "''")

    rows = []
    for name, specs in zip(
        _WS_NAMES, (_HTML_DOCS[:_WARC_SPLIT], _HTML_DOCS[_WARC_SPLIT:])
    ):
        for i, (u, h) in enumerate(_warc_pages(specs), start=1):
            rows.append((name, i, u, h))
    vals = ",\n      ".join(
        f"('{q(a)}', {p}, '{q(u)}', '{q(h)}')" for a, p, u, h in rows
    )
    return f"""
    SELECT archive, CAST(page_no AS INT) AS page_no, target_uri, html
    FROM (VALUES
      {vals})
      AS t(archive, page_no, target_uri, html)
    ORDER BY archive, page_no
    """


def warc_source_pages(spark: SparkSession) -> DataFrame:
    """Staged row body (``pds_warc_pages``): fixture directory →
    connector batch read. The tempdir lives until session exit (the
    returned frame reads it lazily); it holds two KB-scale files."""
    import tempfile

    register(spark)
    d = tempfile.mkdtemp(prefix="culvert_warcsource_")
    write_warc_fixture(d)
    return (
        spark.read.format("culvert_warc")
        .option("path", d)
        .load()
        .orderBy("archive", "page_no")
    )


def warc_stream_replay(spark: SparkSession) -> DataFrame:
    """Staged row body (``pds_warc_stream``): the fixture replayed as
    a LIVE crawl — archive 0 exists at stream start, archive 1 lands
    mid-stream — so the registered row proves the watermark actually
    advances across triggers (not just a one-shot listing). The memory
    sink materializes, so the tempdirs are cleaned before return."""
    import shutil
    import tempfile
    import time

    register(spark)
    d = tempfile.mkdtemp(prefix="culvert_warcstream_")
    ck = tempfile.mkdtemp(prefix="culvert_warcstream_ck_")
    from culvert_spark.warcops import _HTML_DOCS, _WARC_SPLIT

    n_first = _WARC_SPLIT
    n_total = len(_HTML_DOCS)
    names = write_warc_fixture(d)
    second = os.path.join(d, names[1])
    # Stage archive 1 OUTSIDE the listing (a sibling subdirectory —
    # a suffixed sibling FILE would still match the *.warc* glob and
    # be picked up at start; live-tested) so only archive 0 is visible.
    staging = os.path.join(d, "staging")
    os.makedirs(staging)
    staged = os.path.join(staging, names[1])
    os.rename(second, staged)

    sink = "warc_stream_sink"
    spark.catalog.dropTempView(sink)
    q = (
        spark.readStream.format("culvert_warc")
        .option("path", d)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        deadline = time.time() + 180
        while (
            time.time() < deadline
            and spark.table(sink).count() < n_first
        ):
            time.sleep(0.5)
        os.rename(staged, second)  # archive 1 lands mid-stream
        while (
            time.time() < deadline
            and spark.table(sink).count() < n_total
        ):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(d, ignore_errors=True)
    return spark.table(sink).orderBy("archive", "page_no")
