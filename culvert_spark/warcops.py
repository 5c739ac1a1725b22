"""WARC (Web ARChive) reading: the container crawl corpora arrive in.

The HTML family (``htmlops``) extracts main content from markup; real
crawl data wraps that markup in WARC — the ISO 28500 / WARC 1.1
public format every Common-Crawl-style pipeline ingests. This module
reads it from scratch on the stdlib:

1. **Writer** (fixture generation, ``encode_warc``): valid WARC/1.1 —
   a ``warcinfo`` record, then per page a ``request`` record (which a
   reader must SKIP) and a ``response`` record whose block is an
   HTTP/1.1 response (status line + headers + HTML body), records
   separated by the mandated CRLF CRLF, ``Content-Length`` exact. The
   standard ``.warc.gz`` layout — each record its OWN gzip member, so
   a reader can split work without decompressing the whole file — is
   written by ``encode_warc_gz``.
2. **Reader** (production path): ``iter_warc_records`` walks records
   from raw bytes (multi-member gzip transparently: stdlib zlib with
   the gzip wbits, resuming at ``unused_data``), parses the WARC
   header block (version line + colon-separated named fields), reads
   exactly ``Content-Length`` payload bytes, and never trusts
   record order; ``warc_html_payloads`` filters to ``response``
   records with an HTTP 200 + text/html payload, splits the HTTP
   header from the body, and yields (target_uri, html).
3. **Operator** (``warc_doc_stats``): one narrow ``mapInPandas`` over
   (warc_id, payload binary) — container split -> HTTP split ->
   ``htmlops.extract_html`` -> one stats row PER PAGE with its target
   URI: the full crawl-ingest hop (container -> markup -> main text)
   in a single pass, feeding the same digest/dedup columns as
   ``html_doc_stats``.

Scale posture (100 TB): WARC files are the natural input split (read
with ``binaryFile`` or a custom DataSource at one file per task —
crawl archives ship as ~1 GB members); record walking, gunzip and
extraction are row-local, so nothing shuffles until whatever
aggregate the caller adds. Malformed records raise per-FILE with the
offending offset (a crawl pipeline quarantines bad members rather
than silently skipping).

Design-exact fixture + constant-folding oracle (``warc_corpus`` /
``warc_stats_oracle``) follow the house pattern: pages are the
``htmlops`` design documents, so the expected values are shared
constants, and request/warcinfo/non-HTML records prove the reader's
filtering. Staged in round 11 for a later registration slot.

Reference scope: prasanthj/culvert has no crawl surface (SURVEY §0);
this extends the training-data document family mandated by the build
brief.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from culvert_spark.htmlops import _HTML_DOCS, _expected_doc, html_for_doc

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Writer (fixture generation)
# ---------------------------------------------------------------------------


def _warc_record(rec_type: str, fields: dict[str, str],
                 block: bytes) -> bytes:
    hdr = [b"WARC/1.1",
           f"WARC-Type: {rec_type}".encode("latin-1")]
    hdr += [f"{k}: {v}".encode("latin-1") for k, v in fields.items()]
    hdr.append(b"Content-Length: %d" % len(block))
    return (
        _CRLF.join(hdr) + _CRLF + _CRLF + block + _CRLF + _CRLF
    )


def _http_response(html: str, status: int = 200,
                   ctype: str = "text/html; charset=utf-8",
                   body_encoding: str = "identity") -> bytes:
    """An HTTP/1.1 response block. ``body_encoding`` exercises the
    decoder paths real crawls hit: ``chunked`` (Transfer-Encoding
    framing, body split into two chunks) and ``gzip``
    (Content-Encoding) — both value-INVARIANT for extraction, like
    compression in the PDF fixtures."""
    body = html.encode("utf-8")
    extra = b""
    if body_encoding == "chunked":
        mid = max(1, len(body) // 2)
        body = (
            b"%x\r\n" % mid + body[:mid] + b"\r\n"
            + b"%x\r\n" % (len(body) - mid) + body[mid:] + b"\r\n"
            + b"0\r\n\r\n"
        )
        extra = b"Transfer-Encoding: chunked\r\n"
    elif body_encoding == "gzip":
        body = gzip.compress(body)
        extra = b"Content-Encoding: gzip\r\n"
    elif body_encoding != "identity":
        raise ValueError(f"unknown body_encoding {body_encoding!r}")
    # RFC 7230 §3.3.2: a sender MUST NOT send Content-Length together
    # with Transfer-Encoding — chunked framing is self-delimiting
    # (round-11 review; the WARC reader frames by the WARC-level
    # Content-Length either way, but the fixture claims validity).
    clen = (b"" if body_encoding == "chunked"
            else b"Content-Length: %d\r\n" % len(body))
    return (
        b"HTTP/1.1 %d %s\r\n" % (status, b"OK" if status == 200 else b"ERR")
        + b"Content-Type: %s\r\n" % ctype.encode("latin-1")
        + extra
        + clen
        + b"\r\n"
        + body
    )


def encode_warc(pages: list[tuple[str, str]],
                include_noise: bool = True) -> bytes:
    """A valid WARC/1.1 file: warcinfo, then (request, response) per
    (uri, html) page. ``include_noise`` adds the record types and
    payloads a reader must SKIP — a request record per page, plus one
    non-HTML (image/png) and one HTTP-404 response at the end."""
    out = bytearray()
    out += _warc_record(
        "warcinfo",
        {"WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
         "WARC-Date": "2026-01-01T00:00:00Z"},
        b"software: culvert_spark warcops fixture\r\n",
    )
    for i, page in enumerate(pages):
        uri, html = page[0], page[1]
        body_encoding = page[2] if len(page) > 2 else "identity"
        if include_noise:
            out += _warc_record(
                "request",
                {"WARC-Target-URI": uri,
                 "WARC-Record-ID": f"<urn:uuid:req-{i}>",
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
            )
        out += _warc_record(
            "response",
            {"WARC-Target-URI": uri,
             "WARC-Record-ID": f"<urn:uuid:resp-{i}>",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            _http_response(html, body_encoding=body_encoding),
        )
    if include_noise:
        out += _warc_record(
            "response",
            {"WARC-Target-URI": "https://noise.example/logo",
             "WARC-Record-ID": "<urn:uuid:resp-png>",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            _http_response("\x89PNGnotreallyhtml", ctype="image/png"),
        )
        out += _warc_record(
            "response",
            {"WARC-Target-URI": "https://noise.example/gone",
             "WARC-Record-ID": "<urn:uuid:resp-404>",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            _http_response("<p>not found</p>", status=404),
        )
    return bytes(out)


def encode_warc_gz(pages: list[tuple[str, str]],
                   include_noise: bool = True) -> bytes:
    """The standard ``.warc.gz`` member-per-record layout: every record
    is its own gzip member, concatenated — the property that lets a
    reader split/seek without inflating the whole archive."""
    raw = encode_warc(pages, include_noise=include_noise)
    out = bytearray()
    for rec in _split_raw_records(raw):
        out += gzip.compress(rec)
    return bytes(out)


def _split_raw_records(data: bytes) -> list[bytes]:
    """Record byte-spans of an UNCOMPRESSED WARC (writer-side helper
    for the member-per-record gz layout)."""
    spans = []
    pos = 0
    for _, _, _, end in _walk_records(data):
        spans.append(data[pos:end])
        pos = end
    return spans


# ---------------------------------------------------------------------------
# Reader (production path)
# ---------------------------------------------------------------------------


def _iter_gunzip_members(data: bytes) -> Iterator[bytes]:
    """Inflate a multi-member gzip stream ONE MEMBER AT A TIME (the
    point of the member-per-record layout: peak memory is one inflated
    member, not the whole archive — self-review); passthrough for
    uncompressed input. Corrupt members re-raise as ValueError with
    the member's byte offset so a crawl pipeline can quarantine by the
    module's single documented exception type."""
    if not data.startswith(b"\x1f\x8b"):
        yield data
        return
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        at = len(data) - len(rest)
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(rest) + d.flush()
        except zlib.error as exc:
            raise ValueError(
                f"corrupt gzip member at offset {at}: {exc}"
            ) from exc
        yield member
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise ValueError(
            f"trailing non-gzip bytes after member at offset "
            f"{len(data) - len(rest)}"
        )


def _walk_records(data: bytes):
    """Yield (headers dict, block start, block length, record end) for
    each WARC record; raises ValueError with the offset on malformed
    input (incl. truncation mid-header — self-review: str.index used
    to surface an offset-less 'subsection not found')."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC version line at byte {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"truncated WARC header at byte {pos}")
        lines = data[pos:hdr_end].split(_CRLF)
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"record at byte {pos} lacks Content-Length")
        block_start = hdr_end + 4
        rec_end = block_start + length + 4  # block + CRLF CRLF
        if rec_end > n or data[rec_end - 4 : rec_end] != _CRLF + _CRLF:
            raise ValueError(
                f"record at byte {pos} truncated or not terminated "
                "by CRLFCRLF"
            )
        yield fields, block_start, length, rec_end
        pos = rec_end


def iter_warc_records(data: bytes):
    """(fields, block bytes) per record, gunzipping ``.warc.gz``
    member streams transparently — member at a time, so peak memory is
    one inflated member plus the (already in-memory) compressed
    payload; an UNCOMPRESSED archive is walked in place. A member may
    legally hold several records (writers vary); each is walked."""
    for member in _iter_gunzip_members(data):
        for fields, start, length, _ in _walk_records(member):
            yield fields, member[start : start + length]


def _dechunk(body: bytes) -> bytes | None:
    """Decode HTTP/1.1 chunked transfer framing; None if malformed."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        try:
            size = int(body[pos:eol].split(b";")[0], 16)  # ext ignored
        except ValueError:
            return None
        if size == 0:
            return bytes(out)
        start = eol + 2
        out += body[start : start + size]
        pos = start + size + 2  # chunk + CRLF
        if pos > len(body):
            return None


def _decode_http_body(hdr_lines: list[str], body: bytes) -> bytes | None:
    """Undo the HTTP layerings real crawls store verbatim —
    Transfer-Encoding: chunked, then Content-Encoding gzip/deflate
    (self-review: passing them through produced chunk-framing noise
    or mojibake with a bogus dedup digest, silently). Returns None —
    record SKIPPED, like non-HTML content — for encodings this reader
    does not implement (br, zstd, ...)."""
    te = ce = ""
    for line in hdr_lines:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k == "transfer-encoding":
            te = v.strip().lower()
        elif k == "content-encoding":
            ce = v.strip().lower()
    if te:
        if te != "chunked":
            return None
        body = _dechunk(body)
        if body is None:
            return None
    if ce in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, zlib.error):
            return None
    elif ce == "deflate":
        try:  # zlib-wrapped first, raw-deflate fallback (both occur)
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, wbits=-zlib.MAX_WBITS)
            except zlib.error:
                return None
    elif ce not in ("", "identity"):
        return None
    return body


def warc_html_payloads(data: bytes) -> Iterator[tuple[str, str]]:
    """(target_uri, html) for every HTTP-200 text/html RESPONSE record
    — request/warcinfo/metadata records, non-HTML content types,
    non-200 statuses and undecodable body encodings are skipped (the
    crawl-ingest contract). A GENERATOR: pages stream out as records
    are walked (self-review: the list form held every page of an
    archive at once)."""
    for fields, block in iter_warc_records(data):
        if fields.get("warc-type") != "response":
            continue
        split = block.find(b"\r\n\r\n")
        if split < 0:
            continue  # not an HTTP block
        http_hdr = block[:split].decode("latin-1", "replace")
        status_line, *hdr_lines = http_hdr.split("\r\n")
        parts = status_line.split()
        if len(parts) < 2 or parts[1] != "200":
            continue
        ctype = ""
        for line in hdr_lines:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip().lower()
        if not ctype.startswith("text/html"):
            continue
        body = _decode_http_body(hdr_lines, block[split + 4 :])
        if body is None:
            continue
        yield (fields.get("warc-target-uri", ""),
               body.decode("utf-8", "replace"))


WARC_STATS_SCHEMA = (
    "warc_id bigint, page_no int, target_uri string, title string, "
    "n_headings int, n_links int, n_tokens int, n_chars int, "
    "text_digest string"
)


def warc_doc_stats(archives: DataFrame) -> DataFrame:
    """The crawl-ingest hop in ONE narrow pass: (warc_id, payload
    binary) -> record walk (+ member gunzip) -> HTTP split -> HTML
    main-content extraction -> one row per page with its target URI
    and the html_doc_stats columns (incl. the md5 dedup digest).
    page_no is the in-archive response order, making the row set
    deterministic. No shuffle — WARC members are the input split."""
    from culvert_spark.htmlops import extract_html

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for wid, payload in zip(pdf["warc_id"], pdf["payload"]):
                # null payload (failed fetch upstream) = empty archive,
                # not a bytes(None) TypeError (self-review; the htmlops
                # null rule applied to the container layer).
                blob = bytes(payload) if payload is not None else b""
                for i, (uri, html) in enumerate(
                    warc_html_payloads(blob), start=1
                ):
                    e = extract_html(html)
                    rows.append({
                        "warc_id": int(wid), "page_no": i,
                        "target_uri": uri,
                        "title": e["title"],
                        "n_headings": e["n_headings"],
                        "n_links": len(e["links"]),
                        "n_tokens": e["n_tokens"],
                        "n_chars": e["n_chars"],
                        "text_digest": e["text_digest"],
                    })
            yield pd.DataFrame(
                rows,
                columns=["warc_id", "page_no", "target_uri", "title",
                         "n_headings", "n_links", "n_tokens", "n_chars",
                         "text_digest"],
            )

    return archives.mapInPandas(extract, WARC_STATS_SCHEMA).orderBy(
        "warc_id", "page_no"
    )


# ---------------------------------------------------------------------------
# Design-exact fixture (registration candidate)
# ---------------------------------------------------------------------------

#: Fixture DESIGN: archive 0 is UNCOMPRESSED WARC holding the first 3
#: html design docs; archive 1 is member-per-record .warc.gz holding
#: the other 3 — both with the full noise complement (request records,
#: a non-HTML response, a 404), so the registered row proves record
#: filtering AND both compression layouts through one oracle.
_WARC_SPLIT = 3


def _warc_pages(specs) -> list[tuple[str, str]]:
    return [
        (f"https://fixture.example/doc{s[0]}", html_for_doc(*s))
        for s in specs
    ]


#: Archive 1's pages cycle the HTTP body encodings real crawls store
#: verbatim — chunked transfer framing, Content-Encoding gzip, plain —
#: all value-INVARIANT for extraction, so the one oracle also proves
#: the HTTP decode layer (self-review: it used to go untested through
#: the registered surface).
_WARC_BODY_ENCODINGS = ["chunked", "gzip", "identity"]


def warc_corpus(spark: SparkSession) -> DataFrame:
    """(warc_id, payload) fixture frame (see the design note)."""
    a0 = encode_warc(_warc_pages(_HTML_DOCS[:_WARC_SPLIT]))
    a1 = encode_warc_gz(
        [
            (u, h, _WARC_BODY_ENCODINGS[i % len(_WARC_BODY_ENCODINGS)])
            for i, (u, h) in enumerate(_warc_pages(_HTML_DOCS[_WARC_SPLIT:]))
        ]
    )
    return spark.createDataFrame(
        [(0, bytearray(a0)), (1, bytearray(a1))],
        "warc_id bigint, payload binary",
    )


def _fixture_page_rows():
    """(warc_id, page_no, target_uri, expected-doc dict) for every
    fixture page — the ONE statement of the archive split / page
    numbering / URI convention that both oracle builders share
    (round-12 review: it used to be restated per builder)."""
    for wid, specs in ((0, _HTML_DOCS[:_WARC_SPLIT]),
                       (1, _HTML_DOCS[_WARC_SPLIT:])):
        for i, s in enumerate(specs, start=1):
            yield (wid, i, f"https://fixture.example/doc{s[0]}",
                   _expected_doc(s))


def warc_stats_oracle() -> str:
    """Constant-folding DuckDB oracle for ``warc_doc_stats`` over the
    fixture corpus: per-page expectations re-derived from the SHARED
    html design constants; the noise records contribute NO rows."""
    rows = [
        (wid, i, uri, e["title"], e["n_headings"], e["n_links"],
         e["n_tokens"], e["n_chars"], e["text_digest"])
        for wid, i, uri, e in _fixture_page_rows()
    ]
    def q(s: str) -> str:  # SQL single-quote escaping (house rule)
        return s.replace("'", "''")

    vals = ",\n      ".join(
        "({}, {}, '{}', '{}', {}, {}, {}, {}, '{}')".format(
            r[0], r[1], q(r[2]), q(r[3]), r[4], r[5], r[6], r[7], r[8]
        )
        for r in rows
    )
    return f"""
    SELECT CAST(warc_id AS BIGINT) AS warc_id,
           CAST(page_no AS INT) AS page_no, target_uri, title,
           CAST(n_headings AS INT) AS n_headings,
           CAST(n_links AS INT) AS n_links,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_chars AS INT) AS n_chars,
           text_digest
    FROM (VALUES
      {vals})
      AS t(warc_id, page_no, target_uri, title, n_headings, n_links,
           n_tokens, n_chars, text_digest)
    ORDER BY warc_id, page_no
    """


# ---------------------------------------------------------------------------
# Derived text archives (WET-convention conversion records) — the WRITE
# side of the crawl hop, staged round 12 for a r13/14 registration slot
# (w_wet_roundtrip)
# ---------------------------------------------------------------------------

_WET_DATE = "2026-01-01T00:00:00Z"


def encode_wet(pages: list[tuple[str, str]], source_name: str) -> bytes:
    """A derived-text archive in the WET convention (CommonCrawl's
    published derived format over ISO 28500 record types): one
    ``warcinfo`` record naming the source archive, then one
    ``conversion`` record per (target_uri, main_text) page —
    text/plain UTF-8 payload, deterministic record ids, the same CRLF
    discipline as ``_warc_record`` (so the production record walk
    reads it back byte-faithfully)."""
    out = bytearray()
    out += _warc_record(
        "warcinfo",
        {"WARC-Record-ID": f"<urn:uuid:wetinfo-{source_name}>",
         "WARC-Date": _WET_DATE,
         "WARC-Filename": f"{source_name}.wet"},
        (f"software: culvert_spark warcops WET writer\r\n"
         f"extractedFrom: {source_name}\r\n").encode("utf-8"),
    )
    for i, (uri, text) in enumerate(pages, start=1):
        out += _warc_record(
            "conversion",
            {"WARC-Target-URI": uri,
             "WARC-Record-ID": f"<urn:uuid:wet-{source_name}-{i}>",
             "WARC-Date": _WET_DATE,
             "Content-Type": "text/plain"},
            text.encode("utf-8"),
        )
    return bytes(out)


def warc_text_payloads(data: bytes):
    """(target_uri, text) per ``conversion`` record — the read side of
    the WET convention (warcinfo and any other record types skipped);
    transparent member-gzip via the shared record walk."""
    for fields, block in iter_warc_records(data):
        if fields.get("warc-type") != "conversion":
            continue
        yield (fields.get("warc-target-uri", ""),
               block.decode("utf-8", "replace"))


def warc_to_wet(archives: DataFrame) -> DataFrame:
    """(warc_id, wet) — each crawl archive row becomes ONE derived
    WET archive row: record walk -> HTML main-content extraction ->
    conversion records, all inside one narrow ``mapInPandas`` (the
    archive row is the unit of work on BOTH sides; no shuffle)."""
    from culvert_spark.htmlops import MainContentParser

    def main_text(html: str) -> str:
        # text-only extraction: extract_html also computes the md5
        # digest and token/char counts, which the WET writer discards
        # (wet_doc_stats re-derives them from the re-read bytes) —
        # wasted CPU in the parser-bound path (round-12 review).
        p = MainContentParser()
        p.feed(html)
        p.close()
        return p.main_text()

    def derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for wid, payload in zip(pdf["warc_id"], pdf["payload"]):
                blob = bytes(payload) if payload is not None else b""
                pages = [
                    (uri, main_text(html))
                    for uri, html in warc_html_payloads(blob)
                ]
                rows.append({
                    "warc_id": int(wid),
                    "wet": encode_wet(pages, f"warc-{int(wid)}"),
                })
            yield pd.DataFrame(rows, columns=["warc_id", "wet"])

    return archives.mapInPandas(derive, "warc_id bigint, wet binary")


WET_STATS_SCHEMA = (
    "warc_id bigint, page_no int, target_uri string, n_tokens int, "
    "n_chars int, text_digest string"
)


def wet_doc_stats(wets: DataFrame) -> DataFrame:
    """Per-page stats re-read from DERIVED WET archives — one narrow
    pass over (warc_id, wet). Composing this after ``warc_to_wet``
    proves the writer round-trips: the digests must equal the ones the
    html/warc stats rows compute from the SOURCE documents."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for wid, payload in zip(pdf["warc_id"], pdf["wet"]):
                blob = bytes(payload) if payload is not None else b""
                for i, (uri, text) in enumerate(
                    warc_text_payloads(blob), start=1
                ):
                    rows.append({
                        "warc_id": int(wid), "page_no": i,
                        "target_uri": uri,
                        "n_tokens": len(text.split()),
                        "n_chars": len(text),
                        "text_digest": hashlib.md5(
                            text.encode("utf-8")
                        ).hexdigest(),
                    })
            yield pd.DataFrame(
                rows,
                columns=["warc_id", "page_no", "target_uri", "n_tokens",
                         "n_chars", "text_digest"],
            )

    return wets.mapInPandas(stats, WET_STATS_SCHEMA).orderBy(
        "warc_id", "page_no"
    )


def wet_roundtrip_oracle() -> str:
    """Constant-folding DuckDB oracle for the WET round trip over the
    fixture corpus: per-page text expectations from the SHARED html
    design constants (the same digests warc_stats_oracle states)."""
    rows = [
        (wid, i, uri, e["n_tokens"], e["n_chars"], e["text_digest"])
        for wid, i, uri, e in _fixture_page_rows()
    ]

    def q(s: str) -> str:
        return s.replace("'", "''")

    vals = ",\n      ".join(
        "({}, {}, '{}', {}, {}, '{}')".format(
            r[0], r[1], q(r[2]), r[3], r[4], r[5]
        )
        for r in rows
    )
    return f"""
    SELECT CAST(warc_id AS BIGINT) AS warc_id,
           CAST(page_no AS INT) AS page_no, target_uri,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_chars AS INT) AS n_chars,
           text_digest
    FROM (VALUES
      {vals})
      AS t(warc_id, page_no, target_uri, n_tokens, n_chars, text_digest)
    ORDER BY warc_id, page_no
    """


def w_wet_roundtrip(spark: SparkSession) -> DataFrame:
    """Staged row body: fixture crawl corpus -> derived WET archives
    -> stats re-read from the DERIVED bytes — the full write+read
    round trip as one value-hash surface."""
    return wet_doc_stats(warc_to_wet(warc_corpus(spark)))


# ---------------------------------------------------------------------------
# Driver registration (staged round 12, registered round 13)
# ---------------------------------------------------------------------------

from culvert_spark.queries import (  # noqa: E402
    QUERIES,  # noqa: F401  (re-export: __spark_entry__ registry merge)
    ORACLE,  # noqa: F401
    register,
)


@register("w_warc_doc_stats", warc_stats_oracle())
def w_warc_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive ingestion as a FULL hash row (staged round
    12, registered round 13): the fixture corpus — one plain ``.warc``
    AND one member-gzip ``.warc.gz``, response/request/metadata record
    mix, chunked + Content-Length bodies, a non-HTML response and a
    404 — through ``warc_doc_stats``: record walk -> HTTP body decode
    -> HTML main-content extraction (htmlops) -> per-page token/char
    counts + text digest, against the constant-folding
    ``warc_stats_oracle()`` stated from the design pages. One narrow
    ``mapInPandas`` per archive (a 100 TB crawl shards by archive
    file; per-core rates multiply at 1,000 executors). ``sf_dir``
    unused (fixture ground truth); the operator is corpus-generic."""
    return warc_doc_stats(warc_corpus(spark))
