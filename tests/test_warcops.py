"""WARC container tests (culvert_spark.warcops) — staged round 11 for
a later registration (w_warc_doc_stats)."""

from __future__ import annotations

import gzip

import pytest

from culvert_spark import warcops as W
from culvert_spark.htmlops import _HTML_DOCS, _expected_doc


def _pages(k=3):
    return W._warc_pages(_HTML_DOCS[:k])


def test_roundtrip_raw_and_member_gz():
    pages = _pages()
    for data in (W.encode_warc(pages), W.encode_warc_gz(pages)):
        got = list(W.warc_html_payloads(data))
        assert got == pages


def test_noise_records_filtered():
    """warcinfo, request records, a non-HTML response and a 404 must
    contribute NO payload rows."""
    data = W.encode_warc(_pages())
    assert len(list(W.iter_warc_records(data))) == 9  # 1+3x2+2
    assert len(list(W.warc_html_payloads(data))) == 3
    bare = W.encode_warc(_pages(), include_noise=False)
    assert len(list(W.iter_warc_records(bare))) == 4  # warcinfo + 3


def test_member_per_record_gz_layout():
    """Every record is its own gzip member (the seekable .warc.gz
    contract) — member count equals record count."""
    data = W.encode_warc_gz(_pages())
    members = 0
    rest = data
    import zlib

    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        d.decompress(rest)
        d.flush()
        rest = d.unused_data
        members += 1
    assert members == len(list(W.iter_warc_records(data)))


def test_whole_file_gzip_also_reads():
    """A single-member gzip of the whole archive (the other layout in
    the wild) reads identically."""
    pages = _pages()
    data = gzip.compress(W.encode_warc(pages))
    assert list(W.warc_html_payloads(data)) == pages


def test_malformed_records_raise_with_offset():
    data = W.encode_warc(_pages(1))
    with pytest.raises(ValueError, match="byte 0"):
        list(W.iter_warc_records(b"JUNK" + data))
    # broken terminator
    bad = data.replace(b"\r\n\r\nWARC/1.1\r\nWARC-Type: request",
                       b"\r\nXX\r\nWARC/1.1\r\nWARC-Type: request", 1)
    with pytest.raises(ValueError):
        list(W.iter_warc_records(bad))
    # trailing garbage after the last gzip member
    with pytest.raises(ValueError, match="trailing"):
        list(W._iter_gunzip_members(W.encode_warc_gz(_pages(1)) + b"junk"))


def test_staged_warc_oracle_matches(spark):
    import duckdb

    spdf = W.warc_doc_stats(W.warc_corpus(spark)).toPandas()
    ddf = duckdb.connect().execute(W.warc_stats_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert len(a) == len(_HTML_DOCS)  # every design page, nothing else


def test_stats_match_html_design_constants(spark):
    rows = {
        (r.warc_id, r.page_no): r
        for r in W.warc_doc_stats(W.warc_corpus(spark)).collect()
    }
    for wid, specs in ((0, _HTML_DOCS[:3]), (1, _HTML_DOCS[3:])):
        for i, s in enumerate(specs, start=1):
            e = _expected_doc(s)
            r = rows[(wid, i)]
            assert (r.title, r.n_links, r.n_tokens, r.text_digest) == (
                e["title"], e["n_links"], e["n_tokens"], e["text_digest"]
            )


def test_extraction_plan_is_narrow(spark):
    df = W.warc_doc_stats(W.warc_corpus(spark))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Repartition" not in plan


def test_http_body_encodings_decode_identically():
    """Chunked transfer framing and Content-Encoding gzip bodies must
    extract the SAME html as identity (self-review: they used to pass
    through as framing noise / mojibake with bogus digests); an
    unsupported encoding skips the record rather than corrupting it."""
    uri, html = _pages(1)[0]
    plain = list(W.warc_html_payloads(
        W.encode_warc([(uri, html, "identity")], include_noise=False)))
    for enc in ("chunked", "gzip"):
        got = list(W.warc_html_payloads(
            W.encode_warc([(uri, html, enc)], include_noise=False)))
        assert got == plain, enc
    # unsupported Content-Encoding -> record skipped, not garbage
    raw = W._http_response(html)
    raw = raw.replace(b"Content-Type:", b"Content-Encoding: br\r\nContent-Type:")
    rec = W._warc_record("response", {"WARC-Target-URI": uri}, raw)
    assert list(W.warc_html_payloads(rec)) == []


def test_truncated_header_and_corrupt_member_raise_with_offset():
    data = W.encode_warc(_pages(1), include_noise=False)
    with pytest.raises(ValueError, match="truncated WARC header at byte"):
        list(W.iter_warc_records(data[:20]))
    gz = W.encode_warc_gz(_pages(1), include_noise=False)
    corrupt = gz[:60] + bytes([gz[60] ^ 0xFF]) + gz[61:]
    with pytest.raises(ValueError, match="offset"):
        list(W.iter_warc_records(corrupt))


def test_gunzip_is_member_at_a_time():
    """The member iterator yields one inflated member per gzip member
    — the memory property the .warc.gz layout exists for."""
    gz = W.encode_warc_gz(_pages(2), include_noise=False)
    members = list(W._iter_gunzip_members(gz))
    assert len(members) == len(list(W.iter_warc_records(gz)))
    assert all(m.startswith(b"WARC/1.1") for m in members)


def test_null_payload_is_empty_archive(spark):
    df = spark.createDataFrame(
        [(0, bytearray(W.encode_warc(_pages(1)))), (1, None)],
        "warc_id bigint, payload binary",
    )
    got = W.warc_doc_stats(df).collect()
    assert {r.warc_id for r in got} == {0}


# ---------------------------------------------------------------------------
# WET derived-text archives (staged r12 -> r13/14 candidate
# w_wet_roundtrip)
# ---------------------------------------------------------------------------


def test_encode_wet_is_valid_warc_and_roundtrips():
    """The derived archive is a VALID WARC by the production record
    walk: warcinfo + one conversion record per page, text back
    byte-faithfully (incl. non-ASCII), other record types skipped by
    the text reader."""
    pages = [("https://x.example/a", "first page text"),
             ("https://x.example/b", "texte accentué — ok")]
    wet = W.encode_wet(pages, "unit-src")
    kinds = [f.get("warc-type") for f, _ in W.iter_warc_records(wet)]
    assert kinds == ["warcinfo", "conversion", "conversion"]
    assert list(W.warc_text_payloads(wet)) == pages
    # the html reader sees no response records in a WET file
    assert list(W.warc_html_payloads(wet)) == []


def test_wet_writer_deterministic():
    pages = [("https://x.example/a", "same text")]
    assert W.encode_wet(pages, "s") == W.encode_wet(pages, "s")


def test_warc_to_wet_roundtrip_matches_source_stats(spark):
    """The WRITE side proof: crawl corpus -> WET -> stats re-read from
    the DERIVED bytes must carry the same text digests the html design
    constants state (title/chrome excluded by extraction, preserved by
    the writer round trip)."""
    from culvert_spark.htmlops import _expected_doc

    rows = {
        (r.warc_id, r.page_no): (r.target_uri, r.n_tokens, r.n_chars,
                                 r.text_digest)
        for r in W.w_wet_roundtrip(spark).collect()
    }
    for wid, specs in ((0, W._HTML_DOCS[:W._WARC_SPLIT]),
                       (1, W._HTML_DOCS[W._WARC_SPLIT:])):
        for i, s in enumerate(specs, start=1):
            e = _expected_doc(s)
            assert rows[(wid, i)] == (
                f"https://fixture.example/doc{s[0]}", e["n_tokens"],
                e["n_chars"], e["text_digest"],
            )


def test_staged_wet_oracle_matches(spark):
    import duckdb

    spdf = W.w_wet_roundtrip(spark).toPandas()
    ddf = duckdb.connect().execute(W.wet_roundtrip_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_wet_plan_is_narrow(spark):
    """Scale gate: archive -> WET -> stats is mapInPandas all the way
    (the archive row is the unit of work on both sides); the only
    exchange is the presentation orderBy."""
    df = W.wet_doc_stats(W.warc_to_wet(W.warc_corpus(spark)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan  # the orderBy only
