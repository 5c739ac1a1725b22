"""PDF writer/parser/features/layout-dedup tests (culvert_spark.pdfops).

Staged round 11 for round-12 registrations (m_pdf_doc_features,
m_pdf_layout_dedup): writer round-trips through the production parser
across every content-style/compression/length-form axis, the grid
fingerprint realizes the import-proven cluster geometry exactly, and
the staged DuckDB oracles state the same truth the Spark pipelines
produce.
"""

from __future__ import annotations

import pytest

from culvert_spark import pdfops as P
from culvert_spark.imagesim import _ND_CLUSTERS, _ND_SINGLETONS

STYLES = ["td", "tm", "tj", "quote", "hex"]


def _two_page_doc(style: str, compress: bool, indirect: bool) -> bytes:
    pages = [
        {
            "mediabox": None,
            "elements": [
                (72, 720, 24, "hello world one two"),
                (100.5, 650, 10, "body (text) \\ with escapes"),
            ],
        },
        {"mediabox": (400, 500), "elements": [(50, 450, 12, "second page")]},
    ]
    return P.encode_pdf(
        pages,
        style=style,
        compress=compress,
        indirect_length=indirect,
        nested=True,
    )


@pytest.mark.parametrize("style", STYLES)
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_styles_compression_nesting(style, compress):
    """Every content style x raw/Flate x direct/indirect /Length:
    pages in order, MediaBox inherited through the NESTED tree on page
    1 and overridden on page 2, one run per element with exact (x, y,
    size, text) — so the extracted runs are style-invariant, the
    property the layout fingerprint relies on."""
    for indirect in (False, True):
        doc = P.PdfDocument(_two_page_doc(style, compress, indirect))
        pages = doc.pages()
        assert len(pages) == 2
        assert pages[0]["MediaBox"] == [0, 0, 612, 792]  # inherited
        assert pages[1]["MediaBox"] == [0, 0, 400, 500]  # overridden
        runs = doc.doc_runs()
        assert [(pg, x, y, s) for pg, x, y, s, _ in runs] == [
            (1, 72.0, 720.0, 24.0),
            (1, 100.5, 650.0, 10.0),
            (2, 50.0, 450.0, 12.0),
        ]
        assert [t for *_, t in runs] == [
            "hello world one two",
            "body (text) \\ with escapes",
            "second page",
        ]


def test_encode_deterministic():
    a = _two_page_doc("td", True, True)
    b = _two_page_doc("td", True, True)
    assert a == b  # fixtures must be bit-reproducible at any parallelism


def test_literal_string_octal_nesting_continuation():
    """Spec corners of the literal-string escape grammar: 1-3 digit
    octal codes, balanced NESTED parens without escapes, backslash
    line-continuation, and the named escapes."""
    s, p = P._parse_literal_string(rb"(\101\12\0418 (nested (deep)) a\
b \t\) end)", 0)
    assert s == b"A\n!8 (nested (deep)) ab \t) end"


def test_literal_string_backslash_before_non_octal_digit():
    """Spec 7.3.4.2: \\8 and \\9 are NOT octal — the backslash is
    dropped and the digit kept; \\48 is octal 4 followed by a literal
    '8' (self-review: treating 8/9 as octal crashed int(_, 8))."""
    s, _ = P._parse_literal_string(rb"(a\9b \8 \48 \0757)", 0)
    assert s == b"a9b 8 \x048 =7"


def test_freed_xref_entry_shadows_older_section():
    """An incremental update marking an object FREE must shadow the
    base section's in-use offset across the /Prev chain — a reference
    to a freed object reads as null (spec 7.3.10), not as the deleted
    object's stale bytes."""
    base = P.encode_pdf(
        [{"mediabox": None, "elements": [(72, 720, 10, "alive")]}]
    )
    prev_at = base.index(b"xref\n0 ")  # the TABLE (not "startxref")
    update_at = len(base)
    update = (
        b"xref\n0 1\n0000000000 65535 f \n3 1\n0000000000 65535 f \n"
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (prev_at, update_at)
    )
    doc = P.PdfDocument(base + update)
    assert doc.resolve(P._Ref(3)) is None      # freed -> null
    assert doc.resolve(P._Ref(1)) is not None  # untouched objs intact


def test_startxref_at_non_xref_object_falls_back_to_scan():
    """A startxref pointing at an object that is NOT /Type /XRef is
    damage (it used to be the labeled 1.5 boundary; the round-13
    xref-stream parser reads real XRef objects, so a non-XRef target
    now routes to the scan fallback and the intact file still reads)."""
    data = P.encode_pdf(
        [{"mediabox": None, "elements": [(72, 720, 10, "x")]}]
    )
    obj1_at = data.index(b"1 0 obj")
    tail_at = data.rindex(b"startxref")
    broken = data[:tail_at] + (
        b"startxref\n%d\n%%%%EOF\n" % obj1_at
    )
    runs = [t for *_, t in P.PdfDocument(broken).doc_runs()]
    assert runs == ["x"]


# ---------------------------------------------------------------------------
# PDF 1.5 cross-reference streams + object streams (round 13)
# ---------------------------------------------------------------------------

_XPAGES = [
    {"mediabox": None,
     "elements": [(72, 700, 12, "hello world"), (72, 650, 10, "line two")]},
    {"mediabox": (200, 300), "elements": [(10, 250, 8, "page two")],
     "rotate": 90},
]


def test_xref_stream_forms_parse_identically_to_classic():
    """Every 1.5 writer shape — plain xref stream, + object stream,
    + Flate content, + indirect /Length + nested page tree, + CID
    composite fonts — must extract the SAME runs as the classic-table
    twin: the cross-reference form is container plumbing, not content."""
    ref = P.PdfDocument(P.encode_pdf(_XPAGES)).doc_runs()
    assert ref  # the baseline itself extracts
    for kw in (
        dict(xref="stream"),
        dict(xref="stream", objstm=True),
        dict(xref="stream", objstm=True, compress=True),
        dict(xref="stream", objstm=True, indirect_length=True,
             nested=True),
    ):
        data = P.encode_pdf(_XPAGES, **kw)
        assert data.startswith(b"%PDF-1.5"), kw
        assert P.PdfDocument(data).doc_runs() == ref, kw
    cid_ref = P.PdfDocument(P.encode_pdf(_XPAGES, style="cid")).doc_runs()
    assert (
        P.PdfDocument(
            P.encode_pdf(_XPAGES, style="cid", xref="stream", objstm=True)
        ).doc_runs()
        == cid_ref == ref
    )


def test_xref_stream_objstm_actually_packs():
    """The objstm fixture must really exercise type-2 entries: the
    catalog/pages/page dicts live INSIDE the object stream (absent as
    top-level ``N 0 obj`` markers), and the parser reads them through
    the type-2 path, not the scan fallback."""
    data = P.encode_pdf(_XPAGES, xref="stream", objstm=True)
    assert b"/ObjStm" in data
    assert b"\n1 0 obj" not in data  # catalog is compressed
    doc = P.PdfDocument(data)
    packed = [n for n, e in doc.offsets.items() if isinstance(e, tuple)]
    assert len(packed) >= 4  # catalog + pages + 2 page dicts
    assert doc.resolve(P._Ref(1)).get("Type") == "Catalog"


def test_png_predictors_all_filter_types_roundtrip():
    """_png_unpredict reverses all five PNG filters (RFC 2083): apply
    each filter to known rows, then assert exact reconstruction."""
    rows = [bytes([10, 20, 30, 40]), bytes([13, 24, 30, 255]),
            bytes([0, 1, 2, 3]), bytes([200, 100, 50, 25]),
            bytes([9, 9, 9, 9])]
    bpp = 1
    enc = bytearray()
    prev = bytes(4)
    for ft, row in zip((0, 1, 2, 3, 4), rows):
        enc.append(ft)
        for i, b in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            u = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = b
            elif ft == 1:
                f = (b - a) & 0xFF
            elif ft == 2:
                f = (b - u) & 0xFF
            elif ft == 3:
                f = (b - (a + u) // 2) & 0xFF
            else:
                pp = a + u - c
                pa, pb, pc = abs(pp - a), abs(pp - u), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    u if pb <= pc else c)
                f = (b - pred) & 0xFF
            enc.append(f)
        prev = row
    assert P._png_unpredict(bytes(enc), columns=4) == b"".join(rows)
    with pytest.raises(ValueError, match="filter"):
        P._png_unpredict(b"\x09\x00\x00\x00\x00", columns=4)


def test_xref_stream_prev_chain_incremental_update():
    """An incremental update appending a SECOND xref stream with /Prev
    to the first: the newer section's entries win, older objects stay
    reachable through the chain."""
    base = P.encode_pdf(_XPAGES, xref="stream")
    first_xref_at = int(
        base[base.rindex(b"startxref") + 9: base.rindex(b"%%EOF")].strip()
    )
    # replace page-1's content stream (object 5) with new text via an
    # appended update whose xref stream covers ONLY object 5
    new_stream = b"BT\n/F1 12 Tf\n72 700 Td\n(updated) Tj\nET"
    upd = bytearray(base)
    obj5_at = len(upd)
    upd += (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_stream)
        + new_stream + b"\nendstream\nendobj\n"
    )
    xref_at = len(upd)
    import zlib as _z
    row = bytes([1]) + obj5_at.to_bytes(4, "big") + (0).to_bytes(2, "big")
    xdata = _z.compress(row)
    upd += (
        b"8 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [5 1] "
        b"/Root 1 0 R /Prev %d /Filter /FlateDecode /Length %d >>"
        b"\nstream\n" % (first_xref_at, len(xdata))
        + xdata + b"\nendstream\nendobj\n"
        + b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    runs = [t for *_, t in P.PdfDocument(bytes(upd)).doc_runs()]
    assert runs == ["updated", "page two"]


def test_xref_stream_unknown_row_type_reads_as_null():
    """§7.5.8.3: an entry type > 2 shall be read as a reference to the
    null object (forward compatibility), not an error."""
    data = P.encode_pdf(_XPAGES, xref="stream")
    doc = P.PdfDocument(data)
    # hand-build a tiny xref stream with a type-7 row for object 3
    import zlib as _z
    row = bytes([7]) + (123).to_bytes(4, "big") + (0).to_bytes(2, "big")
    offsets: dict = {}
    blob = bytearray(b"%PDF-1.5\n")
    at = len(blob)
    xdata = _z.compress(row)
    blob += (
        b"1 0 obj\n<< /Type /XRef /Size 4 /W [1 4 2] /Index [3 1] "
        b"/Root 2 0 R /Filter /FlateDecode /Length %d >>\nstream\n"
        % len(xdata) + xdata + b"\nendstream\nendobj\n"
    )
    xd = P.PdfDocument.__new__(P.PdfDocument)
    xd.data = bytes(blob)
    xd._cache = {}
    xd._objstms = {}
    got = xd._read_xref_stream(at, offsets)
    assert got["Size"] == 4
    assert offsets == {3: None}
    assert doc.resolve(P._Ref(1)).get("Type") == "Catalog"  # sanity


def test_hybrid_xrefstm_supplements_free_classic_entries():
    """§7.5.8.4 hybrid-reference file: the classic table marks a
    compressed object FREE (hidden from pre-1.5 readers); /XRefStm
    names the xref stream that defines it. The stream entry must fill
    the free slot."""
    base = P.encode_pdf(_XPAGES, xref="stream", objstm=True)
    doc = P.PdfDocument(base)
    packed = sorted(
        n for n, e in doc.offsets.items() if isinstance(e, tuple)
    )
    direct = sorted(
        (n, e) for n, e in doc.offsets.items() if isinstance(e, int)
    )
    first_xref_at = int(
        base[base.rindex(b"startxref") + 9: base.rindex(b"%%EOF")].strip()
    )
    max_id = max(doc.offsets)
    # append a CLASSIC table marking every object free except the
    # directly-stored ones, with /XRefStm pointing at the 1.5 stream
    upd = bytearray(base)
    table_at = len(upd)
    upd += b"xref\n"
    for num in range(max_id + 1):
        ent = doc.offsets.get(num)
        upd += b"%d 1\n" % num
        if isinstance(ent, int):
            upd += b"%010d 00000 n \n" % ent
        else:
            upd += b"0000000000 65535 f \n"
    upd += (
        b"trailer\n<< /Size %d /Root 1 0 R /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (max_id + 1, first_xref_at, table_at)
    )
    hdoc = P.PdfDocument(bytes(upd))
    # the hybrid read reconstructs the same offsets: every packed
    # object resolves through the XRefStm's type-2 entries
    for num in packed:
        assert isinstance(hdoc.offsets[num], tuple), num
    assert [t for *_, t in hdoc.doc_runs()] == [
        t for *_, t in doc.doc_runs()
    ]


# ---------------------------------------------------------------------------
# Embedded-font cmap text decode (round 13 — the former /ToUnicode-less
# Type0 boundary)
# ---------------------------------------------------------------------------


def test_cid_fontfile_decodes_without_tounicode():
    """A Type0 font with NO /ToUnicode but a real embedded TrueType
    program must decode through the font's own cmap table (inverted
    gid -> unicode) — identical runs to the simple-font twin, across
    raw/compressed programs and the objstm container."""
    pages = [{"mediabox": None,
              "elements": [(72, 700, 12, "hello world"),
                           (72, 650, 10, "za09 mix")]}]
    ref = [t for *_, t in P.PdfDocument(
        P.encode_pdf(pages, style="td")).doc_runs()]
    for kw in (dict(), dict(compress=True),
               dict(xref="stream", objstm=True)):
        data = P.encode_pdf(pages, style="cid", cid_map="fontfile", **kw)
        assert b"ToUnicode" not in data, kw
        assert [t for *_, t in P.PdfDocument(data).doc_runs()] == ref, kw


def test_cid_map_none_stays_flagged_boundary():
    """cid_map='none' (neither /ToUnicode nor a font program): every
    2-byte code still extracts as the flagged U+FFFD — the residual
    labeled boundary, never silently wrong."""
    pages = [{"mediabox": None, "elements": [(72, 700, 10, "xyz")]}]
    runs = [t for *_, t in P.PdfDocument(
        P.encode_pdf(pages, style="cid", cid_map="none")).doc_runs()]
    assert runs == ["���"]


def test_sfnt_gid_inverse_smallest_codepoint_wins():
    """_ttf_gid_to_unicode inverts the cmap; when several codepoints
    share a glyph the smallest codepoint is the stable winner, and
    garbage input degrades to {} (fallback), not an error."""
    font = P._sfnt_font({"a": 300, "b": 301, "A": 300})
    g2u = P._ttf_gid_to_unicode(font)
    assert g2u[300] == "A" and g2u[301] == "b"
    assert P._ttf_gid_to_unicode(b"garbage") == {}
    assert P._ttf_gid_to_unicode(b"") == {}


def test_ttf_cmap_subtable_formats_0_6_12():
    """The cmap parser reads formats 0, 6 and 12 (hand-built
    subtables wrapped in a minimal sfnt), preferring full-Unicode
    format 12 over BMP tables."""
    import struct

    def sfnt_with(cmap_table: bytes) -> bytes:
        out = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
        out += struct.pack(">4sIII", b"cmap", 0, 28, len(cmap_table))
        return out + cmap_table

    # format 0: byte code 0x41 -> gid 7
    arr = bytearray(256)
    arr[0x41] = 7
    f0 = struct.pack(">HHH", 0, 262, 0) + bytes(arr)
    cmap0 = (struct.pack(">HH", 0, 1)
             + struct.pack(">HHI", 1, 0, 12) + f0)
    assert P._ttf_gid_to_unicode(sfnt_with(cmap0))[7] == "A"

    # format 6: first=0x61, two gids
    f6 = struct.pack(">HHHHHH", 6, 16, 0, 0x61, 2, 9) + struct.pack(
        ">H", 10)
    cmap6 = (struct.pack(">HH", 0, 1)
             + struct.pack(">HHI", 3, 1, 12) + f6)
    g = P._ttf_gid_to_unicode(sfnt_with(cmap6))
    assert g[9] == "a" and g[10] == "b"

    # format 12: one group mapping U+1F600.. to gid 100.., plus a BMP
    # format-4-bearing record that must LOSE the preference
    f12 = struct.pack(">HHIII", 12, 0, 28, 0, 1) + struct.pack(
        ">III", 0x1F600, 0x1F601, 100)
    cmap12 = (struct.pack(">HH", 0, 1)
              + struct.pack(">HHI", 3, 10, 12) + f12)
    g = P._ttf_gid_to_unicode(sfnt_with(cmap12))
    assert g[100] == "\U0001F600" and g[101] == "\U0001F601"


def test_cid_to_gid_stream_map_applies():
    """§9.7.4.3: a /CIDToGIDMap STREAM (2 bytes per CID) remaps before
    the font cmap inverse; out-of-range CIDs read gid 0 -> U+FFFD."""
    font_prog = P._sfnt_font({"x": 5, "y": 6})
    gidmap = bytes(4) + (5).to_bytes(2, "big") + (6).to_bytes(2, "big")
    doc = P.PdfDocument.__new__(P.PdfDocument)
    doc._cache = {}
    doc._objstms = {}
    doc._fontprogs = {}
    font = {
        "Subtype": "Type0",
        "DescendantFonts": [{
            "FontDescriptor": {"FontFile2": ({}, font_prog)},
            "CIDToGIDMap": ({}, gidmap),
        }],
    }
    dec = doc._type0_program_decoder(font)
    assert dec(b"\x00\x02\x00\x03") == "xy"
    assert dec(b"\x00\x09") == "�"  # beyond the map: gid 0
    assert dec(b"\x00\x02\x07") == "x�"  # trailing partial code


def test_review_guards_zero_width_codespace_and_narrow_bfchar():
    """Round-13 review regressions: (a) a zero-width codespacerange
    entry (<> <>) must be dropped, not loop the decoder forever; (b) a
    bfchar source written NARROWER than the codespace width (<41>
    under <0000> <FFFF>) still matches via zero-padding, as the old
    integer keying did."""
    cmap = (b"2 begincodespacerange <> <> <0000> <FFFF> "
            b"endcodespacerange\n"
            b"1 beginbfchar <41> <0061> endbfchar")
    widths, mapping, ranges = P._parse_cmap(cmap)
    assert widths == {2}  # the zero-width entry is gone
    doc = P.PdfDocument.__new__(P.PdfDocument)
    doc._cache = {}
    doc._objstms = {}
    doc._fontprogs = {}
    doc.resolve = lambda o: ({}, cmap) if o == 1 else o
    dec = doc._text_decoder({"Subtype": "Type0", "ToUnicode": 1})
    assert dec(b"\x00\x41\x00\x42") == "a�"  # padded bfchar matches


def test_review_mixed_width_containment_is_per_byte():
    """§9.7.6.2: codespace containment is PER BYTE — <90 20> lies
    outside <8140> <FC7E> (0x20 < 0x40) even though it sorts between
    the bounds, so the decoder must consume ONE byte there, keeping
    the rest of the string aligned."""
    cmap = (b"2 begincodespacerange <00> <7F> <8140> <FC7E> "
            b"endcodespacerange\n"
            b"2 beginbfchar <41> <0061> <8141> <0062> endbfchar")
    doc = P.PdfDocument.__new__(P.PdfDocument)
    doc._cache = {}
    doc._objstms = {}
    doc._fontprogs = {}
    doc.resolve = lambda o: ({}, cmap) if o == 1 else o
    dec = doc._text_decoder({"Subtype": "Type0", "ToUnicode": 1})
    # <9020> is lexicographically inside <8140>-<FC7E> but byte-wise
    # OUTSIDE (0x20 < 0x40): the decoder must NOT consume it as one
    # 2-byte code — 0x90 flags alone, then 0x20 is a (unmapped)
    # 1-byte code: TWO outputs, where lexicographic matching gave one.
    assert dec(b"\x90\x20") == "��"
    assert dec(b"\x81\x41\x41") == "ba"  # true 2-byte code + realigned A


def test_review_surrogate_cmap_degrades_not_crashes():
    """A font cmap mapping SURROGATE codepoints (format-12 group over
    D800..) must skip them — extracted text stays encodable, the
    glyphs degrade to U+FFFD instead of UnicodeEncodeError."""
    import struct

    f12 = struct.pack(">HHIII", 12, 0, 40, 0, 2) + struct.pack(
        ">III", 0xD800, 0xD801, 60
    ) + struct.pack(">III", 0x61, 0x61, 62)
    cmap12 = (struct.pack(">HH", 0, 1)
              + struct.pack(">HHI", 3, 10, 12) + f12)
    font = (struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
            + struct.pack(">4sIII", b"cmap", 0, 28, len(cmap12))
            + cmap12)
    g2u = P._ttf_gid_to_unicode(font)
    assert 60 not in g2u and 61 not in g2u  # surrogates skipped
    assert g2u[62] == "a"
    "".join(g2u.values()).encode("utf-8")  # always encodable


def test_review_unsupported_xref_filter_surfaces_by_name():
    """An xref STREAM with a non-Flate filter must raise the labeled
    NotImplementedError, not be silently swallowed into the scan
    fallback (the module contract for unsupported filters)."""
    data = P.encode_pdf(_XPAGES, xref="stream")
    broken = data.replace(b"/Filter /FlateDecode /DecodeParms",
                          b"/Filter /LZWDecode /DecodeParms")
    assert broken != data
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        P.PdfDocument(broken)


def test_review_fontprog_inversion_memoized_per_document():
    """The gid->unicode inversion runs once per font program per
    document, not once per page (review: 1000-page documents)."""
    pages = [
        {"mediabox": None, "elements": [(72, 700, 10, f"pg {i}")]}
        for i in range(4)
    ]
    data = P.encode_pdf(pages, style="cid", cid_map="fontfile")
    doc = P.PdfDocument(data)
    calls = []
    orig = P._ttf_gid_to_unicode
    P._ttf_gid_to_unicode = lambda b: (calls.append(1), orig(b))[1]
    try:
        runs = [t for *_, t in doc.doc_runs()]
    finally:
        P._ttf_gid_to_unicode = orig
    assert runs == [f"pg {i}" for i in range(4)]
    assert len(calls) == 1


def test_staged_xref_stream_oracle_matches(spark):
    """The staged m_pdf_xref_stream row: Spark result == the
    constant-folding oracle, via DuckDB."""
    import duckdb

    got = [
        (r.text_digest, r.n_docs, r.keeper_id, r.n_dupes)
        for r in P.m_pdf_xref_stream_staged(spark).collect()
    ]
    want = [
        tuple(r)
        for r in duckdb.connect().execute(P.pdf_xref_oracle()).fetchall()
    ]
    assert got == want
    assert len(got) == P._XS_GROUPS + P._XS_SINGLES
    assert {n for _, n, _, _ in got} == {len(P._XS_MEMBERS), 1}


def test_fractional_font_size_rounds_identically():
    doc = next(d for d in P._FEAT_DOCS if d["media_id"] == 104)
    feats = P._features_of(
        P.encode_pdf(P._feat_doc_pages(doc), style=doc["style"])
    )
    assert feats["max_font"] == 14  # int(round(13.5)) on BOTH sides


def test_hex_string_odd_digit_and_whitespace():
    s, _ = P._parse_hex_string(b"<48 65 6C6C 6F2>", 0)
    assert s == b"Hello "  # odd count implies trailing 0 -> 0x20


def test_name_hash_escapes():
    n, _ = P._parse_name(b"/A#20B#2FC", 0)
    assert n == "A B/C"


def test_num_token_never_exponent_notation():
    """ISO 32000-1 §7.3.3 numbers have no exponent form: the writer's
    fixed-point formatter must not leak repr()'s '1e-05' for tiny or
    huge magnitudes (round-11 review), and the round trip through the
    parser must hold for representable values."""
    assert P._num(1e-05) == "0.00001"
    assert P._num(-1e-05) == "-0.00001"
    assert P._num(1e-07) == "0"        # below 6-dp resolution: clamps
    assert P._num(12345678.5) == "12345678.5"
    assert P._num(10.5) == "10.5" and P._num(72) == "72"
    for v in (1e-05, 123456.25, -0.125):
        tok = P._num(v)
        assert "e" not in tok.lower() and tok != "" and tok != "-"


def test_xref_fallback_on_damaged_startxref():
    data = P.encode_pdf(
        [{"mediabox": None, "elements": [(72, 720, 10, "x y z")]}]
    )
    for breakage in (
        data.replace(b"startxref", b"startxrfX"),  # keyword gone
        data[: data.rindex(b"startxref")],         # tail truncated
    ):
        doc = P.PdfDocument(breakage)
        assert [t for *_, t in doc.doc_runs()] == ["x y z"]


def test_unknown_stream_filter_raises():
    data = P.encode_pdf(
        [{"mediabox": None, "elements": [(72, 720, 10, "x")]}],
        compress=True,
    )
    # length-preserving swap (20 chars both) so the xref stays valid
    bad = data.replace(b"/Filter /FlateDecode", b"/Filter  /DCTDecode ")
    doc = P.PdfDocument(bad)
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        doc.doc_runs()


def test_contents_array_concatenates_streams():
    """/Contents may be an ARRAY of stream refs; their bytes form one
    logical content stream. Hand-assembled file (no xref at all — the
    scan fallback is the entry path, which this also exercises)."""
    c1 = b"BT\n/F1 10 Tf\n72 700 Td\n(part one) Tj\nET"
    c2 = b"BT\n/F1 12 Tf\n72 650 Td\n(part two) Tj\nET"
    def stream_obj(num: int, data: bytes) -> bytes:
        return (
            b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num, len(data))
            + data
            + b"\nendstream\nendobj\n"
        )

    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /Contents [4 0 R 5 0 R] >>\nendobj\n"
        + stream_obj(4, c1)
        + stream_obj(5, c2)
    )
    doc = P.PdfDocument(body)
    runs = doc.doc_runs()
    assert [(s, t) for _, _, _, s, t in runs] == [
        (10.0, "part one"),
        (12.0, "part two"),
    ]


def test_grid_fold_boundary_and_clamp():
    """Grid decisions at the edges are deterministic: a run exactly on
    a cell boundary goes to the higher-index cell, runs outside the
    MediaBox clamp to border cells."""
    els = [
        (0, 792, 10, "corner"),     # top-left corner -> bit 0
        (153, 792 - 198, 10, "b"),  # on both boundaries -> row 1, col 1
        (-5, 900, 10, "clamp-tl"),  # outside -> clamps to bit 0
        (9999, -5, 10, "clamp-br"),  # outside -> clamps to bit 15
    ]
    fp = P.layout_fingerprint_of(P.encode_pdf([{"elements": els}]))
    want = ["0"] * 16
    want[0] = "1"
    want[1 * 4 + 1] = "1"
    want[15] = "1"
    assert fp == "".join(want)


@pytest.mark.parametrize(
    "fp", [v for cl in _ND_CLUSTERS for v in cl] + _ND_SINGLETONS
)
def test_fingerprint_synthesis_exact(fp):
    """The element synthesis realizes every design fingerprint exactly
    through the full encode -> parse -> grid path, for every content
    style, raw and compressed."""
    for style in STYLES:
        for compress in (False, True):
            pdf = P.encode_pdf(
                [{"elements": P._elements_for_fingerprint(fp, "s")}],
                style=style,
                compress=compress,
            )
            assert P.layout_fingerprint_of(pdf) == fp


def test_fixture_layouts_and_grouping_match_design(spark):
    """End-to-end through real PDF bytes: compressed different-TEXT
    copies land on the same fingerprint (layout is a function of run
    origins, not content), and the clustering lands exactly on the
    design constants (the same truth the staged oracle states)."""
    media = P.near_dup_pdf_media(spark)
    prints = {
        r.media_id: r.fingerprint
        for r in P.pdf_layout_fingerprints(media).collect()
    }
    for mid, fp in prints.items():
        if mid % 10 == 1 or mid % 100 == 1:
            assert fp == prints[mid - 1]
    want = {}
    for c, cl in enumerate(_ND_CLUSTERS):
        want[min(cl)] = (
            3 * P._PL_COPIES, 3, 1000 * c, 3 * P._PL_COPIES - 1
        )
    for s, fp in enumerate(_ND_SINGLETONS):
        want[fp] = (P._PL_COPIES, 1, 9000 + 100 * s, P._PL_COPIES - 1)
    got = {
        r.cluster_id: (r.n_docs, r.n_layouts, r.keeper_id, r.n_dupes)
        for r in P.pdf_layout_dedup_groups(media).collect()
    }
    assert got == want


def test_staged_layout_oracle_matches(spark):
    import duckdb

    spdf = P.pdf_layout_dedup_groups(P.near_dup_pdf_media(spark)).toPandas()
    ddf = duckdb.connect().execute(P.pdf_layout_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_staged_features_oracle_matches(spark):
    """pdf_doc_features over the feature fixture == the staged
    constant-folding oracle, column for column (page counts, run/char/
    token counts, max font, the title rule, inherited vs overridden
    page-1 geometry)."""
    import duckdb

    spdf = P.pdf_doc_features(P.feature_pdf_media(spark)).toPandas()
    ddf = duckdb.connect().execute(P.pdf_features_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))
    # the escape-torture doc survived the round trip into the record
    titles = dict(zip(spdf["media_id"], spdf["title"]))
    assert titles[103].endswith(P._FEAT_ESCAPE_SUFFIX)


def test_features_escape_doc_python_side():
    doc = next(d for d in P._FEAT_DOCS if d.get("escapes"))
    feats = P._features_of(
        P.encode_pdf(
            P._feat_doc_pages(doc),
            style=doc["style"],
            compress=doc["compress"],
            indirect_length=doc["indirect_length"],
            nested=doc["nested"],
        )
    )
    assert feats["title"].endswith(" (q\\r)")
    assert feats["n_pages"] == 1 and feats["max_font"] == 20


# ---------------------------------------------------------------------------
# Text dedup across containers/layouts (staged r11 -> r12/13 candidate)
# ---------------------------------------------------------------------------


def test_canonical_text_is_reading_order_not_emission_order():
    """Two files with the same words laid out at different positions,
    with the content-stream SHOW ORDER flipped, must digest equal: the
    canonicalization sorts runs by (page, y desc, x asc)."""
    a = P.encode_pdf(
        [{"mediabox": None,
          "elements": [(72, 700, 10, "first part"),
                       (200, 300, 10, "second part")]}]
    )
    b = P.encode_pdf(
        [{"mediabox": None,
          "elements": [(500, 250, 10, "second part"),   # emitted FIRST
                       (30, 720, 10, "first part")]}],
        style="tm", compress=True,
    )
    assert P.pdf_canonical_text(a) == P.pdf_canonical_text(b) == (
        "first part\nsecond part"
    )


def test_text_dup_fixture_and_grouping_match_design(spark):
    """Same text, different positions/styles/compression -> one group
    per designed text; layouts must actually DIFFER within a group
    (the inverse claim of the layout row)."""
    media = P.text_dup_pdf_media(spark)
    got = {
        r.keeper_id: (r.n_docs, r.n_dupes)
        for r in P.pdf_text_dedup_groups(media).collect()
    }
    want = {100 * g: (P._TD_PER_GROUP, P._TD_PER_GROUP - 1)
            for g in range(P._TD_GROUPS)}
    want.update({900 + 100 * s: (1, 0) for s in range(P._TD_SINGLES)})
    assert got == want
    # within a text group the LAYOUT fingerprints are not all equal
    prints = {
        r.media_id: r.fingerprint
        for r in P.pdf_layout_fingerprints(media).collect()
    }
    for g in range(P._TD_GROUPS):
        fps = {prints[100 * g + j] for j in range(P._TD_PER_GROUP)}
        assert len(fps) > 1, f"group {g} layouts identical — claim hollow"


def test_staged_text_oracle_matches(spark):
    import duckdb

    spdf = P.pdf_text_dedup_groups(P.text_dup_pdf_media(spark)).toPandas()
    ddf = duckdb.connect().execute(P.pdf_text_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


# ---------------------------------------------------------------------------
# Streaming layout-dedup twin (staged r11 -> r12/13 candidate)
# ---------------------------------------------------------------------------


def test_pdf_stream_dedup_pairs_match_design_order_invariant(spark):
    """The replayed streaming pair set must equal the staged
    constant-folding oracle (ALL within-radius document pairs from the
    fixture design) at DIFFERENT file splits — the same
    batch-boundary-invariance contract as the video/audio twins,
    through the shared streaming.hamming_pair_stream core. The fixture
    covers both distance-0 pairs (compressed different-text copies:
    layout identical by construction) and 1-2-bit pairs (cluster
    variants)."""
    import duckdb

    exp = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(P.pdf_pair_oracle())
        .fetchdf()
        .itertuples(index=False, name=None)
    )
    assert len(exp) > 0
    # copy (distance-0) pairs: same cluster+variant, copies 0/1
    assert any(b - a == 1 and a % 10 == 0 for a, b in exp)
    # cross-variant pairs (1-2 bits): different variant digits
    assert any((a // 10) % 100 != (b // 10) % 100 for a, b in exp)
    for n_files in (4, 1):
        got = sorted(
            (r.a_media, r.b_media)
            for r in P.pdf_pair_replay(spark, n_files=n_files).collect()
        )
        assert got == exp, f"n_files={n_files}"


# ---------------------------------------------------------------------------
# /Rotate: viewer rotation (inheritable) + rotation-invariant layout
# ---------------------------------------------------------------------------


def test_rotate_inherited_and_overridden():
    data = P.encode_pdf(
        [
            {"mediabox": None, "elements": [(72, 700, 10, "a")]},
            {"mediabox": None, "elements": [(72, 700, 10, "b")],
             "rotate": 180},
        ],
        rotate=90,
        nested=True,
    )
    pages = P.PdfDocument(data).pages()
    assert pages[0]["Rotate"] == 90   # inherited through the tree
    assert pages[1]["Rotate"] == 180  # page override wins
    # negative multiples normalize (the spec allows any multiple of 90)
    neg = P.encode_pdf(
        [{"mediabox": None, "elements": [(72, 700, 10, "c")]}],
        rotate=-270,
    )
    assert P.PdfDocument(neg).pages()[0]["Rotate"] == 90


@pytest.mark.parametrize("fp", [_ND_CLUSTERS[0][0], _ND_CLUSTERS[4][2],
                                _ND_SINGLETONS[0]])
@pytest.mark.parametrize("rotate", [0, 90, 180, 270])
def test_layout_fingerprint_rotation_invariant(fp, rotate):
    """A page STORED rotated (content transformed, /Rotate set — how
    scanners emit sideways pages) must fingerprint identically to its
    upright twin: the grid reads DISPLAY space."""
    els = P._elements_for_fingerprint(fp, "rotinv")
    cels, cbox = P.content_layout_for_display(els, rotate)
    pdf = P.encode_pdf(
        [{"mediabox": None, "elements": cels, "rotate": rotate}],
        mediabox=cbox,
    )
    assert P.layout_fingerprint_of(pdf) == fp


def test_canonical_text_rotation_normalized():
    """A stored-rotated file with the same words must digest equal to
    the upright one: the canonicalization reads DISPLAY space."""
    els = [(72, 700, 10, "first part"), (200, 300, 10, "second part")]
    upright = P.encode_pdf([{"mediabox": None, "elements": els}])
    cels, cbox = P.content_layout_for_display(els, 270)
    rotated = P.encode_pdf(
        [{"elements": cels, "rotate": 270}], mediabox=cbox, compress=True
    )
    assert (
        P.pdf_canonical_text(rotated)
        == P.pdf_canonical_text(upright)
        == "first part\nsecond part"
    )


# ---------------------------------------------------------------------------
# Property tests (hypothesis): string grammar + writer/parser round-trip
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_PROP = settings(max_examples=40, deadline=None)

#: Texts the fixture writer can emit: latin-1-safe, no raw newlines
#: (the writer shows one run per line), escape-heavy characters
#: included deliberately.
_texts = st.text(
    alphabet=st.sampled_from(
        "abcxyz0189 ()\\/<>[]#%'\"éü"
    ),
    min_size=0,
    max_size=60,
)


@_PROP
@given(text=_texts)
def test_prop_literal_string_roundtrip(text):
    """escape -> wrap -> parse == original, for arbitrary escape-heavy
    text (parens, backslashes, name/comment/array delimiters)."""
    lit = f"({P._esc_pdf_string(text)})".encode("latin-1")
    s, pos = P._parse_literal_string(lit, 0)
    assert s.decode("latin-1") == text
    assert pos == len(lit)


@_PROP
@given(payload=st.binary(min_size=0, max_size=64))
def test_prop_hex_string_roundtrip(payload):
    hx = f"<{payload.hex().upper()}>".encode("ascii")
    s, pos = P._parse_hex_string(hx, 0)
    assert s == payload and pos == len(hx)


@_PROP
@given(
    data=st.data(),
    style=st.sampled_from(STYLES),
    compress=st.booleans(),
    rotate=st.sampled_from([0, 90, 180, 270]),
)
def test_prop_writer_parser_roundtrip(data, style, compress, rotate):
    """Arbitrary element sets through every style/compression/rotation:
    the parser recovers exactly one run per element with the element's
    text and position (positions quantized to .5 to keep repr exact)."""
    n = data.draw(st.integers(1, 4))
    els = []
    for i in range(n):
        x = data.draw(st.integers(0, 1200)) / 2
        y = data.draw(st.integers(0, 1500)) / 2
        size = data.draw(st.integers(4, 64))
        text = data.draw(_texts.filter(lambda t: t.strip() != ""))
        els.append((x, y, float(size), text))
    pdf = P.encode_pdf(
        [{"mediabox": None, "elements": els, "rotate": rotate}],
        style=style,
        compress=compress,
    )
    doc = P.PdfDocument(pdf)
    pages = doc.pages()
    assert pages[0]["Rotate"] == rotate
    runs = doc.page_runs(pages[0])
    assert [(x, y, s, t) for x, y, s, t in runs] == [
        (x, y, s, t) for x, y, s, t in els
    ]


def test_features_rotation_invariant():
    """A stored-rotated twin must FEATURE identically to the upright
    original — title rule and page-1 geometry read display space, like
    the dedup operators (self-review: they used to read content space,
    splitting rotated twins the module's own dedup rows unify)."""
    els = [(72, 700, 24, "real-title"), (200, 300, 10, "footer words")]
    upright = P._features_of(
        P.encode_pdf([{"mediabox": None, "elements": els}])
    )
    assert upright["title"] == "real-title"
    assert (upright["p1_width"], upright["p1_height"]) == (612, 792)
    for rot in (90, 180, 270):
        cels, cbox = P.content_layout_for_display(els, rot)
        rotated = P._features_of(
            P.encode_pdf(
                [{"elements": cels, "rotate": rot}], mediabox=cbox
            )
        )
        assert rotated == upright, rot


def test_content_layout_normalizes_and_validates_rotate():
    els = [(72, 700, 10, "x")]
    assert P.content_layout_for_display(els, -90) == (
        P.content_layout_for_display(els, 270)
    )
    assert P.content_layout_for_display(els, 450) == (
        P.content_layout_for_display(els, 90)
    )
    with pytest.raises(ValueError, match="multiple of 90"):
        P.content_layout_for_display(els, 45)


def test_pages_snaps_malformed_rotate_to_right_angle():
    """Spec requires /Rotate be a multiple of 90; malformed values
    occur in the wild and must snap (not pass through, which would
    silently drop the display-space semantics)."""
    for raw, want in ((80, 90), (100, 90), (359, 0), (190, 180)):
        data = P.encode_pdf(
            [{"mediabox": None, "elements": [(72, 700, 10, "x")]}],
            rotate=raw,
        )
        assert P.PdfDocument(data).pages()[0]["Rotate"] == want, raw


def test_rotate_snap_midpoints_half_up():
    """Midpoint /Rotate values snap half-UP symmetrically (banker's
    rounding used to send 45 down but 135 up — self-review)."""
    for raw, want in ((45, 90), (135, 180), (225, 270), (315, 0)):
        data = P.encode_pdf(
            [{"mediabox": None, "elements": [(72, 700, 10, "x")]}],
            rotate=raw,
        )
        assert P.PdfDocument(data).pages()[0]["Rotate"] == want, raw


def test_feature_fixture_rotated_doc_matches_display_design():
    """Doc 105 is STORED rotated; extraction must return the design
    (display-space) title and geometry — the oracle's contract."""
    doc = next(d for d in P._FEAT_DOCS if d["media_id"] == 105)
    feats = P._features_of(
        P.encode_pdf(
            P._feat_doc_pages(doc), style=doc["style"],
            compress=doc["compress"],
        )
    )
    assert feats["title"] == P._feat_doc_text(doc, 0, 0, 4)
    assert (feats["p1_width"], feats["p1_height"]) == (612, 792)
    assert feats["n_pages"] == 1 and feats["max_font"] == 22


# ---------------------------------------------------------------------------
# Composite fonts: Type0/Identity-H + /ToUnicode CMap (staged r12 ->
# r13/14 candidate m_pdf_cid_text)
# ---------------------------------------------------------------------------


def test_cid_canonical_text_equals_simple_font():
    """The same words through a Type0/Identity-H font (2-byte CIDs +
    /ToUnicode CMap) and through the simple literal-string path must
    canonicalize BYTE-identically, compressed or not — the
    cross-encoding claim the staged row registers."""
    pages = P._ct_pages("unit")
    want = P.pdf_canonical_text(P.encode_pdf(pages, style="td"))
    for comp in (False, True):
        got = P.pdf_canonical_text(
            P.encode_pdf(pages, style="cid", compress=comp)
        )
        assert got == want


def test_cid_mapping_is_not_identity():
    """The fixture's CID assignment is codepoint + 0x100, so a decoder
    that shortcuts Identity-H codes as Unicode (skipping the CMap)
    provably fails — the show bytes, read as UTF-16BE, are NOT the
    design text."""
    pages = [{"mediabox": None, "elements": [(72, 700, 10, "abc")]}]
    data = P.encode_pdf(pages, style="cid")
    runs = [t for *_, t in P.PdfDocument(data).doc_runs()]
    assert runs == ["abc"]
    shortcut = "".join(chr(ord(c) + P._CID_DELTA) for c in "abc")
    assert shortcut != "abc"  # the CMap did real work


def test_tounicode_cmap_exercises_both_section_forms():
    """The generated CMap uses bfrange for contiguous codepoint runs
    and bfchar for isolated ones, and _parse_cmap round-trips both
    (widths from the codespacerange, full mapping back)."""
    chars = set("0123456789abcdef ")  # runs 0-9, a-f; isolated space
    cmap = P._tounicode_cmap(chars)
    assert b"beginbfrange" in cmap and b"beginbfchar" in cmap
    widths, mapping, ranges = P._parse_cmap(cmap)
    assert widths == {2}
    assert ranges == [(b"\x00\x00", b"\xff\xff")]
    for c in chars:
        assert mapping[(ord(c) + P._CID_DELTA).to_bytes(2, "big")] == c
    assert len(mapping) == len(chars)


def test_parse_cmap_bfrange_array_destination_form():
    """§9.10.3's second bfrange form: [dst0 dst1 ...] array of
    destination strings."""
    cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfrange <0100> <0102> [<0058> <0059> <005A>] "
            b"endbfrange")
    widths, mapping, _ = P._parse_cmap(cmap)
    assert widths == {2}
    assert (mapping[b"\x01\x00"], mapping[b"\x01\x01"],
            mapping[b"\x01\x02"]) == ("X", "Y", "Z")


def test_parse_cmap_bfrange_overflow_is_truncated_not_raised():
    """Round-12 ADVICE: a malformed bfrange whose integer-increment
    destinations cross the destination byte width used to raise
    OverflowError from to_bytes mid-parse.  It must now truncate at
    the overflow point and keep the in-range prefix."""
    cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfrange <0100> <0104> <FFFE> endbfrange")
    widths, mapping, _ = P._parse_cmap(cmap)
    # FFFE and FFFF fit in 2 bytes; 0x10000.. overflow and are dropped
    assert mapping[b"\x01\x00"] == "￾"
    assert mapping[b"\x01\x01"] == "￿"
    assert b"\x01\x02" not in mapping and b"\x01\x04" not in mapping


def test_parse_cmap_huge_span_is_skipped():
    """A bfrange spanning >= 2^16 codes (no real ToUnicode does) is
    skipped wholesale instead of looping billions of iterations."""
    cmap = (b"1 begincodespacerange <00000000> <FFFFFFFF> "
            b"endcodespacerange\n"
            b"1 beginbfrange <00000000> <7FFFFFFF> <0041> endbfrange")
    _, mapping, _ = P._parse_cmap(cmap)
    assert mapping == {}


def test_mixed_width_cmap_decodes_by_codespace_not_max_width():
    """Round-12 ADVICE: mixed 1/2-byte codespaceranges used to collapse
    to max(widths)=2, misdecoding every 1-byte code.  The decoder must
    now match each position against the codespace ranges
    shortest-width-first: 1-byte codes in <00>-<7F> and 2-byte codes in
    <8000>-<FFFF> interleave correctly in one string."""
    cmap = (b"2 begincodespacerange <00> <7F> <8000> <FFFF> "
            b"endcodespacerange\n"
            b"2 beginbfchar <41> <0061> <8001> <0062> endbfchar")
    widths, mapping, ranges = P._parse_cmap(cmap)
    assert widths == {1, 2}
    # build the decoder through the same _text_decoder code path with a
    # stub resolve() returning the CMap stream
    class _Doc(P.PdfDocument):
        def __init__(self):  # bypass parsing; only resolve() is used
            self._cache = {}
        def resolve(self, o):
            return ({}, cmap)
    dec = _Doc()._text_decoder({"Subtype": "Type0", "ToUnicode": 1})
    # 1-byte 'A', 2-byte <8001>, 1-byte 'A', unmapped 1-byte <42>,
    # out-of-codespace byte <FF> at end (incomplete 2-byte code)
    assert dec(b"\x41\x80\x01\x41\x42\xff") == "aba��"


def test_type0_without_tounicode_is_labeled_boundary():
    """A Type0 font with NO /ToUnicode CMap cannot be mapped to text
    without the font program's own cmap table (out of scope): each
    2-byte code extracts as U+FFFD — flagged, never silently wrong."""
    pages = [{"mediabox": None, "elements": [(72, 700, 10, "xyz")]}]
    data = P.encode_pdf(pages, style="cid").replace(
        b" /ToUnicode ", b" /NotToUnicode "
    )
    runs = [t for *_, t in P.PdfDocument(data).doc_runs()]
    assert runs == ["�" * 3]


def test_resources_inherited_from_pages_node():
    """/Resources is inheritable (ISO 32000-1 §7.7.3.4): hoist the
    writer's per-page resources onto the /Pages node and the composite
    font must still resolve through inheritance."""
    pages = [{"mediabox": None, "elements": [(72, 700, 10, "words here")]}]
    data = P.encode_pdf(pages, style="cid")
    # find the per-page resources entry and move it to the /Pages node
    import re

    m = re.search(rb" /Resources << /Font << [^>]*>> >>", data)
    assert m, "writer layout changed"
    res = m.group(0)
    surgically = data.replace(res, b"", 1).replace(
        b"/Type /Pages /Kids", res.strip() + b" /Type /Pages /Kids", 1
    )
    # the surgery shifts every offset, so drop the now-stale xref
    # entirely: the parser's documented scan-fallback reconstructs the
    # table (same entry path as test_xref_fallback_on_damaged_startxref)
    surgically = surgically[: surgically.rindex(b"xref")]
    runs = [t for *_, t in P.PdfDocument(surgically).doc_runs()]
    assert runs == ["words here"]


def test_staged_cid_fixture_and_oracle_match(spark):
    """End-to-end: the composite-font fixture collapses per design
    (groups of 3 across td/cid/cid-compressed; singletons alone) and
    equals the staged constant-folding oracle."""
    import duckdb

    got = {
        r.keeper_id: (r.n_docs, r.n_dupes)
        for r in P.m_pdf_cid_text_staged(spark).collect()
    }
    want = {100 * g: (len(P._CT_MEMBERS), len(P._CT_MEMBERS) - 1)
            for g in range(P._CT_GROUPS)}
    want.update({900 + 100 * s: (1, 0) for s in range(P._CT_SINGLES)})
    assert got == want
    spdf = P.m_pdf_cid_text_staged(spark).toPandas()
    ddf = duckdb.connect().execute(P.pdf_cid_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))
