"""PDF document parsing, text/layout extraction and layout dedup.

The training-data document family has text analysis over the
``documents`` table but nothing that reads a real DOCUMENT CONTAINER;
this module closes that gap for PDF — the dominant container for
scanned/laid-out corpora — with a from-scratch reader of the PUBLIC
spec (PDF is ISO 32000-1; the subset implemented here — classic
cross-reference tables AND 1.5 cross-reference/object streams
(§7.5.7/§7.5.8, incl. hybrid /XRefStm files and the PNG row
predictors of §7.4.4.4), object/dictionary/stream syntax, FlateDecode
via zlib (RFC 1950/1951, Python stdlib), the page tree with attribute
inheritance, and the text-showing operators of the content-stream
language — is fully described in the freely published spec text):

1. **Writer** (fixture generation, ``encode_pdf``): minimal-but-valid
   PDF — catalog/pages/page objects, Helvetica Type1 font, literal
   or Flate-compressed content streams, classic 1.4 xref + trailer OR
   (``xref="stream"``) a 1.5 cross-reference stream with optional
   ``objstm`` object-stream packing (the post-2005 "compressed PDF"
   shape, Up-predictor-filtered like real writers emit). Like
   mediagen's image writers it is deliberately small but emits REAL
   files any conforming reader accepts.
2. **Parser** (production path, ``PdfDocument``): tokenizer for the
   object syntax (dicts, arrays, names with #xx escapes, literal
   strings with octal/escape/nesting, hex strings, numbers, booleans,
   indirect references), classic xref tables with /Prev chaining,
   1.5 cross-reference STREAMS (/W widths, /Index subsections, type-2
   compressed-object entries, /Prev chains, hybrid /XRefStm) with
   object-stream (/ObjStm) member access and PNG predictor reversal,
   plus a scan-for-``N 0 obj`` fallback for damaged files, stream
   payloads via /Length (direct or indirect) + /FlateDecode, page-tree
   walk
   with /MediaBox (+ /Rotate, /Resources) inheritance, and a
   content-stream interpreter for the text operators (BT/ET, Tf, TL,
   Td, TD, Tm, T*, Tj, TJ, ', ") tracking the text/line matrices —
   emitting one (x, y, size, text) RUN per show op at its text-space
   origin. Show strings decode through the Tf-selected FONT: simple
   fonts byte-wise, COMPOSITE Type0 fonts (§9.7) through their
   /ToUnicode CMap (§9.10.3 — codespacerange widths, bfchar, both
   bfrange forms) OR — round 13, when /ToUnicode is absent — through
   the embedded TrueType program's own ``cmap`` table (OpenType spec,
   formats 0/4/6/12, inverted gid->unicode, /CIDToGIDMap Identity or
   stream), so CID-encoded text extracts to the same canonical form
   as simple-font text; a Type0 font with NEITHER channel yields
   U+FFFD per code (the residual labeled boundary).
3. **Features** (``pdf_doc_features``): per-document page count, run/
   char/token counts, max font size, the page-1 title run, page-1
   geometry — the document-corpus quality columns.
4. **Layout fingerprint + dedup** (``pdf_layout_dedup_groups``): a
   16-bit occupancy grid (4x4 cells over the page-1 MediaBox, bit =
   some run originates in the cell, row 0 at the TOP) feeds
   :func:`culvert_spark.imagesim.phash_value_clusters` — the same
   bounded-value-domain Hamming clustering as the image/video/audio
   paths (band-LSH on the DISTINCT value table, exact pigeonhole
   recall, pointer-doubling components) — grouping documents that
   share a layout template modulo small edits even when their TEXT is
   entirely different (the template-dedup step of scanned-corpus
   cleanup).

Scale posture (100 TB): parse + extract run inside one narrow
``mapInPandas`` (decoder CPU scales with executors; nothing shuffles
until the final grouped aggregate); the layout pairing never touches
document rows (the 16-bit value domain is <= 65 536 values at ANY
corpus size).

Out of scope, labeled: encryption and non-Flate filters raise
``NotImplementedError`` with the feature name (Type0 WITHOUT a
/ToUnicode CMap degrades to flagged U+FFFD text instead — see the
parser note above). Cross-reference/object streams joined the
implemented subset in round 13 (they were the former labeled
boundary — most post-2005 PDFs use them).
Text-run origins do not advance by glyph widths (no
font metrics shipped); every emitted run is positioned by its show
op's text matrix, which is exact for the fixture writers here and the
common one-show-per-line layout.

Staged in round 11 (pytest-proven: byte round-trip across all four
content styles x raw/Flate x direct/indirect /Length, escape/hex
strings, MediaBox inheritance AND override, nested page trees, xref
fallback on a damaged startxref, features == design constants through
the full encode->parse path, layout groups == the import-proven
cluster geometry, staged DuckDB oracles matching) for round-12
registration slots (the round-11 window is fully allocated — see
``__spark_entry__.py``'s rotation notes).

Reference scope: prasanthj/culvert has no document-container surface
(SURVEY §0); this extends the training-data document family mandated
by the build brief.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.imagesim import (
    _ND_CLUSTERS,
    _ND_SINGLETONS,
    hamming_py,
    phash_value_clusters,
)

_PDF_NBITS = 16
_PDF_GRID = 4                     # 4x4 occupancy grid -> 16 bits
_PDF_MEDIABOX = (612, 792)        # US-letter default, points


# ---------------------------------------------------------------------------
# Writer (fixture generation): minimal-but-valid PDF 1.4
# ---------------------------------------------------------------------------


def _esc_pdf_string(s: str) -> str:
    """Escape a text for a PDF LITERAL string: backslash, parens."""
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _num(v: float) -> str:
    """PDF number token: integer form when exact (the spec has one
    numeric type; this just keeps the files tidy and the tests
    readable). Non-integral values use FIXED-POINT formatting —
    ``repr()`` would emit exponent notation for tiny/huge magnitudes
    (``repr(1e-05) == '1e-05'``), which is not a valid PDF number
    token (ISO 32000-1 §7.3.3 has no exponent form) — round-11
    review."""
    if float(v) == int(v):
        return str(int(v))
    out = f"{float(v):.6f}".rstrip("0").rstrip(".")
    return out if out not in ("", "-") else "0"


#: CID = codepoint + _CID_DELTA in the ``cid`` fixture style — a
#: deliberately NON-identity glyph mapping, so a byte-shortcut decoder
#: (treating Identity-H codes as Unicode) provably fails and only the
#: /ToUnicode CMap path (ISO 32000-1 §9.10.3) yields the design text.
_CID_DELTA = 0x0100


def _tounicode_cmap(chars: set[str]) -> bytes:
    """A valid /ToUnicode CMap (ISO 32000-1 §9.10.3 Example 2 shape)
    mapping CID = cp + _CID_DELTA back to Unicode ``cp``, covering
    ``chars``: contiguous codepoint runs become ``bfrange`` entries
    (length > 1) and isolated codepoints ``bfchar`` — so one fixture
    exercises BOTH section forms."""
    cps = sorted(ord(c) for c in chars)
    runs: list[tuple[int, int]] = []
    for cp in cps:
        if runs and cp == runs[-1][1] + 1:
            runs[-1] = (runs[-1][0], cp)
        else:
            runs.append((cp, cp))
    bfchar = [(lo + _CID_DELTA, lo) for lo, hi in runs if lo == hi]
    bfrange = [
        (lo + _CID_DELTA, hi + _CID_DELTA, lo) for lo, hi in runs if hi > lo
    ]
    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS)"
        " /Supplement 0 >> def",
        "/CMapName /Fixture-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    if bfchar:
        parts.append(f"{len(bfchar)} beginbfchar")
        parts += [f"<{src:04X}> <{dst:04X}>" for src, dst in bfchar]
        parts.append("endbfchar")
    if bfrange:
        parts.append(f"{len(bfrange)} beginbfrange")
        parts += [
            f"<{lo:04X}> <{hi:04X}> <{dst:04X}>" for lo, hi, dst in bfrange
        ]
        parts.append("endbfrange")
    parts += [
        "endcmap",
        "CMapName currentdict /CMap defineresource pop",
        "end",
        "end",
    ]
    return "\n".join(parts).encode("latin-1")


def _sfnt_font(char_to_gid: dict[str, int]) -> bytes:
    """A minimal TrueType (sfnt) font program whose ``cmap`` maps each
    char to its glyph id — the table text extraction consults when a
    Type0 font ships NO /ToUnicode CMap (the OpenType/TrueType spec is
    public; Microsoft publishes the table layouts). head and maxp make
    the container structurally complete with true checksums; glyph
    outlines are irrelevant to extraction and omitted (the fixture
    exercises the cmap path, not rendering)."""
    import struct

    cps = sorted(ord(c) for c in char_to_gid)
    if not cps or cps[-1] >= 0xFFFF:
        raise ValueError("fixture font wants BMP chars below U+FFFF")
    # format-4 subtable: one segment per codepoint + the 0xFFFF closer
    segs = [(cp, cp, (char_to_gid[chr(cp)] - cp) & 0xFFFF) for cp in cps]
    segs.append((0xFFFF, 0xFFFF, 1))
    seg_count = len(segs)
    floor_log = seg_count.bit_length() - 1
    search_range = (1 << floor_log) * 2
    sub = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * seg_count, 0, seg_count * 2,
        search_range, floor_log, seg_count * 2 - search_range,
    )
    sub += b"".join(struct.pack(">H", end) for _, end, _ in segs)
    sub += b"\x00\x00"  # reservedPad
    sub += b"".join(struct.pack(">H", start) for start, _, _ in segs)
    sub += b"".join(struct.pack(">H", delta) for _, _, delta in segs)
    sub += b"\x00\x00" * seg_count  # idRangeOffset: all delta-mapped
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub

    head = struct.pack(
        ">HHIII HH qq hhhh HHhhh",
        1, 0,                # version 1.0
        0x00010000,          # fontRevision
        0,                   # checkSumAdjustment (not validated here)
        0x5F0F3CF5,          # magicNumber
        0, 1000,             # flags, unitsPerEm
        0, 0,                # created, modified (LONGDATETIME)
        0, 0, 1000, 1000,    # xMin yMin xMax yMax
        0, 8, 2, 0, 0,       # macStyle, lowestRecPPEM, direction,
    )                        # indexToLocFormat, glyphDataFormat
    maxp = struct.pack(
        ">IH", 0x00010000, max(char_to_gid.values()) + 1
    ) + b"\x00\x00" * 13

    def chk(b: bytes) -> int:
        b = b + b"\x00" * (-len(b) % 4)
        return sum(
            int.from_bytes(b[i : i + 4], "big") for i in range(0, len(b), 4)
        ) & 0xFFFFFFFF

    tables = [(b"cmap", cmap), (b"head", head), (b"maxp", maxp)]
    out = struct.pack(">IHHHH", 0x00010000, len(tables), 32, 1, 16)
    off = 12 + 16 * len(tables)
    body = b""
    for tag, tbl in tables:
        out += struct.pack(">4sIII", tag, chk(tbl), off, len(tbl))
        pad = tbl + b"\x00" * (-len(tbl) % 4)
        body += pad
        off += len(pad)
    return out + body


def _content_ops(
    elements: list[tuple[float, float, float, str]], style: str
) -> bytes:
    """Content-stream bytes showing each (x, y, size, text) element as
    exactly ONE text run at (x, y), via the operator family ``style``
    selects — so the extracted runs are style-INVARIANT by design and
    each style exercises a different parser path:

    - ``td``:    Tf + Td + literal-string Tj
    - ``tm``:    Tf + full text MATRIX (Tm) + Tj
    - ``tj``:    Tf + Td + a TJ array (two string halves + a kerning
                 number the extractor must skip)
    - ``quote``: Tf + TL/Td one line ABOVE + the ' (next-line-show)
                 operator
    - ``hex``:   Tf + Td + a HEX string operand to Tj
    - ``cid``:   /F2 (a COMPOSITE Type0/Identity-H font) + Td + a hex
                 string of 2-byte CIDs (CID = codepoint + _CID_DELTA,
                 a deliberately NON-identity mapping so extraction
                 must actually apply the /ToUnicode CMap)
    """
    leading = 14
    parts = []
    for x, y, size, text in elements:
        e = _esc_pdf_string(text)
        if style == "td":
            body = f"{_num(x)} {_num(y)} Td\n({e}) Tj"
        elif style == "tm":
            body = f"1 0 0 1 {_num(x)} {_num(y)} Tm\n({e}) Tj"
        elif style == "tj":
            m = text.find(" ", len(text) // 2)
            if m < 0:
                arr = f"[({e})]"
            else:
                a, b = text[: m + 1], text[m + 1 :]
                arr = (
                    f"[({_esc_pdf_string(a)}) -250 ({_esc_pdf_string(b)})]"
                )
            body = f"{_num(x)} {_num(y)} Td\n{arr} TJ"
        elif style == "quote":
            body = (
                f"{leading} TL\n{_num(x)} {_num(y + leading)} Td\n({e}) '"
            )
        elif style == "hex":
            hexstr = text.encode("latin-1").hex().upper()
            body = f"{_num(x)} {_num(y)} Td\n<{hexstr}> Tj"
        elif style == "cid":
            cidhex = "".join(f"{ord(ch) + _CID_DELTA:04X}" for ch in text)
            body = f"{_num(x)} {_num(y)} Td\n<{cidhex}> Tj"
        else:
            raise ValueError(f"unknown content style {style!r}")
        fname = "F2" if style == "cid" else "F1"
        parts.append(f"BT\n/{fname} {_num(size)} Tf\n{body}\nET")
    return "\n".join(parts).encode("latin-1")


def encode_pdf(
    pages: list[dict],
    style: str = "td",
    compress: bool = False,
    indirect_length: bool = False,
    nested: bool = False,
    mediabox: tuple[int, int] = _PDF_MEDIABOX,
    rotate: int = 0,
    xref: str = "table",
    objstm: bool = False,
    cid_map: str = "tounicode",
) -> bytes:
    """A real PDF file (header, numbered objects, cross-reference,
    trailer). Each page dict: ``{"elements": [(x, y, size,
    text), ...], "mediabox": (w, h) | None, "rotate": 0|90|180|270 |
    absent}`` — a None mediabox INHERITS the /MediaBox written on the
    /Pages node (the inheritance path), a concrete one overrides it on
    the page; ``rotate`` (the /Rotate viewer-rotation attribute, also
    inheritable) is written on the /Pages node when the TOP-LEVEL
    ``rotate`` is nonzero and overridden per page when the page dict
    carries one. ``compress`` Flate-encodes every content stream
    (/Filter /FlateDecode); ``indirect_length`` writes each stream's
    /Length as an indirect reference to a separate integer object
    (both forms are legal and both appear in the wild); ``nested``
    parents pages[1:] under an intermediate /Pages node (inheritance
    must survive tree depth).

    ``xref`` picks the cross-reference form: ``"table"`` writes the
    classic PDF 1.4 xref table + trailer; ``"stream"`` writes a PDF
    1.5 cross-reference STREAM (ISO 32000-1 §7.5.8 — /W [1 4 2] rows,
    Flate + the PNG Up row predictor the wild overwhelmingly uses,
    the stream dict doubling as the trailer). ``objstm`` (requires
    ``xref="stream"``) additionally packs every non-stream object
    except /Length integers into ONE compressed object stream
    (§7.5.7) referenced by type-2 xref entries — the post-2005
    "compressed PDF" shape.

    ``cid_map`` (``style="cid"`` only) picks how the composite font
    maps back to text: ``"tounicode"`` ships a /ToUnicode CMap (the
    default, as before); ``"fontfile"`` OMITS it and embeds a real
    TrueType program (/FontDescriptor /FontFile2) whose ``cmap``
    table carries the unicode->gid mapping — the common wild shape
    extraction must invert; ``"none"`` ships neither (the flagged
    U+FFFD boundary)."""
    if xref not in ("table", "stream"):
        raise ValueError(f"unknown xref form {xref!r}")
    if objstm and xref != "stream":
        raise ValueError("objstm=True requires xref='stream'")
    if cid_map not in ("tounicode", "fontfile", "none"):
        raise ValueError(f"unknown cid_map {cid_map!r}")
    n = len(pages)
    if nested and n < 2:
        raise ValueError("nested layout needs >= 2 pages")
    objs: dict[int, bytes] = {}
    page_ids = [4 + 2 * i for i in range(n)]
    content_ids = [5 + 2 * i for i in range(n)]
    next_id = 4 + 2 * n
    inner_pages_id = 0
    if nested:
        inner_pages_id = next_id
        next_id += 1

    kids_top = (
        page_ids
        if not nested
        else [page_ids[0], inner_pages_id]
    )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    rot_entry = f" /Rotate {int(rotate)}" if rotate else ""
    objs[2] = (
        "<< /Type /Pages /Kids ["
        + " ".join(f"{k} 0 R" for k in kids_top)
        + f"] /Count {n} /MediaBox [0 0 {_num(mediabox[0])}"
        f" {_num(mediabox[1])}]{rot_entry} >>"
    ).encode("latin-1")
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    type0_id = 0
    stream_obj_ids: set[int] = set()  # objects that ARE streams
    lenint_ids: set[int] = set()      # indirect /Length integers
    if style == "cid":
        # Composite Type0/Identity-H font (ISO 32000-1 §9.7): the
        # text-mapping channel cid_map selects, the CIDFontType2
        # descendant, and the Type0 dict — /F2 in every page's
        # resources.
        chars = {
            ch
            for page in pages
            for *_xyz, text in page["elements"]
            for ch in text
        }
        tounicode_entry = ""
        fdesc_entry = ""
        if cid_map == "tounicode":
            tounicode_id = next_id
            next_id += 1
            cmap = _tounicode_cmap(chars)
            cfilt = b""
            if compress:
                cmap = zlib.compress(cmap)
                cfilt = b" /Filter /FlateDecode"
            objs[tounicode_id] = (
                b"<< /Length %d%s >>\nstream\n" % (len(cmap), cfilt)
                + cmap
                + b"\nendstream"
            )
            stream_obj_ids.add(tounicode_id)
            tounicode_entry = f" /ToUnicode {tounicode_id} 0 R"
        elif cid_map == "fontfile":
            ff_id, fdesc_id = next_id, next_id + 1
            next_id += 2
            prog = _sfnt_font({ch: ord(ch) + _CID_DELTA for ch in chars})
            ffilt = b""
            raw_len = len(prog)
            if compress:
                prog = zlib.compress(prog)
                ffilt = b" /Filter /FlateDecode"
            objs[ff_id] = (
                b"<< /Length %d /Length1 %d%s >>\nstream\n"
                % (len(prog), raw_len, ffilt)
                + prog
                + b"\nendstream"
            )
            stream_obj_ids.add(ff_id)
            objs[fdesc_id] = (
                f"<< /Type /FontDescriptor /FontName /FixtureCID"
                f" /Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0"
                f" /Ascent 800 /Descent -200 /CapHeight 700 /StemV 80"
                f" /FontFile2 {ff_id} 0 R >>"
            ).encode("latin-1")
            fdesc_entry = f" /FontDescriptor {fdesc_id} 0 R"
        desc_id, type0_id = next_id, next_id + 1
        next_id += 2
        objs[desc_id] = (
            f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCID"
            f" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            f" /Supplement 0 >> /CIDToGIDMap /Identity{fdesc_entry} >>"
        ).encode("latin-1")
        objs[type0_id] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID"
            f" /Encoding /Identity-H /DescendantFonts [{desc_id} 0 R]"
            f"{tounicode_entry} >>"
        ).encode("latin-1")
    if nested:
        objs[inner_pages_id] = (
            "<< /Type /Pages /Parent 2 0 R /Kids ["
            + " ".join(f"{k} 0 R" for k in page_ids[1:])
            + f"] /Count {n - 1} >>"
        ).encode("latin-1")

    for i, page in enumerate(pages):
        parent = 2 if (not nested or i == 0) else inner_pages_id
        mb = page.get("mediabox")
        mb_entry = (
            f" /MediaBox [0 0 {_num(mb[0])} {_num(mb[1])}]" if mb else ""
        )
        page_rot = page.get("rotate")
        pr_entry = (
            f" /Rotate {int(page_rot)}" if page_rot is not None else ""
        )
        f2 = f" /F2 {type0_id} 0 R" if type0_id else ""
        objs[page_ids[i]] = (
            f"<< /Type /Page /Parent {parent} 0 R"
            f" /Resources << /Font << /F1 3 0 R{f2} >> >>"
            f" /Contents {content_ids[i]} 0 R{mb_entry}{pr_entry} >>"
        ).encode("latin-1")
        data = _content_ops(page["elements"], style)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b" /Filter /FlateDecode"
        if indirect_length:
            len_id = next_id
            next_id += 1
            objs[len_id] = str(len(data)).encode("latin-1")
            lenint_ids.add(len_id)
            len_entry = f"{len_id} 0 R".encode("latin-1")
        else:
            len_entry = str(len(data)).encode("latin-1")
        objs[content_ids[i]] = (
            b"<< /Length " + len_entry + filt + b" >>\nstream\n"
            + data
            + b"\nendstream"
        )
        stream_obj_ids.add(content_ids[i])

    compressed_at: dict[int, int] = {}  # obj num -> index in ObjStm
    objstm_id = 0
    if objstm:
        packable = [
            num
            for num in sorted(objs)
            if num not in stream_obj_ids and num not in lenint_ids
        ]
        objstm_id = next_id
        next_id += 1
        hdr_parts: list[str] = []
        off = 0
        for num in packable:
            hdr_parts.append(f"{num} {off}")
            off += len(objs[num]) + 1  # single-space separator below
        hdr = (" ".join(hdr_parts) + "\n").encode("latin-1")
        stm_body = hdr + b" ".join(objs[num] for num in packable)
        stm_data = zlib.compress(stm_body)
        for idx, num in enumerate(packable):
            compressed_at[num] = idx
            del objs[num]
        objs[objstm_id] = (
            b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n" % (len(packable), len(hdr),
                                           len(stm_data))
            + stm_data
            + b"\nendstream"
        )

    header = (
        b"%PDF-1.5\n%\xc2\xb5\xc2\xb6\n"
        if xref == "stream"
        else b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n"
    )  # binary marker line
    out = bytearray(header)
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1")
        out += objs[num]
        out += b"\nendobj\n"
    xref_at = len(out)
    if xref == "stream":
        # cross-reference STREAM (§7.5.8): /W [1 4 2] rows under the
        # PNG Up predictor — the shape real 1.5 writers emit.
        xref_id = next_id
        size = xref_id + 1
        rows: list[bytes] = []
        for num in range(size):
            if num in compressed_at:
                t, a, b = 2, objstm_id, compressed_at[num]
            elif num == xref_id:
                t, a, b = 1, xref_at, 0
            elif num in offsets:
                t, a, b = 1, offsets[num], 0
            else:  # object 0 + any gap: free
                t, a, b = 0, 0, 65535 if num == 0 else 0
            rows.append(
                bytes([t]) + a.to_bytes(4, "big") + b.to_bytes(2, "big")
            )
        raw = bytearray()
        prev = bytes(7)
        for r in rows:  # PNG Up filter per 7-byte row
            raw.append(2)
            raw += bytes((r[i] - prev[i]) & 0xFF for i in range(7))
            prev = r
        xdata = zlib.compress(bytes(raw))
        out += f"{xref_id} 0 obj\n".encode("latin-1")
        out += (
            f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R"
            f" /Filter /FlateDecode /DecodeParms << /Predictor 12"
            f" /Columns 7 >> /Length {len(xdata)} >>"
        ).encode("latin-1")
        out += b"\nstream\n" + xdata + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref_at}\n%%EOF\n".encode("latin-1")
        return bytes(out)
    max_id = max(objs)
    out += f"xref\n0 {max_id + 1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, max_id + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {max_id + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser (production path)
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    """Indirect object reference (``n g R``)."""

    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover — debug aid
        return f"_Ref({self.num})"


def _skip_ws(data: bytes, p: int) -> int:
    while p < len(data):
        c = data[p : p + 1]
        if c == b"%":  # comment to end of line
            while p < len(data) and data[p : p + 1] not in b"\r\n":
                p += 1
        elif c in _WS:
            p += 1
        else:
            break
    return p


def _parse_name(data: bytes, p: int) -> tuple[str, int]:
    assert data[p : p + 1] == b"/"
    p += 1
    out = bytearray()
    while p < len(data):
        c = data[p : p + 1]
        if c in _WS or c in _DELIM:
            break
        if c == b"#" and p + 2 < len(data):
            out.append(int(data[p + 1 : p + 3], 16))
            p += 3
        else:
            out += c
            p += 1
    return out.decode("latin-1"), p


def _parse_literal_string(data: bytes, p: int) -> tuple[bytes, int]:
    assert data[p : p + 1] == b"("
    p += 1
    out = bytearray()
    depth = 1
    esc = {
        b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
        b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\",
    }
    while p < len(data):
        c = data[p : p + 1]
        if c == b"\\":
            nxt = data[p + 1 : p + 2]
            if nxt in esc:
                out += esc[nxt]
                p += 2
            elif nxt and nxt in b"01234567":  # 1-3 OCTAL digits — \8/\9
                # are NOT octal (spec 7.3.4.2: the backslash is simply
                # dropped), and \48 is octal 4 then a literal '8'.
                q = p + 1
                while (
                    q < min(p + 4, len(data))
                    and data[q : q + 1] in b"01234567"
                ):
                    q += 1
                out.append(int(data[p + 1 : q], 8) & 0xFF)
                p = q
            elif nxt in b"\r\n":  # line continuation
                p += 2
                if nxt == b"\r" and data[p : p + 1] == b"\n":
                    p += 1
            else:  # lone backslash: drop it (spec)
                p += 1
        elif c == b"(":
            depth += 1
            out += c
            p += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), p + 1
            out += c
            p += 1
        else:
            out += c
            p += 1
    raise ValueError("unterminated PDF literal string")


def _parse_hex_string(data: bytes, p: int) -> tuple[bytes, int]:
    assert data[p : p + 1] == b"<"
    end = data.index(b">", p)
    hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data[p + 1 : end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    return bytes.fromhex(hx.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KW_RE = re.compile(rb"[A-Za-z']['\"A-Za-z*0-9]*|\"")


def _parse_obj(data: bytes, p: int):
    """Parse ONE object of the PDF object syntax at ``p`` (after any
    whitespace); returns (value, next_pos). Indirect references are
    collapsed to :class:`_Ref` via number-number-R lookahead."""
    p = _skip_ws(data, p)
    c = data[p : p + 1]
    if c == b"<":
        if data[p : p + 2] == b"<<":
            p += 2
            d: dict[str, object] = {}
            while True:
                p = _skip_ws(data, p)
                if data[p : p + 2] == b">>":
                    return d, p + 2
                key, p = _parse_name(data, p)
                val, p = _parse_obj(data, p)
                d[key] = val
        return _parse_hex_string(data, p)
    if c == b"(":
        return _parse_literal_string(data, p)
    if c == b"/":
        return _parse_name(data, p)
    if c == b"[":
        p += 1
        arr: list[object] = []
        while True:
            p = _skip_ws(data, p)
            if data[p : p + 1] == b"]":
                return arr, p + 1
            val, p = _parse_obj(data, p)
            arr.append(val)
    m = _NUM_RE.match(data, p)
    if m:
        tok = m.group(0)
        p2 = m.end()
        # indirect ref lookahead: <int> <int> R
        if b"." not in tok:
            q = _skip_ws(data, p2)
            m2 = _NUM_RE.match(data, q)
            if m2 and b"." not in m2.group(0):
                r = _skip_ws(data, m2.end())
                if data[r : r + 1] == b"R" and (
                    r + 1 >= len(data)
                    or data[r + 1 : r + 2] in _WS
                    or data[r + 1 : r + 2] in _DELIM
                ):
                    return _Ref(int(tok)), r + 1
            return int(tok), p2
        return float(tok), p2
    m = _KW_RE.match(data, p)
    if m:
        kw = m.group(0)
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        # content-stream OPERATOR (Tj, TJ, ', ", BT, ...)
        return ("op", kw.decode("latin-1")), m.end()
    raise ValueError(f"cannot parse PDF object at byte {p}")


def _ttf_gid_to_unicode(font: bytes) -> dict[int, str]:
    """glyph-id -> unicode char, inverted from a TrueType/OpenType
    ``cmap`` table (public spec; subtable formats 0, 4, 6 and 12) —
    what extraction needs under Identity CID-to-GID when a Type0 font
    has no /ToUnicode. Preference order mirrors real extractors:
    (3,10)/(0,4+) full-Unicode format 12, then (3,1)/(0,*) BMP.
    When several codepoints share a glyph the SMALLEST wins (stable).
    Any structural problem returns {} — the caller falls back to the
    flagged-U+FFFD boundary, never an error."""
    import struct

    try:
        (num_tables,) = struct.unpack_from(">H", font, 4)
        cmap_off = None
        for i in range(num_tables):
            tag, _, off, _ = struct.unpack_from(
                ">4sIII", font, 12 + 16 * i
            )
            if tag == b"cmap":
                cmap_off = off
                break
        if cmap_off is None:
            return {}
        (n_sub,) = struct.unpack_from(">H", font, cmap_off + 2)
        best: tuple[int, int] | None = None  # (priority, abs offset)
        for i in range(n_sub):
            plat, enc, off = struct.unpack_from(
                ">HHI", font, cmap_off + 4 + 8 * i
            )
            if (plat, enc) == (3, 10) or (plat == 0 and enc >= 4):
                pri = 0
            elif (plat, enc) == (3, 1) or plat == 0:
                pri = 1
            else:
                pri = 2
            if best is None or pri < best[0]:
                best = (pri, cmap_off + off)
        if best is None:
            return {}
        at = best[1]
        (fmt,) = struct.unpack_from(">H", font, at)
        cp_to_gid: dict[int, int] = {}
        if fmt == 0:
            for c in range(256):
                gid = font[at + 6 + c]
                if gid:
                    cp_to_gid.setdefault(c, gid)
        elif fmt == 4:
            (seg_x2,) = struct.unpack_from(">H", font, at + 6)
            segn = seg_x2 // 2
            ends = struct.unpack_from(f">{segn}H", font, at + 14)
            starts = struct.unpack_from(
                f">{segn}H", font, at + 16 + seg_x2
            )
            deltas = struct.unpack_from(
                f">{segn}h", font, at + 16 + 2 * seg_x2
            )
            ro_base = at + 16 + 3 * seg_x2
            ros = struct.unpack_from(f">{segn}H", font, ro_base)
            for i in range(segn):
                for c in range(starts[i], min(ends[i], 0xFFFE) + 1):
                    if ros[i] == 0:
                        gid = (c + deltas[i]) & 0xFFFF
                    else:
                        addr = (
                            ro_base + 2 * i + ros[i]
                            + 2 * (c - starts[i])
                        )
                        (raw,) = struct.unpack_from(">H", font, addr)
                        gid = (raw + deltas[i]) & 0xFFFF if raw else 0
                    if gid:
                        cp_to_gid.setdefault(c, gid)
        elif fmt == 6:
            first, count = struct.unpack_from(">HH", font, at + 6)
            gids = struct.unpack_from(f">{count}H", font, at + 10)
            for k, gid in enumerate(gids):
                if gid:
                    cp_to_gid.setdefault(first + k, gid)
        elif fmt == 12:
            (n_groups,) = struct.unpack_from(">I", font, at + 12)
            for g in range(n_groups):
                s, e, gid0 = struct.unpack_from(
                    ">III", font, at + 16 + 12 * g
                )
                if e - s > 0x10FFFF:  # malformed: bound the loop
                    continue
                for k in range(e - s + 1):
                    cp_to_gid.setdefault(s + k, gid0 + k)
        else:
            return {}
        out: dict[int, str] = {}
        for c in sorted(cp_to_gid):  # smallest codepoint per gid wins
            # surrogates (D800-DFFF) are not encodable characters —
            # chr() would later crash .encode('utf-8') in the digest
            # path (review); skip so the glyph degrades to U+FFFD.
            if 0xD800 <= c <= 0xDFFF or c > 0x10FFFF:
                continue
            out.setdefault(cp_to_gid[c], chr(c))
        return out
    except (struct.error, IndexError, ValueError):
        return {}


def _parse_cmap(
    data: bytes,
) -> tuple[set[int], dict[bytes, str], list[tuple[bytes, bytes]]]:
    """Parse a /ToUnicode CMap stream (ISO 32000-1 §9.10.3): returns
    (source-code byte widths from codespacerange, raw-code-bytes ->
    text map, the codespace ranges themselves as (lo, hi) byte pairs —
    needed to disambiguate MIXED-width CMaps, where the same integer
    names different codes at different widths, so the map is keyed by
    the raw bytes). Destination strings are UTF-16BE; a ``bfrange``
    with a hex-string destination increments the LAST code unit per
    the spec (the integer-increment form below). A malformed range
    whose destinations would overflow the destination byte width is
    truncated at the overflow point instead of raising (round-12
    ADVICE — forgiving parse path). Tokens reuse the object parser
    (hex strings, arrays, names, numbers); unrecognized PostScript
    operators (def, begin, findresource, ...) just flush pending
    operands, so wrapper boilerplate costs nothing."""
    widths: set[int] = set()
    mapping: dict[bytes, str] = {}
    ranges: list[tuple[bytes, bytes]] = []
    stack: list[object] = []
    p = 0
    n = len(data)
    while p < n:
        p = _skip_ws(data, p)
        if p >= n:
            break
        val, p = _parse_obj(data, p)
        if not (isinstance(val, tuple) and val and val[0] == "op"):
            stack.append(val)
            continue
        op = val[1]
        if op in ("begincodespacerange", "beginbfchar", "beginbfrange"):
            stack.clear()
            continue
        if op == "endcodespacerange":
            for lo, hi in zip(stack[0::2], stack[1::2]):
                # zero-width entries (<> <>) are malformed and would
                # make the decoder consume 0 bytes per code (review:
                # infinite loop) — drop them at the parse layer.
                if isinstance(lo, bytes) and lo:
                    widths.add(len(lo))
                    if isinstance(hi, bytes) and len(hi) == len(lo):
                        ranges.append((lo, hi))
        elif op == "endbfchar":
            for src, dst in zip(stack[0::2], stack[1::2]):
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    mapping[src] = dst.decode("utf-16-be", "replace")
        elif op == "endbfrange":
            for lo, hi, dst in zip(stack[0::3], stack[1::3], stack[2::3]):
                if not (
                    isinstance(lo, bytes)
                    and isinstance(hi, bytes)
                    and len(lo) == len(hi)
                ):
                    continue
                lo_i = int.from_bytes(lo, "big")
                hi_i = int.from_bytes(hi, "big")
                if hi_i - lo_i >= 0x10000:  # malformed/adversarial
                    continue  # span: no real ToUnicode exceeds 2^16
                w = len(lo)
                if isinstance(dst, list):  # [dst0 dst1 ...] form
                    for k, d in enumerate(dst):
                        if isinstance(d, bytes) and lo_i + k <= hi_i:
                            mapping[(lo_i + k).to_bytes(w, "big")] = (
                                d.decode("utf-16-be", "replace")
                            )
                elif isinstance(dst, bytes) and dst:
                    base = int.from_bytes(dst, "big")
                    limit = 1 << (8 * len(dst))
                    for k in range(hi_i - lo_i + 1):
                        if base + k >= limit:  # malformed range: the
                            break  # destination crossed its byte width
                        mapping[(lo_i + k).to_bytes(w, "big")] = (
                            (base + k).to_bytes(len(dst), "big")
                            .decode("utf-16-be", "replace")
                        )
        stack.clear()
    return widths, mapping, ranges


def _png_unpredict(body: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (RFC 2083 §6; applied per ISO
    32000-1 §7.4.4.4 when /DecodeParms /Predictor >= 10): each row is
    a filter-type byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth)
    followed by ``columns * colors * bpc/8`` filtered bytes. Xref
    streams in the wild are almost always Up-filtered; all five types
    are implemented from the public spec."""
    bpp = max(1, (colors * bpc) // 8)  # bytes per sample pixel
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(rowlen)
    p, n = 0, len(body)
    while p < n:
        ft = body[p]
        row = bytearray(body[p + 1 : p + 1 + rowlen])
        if len(row) < rowlen:
            raise ValueError("predictor row truncated")
        p += 1 + rowlen
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG predictor filter {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


class PdfDocument:
    """Parsed PDF: object access, page tree, text runs. Reads BOTH
    cross-reference forms — classic tables (PDF 1.0+) and
    cross-reference STREAMS with compressed object streams (PDF 1.5,
    ISO 32000-1 §7.5.7/§7.5.8, the post-2005 default) — plus the
    hybrid-reference /XRefStm shape (§7.5.8.4)."""

    def __init__(self, data: bytes):
        self.data = data
        self._cache: dict[int, object] = {}
        self._objstms: dict[int, dict[int, object]] = {}
        self._fontprogs: dict[int, dict[int, str]] = {}
        try:
            self.offsets, self.root_ref = self._load_xref()
        except NotImplementedError:
            raise  # unsupported FILTER on the xref stream: the labeled
            # boundary surfaces by name, not the scan fallback (review)
        except Exception:
            # damaged/absent xref: scan for "N 0 obj" markers — the
            # standard robust-reader fallback (objects living INSIDE
            # object streams are not scannable; a damaged 1.5 file
            # degrades to its directly-stored objects).
            self.offsets, self.root_ref = self._scan_objects()

    # -- cross-reference machinery -----------------------------------

    def _load_xref(self) -> tuple[dict[int, int | None], _Ref]:
        data = self.data
        at = data.rindex(b"startxref")
        start = int(data[at + 9 : data.index(b"%%EOF", at)].strip())
        offsets: dict[int, int | None] = {}
        root = None
        seen = set()
        while True:
            if start in seen:
                raise ValueError("xref /Prev cycle")
            seen.add(start)
            p = _skip_ws(data, start)
            if data[p : p + 4] != b"xref":
                # an OBJECT at the startxref target is the PDF 1.5
                # cross-reference STREAM shape (§7.5.8) — read it;
                # anything else is damage, which the caller's scan
                # fallback handles (don't mislabel a shifted classic
                # table as an xref stream).
                if re.match(rb"\d+\s+\d+\s+obj\b", data[p : p + 32]):
                    xd = self._read_xref_stream(p, offsets)
                    if root is None and "Root" in xd:
                        root = xd["Root"]
                    if "Prev" in xd:
                        start = int(xd["Prev"])  # type: ignore[arg-type]
                        continue
                    break
                raise ValueError(
                    "startxref does not point at a classic xref table"
                )
            p = _skip_ws(data, p + 4)
            while not data.startswith(b"trailer", p):
                m = _NUM_RE.match(data, p)
                first = int(m.group(0))
                p = _skip_ws(data, m.end())
                m = _NUM_RE.match(data, p)
                count = int(m.group(0))
                p = _skip_ws(data, m.end())
                for i in range(count):
                    entry = data[p : p + 20]
                    # freed ('f') entries record a None sentinel so a
                    # NEWER section's deletion shadows an OLDER
                    # section's in-use offset across the /Prev chain
                    # (referencing a free object reads as null, spec
                    # 7.3.10) — setdefault keeps newest-wins either way.
                    offsets.setdefault(
                        first + i,
                        int(entry[:10]) if entry[17:18] == b"n" else None,
                    )
                    p += 20
                p = _skip_ws(data, p)
            trailer, _ = _parse_obj(data, p + 7)
            if "XRefStm" in trailer:
                # hybrid-reference file (§7.5.8.4): the update's xref
                # STREAM supplements its classic table — compressed
                # objects the table marks free are defined there, so
                # its entries may fill this section's free marks.
                self._read_xref_stream(
                    int(trailer["XRefStm"]), offsets, hybrid=True
                )
            if root is None and "Root" in trailer:
                root = trailer["Root"]
            if "Prev" in trailer:
                start = int(trailer["Prev"])  # type: ignore[arg-type]
            else:
                break
        if not isinstance(root, _Ref):
            raise ValueError("trailer has no /Root reference")
        return offsets, root

    def _read_xref_stream(
        self, pos: int, offsets: dict, hybrid: bool = False
    ) -> dict:
        """Read one cross-reference STREAM object at byte ``pos``
        (ISO 32000-1 §7.5.8): /W field widths, /Index subsections
        (default [0 /Size]), row types 0 (free), 1 (byte offset) and
        2 (compressed: (object-stream number, index) tuple entries in
        ``offsets``); unknown types read as null per the spec's
        forward-compatibility rule. Returns the stream dict, which
        doubles as the trailer (/Root /Prev live in it). ``hybrid``
        lets entries fill slots the SAME update's classic table marked
        free (§7.5.8.4 — the table hides compressed objects from
        pre-1.5 readers; precedence between a hybrid stream and a
        LATER update's true deletion is resolved in the later update's
        favor only when that deletion names a different generation,
        which fixture-free real files do not exercise)."""
        got = self._parse_object_at(pos)
        if not (isinstance(got, tuple) and len(got) == 2):
            raise ValueError("xref stream object has no stream body")
        xd, body = got
        if xd.get("Type") != "XRef":
            raise ValueError("startxref object is not /Type /XRef")
        w = [int(x) for x in xd["W"]]
        if len(w) != 3 or any(x < 0 for x in w):
            raise ValueError(f"bad /W {w!r}")
        rw = sum(w)
        size = int(xd["Size"])
        index = [int(x) for x in xd.get("Index", [0, size])]
        p = 0
        for start_num, count in zip(index[0::2], index[1::2]):
            for k in range(count):
                row = body[p : p + rw]
                p += rw
                if len(row) < rw:
                    raise ValueError("xref stream data truncated")
                # width-0 type field defaults to 1 (§7.5.8.3 note)
                t = int.from_bytes(row[: w[0]], "big") if w[0] else 1
                f2 = int.from_bytes(row[w[0] : w[0] + w[1]], "big")
                f3 = int.from_bytes(row[w[0] + w[1] :], "big")
                num = start_num + k
                if t == 1:
                    entry: object = f2
                elif t == 2:
                    entry = (f2, f3)
                else:  # 0 = free; >2 = unknown -> null (spec rule)
                    entry = None
                if hybrid and num in offsets and offsets[num] is None:
                    offsets[num] = entry
                else:
                    offsets.setdefault(num, entry)
        return xd

    def _objstm_objects(self, num: int) -> dict[int, object]:
        """All objects of object stream ``num`` (§7.5.7), parsed once
        and cached: the first /First bytes are N (objnum, offset)
        integer pairs; each object body is a direct object at
        First+offset. The container itself must be directly stored
        (type-1) — the spec forbids nesting."""
        if num in self._objstms:
            return self._objstms[num]
        if isinstance(self.offsets.get(num), tuple):
            raise ValueError(f"object stream {num} nested in a stream")
        got = self.obj(num)
        if not (isinstance(got, tuple) and len(got) == 2):
            raise ValueError(f"object {num} is not an object stream")
        d, body = got
        if d.get("Type") != "ObjStm":
            raise ValueError(f"object {num} is not /Type /ObjStm")
        n = int(self.resolve(d["N"]))
        first = int(self.resolve(d["First"]))
        heads = []
        p = 0
        for _ in range(2 * n):
            p = _skip_ws(body, p)
            m = _NUM_RE.match(body, p)
            if not m:
                raise ValueError("object stream header truncated")
            heads.append(int(m.group(0)))
            p = m.end()
        objs: dict[int, object] = {}
        for objnum, off in zip(heads[0::2], heads[1::2]):
            val, _ = _parse_obj(body, first + off)
            objs[objnum] = val
        self._objstms[num] = objs
        return objs

    def _scan_objects(self) -> tuple[dict[int, int], _Ref]:
        offsets: dict[int, int] = {}
        for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b", self.data):
            offsets[int(m.group(1))] = m.start()
        # resolve() needs self.offsets during the scan (a stream's
        # /Length may be an indirect reference).
        self.offsets = offsets
        root = None
        for num in sorted(offsets):
            try:
                val = self._parse_indirect(num, offsets)
            except Exception:
                continue  # unparseable garbage between markers
            obj = val[0] if isinstance(val, tuple) else val
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                root = _Ref(num)
                break
        if root is None:
            raise ValueError("no /Type /Catalog object found in scan")
        return offsets, root

    # -- object access ------------------------------------------------

    def _parse_indirect(self, num: int, offsets: dict[int, int]):
        try:
            return self._parse_object_at(offsets[num])
        except ValueError as exc:
            raise ValueError(f"object {num}: {exc}") from None

    def _parse_object_at(self, at: int):
        """Parse the directly-stored indirect object starting at byte
        ``at``; stream objects return (dict, decoded-body)."""
        data = self.data
        p = _skip_ws(data, at)
        m = _NUM_RE.match(data, p)  # obj number
        p = _skip_ws(data, m.end())
        m = _NUM_RE.match(data, p)  # generation
        p = _skip_ws(data, m.end())
        if data[p : p + 3] != b"obj":
            raise ValueError("'obj' keyword missing")
        val, p = _parse_obj(data, p + 3)
        p = _skip_ws(data, p)
        if isinstance(val, dict) and data.startswith(b"stream", p):
            p += 6
            if data[p : p + 2] == b"\r\n":
                p += 2
            elif data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(val["Length"])
            raw = data[p : p + int(length)]
            filt = val.get("Filter")
            if filt is None:
                body = raw
            elif filt == "FlateDecode" or filt == ["FlateDecode"]:
                body = zlib.decompress(raw)
            else:
                raise NotImplementedError(
                    f"PDF stream filter {filt!r} not supported "
                    "(FlateDecode only)"
                )
            parms = self.resolve(val.get("DecodeParms"))
            if isinstance(parms, list) and len(parms) == 1:
                parms = parms[0]
            if isinstance(parms, dict):
                pred = int(self.resolve(parms.get("Predictor", 1)))
                if pred >= 10:  # PNG row predictors (§7.4.4.4)
                    body = _png_unpredict(
                        body,
                        int(self.resolve(parms.get("Columns", 1))),
                        int(self.resolve(parms.get("Colors", 1))),
                        int(self.resolve(parms.get(
                            "BitsPerComponent", 8
                        ))),
                    )
                elif pred not in (1,):
                    raise NotImplementedError(
                        f"/Predictor {pred} not supported "
                        "(PNG predictors and none only)"
                    )
            return (val, body)
        return val

    def obj(self, num: int):
        if num not in self._cache:
            ent = self.offsets.get(num)
            # absent or freed (None sentinel) objects read as null
            if ent is None:
                self._cache[num] = None
            elif isinstance(ent, tuple):  # type-2: inside an ObjStm
                self._cache[num] = self._objstm_objects(ent[0]).get(num)
            else:
                self._cache[num] = self._parse_indirect(num, self.offsets)
        return self._cache[num]

    def resolve(self, v):
        """Follow indirect references (possibly chained) to a value."""
        while isinstance(v, _Ref):
            v = self.obj(v.num)
        return v

    # -- page tree -----------------------------------------------------

    def pages(self) -> list[dict]:
        """Leaf /Page dicts in tree order, each with the INHERITED
        ``MediaBox``, ``Rotate`` (viewer rotation, normalized to
        0/90/180/270) and ``Resources`` (ISO 32000-1 §7.7.3.4 lists all
        three as inheritable) resolved onto the returned dict."""
        catalog = self.resolve(self.root_ref)
        out: list[dict] = []

        def walk(node_ref, inherited_mb, inherited_rot, inherited_res):
            node = self.resolve(node_ref)
            mb = node.get("MediaBox", inherited_mb)
            rot = node.get("Rotate", inherited_rot)
            res = node.get("Resources", inherited_res)
            if node.get("Type") == "Page":
                page = dict(node)
                if res is not None:
                    page["Resources"] = res
                page["MediaBox"] = [self.resolve(x) for x in mb]
                # snap to the nearest multiple of 90: the spec requires
                # one, but malformed values (45, 90.5) occur in the
                # wild — truncating or passing them through would make
                # the display-space consumers silently fall back to
                # content space. Half-up via floor division, NOT
                # round() (banker's rounding snapped 45 down but 135
                # up — self-review), so midpoints snap symmetrically.
                raw = float(self.resolve(rot) or 0)
                page["Rotate"] = int((raw + 45) // 90) * 90 % 360
                out.append(page)
                return
            for kid in self.resolve(node["Kids"]):
                walk(kid, mb, rot, res)

        walk(catalog["Pages"], None, 0, None)
        return out

    def _page_content(self, page: dict) -> bytes:
        contents = page["Contents"]
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            obj = self.resolve(r)
            if not (isinstance(obj, tuple) and len(obj) == 2):
                raise ValueError("/Contents object is not a stream")
            parts.append(obj[1])
        return b"\n".join(parts)

    # -- text extraction ----------------------------------------------

    def _type0_program_decoder(self, font):
        """Decoder for a Type0 font WITHOUT /ToUnicode via the
        embedded TrueType program's own ``cmap`` table (round 13 —
        formerly a labeled boundary): CID -> GID through /CIDToGIDMap
        (Identity or the 2-bytes-per-CID stream map, §9.7.4.3), GID ->
        unicode through the inverted font cmap. None when there is no
        usable /FontFile2 — the caller keeps the flagged-U+FFFD
        fallback, never an error."""
        try:
            dfs = self.resolve(font.get("DescendantFonts"))
            if not (isinstance(dfs, list) and dfs):
                return None
            df = self.resolve(dfs[0])
            if not isinstance(df, dict):
                return None
            fd = self.resolve(df.get("FontDescriptor"))
            if not isinstance(fd, dict):
                return None
            ff_ref = fd.get("FontFile2")
            ff = self.resolve(ff_ref)
            if not (isinstance(ff, tuple) and len(ff) == 2):
                return None
            # memoize the inverted cmap per font PROGRAM: page_runs
            # builds decoders per page, and re-walking a format-4/12
            # table per page of a long document is pure waste (review)
            if isinstance(ff_ref, _Ref) and ff_ref.num in self._fontprogs:
                g2u = self._fontprogs[ff_ref.num]
            else:
                g2u = _ttf_gid_to_unicode(ff[1])
                if isinstance(ff_ref, _Ref):
                    self._fontprogs[ff_ref.num] = g2u
            if not g2u:
                return None
            c2g = self.resolve(df.get("CIDToGIDMap", "Identity"))
            gid_map = None
            if isinstance(c2g, tuple) and len(c2g) == 2:
                gid_map = c2g[1]
            elif c2g not in (None, "Identity"):
                return None
        except Exception:
            return None  # damaged font machinery: keep the fallback

        def dec(bs: bytes) -> str:
            out = []
            i, n = 0, len(bs)
            while i + 2 <= n:
                cid = int.from_bytes(bs[i : i + 2], "big")
                if gid_map is None:
                    gid = cid
                elif 2 * cid + 1 < len(gid_map):
                    gid = int.from_bytes(
                        gid_map[2 * cid : 2 * cid + 2], "big"
                    )
                else:
                    gid = 0
                out.append(g2u.get(gid, "�"))
                i += 2
            if i < n:  # trailing partial code: flagged
                out.append("�")
            return "".join(out)

        return dec

    def _text_decoder(self, font):
        """bytes -> str decoder for one font dict (ISO 32000-1 §9.10.2
        extraction order: /ToUnicode CMap first, then the embedded
        font program's cmap). Simple fonts without a CMap keep the
        byte decode; a composite Type0 font with NEITHER /ToUnicode
        NOR a readable /FontFile2 cmap yields U+FFFD per 2-byte code —
        the residual labeled boundary (a CFF /FontFile3 charset, or no
        embedded program at all, is not spec-reproducible text)."""
        if not isinstance(font, dict):
            return lambda bs: bs.decode("latin-1")
        is_type0 = font.get("Subtype") == "Type0"
        tu = font.get("ToUnicode")
        if tu is None:
            if is_type0:
                dec = self._type0_program_decoder(font)
                if dec is not None:
                    return dec
                return lambda bs: "�" * (len(bs) // 2)
            return lambda bs: bs.decode("latin-1")
        obj = self.resolve(tu)
        if not (isinstance(obj, tuple) and len(obj) == 2):
            raise ValueError("/ToUnicode is not a stream")
        widths, mapping, ranges = _parse_cmap(obj[1])
        if len(widths) <= 1:
            width = next(iter(widths)) if widths else (2 if is_type0 else 1)
            # sloppy real-world CMaps write bfchar sources NARROWER
            # than the codespace width (<41> under <0000> <FFFF>);
            # the old integer keying matched them, so index the
            # zero-padded form too (review: keying regression).
            for k in [k for k in mapping if len(k) < width]:
                mapping.setdefault(k.rjust(width, b"\x00"), mapping[k])

            def dec(bs: bytes) -> str:
                out = []
                i = 0
                while i + width <= len(bs):
                    out.append(mapping.get(bs[i : i + width], "�"))
                    i += width
                if i < len(bs):  # trailing partial code: flagged
                    out.append("�")
                return "".join(out)

            return dec

        # MIXED-width codespace (round-12 ADVICE: was max(widths), which
        # misdecodes every narrower code): match each position against
        # the codespace ranges shortest-width-first (ISO 32000-1
        # §9.7.6.3's matching order); a position in no range consumes
        # the narrowest width and flags U+FFFD. Containment is PER
        # BYTE (§9.7.6.2: each byte between the bounds' corresponding
        # bytes), not lexicographic — <9020> is OUTSIDE <8140> <FC7E>
        # even though it sorts between them (review).
        order = sorted(widths)
        by_width = [
            (w, [(lo, hi) for lo, hi in ranges if len(lo) == w])
            for w in order
        ]

        def in_range(code: bytes, lo: bytes, hi: bytes) -> bool:
            return all(
                lo[i] <= code[i] <= hi[i] for i in range(len(code))
            )

        def dec_multi(bs: bytes) -> str:
            out = []
            i, n = 0, len(bs)
            while i < n:
                for w, rs in by_width:
                    code = bs[i : i + w]
                    if len(code) == w and any(
                        in_range(code, lo, hi) for lo, hi in rs
                    ):
                        out.append(mapping.get(code, "�"))
                        i += w
                        break
                else:  # no codespace matches: flag one narrow code
                    out.append("�")
                    i += order[0]
            return "".join(out)

        return dec_multi

    @staticmethod
    def _mat_mul(m1, m2):
        a1, b1, c1, d1, e1, f1 = m1
        a2, b2, c2, d2, e2, f2 = m2
        return (
            a1 * a2 + b1 * c2,
            a1 * b2 + b1 * d2,
            c1 * a2 + d1 * c2,
            c1 * b2 + d1 * d2,
            e1 * a2 + f1 * c2 + e2,
            e1 * b2 + f1 * d2 + f2,
        )

    def page_runs(self, page: dict) -> list[tuple[float, float, float, str]]:
        """(x, y, size, text) per show operator, at the op's text-space
        origin (see the module note on glyph-width advance). Show-string
        bytes decode through the font the last Tf selected (resolved
        from the page's — possibly inherited — /Resources /Font dict):
        composite Type0 fonts via their /ToUnicode CMap, simple fonts
        byte-wise, unknown font names forgivingly byte-wise."""
        content = self._page_content(page)
        res = page.get("Resources")
        fontmap = {}
        if res is not None:
            fonts = self.resolve(self.resolve(res).get("Font"))
            if isinstance(fonts, dict):
                fontmap = fonts
        decoders: dict[str, object] = {}

        def latin1(bs: bytes) -> str:
            return bs.decode("latin-1")

        decoder = latin1
        ident = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        tm = tlm = ident
        size = 0.0
        leading = 0.0
        runs: list[tuple[float, float, float, str]] = []
        stack: list[object] = []
        p = 0
        n = len(content)

        def show(raw) -> None:
            if isinstance(raw, list):  # TJ: strings interleaved with
                text = b"".join(x for x in raw if isinstance(x, bytes))
            else:
                text = raw
            runs.append((tm[4], tm[5], size, decoder(text)))

        while True:
            p = _skip_ws(content, p)
            if p >= n:
                break
            val, p = _parse_obj(content, p)
            if not (isinstance(val, tuple) and val and val[0] == "op"):
                stack.append(val)
                continue
            op = val[1]
            if op == "BT":
                tm = tlm = ident
            elif op == "Tf":
                size = float(stack[-1])
                fname = stack[-2] if len(stack) >= 2 else None
                if isinstance(fname, str) and fname in fontmap:
                    if fname not in decoders:
                        decoders[fname] = self._text_decoder(
                            self.resolve(fontmap[fname])
                        )
                    decoder = decoders[fname]
                else:
                    decoder = latin1
            elif op == "TL":
                leading = float(stack[-1])
            elif op in ("Td", "TD"):
                ty = float(stack[-1])
                tx = float(stack[-2])
                if op == "TD":
                    leading = -ty
                tlm = self._mat_mul((1, 0, 0, 1, tx, ty), tlm)
                tm = tlm
            elif op == "Tm":
                tlm = tuple(float(x) for x in stack[-6:])
                tm = tlm
            elif op == "T*":
                tlm = self._mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
            elif op == "Tj":
                show(stack[-1])
            elif op == "TJ":
                show(stack[-1])
            elif op == "'":
                tlm = self._mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                show(stack[-1])
            elif op == '"':
                tlm = self._mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                show(stack[-1])  # aw/ac spacing operands are ignored
            # all other operators (ET, graphics state, ...) are no-ops
            # for text-run extraction
            stack.clear()
        return runs

    def doc_runs(self) -> list[tuple[int, float, float, float, str]]:
        """(page_no, x, y, size, text) across the whole document, page
        numbers 1-based in tree order."""
        out = []
        for i, page in enumerate(self.pages(), start=1):
            for x, y, size, text in self.page_runs(page):
                out.append((i, x, y, size, text))
        return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

PDF_FEATURES_SCHEMA = (
    "media_id bigint, n_pages int, n_runs int, n_chars int, n_tokens int, "
    "max_font int, title string, p1_width int, p1_height int"
)


def _features_of(payload: bytes) -> dict:
    """Per-document features in DISPLAY semantics: the title rule and
    page-1 geometry read the displayed page (through /Rotate, like the
    layout fingerprint and canonical text — round-11 self-review made
    all three consumers share one display-space helper), so a scanner's
    stored-rotated file features identically to its upright twin."""
    doc = PdfDocument(payload)
    pages = doc.pages()
    per_page = [doc.page_runs(p) for p in pages]  # each parsed ONCE
    runs = [r for rs in per_page for r in rs]
    n_chars = sum(len(t) for _, _, _, t in runs)
    n_tokens = sum(len(t.split()) for _, _, _, t in runs)
    p1, p1_w, p1_h = _display_page_runs(doc, pages[0], per_page[0])
    title = ""
    if p1:
        title = sorted(p1, key=lambda r: (-r[2], -r[1], r[0]))[0][3]
    return {
        "n_pages": len(pages),
        "n_runs": len(runs),
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "max_font": int(round(max((s for _, _, s, _ in runs),
                                  default=0.0))),
        "title": title,
        "p1_width": int(round(p1_w)),
        "p1_height": int(round(p1_h)),
    }


def pdf_doc_features(media: DataFrame) -> DataFrame:
    """Per-document PDF features — page/run/char/token counts, max
    font size, the page-1 title (largest font, then topmost y, then
    leftmost x), page-1 geometry — one narrow ``mapInPandas`` over
    (media_id, payload); no shuffle (the ORDER BY is the registered
    row's presentation sort)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = _features_of(bytes(payload))
                feats["media_id"] = int(mid)
                rows.append(feats)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_pages", "n_runs", "n_chars", "n_tokens",
                    "max_font", "title", "p1_width", "p1_height",
                ],
            )

    return (
        media.filter(F.col("kind") == "pdf")
        .select("media_id", "payload")
        .mapInPandas(extract, PDF_FEATURES_SCHEMA)
        .orderBy("media_id")
    )


def _display_point(
    x: float, y: float, rotate: int, w: float, h: float
) -> tuple[float, float, float, float]:
    """Map a content-space point onto the DISPLAYED page under the
    /Rotate viewer rotation (clockwise, spec 7.7.3.3): returns
    (dx, dy, display_w, display_h). Corners check out: R90 sends the
    content bottom-left (0,0) to display top-left (0, w) of the h×w
    displayed page."""
    if rotate == 90:
        return y, w - x, h, w
    if rotate == 180:
        return w - x, h - y, w, h
    if rotate == 270:
        return h - y, x, h, w
    return x, y, w, h


def _display_page_runs(
    doc: "PdfDocument", page: dict, raw_runs=None
) -> tuple[list[tuple[float, float, float, str]], float, float]:
    """The page's text runs in DISPLAY space — origins mapped through
    /Rotate — plus the displayed page dims: the ONE helper behind
    every display-semantics consumer (features title/geometry, layout
    fingerprint, canonical text), so they cannot drift apart
    (round-11 self-review: features used to read content space while
    the dedup operators read display space, splitting rotated twins).
    Pass ``raw_runs`` when the content stream was already parsed — the
    features path computes all pages' runs once and must not inflate
    and tokenize page 1 a second time (self-review)."""
    mb = page["MediaBox"]
    x0, y0 = float(mb[0]), float(mb[1])
    w, h = float(mb[2]) - x0, float(mb[3]) - y0
    rot = page.get("Rotate", 0)
    _, _, dw, dh = _display_point(0.0, 0.0, rot, w, h)
    if raw_runs is None:
        raw_runs = doc.page_runs(page)
    runs = [
        (*_display_point(x - x0, y - y0, rot, w, h)[:2], size, text)
        for x, y, size, text in raw_runs
    ]
    return runs, dw, dh


def layout_fingerprint_of(payload: bytes) -> str:
    """16-bit page-1 layout occupancy grid: 4x4 cells over the page-1
    MediaBox AS DISPLAYED, bit (row * 4 + col) = 1 iff some text run
    ORIGINATES in the cell; row 0 is the TOP band (PDF y grows upward).
    Run origins are mapped through the page's /Rotate viewer rotation
    first, so the fingerprint describes what a READER sees — a scanned
    page stored rotated with /Rotate 90 (ubiquitous in scan corpora)
    fingerprints identically to its upright twin, making the layout
    dedup rotation-INVARIANT. Runs exactly on a cell boundary belong
    to the higher-index cell, and runs outside the MediaBox clamp to
    the border cells — both decisions are deterministic and shared
    with the fixture design, whose run origins sit at cell CENTERS
    (maximal margin from every boundary)."""
    doc = PdfDocument(payload)
    runs, dw, dh = _display_page_runs(doc, doc.pages()[0])
    bits = [0] * _PDF_NBITS
    for dx, dy, _, _ in runs:
        col = min(_PDF_GRID - 1, max(0, int(dx / (dw / _PDF_GRID))))
        row = min(_PDF_GRID - 1, max(0, int((dh - dy) / (dh / _PDF_GRID))))
        bits[row * _PDF_GRID + col] = 1
    return "".join(map(str, bits))


def content_layout_for_display(
    elements: list[tuple[float, float, float, str]],
    rotate: int,
    display_box: tuple[int, int] = _PDF_MEDIABOX,
) -> tuple[list[tuple[float, float, float, str]], tuple[int, int]]:
    """Inverse of :func:`_display_point`: the content-space elements
    (and content MediaBox) for a page STORED with ``rotate`` whose
    DISPLAYED layout equals ``elements`` on ``display_box`` — how a
    scanner that writes rotated pages produces them. Used by tests and
    fixture builders to prove the fingerprint's rotation invariance.
    ``rotate`` is normalized like the parser normalizes /Rotate
    (round-11 self-review: -90 used to swap the box but skip the
    coordinate transform, silently producing a corrupt fixture)."""
    rotate = int(rotate) % 360
    if rotate % 90:
        raise ValueError(f"rotate must be a multiple of 90, got {rotate}")
    dw, dh = display_box
    w, h = (dh, dw) if rotate % 180 else (dw, dh)
    out = []
    for dx, dy, size, text in elements:
        if rotate == 90:
            x, y = w - dy, dx
        elif rotate == 180:
            x, y = w - dx, h - dy
        elif rotate == 270:
            x, y = dy, h - dx
        else:
            x, y = dx, dy
        out.append((x, y, size, text))
    return out, (w, h)


def pdf_layout_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, fingerprint) for every pdf row: real parse + grid
    fold per document, one narrow ``mapInPandas`` — no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(mid),
                    "fingerprint": layout_fingerprint_of(bytes(payload)),
                }
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "fingerprint"])

    return (
        media.filter(F.col("kind") == "pdf")
        .select("media_id", "payload")
        .mapInPandas(extract, "media_id bigint, fingerprint string")
    )


def pdf_layout_dedup_groups(
    media: DataFrame, max_hamming: int = 2, bands: int = 4
) -> DataFrame:
    """Layout-template near-dup groups: one row per fingerprint
    cluster with document count, distinct-layout count, keeper (min
    media_id) and dupe count — documents sharing a template modulo
    ``max_hamming`` grid-cell edits group together even when their
    text differs entirely. Shares
    :func:`culvert_spark.imagesim.phash_value_clusters` (and therefore
    its bounded-value-domain, exact-pigeonhole-recall scale
    guarantees) verbatim."""
    prints = pdf_layout_fingerprints(media)
    clusters = phash_value_clusters(
        prints.select(F.col("fingerprint").alias("phash")),
        max_hamming,
        bands,
        _PDF_NBITS,
    )
    return (
        prints.join(
            F.broadcast(clusters), prints.fingerprint == clusters.phash
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_layouts"),
            F.min("media_id").alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Design-exact fixtures (round-12 registration candidates)
# ---------------------------------------------------------------------------

#: Three generated documents per layout variant: copy 0 raw content
#: streams, copy 1 Flate-COMPRESSED with entirely different text, and
#: copy 2 STORED ROTATED (content transformed + /Rotate set, the way
#: scanners emit sideways pages; angle cycles 90/180/270) — all the
#: same fingerprint by construction, so the grouping must collapse
#: them (n_layouts < n_docs): the compression/content/rotation axes
#: mirroring the image fixture's container axis and the audio
#: fixture's volume axis.
_PL_COPIES = 3

#: Content styles cycled per (variant, copy) so the registered layout
#: row exercises every text-operator path of the parser, not just Td.
_PL_STYLES = ["td", "tm", "tj", "quote", "hex"]


def _words(seed: str, n: int) -> str:
    """``n`` deterministic 4-hex-char words from an md5 chain — the
    document-text analog of mediagen's ``_md5_plane`` (pure python, so
    oracle builders can fold the SAME text the fixture embeds)."""
    out = []
    h = hashlib.md5(seed.encode("utf-8")).hexdigest()
    while len(out) < n:
        out.extend(h[i : i + 4] for i in range(0, 32, 4))
        h = hashlib.md5(h.encode("ascii")).hexdigest()
    return " ".join(out[:n])


def _elements_for_fingerprint(
    fp: str, seed: str
) -> list[tuple[float, float, float, str]]:
    """One 6-word, 10pt run at the CENTER of each set grid cell — a
    page whose layout fingerprint IS ``fp`` exactly (centers are
    maximally far from every cell boundary, so the grid fold cannot
    waver)."""
    w, h = _PDF_MEDIABOX
    els = []
    for b, bit in enumerate(fp):
        if bit != "1":
            continue
        row, col = divmod(b, _PDF_GRID)
        x = (col + 0.5) * (w / _PDF_GRID)
        y = h - (row + 0.5) * (h / _PDF_GRID)
        els.append((x, y, 10.0, _words(f"{seed}|cell{b}", 6)))
    return els


def near_dup_pdf_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus: the image
    fixture's import-proven cluster geometry re-used as target LAYOUT
    fingerprints, realized as real single-page PDFs (copy 1
    Flate-compressed with different text, copy 2 STORED ROTATED —
    fingerprint-identical by construction; content style cycles
    through every parser path). media_id scheme matches
    imagesim/audiosim: cluster c, variant v, copy k -> 1000c + 10v + k;
    singleton s -> 9000 + 100s + k."""
    spec = []  # (media_id, fingerprint, copy, style)
    for c, cl in enumerate(_ND_CLUSTERS):
        for v, fp in enumerate(cl):
            for k in range(_PL_COPIES):
                style = _PL_STYLES[(c * 3 + v + k) % len(_PL_STYLES)]
                spec.append((1000 * c + 10 * v + k, fp, k, style))
    for s, fp in enumerate(_ND_SINGLETONS):
        for k in range(_PL_COPIES):
            style = _PL_STYLES[(s + k) % len(_PL_STYLES)]
            spec.append((9000 + 100 * s + k, fp, k, style))
    spec_df = spark.createDataFrame(
        spec, "media_id bigint, fp string, copy int, style string"
    )

    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fp, copy, style in zip(
                pdf["media_id"], pdf["fp"], pdf["copy"], pdf["style"]
            ):
                els = _elements_for_fingerprint(fp, seed=f"doc{mid}")
                if copy == 2:  # stored-rotated twin (angle per doc)
                    rot = (90, 180, 270)[int(mid) % 3]
                    els, box = content_layout_for_display(els, rot)
                    pages = [{"elements": els, "rotate": rot}]
                    payload = encode_pdf(pages, style=str(style),
                                         mediabox=box)
                else:
                    payload = encode_pdf(
                        [{"elements": els}],
                        style=str(style),
                        compress=bool(copy % 2),
                    )
                rows.append({
                    "media_id": int(mid),
                    "kind": "pdf",
                    "payload": payload,
                    "meta": {"width": _PDF_MEDIABOX[0],
                             "height": _PDF_MEDIABOX[1],
                             "sample_rate": 0, "n_frames": 1},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spec_df.mapInPandas(encode, schema)


def pdf_layout_oracle() -> str:
    """Constant-folding DuckDB oracle from the fixture DESIGN (staged
    for a round-12 ``m_pdf_layout_dedup`` registration): same cluster
    geometry as the image/audio rows, compressed different-text copies
    collapsing onto one fingerprint (n_layouts = variants, n_docs =
    variants x copies)."""
    rows = []
    for c, cl in enumerate(_ND_CLUSTERS):
        rows.append((min(cl), len(cl) * _PL_COPIES, len(cl), 1000 * c))
    for s, fp in enumerate(_ND_SINGLETONS):
        rows.append((fp, _PL_COPIES, 1, 9000 + 100 * s))
    rows.sort()
    vals = ",\n      ".join(
        f"('{cid}', {nd}, {nl}, {kid}, {nd - 1})"
        for cid, nd, nl, kid in rows
    )
    return f"""
    SELECT cluster_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_layouts AS BIGINT) AS n_layouts,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(cluster_id, n_docs, n_layouts, keeper_id, n_dupes)
    ORDER BY cluster_id
    """


#: Feature-fixture DESIGN (the oracle's ground truth): five documents
#: covering every writer/parser axis — content style, Flate
#: compression, direct/indirect /Length, nested page trees, MediaBox
#: inheritance AND per-page override, escape-heavy text, hex strings.
#: Element = (x, y, size, n_words); the TEXT is _words(seed, n_words)
#: with seed "fdoc{media_id}|p{page}|e{idx}" — shared by the fixture
#: writer and the oracle builder, so the two cannot drift. Doc 103
#: APPENDS the escape-torture suffix _FEAT_ESCAPE_SUFFIX to every
#: element text (parens, backslashes — the literal-string escape
#: path).
_FEAT_ESCAPE_SUFFIX = " (q\\r)"
_FEAT_DOCS: list[dict] = [
    {
        "media_id": 100, "style": "td", "compress": False,
        "indirect_length": False, "nested": False,
        "pages": [
            {"mediabox": None,
             "elements": [(72, 720, 24, 4), (72, 680, 10, 8),
                          (72, 660, 10, 6)]},
        ],
    },
    {
        "media_id": 101, "style": "tm", "compress": True,
        "indirect_length": False, "nested": False,
        "pages": [
            {"mediabox": None,
             "elements": [(72, 700, 18, 5), (72, 650, 10, 9)]},
            {"mediabox": (400, 500),
             "elements": [(50, 450, 10, 7)]},
        ],
    },
    {
        "media_id": 102, "style": "tj", "compress": False,
        "indirect_length": True, "nested": True,
        "pages": [
            {"mediabox": None, "elements": [(72, 720, 14, 10)]},
            {"mediabox": None, "elements": [(72, 720, 10, 12)]},
            {"mediabox": None, "elements": [(300, 400, 10, 3)]},
        ],
    },
    {
        "media_id": 103, "style": "quote", "compress": True,
        "indirect_length": True, "nested": False, "escapes": True,
        "pages": [
            {"mediabox": None,
             "elements": [(72, 720, 20, 3), (72, 690, 10, 5)]},
        ],
    },
    {
        # 13.5pt: a FRACTIONAL font size, so the shared int(round(.))
        # rule is exercised end-to-end (writer emits "13.5", parser
        # floats it, both sides round to 14 — self-review pinned this
        # as a divergence channel when the oracle truncated instead).
        "media_id": 104, "style": "hex", "compress": False,
        "indirect_length": False, "nested": False,
        "pages": [
            {"mediabox": (300, 300),
             "elements": [(30, 270, 13.5, 6), (150, 150, 10, 4)]},
        ],
    },
    {
        # STORED ROTATED (round-11 self-review): element coords in
        # _FEAT_DOCS are DISPLAY-space design values — this doc stores
        # them transformed with /Rotate 90, so the features row (and
        # its oracle, which folds the design values directly) pins the
        # operator's display-space title/geometry contract; without
        # it, a content-space regression in _features_of would pass
        # on the upright docs alone.
        "media_id": 105, "style": "td", "compress": True,
        "indirect_length": False, "nested": False, "stored_rotate": 90,
        "pages": [
            {"mediabox": None,
             "elements": [(72, 720, 22, 4), (72, 680, 10, 7)]},
        ],
    },
]


def _feat_doc_text(doc: dict, page_idx: int, el_idx: int, n: int) -> str:
    text = _words(
        f"fdoc{doc['media_id']}|p{page_idx}|e{el_idx}", n
    )
    if doc.get("escapes"):
        text += _FEAT_ESCAPE_SUFFIX
    return text


def _feat_doc_pages(doc: dict) -> list[dict]:
    rot = doc.get("stored_rotate", 0)
    out = []
    for pi, page in enumerate(doc["pages"]):
        els = [
            (x, y, size, _feat_doc_text(doc, pi, ei, n))
            for ei, (x, y, size, n) in enumerate(page["elements"])
        ]
        if rot:  # design coords are DISPLAY values; store them rotated
            els, box = content_layout_for_display(
                els, rot, display_box=page["mediabox"] or _PDF_MEDIABOX
            )
            out.append({"mediabox": box, "elements": els, "rotate": rot})
        else:
            out.append({"mediabox": page["mediabox"], "elements": els})
    return out


def feature_pdf_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus for the features
    row: the five _FEAT_DOCS documents through ``encode_pdf`` — every
    writer axis in one corpus (see the design-constant note)."""
    payloads = [
        (
            doc["media_id"],
            encode_pdf(
                _feat_doc_pages(doc),
                style=doc["style"],
                compress=doc["compress"],
                indirect_length=doc["indirect_length"],
                nested=doc["nested"],
            ),
        )
        for doc in _FEAT_DOCS
    ]
    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )
    return spark.createDataFrame(
        [
            (
                mid,
                "pdf",
                bytearray(payload),
                (_PDF_MEDIABOX[0], _PDF_MEDIABOX[1], 0, 1),
            )
            for mid, payload in payloads
        ],
        schema,
    )


def pdf_features_oracle() -> str:
    """Constant-folding DuckDB oracle for the features row (staged for
    a round-12 ``m_pdf_doc_features`` registration): every expected
    value re-derived in pure python from _FEAT_DOCS + the SHARED
    ``_feat_doc_text`` generator — page counts from the page lists,
    run counts from the element lists (every content style shows each
    element as exactly ONE run), char/token counts from the generated
    text itself, the title from the (size desc, y desc, x asc) rule,
    page-1 geometry from the mediabox (None = the inherited default).
    The design coordinates are DISPLAY-space values — exactly the
    space the operator reads (round-11 self-review) — so this
    derivation is correct for the stored-rotated doc 105 too: its
    stored content is transformed, but what the operator extracts
    (and this oracle states) is the untransformed design."""
    rows = []
    for doc in _FEAT_DOCS:
        runs = []  # (page, x, y, size, text)
        for pi, page in enumerate(doc["pages"]):
            for ei, (x, y, size, n) in enumerate(page["elements"]):
                runs.append(
                    (pi + 1, x, y, size, _feat_doc_text(doc, pi, ei, n))
                )
        p1 = [r for r in runs if r[0] == 1]
        title = sorted(p1, key=lambda r: (-r[3], -r[2], r[1]))[0][4]
        mb = doc["pages"][0]["mediabox"] or _PDF_MEDIABOX
        rows.append((
            doc["media_id"],
            len(doc["pages"]),
            len(runs),
            sum(len(t) for _, _, _, _, t in runs),
            sum(len(t.split()) for _, _, _, _, t in runs),
            # same rounding rule as _features_of (int(round(.)) on both
            # sides — self-review: int() truncation would diverge from
            # the Spark row on fractional font sizes)
            int(round(max(s for _, _, _, s, _ in runs))),
            title,
            int(mb[0]),
            int(mb[1]),
        ))
    vals = ",\n      ".join(
        "({}, {}, {}, {}, {}, {}, '{}', {}, {})".format(
            mid, np_, nr, nc, nt, mf, title.replace("'", "''"), w, h
        )
        for mid, np_, nr, nc, nt, mf, title, w, h in rows
    )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_pages AS INT) AS n_pages,
           CAST(n_runs AS INT) AS n_runs,
           CAST(n_chars AS INT) AS n_chars,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(max_font AS INT) AS max_font,
           title,
           CAST(p1_width AS INT) AS p1_width,
           CAST(p1_height AS INT) AS p1_height
    FROM (VALUES
      {vals})
      AS t(media_id, n_pages, n_runs, n_chars, n_tokens, max_font,
           title, p1_width, p1_height)
    ORDER BY media_id
    """


def _check_layout_design() -> None:
    """Import-time proof that the reused cluster geometry still holds
    in LAYOUT space (the element synthesis is exact, so this is the
    same check imagesim runs — re-asserted here so a drift in either
    module fails loudly at import, like audiosim does implicitly by
    importing the constants)."""
    allv = [v for cl in _ND_CLUSTERS for v in cl] + _ND_SINGLETONS
    assert all(len(v) == _PDF_NBITS for v in allv)
    groups = _ND_CLUSTERS + [[s] for s in _ND_SINGLETONS]
    for i, gi in enumerate(groups):
        for gj in groups[i + 1 :]:
            assert all(hamming_py(a, b) >= 3 for a in gi for b in gj)


_check_layout_design()


# ---------------------------------------------------------------------------
# Text dedup across containers/layouts (round-12/13 registration candidate)
# ---------------------------------------------------------------------------
#
# The INVERSE claim of the layout row: documents with the SAME text in
# entirely different presentations — different layout positions, content
# styles, compression — must collapse to one text group (the
# container-insensitive text dedup step of document-corpus cleanup,
# exactly what byte-level dedup misses). Canonicalization is reading
# order, (page, y desc, x asc), so the grouping is independent of the
# order show ops happen to appear in the content stream.


def pdf_canonical_text(payload: bytes) -> str:
    """The document's text in READING order AS DISPLAYED: runs sorted
    by (page, display-y desc, display-x asc) — run origins are mapped
    through each page's /Rotate first — joined with newlines. This is
    the canonical form whose md5 is the dedup key: two files with the
    same words laid out by different producers digest equal, whether
    they differ in content-stream emission order, layout positions, or
    stored page rotation (a scanner emitting sideways pages with
    /Rotate 90 reads the same as the upright original)."""
    doc = PdfDocument(payload)
    keyed = []
    for i, page in enumerate(doc.pages(), start=1):
        runs, _, _ = _display_page_runs(doc, page)
        keyed.extend((i, -dy, dx, text) for dx, dy, _, text in runs)
    keyed.sort()
    return "\n".join(t for *_, t in keyed)


def pdf_text_digests(media: DataFrame) -> DataFrame:
    """(media_id, text_digest): md5 of the canonical reading-order
    text, one narrow ``mapInPandas`` — no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(mid),
                    "text_digest": hashlib.md5(
                        pdf_canonical_text(bytes(payload)).encode("utf-8")
                    ).hexdigest(),
                }
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "text_digest"])

    return (
        media.filter(F.col("kind") == "pdf")
        .select("media_id", "payload")
        .mapInPandas(extract, "media_id bigint, text_digest string")
    )


def pdf_text_dedup_groups(media: DataFrame) -> DataFrame:
    """Exact text-dedup groups over PDF payloads: one row per distinct
    canonical text with document count, keeper (min media_id) and dupe
    count — the textops exact-dedup shape applied through the container
    parser. ONE shuffle, on uniform md5 digests (the same scale posture
    as t_exact_dedup_groups)."""
    return (
        pdf_text_digests(media)
        .groupBy("text_digest")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("media_id").alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .orderBy("keeper_id")
    )


#: Text-dup fixture DESIGN: _TD_GROUPS groups of _TD_PER_GROUP docs
#: sharing one generated text, each doc presenting it at DIFFERENT grid
#: positions with a different content style and alternating Flate
#: compression — plus _TD_SINGLES unique-text singletons. The text
#: splits into two runs whose READING order (part 1 strictly above
#: part 2) is constant while the content-stream EMISSION order flips on
#: odd docs, so the canonicalization (not luck) is what makes digests
#: agree; doc j = 2 of every group is additionally STORED ROTATED
#: (/Rotate 90, content transformed), so the digest parity also proves
#: the display-space reading-order normalization. media_id: group g
#: doc j -> 100g + j; singleton s -> 900 + 100s.
_TD_GROUPS = 4
_TD_PER_GROUP = 3
_TD_SINGLES = 2
_TD_WORDS = 24
_TD_SPLIT = 10  # words in part 1


def _td_text(gid: str) -> tuple[str, str]:
    words = _words(f"textgrp|{gid}", _TD_WORDS).split(" ")
    return " ".join(words[:_TD_SPLIT]), " ".join(words[_TD_SPLIT:])


def _td_pages(gid: str, j: int) -> list[dict]:
    part1, part2 = _td_text(gid)
    w, h = _PDF_MEDIABOX
    cw, ch = w / _PDF_GRID, h / _PDF_GRID
    # part 1 in top row, column j; part 2 two+ rows LOWER, shifted col —
    # positions vary per doc, reading order does not.
    e1 = ((j % _PDF_GRID + 0.5) * cw, h - 0.5 * ch, 12, part1)
    e2 = (((j + 1) % _PDF_GRID + 0.5) * cw,
          h - (2 + j % 2 + 0.5) * ch, 10, part2)
    elements = [e2, e1] if j % 2 else [e1, e2]  # emission order flips
    return [{"mediabox": None, "elements": elements}]


def text_dup_pdf_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus for the text-dedup
    row (see the _TD_* design note)."""
    spec = [
        (100 * g + j, f"g{g}", j)
        for g in range(_TD_GROUPS)
        for j in range(_TD_PER_GROUP)
    ] + [(900 + 100 * s, f"s{s}", s) for s in range(_TD_SINGLES)]
    def build(mid: int, gid: str, j: int) -> bytes:
        style = _PL_STYLES[(mid + j) % len(_PL_STYLES)]
        pages = _td_pages(gid, j)
        if j == 2:  # stored-rotated member of every text group
            els, box = content_layout_for_display(
                pages[0]["elements"], 90
            )
            return encode_pdf(
                [{"elements": els, "rotate": 90}], style=style,
                mediabox=box,
            )
        return encode_pdf(pages, style=style, compress=bool(j % 2))

    payloads = [(mid, build(mid, gid, j)) for mid, gid, j in spec]
    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )
    return spark.createDataFrame(
        [
            (mid, "pdf", bytearray(p),
             (_PDF_MEDIABOX[0], _PDF_MEDIABOX[1], 0, 1))
            for mid, p in payloads
        ],
        schema,
    )


def pdf_text_oracle() -> str:
    """Constant-folding DuckDB oracle for the text-dedup row: digests
    re-derived in pure python from the SAME text generator the fixture
    embeds (md5 of part1 + newline + part2)."""
    rows = []
    for g in range(_TD_GROUPS):
        part1, part2 = _td_text(f"g{g}")
        digest = hashlib.md5(f"{part1}\n{part2}".encode()).hexdigest()
        rows.append((digest, _TD_PER_GROUP, 100 * g, _TD_PER_GROUP - 1))
    for s in range(_TD_SINGLES):
        part1, part2 = _td_text(f"s{s}")
        digest = hashlib.md5(f"{part1}\n{part2}".encode()).hexdigest()
        rows.append((digest, 1, 900 + 100 * s, 0))
    rows.sort(key=lambda r: r[2])
    vals = ",\n      ".join(
        f"('{d}', {n}, {k}, {nd})" for d, n, k, nd in rows
    )
    return f"""
    SELECT text_digest,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(text_digest, n_docs, keeper_id, n_dupes)
    ORDER BY keeper_id
    """


# ---------------------------------------------------------------------------
# Composite-font (Type0/CID) text dedup fixture (staged round 12 for a
# round-13/14 registration slot: m_pdf_cid_text)
# ---------------------------------------------------------------------------

#: Design: _CT_GROUPS texts, each present as a SIMPLE-font doc, a
#: Type0/Identity-H doc (2-byte CIDs through a /ToUnicode CMap with a
#: deliberately non-identity mapping), and a Flate-compressed Type0 doc
#: (CMap stream compressed too) — all three must digest EQUAL, so the
#: row proves text dedup across font ENCODINGS, the composite-font
#: analog of the layout row's rotation axis. Plus one simple and one
#: Type0 singleton. media_id: group g member j -> 100g + j; singleton
#: s -> 900 + 100s.
_CT_GROUPS = 2
#: (style, compress, cid_map): simple-font, plain CID/ToUnicode,
#: compressed CID/ToUnicode, and (round 13) CID mapped ONLY by the
#: embedded TrueType program's cmap table — all four must digest
#: equal.
_CT_MEMBERS = [
    ("td", False, "tounicode"),
    ("cid", False, "tounicode"),
    ("cid", True, "tounicode"),
    ("cid", False, "fontfile"),
]
_CT_SINGLES = 2


def _ct_pages(seed: str) -> list[dict]:
    part1 = _words(f"cidtext|{seed}|a", 6)
    part2 = _words(f"cidtext|{seed}|b", 4)
    return [{
        "mediabox": None,
        "elements": [(72, 700, 12, part1), (72, 600, 10, part2)],
    }]


def cid_pdf_media(spark: SparkSession) -> DataFrame:
    """(media_id, payload) fixture frame (see the _CT_* design note)."""
    rows = []
    for g in range(_CT_GROUPS):
        pages = _ct_pages(f"g{g}")
        for j, (style, comp, cmode) in enumerate(_CT_MEMBERS):
            rows.append(
                (100 * g + j,
                 encode_pdf(pages, style=style, compress=comp,
                            cid_map=cmode))
            )
    for s in range(_CT_SINGLES):
        rows.append(
            (900 + 100 * s,
             encode_pdf(_ct_pages(f"s{s}"), style="cid" if s % 2 else "td"))
        )
    return spark.createDataFrame(
        [(mid, "pdf", bytearray(p)) for mid, p in rows],
        "media_id bigint, kind string, payload binary",
    )


def pdf_cid_oracle() -> str:
    """Constant-folding DuckDB oracle for the composite-font text-dedup
    row: digests re-derived in pure python from the SAME text generator
    the fixture embeds."""
    rows = []
    for g in range(_CT_GROUPS):
        p1 = _words(f"cidtext|g{g}|a", 6)
        p2 = _words(f"cidtext|g{g}|b", 4)
        digest = hashlib.md5(f"{p1}\n{p2}".encode()).hexdigest()
        rows.append((digest, len(_CT_MEMBERS), 100 * g,
                     len(_CT_MEMBERS) - 1))
    for s in range(_CT_SINGLES):
        p1 = _words(f"cidtext|s{s}|a", 6)
        p2 = _words(f"cidtext|s{s}|b", 4)
        digest = hashlib.md5(f"{p1}\n{p2}".encode()).hexdigest()
        rows.append((digest, 1, 900 + 100 * s, 0))
    rows.sort(key=lambda r: r[2])
    vals = ",\n      ".join(
        f"('{d}', {n}, {k}, {nd})" for d, n, k, nd in rows
    )
    return f"""
    SELECT text_digest,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(text_digest, n_docs, keeper_id, n_dupes)
    ORDER BY keeper_id
    """


def m_pdf_cid_text_staged(spark: SparkSession) -> DataFrame:
    """Staged row body (``m_pdf_cid_text``): the composite-font fixture
    through the SAME registered text-dedup operator."""
    return pdf_text_dedup_groups(cid_pdf_media(spark))


# ---------------------------------------------------------------------------
# Cross-reference-FORM text dedup (staged round 13 — registration
# candidate for round 14+)
# ---------------------------------------------------------------------------

#: Design: _XS_GROUPS texts, each present once per CROSS-REFERENCE
#: form — classic 1.4 table, 1.5 xref STREAM, xref stream + object
#: stream, xref stream + object stream + Flate content (§7.5.7/
#: §7.5.8, the Up-predictor shape real writers emit) — plus
#: _XS_SINGLES one-container texts (alternating table/stream+objstm).
#: Claim: the cross-reference form is CONTAINER PLUMBING — the same
#: reading-order text must digest equal through every form, through
#: the REGISTERED pdf_text_dedup_groups operator, proving the round-13
#: xref/object-stream parser end-to-end on the production path.
_XS_GROUPS = 2
_XS_MEMBERS = [
    {"xref": "table"},
    {"xref": "stream"},
    {"xref": "stream", "objstm": True},
    {"xref": "stream", "objstm": True, "compress": True},
]
_XS_SINGLES = 2


def _xs_pages(seed: str) -> list[dict]:
    part1 = _words(f"xreftext|{seed}|a", 6)
    part2 = _words(f"xreftext|{seed}|b", 4)
    return [{
        "mediabox": None,
        "elements": [(72, 700, 12, part1), (72, 600, 10, part2)],
    }]


def xref_pdf_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload) fixture frame (see the _XS_* note)."""
    rows = []
    for g in range(_XS_GROUPS):
        pages = _xs_pages(f"g{g}")
        for j, kw in enumerate(_XS_MEMBERS):
            rows.append((100 * g + j, encode_pdf(pages, **kw)))
    for s in range(_XS_SINGLES):
        kw = _XS_MEMBERS[-1] if s % 2 else _XS_MEMBERS[0]
        rows.append((900 + 100 * s, encode_pdf(_xs_pages(f"s{s}"), **kw)))
    return spark.createDataFrame(
        [(mid, "pdf", bytearray(p)) for mid, p in rows],
        "media_id bigint, kind string, payload binary",
    )


def pdf_xref_oracle() -> str:
    """Constant-folding DuckDB oracle for the cross-reference-form
    text-dedup row: digests re-derived in pure python from the SAME
    text generator the fixture embeds."""
    rows = []
    for g in range(_XS_GROUPS):
        p1 = _words(f"xreftext|g{g}|a", 6)
        p2 = _words(f"xreftext|g{g}|b", 4)
        digest = hashlib.md5(f"{p1}\n{p2}".encode()).hexdigest()
        rows.append((digest, len(_XS_MEMBERS), 100 * g,
                     len(_XS_MEMBERS) - 1))
    for s in range(_XS_SINGLES):
        p1 = _words(f"xreftext|s{s}|a", 6)
        p2 = _words(f"xreftext|s{s}|b", 4)
        digest = hashlib.md5(f"{p1}\n{p2}".encode()).hexdigest()
        rows.append((digest, 1, 900 + 100 * s, 0))
    rows.sort(key=lambda r: r[2])
    vals = ",\n      ".join(
        f"('{d}', {n}, {k}, {nd})" for d, n, k, nd in rows
    )
    return f"""
    SELECT text_digest,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(text_digest, n_docs, keeper_id, n_dupes)
    ORDER BY keeper_id
    """


def m_pdf_xref_stream_staged(spark: SparkSession) -> DataFrame:
    """Staged row body (``m_pdf_xref_stream``): the cross-reference-
    form fixture through the SAME registered text-dedup operator."""
    return pdf_text_dedup_groups(xref_pdf_media(spark))


# ---------------------------------------------------------------------------
# Streaming layout-dedup twin (round-12/13 registration candidate)
# ---------------------------------------------------------------------------


def pdf_layout_stream_dedup(
    media: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    bucket_cap: int = 64,
) -> DataFrame:
    """Streaming PDF layout near-duplicate PAIR detection: flag each
    arriving document against every previously seen one — the THIRD
    consumer of the shared ``streaming.hamming_pair_stream`` core
    (video shots, audio clips, now document layouts), inheriting its
    pigeonhole batch-boundary-invariance, capped-state guarantees and
    append-only identity contract verbatim. ``pdf_layout_fingerprints``
    is already streaming-safe (one narrow mapInPandas per document
    row), so the whole path is parse -> grid fold -> band explode ->
    stateful verify."""
    from culvert_spark.streaming import single_id_pair_stream

    return single_id_pair_stream(
        pdf_layout_fingerprints(media), max_hamming, bands, _PDF_NBITS,
        bucket_cap,
    )


def pdf_pair_replay(spark: SparkSession, n_files: int = 4) -> DataFrame:
    """The staged row body (``st_pdf_layout_dedup_replay``): the design
    fixture replayed through a REAL file-split stream — per-document
    parse + fingerprint, band-keyed stateful pairing, then the
    batch-boundary-invariant distinct-pair projection."""
    from culvert_spark.streaming import replay_stream

    out = replay_stream(
        spark,
        near_dup_pdf_media(spark),
        lambda s: pdf_layout_stream_dedup(s),
        "st_pdf_pairs",
        n_files=n_files,
        output_mode="update",
    )
    return (
        out.select("a_media", "b_media")
        .distinct()
        .orderBy("a_media", "b_media")
    )


def pdf_pair_oracle(max_hamming: int = 2) -> str:
    """Constant-folding DuckDB oracle for the staged streaming row: ALL
    unordered within-radius document pairs stated from the fixture
    DESIGN — compressed different-text copies pair at distance 0 (same
    layout by construction), cluster variants at 1-2 bits, cross-group
    never (>= 3 by the import-proven geometry)."""
    docs = []  # (media_id, fingerprint)
    for c, cl in enumerate(_ND_CLUSTERS):
        for v, fp in enumerate(cl):
            for k in range(_PL_COPIES):
                docs.append((1000 * c + 10 * v + k, fp))
    for s, fp in enumerate(_ND_SINGLETONS):
        for k in range(_PL_COPIES):
            docs.append((9000 + 100 * s + k, fp))
    from culvert_spark.imagesim import pairs_values_oracle

    pairs = sorted(
        (min(a, b), max(a, b))
        for i, (a, fa) in enumerate(docs)
        for b, fb in docs[i + 1 :]
        if hamming_py(fa, fb) <= max_hamming
    )
    return pairs_values_oracle(pairs, ["a_media", "b_media"])


# ---------------------------------------------------------------------------
# Driver registration (staged round 11, registered round 12)
# ---------------------------------------------------------------------------

from culvert_spark.queries import (  # noqa: E402
    QUERIES,  # noqa: F401  (re-export: __spark_entry__ registry merge)
    ORACLE,  # noqa: F401
    register,
)


@register("m_pdf_doc_features", pdf_features_oracle())
def m_pdf_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF document feature extraction as a FULL hash row: the feature
    fixture (styles Td/TD/Tm/T*, FlateDecode, indirect /Length, nested
    pages tree with inherited + overridden MediaBox, escape-torture
    title, /Rotate) through the production parse path — page counts,
    run/char/token counts, max font, the title rule, page-1 geometry —
    against the constant-folding oracle stated from the fixture design
    (tests/test_pdfops.py::test_staged_features_oracle_matches).
    ``sf_dir`` is unused: shipped deterministic fixture ground truth,
    constant at every scale factor; the operator (``pdf_doc_features``,
    one narrow mapInPandas) is corpus-generic."""
    return pdf_doc_features(feature_pdf_media(spark))


@register("m_pdf_layout_dedup", pdf_layout_oracle())
def m_pdf_layout_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF LAYOUT near-dup grouping as a FULL hash row: rotation- and
    compression-normalized geometry fingerprints (display-space via
    /Rotate, text content hashed OUT) through Hamming-LSH clustering —
    same-layout different-text copies must collapse, near layouts (1-2
    bit variants) must group, distinct layouts (>= 3 bits) must not —
    against the design-constant oracle. ``sf_dir`` unused (fixture
    ground truth); the operator is corpus-generic and value-domain
    bucketed like the image/audio twins."""
    return pdf_layout_dedup_groups(near_dup_pdf_media(spark))


@register("m_pdf_text_dedup", pdf_text_oracle())
def m_pdf_text_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF TEXT dedup across containers/layouts as a FULL hash row —
    the inverse claim of the layout row: same reading-order text at
    different positions/styles/compression digests EQUAL (canonical
    text sorts runs by (page, y desc, x asc) in display space), and
    pytest separately proves the layouts within a text group actually
    DIFFER. ``sf_dir`` unused (fixture ground truth)."""
    return pdf_text_dedup_groups(text_dup_pdf_media(spark))


@register("st_pdf_layout_dedup_replay", pdf_pair_oracle())
def st_pdf_layout_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PDF layout near-dup pairing as a FULL hash row
    (staged round 12, registered round 13): the layout fixture
    replayed through a REAL file-split stream — per-document parse +
    geometry fingerprint, band-keyed stateful pairing via the shared
    ``streaming.hamming_pair_stream`` core (third consumer after video
    shots and audio clips), then the batch-boundary-INVARIANT
    distinct-pair projection — against the constant-folding
    ``pdf_pair_oracle()``. pytest pins identity at n_files 4 and 1
    (batch-boundary invariance). ``sf_dir`` unused (fixture ground
    truth); the operator is corpus-generic."""
    return pdf_pair_replay(spark)
