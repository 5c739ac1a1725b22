"""TIFF decoder tests: a test-side independent writer (its own LZW and
PackBits encoders, both byte orders, multi-strip layouts, predictor)
produces real TIFF files; TIFF is lossless so decode must return the
original pixels exactly."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from culvert_spark import tiffcodec as tc


# ---------------------------------------------------------------------------
# Test-side encoders
# ---------------------------------------------------------------------------


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Standard TIFF LZW encoder: MSB-first packing, clear first, the
    EARLY code-width change (grow when the next entry to assign would
    be 2**width - 1), reset at the 4094-entry limit."""
    out_codes: list[tuple[int, int]] = []
    width = 9

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    out_codes.append((256, width))
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        out_codes.append((table[prev], width))
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        table[cur] = next_code
        next_code += 1
        if next_code == 4094:  # spec: emit clear near the table limit
            out_codes.append((256, width))
            table = fresh()
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        out_codes.append((table[prev], width))
    out_codes.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in out_codes:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs >= 3 become repeats, the rest
    literal runs (max 128 each)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < len(data) and i - lit_start < 128:
            run = 1
            while (i + run < len(data) and run < 3
                   and data[i + run] == data[i]):
                run += 1
            if run >= 3:
                break
            i += 1
        chunk = data[lit_start:i]
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _tiff_bytes(px, compression=1, byte_order="little", rows_per_strip=None,
                photometric=None, predictor=1, colormap=None,
                extra_tags=None):
    """Write a TIFF: ``px`` is (h, w) gray / palette indices or
    (h, w, spp) RGB(A); strips split at rows_per_strip."""
    bo = byte_order
    if px.ndim == 2:
        px3 = px[:, :, None]
    else:
        px3 = px
    h, w, spp = px3.shape
    if photometric is None:
        photometric = 1 if spp == 1 and colormap is None else 2
    rows_per_strip = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = px3[y0 : y0 + rows_per_strip].astype(np.uint8)
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            rows = (d % 256).astype(np.uint8)
        raw = rows.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 8:
            strips.append(zlib.compress(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))

    def u16(v):
        return int(v).to_bytes(2, bo)

    def u32(v):
        return int(v).to_bytes(4, bo)

    entries = []  # (tag, type, count, enc) with enc=None for StripOffsets

    def tag(tag_id, type_, values):
        size = {1: 1, 3: 2, 4: 4}[type_]
        enc = b"".join(int(v).to_bytes(size, bo) for v in values)
        entries.append((tag_id, type_, len(values), enc))

    tag(256, 4, [w])
    tag(257, 4, [h])
    tag(258, 3, [8] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [photometric])
    entries.append((273, 4, len(strips), None))
    tag(277, 3, [spp])
    tag(278, 4, [rows_per_strip])
    tag(279, 4, [len(s) for s in strips])
    if predictor != 1:
        tag(317, 3, [predictor])
    if colormap is not None:
        tag(320, 3, list(colormap))
    for tag_id, type_, count, enc in extra_tags or []:
        entries.append((tag_id, type_, count, enc))
    entries.sort(key=lambda e: e[0])

    # layout: header(8), IFD, overflow tag data (in tag order), strips
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_start = 8 + ifd_size
    off_enc_size = 4 * len(strips)
    overflow = sum(
        (off_enc_size if enc is None else len(enc))
        for _, _, _, enc in entries
        if (off_enc_size if enc is None else len(enc)) > 4
    )
    strip_pos = overflow_start + overflow
    offs = []
    for s in strips:
        offs.append(strip_pos)
        strip_pos += len(s)
    off_enc = b"".join(u32(o) for o in offs)

    ifd = u16(len(entries))
    body = bytearray()
    cursor = overflow_start
    for tag_id, type_, count, enc in entries:
        if enc is None:
            enc = off_enc
        if len(enc) > 4:
            val = u32(cursor)
            body += enc
            cursor += len(enc)
        else:
            val = enc + b"\x00" * (4 - len(enc))
        ifd += u16(tag_id) + u16(type_) + u32(count) + val
    ifd += u32(0)  # no next IFD
    assert len(ifd) == ifd_size and cursor == overflow_start + overflow
    header = (b"II*\x00" if bo == "little" else b"MM\x00*") + u32(8)
    return header + ifd + bytes(body) + b"".join(strips)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("byte_order", ["little", "big"])
def test_gray_all_compressions_exact(compression, byte_order):
    rng = np.random.default_rng(compression)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    payload = _tiff_bytes(img, compression=compression,
                          byte_order=byte_order, rows_per_strip=10)
    assert (tc.decode_tiff(payload) == img).all()


def test_lzw_crosses_width_growth():
    """Random noise large enough to push the LZW table past 511 and
    1023 entries — the early-change boundaries both sides must agree
    on exactly."""
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    payload = _tiff_bytes(img, compression=5)
    assert (tc.decode_tiff(payload) == img).all()


def test_lzw_table_reset_at_limit():
    """Enough unique content to hit the 4094-entry clear-and-reset."""
    rng = np.random.default_rng(101)
    img = rng.integers(0, 256, (128, 96)).astype(np.uint8)
    payload = _tiff_bytes(img, compression=5)
    assert (tc.decode_tiff(payload) == img).all()


def test_rgb_predictor_and_inverted_gray():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (14, 11, 3)).astype(np.uint8)
    payload = _tiff_bytes(rgb, compression=5, predictor=2,
                          rows_per_strip=5)
    luma = np.round(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                    + 0.114 * rgb[:, :, 2]).astype(np.uint8)
    assert (tc.decode_tiff(payload) == luma).all()
    gray = rng.integers(0, 256, (9, 9)).astype(np.uint8)
    inv = _tiff_bytes(gray, photometric=0)
    assert (tc.decode_tiff(inv) == 255 - gray).all()


def test_palette_tiff():
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 16, (12, 17)).astype(np.uint8)
    pal8 = rng.integers(0, 256, (16, 3)).astype(np.uint16)
    cmap = np.concatenate([pal8[:, 0], pal8[:, 1], pal8[:, 2]]) * 257
    payload = _tiff_bytes(idx, photometric=3, colormap=[int(v) for v in cmap])
    rgb = pal8[idx].astype(np.uint8)
    luma = np.round(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                    + 0.114 * rgb[:, :, 2]).astype(np.uint8)
    assert (tc.decode_tiff(payload) == luma).all()


def test_tiff_skips_metadata_tags():
    """Real-world TIFFs always carry RATIONAL resolution tags and ASCII
    strings (libtiff/Pillow write them unconditionally); they are
    irrelevant to pixel decoding and must be skipped, not fatal — the
    image still decodes exactly."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (6, 9)).astype(np.uint8)
    meta = [
        (282, 5, 1, (72).to_bytes(4, "little") + (1).to_bytes(4, "little")),
        (283, 5, 1, (72).to_bytes(4, "little") + (1).to_bytes(4, "little")),
        (305, 2, 9, b"libtests\x00"),
    ]
    payload = _tiff_bytes(img, compression=5, extra_tags=meta)
    assert (tc.decode_tiff(payload) == img).all()


def test_tiff_rejects_corruption():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = _tiff_bytes(img, compression=5)
    with pytest.raises(ValueError, match="not a TIFF"):
        tc.decode_tiff(b"IX*\x00" + payload[4:])
    with pytest.raises(ValueError, match="truncated TIFF strip"):
        tc.decode_tiff(payload[:-4])
    jbig = bytearray(payload)
    # compression tag value: find and patch via the writer instead
    bad = _tiff_bytes(img, compression=1)
    comp_pos = bad.index((259).to_bytes(2, "little")) + 8
    bad = bytearray(bad)
    bad[comp_pos] = 9  # JBIG — unsupported
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        tc.decode_tiff(bytes(bad))
    del jbig


def test_tiff_deflate_overlong_strip_truncates_like_lzw():
    """A Deflate strip padded past the declared raster (a real-writer
    pattern for the final partial strip) decodes by truncation, the
    same tolerant semantics as the LZW/PackBits paths — while the
    inflate stays bounded (expect<=0 refuses outright because zlib's
    max_length=0 would mean unlimited)."""
    import zlib

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
    payload = _tiff_bytes(rgb, compression=8)
    # rebuild with the deflate stream padded by a full extra row
    raster = rgb.tobytes() + b"\x00" * (4 * 3)
    comp = zlib.compress(raster)
    base = _tiff_bytes(rgb, compression=8)
    # locate the original strip (its offset is in tag 273, LE)
    # simpler: decode via the module helper directly
    assert tc._inflate_bounded(comp, len(rgb.tobytes())) == rgb.tobytes()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no declared size"):
        tc._inflate_bounded(comp, 0)
    # and the unpadded payload still round-trips end-to-end
    got = tc.decode_tiff(payload)
    expect = np.round(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                      + 0.114 * rgb[:, :, 2]).astype(np.uint8)
    assert (got == expect).all()
