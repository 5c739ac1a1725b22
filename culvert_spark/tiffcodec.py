"""TIFF 6.0 decoder in pure Python + numpy (the public Adobe spec).

The baseline-TIFF image path for the multimodal pipeline: both byte
orders (II/MM), IFD tag walk, strip assembly, 8-bit grayscale
(both photometric polarities), RGB(A) and palette images, and the
spec's compression schemes that need no external codec — none (1),
LZW (5, the TIFF variant: MSB-first packing with the EARLY code-width
change, one code before GIF's), Deflate (8, stdlib zlib) and PackBits
(32773) — plus the horizontal-differencing predictor (tag 317).

Correctness is pinned by ``tests/test_tiffcodec.py`` with a test-side
independent writer (its own LZW/PackBits encoders): TIFF is lossless,
so decode must return the original pixels exactly in every
compression × predictor × byte-order × strip-layout combination.

Scale: decode is O(payload bytes) per image inside the Arrow batch —
identical ``mapInPandas`` plumbing to every other decoder (no shuffle;
decoder CPU scales with executors).
"""

from __future__ import annotations

import numpy as np


def _lzw_decode_tiff(data: bytes, n_bytes: int) -> bytes:
    """TIFF-variant LZW: codes packed MSB-first, ClearCode 256 / EOI
    257, and the EARLY code-width change — the width grows when the
    NEXT entry to be assigned would be 2**width - 1 (one code earlier
    than GIF's rule; the spec's own erratum, matched by every
    implementation)."""
    # MSB-first windowed accumulator: O(1) per code (a whole-stream big
    # int would copy the remainder on every shift — quadratic)
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    prev: bytes | None = None
    out = bytearray()

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    while len(out) < n_bytes:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = acc >> nbits
        acc &= (1 << nbits) - 1
        if code == 256:  # clear
            table = fresh()
            width = 9
            prev = None
            continue
        if code == 257:  # end of information
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW stream starts with a non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change: grow when the next assignment would hit
        # 2**width - 1
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _inflate_bounded(comp: bytes, expect: int) -> bytes:
    """Inflate at most ``expect`` bytes: a crafted deflate bomb in an
    untrusted strip cannot allocate past the raster size the IFD
    declares, while a stream that decodes LONGER is truncated — the
    same tolerant semantics as the LZW/PackBits paths (both stop
    quietly at ``n_bytes``; real writers pad the final partial strip to
    full rows_per_strip rows). Decoding short is a parse error, checked
    at the call site like the other compressions. ``expect`` must be
    positive: zlib treats ``max_length=0`` as UNLIMITED, which would
    disarm the bound for zero-area images (decode_tiff rejects those at
    the header; this guard is depth)."""
    import zlib

    if expect <= 0:
        raise ValueError("TIFF strip has no declared size")
    return zlib.decompressobj().decompress(comp, expect)


def _packbits_decode(data: bytes, n_bytes: int) -> bytes:
    """PackBits run-length decoding (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < n_bytes:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            chunk = data[i : i + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += chunk
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _tag_values(payload: bytes, bo: str, type_: int, count: int,
                raw: bytes) -> list[int] | None:
    """Integer values of an IFD entry. Non-integer types (RATIONAL
    resolution tags, ASCII Software/DateTime strings, ...) return None:
    real TIFFs always carry them, and none matter to pixel decoding, so
    they are skipped rather than fatal."""
    sizes = {1: 1, 3: 2, 4: 4}
    if type_ not in sizes:
        return None
    size = sizes[type_]
    total = size * count
    if total > 4:
        off = int.from_bytes(raw, bo)
        raw = payload[off : off + total]
        if len(raw) != total:
            raise ValueError("truncated TIFF tag data")
    return [int.from_bytes(raw[i * size : (i + 1) * size], bo)
            for i in range(count)]


def _luma(rgb: np.ndarray) -> np.ndarray:
    """BT.601 luma, same rounding contract as the other image paths."""
    luma = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2])
    return np.round(luma).astype(np.uint8)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the first image (IFD 0) of a TIFF to its (height, width)
    uint8 luma plane — grayscale as stored (photometric 0 inverted),
    RGB(A)/palette through BT.601 with the same rounding as the
    PNG/PPM paths. Raises ValueError on malformed structure, unknown
    compression, or non-8-bit samples."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF")
    ifd_off = int.from_bytes(payload[4:8], bo)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    n_tags = int.from_bytes(payload[ifd_off : ifd_off + 2], bo)
    tags: dict[int, list[int]] = {}
    for t in range(n_tags):
        e = ifd_off + 2 + 12 * t
        entry = payload[e : e + 12]
        if len(entry) != 12:
            raise ValueError("truncated TIFF IFD entry")
        tag = int.from_bytes(entry[0:2], bo)
        type_ = int.from_bytes(entry[2:4], bo)
        count = int.from_bytes(entry[4:8], bo)
        values = _tag_values(payload, bo, type_, count, entry[8:12])
        if values is not None:
            tags[tag] = values

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF is missing required tag {tag}")
        return default

    width = one(256)
    height = one(257)
    if width < 1 or height < 1:
        raise ValueError("TIFF dimensions must be positive")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF samples are supported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip layout is missing or inconsistent")
    rows_per_strip = one(278, height)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    stride = width * spp
    raster = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        comp = payload[off : off + cnt]
        if len(comp) != cnt:
            raise ValueError("truncated TIFF strip")
        n_rows = min(rows_per_strip, height - s * rows_per_strip)
        if n_rows <= 0:
            raise ValueError("TIFF has more strips than rows")
        expect = n_rows * stride
        if compression == 1:
            strip = comp[:expect]
        elif compression == 5:
            strip = _lzw_decode_tiff(comp, expect)
        elif compression == 8:
            strip = _inflate_bounded(comp, expect)
        elif compression == 32773:
            strip = _packbits_decode(comp, expect)
        else:
            raise ValueError(f"unsupported TIFF compression {compression}")
        if len(strip) < expect:
            raise ValueError("TIFF strip decodes short")
        rows = np.frombuffer(strip[:expect], dtype=np.uint8).reshape(
            n_rows, width, spp
        )
        if predictor == 2:  # horizontal differencing: undo via cumsum
            rows = (
                np.cumsum(rows, axis=1, dtype=np.uint64)
                .astype(np.uint8)
            )
        raster += rows.tobytes()
    px = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(
        height, width, spp
    )
    if photometric in (0, 1):  # grayscale (0 = white-is-zero)
        plane = px[:, :, 0]
        return (255 - plane) if photometric == 0 else plane.copy()
    if photometric == 2:  # RGB(A)
        if spp < 3:
            raise ValueError("RGB TIFF needs at least 3 samples per pixel")
        return _luma(px)
    if photometric == 3:  # palette: ColorMap holds 16-bit R,G,B planes
        cmap = tags.get(320)
        if not cmap or len(cmap) % 3:
            raise ValueError("palette TIFF is missing its ColorMap")
        n = len(cmap) // 3
        pal16 = np.array(cmap, dtype=np.uint16).reshape(3, n).T
        # 16-bit map -> 8-bit with the same round(v/257) contract as the
        # PNG/PPM sample rescale (floor would land non-multiples of 257
        # one level low)
        pal = np.round(pal16 / 257.0).astype(np.uint8)
        idx = px[:, :, 0]
        if int(idx.max()) >= n:
            raise ValueError("TIFF palette index out of range")
        return _luma(pal[idx])
    raise ValueError(f"unsupported TIFF photometric {photometric}")
