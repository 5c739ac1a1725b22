"""Multimodal (image/audio/video) column processing.

Media are opaque ``binary`` payload columns plus typed metadata — the
standard large-scale layout (payload bytes + struct metadata in parquet,
processed by Arrow-batched Python UDFs). Real decoders, no codec
library needed: uncompressed containers in pure numpy (PGM/PPM and BMP
images, RIFF/WAV PCM16, AIFF and Sun .au audio, RIFF/AVI video demux
— MJPEG frames decode fully)
AND real COMPRESSED codecs from their public specs — PNG via
``_decode_png`` (stdlib zlib inflate + numpy scanline-filter inversion,
per-chunk CRC verified, every legal depth + Adam7), G.711 A-law/µ-law
WAV (ITU-T companding, exact 256-entry LUTs), IMA and MS ADPCM WAV
(4-bit predictive), FLAC (``flaccodec``: RFC 9639 Rice + LPC, lossless
so tests demand bit-exact roundtrips), GIF87a/89a (``_decode_gif``:
LZW + palette, also lossless), TIFF (``tiffcodec``: none/LZW/Deflate/
PackBits strips, both byte orders, lossless) and baseline +
progressive + lossless JPEG
(``jpegcodec``: canonical Huffman + zigzag dequant + matmul IDCT;
multi-scan successive approximation for SOF2; Annex H predictive
decode for SOF3; Annex J hierarchical pyramids with differential
SOF5/6/7 frames and EXP expansion) — real image and audio
bytes pass through the full pipeline, exercised by tests. The
remaining compressed formats (MP3/H.264, plus arithmetic-coded
JPEG, all blocked on entropy-coder tables — Layer III Huffman /
CABAC-CAVLC init / QM-coder states — that the prose specs don't
reproduce) fall back to a clearly-marked deterministic
stub because their codec libraries are not in this container;
everything Spark-side is identical either way and tested:

- schema (binary payload + typed metadata struct),
- partitioning (mapInPandas preserves the input partitioning; no shuffle),
- UDF signatures (iterator-of-pandas.DataFrame → iterator-of-DataFrame),
- batch shapes (Arrow batches, vectorized numpy per batch),
- fan-out semantics (frame sampling yields multiple rows per video).

Swap the stub branch of ``_decode_image``/``_decode_audio`` for
PIL/ffmpeg/soundfile calls in a real deployment; every signature stays the
same. Real decoders raise on corrupt payloads — the stub branch mimics
that for empty payloads.

Scale notes (100 TB): payloads stream through executors in Arrow batches —
nothing collects to the driver; per-batch numpy work is O(batch bytes);
feature extraction is a narrow map (no shuffle), so it pipelines with the
scan and the downstream write.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.flaccodec import decode_flac
from culvert_spark.jpegcodec import decode_jpeg_luma
from culvert_spark.tiffcodec import decode_tiff

# ---------------------------------------------------------------------------
# Synthetic media table (deterministic payloads derived from `documents`)
# ---------------------------------------------------------------------------

MEDIA_KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media over the documents table: payload bytes are
    md5-chained from the text (binary, opaque), metadata is derived from
    doc stats. This stands in for a real (payload, metadata) parquet scan."""
    from culvert_spark.queries import t

    d = t(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    # 48 deterministic payload bytes: md5(text) || md5(md5(text)) || md5(doc_id).
    h1 = F.md5(F.col("text").cast("binary"))
    h2 = F.md5(h1.cast("binary"))
    h3 = F.md5(F.col("doc_id").cast("string").cast("binary"))
    payload = F.to_binary(F.concat(h1, h2, h3), F.lit("hex"))
    meta = F.struct(
        (F.pmod(F.col("n_chars"), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("n_chars"), F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (F.pmod(F.col("doc_id"), F.lit(8)) + 2).cast("int").alias("n_frames"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decoders. PGM/PPM images, RIFF/WAV PCM16 audio AND the compressed
# codecs PNG (stdlib zlib + numpy, all depths + Adam7), baseline,
# progressive and lossless JPEG (``jpegcodec``), GIF (LZW), TIFF
# (``tiffcodec``), FLAC (``flaccodec``),
# G.711 A-law/µ-law WAV and IMA/MS ADPCM WAV are decoded FOR REAL — no
# codec library needed. The remaining compressed formats (MP3/H.264,
# arithmetic-coded JPEG — all blocked on non-reproducible entropy-coder
# tables) fall back to a
# clearly-marked deterministic stub: their codecs (PIL / soundfile /
# ffmpeg) are not in this container.
# ---------------------------------------------------------------------------


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Real decoder for binary PGM (P5, grayscale) / PPM (P6, RGB):
    whitespace/comment-tolerant header parse, then a numpy view over the
    raster. Returns a (height, width) uint8 luma plane (BT.601 for RGB)."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if magic == b"P5":
        plane = np.frombuffer(
            payload, dtype=np.uint8, count=width * height, offset=pos
        ).reshape(height, width)
        return plane.copy()
    rgb = np.frombuffer(
        payload, dtype=np.uint8, count=3 * width * height, offset=pos
    ).reshape(height, width, 3)
    luma = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    )
    return np.round(luma).astype(np.uint8)


def _decode_pam(payload: bytes) -> np.ndarray:
    """Real decoder for NetPBM PAM (P7): token header (WIDTH / HEIGHT /
    DEPTH / MAXVAL / TUPLTYPE / ENDHDR, comments allowed), then the
    binary raster. Gray±alpha and RGB±alpha at maxval 255; alpha is
    ignored like everywhere else. Returns the (h, w) uint8 luma."""
    if payload[:3] != b"P7\n":
        raise ValueError("not a PAM")
    end = payload.find(b"ENDHDR\n")
    if end < 0:
        raise ValueError("truncated PAM header")
    fields = {}
    for line in payload[3:end].decode("ascii", "replace").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, val = line.partition(" ")
        fields[key] = val.strip()
    try:
        width = int(fields["WIDTH"])
        height = int(fields["HEIGHT"])
        pam_depth = int(fields["DEPTH"])
        maxval = int(fields["MAXVAL"])
    except (KeyError, ValueError):
        raise ValueError("PAM header is missing required fields") from None
    if maxval != 255:
        raise ValueError(f"unsupported PAM maxval {maxval}")
    if pam_depth not in (1, 2, 3, 4):
        raise ValueError(f"unsupported PAM depth {pam_depth}")
    start = end + 7
    n = width * height * pam_depth
    raster = payload[start : start + n]
    if len(raster) != n:
        raise ValueError("truncated PAM raster")
    px = np.frombuffer(raster, np.uint8).reshape(height, width, pam_depth)
    if pam_depth <= 2:  # gray / gray+alpha
        return px[:, :, 0].copy()
    return _png_luma(px[:, :, :3])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_luma(rgb: np.ndarray) -> np.ndarray:
    """BT.601 luma (same rounding as the PPM path) from an (h, w, 3)
    uint8 array."""
    luma = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    )
    return np.round(luma).astype(np.uint8)


#: Adam7 interlace passes: (x_start, y_start, x_step, y_step).
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int
                  ) -> np.ndarray:
    """Invert the five PNG scanline filters over one (sub-)image whose
    serialized rows are ``1 filter byte + stride bytes``. Row-sequential
    by spec (each row predicts from the reconstruction above), but
    within a row: None/Up are whole-row numpy ops and Sub is an exact
    per-channel-lane ``cumsum mod 256``; only Average/Paeth
    (left-neighbor feedback through a rounded/branchy predictor) fall
    back to a per-byte loop."""
    raw_arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw_arr[y, 0])
        line = raw_arr[y, 1:]
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub == per-lane running sum, wraps at 256
            cur = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wrap
        elif ftype == 3:  # Average (left feedback → per-byte)
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth (left feedback → per-byte)
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                )
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon[y] = cur
        prev = cur
    return recon


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL decoder for 8- and 16-bit PNG (the first compressed image
    codec decoded for real here — no codec library needed: the DEFLATE
    stream is stdlib ``zlib``, the rest is the public PNG spec in
    numpy). Supports color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), all five scanline filters, every legal
    bit depth (16-bit rescales to 8 via round(v/257), the spec's
    sample-depth scaling; sub-byte 1/2/4 gray/palette unpack MSB-first
    and gray rescales by the exact 255/(2**d-1) factor) and Adam7
    interlacing (each pass unfiltered as its own sub-image then
    scattered); per-chunk CRC32 is verified so corrupt payloads raise
    like any real decoder.
    Returns the (height, width) uint8 luma plane (BT.601 for color;
    alpha ignored — features describe the stored pixels).

    Scale: decode stays O(payload bytes) per image inside the Arrow
    batch, exactly like the PNM path — nothing about the mapInPandas
    plumbing changes."""
    ihdr = None
    plte = None
    idat: list[bytes] = []
    for cid, body in _png_chunks(payload):
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("missing IHDR or IDAT")
    width, height, bit_depth, color_type, interlace = _png_header(ihdr)
    rgba = _png_pixels(
        _inflate_exact(
            b"".join(idat),
            _png_raster_size(width, height, bit_depth, color_type,
                             interlace),
        ),
        width, height, bit_depth, color_type, interlace, plte)
    if color_type in (0, 4):  # gray / gray+alpha: the plane as stored
        return rgba[:, :, 0].copy()
    return _png_luma(rgba[:, :, :3])


def _png_chunks(payload: bytes):
    """CRC-verified PNG chunk walk; yields (cid, body) through IEND."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    seen_iend = False
    while pos + 12 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        if zlib.crc32(payload[pos + 4 : pos + 8 + size]) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {cid!r}")
        yield cid, body
        if cid == b"IEND":
            seen_iend = True
            break
        pos += 12 + size
    if not seen_iend:
        raise ValueError("truncated PNG: no IEND chunk")


def _png_raster_size(width: int, height: int, bit_depth: int,
                     color_type: int, interlace: int) -> int:
    """Exact byte count of the filtered raster the IDAT/fdAT stream must
    inflate to (per row: 1 filter byte + ceil(w·channels·depth/8);
    Adam7 sums the seven per-pass sub-images, empty passes contributing
    nothing). Computable from the header alone, so the inflate can be
    bounded to it — see _inflate_exact."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def row_bytes(wp: int) -> int:
        return (wp * channels * bit_depth + 7) // 8

    if interlace == 0:
        return height * (row_bytes(width) + 1)
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            total += hp * (row_bytes(wp) + 1)
    return total


def _inflate_exact(comp: bytes, expect: int) -> bytes:
    """Inflate exactly ``expect`` bytes, bounded: a crafted deflate bomb
    in an untrusted payload cannot allocate past what the declared
    geometry needs, and a stream that would decode long or short is a
    parse error — the strict posture of the rest of the decoders.
    ``expect`` must be positive: zlib treats ``max_length=0`` as
    UNLIMITED, which would reopen the bomb hole for zero-area images
    (the header check rejects those first; this guard is depth)."""
    import zlib

    if expect <= 0:
        raise ValueError("PNG raster size mismatch")
    do = zlib.decompressobj()
    out = do.decompress(comp, expect)
    if len(out) != expect:
        raise ValueError("PNG raster size mismatch")
    if do.decompress(do.unconsumed_tail, 1) or do.flush():
        raise ValueError("PNG raster size mismatch")
    return out


def _png_header(ihdr: bytes) -> tuple[int, int, int, int, int]:
    """Validated IHDR fields: (width, height, depth, color type,
    interlace)."""
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    if width < 1 or height < 1:
        # the PNG spec requires nonzero dimensions; a zero here would
        # also zero _png_raster_size and disarm the bounded inflate
        raise ValueError("PNG dimensions must be positive")
    bit_depth, color_type, compression, filter_method, interlace = ihdr[8:13]
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if compression != 0 or filter_method != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color_type not in (0, 2, 3, 4, 6):
        raise ValueError(f"unknown PNG color type {color_type}")
    if color_type == 3 and bit_depth == 16:
        raise ValueError("16-bit palette PNG is not legal")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte PNG depth requires gray or palette")
    return width, height, bit_depth, color_type, interlace


def _png_pixels(raster: bytes, width: int, height: int, bit_depth: int,
                color_type: int, interlace: int,
                plte: bytes | None) -> np.ndarray:
    """Decompressed (sub-)image raster → (h, w, 4) RGBA uint8: filter
    inversion, Adam7 scattering, depth rescale, palette application,
    gray replication (alpha defaults to 255). Shared by the static PNG
    path and APNG frame compositing."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if bit_depth >= 8:
        bpp = channels * (bit_depth // 8)  # filter unit: bytes per pixel
        n_units = bpp

        def row_bytes(wp: int) -> int:
            return wp * bpp

        def to_units(recon: np.ndarray, hp: int, wp: int) -> np.ndarray:
            return recon.reshape(hp, wp, bpp)
    else:
        # sub-byte depths pack several samples per byte, MSB-first; the
        # filter unit is one byte regardless (PNG spec)
        bpp = 1
        n_units = 1
        shifts = np.arange(8 - bit_depth, -1, -bit_depth)
        mask = (1 << bit_depth) - 1

        def row_bytes(wp: int) -> int:
            return (wp * bit_depth + 7) // 8

        def to_units(recon: np.ndarray, hp: int, wp: int) -> np.ndarray:
            vals = (recon[:, :, None] >> shifts) & mask
            return vals.reshape(hp, -1)[:, :wp, None].astype(np.uint8)

    if interlace == 0:
        stride = row_bytes(width)
        if len(raster) != height * (stride + 1):
            raise ValueError("PNG raster size mismatch")
        planes = to_units(
            _png_unfilter(raster, height, stride, bpp), height, width
        )
    else:  # Adam7: seven independently-filtered sub-images, scattered
        planes = np.zeros((height, width, n_units), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = row_bytes(wp)
            chunk = raster[pos : pos + hp * (sp + 1)]
            if len(chunk) != hp * (sp + 1):
                raise ValueError("PNG raster size mismatch")
            pos += hp * (sp + 1)
            sub = _png_unfilter(chunk, hp, sp, bpp)
            planes[y0::dy, x0::dx] = to_units(sub, hp, wp)
        if pos != len(raster):
            raise ValueError("PNG raster size mismatch")
    if bit_depth == 16:
        hi = planes[:, :, 0::2].astype(np.uint16)
        vals = (hi << 8) | planes[:, :, 1::2]
        # spec sample-depth rescale 16→8: round(v * 255 / 65535)
        px = np.round(vals / 257.0).astype(np.uint8)
    elif bit_depth < 8 and color_type == 0:
        # gray rescale to 8 bits is exact: 255/(2**d-1) is an integer
        px = planes * np.uint8(255 // ((1 << bit_depth) - 1))
    else:
        px = planes
    rgba = np.empty((height, width, 4), dtype=np.uint8)
    rgba[:, :, 3] = 255
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette image missing a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max()) >= len(pal):
            raise ValueError("palette index out of range")
        rgba[:, :, :3] = pal[px[:, :, 0]]
    elif color_type in (0, 4):
        rgba[:, :, :3] = px[:, :, 0:1]
        if color_type == 4:
            rgba[:, :, 3] = px[:, :, 1]
    else:
        rgba[:, :, :3] = px[:, :, :3]
        if color_type == 6:
            rgba[:, :, 3] = px[:, :, 3]
    return rgba


def _apng_frames_luma(payload: bytes) -> list[np.ndarray]:
    """Composite an APNG's animation frames (acTL/fcTL/fdAT, the public
    spec): each frame is an independent zlib stream filtered over its
    own sub-rectangle; blend 0 replaces the region (including alpha),
    blend 1 alpha-composites over it (straight-alpha OVER); dispose
    0/1/2 are keep / clear-to-transparent / restore-previous. The
    canvas starts fully transparent; the IDAT default image is frame 1
    only when the first fcTL precedes it. Returns per-frame (h, w)
    uint8 luma snapshots (alpha ignored, like the static path)."""
    ihdr = plte = actl = None
    idat: list[bytes] = []
    frames: list[dict] = []
    idat_seen = False
    for cid, body in _png_chunks(payload):
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"PLTE":
            plte = body
        elif cid == b"acTL":
            actl = body
        elif cid == b"fcTL":
            if len(body) != 26:
                raise ValueError("corrupt APNG frame control chunk")
            frames.append({
                "w": int.from_bytes(body[4:8], "big"),
                "h": int.from_bytes(body[8:12], "big"),
                "x": int.from_bytes(body[12:16], "big"),
                "y": int.from_bytes(body[16:20], "big"),
                "dispose": body[24],
                "blend": body[25],
                "data": [],
                "use_idat": not idat_seen,
            })
        elif cid == b"IDAT":
            idat_seen = True
            idat.append(body)
        elif cid == b"fdAT":
            if not frames:
                raise ValueError("APNG fdAT before any frame control")
            frames[-1]["data"].append(body[4:])  # drop sequence number
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing IHDR")
    if actl is None:
        raise ValueError("PNG has no animation control chunk")
    if not frames:
        raise ValueError("APNG has no frames")
    width, height, depth, ctype, interlace = _png_header(ihdr)
    declared = int.from_bytes(actl[0:4], "big")
    if declared != len(frames):
        raise ValueError("APNG frame count != acTL declaration")
    canvas = np.zeros((height, width, 4), dtype=np.float64)
    out: list[np.ndarray] = []
    for f in frames:
        raw = (b"".join(idat) if f["use_idat"] and not f["data"]
               else b"".join(f["data"]))
        if not raw:
            raise ValueError("APNG frame has no image data")
        if (f["w"] == 0 or f["h"] == 0 or f["x"] + f["w"] > width
                or f["y"] + f["h"] > height):
            raise ValueError("APNG frame exceeds the canvas")
        sub = _png_pixels(
            _inflate_exact(
                raw,
                _png_raster_size(f["w"], f["h"], depth, ctype, interlace),
            ),
            f["w"], f["h"], depth, ctype, interlace, plte,
        ).astype(np.float64)
        region = canvas[f["y"] : f["y"] + f["h"],
                        f["x"] : f["x"] + f["w"]]
        saved = region.copy() if f["dispose"] == 2 else None
        if f["blend"] == 0:  # SOURCE: replace, alpha included
            region[:] = sub
        else:  # OVER: straight-alpha composite
            sa = sub[:, :, 3:4] / 255.0
            da = region[:, :, 3:4] / 255.0
            oa = sa + da * (1.0 - sa)
            rgb = sub[:, :, :3] * sa + region[:, :, :3] * da * (1.0 - sa)
            region[:, :, :3] = np.divide(
                rgb, oa, out=np.zeros_like(rgb), where=oa > 0
            )
            region[:, :, 3:4] = oa * 255.0
        out.append(_png_luma(np.round(canvas[:, :, :3]).astype(np.uint8)))
        if f["dispose"] == 1:  # clear the region to transparent black
            region[:] = 0.0
        elif f["dispose"] == 2:  # restore what this frame painted over
            region[:] = saved
    return out


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW (the public GIF89a spec, Appendix F): codes are
    packed LSB-first, the dictionary resets on the clear code, and the
    code width grows — right after the entry with value 2**width is
    assigned — up to the 12-bit cap, where a full table freezes until a
    (possibly deferred) clear. Codes come from an LSB-first windowed
    accumulator — O(1) per code (shifting a whole-stream big int copies
    the remainder every time: quadratic)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _gif_parse(payload: bytes, limit: int | None = None):
    """Parse a GIF87a/89a stream: logical screen, color tables, Graphic
    Control Extensions (disposal + transparency), and up to ``limit``
    image frames (LZW-decoded, interlace unwoven). Returns
    ((screen_w, screen_h, bg_index, global_palette), frames) with each
    frame (left, top, palette, index_raster, disposal, transparent)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    screen_w = int.from_bytes(payload[6:8], "little")
    screen_h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        raw = payload[pos : pos + 3 * n]
        if len(raw) != 3 * n:
            raise ValueError("truncated GIF color table")
        global_pal = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames: list[tuple] = []
    gce = (0, None)  # (disposal method, transparent index)
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-framed sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            subs: list[bytes] = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                subs.append(payload[pos : pos + n])
                pos += n
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                b0 = subs[0]
                gce = ((b0[0] >> 2) & 0x7,
                       b0[3] if b0[0] & 1 else None)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left = int.from_bytes(payload[pos : pos + 2], "little")
        top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        width = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        height = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        palette = global_pal
        if iflags & 0x80:  # local color table overrides the global one
            n = 2 << (iflags & 7)
            raw = payload[pos : pos + 3 * n]
            if len(raw) != 3 * n:
                raise ValueError("truncated GIF local color table")
            palette = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        if width == 0 or height == 0 or pos >= len(payload):
            raise ValueError("corrupt GIF image descriptor")
        if left + width > screen_w or top + height > screen_h:
            raise ValueError("GIF frame exceeds the logical screen")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"invalid GIF LZW minimum code size {mcs}")
        chunks: list[bytes] = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            chunk = payload[pos : pos + n]
            if len(chunk) != n:
                raise ValueError("truncated GIF data sub-block")
            chunks.append(chunk)
            pos += n
        idx = _gif_lzw_decode(b"".join(chunks), mcs, width * height)
        if len(idx) < width * height:
            raise ValueError("GIF pixel data underflow")
        raster = np.frombuffer(
            idx[: width * height], dtype=np.uint8
        ).reshape(height, width)
        if iflags & 0x40:  # interlaced: rows arrive in the four passes
            order = np.concatenate(
                [np.arange(0, height, 8), np.arange(4, height, 8),
                 np.arange(2, height, 4), np.arange(1, height, 2)]
            )
            unwoven = np.empty_like(raster)
            unwoven[order] = raster
            raster = unwoven
        frames.append((left, top, palette, raster, gce[0], gce[1]))
        gce = (0, None)  # a GCE governs exactly one image
        if limit is not None and len(frames) >= limit:
            return (screen_w, screen_h, bg_index, global_pal), frames
    if not frames:
        raise ValueError("GIF has no image data")
    return (screen_w, screen_h, bg_index, global_pal), frames


def _gif_frames_luma(payload: bytes,
                     limit: int | None = None) -> list[np.ndarray]:
    """Composite a (possibly animated) GIF's frames per the public
    animation semantics: each frame draws its rectangle over the
    canvas, transparent indices preserve what is underneath, and the
    disposal method (keep / restore-to-background / restore-previous)
    prepares the canvas for the next frame. Returns per-frame
    (screen_h, screen_w) uint8 luma snapshots (BT.601, same rounding as
    the PNG/PPM paths)."""
    (screen_w, screen_h, bg_index, global_pal), frames = _gif_parse(
        payload, limit
    )
    if global_pal is not None and bg_index < len(global_pal):
        bg_rgb = global_pal[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (screen_h, screen_w, 3)).copy()
    out: list[np.ndarray] = []
    for left, top, palette, raster, disposal, transparent in frames:
        h, w = raster.shape
        opaque = (raster != transparent if transparent is not None
                  else np.ones_like(raster, dtype=bool))
        if opaque.any() and int(raster[opaque].max()) >= len(palette):
            raise ValueError("GIF palette index out of range")
        region = canvas[top : top + h, left : left + w]
        saved = region.copy() if disposal == 3 else None
        safe = np.where(opaque, raster, 0)  # transparent: any valid idx
        region[opaque] = palette[safe][opaque]
        out.append(_png_luma(canvas))
        if disposal == 2:  # restore the rectangle to the background
            region[:] = bg_rgb
        elif disposal == 3:  # restore what this frame painted over
            region[:] = saved
    return out


def _decode_gif(payload: bytes) -> np.ndarray:
    """REAL decoder for GIF87a/89a (LZW + palette, the public spec).
    Still images return the composited first frame; for animations the
    features describe frame 1 — the same convention as video
    thumbnailing (``sample_frames`` walks the full animation).

    Scale: O(payload bytes) per image inside the Arrow batch — the
    mapInPandas plumbing is unchanged."""
    return _gif_frames_luma(payload, limit=1)[0]


#: TGA 2.0 footer signature (the last 18 bytes of the file): the ONLY
#: reliable in-band marker — TGA has no header magic, so dispatch keys
#: on the footer and TGA 1.0 files (footerless) stay on the stub path.
_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def _decode_tga(payload: bytes) -> np.ndarray:
    """REAL decoder for Targa (TGA 2.0, the public spec): gray,
    truecolor (16-bit 5-5-5, 24, 32-bit BGRA) and 8-bit palette images,
    uncompressed or RLE-packed, both vertical origins. Returns the
    uint8 luma plane (BT.601, same rounding as the other paths)."""
    if len(payload) < 18 + 26 or payload[-18:] != _TGA_FOOTER:
        raise ValueError("not a TGA 2.0 file")
    id_len = payload[0]
    cmap_type = payload[1]
    image_type = payload[2]
    cmap_len = int.from_bytes(payload[5:7], "little")
    cmap_depth = payload[7]
    width = int.from_bytes(payload[12:14], "little")
    height = int.from_bytes(payload[14:16], "little")
    depth = payload[16]
    top_down = bool(payload[17] & 0x20)
    base_type = image_type & ~8
    rle = bool(image_type & 8)
    if base_type not in (1, 2, 3):
        raise ValueError(f"unsupported TGA image type {image_type}")
    if width == 0 or height == 0:
        raise ValueError("corrupt TGA dimensions")
    pos = 18 + id_len
    palette = None
    if cmap_type == 1:
        step = (cmap_depth + 7) // 8
        if step not in (3, 4):
            raise ValueError(f"unsupported TGA colormap depth {cmap_depth}")
        raw = payload[pos : pos + cmap_len * step]
        if len(raw) != cmap_len * step:
            raise ValueError("truncated TGA colormap")
        bgra = np.frombuffer(raw, np.uint8).reshape(-1, step)
        palette = bgra[:, :3][:, ::-1]  # BGR(A) -> RGB
        pos += cmap_len * step
    px_bytes = (depth + 7) // 8
    if (base_type == 1 and depth != 8) or (base_type == 3 and depth != 8):
        raise ValueError("palette/gray TGA must be 8-bit")
    if base_type == 2 and depth not in (16, 24, 32):
        raise ValueError(f"unsupported TGA pixel depth {depth}")
    n = width * height
    if rle:
        out = bytearray()
        while len(out) < n * px_bytes:
            if pos >= len(payload) - 26:
                raise ValueError("truncated TGA RLE data")
            head = payload[pos]
            pos += 1
            count = (head & 0x7F) + 1
            if head & 0x80:  # run packet: one pixel repeated
                pix = payload[pos : pos + px_bytes]
                if len(pix) != px_bytes:
                    raise ValueError("truncated TGA RLE run")
                out += pix * count
                pos += px_bytes
            else:  # literal packet
                lit = payload[pos : pos + count * px_bytes]
                if len(lit) != count * px_bytes:
                    raise ValueError("truncated TGA RLE literal")
                out += lit
                pos += count * px_bytes
        raster = bytes(out[: n * px_bytes])
    else:
        raster = payload[pos : pos + n * px_bytes]
        if len(raster) != n * px_bytes:
            raise ValueError("truncated TGA pixel data")
    arr = np.frombuffer(raster, np.uint8).reshape(height, width, px_bytes)
    if not top_down:  # default TGA origin is bottom-left
        arr = arr[::-1]
    if base_type == 3:
        return arr[:, :, 0].copy()
    if base_type == 1:
        if palette is None:
            raise ValueError("palette TGA is missing its colormap")
        idx = arr[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("TGA palette index out of range")
        return _png_luma(palette[idx])
    if depth == 16:  # ARRRRRGG GGGBBBBB little-endian (5-5-5)
        v = arr[:, :, 0].astype(np.uint16) | (
            arr[:, :, 1].astype(np.uint16) << 8
        )
        five = np.stack([(v >> 10) & 31, (v >> 5) & 31, v & 31], axis=2)
        rgb = np.round(five * (255.0 / 31.0)).astype(np.uint8)
        return _png_luma(rgb)
    return _png_luma(arr[:, :, :3][:, :, ::-1])  # BGR(A) -> RGB


def _decode_qoi(payload: bytes) -> np.ndarray:
    """REAL decoder for QOI ("Quite OK Image", the public one-page
    spec): byte-oriented ops over a running pixel + 64-entry hash
    index — RGB/RGBA literals, INDEX, DIFF, LUMA, RUN — ending at the
    7x00+01 marker. Returns the uint8 luma plane (BT.601)."""
    if payload[:4] != b"qoif" or len(payload) < 22:
        raise ValueError("not a QOI image")
    width = int.from_bytes(payload[4:8], "big")
    height = int.from_bytes(payload[8:12], "big")
    channels = payload[12]
    if channels not in (3, 4) or payload[13] > 1:
        raise ValueError("corrupt QOI header")
    if width == 0 or height == 0:
        raise ValueError("corrupt QOI dimensions")
    n = width * height
    out = np.zeros((n, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    filled = 0
    while filled < n:
        if pos >= len(payload):
            raise ValueError("truncated QOI stream")
        op = payload[pos]
        pos += 1
        if op == 0xFE:  # QOI_OP_RGB
            if pos + 3 > len(payload):
                raise ValueError("truncated QOI stream")
            r, g, b = payload[pos : pos + 3]
            pos += 3
        elif op == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > len(payload):
                raise ValueError("truncated QOI stream")
            r, g, b, a = payload[pos : pos + 4]
            pos += 4
        elif op >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[op & 0x3F]
        elif op >> 6 == 1:  # QOI_OP_DIFF (biased by 2)
            r = (r + ((op >> 4) & 3) - 2) & 0xFF
            g = (g + ((op >> 2) & 3) - 2) & 0xFF
            b = (b + (op & 3) - 2) & 0xFF
        elif op >> 6 == 2:  # QOI_OP_LUMA
            dg = (op & 0x3F) - 32
            if pos >= len(payload):
                raise ValueError("truncated QOI stream")
            nxt = payload[pos]
            pos += 1
            r = (r + dg - 8 + (nxt >> 4)) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg - 8 + (nxt & 0x0F)) & 0xFF
        else:  # QOI_OP_RUN (biased by -1)
            run = (op & 0x3F) + 1
            if filled + run > n:
                raise ValueError("QOI run overflows the image")
            out[filled : filled + run] = (r, g, b)
            filled += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[filled] = (r, g, b)
        filled += 1
    if payload[pos : pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    return _png_luma(out.reshape(height, width, 3))


def _decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed BMP (BITMAPINFOHEADER, BI_RGB):
    8-bit palette and 24/32-bit BGR(A), 4-byte-aligned rows, bottom-up
    or top-down. Returns the uint8 luma plane (BT.601, same rounding as
    the other color paths)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core-header variant unsupported")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError("only uncompressed BI_RGB BMP is supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if width <= 0 or height == 0:
        raise ValueError("corrupt BMP dimensions")
    top_down = height < 0
    height = abs(height)
    stride = (width * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    raster = payload[data_off : data_off + stride * height]
    if len(raster) != stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal_raw = payload[14 + hdr_size : 14 + hdr_size + 4 * n_colors]
        if len(pal_raw) != 4 * n_colors:
            raise ValueError("truncated BMP palette")
        pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(-1, 4)
        idx = rows[:, :width]
        if int(idx.max()) >= n_colors:
            raise ValueError("BMP palette index out of range")
        bgr = pal[idx][:, :, :3]
    else:
        step = bpp // 8
        bgr = rows[:, : width * step].reshape(height, width, step)[:, :, :3]
    return _png_luma(bgr[:, :, ::-1])  # BGR -> RGB


def _decode_ico(payload: bytes) -> np.ndarray:
    """REAL decoder for ICO (the public ICONDIR layout): picks the
    largest directory entry and dispatches its image — a full PNG
    stream since Vista, else a headerless DIB whose stored height is
    doubled for the trailing 1-bit AND mask (the XOR plane is decoded;
    the mask is transparency metadata the features ignore). The DIB
    reuses ``_decode_bmp`` via a synthesized file header."""
    if payload[:4] != b"\x00\x00\x01\x00" or len(payload) < 22:
        raise ValueError("not an ICO")
    count = int.from_bytes(payload[4:6], "little")
    if count == 0:
        raise ValueError("ICO has no images")
    best = None
    for i in range(count):
        e = payload[6 + 16 * i : 6 + 16 * (i + 1)]
        if len(e) != 16:
            raise ValueError("truncated ICO directory")
        w = e[0] or 256
        h = e[1] or 256
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    data = payload[best[1] : best[1] + best[2]]
    if len(data) != best[2]:
        raise ValueError("truncated ICO image data")
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    if len(data) < 40:
        raise ValueError("truncated ICO DIB")
    hdr_size = int.from_bytes(data[0:4], "little")
    height = int.from_bytes(data[8:12], "little", signed=True)
    patched = bytearray(data)
    patched[8:12] = (height // 2).to_bytes(4, "little", signed=True)
    bpp = int.from_bytes(data[14:16], "little")
    n_colors = int.from_bytes(data[32:36], "little") or (
        256 if bpp == 8 else 0
    )
    data_off = 14 + hdr_size + 4 * n_colors
    bmp = (b"BM" + (14 + len(patched)).to_bytes(4, "little") + bytes(4)
           + data_off.to_bytes(4, "little") + bytes(patched))
    return _decode_bmp(bmp)


def _f80_to_int(b: bytes) -> int:
    """80-bit IEEE extended float (AIFF sample rate) → int Hz."""
    exp = int.from_bytes(b[0:2], "big") & 0x7FFF
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    shift = exp - 16383 - 63
    val = mant * (2.0 ** shift)
    return int(round(val))


def _decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for AIFF (FORM/AIFF, big-endian): COMM carries
    channels / 16-bit sample size / the 80-bit-float sample rate, SSND
    the PCM frames. Multi-channel downmixes by averaging like WAV."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF container")
    pos = 12
    n_channels = bits = rate = None
    data = None
    end = min(len(payload), 8 + int.from_bytes(payload[4:8], "big"))
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "big")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated AIFF chunk")
        if cid == b"COMM":
            n_channels = int.from_bytes(body[0:2], "big")
            bits = int.from_bytes(body[6:8], "big")
            rate = _f80_to_int(body[8:18])
        elif cid == b"SSND":
            offset = int.from_bytes(body[0:4], "big")
            data = body[8 + offset :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None or data is None or not rate:
        raise ValueError("missing AIFF COMM or SSND chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM AIFF is supported")
    samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype=">i2")
    if n_channels > 1:
        samples = (
            samples[: len(samples) - len(samples) % n_channels]
            .reshape(-1, n_channels)
            .mean(axis=1)
            .astype(np.int16)
        )
    return samples.astype(np.int16), rate


def _decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for Sun/NeXT .au (the public .snd header): µ-law
    (encoding 1, through the exact G.711 LUT), 8-bit linear PCM
    (encoding 2) and 16-bit big-endian PCM (encoding 3), mono only."""
    if payload[:4] != b".snd" or len(payload) < 24:
        raise ValueError("not an AU stream")
    hdr_size = int.from_bytes(payload[4:8], "big")
    data_size = int.from_bytes(payload[8:12], "big")
    encoding = int.from_bytes(payload[12:16], "big")
    rate = int.from_bytes(payload[16:20], "big")
    n_channels = int.from_bytes(payload[20:24], "big")
    if n_channels != 1:
        raise ValueError("AU decode is mono-only here")
    if hdr_size < 24:
        raise ValueError("corrupt AU header size")
    data = payload[hdr_size:]
    if data_size != 0xFFFFFFFF:
        data = data[:data_size]
    if encoding == 1:  # G.711 µ-law
        return _g711_ulaw_table()[np.frombuffer(data, np.uint8)], rate
    if encoding == 2:  # 8-bit linear (signed)
        s8 = np.frombuffer(data, dtype=np.int8).astype(np.int16)
        return s8 * 256, rate
    if encoding == 3:  # 16-bit big-endian PCM
        clipped = data[: len(data) - len(data) % 2]
        return np.frombuffer(clipped, dtype=">i2").astype(np.int16), rate
    raise ValueError(f"unsupported AU encoding {encoding}")


def _g711_ulaw_table() -> np.ndarray:
    """256-entry µ-law → linear int16 LUT (ITU-T G.711, the public
    CCITT reference formula: BIAS 0x84, 3-bit exponent segments)."""
    out = np.empty(256, dtype=np.int16)
    for u in range(256):
        v = ~u & 0xFF
        t = ((v & 0x0F) << 3) + 0x84
        t <<= (v & 0x70) >> 4
        out[u] = (0x84 - t) if v & 0x80 else (t - 0x84)
    return out


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law → linear int16 LUT (ITU-T G.711: XOR 0x55
    unmasking, 13-bit magnitude segments)."""
    out = np.empty(256, dtype=np.int16)
    for a in range(256):
        v = a ^ 0x55
        t = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[a] = t if v & 0x80 else -t
    return out


_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _decode_ima_adpcm_mono(data: bytes, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format tag 0x11, mono) → int16 samples: the
    public 4-bit predictive codec — per block, a 4-byte header seeds the
    predictor and step index, then each nibble (low first) adds a
    step-scaled delta and walks the step table. The nibble loop is
    inherently sequential (each sample feeds the next prediction), like
    PNG's Paeth row — per-sample Python here, PIL/ffmpeg in a
    deployment."""
    out: list[int] = []
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = block[2]
        if index > 88:
            raise ValueError("corrupt ADPCM block: step index > 88")
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEP_TABLE[index])
                diff = step >> 3
                if nibble & 1:
                    diff += step >> 2
                if nibble & 2:
                    diff += step >> 1
                if nibble & 4:
                    diff += step
                pred = pred - diff if nibble & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index += int(_IMA_INDEX_TABLE[nibble & 7])
                index = max(0, min(88, index))
                out.append(pred)
    return np.array(out, dtype=np.int16)


#: MS-ADPCM (WAV format tag 0x0002) public spec tables: the 7 fixed
#: predictor-coefficient pairs (8.8 fixed point) and the 16-entry delta
#: adaptation table.
_MS_ADPCM_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_ADPCM_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADPCM_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
                   768, 614, 512, 409, 307, 230, 230, 230)


def _decode_ms_adpcm_mono(data: bytes, block_align: int) -> np.ndarray:
    """MS-ADPCM (WAV format tag 0x0002, mono) → int16 samples, from the
    public spec: per block, a 7-byte header carries the predictor index
    (selecting one of 7 fixed two-tap coefficient pairs in 8.8 fixed
    point), the initial quantizer step ``delta`` and the two seed
    samples; each 4-bit signed nibble (HIGH nibble first — the opposite
    of IMA) then adds ``nibble·delta`` to the two-tap linear prediction
    ``(s1·c1 + s2·c2) >> 8`` and rescales delta through the adaptation
    table (floor 16). Sequential like the IMA loop — per-sample Python
    here, PIL/ffmpeg in a deployment."""
    out: list[int] = []
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        pred_idx = block[0]
        if pred_idx > 6:
            raise ValueError("corrupt MS-ADPCM block: predictor index > 6")
        c1 = _MS_ADPCM_COEF1[pred_idx]
        c2 = _MS_ADPCM_COEF2[pred_idx]
        delta = int.from_bytes(block[1:3], "little", signed=True)
        s1 = int.from_bytes(block[3:5], "little", signed=True)
        s2 = int.from_bytes(block[5:7], "little", signed=True)
        out.append(s2)  # sample2 is the OLDER seed: emitted first
        out.append(s1)
        for byte in block[7:]:
            for nibble in (byte >> 4, byte & 0x0F):
                signed = nibble - 16 if nibble & 8 else nibble
                predictor = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
                predictor = max(-32768, min(32767, predictor))
                s2, s1 = s1, predictor
                delta = (_MS_ADPCM_ADAPT[nibble] * delta) >> 8
                if delta < 16:
                    delta = 16
                out.append(predictor)
    return np.array(out, dtype=np.int16)


def _decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Real decoder for canonical RIFF/WAVE: walks the chunk list for
    fmt + data. PCM 16-bit (format 1) views the samples as little-endian
    int16; the COMPRESSED formats G.711 A-law/µ-law (formats 6/7 — ITU-T
    companding, decoded through exact 256-entry LUTs, fully vectorized)
    IMA ADPCM (format 0x11, 4-bit predictive) and MS-ADPCM (format
    0x02, two-tap linear prediction) also decode for real — no codec
    library needed, every formula is the public spec. Channels
    are interleaved; multi-channel PCM is downmixed by averaging
    (compressed formats are mono-only here). Returns
    (int16 samples, sample_rate_from_container)."""
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE container")
    pos = 12
    audio_format = None
    sample_rate = None
    n_channels = 1
    block_align = 0
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format == 1 and bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported PCM WAV bit depth {bits}")
            if audio_format == 3 and bits not in (32, 64):
                raise ValueError("IEEE-float WAV must be 32- or 64-bit")
            if audio_format in (6, 7) and bits != 8:
                raise ValueError("G.711 WAV must be 8-bit")
            if audio_format not in (1, 2, 3, 6, 7, 0x11):
                raise ValueError(
                    f"unsupported WAV format tag {audio_format} (PCM, "
                    "IEEE float, G.711 A-law/µ-law, MS-ADPCM and IMA "
                    "ADPCM decode here)"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if audio_format == 0x11:
        if n_channels != 1:
            raise ValueError("IMA ADPCM decode is mono-only here")
        return _decode_ima_adpcm_mono(data, block_align), sample_rate
    if audio_format == 2:
        if n_channels != 1:
            raise ValueError("MS-ADPCM decode is mono-only here")
        return _decode_ms_adpcm_mono(data, block_align), sample_rate
    if audio_format in (6, 7):
        if n_channels != 1:
            raise ValueError("G.711 decode is mono-only here")
        lut = _g711_alaw_table() if audio_format == 6 else _g711_ulaw_table()
        return lut[np.frombuffer(data, dtype=np.uint8)], sample_rate
    if audio_format == 3:  # IEEE float: scale [-1, 1] to int16
        dt = "<f4" if bits == 32 else "<f8"
        step = bits // 8
        floats = np.frombuffer(data[: len(data) - len(data) % step], dt)
        samples = np.round(
            np.clip(floats, -1.0, 1.0) * 32767.0
        ).astype(np.int16)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif bits == 8:  # PCM8 is UNSIGNED by spec
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:  # 24/32-bit integer PCM: keep the top 16 bits
        step = bits // 8
        raw = np.frombuffer(
            data[: len(data) - len(data) % step], dtype=np.uint8
        ).reshape(-1, step)
        hi = raw[:, -1].astype(np.int16) - (raw[:, -1] >= 128) * 256
        samples = (hi.astype(np.int16) * 256
                   + raw[:, -2].astype(np.int16)).astype(np.int16)
    if n_channels > 1:
        samples = (
            samples[: len(samples) - len(samples) % n_channels]
            .reshape(-1, n_channels)
            .mean(axis=1)
            .astype(np.int16)
        )
    return samples, sample_rate


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Dispatching decoder: real PNM parse when the payload is PGM/PPM,
    real PNG decode (stdlib zlib + numpy) on the 8-byte PNG signature,
    real baseline-JPEG decode (``jpegcodec``) on the 3-byte SOI+marker
    signature, real GIF decode (LZW) on the 6-byte GIF87a/89a magic,
    else the deterministic tiling STUB (a deployment would
    route the remaining codecs through PIL here). The JPEG signature is
    3 bytes (FF D8 FF — every real JPEG follows SOI with another
    marker) rather than SOI alone: 2 random bytes collide with md5-
    derived synthetic payloads at realistic corpus sizes (doc 1566 at
    sf0.1 starts FF D8), 3 bytes are collision-checked clean on all
    shipped fixtures."""
    if not payload:
        raise ValueError("corrupt image payload")  # mirrors real decoder
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg_luma(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload[:4] == b"qoif":
        return _decode_qoi(payload)
    if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 22:
        return _decode_ico(payload)
    # BMP's magic is only 2 bytes ("BM") — like the JPEG case, that
    # collides with arbitrary binary at realistic corpus sizes, so the
    # dispatch also demands a known DIB header size (a 4-byte check)
    if (payload[:2] == b"BM" and len(payload) >= 54
            and int.from_bytes(payload[14:18], "little")
            in (40, 52, 56, 108, 124)):
        return _decode_bmp(payload)
    # Magic + following whitespace: a 2-byte magic alone has ~3e-5 odds of
    # appearing in arbitrary binary, which would mis-dispatch synthetic
    # payloads into the strict parser.
    if payload[:2] in (b"P5", b"P6") and payload[2:3].isspace():
        return _decode_pnm(payload)
    if payload[:3] == b"P7\n":
        return _decode_pam(payload)
    # TGA has NO header magic; only the TGA 2.0 footer signature is a
    # safe dispatch key (TGA 1.0 files stay on the stub path)
    if len(payload) >= 44 and payload[-18:] == _TGA_FOOTER:
        return _decode_tga(payload)
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(buf)))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int | None]:
    """Dispatching decoder: real RIFF/WAV parse when the payload is a
    WAVE container, real FLAC decode (``flaccodec``, lossless) on the
    fLaC magic — both carry the sample rate in-band — else the
    deterministic STUB (rate comes from metadata; soundfile would slot
    in here). Multi-channel FLAC downmixes by averaging, same as
    multi-channel PCM WAV."""
    if not payload:
        raise ValueError("corrupt audio payload")
    if payload[:4] == b"RIFF":
        return _decode_wav_pcm16(payload)
    if payload[:4] == b"fLaC":
        chans, rate, bps = decode_flac(payload)
        # rescale to the 16-bit convention: >16-bit keeps the top 16
        # bits (like 24/32-bit WAV), <16-bit shifts up
        if bps > 16:
            chans = chans >> (bps - 16)
        elif bps < 16:
            chans = chans << (16 - bps)
        if chans.shape[1] > 1:
            return chans.mean(axis=1).astype(np.int16), rate
        return chans[:, 0].astype(np.int16), rate
    if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        return _decode_aiff(payload)
    if payload[:4] == b".snd":
        return _decode_au(payload)
    buf = np.frombuffer(payload, dtype=np.uint8).astype(np.int16)
    return (buf - 128) * 256, None


# ---------------------------------------------------------------------------
# Operators (real Spark plumbing)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_luma double, max_luma int, phash string"
)


def _plane_features(plane: np.ndarray) -> dict:
    """The shared per-plane feature math: dims, mean/max luma, and the
    16-bit column-profile perceptual hash."""
    med = float(np.median(plane))
    bits = (plane.mean(axis=0)[:16] > med).astype(int)
    return {
        "width": plane.shape[1],
        "height": plane.shape[0],
        "mean_luma": float(plane.mean()),
        "max_luma": int(plane.max()),
        "phash": "".join(map(str, bits)),
    }


def image_features(media: DataFrame) -> DataFrame:
    """Per-image features via mapInPandas (Arrow batches, no shuffle).
    Feature math (mean/max/percentile-hash) is vectorized numpy on the
    decoded plane; decode goes through the real dispatcher (only
    unrecognized payloads fall to the deterministic stub)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                plane = _decode_image(bytes(payload), w, h)
                # A real container's header wins over caller metadata.
                rows.append({"media_id": mid, **_plane_features(plane)})
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_luma", "max_luma", "phash",
            ])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(extract, IMAGE_FEATURES_SCHEMA)
    )


RESIZE_SCHEMA = "media_id bigint, width int, height int, payload binary"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize via decode → nearest-neighbor index → raw luma bytes.
    Decode goes through the real dispatcher (PNM/PNG/JPEG/GIF/TIFF/BMP/
    QOI decode for real; unrecognized payloads use the deterministic
    stub); the output payload is the headerless (out_h, out_w) uint8
    plane."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                plane = _decode_image(bytes(payload), w, h)
                h, w = plane.shape
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                resized = plane[yi, xi]
                out.append(
                    {
                        "media_id": mid,
                        "width": out_w,
                        "height": out_h,
                        "payload": resized.astype(np.uint8).tobytes(),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "payload"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(resize, RESIZE_SCHEMA)
    )


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_payload binary"


def _avi_video_frames(payload: bytes) -> list[bytes]:
    """REAL video demux for RIFF/AVI (the public container spec): walk
    the LIST tree to 'movi' and collect the video-stream frame chunks
    ('NNdc'/'NNdb', including inside 'rec ' groups, word-aligned). For
    Motion-JPEG AVIs — the common self-contained archival format — each
    returned frame is a complete JPEG that ``jpegcodec`` then decodes
    for real; inter-frame codecs (H.264 etc.) would demux identically
    but their frame payloads stay at the documented stub boundary."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if body + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)  # chunks are word-aligned

    riff_end = 8 + int.from_bytes(payload[4:8], "little")
    walk(12, min(riff_end, len(payload)))
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    return frames


def payload_frames(
    raw: bytes, meta, every_n: int
) -> list[tuple[int, bytes]]:
    """Row-LOCAL frame extraction for one video payload — the single
    shared implementation behind ``sample_frames`` (the batch fan-out)
    and the streaming shot path (``videoshots.shot_rep_stream``, where
    a video's frames must never cross a row boundary because streaming
    has no per-video window). Returns (frame_idx, frame_payload) in
    frame order, sampled every ``every_n``. RIFF/AVI demuxes for real
    (``_avi_video_frames``; MJPEG frames are decodable JPEGs); animated
    GIF/APNG composite for real (disposal/blending/transparency; a
    static PNG is its single frame), each emitted as a binary PGM;
    other payloads fall back to deterministic byte slices (STUB for an
    ffmpeg seek+decode). Hoisted verbatim from sample_frames' closure
    in round 10 (byte-identical output; parity additionally pinned by
    the streaming-vs-batch pytest in tests/test_videoshots.py)."""
    out: list[tuple[int, bytes]] = []
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        real = _avi_video_frames(raw)
        for i in range(0, len(real), every_n):
            out.append((i, real[i]))
        return out
    lumas = None
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        lumas = _gif_frames_luma(raw)
    elif raw[:8] == _PNG_SIG:
        animated = False
        for cid, _ in _png_chunks(raw):
            if cid == b"acTL":
                animated = True
            if animated or cid == b"IDAT":
                break  # acTL must precede IDAT (APNG spec)
        lumas = (_apng_frames_luma(raw) if animated
                 else [_decode_png(raw)])
    if lumas is not None:
        for i, luma in enumerate(lumas):
            if i % every_n:
                continue
            head = (f"P5\n{luma.shape[1]} "
                    f"{luma.shape[0]}\n255\n").encode()
            out.append((i, head + luma.tobytes()))
        return out
    n = int(meta["n_frames"])
    for i in range(0, n, every_n):
        lo = (i * len(raw)) // n
        hi = ((i + 1) * len(raw)) // n
        out.append((i, raw[lo:hi]))
    return out


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video → frames fan-out (1 row in, n_frames/every_n rows out), the
    mapInPandas shape for frame extraction — ``payload_frames`` applied
    per row (see its docstring for the real-demux/composite/stub
    dispatch)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                for i, fp in payload_frames(bytes(payload), meta, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_payload": fp,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(frames, FRAME_SCHEMA)
    )


FRAME_FEATURES_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, "
    "mean_luma double, max_luma int, phash string"
)


def video_frame_features(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Per-FRAME features for videos: the ``sample_frames`` fan-out
    piped into the shared image feature math — two chained narrow
    mapInPandas stages, still no shuffle. The frame payloads are real
    images (MJPEG frames from AVI, PGM composites from animated
    GIF/APNG; stub byte-slices tile like any unrecognized blob), so the
    per-frame phash stream is a direct input to video near-duplicate
    detection: shot-level dedup groups consecutive equal hashes,
    corpus-level dedup joins frame-hash sets across videos.

    Scale (100 TB): both stages pipeline with the scan; the fan-out
    multiplies rows by n_frames/every_n BEFORE any shuffle a consumer
    adds, so partition sizing must follow the frame count, not the
    video count. Candidate for a round-7 ``queries()`` registration
    (rows-only, like the other m_* rows)."""
    frames = sample_frames(media, every_n=every_n)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, idx, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                plane = _decode_image(bytes(payload), 16, 16)
                rows.append(
                    {"media_id": mid, "frame_idx": idx,
                     **_plane_features(plane)}
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "mean_luma",
                "max_luma", "phash",
            ])

    return frames.mapInPandas(extract, FRAME_FEATURES_SCHEMA)


AUDIO_SCHEMA = (
    "media_id bigint, n_samples int, duration_s double, rms double"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio duration + RMS over decoded samples. Decode goes through
    the real dispatcher (WAV/FLAC/AIFF/AU decode for real; only
    unrecognized payloads fall to the deterministic stub)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                samples, sr_file = _decode_audio(bytes(payload))
                sr = sr_file or int(meta["sample_rate"])
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": len(samples),
                        "duration_s": len(samples) / sr,
                        "rms": float(
                            np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "duration_s", "rms"]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "meta")
        .mapInPandas(extract, AUDIO_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Registry entries (rows-only driver checks: pandas-UDF ops aren't
# SQL-expressible — SURVEY §5.1 weak-check carve-out)
# ---------------------------------------------------------------------------

from culvert_spark.queries import QUERIES, ORACLE, register  # noqa: E402,F401


@register("m_image_features")
def m_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(synthetic_media(spark, sf_dir)).orderBy("media_id")


@register("m_frame_sample")
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synthetic_media(spark, sf_dir), every_n=2).orderBy(
        "media_id", "frame_idx"
    )


@register("m_audio_features")
def m_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(synthetic_media(spark, sf_dir)).orderBy("media_id")


def image_dedup_groups(media: DataFrame) -> DataFrame:
    """Near-duplicate image grouping by perceptual hash: decode → 16-bit
    column-profile phash (``image_features``) → hash-groupBy — the
    multimodal analog of exact text dedup, and the first pass of any image
    corpus cleanup (identical and trivially-re-encoded images share a
    phash; a Hamming-distance LSH over the same bits is the fuzzy next
    step). One shuffle on the 16-bit hash; each group reports its keeper
    (min media_id) and duplicate count."""
    feats = image_features(media)
    return (
        feats.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("media_id").alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .orderBy("phash")
    )


@register("m_image_dedup_groups")
def m_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_dedup_groups(synthetic_media(spark, sf_dir))


@register("m_video_frame_features")
def m_video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_frame_features(
        synthetic_media(spark, sf_dir), every_n=2
    ).orderBy("media_id", "frame_idx")


#: Shared constant-folding oracle for the cross-format dedup rows
#: (round-7 ADVICE: the container-collapse invariant was only
#: pytest-checked; the ground truth is fully deterministic, so state it
#: in SQL). Exactly the first 40 documents, each collapsing to ONE group
#: of 6 containers whose keeper is the PPM copy (media_id sub-index 0).
#: Assumes no phash collision among the 40 doc planes — verified for
#: the shipped sf0.001/sf0.01 test data at both registered geometries.
#: NOTE the collision domain is the phash WIDTH, i.e. min(image width,
#: 16) bits: 16 bits for the square row (~1.2% birthday odds for 40
#: arbitrary planes) but only 13 bits for the 13×7 odd row (~9%) — fine
#: for the FIXED shipped data, but regenerated or larger-sf fixtures
#: must re-verify before trusting this oracle; the collision-TOLERANT
#: invariant (n_images = 6·k, keeper % 8 = 0) stays pinned by
#: tests/test_mediagen.py for arbitrary data.
_CROSS_FORMAT_ORACLE = """
    SELECT CAST(doc_id * 8 AS BIGINT) AS keeper_id,
           CAST(6 AS BIGINT) AS n_images,
           CAST(5 AS BIGINT) AS n_dupes,
           CAST(0 AS BIGINT) AS keeper_fmt_idx
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 40)
    ORDER BY keeper_id
    """


def _cross_format_invariants(groups: DataFrame) -> DataFrame:
    """Project a cross-format dedup grouping onto its SQL-statable
    invariant columns (the raw phash bits stay pytest-pinned — they are
    not SQL-derivable, and dropping them is what upgrades the row from
    rows-only to a full value-hash oracle).

    Collision guard (round-8 ADVICE): _CROSS_FORMAT_ORACLE assumes the
    doc planes' phashes are collision-free — verified for the shipped
    fixtures, but the odd row's 13-bit domain has ~9% birthday odds
    under REGENERATED data, and a collision would otherwise surface as
    an opaque driver hash mismatch. A colliding pair collapses two
    6-container groups into one 12-image group, so any group with
    n_images != 6 is the collision signature. The guard lives IN the
    returned plan (``raise_error`` inside a CASE branch that only
    evaluates on a violating row), so the encode→decode→phash→group
    pipeline runs exactly once — when the caller executes the plan —
    with no eager probe job and no persist to leak (round-9 ADVICE:
    the previous persist()+collect() probe cached one 40-row aggregate
    per call for the session's lifetime and ran a Spark job at
    query-CONSTRUCTION time even if the plan was never executed).

    Two narrowings of the in-plan form, acceptable for the registered
    rows but binding on future consumers: (1) the guard lives in the
    n_images column — a consumer that prunes that column out (or never
    executes the plan) skips the check entirely, so any NEW caller must
    keep n_images in its projection; the two registered rows do, and
    the driver always executes them; (2) the error reports the first
    violating row the executor evaluates rather than the old probe's
    up-to-3 sample — one (keeper_id, n_images) witness is still enough
    to identify the colliding documents."""
    guard_msg = F.concat(
        F.lit(
            "cross-format dedup oracle precondition violated: group with "
            "n_images != 6 (keeper_id="
        ),
        F.col("keeper_id").cast("string"),
        F.lit(", n_images="),
        F.col("n_images").cast("string"),
        F.lit(
            ") — almost certainly a phash collision between document "
            "planes (the 13-bit odd-geometry domain has ~9% birthday "
            "odds on regenerated fixtures; see the _CROSS_FORMAT_ORACLE "
            "note). Re-verify the fixture data before trusting the "
            "constant-folding oracle; the collision-TOLERANT invariant "
            "(n_images = 6k, keeper % 8 = 0) remains in "
            "tests/test_mediagen.py."
        ),
    )
    n_guarded = (
        F.when(F.col("n_images") != 6, F.raise_error(guard_msg))
        .otherwise(F.col("n_images"))
        .cast("long")
    )
    return groups.select(
        "keeper_id",
        n_guarded.alias("n_images"),
        F.col("n_dupes").cast("long").alias("n_dupes"),
        F.pmod(F.col("keeper_id"), F.lit(8)).cast("long").alias(
            "keeper_fmt_idx"
        ),
    ).orderBy("keeper_id")


@register("m_cross_format_dedup", _CROSS_FORMAT_ORACLE)
def m_cross_format_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-insensitive image dedup as a FULL hash row: the same
    md5-derived 16×16 pixels encoded into 6 containers (mediagen) must
    collapse to one group per document with the PPM copy as keeper. A
    byte-level hash would see 240 distinct blobs; decoding for real is
    what collapses them — so any decoder regression (or a phash change
    decoupling the containers) hash-mismatches in the driver record."""
    from culvert_spark.mediagen import cross_format_dedup

    return _cross_format_invariants(cross_format_dedup(spark, sf_dir))


@register("m_cross_format_dedup_odd", _CROSS_FORMAT_ORACLE)
def m_cross_format_dedup_odd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-format collapse at a NON-SQUARE, ODD geometry (13×7):
    odd width forces BMP's 4-byte row padding (39 → 40 bytes), PNG's
    per-row filter bytes at a non-16 stride, TIFF's odd strip byte
    count, and the lossless JPEG's row-wrap predictor reset at width 13
    — the encoder padding paths pytest covers but (before round 8) the
    driver record did not. Same invariant oracle as the square row: 40
    groups of 6, PPM keeper."""
    from culvert_spark.mediagen import cross_format_dedup

    return _cross_format_invariants(
        cross_format_dedup(spark, sf_dir, width=13, height=7)
    )


def media_from_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    kind: str = "image",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Real-file media ingestion: ``binaryFile`` source → the (media_id,
    kind, payload, meta) frame every operator in this module consumes.
    media_id is a deterministic 32-bit hash of the file path (xxhash64
    masked) so re-ingesting is idempotent; width/height metadata is left 0
    — real containers carry their own dimensions and the decoders prefer
    them.

    Scale: the binaryFile listing is distributed and glob pruning happens
    at the source; payloads never visit the driver."""
    from culvert_spark.sources import read_binary_files

    files = read_binary_files(spark, path, glob=glob)
    return files.select(
        F.xxhash64("path").bitwiseAND(F.lit((1 << 31) - 1)).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
