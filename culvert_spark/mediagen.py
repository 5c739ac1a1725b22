"""Deterministic media test-vector generation: the same RGB pixels
ENCODED into six lossless containers (PPM, PNG, BMP, QOI, TIFF and
a grayscale lossless JPEG of the shared BT.601 luma), so
the cross-format near-duplicate claim — "identical pixels collapse to
one perceptual-hash group no matter the container" — is checkable as a
registered driver query, not only in pytest (where independent,
feature-complete test-side encoders pin each decoder bit-exactly;
these production encoders are deliberately minimal-but-valid writers
of the public specs: PNG filter 0 only, QOI `QOI_OP_RGB` only,
uncompressed little-endian TIFF, bottom-up 24-bit BMP, single-table
predictor-1 lossless JPEG).

This is test-vector/fixture generation in the `pds_synth_docs` mold
(culvert has no analog; the multimodal surface is the training-data
extension SURVEY §2 Tier B "Multimodal dedup"): payload bytes are
md5-chained from the documents table, so the corpus is reproducible at
any parallelism and tied to the scale-factor data like every other
registered query.

Scale (100 TB): encoding runs inside one narrow ``mapInPandas`` over
``documents`` — no shuffle, no driver round-trip; the 6× fan-out
happens inside the Python worker before rows leave it. The downstream
grouping is `image_dedup_groups`' single shuffle on the 16-bit phash.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _md5_plane(text: str, n: int) -> bytes:
    """``n`` deterministic bytes: md5 chain seeded by the document text
    (same construction idea as synthetic_media's 48-byte payloads)."""
    out = bytearray()
    h = hashlib.md5(text.encode("utf-8")).digest()
    while len(out) < n:
        out += h
        h = hashlib.md5(h).digest()
    return bytes(out[:n])


def encode_ppm(rgb: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255): header + raw interleaved raster."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(cid + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", crc)


def encode_png(rgb: np.ndarray) -> bytes:
    """Truecolor 8-bit PNG, every scanline filter 0 (None)."""
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = b"".join(
        b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raster))
        + _png_chunk(b"IEND", b"")
    )


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP: BITMAPINFOHEADER, bottom-up BGR rows
    padded to 4 bytes."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):
        row = rgb[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
        raster += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(raster), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + bytes(raster)


def encode_qoi(rgb: np.ndarray) -> bytes:
    """QOI using only ``QOI_OP_RGB`` per pixel (legal — decoders accept
    any op sequence) + the 8-byte end marker."""
    h, w, _ = rgb.shape
    px = rgb.astype(np.uint8).reshape(-1, 3)
    body = np.empty((px.shape[0], 4), dtype=np.uint8)
    body[:, 0] = 0xFE
    body[:, 1:] = px
    return (
        b"qoif" + struct.pack(">IIBB", w, h, 3, 0)
        + body.tobytes()
        + b"\x00" * 7 + b"\x01"
    )


def encode_tiff(rgb: np.ndarray) -> bytes:
    """Uncompressed little-endian RGB TIFF: one strip, the 9 baseline
    tags decode_tiff requires."""
    h, w, _ = rgb.shape
    raster = rgb.astype(np.uint8).tobytes()
    # layout: header (8) | IFD | BitsPerSample values (6) | raster
    n_tags = 9
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    bits_off = ifd_off + ifd_size
    raster_off = bits_off + 6

    def entry(tag: int, type_: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, type_, count, value)

    ifd = struct.pack("<H", n_tags)
    ifd += entry(256, 3, 1, w)            # ImageWidth, SHORT
    ifd += entry(257, 3, 1, h)            # ImageLength
    ifd += entry(258, 3, 3, bits_off)     # BitsPerSample -> offset
    ifd += entry(259, 3, 1, 1)            # Compression: none
    ifd += entry(262, 3, 1, 2)            # Photometric: RGB
    ifd += entry(273, 4, 1, raster_off)   # StripOffsets
    ifd += entry(277, 3, 1, 3)            # SamplesPerPixel
    ifd += entry(278, 3, 1, h)            # RowsPerStrip
    ifd += entry(279, 4, 1, len(raster))  # StripByteCounts
    ifd += struct.pack("<I", 0)           # no next IFD
    return (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + ifd
        + struct.pack("<HHH", 8, 8, 8)
        + raster
    )


def encode_jpeg_lossless(rgb: np.ndarray) -> bytes:
    """Minimal lossless JPEG (SOF3): a single grayscale component
    holding the BT.601 luma (same np.round formula as every other image
    path, so the decoded plane equals the other containers' luma
    bit-for-bit), predictor 1, one Huffman table (all 17 difference
    categories at 5 bits — canonical, fits Kraft), no restarts."""
    h, w, _ = rgb.shape
    p = np.round(
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.int64)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")
    bits_counts = bytes([0, 0, 0, 0, 17] + [0] * 11)
    out += seg(0xC4, b"\x00" + bits_counts + bytes(range(17)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([1, 1, 0x11, 0])
    out += seg(0xC3, sof)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 0, 0]))  # predictor 1
    # entropy: category(SSSS) at 5 bits + SSSS magnitude bits per diff
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code: int, length: int) -> None:
        nonlocal acc, nbits
        acc = (acc << length) | (code & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)  # byte stuffing

    for y in range(h):
        for x in range(w):
            if (y, x) == (0, 0):
                pred = 128  # 1 << (P - 1)
            elif y == 0:
                pred = int(p[0, x - 1])
            elif x == 0:
                pred = int(p[y - 1, 0])
            else:
                pred = int(p[y, x - 1])  # predictor 1: Ra
            d = int(p[y, x]) - pred
            size = abs(d).bit_length()
            put(size, 5)
            if size:
                put(d if d >= 0 else d + (1 << size) - 1, size)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # 1-pad the final byte
    out += body
    out += b"\xff\xd9"
    return bytes(out)


#: container id -> encoder, in the media_id sub-index order the
#: registered row uses (media_id = doc_id * 8 + index)
ENCODERS = [
    ("ppm", encode_ppm),
    ("png", encode_png),
    ("bmp", encode_bmp),
    ("qoi", encode_qoi),
    ("tiff", encode_tiff),
    ("jls", encode_jpeg_lossless),
]

_SIDE = 16  # 16x16 RGB planes: big enough for a meaningful phash


def cross_format_media(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = 40,
    width: int = _SIDE,
    height: int = _SIDE,
) -> DataFrame:
    """(media_id, kind, payload, meta) frame where each of the first
    ``n_docs`` documents becomes SIX payloads — the same md5-derived
    ``height×width`` RGB pixels (default 16×16) in PPM/PNG/BMP/QOI/TIFF
    plus a grayscale lossless JPEG of their BT.601 luma — so
    container-insensitive dedup has ground truth: exactly ``n_docs``
    groups of 6. Non-default odd/non-square geometry exercises the
    encoders' padding paths (BMP 4-byte row pad, TIFF strip byte counts,
    PNG per-row filter bytes) through the registered surface."""
    from culvert_spark.queries import t

    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_docs)
    )

    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rgb = np.frombuffer(
                    _md5_plane(str(text), width * height * 3), dtype=np.uint8
                ).reshape(height, width, 3)
                for i, (_, enc) in enumerate(ENCODERS):
                    rows.append({
                        "media_id": int(doc_id) * 8 + i,
                        "kind": "image",
                        "payload": enc(rgb),
                        "meta": {"width": width, "height": height,
                                 "sample_rate": 0, "n_frames": 1},
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return docs.mapInPandas(encode, schema)


def cross_format_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = 40,
    width: int = _SIDE,
    height: int = _SIDE,
) -> DataFrame:
    """Registered-query body: the six-container corpus through
    ``image_dedup_groups`` — each group's n_images is a multiple of 6
    (one copy per container; 6·k when k documents collide on the
    16-bit phash) and the keeper is always a PPM copy (sub-index 0,
    the min media_id in any group). A byte-level hash would see
    6·n_docs distinct blobs; decoding for real is what collapses
    them."""
    from culvert_spark.multimodal import image_dedup_groups

    return image_dedup_groups(
        cross_format_media(
            spark, sf_dir, n_docs=n_docs, width=width, height=height
        )
    ).orderBy("keeper_id")
