"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) luma decoder in pure numpy.

The third real compressed image path (after PNG in ``multimodal``):
baseline sequential DCT, 8-bit, Huffman entropy coding — the variant
virtually every training-corpus JPEG uses. No codec library is needed:
every stage is the public standard — marker parse, canonical Huffman
tables (DHT), zigzag dequantization (DQT), 8×8 inverse DCT (a pair of
numpy matmuls against the DCT-II basis), restart-marker handling, and
byte-stuffing removal.

Returns the LUMA (Y) plane: JFIF Y *is* BT.601 luma, so for feature
extraction (mean/max/phash in ``multimodal.image_features``) no chroma
upsampling or color conversion is needed — chroma blocks are still
entropy-decoded (the bitstream interleaves them) but their pixels are
discarded. Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise — a deployment routes those through PIL, and
the dispatch signature is unchanged.

Correctness is pinned by ``tests/test_jpegcodec.py`` with a test-side
baseline ENCODER (independent forward DCT + quantizer + canonical
Huffman writer): the decoder must reproduce the encoder's own
dequantize→IDCT reconstruction EXACTLY (the lossy codec's defining
contract, same technique as the ADPCM tests), across grayscale, 4:4:4
and 4:2:0 sampling, non-multiple-of-8 sizes, and restart intervals.

Scale: decode is O(payload bytes) per image inside the Arrow batch —
identical mapInPandas plumbing to every other decoder; decoder CPU
scales with executors, never with shuffles.
"""

from __future__ import annotations

import numpy as np

#: Zigzag sequence: position k in coded order -> index in the 8x8 block
#: (row-major). Generated, not typed, to be typo-proof.
_ZIGZAG: list[int] = []
for _s in range(15):
    _rng = range(_s + 1)
    for _i in (_rng if _s % 2 else reversed(_rng)):
        _r, _c = _i, _s - _i
        if _r < 8 and _c < 8:
            _ZIGZAG.append(_r * 8 + _c)

#: IDCT basis: A[x, u] = alpha(u) cos((2x+1) u pi / 16); spatial = A F A^T.
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def _idct8x8(coef: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT-II (float64), input/output in natural order."""
    return _A @ coef @ _A.T


def build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman table: (length, code) -> symbol. ``bits``
    is the 16-entry count-per-code-length list from DHT."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _Bits:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed)."""

    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated JPEG entropy data")
        byte = self.d[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_huff(bits: _Bits, lut: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bit()
        if (ln, code) in lut:
            return lut[(ln, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _decode_block(bits: _Bits, dc_lut: dict, ac_lut: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block of quantized coefficients (natural order) plus the
    updated DC predictor."""
    size = _read_huff(bits, dc_lut)
    diff = _extend(bits.read(size), size) if size else 0
    pred += diff
    coef = np.zeros(64)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _read_huff(bits, ac_lut)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows the block")
        coef[_ZIGZAG[k]] = _extend(bits.read(size), size)
        k += 1
    return coef, pred


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to its (height, width) uint8 luma plane."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (SOI+marker signature missing)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, components)
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                q = np.zeros(64)
                q[_ZIGZAG] = zz  # DQT ships zigzag order
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                (dc_tables if tc == 0 else ac_tables)[th] = build_huffman(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline/ext sequential
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG is supported "
                f"(SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS: scan header, then entropy data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            if ns != len(frame[2]):
                raise ValueError("non-interleaved multi-scan unsupported")
            scan = (scan_tables, pos + 2 + length)
            break
        # APPn / COM / others: skipped
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("missing SOF or SOS")
    scan_tables, data_start = scan

    # Split entropy data at restart markers, removing 0xFF00 stuffing.
    segments: list[bytes] = []
    cur = bytearray()
    i = data_start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    y_cid, y_h, y_v, y_tq = comps[0]
    if y_h != hmax or y_v != vmax:
        raise ValueError("luma must have the maximum sampling factors")
    if y_tq not in qtables:
        raise ValueError("luma quantization table missing")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    plane = np.zeros((mcus_y * vmax * 8, mcus_x * hmax * 8))
    preds = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    bits = _Bits(segments[0])
    per_seg = restart_interval or mcus_x * mcus_y
    for mcu in range(mcus_x * mcus_y):
        if mcu and restart_interval and mcu % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            bits = _Bits(segments[seg_idx])
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, ch, cv, ctq in comps:
            dci, aci = scan_tables[cid]
            if dci not in dc_tables or aci not in ac_tables:
                raise ValueError("scan references an undefined DHT table")
            for by in range(cv):
                for bx in range(ch):
                    coef, preds[cid] = _decode_block(
                        bits, dc_tables[dci], ac_tables[aci], preds[cid]
                    )
                    if cid != y_cid:
                        continue  # chroma: consumed, not rendered
                    block = _idct8x8(
                        coef.reshape(8, 8) * qtables[ctq]
                    )
                    y0 = (my * vmax + by) * 8
                    x0 = (mx * hmax + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = block
    out = np.clip(np.round(plane) + 128, 0, 255)[:h, :w]
    return out.astype(np.uint8)
