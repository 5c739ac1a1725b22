"""JPEG (ITU-T T.81 / ISO 10918-1) luma decoder in pure numpy —
baseline sequential (SOF0/SOF1), progressive (SOF2, 8-bit) AND
lossless (SOF3, 2-16 bit), all Huffman entropy coding: together the
variants virtually every training-corpus JPEG uses. No codec library
is needed: every stage is the public standard — marker parse,
canonical Huffman tables (DHT), zigzag dequantization (DQT), 8×8
inverse DCT (numpy einsum against the DCT-II basis), restart-marker
handling, byte-stuffing removal, for progressive frames the full
multi-scan machinery: interleaved DC first/refinement passes,
per-component spectral-selection AC bands with EOB-run coding, and
successive-approximation refinement (T.81 G.1.2), accumulated into
per-component coefficient planes and rendered once at EOI — and for
lossless frames the Annex H predictive decode (predictors 1-7, point
transform, modulo-2^16 differences, SSSS=16, restart-interval
prediction reset), exact by construction, AND hierarchical (Annex J:
DHP-led multi-frame pyramids whose differential SOF5/SOF6/SOF7 frames
fold into an EXP-expanded reference — bilinear (a+b+1)>>1 doubling —
with DC coded without prediction in differential DCT frames and no
spatial prediction in differential lossless frames).

Returns the LUMA (Y) plane: JFIF Y *is* BT.601 luma, so for feature
extraction (mean/max/phash in ``multimodal.image_features``) no chroma
upsampling or color conversion is needed — chroma blocks are still
entropy-decoded (the bitstream interleaves or sequences them) but
their pixels are discarded. Lossless frames with P>8 bits rescale to
8 via the same round(v·255/maxval) contract as the 16-bit PNG path.
Extended-sequential/progressive frames may carry 12-bit samples
(16-bit DQT elements, 2048 level shift, round(v·255/4095) output
rescale). Only arithmetic coding raises (the QM-coder's 113-row
probability state table is not reproducible from the prose spec) —
a deployment routes that through PIL, and the dispatch signature is
unchanged.

Correctness is pinned by ``tests/test_jpegcodec.py`` with test-side
INDEPENDENT encoders (forward DCT + quantizer + canonical Huffman
writer, plus a progressive scan-script writer with EOB-run and
correction-bit buffering): the decoder must reproduce the encoder's
own dequantize→IDCT reconstruction EXACTLY (the lossy codec's defining
contract, same technique as the ADPCM tests), across grayscale, 4:4:4
and 4:2:0 sampling, non-multiple-of-8 sizes, restart intervals, and
progressive scan scripts (spectral-selection-only and two-plane
successive approximation).

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


def _decode_band_first(bits: _Bits, coefzz: np.ndarray, dc_lut: dict,
                       ac_lut: dict, pred: int, ss: int, se: int, al: int,
                       eobrun: int) -> tuple[int, int]:
    """First (Ah=0) pass over the spectral band [ss, se] of one block,
    writing zigzag-ordered coefficients scaled by 2**al (T.81 F.2 and
    G.1.2.1/G.1.2.2). A sequential scan is the ss=0, se=63, al=0 special
    case: there the only EOB symbol is run=0 (an EOB run of one block),
    so the same code decodes baseline streams unchanged. Returns the
    updated (DC predictor, remaining EOB run)."""
    if eobrun > 0:
        return pred, eobrun - 1
    k = ss
    if ss == 0:
        size = _read_huff(bits, dc_lut)
        diff = _extend(bits.read(size), size) if size else 0
        pred += diff
        coefzz[0] = pred << al
        k = 1
    while k <= se:
        rs = _read_huff(bits, ac_lut)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << run) - 1  # EOBn: this block + 2**run-1 more
            if run:
                eobrun += bits.read(run)
            break
        k += run
        if k > se:
            raise ValueError("JPEG AC run overflows the block")
        coefzz[k] = _extend(bits.read(size), size) << al
        k += 1
    return pred, eobrun


def _decode_dc_refine(bits: _Bits, coefzz: np.ndarray, al: int) -> None:
    """DC successive-approximation refinement (G.1.2.1): one appended
    magnitude bit per block."""
    if bits.bit():
        coefzz[0] = int(coefzz[0]) | (1 << al)


def _decode_ac_refine(bits: _Bits, coefzz: np.ndarray, ac_lut: dict,
                      ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement over [ss, se]
    (T.81 G.1.2.3): already-nonzero coefficients receive correction
    bits; newly significant ones arrive as ±2**al after a run of
    zero-history positions; EOBn switches the rest of the block (and
    the next eobrun-1 blocks) to corrections only."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(bits, ac_lut)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run < 15:
                    # unlike the first pass, the run INCLUDES this block:
                    # its remaining coefficients still need correction
                    # bits, so consume it through the eobrun>0 path below
                    eobrun = 1 << run
                    if run:
                        eobrun += bits.read(run)
                    break
                # run == 15: skip sixteen zero-history coefficients
            else:
                if size != 1:
                    raise ValueError(
                        "invalid magnitude in JPEG refinement scan"
                    )
                val = p1 if bits.bit() else m1
            while k <= se:
                c = int(coefzz[k])
                if c:
                    if bits.bit() and (c & p1) == 0:
                        coefzz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    # mirror _decode_band_first's check: a newly-significant
                    # coefficient whose zero-history run walks past the
                    # spectral band is stream corruption, not data to drop
                    raise ValueError("JPEG AC run overflows the block")
                coefzz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(coefzz[k])
            if c and bits.bit() and (c & p1) == 0:
                coefzz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_lossless_scan(segments: list[bytes], scan_comps: list[tuple],
                          w: int, h: int, precision: int, pt: int,
                          predictor: int, planes: dict,
                          dc_tables: dict, restart_interval: int,
                          differential: bool = False) -> None:
    """One lossless (SOF3, T.81 Annex H) scan: per sample, a DC-style
    Huffman category + magnitude bits give the DIFFERENCE, added to the
    prediction mod 2^16 (H.1.2.1). Prediction rules (H.1.2.2/H.2.2):
    the first sample of the scan AND of each restart interval predicts
    the default ``2^(P-Pt-1)``; the remainder of that line uses the 1-D
    predictor Ra; the first sample of later lines uses Rb; everywhere
    else the SOS-selected predictor 1-7 runs over (Ra, Rb, Rc). SSSS=16
    is the magnitude-bit-free diff of 32768. Samples land UNSHIFTED
    (the caller applies the ``<< Pt`` of reconstruction). All sampling
    factors must be 1x1 (enforced at SOF3), so an interleaved MCU is
    one sample per component in raster order. In a DIFFERENTIAL frame
    (hierarchical SOF7) there is no spatial prediction at all — the
    decoded values ARE the frame differences (prediction 0, J.1.1.6)
    and the SOS predictor selector must be 0."""
    luts = []
    for cid, td, _ in scan_comps:
        if td not in dc_tables:
            raise ValueError("lossless JPEG scan references a missing "
                             "Huffman table")
        luts.append((cid, dc_tables[td]))
    default = 1 << (precision - pt - 1)
    n_mcus = w * h
    expect_segments = (
        -(-n_mcus // restart_interval) if restart_interval else 1
    )
    if len(segments) != expect_segments:
        raise ValueError("lossless JPEG restart segmentation mismatch")
    seg_i = 0
    bits = _Bits(segments[0])
    origin = 0  # raster index where the current restart interval began
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            bits = _Bits(segments[seg_i])
            origin = mcu
        y, x = divmod(mcu, w)
        oy = origin // w
        for cid, lut in luts:
            plane = planes[cid]
            ssss = _read_huff(bits, lut)
            if ssss == 0:
                diff = 0
            elif ssss == 16:
                diff = 32768
            elif ssss > 16:
                raise ValueError("invalid lossless JPEG difference "
                                 "category")
            else:
                diff = _extend(bits.read(ssss), ssss)
            if differential:
                pred = 0
            elif mcu == origin:
                pred = default
            elif y == oy:
                pred = int(plane[y, x - 1])  # 1-D Ra over the first line
            elif x == 0:
                pred = int(plane[y - 1, 0])
            else:
                a = int(plane[y, x - 1])
                b = int(plane[y - 1, x])
                c = int(plane[y - 1, x - 1])
                if predictor == 1:
                    pred = a
                elif predictor == 2:
                    pred = b
                elif predictor == 3:
                    pred = c
                elif predictor == 4:
                    pred = a + b - c
                elif predictor == 5:
                    pred = a + ((b - c) >> 1)
                elif predictor == 6:
                    pred = b + ((a - c) >> 1)
                elif predictor == 7:
                    pred = (a + b) >> 1
                else:
                    raise ValueError(
                        f"invalid lossless JPEG predictor {predictor}"
                    )
            plane[y, x] = (pred + diff) & 0xFFFF


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy data at restart markers, removing the
    0xFF00 byte stuffing. Returns (segments, offset of the marker that
    terminated the scan)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
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
    return segments, i


def _decode_scan(segments: list[bytes], scan_comps: list[tuple],
                 frame: tuple, store: dict, dc_tables: dict,
                 ac_tables: dict, ss: int, se: int, ah: int, al: int,
                 restart_interval: int, differential: bool = False) -> None:
    """Run one scan over the coefficient store. ``scan_comps`` is
    [(cid, dc_table_id, ac_table_id), ...] in scan order; a multi-
    component scan walks interleaved MCUs, a single-component scan walks
    that component's own (unpadded) block grid — the T.81 rule for both
    sequential and progressive frames. Restart markers reset the DC
    predictors and the EOB run. In a DIFFERENTIAL frame (hierarchical
    SOF5/SOF6) the coefficients are already frame differences, so DC
    values are coded without prediction — the predictor is pinned to 0
    for every block."""
    h, w, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    sampling = {cid: (ch, cv) for cid, ch, cv, _ in comps}
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcus_x * mcus_y
    else:
        cid0 = scan_comps[0][0]
        ch, cv = sampling[cid0]
        comp_w = -(-(w * ch) // hmax)  # ceil: component sample dims
        comp_h = -(-(h * cv) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        units = bw * bh

    def luts(cid: int, dci: int, aci: int) -> tuple[dict, dict]:
        dc_lut = dc_tables.get(dci)
        ac_lut = ac_tables.get(aci)
        if ss == 0 and ah == 0 and dc_lut is None:
            raise ValueError("scan references an undefined DHT table")
        if se > 0 and ac_lut is None:
            raise ValueError("scan references an undefined DHT table")
        return dc_lut, ac_lut

    preds = {cid: 0 for cid, *_ in scan_comps}
    eobrun = 0
    seg_idx = 0
    bits = _Bits(segments[0])
    for unit in range(units):
        if unit and restart_interval and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            bits = _Bits(segments[seg_idx])
            preds = {cid: 0 for cid, *_ in scan_comps}
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            blocks = []
            for cid, dci, aci in scan_comps:
                ch, cv = sampling[cid]
                blocks += [
                    (cid, dci, aci,
                     store[cid][my * cv + by, mx * ch + bx])
                    for by in range(cv) for bx in range(ch)
                ]
        else:
            cid, dci, aci = scan_comps[0]
            by, bx = divmod(unit, bw)
            blocks = [(cid, dci, aci, store[cid][by, bx])]
        for cid, dci, aci, coefzz in blocks:
            dc_lut, ac_lut = luts(cid, dci, aci)
            if differential:
                preds[cid] = 0
            if ah == 0:
                preds[cid], eobrun = _decode_band_first(
                    bits, coefzz, dc_lut, ac_lut, preds[cid],
                    ss, se, al, eobrun
                )
            elif ss == 0:
                _decode_dc_refine(bits, coefzz, al)
            else:
                eobrun = _decode_ac_refine(
                    bits, coefzz, ac_lut, ss, se, al, eobrun
                )


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1), progressive (SOF2), lossless
    (SOF3) or hierarchical (DHP + differential SOF5/SOF6/SOF7, T.81
    Annex J) JPEG to its (height, width) uint8 luma plane. Progressive
    streams accumulate quantized coefficients across every scan —
    interleaved DC first/refinement passes, per-component spectral-
    selection AC bands, and successive-approximation refinement — then
    dequantize + IDCT once at the end, so the result is bit-identical
    to the equivalent sequential decode of the same coefficients.
    Hierarchical streams decode the non-differential first frame, then
    fold each differential frame into the luma reference plane —
    expanded by the EXP bilinear filter when the pyramid doubles —
    with DCT differences clamped into sample range and lossless
    differences added modulo 2^16."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (SOI+marker signature missing)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, components, progressive)
    store: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) zigzag coefs
    restart_interval = 0
    saw_scan = False
    lossless = False
    precision = 8
    lossless_pt: dict = {}  # per-COMPONENT point transform (Al is per scan)
    hier = None  # (precision, Y, X) from DHP — hierarchical mode
    ref = None  # hierarchical luma reference plane (int64)
    exp_pending = None  # (eh, ev) from an EXP marker
    differential = False  # current frame is SOF5/SOF6/SOF7

    def finalize_frame() -> None:
        """Fold the just-decoded hierarchical frame into ``ref``: a
        non-differential frame becomes the reference; a differential
        DCT frame's rendered plane (no level shift) adds with clamping
        into [0, maxval] (Annex J reconstruction); a differential
        lossless frame adds modulo 2^16 (J.1.1.6)."""
        nonlocal ref, frame, saw_frame_scan
        if frame is None:
            return
        if not saw_frame_scan:
            raise ValueError("hierarchical JPEG frame has no scan")
        maxval = (1 << precision) - 1
        if lossless:
            plane = (store[frame[2][0][0]].astype(np.int64)
                     << lossless_pt.get(frame[2][0][0], 0))
            if differential:
                ref = (ref + plane) & 0xFFFF
            else:
                ref = plane
        else:
            plane = np.round(_render_dct_luma(frame, store, qtables))
            if differential:
                ref = np.clip(ref + plane.astype(np.int64), 0, maxval)
            else:
                ref = np.clip(
                    plane.astype(np.int64) + (1 << (precision - 1)),
                    0, maxval,
                )
        frame = None
        saw_frame_scan = False

    saw_frame_scan = False
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while payload[pos + 1] == 0xFF:  # T.81 B.1.1.2: optional fill
            pos += 1
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG segment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq not in (0, 1):
                    raise ValueError("invalid JPEG quantization precision")
                if pq:  # 16-bit big-endian elements (12-bit frames)
                    raw = body[i + 1 : i + 129]
                    if len(raw) != 128:
                        raise ValueError(
                            "truncated JPEG quantization table"
                        )
                    zz = np.frombuffer(raw, dtype=">u2").astype(np.int64)
                else:
                    zz = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    )
                if len(zz) != 64:
                    raise ValueError("truncated JPEG quantization table")
                q = np.zeros(64)
                q[_ZIGZAG] = zz  # DQT ships zigzag order
                qtables[tq] = q.reshape(8, 8)
                i += 129 if pq else 65
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            is_diff = marker in (0xC5, 0xC6, 0xC7)
            if is_diff and hier is None:
                raise ValueError(
                    "differential JPEG frame outside hierarchical mode"
                )
            if hier is not None:
                finalize_frame()  # fold the previous pyramid level
                if not is_diff and ref is not None:
                    raise ValueError(
                        "hierarchical JPEG supports a single "
                        "non-differential (first) frame"
                    )
            elif frame is not None:
                raise ValueError("multiple JPEG frames without DHP")
            precision = body[0]
            lossless = marker in (0xC3, 0xC7)
            differential = is_diff
            if lossless:
                if not (2 <= precision <= 16):
                    raise ValueError(
                        "lossless JPEG precision must be 2-16 bits"
                    )
            elif marker == 0xC0:
                if precision != 8:
                    raise ValueError("baseline JPEG is 8-bit only")
            elif precision not in (8, 12):
                # extended sequential / progressive (and their
                # differential twins) allow 8- or 12-bit samples
                raise ValueError(
                    "DCT JPEG precision must be 8 or 12 bits"
                )
            if hier is not None and precision != hier[0]:
                raise ValueError(
                    "hierarchical JPEG frame precision differs from DHP"
                )
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, marker in (0xC2, 0xC6))
            if hier is not None and any(
                ch != 1 or cv != 1 for _, ch, cv, _ in comps
            ):
                raise ValueError(
                    "hierarchical JPEG subsampling is not supported "
                    "(all components must be 1x1)"
                )
            if is_diff:
                if exp_pending is not None:
                    eh, ev = exp_pending
                    ref = _expand_ref(
                        ref,
                        h if ev else ref.shape[0],
                        w if eh else ref.shape[1],
                    )
                    exp_pending = None
                if (h, w) != ref.shape:
                    raise ValueError(
                        "differential JPEG frame size does not match "
                        "its reference"
                    )
            if lossless:
                if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
                    raise ValueError(
                        "lossless JPEG subsampling is not supported "
                        "(all components must be 1x1)"
                    )
                store = {
                    cid: np.zeros((h, w), dtype=np.int32)
                    for cid, *_ in comps
                }
            else:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                store = {
                    cid: np.zeros((mcus_y * cv, mcus_x * ch, 64),
                                  dtype=np.int32)
                    for cid, ch, cv, _ in comps
                }
        elif marker == 0xDE:  # DHP: hierarchical progression (Annex J)
            if hier is not None or frame is not None or saw_scan:
                raise ValueError("misplaced JPEG DHP segment")
            if len(body) < 6:
                raise ValueError("truncated JPEG DHP segment")
            hier = (
                body[0],
                int.from_bytes(body[1:3], "big"),
                int.from_bytes(body[3:5], "big"),
            )
        elif marker == 0xDF:  # EXP: expand reference before next frame
            if hier is None:
                raise ValueError("JPEG EXP marker outside hierarchical "
                                 "mode")
            finalize_frame()
            if ref is None:
                raise ValueError("JPEG EXP before any decoded frame")
            if len(body) < 1:
                raise ValueError("truncated JPEG EXP segment")
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if (eh, ev) not in ((0, 1), (1, 0), (1, 1)):
                raise ValueError("invalid JPEG EXP expansion flags")
            exp_pending = (eh, ev)
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "arithmetic-coded JPEG is not supported "
                f"(SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS: scan header, then entropy data
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            known = {cid for cid, *_ in frame[2]}
            if any(cid not in known for cid, *_ in scan_comps):
                raise ValueError("scan references an unknown component")
            segments, end = _split_entropy(payload, pos + 2 + length)
            if lossless:
                # Ss = predictor selector, Se must be 0, Al = point
                # transform Pt, Ah must be 0 (T.81 H.2.1); differential
                # frames must not select a predictor (J.1.1.6)
                if se != 0 or ah != 0:
                    raise ValueError("malformed lossless JPEG scan header")
                if differential and ss != 0:
                    raise ValueError(
                        "differential lossless JPEG scan must not "
                        "select a predictor"
                    )
                if not differential and not 1 <= ss <= 7:
                    raise ValueError(
                        f"invalid lossless JPEG predictor {ss}"
                    )
                for cid, *_ in scan_comps:
                    lossless_pt[cid] = al
                _decode_lossless_scan(
                    segments, scan_comps, frame[1], frame[0], precision,
                    al, ss, store, dc_tables, restart_interval,
                    differential=differential,
                )
            else:
                _decode_scan(segments, scan_comps, frame, store, dc_tables,
                             ac_tables, ss, se, ah, al, restart_interval,
                             differential=differential)
            saw_scan = True
            saw_frame_scan = True
            pos = end
            continue
        # APPn / COM / others: skipped
        pos += 2 + length
    if hier is not None:
        finalize_frame()
        if ref is None or not saw_scan:
            raise ValueError("missing SOF or SOS")
        if ref.shape != (hier[1], hier[2]):
            raise ValueError(
                "hierarchical JPEG did not reach the DHP-declared size"
            )
        maxval = (1 << precision) - 1
        if np.any(ref > maxval) or np.any(ref < 0):
            raise ValueError(
                "hierarchical JPEG sample exceeds its precision"
            )
        if precision == 8:
            return ref.astype(np.uint8)
        return np.round(ref * (255.0 / maxval)).astype(np.uint8)

    if frame is None or not saw_scan:
        raise ValueError("missing SOF or SOS")

    if lossless:
        # Reconstruction = decoded sample << Pt (H.1.2.3); luma is
        # component 0, rescaled from P bits to 8 with the same
        # round(v * 255 / maxval) contract as the 16-bit PNG path.
        plane = (store[frame[2][0][0]].astype(np.int64)
                 << lossless_pt.get(frame[2][0][0], 0))
        maxval = (1 << precision) - 1
        if np.any(plane > maxval):
            raise ValueError("lossless JPEG sample exceeds its precision")
        if precision == 8:
            return plane.astype(np.uint8)
        return np.round(plane * (255.0 / maxval)).astype(np.uint8)

    maxval = (1 << precision) - 1
    out = np.clip(
        np.round(_render_dct_luma(frame, store, qtables))
        + (1 << (precision - 1)),
        0, maxval,
    )
    if precision == 8:
        return out.astype(np.uint8)
    return np.round(out * (255.0 / maxval)).astype(np.uint8)


def _render_dct_luma(frame: tuple, store: dict, qtables: dict) -> np.ndarray:
    """Dequantize + IDCT the luma component to a float64 plane cropped
    to (h, w). No level shift or clamping here: non-differential callers
    add 128 and clip; hierarchical differential frames (T.81 Annex J)
    add the rendered plane to the reference instead."""
    h, w, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    y_cid, y_h, y_v, y_tq = comps[0]
    if y_h != hmax or y_v != vmax:
        raise ValueError("luma must have the maximum sampling factors")
    if y_tq not in qtables:
        raise ValueError("luma quantization table missing")
    blocks = store[y_cid]  # (bh, bw, 64) in zigzag order
    bh, bw_ = blocks.shape[:2]
    nat = np.zeros_like(blocks, dtype=np.float64)
    nat[:, :, _ZIGZAG] = blocks  # zigzag index k -> natural position
    deq = nat.reshape(bh, bw_, 8, 8) * qtables[y_tq]
    spatial = np.einsum("ij,abjk,lk->abil", _A, deq, _A)
    plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    return plane[:h, :w]


def _expand_ref(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion for the EXP marker: doubled
    samples sit on even positions, odd positions are the rounded mean of
    their neighbors ((a + b + 1) >> 1), the trailing odd sample
    replicates its left/top neighbor; a target of 2n-1 drops the last
    interpolated sample. Horizontal then vertical, integer-exact."""
    h, w = plane.shape
    if tw != w:
        if tw not in (2 * w, 2 * w - 1):
            raise ValueError("EXP target width is not 2w or 2w-1")
        out = np.empty((h, 2 * w), dtype=np.int64)
        out[:, 0::2] = plane
        out[:, 1:-1:2] = (plane[:, :-1] + plane[:, 1:] + 1) >> 1
        out[:, -1] = plane[:, -1]
        plane = out[:, :tw]
    h, w = plane.shape
    if th != h:
        if th not in (2 * h, 2 * h - 1):
            raise ValueError("EXP target height is not 2h or 2h-1")
        out = np.empty((2 * h, w), dtype=np.int64)
        out[0::2, :] = plane
        out[1:-1:2, :] = (plane[:-1, :] + plane[1:, :] + 1) >> 1
        out[-1, :] = plane[-1, :]
        plane = out[:th, :]
    return plane
