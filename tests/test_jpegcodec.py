"""Tests for the pure-numpy baseline JPEG decoder (``culvert_spark.jpegcodec``).

The proof technique is the same as the IMA-ADPCM tests
(``test_multimodal.py``): a test-side INDEPENDENT baseline ENCODER —
forward DCT, quantizer, canonical Huffman writer, byte stuffing, restart
markers — produces both the compressed payload and its own
dequantize→IDCT reconstruction.  The decoder must reproduce that
reconstruction EXACTLY (that equality is the lossy codec's defining
contract: decode(encode(x)) == encoder's own reconstruction of x, not x).

The encoder shares nothing with the decoder but the public T.81 spec:
its zigzag order is derived by diagonal sort (the decoder generates it
by diagonal walk), its DCT basis is built from the closed-form cosine
formula, its Huffman tables are canonical-coded from (bits, vals) with a
symbol→code map (the decoder builds (length,code)→symbol).
"""

from __future__ import annotations

import numpy as np
import pytest

from culvert_spark import jpegcodec as jc
from culvert_spark import multimodal as mm


# --------------------------------------------------------------------------
# Independent encoder-side primitives
# --------------------------------------------------------------------------

#: Coded-order -> block-position, by diagonal sort: diagonal s = r + c,
#: odd diagonals walk row-increasing, even diagonals row-decreasing.
_ZIG = sorted(
    range(64),
    key=lambda i: ((i // 8 + i % 8),
                   (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8)),
)

#: DCT-II basis from the closed form (same math as the decoder's, built
#: from an independently written expression).
_B = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def _fdct(block):
    """Forward 8x8 DCT-II of a centered block (float64)."""
    return _B.T @ block @ _B


def _idct(coef):
    return _B @ coef @ _B.T


def _canonical(bits, vals):
    """symbol -> (code, length) from a DHT (bits, vals) pair."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return table


# Variable-length DC table (12 symbols over lengths 2..5) and a two-length
# AC table (EOB and 0x01 at 4 bits, the other 160 symbols at 9) — chosen to
# exercise multi-length canonical decode, not to compress well.
_DC_BITS = [0, 1, 2, 3, 6] + [0] * 11
_DC_VALS = bytes(range(12))
_AC_BITS = [0, 0, 0, 2, 0, 0, 0, 0, 160] + [0] * 7
_AC_VALS = bytes([0x00, 0x01]) + bytes(
    sorted(({(r << 4) | s for r in range(16) for s in range(1, 11)}
            - {0x01}) | {0xF0})
)
_DC_ENC = _canonical(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical(_AC_BITS, _AC_VALS)

#: Quantization tables (natural order), small enough that every AC
#: magnitude stays within size<=10 for 8-bit input.
_QL = np.array([[2 + ((r + c) % 7) for c in range(8)] for r in range(8)],
               dtype=np.float64)
_QC = np.array([[3 + ((2 * r + c) % 5) for c in range(8)] for r in range(8)],
               dtype=np.float64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.write(1, 1)


def _mag(v):
    """(size, appended-bits) per T.81 magnitude coding."""
    v = int(v)
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block(bw, zz, pred, dc_enc=None, ac_enc=None):
    """Huffman-encode one quantized block (zigzag order); returns new pred."""
    dc_enc = dc_enc or _DC_ENC
    ac_enc = ac_enc or _AC_ENC
    size, bits = _mag(zz[0] - pred)
    bw.write(*dc_enc[size])
    if size:
        bw.write(bits, size)
    nz = [k for k in range(1, 64) if zz[k]]
    last = nz[-1] if nz else 0
    run, k = 0, 1
    while k <= last:
        if zz[k] == 0:
            run += 1
            k += 1
            continue
        while run >= 16:
            bw.write(*ac_enc[0xF0])
            run -= 16
        size, bits = _mag(zz[k])
        bw.write(*ac_enc[(run << 4) | size])
        bw.write(bits, size)
        run, k = 0, 1 + k
    if last < 63:
        bw.write(*ac_enc[0x00])
    return zz[0]


def _pad_edge(plane, ph, pw):
    return np.pad(plane.astype(np.float64),
                  ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                  mode="edge")


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _zz_bytes(q):
    return bytes(int(q.flat[_ZIG[k]]) for k in range(64))


def _dht_body():
    body = b""
    for tc_th, bits, vals in ((0x00, _DC_BITS, _DC_VALS),
                              (0x10, _AC_BITS, _AC_VALS),
                              (0x01, _DC_BITS, _DC_VALS),
                              (0x11, _AC_BITS, _AC_VALS)):
        body += bytes([tc_th]) + bytes(bits) + vals
    return body


def encode_jpeg(y, cb=None, cr=None, sampling=(1, 1), restart=0):
    """Baseline-JPEG encode ``y`` (uint8 HxW) with optional chroma planes;
    returns (payload, expected_luma) where expected_luma is the encoder's
    own dequantize→IDCT reconstruction cropped to the input size."""
    h, w = y.shape
    gray = cb is None
    hmax, vmax = sampling if not gray else (1, 1)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    ypad = _pad_edge(y, mcus_y * vmax * 8, mcus_x * hmax * 8)
    recon = np.zeros_like(ypad)
    if not gray:
        cpad = [_pad_edge(c, mcus_y * 8, mcus_x * 8) for c in (cb, cr)]

    # components: (cid, h, v, qtable, plane or None-for-discarded-recon)
    comps = [(1, hmax, vmax, _QL, ypad)]
    if not gray:
        comps += [(2, 1, 1, _QC, cpad[0]), (3, 1, 1, _QC, cpad[1])]

    bw = _BitWriter()
    chunks = []  # entropy segments split at restart boundaries
    preds = {cid: 0 for cid, *_ in comps}
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            bw.pad()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, ch, cv, q, plane in comps:
            for by in range(cv):
                for bx in range(ch):
                    y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                    block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                    qz = np.round(_fdct(block) / q)
                    zz = [int(qz.flat[_ZIG[k]]) for k in range(64)]
                    preds[cid] = _encode_block(bw, zz, preds[cid])
                    if cid == 1:
                        recon[y0:y0 + 8, x0:x0 + 8] = _idct(qz * q)
    bw.pad()
    chunks.append(bytes(bw.out))
    entropy = chunks[0]
    for i, c in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + c

    ncomp = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    sos = bytes([ncomp])
    for cid, ch, cv, q, _ in comps:
        tq = 0 if q is _QL else 1
        sof += bytes([cid, (ch << 4) | cv, tq])
        sos += bytes([cid, (tq << 4) | tq])  # luma->tables 0, chroma->1
    sos += bytes([0, 63, 0])

    payload = b"\xff\xd8"
    payload += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    payload += _seg(0xFE, b"test-side encoder")  # COM: exercises skip
    payload += _seg(0xDB, bytes([0x00]) + _zz_bytes(_QL)
                    + bytes([0x01]) + _zz_bytes(_QC))
    payload += _seg(0xC0, sof)
    payload += _seg(0xC4, _dht_body())
    if restart:
        payload += _seg(0xDD, restart.to_bytes(2, "big"))
    payload += _seg(0xDA, sos) + entropy + b"\xff\xd9"

    expected = np.clip(np.round(recon) + 128, 0, 255)[:h, :w].astype(np.uint8)
    return payload, expected


# --------------------------------------------------------------------------
# Progressive encoder (test-side, independent)
# --------------------------------------------------------------------------

#: AC table for progressive scans: adds the EOBn symbols (r<<4)|0 for
#: r=0..14 that sequential coding never uses.
_ACP_SYMS = sorted({(r << 4) | s for r in range(16) for s in range(11)}
                   - {0x00, 0x01})
_ACP_BITS = [0, 0, 0, 2, 0, 0, 0, 0, len(_ACP_SYMS)] + [0] * 7
_ACP_VALS = bytes([0x00, 0x01]) + bytes(_ACP_SYMS)
_ACP_ENC = _canonical(_ACP_BITS, _ACP_VALS)


def _coef_planes(y, cb, cr, sampling):
    """Quantized zigzag coefficient planes per component plus the
    expected luma reconstruction (dequantize+IDCT of the full-precision
    coefficients — what any complete scan script must converge to)."""
    h, w = y.shape
    gray = cb is None
    hmax, vmax = sampling if not gray else (1, 1)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comps = []
    recon = None
    specs = [(1, hmax, vmax, _QL, y)]
    if not gray:
        specs += [(2, 1, 1, _QC, cb), (3, 1, 1, _QC, cr)]
    for cid, ch, cv, q, plane in specs:
        bh, bw = mcus_y * cv, mcus_x * ch
        padded = _pad_edge(plane, bh * 8, bw * 8)
        coef = np.zeros((bh, bw, 64), dtype=np.int64)
        rec = np.zeros_like(padded)
        for by in range(bh):
            for bx in range(bw):
                block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                qz = np.round(_fdct(block) / q)
                coef[by, bx] = [int(qz.flat[_ZIG[k]]) for k in range(64)]
                rec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _idct(qz * q)
        comps.append((cid, ch, cv, q, coef))
        if cid == 1:
            recon = np.clip(np.round(rec) + 128, 0, 255)[:h, :w]
    return comps, recon.astype(np.uint8), mcus_x, mcus_y


class _ProgScan:
    """Entropy writer for one progressive scan: owns the bit writer,
    the EOB-run accumulator with its buffered correction bits, and the
    restart segmentation."""

    def __init__(self, ac_enc=None):
        self.bw = _BitWriter()
        self.chunks = []
        self.eobrun = 0
        self.pending = []
        self.ac_enc = ac_enc

    def flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.bw.write(*self.ac_enc[r << 4])
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def restart(self):
        self.flush_eob()
        self.bw.pad()
        self.chunks.append(bytes(self.bw.out))
        self.bw = _BitWriter()

    def finish(self):
        self.flush_eob()
        self.bw.pad()
        self.chunks.append(bytes(self.bw.out))
        entropy = self.chunks[0]
        for i, c in enumerate(self.chunks[1:]):
            entropy += bytes([0xFF, 0xD0 + (i % 8)]) + c
        return entropy


def encode_jpeg_progressive(y, cb=None, cr=None, sampling=(1, 1),
                            restart=0, dc_al=1,
                            ac_bands=((1, 5), (6, 63)), ac_al=1):
    """Progressive-JPEG encode: an interleaved DC first scan at Al=dc_al
    with refinement scans down to bit 0, then per-component AC first
    scans over each spectral band at Al=ac_al with refinement scans down
    to bit 0 (the canonical scan script shape). Returns
    (payload, expected_luma) where expected_luma is the encoder's own
    full-precision dequantize→IDCT reconstruction — the decoder must
    accumulate every scan to reproduce it exactly."""
    h, w = y.shape
    comps, expected, mcus_x, mcus_y = _coef_planes(y, cb, cr, sampling)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    def interleaved_units(sel):
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for cid, ch, cv, _, coef in sel:
                    unit += [(cid, coef[my * cv + by, mx * ch + bx])
                             for by in range(cv) for bx in range(ch)]
                units.append(unit)
        return units

    def single_units(cid):
        (cid, ch, cv, _, coef), = [c for c in comps if c[0] == cid]
        bw_ = -(-(-(-w * ch // hmax)) // 8)
        bh_ = -(-(-(-h * cv // vmax)) // 8)
        return [[(cid, coef[by, bx])]
                for by in range(bh_) for bx in range(bw_)]

    scans = []  # (scan_cids, ss, se, ah, al, entropy)

    # --- DC first scan (interleaved when color), Ah=0, Al=dc_al
    all_cids = [c[0] for c in comps]
    units = (interleaved_units(comps) if len(comps) > 1
             else single_units(all_cids[0]))
    sc = _ProgScan()
    preds = {cid: 0 for cid in all_cids}
    for i, unit in enumerate(units):
        if restart and i and i % restart == 0:
            sc.restart()
            preds = {cid: 0 for cid in all_cids}
        for cid, zz in unit:
            v = int(zz[0]) >> dc_al  # point transform: arithmetic shift
            size, bits = _mag(v - preds[cid])
            sc.bw.write(*_DC_ENC[size])
            if size:
                sc.bw.write(bits, size)
            preds[cid] = v
    scans.append((all_cids, 0, 0, 0, dc_al, sc.finish()))

    # --- DC refinement scans: one magnitude bit per block per plane
    for a in range(dc_al - 1, -1, -1):
        sc = _ProgScan()
        for i, unit in enumerate(units):
            if restart and i and i % restart == 0:
                sc.restart()
            for cid, zz in unit:
                sc.bw.write((int(zz[0]) >> a) & 1, 1)
        scans.append((all_cids, 0, 0, a + 1, a, sc.finish()))

    # --- AC scans: per component, per band; first pass then refinements
    for cid in all_cids:
        cunits = single_units(cid)
        for ss, se in ac_bands:
            sc = _ProgScan(_ACP_ENC)
            for i, unit in enumerate(cunits):
                if restart and i and i % restart == 0:
                    sc.restart()
                (_, zz), = unit
                t = [0] * 64
                for k in range(ss, se + 1):
                    c = int(zz[k])
                    t[k] = -((-c) >> ac_al) if c < 0 else c >> ac_al
                last = max((k for k in range(ss, se + 1) if t[k]),
                           default=0)
                if last == 0:  # nothing in band: extend the EOB run
                    sc.eobrun += 1
                    if sc.eobrun == 0x7FFF:
                        sc.flush_eob()
                    continue
                sc.flush_eob()
                run = 0
                for k in range(ss, last + 1):
                    if t[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        sc.bw.write(*_ACP_ENC[0xF0])
                        run -= 16
                    size, bits = _mag(t[k])
                    sc.bw.write(*_ACP_ENC[(run << 4) | size])
                    sc.bw.write(bits, size)
                    run = 0
                if last < se:
                    sc.eobrun += 1
            scans.append(([cid], ss, se, 0, ac_al, sc.finish()))
        for a in range(ac_al - 1, -1, -1):
            for ss, se in ac_bands:
                sc = _ProgScan(_ACP_ENC)
                for i, unit in enumerate(cunits):
                    if restart and i and i % restart == 0:
                        sc.restart()
                    (_, zz), = unit
                    absv = [abs(int(zz[k])) >> a for k in range(64)]
                    eob = max((k for k in range(ss, se + 1)
                               if absv[k] == 1), default=0)
                    run = 0
                    br: list[int] = []
                    for k in range(ss, se + 1):
                        if absv[k] == 0:
                            run += 1
                            continue
                        while run > 15 and k <= eob:
                            sc.flush_eob()
                            sc.bw.write(*_ACP_ENC[0xF0])
                            for b in br:
                                sc.bw.write(b, 1)
                            br = []
                            run -= 16
                        if absv[k] > 1:  # already significant: correction
                            br.append(absv[k] & 1)
                            continue
                        sc.flush_eob()
                        sc.bw.write(*_ACP_ENC[(run << 4) | 1])
                        sc.bw.write(1 if int(zz[k]) >= 0 else 0, 1)
                        for b in br:
                            sc.bw.write(b, 1)
                        br = []
                        run = 0
                    if run > 0 or br:
                        sc.eobrun += 1
                        sc.pending += br
                        if sc.eobrun == 0x7FFF:
                            sc.flush_eob()
                scans.append(([cid], ss, se, a + 1, a, sc.finish()))

    # --- container
    tq_of = {cid: (0 if q is _QL else 1) for cid, _, _, q, _ in comps}
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comps)])
    for cid, ch, cv, q, _ in comps:
        sof += bytes([cid, (ch << 4) | cv, tq_of[cid]])
    payload = b"\xff\xd8"
    payload += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    payload += _seg(0xDB, bytes([0x00]) + _zz_bytes(_QL)
                    + bytes([0x01]) + _zz_bytes(_QC))
    payload += _seg(0xC2, sof)
    dht = b""
    for tc_th, bits, vals in ((0x00, _DC_BITS, _DC_VALS),
                              (0x10, _ACP_BITS, _ACP_VALS),
                              (0x01, _DC_BITS, _DC_VALS),
                              (0x11, _ACP_BITS, _ACP_VALS)):
        dht += bytes([tc_th]) + bytes(bits) + vals
    payload += _seg(0xC4, dht)
    if restart:
        payload += _seg(0xDD, restart.to_bytes(2, "big"))
    for scan_cids, ss, se, ah, al, entropy in scans:
        sos = bytes([len(scan_cids)])
        for cid in scan_cids:
            t = tq_of[cid]
            sos += bytes([cid, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        payload += _seg(0xDA, sos) + entropy
    payload += b"\xff\xd9"
    return payload, expected


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------

def test_progressive_jpeg_grayscale_exact():
    """Progressive grayscale (DC successive approximation + two AC bands
    with refinement): the decoder must accumulate every scan and land on
    the same reconstruction as the sequential encoding of the same
    quantized coefficients — bit for bit."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(21, 18), dtype=np.uint8)
    payload, expected = encode_jpeg_progressive(img)
    got = jc.decode_jpeg_luma(payload)
    assert got.shape == (21, 18)
    assert (got == expected).all()
    seq_payload, seq_expected = encode_jpeg(img)
    assert (expected == seq_expected).all()  # same quantizer, same target
    assert (got == jc.decode_jpeg_luma(seq_payload)).all()


def test_progressive_jpeg_spectral_selection_only():
    """Al=0 everywhere: pure spectral selection, no refinement scans —
    the EOBRUN/band bookkeeping alone must reassemble the blocks."""
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    payload, expected = encode_jpeg_progressive(
        img, dc_al=0, ac_al=0, ac_bands=((1, 9), (10, 35), (36, 63)))
    assert (jc.decode_jpeg_luma(payload) == expected).all()


def test_progressive_jpeg_color_420_exact():
    """Progressive 4:2:0 color: interleaved DC scans across all three
    components, per-component AC bands over the unpadded block grids
    (luma's grid is larger than its MCU padding at these dims)."""
    rng = np.random.default_rng(23)
    y = rng.integers(0, 256, size=(24, 28), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(12, 14), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(12, 14), dtype=np.uint8)
    payload, expected = encode_jpeg_progressive(y, cb, cr, sampling=(2, 2))
    got = jc.decode_jpeg_luma(payload)
    assert got.shape == (24, 28)
    assert (got == expected).all()


def test_progressive_jpeg_restarts_deep_bands():
    """Restart markers inside progressive scans (resetting DC predictors
    and the EOB run), three AC bands, and two successive-approximation
    planes for both DC and AC."""
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(26, 19), dtype=np.uint8)
    payload, expected = encode_jpeg_progressive(
        img, restart=3, dc_al=2, ac_al=2,
        ac_bands=((1, 2), (3, 20), (21, 63)))
    assert (jc.decode_jpeg_luma(payload) == expected).all()


def test_progressive_relabelled_sequential_decodes():
    """A sequential stream relabelled SOF2 is the degenerate one-scan
    script (full band, no approximation) and must decode identically."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(10, 12), dtype=np.uint8)
    payload, expected = encode_jpeg(img)
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert (jc.decode_jpeg_luma(prog) == expected).all()


def test_jpeg_grayscale_exact_reconstruction():
    """Random grayscale, non-multiple-of-8 dims: decode must equal the
    encoder's own reconstruction bit-for-bit, and track the source."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(17, 26), dtype=np.uint8)
    payload, expected = encode_jpeg(img)
    got = jc.decode_jpeg_luma(payload)
    assert got.shape == (17, 26)
    assert got.dtype == np.uint8
    assert (got == expected).all()
    # lossy but must track the original (quant tables are mild)
    assert float(np.abs(got.astype(int) - img.astype(int)).mean()) < 16


def test_jpeg_444_and_422_and_420_luma():
    """Color images at 4:4:4, 4:2:2 and 4:2:0: chroma blocks interleave in
    the bitstream and must be entropy-consumed for the luma to land, even
    though only luma is rendered."""
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, size=(21, 19), dtype=np.uint8)
    for sampling in ((1, 1), (2, 1), (2, 2)):
        ch = -(-y.shape[0] // sampling[1]), -(-y.shape[1] // sampling[0])
        cb = rng.integers(0, 256, size=ch, dtype=np.uint8)
        cr = rng.integers(0, 256, size=ch, dtype=np.uint8)
        payload, expected = encode_jpeg(y, cb, cr, sampling=sampling)
        got = jc.decode_jpeg_luma(payload)
        assert got.shape == y.shape, sampling
        assert (got == expected).all(), sampling


def test_jpeg_restart_markers():
    """DRI/RSTn: DC predictors reset per restart interval; a missing
    restart segment is detected."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 15 MCUs
    payload, expected = encode_jpeg(img, restart=2)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    got = jc.decode_jpeg_luma(payload)
    assert (got == expected).all()

    # Amputate the entropy tail from the last restart marker on: the
    # decoder must notice the missing segment, not return garbage.
    cut = payload.rfind(b"\xff\xd0")
    for m in range(1, 8):
        cut = max(cut, payload.rfind(bytes([0xFF, 0xD0 + m])))
    with pytest.raises(ValueError,
                       match="restart segment|truncated JPEG entropy"):
        jc.decode_jpeg_luma(payload[:cut] + b"\xff\xd9")


def test_jpeg_zrl_long_zero_runs():
    """Force AC runs longer than 15 so the encoder emits ZRL symbols and
    the decoder's sixteen-zero fast path executes: the block is built as
    the IDCT of a sparse high-frequency coefficient pattern, so after
    forward DCT + quantization only late-zigzag coefficients survive."""
    coef = np.zeros((8, 8))
    # zigzag positions ~40 and ~60: runs of >=16 zeros before each
    coef[jc._ZIGZAG[40] // 8, jc._ZIGZAG[40] % 8] = 12 * _QL.flat[0]
    coef[jc._ZIGZAG[61] // 8, jc._ZIGZAG[61] % 8] = 9 * _QL.flat[0]
    block = np.clip(np.round(_idct(coef)) + 128, 0, 255).astype(np.uint8)
    img = np.tile(block, (2, 3))
    payload, expected = encode_jpeg(img)
    # the ZRL symbol (0xF0 at its 9-bit canonical code) must actually be
    # in the stream: re-encode and count emitted ZRLs via the encoder
    bw = _BitWriter()
    qz = np.round(_fdct(block.astype(np.float64) - 128.0) / _QL)
    zz = [int(qz.flat[_ZIG[k]]) for k in range(64)]
    _encode_block(bw, zz, 0)
    runs = [k for k in range(1, 64) if zz[k]]
    assert runs and min(runs) > 16  # guarantees at least one ZRL per block
    got = jc.decode_jpeg_luma(payload)
    assert (got == expected).all()


def test_jpeg_restart_with_chroma_interleave():
    """Restart intervals AND 4:2:0 interleaved chroma together: per-MCU
    entropy segments contain 6 blocks (4Y+Cb+Cr) and every component's
    DC predictor resets at each RSTn."""
    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, size=(18, 33), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(9, 17), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(9, 17), dtype=np.uint8)
    payload, expected = encode_jpeg(y, cb, cr, sampling=(2, 2), restart=3)
    got = jc.decode_jpeg_luma(payload)
    assert (got == expected).all()


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code; decoding must skip them both between segments and at
    the end of entropy data."""
    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    payload, expected = encode_jpeg(img)
    i = payload.index(b"\xff\xdb")
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert padded[-2:] == b"\xff\xd9"
    padded = padded[:-2] + b"\xff" + padded[-2:]
    assert (jc.decode_jpeg_luma(padded) == expected).all()


def test_jpeg_rejects_unsupported_variants():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload, _ = encode_jpeg(img)

    # a differential frame (SOF5) without a preceding DHP is malformed
    # (SOF2/SOF3/DHP-led hierarchical streams all decode for real now)
    hier = payload.replace(b"\xff\xc0", b"\xff\xc5", 1)
    with pytest.raises(ValueError, match="outside hierarchical"):
        jc.decode_jpeg_luma(hier)

    # arithmetic coding (SOF9) stays out of scope (QM-coder tables)
    arith = payload.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="arithmetic-coded"):
        jc.decode_jpeg_luma(arith)

    # a DCT-shaped stream relabelled SOF3 trips the lossless scan-header
    # validation (Se=63 is not a predictor-scan shape)
    lossless = payload.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="malformed lossless"):
        jc.decode_jpeg_luma(lossless)

    # a Pq=1 (16-bit) relabel of an 8-bit DQT leaves the segment short
    # (16-bit tables need 128 element bytes; Pq=2+ is invalid outright)
    i = payload.index(b"\xff\xdb") + 4
    deep = bytearray(payload)
    deep[i] = 0x10 | (deep[i] & 0x0F)
    with pytest.raises(ValueError, match="truncated JPEG quantization"):
        jc.decode_jpeg_luma(bytes(deep))
    deep[i] = 0x20 | (deep[i] & 0x0F)
    with pytest.raises(ValueError, match="invalid JPEG quantization"):
        jc.decode_jpeg_luma(bytes(deep))

    # truncated entropy data
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        jc.decode_jpeg_luma(payload[:-12])

    # not a JPEG at all
    with pytest.raises(ValueError, match="not a JPEG"):
        jc.decode_jpeg_luma(b"\xff\xd8\x00" + payload[3:])

    # scan before frame: strip the SOF segment entirely
    s = payload.index(b"\xff\xc0")
    ln = int.from_bytes(payload[s + 2:s + 4], "big")
    with pytest.raises(ValueError, match="SOS before SOF"):
        jc.decode_jpeg_luma(payload[:s] + payload[s + 2 + ln:])


def test_real_jpeg_through_pipeline(spark):
    """REAL compressed JPEG bytes through the Spark feature operators:
    the 3-byte SOI+marker signature dispatches to the codec, header
    dimensions win over metadata, features match the encoder's own
    reconstruction — same shape as the PNG/PPM pipeline tests."""
    rng = np.random.default_rng(29)
    y = rng.integers(0, 256, size=(14, 11), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(7, 6), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(7, 6), dtype=np.uint8)
    payload, expected = encode_jpeg(y, cb, cr, sampling=(2, 2))
    assert payload[:3] == b"\xff\xd8\xff"
    df = spark.createDataFrame(
        [(7, "image", bytearray(payload), (99, 99, 16000, 4))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.image_features(df).collect()[0]
    assert (r.width, r.height) == (11, 14)  # from the SOF header, not meta
    assert r.mean_luma == pytest.approx(float(expected.mean()))
    assert r.max_luma == int(expected.max())


def test_zigzag_tables_agree():
    """The encoder's sort-derived zigzag equals the decoder's walk-derived
    one — two independent constructions of the T.81 Figure A.6 order."""
    assert _ZIG == jc._ZIGZAG
    assert sorted(jc._ZIGZAG) == list(range(64))


def test_huffman_tables_roundtrip():
    """Decoder's (length,code)->symbol LUT inverts the encoder's canonical
    symbol->(code,length) map for both shipped table shapes."""
    for bits, vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
        dec = jc.build_huffman(bits, bytes(vals))
        enc = _canonical(bits, vals)
        assert len(dec) == len(enc) == len(vals)
        for sym, (code, ln) in enc.items():
            assert dec[(ln, code)] == sym


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H) — independent test-side encoder
# ---------------------------------------------------------------------------

_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11  # categories 0..16, all 5 bits
_LL_VALS = bytes(range(17))
_LL_ENC = _canonical(_LL_BITS, _LL_VALS)


def encode_jpeg_lossless(planes, precision=8, predictor=1, pt=0, restart=0):
    """Independent lossless (SOF3) encoder: ``planes`` is a list of HxW
    integer arrays of already point-transformed samples
    (< 2^(precision-pt) each). Implements T.81 Annex H prediction (scan
    and restart-interval starts predict 2^(P-Pt-1), the rest of that
    line uses Ra, later line starts use Rb, elsewhere the selected
    predictor) and the modulo-2^16 difference coding, with SSSS=16 for
    the bit-free 32768 difference."""
    h, w = planes[0].shape
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS)
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)
    default = 1 << (precision - pt - 1)
    bw = _BitWriter()
    rst = 0
    origin = 0
    for mcu in range(h * w):
        if restart and mcu and mcu % restart == 0:
            bw.pad()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            origin = mcu
        y, x = divmod(mcu, w)
        oy = origin // w
        for p in planes:
            if mcu == origin:
                pred = default
            elif y == oy:
                pred = int(p[y, x - 1])
            elif x == 0:
                pred = int(p[y - 1, 0])
            else:
                a = int(p[y, x - 1])
                b = int(p[y - 1, x])
                c = int(p[y - 1, x - 1])
                pred = {1: a, 2: b, 3: c, 4: a + b - c,
                        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1),
                        7: (a + b) >> 1}[predictor]
            d = ((int(p[y, x]) - pred + 0x8000) & 0xFFFF) - 0x8000
            if d == -0x8000:
                bw.write(*_LL_ENC[16])  # 32768 needs no magnitude bits
            else:
                size, bits = _mag(d)
                bw.write(*_LL_ENC[size])
                if size:
                    bw.write(bits, size)
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_lossless_jpeg_8bit_exact(predictor):
    rng = np.random.default_rng(40 + predictor)
    img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    payload = encode_jpeg_lossless([img.astype(int)], predictor=predictor)
    got = jc.decode_jpeg_luma(payload)
    assert got.dtype == np.uint8
    assert (got == img).all()


@pytest.mark.parametrize("precision", [12, 16])
def test_lossless_jpeg_deep_precision_rescale(precision):
    """P>8 samples come back through the round(v*255/maxval) rescale;
    an all-zero first sample forces the SSSS=16 (diff 32768 == -32768
    mod 2^16) bit-free path against the 2^(P-1) default prediction."""
    rng = np.random.default_rng(precision)
    maxval = (1 << precision) - 1
    img = rng.integers(0, maxval + 1, size=(9, 11)).astype(int)
    img[0, 0] = 0  # default pred is 2^(P-1): diff == -2^15 when P=16
    payload = encode_jpeg_lossless([img], precision=precision)
    got = jc.decode_jpeg_luma(payload)
    expected = np.round(img * (255.0 / maxval)).astype(np.uint8)
    assert (got == expected).all()


def test_lossless_jpeg_point_transform():
    """Pt=1: the encoder ships v>>1, the decoder reconstructs (v>>1)<<1."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 10), dtype=np.uint8)
    shifted = (img >> 1).astype(int)
    payload = encode_jpeg_lossless([shifted], pt=1)
    got = jc.decode_jpeg_luma(payload)
    assert (got == (shifted << 1).astype(np.uint8)).all()


@pytest.mark.parametrize("restart", [1, 7, 16])
def test_lossless_jpeg_restart_intervals(restart):
    """Restart intervals (incl. a non-divisor of the MCU count) reset
    the prediction to the interval-start rules on both sides."""
    rng = np.random.default_rng(restart)
    img = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    payload = encode_jpeg_lossless(
        [img.astype(int)], predictor=4, restart=restart
    )
    got = jc.decode_jpeg_luma(payload)
    assert (got == img).all()


def test_lossless_jpeg_multicomponent_interleaved():
    """Three 1x1 components interleave one sample each per MCU; luma is
    component 0."""
    rng = np.random.default_rng(99)
    planes = [rng.integers(0, 256, size=(7, 5)).astype(int)
              for _ in range(3)]
    payload = encode_jpeg_lossless(planes, predictor=6)
    got = jc.decode_jpeg_luma(payload)
    assert (got == planes[0].astype(np.uint8)).all()


def test_lossless_jpeg_malformed():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 6)).astype(int)
    payload = encode_jpeg_lossless([img], predictor=2)
    # Se != 0 in a lossless scan header
    i = payload.index(b"\xff\xda")
    ln = int.from_bytes(payload[i + 2 : i + 4], "big")
    bad = bytearray(payload)
    bad[i + 2 + ln - 2] = 9  # Se byte
    with pytest.raises(ValueError, match="malformed lossless"):
        jc.decode_jpeg_luma(bytes(bad))
    # predictor 0 (no prediction selected) is invalid in a first-order
    # lossless scan
    bad = bytearray(payload)
    bad[i + 2 + ln - 3] = 0  # Ss/predictor byte
    with pytest.raises(ValueError, match="invalid lossless JPEG predictor"):
        jc.decode_jpeg_luma(bytes(bad))
    # subsampled lossless components are rejected at SOF3
    s = payload.index(b"\xff\xc3")
    bad = bytearray(payload)
    bad[s + 2 + 9] = 0x22  # HiVi of component 1
    with pytest.raises(ValueError, match="1x1"):
        jc.decode_jpeg_luma(bytes(bad))


# ---------------------------------------------------------------------------
# Hierarchical JPEG (DHP + differential frames, T.81 Annex J) —
# independent test-side encoder
# ---------------------------------------------------------------------------


def _expand_test(plane, th, tw):
    """Independent J.1.1.2 bilinear expansion (doubled samples even,
    odd = (a+b+1)>>1, trailing sample replicated, 2n-1 drops the last)."""
    plane = plane.astype(np.int64)
    h, w = plane.shape
    if tw != w:
        assert tw in (2 * w, 2 * w - 1)
        out = np.empty((h, 2 * w), dtype=np.int64)
        out[:, 0::2] = plane
        out[:, 1:-1:2] = (plane[:, :-1] + plane[:, 1:] + 1) >> 1
        out[:, -1] = plane[:, -1]
        plane = out[:, :tw]
    h, w = plane.shape
    if th != h:
        assert th in (2 * h, 2 * h - 1)
        out = np.empty((2 * h, w), dtype=np.int64)
        out[0::2, :] = plane
        out[1:-1:2, :] = (plane[:-1, :] + plane[1:, :] + 1) >> 1
        out[-1, :] = plane[-1, :]
        plane = out[:th, :]
    return plane


def _ll_raw_bits(diffs):
    """Category-code raw signed differences (prediction 0 — the
    differential-lossless scan shape)."""
    bw = _BitWriter()
    for d in np.asarray(diffs).reshape(-1):
        d = int(d)
        if d == -0x8000:
            bw.write(*_LL_ENC[16])
        else:
            size, bits = _mag(d)
            bw.write(*_LL_ENC[size])
            if size:
                bw.write(bits, size)
    bw.pad()
    return bytes(bw.out)


def _ll_pred_diffs(p, precision=8, predictor=1, pt=0):
    """Annex H prediction differences of a plane, raster order."""
    h, w = p.shape
    default = 1 << (precision - pt - 1)
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            if (y, x) == (0, 0):
                pred = default
            elif y == 0:
                pred = int(p[y, x - 1])
            elif x == 0:
                pred = int(p[y - 1, 0])
            else:
                a, b, c = int(p[y, x - 1]), int(p[y - 1, x]), \
                    int(p[y - 1, x - 1])
                pred = {1: a, 2: b, 3: c, 4: a + b - c,
                        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1),
                        7: (a + b) >> 1}[predictor]
            out[y, x] = ((int(p[y, x]) - pred + 0x8000) & 0xFFFF) - 0x8000
    return out


def _sof_seg(marker, h, w, precision=8):
    return _seg(marker, bytes([precision]) + h.to_bytes(2, "big")
                + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))


def encode_jpeg_hier_lossless(img, levels=2, predictor=1):
    """Hierarchical lossless pyramid: SOF3 base at 1/2^levels resolution,
    then per level EXP (both axes) + a SOF7 differential frame whose raw
    differences restore the next pyramid image exactly (mod 2^16)."""
    img = img.astype(np.int64)
    H, W = img.shape
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr[-1][::2, ::2])
    base = pyr[-1]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, bytes([8]) + H.to_bytes(2, "big")
                + W.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS)
    out += _sof_seg(0xC3, *base.shape)
    out += _seg(0xDA, bytes([1, 1, 0x00, predictor, 0, 0]))
    out += _ll_raw_bits(_ll_pred_diffs(base, predictor=predictor))
    ref = base
    for lvl in range(levels - 1, -1, -1):
        tgt = pyr[lvl]
        th, tw = tgt.shape
        out += _seg(0xDF, bytes([0x11]))
        ref = _expand_test(ref, th, tw)
        diff = ((tgt - ref + 0x8000) & 0xFFFF) - 0x8000
        out += _sof_seg(0xC7, th, tw)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
        out += _ll_raw_bits(diff)
        ref = (ref + diff) & 0xFFFF
    out += b"\xff\xd9"
    return bytes(out), ref


def _dct_frame_bits(plane, differential):
    """Entropy bits + raw IDCT reconstruction (pre-round, pre-shift) of
    one single-component sequential DCT frame."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = _pad_edge(plane, ph, pw)
    bw = _BitWriter()
    recon = np.zeros((ph, pw))
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            if not differential:
                block = block - 128.0
            q = np.round(_fdct(block) / _QL)
            zz = [int(q.flat[_ZIG[k]]) for k in range(64)]
            if differential:
                pred = 0
            pred = _encode_block(bw, zz, pred)
            nat = np.zeros(64)
            for k in range(64):
                nat[_ZIG[k]] = zz[k]
            recon[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = _idct(
                nat.reshape(8, 8) * _QL
            )
    bw.pad()
    return bytes(bw.out), recon[:h, :w]


def encode_jpeg_hier_dct(img, levels=1):
    """Hierarchical DCT pyramid: SOF0 base, then per level EXP + SOF5
    differential frames of the (lossy) residual. Returns the stream and
    the encoder's own reconstruction (the decoder must match exactly)."""
    img = img.astype(np.int64)
    H, W = img.shape
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr[-1][::2, ::2])
    base = pyr[-1]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, bytes([8]) + H.to_bytes(2, "big")
                + W.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _seg(0xDB, bytes([0x00]) + _zz_bytes(_QL))
    out += _seg(0xC4, _dht_body())
    out += _sof_seg(0xC0, *base.shape)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits, recon = _dct_frame_bits(base.astype(np.float64), False)
    out += bits
    ref = np.clip(np.round(recon) + 128, 0, 255).astype(np.int64)
    for lvl in range(levels - 1, -1, -1):
        tgt = pyr[lvl]
        th, tw = tgt.shape
        out += _seg(0xDF, bytes([0x11]))
        ref = _expand_test(ref, th, tw)
        out += _sof_seg(0xC5, th, tw)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bits, recon = _dct_frame_bits((tgt - ref).astype(np.float64), True)
        out += bits
        ref = np.clip(ref + np.round(recon).astype(np.int64), 0, 255)
    out += b"\xff\xd9"
    return bytes(out), ref


@pytest.mark.parametrize("predictor,levels,dims",
                         [(1, 2, (21, 13)), (4, 1, (16, 16)),
                          (7, 2, (15, 22))])
def test_hierarchical_lossless_pyramid_exact(predictor, levels, dims):
    """A lossless pyramid restores the original exactly: odd dimensions
    exercise the 2n-1 EXP target, every level folds mod 2^16."""
    rng = np.random.default_rng(predictor * 100 + dims[0])
    img = rng.integers(0, 256, size=dims, dtype=np.uint8)
    payload, expected = encode_jpeg_hier_lossless(
        img, levels=levels, predictor=predictor
    )
    assert (expected == img).all()  # encoder invariant first
    got = jc.decode_jpeg_luma(payload)
    assert (got == img).all()


@pytest.mark.parametrize("levels,dims", [(1, (24, 17)), (2, (21, 30))])
def test_hierarchical_dct_pyramid_matches_encoder(levels, dims):
    """DCT pyramid: the decoder reproduces the encoder's own
    reconstruction bit-exactly (differential frames carry no level
    shift and DC is coded without prediction)."""
    rng = np.random.default_rng(dims[1])
    img = rng.integers(0, 256, size=dims, dtype=np.uint8)
    payload, expected = encode_jpeg_hier_dct(img, levels=levels)
    got = jc.decode_jpeg_luma(payload)
    assert (got == expected.astype(np.uint8)).all()


def test_hierarchical_differential_progressive_relabel():
    """A SOF5 differential-sequential frame relabelled SOF6 decodes
    identically (differential progressive shares the scan machinery)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload, expected = encode_jpeg_hier_dct(img, levels=1)
    relabel = payload.replace(b"\xff\xc5", b"\xff\xc6", 1)
    assert relabel != payload
    got = jc.decode_jpeg_luma(relabel)
    assert (got == expected.astype(np.uint8)).all()


def test_hierarchical_malformed():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(12, 12), dtype=np.uint8)
    payload, _ = encode_jpeg_hier_lossless(img, levels=1)
    # EXP without a preceding DHP
    i = payload.index(b"\xff\xdf")
    with pytest.raises(ValueError, match="outside hierarchical"):
        jc.decode_jpeg_luma(b"\xff\xd8" + payload[i:])
    # differential frame whose size cannot come from a x2 expansion:
    # shrink the SOF7 width field by two (2w-1 would still be legal)
    s = payload.index(b"\xff\xc7")
    bad = bytearray(payload)
    bad[s + 8] -= 2
    with pytest.raises(ValueError, match="not 2w or 2w-1"):
        jc.decode_jpeg_luma(bytes(bad))
    # ...while 2w-1 expands legally but then misses the DHP-declared
    # full-resolution size
    bad = bytearray(payload)
    bad[s + 8] -= 1
    with pytest.raises(ValueError, match="DHP-declared size"):
        jc.decode_jpeg_luma(bytes(bad))
    # a predictor in a differential lossless scan is malformed
    d = payload.index(b"\xff\xda", s)
    bad = bytearray(payload)
    bad[d + 7] = 1  # Ss byte of the SOF7 scan (FF DA len2 ns cs tt Ss)
    with pytest.raises(ValueError, match="must not select a predictor"):
        jc.decode_jpeg_luma(bytes(bad))


# ---------------------------------------------------------------------------
# 12-bit extended-sequential / progressive DCT (T.81 sample precision 12)
# ---------------------------------------------------------------------------

# 12-bit tables: DC categories 0..15 at 5 bits, AC symbols (EOB, ZRL and
# every run/size with size 1..14) all at 9 bits — 226 codes, Kraft-legal.
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = bytes(range(16))
_AC12_SYMS = sorted({0x00, 0xF0} | {(r << 4) | s
                                    for r in range(16)
                                    for s in range(1, 15)})
_AC12_BITS = [0] * 8 + [len(_AC12_SYMS)] + [0] * 7
_AC12_VALS = bytes(_AC12_SYMS)
_DC12_ENC = _canonical(_DC12_BITS, _DC12_VALS)
_AC12_ENC = _canonical(_AC12_BITS, _AC12_VALS)

#: 16-bit-element quantization table sized so 12-bit AC magnitudes stay
#: within size<=14
_Q12 = np.array([[16 + 7 * ((r + c) % 5) for c in range(8)]
                 for r in range(8)], dtype=np.float64)


def encode_jpeg12(y):
    """12-bit grayscale extended-sequential (SOF1) encoder: Pq=1 DQT
    (16-bit big-endian elements), 2048 level shift, dedicated 12-bit
    Huffman tables. Returns (payload, expected uint8 luma) where
    expected applies the decoder's documented clamp + round(v*255/4095)
    rescale to the encoder's own reconstruction."""
    h, w = y.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = _pad_edge(y, ph, pw)
    bw = _BitWriter()
    recon = np.zeros((ph, pw))
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 2048.0
            qz = np.round(_fdct(block) / _Q12)
            zz = [int(qz.flat[_ZIG[k]]) for k in range(64)]
            pred = _encode_block(bw, zz, pred, _DC12_ENC, _AC12_ENC)
            recon[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = _idct(
                qz * _Q12
            )
    bw.pad()
    dqt = bytes([0x10]) + b"".join(
        int(_Q12.flat[_ZIG[k]]).to_bytes(2, "big") for k in range(64)
    )
    dht = (bytes([0x00]) + bytes(_DC12_BITS) + _DC12_VALS
           + bytes([0x10]) + bytes(_AC12_BITS) + _AC12_VALS)
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC4, dht)
        + _seg(0xC1, bytes([12]) + h.to_bytes(2, "big")
               + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )
    clamped = np.clip(np.round(recon[:h, :w]) + 2048, 0, 4095)
    expected = np.round(clamped * (255.0 / 4095.0)).astype(np.uint8)
    return payload, expected


def test_jpeg12_extended_sequential():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 4096, size=(20, 17)).astype(np.float64)
    payload, expected = encode_jpeg12(img)
    got = jc.decode_jpeg_luma(payload)
    assert (got == expected).all()


def test_jpeg12_progressive_relabel():
    """A 12-bit SOF1 stream relabelled SOF2 decodes identically — the
    12-bit path is frame-type-independent above the scan machinery."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 4096, size=(16, 16)).astype(np.float64)
    payload, expected = encode_jpeg12(img)
    relabel = payload.replace(b"\xff\xc1", b"\xff\xc2", 1)
    got = jc.decode_jpeg_luma(relabel)
    assert (got == expected).all()


def test_jpeg12_baseline_rejected():
    """Baseline (SOF0) is 8-bit by definition; 12-bit must be SOF1+."""
    rng = np.random.default_rng(14)
    img = rng.integers(0, 4096, size=(8, 8)).astype(np.float64)
    payload, _ = encode_jpeg12(img)
    base = payload.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError, match="baseline JPEG is 8-bit only"):
        jc.decode_jpeg_luma(base)


def test_lossless_jpeg_per_component_point_transform():
    """Pt (Al) is a per-SCAN field: two components coded in two scans
    with DIFFERENT point transforms must each reconstruct with their
    own shift — component 0's Al governs the output plane even when a
    later scan carries a different Al (was: last-scan-wins)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    p0 = (img >> 2).astype(int)  # component 1 at Pt=2
    p1 = rng.integers(0, 256, size=(6, 7)).astype(int)  # component 2, Pt=0
    h, w = img.shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([2, 1, 0x11, 0, 2, 0x11, 0])
    out += _seg(0xC3, sof)
    # scan 1: component 1 with Pt=2
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 0, 2]))
    out += _ll_raw_bits(_ll_pred_diffs(p0, pt=2))
    # scan 2: component 2 with Pt=0
    out += _seg(0xDA, bytes([1, 2, 0x00, 1, 0, 0]))
    out += _ll_raw_bits(_ll_pred_diffs(p1, pt=0))
    out += b"\xff\xd9"
    got = jc.decode_jpeg_luma(bytes(out))
    assert (got == (p0 << 2).astype(np.uint8)).all()


def test_hierarchical_exp_empty_body_raises_value_error():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload, _ = encode_jpeg_hier_lossless(img, levels=1)
    i = payload.index(b"\xff\xdf")
    # replace the 3-byte EXP segment (len=3 + EhEv) with an empty one
    bad = payload[:i] + b"\xff\xdf\x00\x02" + payload[i + 5:]
    with pytest.raises(ValueError, match="truncated JPEG EXP"):
        jc.decode_jpeg_luma(bad)
