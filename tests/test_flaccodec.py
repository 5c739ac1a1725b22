"""FLAC decoder tests: a test-side ENCODER (independent bit-writer and
bitwise CRCs — no shared tables with the module) produces real FLAC
streams; because FLAC is lossless the decoder must return the original
samples EXACTLY, across every subframe type, predictor order, stereo
mode, Rice partitioning (including escapes), and wasted bits."""

from __future__ import annotations

import numpy as np
import pytest

from culvert_spark import flaccodec as fc


# ---------------------------------------------------------------------------
# Test-side encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def sw(self, value: int, n: int) -> None:
        self.w(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def pad(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _crc8_bitwise(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_bitwise(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _rice_write(bw: _BitWriter, residual: list[int], porder: int,
                count0: int, escape_raw: int | None = None) -> None:
    """Method-0 Rice residual: `porder` partitions; first partition has
    count0 samples. escape_raw forces every partition to the raw-bits
    escape with that bit width."""
    bw.w(0, 2)  # method 0: 4-bit params
    bw.w(porder, 4)
    idx = 0
    for part in range(1 << porder):
        # every partition holds blocksize >> porder samples; the first
        # loses the predictor warmup — recover that size from the layout
        if part == 0:
            count = count0
        else:
            count = (len(residual) - count0) // ((1 << porder) - 1)
        chunk = residual[idx : idx + count]
        idx += count
        if escape_raw is not None:
            bw.w(15, 4)
            bw.w(escape_raw, 5)
            if escape_raw:
                for v in chunk:
                    bw.sw(v, escape_raw)
            else:
                assert all(v == 0 for v in chunk)
            continue
        folded = [2 * v if v >= 0 else -2 * v - 1 for v in chunk]
        mean_u = (sum(folded) // max(1, len(folded))) or 1
        param = min(14, max(0, mean_u.bit_length() - 1))
        bw.w(param, 4)
        for u in folded:
            bw.unary(u >> param)
            bw.w(u & ((1 << param) - 1), param)
    assert idx == len(residual)


def _encode_subframe(bw: _BitWriter, samples: np.ndarray, bps: int,
                     mode: str = "fixed", order: int = 2, porder: int = 0,
                     wasted: int = 0, lpc: tuple | None = None,
                     escape_raw: int | None = None) -> None:
    vals = [int(v) for v in samples]
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in vals)
        vals = [v >> wasted for v in vals]
    eff = bps - wasted

    def header(stype: int) -> None:
        bw.w(0, 1)
        bw.w(stype, 6)
        if wasted:
            bw.w(1, 1)
            bw.unary(wasted - 1)
        else:
            bw.w(0, 1)

    if mode == "constant":
        assert len(set(vals)) == 1
        header(0)
        bw.sw(vals[0], eff)
        return
    if mode == "verbatim":
        header(1)
        for v in vals:
            bw.sw(v, eff)
        return
    if mode == "lpc":
        coefs, precision, shift = lpc
        header(32 + order - 1)
        for v in vals[:order]:
            bw.sw(v, eff)
        bw.w(precision - 1, 4)
        bw.sw(shift, 5)
        for c in coefs:
            bw.sw(c, precision)
        residual = []
        for i in range(order, len(vals)):
            pred = sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            residual.append(vals[i] - (pred >> shift))
    else:  # fixed
        order = min(order, len(vals) - 1)  # tiny last frame: lower order
        header(8 + order)
        for v in vals[:order]:
            bw.sw(v, eff)
        arr = np.asarray(vals, dtype=np.int64)
        for _ in range(order):
            arr = np.diff(arr)
        residual = [int(v) for v in arr]
    count0 = (len(vals) >> porder) - order
    _rice_write(bw, residual, porder, count0, escape_raw)


def _utf8(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    raise AssertionError("test frames stay below 2048")


def _encode_flac(channels: list[np.ndarray], rate: int = 16_000,
                 bps: int = 16, blocksize: int = 256, ca: int | None = None,
                 with_md5: bool = True, **sub_kw) -> bytes:
    """Encode a full FLAC stream: STREAMINFO (with the decoded-audio
    MD5 unless with_md5=False) + code-7 (16-bit blocksize) frames.
    `ca` None = independent channels; 8/9/10 = left-side / right-side /
    mid-side (stereo only)."""
    import hashlib

    n = len(channels[0])
    n_ch = len(channels)
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34])  # last-block STREAMINFO
    si = bytearray()
    si += blocksize.to_bytes(2, "big") * 2
    si += b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    if with_md5:
        nbytes = (bps + 7) // 8
        inter = np.stack([c.astype(np.int64) for c in channels],
                         axis=1).reshape(-1)
        raw = b"".join(int(v).to_bytes(nbytes, "little", signed=True)
                       for v in inter)
        si += hashlib.md5(raw).digest()
    else:
        si += b"\x00" * 16
    out += si
    frame_no = 0
    for start in range(0, n, blocksize):
        bs = min(blocksize, n - start)
        header = bytearray([0xFF, 0xF8, 0x70, 0])  # code 7 bs, SI rate
        header[3] = ((ca if ca is not None else n_ch - 1) << 4) | (0 << 1)
        header += _utf8(frame_no)
        header += (bs - 1).to_bytes(2, "big")
        header.append(_crc8_bitwise(bytes(header)))
        bw = _BitWriter()
        chunk = [c[start : start + bs].astype(np.int64) for c in channels]
        if ca == 8:
            subs = [(chunk[0], bps), (chunk[0] - chunk[1], bps + 1)]
        elif ca == 9:
            subs = [(chunk[0] - chunk[1], bps + 1), (chunk[1], bps)]
        elif ca == 10:
            subs = [((chunk[0] + chunk[1]) >> 1, bps),
                    (chunk[0] - chunk[1], bps + 1)]
        else:
            subs = [(c, bps) for c in chunk]
        for s, sbps in subs:
            _encode_subframe(bw, s, sbps, **sub_kw)
        bw.pad()
        frame = bytes(header) + bw.tobytes()
        out += frame + _crc16_bitwise(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def _sig(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (6000 * np.sin(2 * np.pi * t / 97)
            + rng.integers(-300, 300, n)).astype(np.int16)


# ---------------------------------------------------------------------------
# Exact-roundtrip tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip_exact(order):
    sig = _sig(1000)
    payload = _encode_flac([sig], blocksize=256, order=order)
    got, rate, _ = fc.decode_flac(payload)
    assert rate == 16_000
    assert got.shape == (1000, 1)
    assert (got[:, 0] == sig).all()


@pytest.mark.parametrize("porder", [0, 1, 2, 3])
def test_partition_orders_roundtrip_exact(porder):
    sig = _sig(512, seed=porder)
    payload = _encode_flac([sig], blocksize=512, order=2, porder=porder)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == sig).all()


@pytest.mark.parametrize("ca", [None, 8, 9, 10])
def test_stereo_modes_roundtrip_exact(ca):
    left, right = _sig(700, seed=1), _sig(700, seed=2)
    payload = _encode_flac([left, right], blocksize=256, ca=ca, order=2)
    got, _, _ = fc.decode_flac(payload)
    assert got.shape == (700, 2)
    assert (got[:, 0] == left).all()
    assert (got[:, 1] == right).all()


def test_lpc_subframe_roundtrip_exact():
    sig = _sig(600, seed=3)
    lpc = ([1434, -717], 12, 9)  # ~2nd-order resonator, 12-bit, shift 9
    payload = _encode_flac([sig], blocksize=300, mode="lpc", order=2,
                           lpc=lpc)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == sig).all()


def test_constant_verbatim_wasted_and_escape():
    const = np.full(256, -1234, dtype=np.int16)
    got, _, _ = fc.decode_flac(_encode_flac([const], mode="constant"))
    assert (got[:, 0] == const).all()

    rng = np.random.default_rng(11)
    rnd = rng.integers(-32768, 32767, 256).astype(np.int16)
    got, _, _ = fc.decode_flac(_encode_flac([rnd], mode="verbatim"))
    assert (got[:, 0] == rnd).all()

    shifted = (_sig(256).astype(np.int32) & ~0x3).astype(np.int16)
    got, _, _ = fc.decode_flac(_encode_flac([shifted], order=1, wasted=2))
    assert (got[:, 0] == shifted).all()

    small = (_sig(256).astype(np.int32) // 256).astype(np.int16)
    got, _, _ = fc.decode_flac(
        _encode_flac([small], order=0, escape_raw=9))
    assert (got[:, 0] == small).all()

    zeros = np.zeros(256, dtype=np.int16)
    got, _, _ = fc.decode_flac(
        _encode_flac([zeros], order=0, escape_raw=0))
    assert (got[:, 0] == zeros).all()


def test_many_frames_utf8_frame_numbers():
    """150 frames of 64 samples: frame numbers cross 127, exercising the
    2-byte UTF-8 coded-number path."""
    sig = _sig(150 * 64, seed=5)
    payload = _encode_flac([sig], blocksize=64, order=1)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == sig).all()


def test_short_last_frame():
    sig = _sig(1000 + 37, seed=6)
    payload = _encode_flac([sig], blocksize=250, order=2)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == sig).all()


def test_corruption_raises():
    payload = bytearray(_encode_flac([_sig(256)], order=2))
    with pytest.raises(ValueError, match="not a FLAC"):
        fc.decode_flac(b"fLaX" + bytes(payload[4:]))
    # flip a bit deep in the frame body -> CRC-16 mismatch
    body = bytearray(payload)
    body[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        fc.decode_flac(bytes(body))
    # corrupt a header byte -> CRC-8 (or sync) failure
    head = bytearray(payload)
    head[4 + 4 + 34 + 2] ^= 0x10  # frame byte 2 (blocksize/rate codes)
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(head))
    with pytest.raises(ValueError, match="truncated"):
        fc.decode_flac(bytes(payload[: len(payload) - 6]))


def test_md5_verification_and_24bit():
    """Every roundtrip above already passes the MD5 gate (the encoder
    stamps it); here: a corrupted MD5 raises, an all-zero MD5 is
    accepted as unset, and 24-bit samples roundtrip exactly with the
    3-byte-per-sample digest."""
    sig = _sig(512)
    payload = bytearray(_encode_flac([sig], order=2))
    payload[4 + 4 + 18] ^= 0x55  # first MD5 byte
    with pytest.raises(ValueError, match="MD5 mismatch"):
        fc.decode_flac(bytes(payload))
    unset = _encode_flac([sig], order=2, with_md5=False)
    got, _, _ = fc.decode_flac(unset)
    assert (got[:, 0] == sig).all()
    rng = np.random.default_rng(21)
    wide = (rng.integers(-(1 << 23), 1 << 23, 600)
            .astype(np.int64))
    payload = _encode_flac([wide.astype(np.int32)], bps=24, order=1,
                           blocksize=200)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == wide).all()


def test_streaminfo_total_mismatch_raises():
    payload = bytearray(_encode_flac([_sig(256)], order=1))
    # STREAMINFO total-samples field: low 4 bytes of the packed u64 at
    # offset 4(magic)+4(header)+18
    off = 4 + 4 + 10 + 7
    payload[off] ^= 0x01
    with pytest.raises(ValueError, match="total|CRC"):
        fc.decode_flac(bytes(payload))
