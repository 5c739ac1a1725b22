"""Multimodal plumbing tests: schema, batch shape, fan-out multiplicity,
determinism, and feature math against hand-computed values."""

from __future__ import annotations

import numpy as np
import pytest

from culvert_spark import multimodal as mm
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, SF_SMALL)
    df.cache().count()
    yield df
    df.unpersist()


def test_media_schema_and_payloads(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    rows = media.limit(10).collect()
    for r in rows:
        assert len(r.payload) == 48  # md5x2 + md5 = 16*3 bytes
        assert r.kind in mm.MEDIA_KINDS
        assert r.meta.width >= 16 and r.meta.height >= 16


def test_image_features_values(media):
    feats = mm.image_features(media).collect()
    imgs = {r.media_id: r for r in media.filter("kind = 'image'").collect()}
    assert {r.media_id for r in feats} == set(imgs)
    # Recompute one row by hand with the same stub decode.
    r = feats[0]
    src = imgs[r.media_id]
    plane = mm._decode_image(
        bytes(src.payload), src.meta.width, src.meta.height
    )
    assert r.width == src.meta.width and r.height == src.meta.height
    assert r.mean_luma == pytest.approx(float(plane.mean()))
    assert r.max_luma == int(plane.max())
    assert len(r.phash) == 16 and set(r.phash) <= {"0", "1"}


def test_image_features_deterministic(media):
    a = mm.image_features(media).orderBy("media_id").collect()
    b = mm.image_features(media).orderBy("media_id").collect()
    assert a == b


def test_resize_shape(media):
    out = mm.resize_images(media, 8, 6).collect()
    assert len(out) == media.filter("kind = 'image'").count()
    for r in out:
        assert r.width == 8 and r.height == 6
        assert len(r.payload) == 8 * 6


def test_frame_fanout_multiplicity(media):
    vids = media.filter("kind = 'video'").select("media_id", "meta.n_frames")
    expected = {
        r.media_id: len(range(0, r.n_frames, 2)) for r in vids.collect()
    }
    got = (
        mm.sample_frames(media, every_n=2)
        .groupBy("media_id")
        .count()
        .collect()
    )
    assert {r.media_id: r["count"] for r in got} == expected
    # Frame payload slices reassemble a prefix-ordered, disjoint cover.
    one = (
        mm.sample_frames(media.filter("kind = 'video'").limit(1), every_n=1)
        .orderBy("frame_idx")
        .collect()
    )
    joined = b"".join(bytes(r.frame_payload) for r in one)
    src = media.filter("kind = 'video'").limit(1).collect()[0]
    assert joined == bytes(src.payload)


def test_audio_features_values(media):
    feats = mm.audio_features(media).collect()
    auds = {r.media_id: r for r in media.filter("kind = 'audio'").collect()}
    assert {r.media_id for r in feats} == set(auds)
    r = feats[0]
    samples, _ = mm._decode_audio(bytes(auds[r.media_id].payload))
    assert r.n_samples == 48
    assert r.duration_s == pytest.approx(48 / 16_000)
    assert r.rms == pytest.approx(
        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    )


def test_no_shuffle_in_feature_plan(media):
    """mapInPandas is a narrow map — the physical plan must not contain an
    exchange (shuffle) between scan and UDF."""
    plan = mm.image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _ppm_bytes(rgb):
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w, _ = rgb.shape
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def _wav_bytes(samples, sr):
    """Encode int16 mono samples as a canonical RIFF/WAVE PCM16 file."""
    data = samples.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")        # mono
        + sr.to_bytes(4, "little")
        + (sr * 2).to_bytes(4, "little")   # byte rate
        + (2).to_bytes(2, "little")        # block align
        + (16).to_bytes(2, "little")       # bits
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _png_filter_rows(bimg, bpp, filters):
    """Forward scanline filtering of one (sub-)image given as an
    (h, stride) BYTE array; ``filters`` cycles over the rows."""
    h, stride = bimg.shape
    raster = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = bimg[y].astype(np.int32)
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        raster += bytes([f]) + (out % 256).astype(np.uint8).tobytes()
        prev = cur
    return bytes(raster)


def _png_bytes(img, color_type, filters=None, palette=None, bit_depth=8,
               interlace=0):
    """Encode an image as PNG with an EXPLICIT per-row filter choice
    (the forward transform of each spec filter; the decoder must invert
    every one). ``img`` is (h, w) for gray/palette or (h, w, c) for
    RGB(A)/gray+alpha — uint16 when bit_depth=16; interlace=1 serializes
    the seven Adam7 passes, each filtered independently."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if bit_depth == 16:
        bimg = img.astype(">u2").view(np.uint8).reshape(h, w, 2 * c)
    else:
        bimg = img.astype(np.uint8)
    filters = filters or [0]

    def pack_rows(sub):
        """(hp, wp, units) sample bytes -> (hp, row_bytes) filter input;
        sub-byte depths pack MSB-first with zero padding bits."""
        hp, wp = sub.shape[:2]
        if bit_depth >= 8:
            return sub.reshape(hp, -1)
        per = 8 // bit_depth
        padded = np.zeros((hp, ((wp + per - 1) // per) * per), np.uint8)
        padded[:, :wp] = sub[:, :, 0]
        grouped = padded.reshape(hp, -1, per)
        shifts = np.arange(8 - bit_depth, -1, -bit_depth)
        return (grouped << shifts).sum(axis=2).astype(np.uint8)

    bpp = bimg.shape[2] if bit_depth >= 8 else 1
    if interlace:
        raster = b""
        for x0, y0, dx, dy in mm._ADAM7:
            sub = bimg[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raster += _png_filter_rows(pack_rows(sub), bpp, filters)
    else:
        raster = _png_filter_rows(pack_rows(bimg), bpp, filters)

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + (zlib.crc32(cid + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    comp = zlib.compress(bytes(raster))
    # Split IDAT in two to prove multi-chunk reassembly.
    out += chunk(b"IDAT", comp[:7]) + chunk(b"IDAT", comp[7:])
    return out + chunk(b"IEND", b"")


def test_png_decode_all_filters_gray():
    """Gray PNG whose rows cycle through all five scanline filters: the
    decoder must invert each (Sub's lane-cumsum, Up, Average's rounded
    left feedback, Paeth's branchy predictor) bit-for-bit."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
    payload = _png_bytes(img, color_type=0, filters=[0, 1, 2, 3, 4])
    got = mm._decode_png(payload)
    assert got.dtype == np.uint8 and got.shape == (11, 13)
    assert (got == img).all()


def test_png_decode_color_types():
    """RGB luma matches the PPM path's BT.601 rounding; RGBA ignores
    alpha; gray+alpha returns the gray plane; palette maps through PLTE
    before luma."""
    rng = np.random.default_rng(32)
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    expected = mm._png_luma(rgb)
    assert (
        mm._decode_png(_png_bytes(rgb, 2, filters=[4, 3, 1])) == expected
    ).all()
    rgba = np.dstack([rgb, rng.integers(0, 256, size=(5, 4), dtype=np.uint8)])
    assert (
        mm._decode_png(_png_bytes(rgba, 6, filters=[2, 4])) == expected
    ).all()
    gray = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    ga = np.dstack([gray, np.full((6, 3), 9, dtype=np.uint8)])
    assert (mm._decode_png(_png_bytes(ga, 4, filters=[1])) == gray).all()
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(3, 7), dtype=np.uint8)
    got = mm._decode_png(_png_bytes(idx, 3, filters=[0, 2], palette=pal))
    assert (got == mm._png_luma(pal[idx])).all()


def test_png_decode_rejects_corruption():
    """A real decoder raises on damage: CRC flips, truncation, unknown
    interlace methods, nonexistent bit depth, illegal 16-bit palette."""
    import zlib

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    good = _png_bytes(img, color_type=0, filters=[1])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        mm._decode_png(bytes(bad_crc))
    with pytest.raises(ValueError):
        mm._decode_png(good[: len(good) - 9])  # truncated: IEND lost

    def rewrite_ihdr(index, value):
        # IHDR body starts at offset 16; refresh the chunk CRC after edit.
        body = bytearray(good[16 : 16 + 13])
        body[index] = value
        return (
            good[:12]
            + b"IHDR"
            + bytes(body)
            + (zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF).to_bytes(
                4, "big"
            )
            + good[33:]
        )

    with pytest.raises(ValueError, match="[Ii]nterlace method"):
        mm._decode_png(rewrite_ihdr(12, 2))  # method 2 doesn't exist
    with pytest.raises(ValueError, match="bit depth"):
        mm._decode_png(rewrite_ihdr(8, 3))  # depth 3 doesn't exist
    with pytest.raises(ValueError, match="not a PNG"):
        mm._decode_png(b"\x89PNJ" + good[4:])
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    pal16 = _png_bytes(img.astype(np.uint16), color_type=3, bit_depth=16,
                       palette=pal)
    with pytest.raises(ValueError, match="not legal"):
        mm._decode_png(pal16)


def test_png_16bit_gray_and_rgb():
    """16-bit PNG decodes for real: samples rescale to 8 bits via the
    spec's round(v*255/65535), then the usual gray/luma paths."""
    rng = np.random.default_rng(5)
    g16 = rng.integers(0, 65536, (9, 7)).astype(np.uint16)
    payload = _png_bytes(g16, color_type=0, bit_depth=16,
                         filters=[0, 1, 2, 3, 4])
    got = mm._decode_png(payload)
    assert (got == np.round(g16 / 257.0).astype(np.uint8)).all()
    rgb16 = rng.integers(0, 65536, (5, 6, 3)).astype(np.uint16)
    payload = _png_bytes(rgb16, color_type=2, bit_depth=16, filters=[4])
    got = mm._decode_png(payload)
    exp = mm._png_luma(np.round(rgb16 / 257.0).astype(np.uint8))
    assert (got == exp).all()


def test_png_adam7_roundtrip():
    """Adam7-interlaced PNG must decode identically to the flat layout,
    including odd sizes and tiny images where some passes are empty."""
    rng = np.random.default_rng(6)
    for shape, ct in [((11, 13), 0), ((8, 8, 3), 2), ((3, 2), 0),
                      ((1, 1), 0)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        woven = _png_bytes(img, color_type=ct, interlace=1,
                           filters=[0, 1, 2, 3, 4])
        flat = _png_bytes(img, color_type=ct, filters=[0])
        assert (mm._decode_png(woven) == mm._decode_png(flat)).all(), shape


def _apng_bytes(canvas_wh, frames, first_in_idat=True):
    """APNG writer (RGBA, depth 8): acTL + per-frame fcTL with
    placement/dispose/blend; the first frame rides IDAT when
    first_in_idat, else IDAT carries a standalone default image passed
    as frames[0] with key 'default'."""
    import zlib

    w, h = canvas_wh

    def chunk(cid, body):
        return (len(body).to_bytes(4, "big") + cid + body
                + (zlib.crc32(cid + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    def raster(rgba):
        return zlib.compress(
            _png_filter_rows(rgba.reshape(rgba.shape[0], -1), 4, [0, 2])
        )

    anim = [f for f in frames if "default" not in f]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += chunk(b"IHDR", w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + bytes([8, 6, 0, 0, 0]))
    out += chunk(b"acTL", len(anim).to_bytes(4, "big") + bytes(4))
    seq = 0
    emitted_idat = False
    for i, f in enumerate(frames):
        if "default" in f:
            out += chunk(b"IDAT", raster(f["default"]))
            emitted_idat = True
            continue
        rgba = f["rgba"]
        fh, fw = rgba.shape[:2]
        fctl = (seq.to_bytes(4, "big") + fw.to_bytes(4, "big")
                + fh.to_bytes(4, "big")
                + f.get("x", 0).to_bytes(4, "big")
                + f.get("y", 0).to_bytes(4, "big")
                + bytes(4)  # delay 0/0
                + bytes([f.get("dispose", 0), f.get("blend", 0)]))
        out += chunk(b"fcTL", fctl)
        seq += 1
        if not emitted_idat and first_in_idat:
            out += chunk(b"IDAT", raster(rgba))
            emitted_idat = True
        else:
            out += chunk(b"fdAT", seq.to_bytes(4, "big") + raster(rgba))
            seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


def _apng_composite_ref(canvas_wh, frames):
    """Independent per-pixel reference for APNG compositing."""
    w, h = canvas_wh
    canvas = [[[0.0, 0.0, 0.0, 0.0] for _ in range(w)] for _ in range(h)]
    outs = []
    for f in frames:
        if "default" in f:
            continue
        rgba = f["rgba"]
        x, y = f.get("x", 0), f.get("y", 0)
        saved = [[list(canvas[y + j][x + i])
                  for i in range(rgba.shape[1])]
                 for j in range(rgba.shape[0])]
        for j in range(rgba.shape[0]):
            for i in range(rgba.shape[1]):
                src = [float(v) for v in rgba[j, i]]
                dst = canvas[y + j][x + i]
                if f.get("blend", 0) == 0:
                    canvas[y + j][x + i] = src
                else:
                    sa, da = src[3] / 255.0, dst[3] / 255.0
                    oa = sa + da * (1 - sa)
                    px = [0.0, 0.0, 0.0, oa * 255.0]
                    if oa > 0:
                        for c in range(3):
                            px[c] = (src[c] * sa
                                     + dst[c] * da * (1 - sa)) / oa
                    canvas[y + j][x + i] = px
        snap = np.round(
            np.array([[p[:3] for p in row] for row in canvas])
        ).astype(np.uint8)
        outs.append(mm._png_luma(snap))
        for j in range(rgba.shape[0]):
            for i in range(rgba.shape[1]):
                if f.get("dispose", 0) == 1:
                    canvas[y + j][x + i] = [0.0, 0.0, 0.0, 0.0]
                elif f.get("dispose", 0) == 2:
                    canvas[y + j][x + i] = saved[j][i]
    return outs


def test_apng_compositing_blend_and_dispose():
    """Four-frame APNG: full first frame in IDAT, a semi-transparent
    OVER sub-rect, a clear-to-transparent dispose, a restore-previous
    dispose — all against an independent per-pixel reference."""
    rng = np.random.default_rng(81)

    def rnd(h, w, alpha=None):
        a = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        if alpha is not None:
            a[:, :, 3] = alpha
        return a

    frames = [
        {"rgba": rnd(10, 14, alpha=255)},
        {"rgba": rnd(4, 5), "x": 2, "y": 3, "blend": 1, "dispose": 2},
        {"rgba": rnd(3, 6, alpha=128), "x": 7, "y": 1, "blend": 1,
         "dispose": 1},
        {"rgba": rnd(5, 5, alpha=200), "x": 0, "y": 5, "blend": 0},
    ]
    payload = _apng_bytes((14, 10), frames)
    got = mm._apng_frames_luma(payload)
    expected = _apng_composite_ref((14, 10), frames)
    assert len(got) == 4
    for g, e in zip(got, expected):
        assert (g == e).all()
    # the static decode of the same payload is the IDAT default image
    assert (mm._decode_png(payload)
            == mm._png_luma(frames[0]["rgba"][:, :, :3])).all()


def test_apng_default_image_not_in_animation():
    """When the first fcTL comes after IDAT, the default image is shown
    by static decoders but is NOT part of the animation."""
    rng = np.random.default_rng(83)
    default = rng.integers(0, 256, (6, 8, 4)).astype(np.uint8)
    f1 = {"rgba": rng.integers(0, 256, (6, 8, 4)).astype(np.uint8)}
    f2 = {"rgba": rng.integers(0, 256, (2, 3, 4)).astype(np.uint8),
          "x": 1, "y": 1, "blend": 0}
    frames = [{"default": default}, f1, f2]
    payload = _apng_bytes((8, 6), frames, first_in_idat=False)
    got = mm._apng_frames_luma(payload)
    expected = _apng_composite_ref((8, 6), frames)
    assert len(got) == 2
    for g, e in zip(got, expected):
        assert (g == e).all()
    assert (mm._decode_png(payload)
            == mm._png_luma(default[:, :, :3])).all()
    with pytest.raises(ValueError, match="no animation control"):
        static = _png_bytes(default[:, :, :3], color_type=2)
        mm._apng_frames_luma(static)


def test_apng_through_sample_frames(spark):
    """APNG through the Spark frame fan-out, plus a static PNG video
    payload treated as its single frame."""
    rng = np.random.default_rng(87)
    frames = [{"rgba": rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)}
              for _ in range(3)]
    apng = _apng_bytes((7, 5), frames)
    static = _png_bytes(
        rng.integers(0, 256, (4, 4)).astype(np.uint8), color_type=0
    )
    df = spark.createDataFrame(
        [(1, "video", bytearray(apng), (7, 5, 0, 9)),
         (2, "video", bytearray(static), (4, 4, 0, 9))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = sorted(mm.sample_frames(df, every_n=2).collect(),
                  key=lambda r: (r.media_id, r.frame_idx))
    expected = _apng_composite_ref((7, 5), frames)
    assert [(r.media_id, r.frame_idx) for r in rows] == [(1, 0), (1, 2),
                                                         (2, 0)]
    for r in rows[:2]:
        got = mm._decode_pnm(bytes(r.frame_payload))
        assert (got == expected[r.frame_idx]).all()
    assert (mm._decode_pnm(bytes(rows[2].frame_payload))
            == mm._decode_png(static)).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_and_palette(depth):
    """1/2/4-bit PNGs decode for real: MSB-first unpacking with padded
    row tails, exact integer gray rescale (255, 85, 17), palette
    lookup on raw indices — flat and Adam7-interlaced."""
    rng = np.random.default_rng(depth)
    levels = 1 << depth
    img = rng.integers(0, levels, (11, 13)).astype(np.uint8)
    payload = _png_bytes(img, color_type=0, bit_depth=depth,
                         filters=[0, 1, 2, 3, 4])
    got = mm._decode_png(payload)
    assert (got == img * (255 // (levels - 1))).all()
    woven = _png_bytes(img, color_type=0, bit_depth=depth, interlace=1,
                       filters=[2, 4])
    assert (mm._decode_png(woven) == img * (255 // (levels - 1))).all()
    palette = rng.integers(0, 256, (levels, 3)).astype(np.uint8)
    pal_payload = _png_bytes(img, color_type=3, bit_depth=depth,
                             palette=palette, filters=[1])
    assert (mm._decode_png(pal_payload) == mm._png_luma(palette[img])).all()


def test_png_subbyte_requires_gray_or_palette():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = _png_bytes(img, color_type=2, bit_depth=4)
    with pytest.raises(ValueError, match="gray or palette"):
        mm._decode_png(payload)


def test_png_adam7_16bit_rgba():
    """Interlacing composes with 16-bit depth and alpha channels."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, (10, 9, 4)).astype(np.uint16)
    payload = _png_bytes(img, color_type=6, bit_depth=16, interlace=1,
                         filters=[3, 4])
    got = mm._decode_png(payload)
    exp = mm._png_luma(np.round(img[:, :, :3] / 257.0).astype(np.uint8))
    assert (got == exp).all()


def test_real_png_through_pipeline(spark):
    """REAL compressed image bytes (PNG: zlib DEFLATE + filters) through
    the same Spark operators — header dimensions win over metadata and
    features match a hand computation, exactly like the PPM path."""
    rng = np.random.default_rng(33)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    payload = _png_bytes(rgb, color_type=2, filters=[0, 1, 2, 3, 4])
    expected = mm._png_luma(rgb)
    df = spark.createDataFrame(
        [(3, "image", bytearray(payload), (99, 99, 16000, 4))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.image_features(df).collect()[0]
    assert (r.width, r.height) == (5, 6)  # from the PNG header, not meta
    assert r.mean_luma == pytest.approx(float(expected.mean()))
    assert r.max_luma == int(expected.max())


def test_real_ppm_through_pipeline(spark):
    """REAL image bytes (binary PPM, decoded in pure numpy) through the
    same Spark operators: header dimensions win over metadata, and the
    features match a hand computation on the known pixels."""
    rgb = np.zeros((3, 4, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200  # red plane constant
    rgb[1, 2] = [10, 20, 30]
    payload = _ppm_bytes(rgb)
    expected = mm._decode_pnm(payload)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (99, 99, 16000, 4))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.image_features(df).collect()[0]
    assert (r.width, r.height) == (4, 3)  # from the PPM header, not meta
    assert r.mean_luma == pytest.approx(float(expected.mean()))
    assert r.max_luma == int(expected.max())
    rs = mm.resize_images(df, out_w=2, out_h=2).collect()[0]
    assert (rs.width, rs.height) == (2, 2)
    got = np.frombuffer(bytes(rs.payload), dtype=np.uint8).reshape(2, 2)
    yi = (np.arange(2) * 3 // 2)[:, None]
    xi = (np.arange(2) * 4 // 2)[None, :]
    assert (got == expected[yi, xi]).all()


def _gif_lzw_encode(indices: bytes, mcs: int, reset_on_full=True) -> bytes:
    """Standard GIF LZW encoder (test-side, independent of the module):
    variable-width codes packed LSB-first, width grown right before the
    entry with value 2**width is assigned, clear-and-reset (or frozen
    table when reset_on_full=False — the 'deferred clear' shape) at the
    4096-entry cap."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    codes: list[tuple[int, int]] = []
    table = fresh()
    next_code = clear + 2
    width = mcs + 1
    codes.append((clear, width))
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        codes.append((table[prev], width))
        if next_code < 4096:
            if next_code == (1 << width) and width < 12:
                width += 1
            table[cur] = next_code
            next_code += 1
        elif reset_on_full:
            codes.append((clear, width))
            table = fresh()
            next_code = clear + 2
            width = mcs + 1
        prev = bytes([b])
    codes.append((table[prev], width))
    codes.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_order(h):
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def _gif_bytes(raster, palette, mcs=8, interlace=False, local=False,
               version=b"89a", extension=False, reset_on_full=True):
    """Wrap an index raster + palette as a real GIF87a/89a file."""
    h, w = raster.shape
    size_bits = len(palette).bit_length() - 2  # table is 2**(s+1) entries
    pal_bytes = bytes(np.asarray(palette, np.uint8).reshape(-1))
    out = bytearray(b"GIF" + version)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([(0x80 | size_bits) if not local else 0, 0, 0])
    if not local:
        out += pal_bytes
    if extension:  # a Graphic Control Extension, to be skipped
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    out += b"\x2C" + bytes(4)  # image at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([((0x80 | size_bits) if local else 0)
                  | (0x40 if interlace else 0)])
    if local:
        out += pal_bytes
    rows = raster[_gif_interlace_order(h)] if interlace else raster
    out += bytes([mcs])
    data = _gif_lzw_encode(bytes(rows.reshape(-1)), mcs, reset_on_full)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def test_cross_format_image_dedup(spark):
    """Why real decodes matter for dedup: the SAME pixels stored as
    PPM, PNG, BMP, QOI and TIFF (all lossless RGB) decode to identical
    luma, so perceptual-hash grouping collapses all five containers
    into one duplicate group — byte-level hashing would see five
    distinct blobs."""
    from tests.test_tiffcodec import _tiff_bytes

    rng = np.random.default_rng(91)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    other = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payloads = [
        _ppm_bytes(rgb),
        _png_bytes(rgb, color_type=2, filters=[0, 1, 2, 3, 4]),
        _bmp_bytes(img_rgb=rgb),
        _qoi_bytes(rgb),
        _tiff_bytes(rgb, compression=5, predictor=2),
        _ppm_bytes(other),  # a genuinely different image
    ]
    df = spark.createDataFrame(
        [(i, "image", bytearray(p), (16, 16, 0, 0))
         for i, p in enumerate(payloads)],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    groups = {r.keeper_id: r for r in mm.image_dedup_groups(df).collect()}
    assert set(groups) == {0, 5}
    assert groups[0].n_images == 5 and groups[0].n_dupes == 4
    assert groups[5].n_images == 1 and groups[5].n_dupes == 0


def test_flac_24bit_audio_rescale():
    """A 24-bit FLAC through the audio adapter keeps the top 16 bits
    (same convention as 24-bit WAV) instead of wrapping modulo 2^16."""
    from tests.test_flaccodec import _encode_flac

    sig = (9000 * np.sin(np.arange(600) / 11.0)).astype(np.int16)
    wide = sig.astype(np.int32) << 8
    payload = _encode_flac([wide], bps=24, rate=16_000, blocksize=200,
                           order=1)
    got, rate = mm._decode_audio(payload)
    assert rate == 16_000
    assert (got == sig).all()


def test_wav_pcm_depths_and_float():
    """PCM WAV at every legal depth plus IEEE-float: 8-bit unsigned
    recenters, 24/32-bit keep the top 16 bits (arithmetic shift), float
    scales [-1,1] to int16."""
    u8 = np.array([0, 128, 255, 64], dtype=np.uint8)
    payload = _wav_bytes_fmt(u8.tobytes(), 8_000, fmt_tag=1, bits=8,
                             block_align=1)
    got, rate = mm._decode_wav_pcm16(payload)
    assert rate == 8_000
    assert (got == (u8.astype(np.int16) - 128) * 256).all()

    s24 = np.array([0, 1, -1, 8_388_607, -8_388_608, -259], dtype=np.int64)
    raw24 = b"".join(int(v).to_bytes(3, "little", signed=True) for v in s24)
    payload = _wav_bytes_fmt(raw24, 16_000, fmt_tag=1, bits=24,
                             block_align=3)
    got, _ = mm._decode_wav_pcm16(payload)
    assert (got == (s24 >> 8).astype(np.int16)).all()

    s32 = np.array([0, 2**31 - 1, -(2**31), 65_536, -65_537],
                   dtype=np.int64)
    raw32 = b"".join(int(v).to_bytes(4, "little", signed=True) for v in s32)
    payload = _wav_bytes_fmt(raw32, 16_000, fmt_tag=1, bits=32,
                             block_align=4)
    got, _ = mm._decode_wav_pcm16(payload)
    assert (got == (s32 >> 16).astype(np.int16)).all()

    f32 = np.array([0.0, 1.0, -1.0, 0.5, 2.0, -3.0], dtype=np.float32)
    payload = _wav_bytes_fmt(f32.tobytes(), 44_100, fmt_tag=3, bits=32,
                             block_align=4)
    got, _ = mm._decode_wav_pcm16(payload)
    expect = np.round(np.clip(f32, -1, 1) * 32767).astype(np.int16)
    assert (got == expect).all()

    f64 = np.array([0.25, -0.75], dtype=np.float64)
    payload = _wav_bytes_fmt(f64.tobytes(), 44_100, fmt_tag=3, bits=64,
                             block_align=8)
    got, _ = mm._decode_wav_pcm16(payload)
    assert (got == np.round(f64 * 32767).astype(np.int16)).all()

    with pytest.raises(ValueError, match="bit depth"):
        mm._decode_wav_pcm16(
            _wav_bytes_fmt(b"\x00" * 8, 8_000, fmt_tag=1, bits=12,
                           block_align=2))
    with pytest.raises(ValueError, match="IEEE-float"):
        mm._decode_wav_pcm16(
            _wav_bytes_fmt(b"\x00" * 8, 8_000, fmt_tag=3, bits=16,
                           block_align=2))


def _gif_anim_bytes(screen, bg, gpal, frames, mcs=8):
    """Animated GIF89a: per-frame Graphic Control Extension (disposal +
    transparency) ahead of each image descriptor, sub-rect placement,
    optional local palettes."""
    w, h = screen
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    size_bits = len(gpal).bit_length() - 2
    out += bytes([0x80 | size_bits, bg, 0])
    out += bytes(np.asarray(gpal, np.uint8).reshape(-1))
    for f in frames:
        disposal = f.get("disposal", 0)
        trans = f.get("transparent")
        gce_flags = (disposal << 2) | (1 if trans is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_flags, 0, 0,
                      trans if trans is not None else 0, 0])
        raster = f["raster"]
        fh, fw = raster.shape
        out += b"\x2C"
        out += f.get("left", 0).to_bytes(2, "little")
        out += f.get("top", 0).to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        lpal = f.get("palette")
        if lpal is not None:
            out += bytes([0x80 | (len(lpal).bit_length() - 2)])
            out += bytes(np.asarray(lpal, np.uint8).reshape(-1))
        else:
            out += bytes([0])
        out += bytes([mcs])
        data = _gif_lzw_encode(bytes(raster.reshape(-1)), mcs)
        for i in range(0, len(data), 255):
            c = data[i : i + 255]
            out += bytes([len(c)]) + c
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def _gif_composite_ref(screen, bg, gpal, frames):
    """Independent per-pixel reference for the GIF animation semantics
    (draw over canvas, transparency preserves, disposal prepares)."""
    w, h = screen
    canvas = [[tuple(gpal[bg]) for _ in range(w)] for _ in range(h)]
    outs = []
    for f in frames:
        raster = f["raster"]
        pal = f.get("palette") if f.get("palette") is not None else gpal
        left, top = f.get("left", 0), f.get("top", 0)
        trans = f.get("transparent")
        saved = [[canvas[top + y][left + x]
                  for x in range(raster.shape[1])]
                 for y in range(raster.shape[0])]
        for y in range(raster.shape[0]):
            for x in range(raster.shape[1]):
                idx = int(raster[y, x])
                if trans is None or idx != trans:
                    canvas[top + y][left + x] = tuple(pal[idx])
        snap = np.array(canvas, dtype=np.uint8)
        outs.append(mm._png_luma(snap))
        disposal = f.get("disposal", 0)
        for y in range(raster.shape[0]):
            for x in range(raster.shape[1]):
                if disposal == 2:
                    canvas[top + y][left + x] = tuple(gpal[bg])
                elif disposal == 3:
                    canvas[top + y][left + x] = saved[y][x]
    return outs


def test_gif_animation_compositing():
    """Three-frame animation: full first frame, a transparent sub-rect
    with restore-to-previous, a local-palette sub-rect with
    restore-to-background — composites must match an independent
    per-pixel reference."""
    rng = np.random.default_rng(61)
    gpal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    lpal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    frames = [
        {"raster": rng.integers(0, 8, (12, 16)).astype(np.uint8)},
        {"raster": rng.integers(0, 8, (4, 5)).astype(np.uint8),
         "left": 3, "top": 2, "transparent": 6, "disposal": 3},
        {"raster": rng.integers(0, 4, (6, 7)).astype(np.uint8),
         "left": 8, "top": 5, "palette": lpal, "disposal": 2},
        {"raster": rng.integers(0, 8, (3, 3)).astype(np.uint8),
         "left": 0, "top": 9},
    ]
    payload = _gif_anim_bytes((16, 12), 1, gpal, frames)
    got = mm._gif_frames_luma(payload)
    expected = _gif_composite_ref((16, 12), 1, gpal, frames)
    assert len(got) == 4
    for g, e in zip(got, expected):
        assert (g == e).all()
    # _decode_gif on an animation = composited frame 1
    assert (mm._decode_gif(payload) == expected[0]).all()


def test_gif_animation_through_sample_frames(spark):
    """Animated GIF through the Spark frame fan-out: sampled frames
    arrive as binary PGM snapshots the image path decodes back to the
    exact composites."""
    rng = np.random.default_rng(67)
    gpal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    frames = [{"raster": rng.integers(0, 16, (10, 13)).astype(np.uint8)}
              for _ in range(5)]
    payload = _gif_anim_bytes((13, 10), 0, gpal, frames)
    expected = _gif_composite_ref((13, 10), 0, gpal, frames)
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), (13, 10, 0, 42))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = sorted(mm.sample_frames(df, every_n=2).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        got = mm._decode_pnm(bytes(r.frame_payload))
        assert (got == expected[r.frame_idx]).all()


@pytest.mark.parametrize("reset_on_full", [True, False])
def test_gif_roundtrip_noise_exercises_12bit_codes(reset_on_full):
    """128x128 random 256-color noise: the LZW table fills to the
    4096-entry cap, covering code-width growth 9..12 plus (parametrized)
    the clear-and-reset and deferred-clear behaviors. GIF is lossless,
    so decode must be exact."""
    rng = np.random.default_rng(3)
    raster = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    palette = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    payload = _gif_bytes(raster, palette, reset_on_full=reset_on_full)
    got = mm._decode_gif(payload)
    assert (got == mm._png_luma(palette[raster])).all()


def test_gif_interlaced_and_smooth():
    """Interlaced GIF: rows are stored in the four passes and must come
    back unwoven; a smooth gradient also exercises long LZW runs."""
    h, w = 40, 64
    raster = (np.add.outer(np.arange(h), np.arange(w)) % 16
              ).astype(np.uint8)
    palette = np.stack([np.arange(16) * 17] * 3, axis=1).astype(np.uint8)
    flat = _gif_bytes(raster, palette, mcs=4)
    woven = _gif_bytes(raster, palette, mcs=4, interlace=True)
    expected = mm._png_luma(palette[raster])
    assert (mm._decode_gif(flat) == expected).all()
    assert (mm._decode_gif(woven) == expected).all()


def test_gif_local_table_extension_and_min_mcs():
    """GIF89a with an extension block (skipped), a LOCAL color table
    that must override the missing global one, and the minimum LZW code
    size of 2 for a 4-color image."""
    raster = (np.indices((9, 13)).sum(axis=0) % 4).astype(np.uint8)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]],
                       dtype=np.uint8)
    payload = _gif_bytes(raster, palette, mcs=2, local=True,
                         extension=True)
    got = mm._decode_gif(payload)
    assert (got == mm._png_luma(palette[raster])).all()


def test_gif_rejects_corruption():
    raster = (np.indices((8, 8)).sum(axis=0) % 4).astype(np.uint8)
    palette = np.arange(12, dtype=np.uint8).reshape(4, 3)
    payload = _gif_bytes(raster, palette, mcs=2)
    with pytest.raises(ValueError, match="not a GIF"):
        mm._decode_gif(b"GIF00a" + payload[6:])
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_gif(payload[:20])
    with pytest.raises(ValueError, match="unknown GIF block"):
        bad = bytearray(payload)
        bad[13 + 12] = 0x7E  # image separator -> junk
        mm._decode_gif(bytes(bad))
    with pytest.raises(ValueError, match="no image data"):
        mm._decode_gif(payload[: 13 + 12] + b"\x3B")


def test_real_gif_through_pipeline(spark):
    """REAL GIF bytes through image_features: header dimensions win and
    the features match a hand computation on the decoded pixels."""
    rng = np.random.default_rng(9)
    raster = rng.integers(0, 64, (17, 23)).astype(np.uint8)
    palette = rng.integers(0, 256, (64, 3)).astype(np.uint8)
    payload = _gif_bytes(raster, palette, mcs=6)
    expected = mm._png_luma(palette[raster])
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (99, 99, 16000, 4))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.image_features(df).collect()[0]
    assert (r.width, r.height) == (23, 17)
    assert r.mean_luma == pytest.approx(float(expected.mean()))
    assert r.max_luma == int(expected.max())


def _wav_bytes_fmt(data, sr, fmt_tag, bits, block_align, n_channels=1):
    """Encode raw codec bytes as a RIFF/WAVE container with an arbitrary
    format tag (PCM=1, A-law=6, µ-law=7, IMA ADPCM=0x11)."""
    fmt = (
        fmt_tag.to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        body += b"\x00"  # chunk word alignment
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_g711_tables_anchors_and_symmetry():
    """The G.711 LUTs hit the published anchor values (µ-law 0x00 →
    -32124, 0xFF/0x7F → ±0; A-law 0xD5/0x55 → ±8) and satisfy the
    codec's structural properties: sign antisymmetry under the sign-bit
    flip and strictly monotone magnitude within each sign half."""
    u = mm._g711_ulaw_table()
    assert u[0x00] == -32124 and u[0x80] == 32124
    assert u[0xFF] == 0 and u[0x7F] == 0
    a = mm._g711_alaw_table()
    assert a[0xD5] == 8 and a[0x55] == -8
    codes = np.arange(256)
    assert (u[codes] == -u[codes ^ 0x80]).all()
    assert (a[codes] == -a[codes ^ 0x80]).all()
    # µ-law: 0x00..0x7F decode to increasing (toward 0) negatives.
    assert (np.diff(u[:128].astype(np.int32)) > 0).all()
    assert (np.diff(u[128:].astype(np.int32)) < 0).all()


def _ms_adpcm_encode_mono(samples, block_align, pred_idx=4):
    """Standard MS-ADPCM mono encoder (test-side): returns the encoded
    block bytes AND the encoder's internal reconstruction trace — the
    decoder must reproduce that trace EXACTLY (same contract as IMA)."""
    coef1 = (256, 512, 0, 192, 240, 460, 392)[pred_idx]
    coef2 = (0, -256, 0, 64, 0, -208, -232)[pred_idx]
    adapt = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)
    spb = 2 + (block_align - 7) * 2
    data = bytearray()
    recon = []
    for start in range(0, len(samples) - spb + 1, spb):
        chunk = samples[start : start + spb]
        s2, s1 = int(chunk[0]), int(chunk[1])
        delta = max(16, int(np.abs(np.diff(chunk.astype(np.int32))).mean())
                    // 4)
        data += bytes([pred_idx])
        data += delta.to_bytes(2, "little", signed=True)
        data += s1.to_bytes(2, "little", signed=True)
        data += s2.to_bytes(2, "little", signed=True)
        recon += [s2, s1]
        nibbles = []
        for s in chunk[2:]:
            predictor = (s1 * coef1 + s2 * coef2) >> 8
            n = max(-8, min(7, int((int(s) - predictor) / delta)))
            nib = n & 0x0F
            rec = max(-32768, min(32767, predictor + n * delta))
            s2, s1 = s1, rec
            delta = max(16, (adapt[nib] * delta) >> 8)
            recon.append(rec)
            nibbles.append(nib)
        for hi, lo in zip(nibbles[::2], nibbles[1::2]):
            data.append((hi << 4) | lo)  # HIGH nibble first
    return bytes(data), np.array(recon, dtype=np.int16)


def test_ms_adpcm_decode_matches_encoder_reconstruction():
    """Encode a sine sweep with the standard MS-ADPCM algorithm (every
    predictor pair exercised); the module decoder must reproduce the
    encoder's reconstruction trace exactly, and the lossy output must
    still track the original signal."""
    t = np.arange(2000, dtype=np.float64)
    sig = (9000 * np.sin(2 * np.pi * t / 80)
           + 2000 * np.sin(2 * np.pi * t / 7)).astype(np.int16)
    block_align = 70  # 7-byte header + 63 nibble bytes -> 128 samples/block
    for pred_idx in range(7):
        data, recon = _ms_adpcm_encode_mono(sig, block_align, pred_idx)
        got = mm._decode_ms_adpcm_mono(data, block_align)
        assert (got == recon).all(), pred_idx
        assert len(got) == 128 * (len(sig) // 128)
    # with the default filter the lossy output tracks the waveform
    data, recon = _ms_adpcm_encode_mono(sig, block_align)
    got = mm._decode_ms_adpcm_mono(data, block_align).astype(np.int32)
    n = len(got)
    assert float(np.abs(got - sig[:n]).mean()) < 800
    with pytest.raises(ValueError, match="predictor index"):
        bad = bytearray(data)
        bad[0] = 7
        mm._decode_ms_adpcm_mono(bytes(bad), block_align)


def _ima_encode_mono(samples, block_align):
    """Standard IMA ADPCM mono encoder (test-side): returns the encoded
    block bytes AND the encoder's internal reconstruction trace — by the
    codec's design the decoder must reproduce that trace EXACTLY."""
    step_table = mm._IMA_STEP_TABLE
    index_table = mm._IMA_INDEX_TABLE
    spb = (block_align - 4) * 2 + 1
    data = bytearray()
    recon = []
    idx = 0
    for start in range(0, len(samples) - spb + 1, spb):
        chunk = samples[start : start + spb]
        pred = int(chunk[0])
        data += int(pred).to_bytes(2, "little", signed=True)
        data += bytes([idx, 0])
        recon.append(pred)
        nibbles = []
        for s in chunk[1:]:
            step = int(step_table[idx])
            delta = int(s) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            mask, temp = 4, step
            for _ in range(3):
                if delta >= temp:
                    n |= mask
                    delta -= temp
                temp >>= 1
                mask >>= 1
            d = step >> 3
            if n & 1:
                d += step >> 2
            if n & 2:
                d += step >> 1
            if n & 4:
                d += step
            pred = pred - d if n & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(index_table[n & 7])))
            recon.append(pred)
            nibbles.append(n)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            data.append(lo | (hi << 4))
    return bytes(data), np.array(recon, dtype=np.int16)


def test_ima_adpcm_decode_matches_encoder_reconstruction():
    """Encode a sine sweep with the standard IMA algorithm; the module
    decoder must reproduce the encoder's reconstruction trace exactly
    (that equality IS the codec contract), and the lossy output must
    still track the original signal."""
    t = np.arange(1025, dtype=np.float64)
    sig = (8000 * np.sin(2 * np.pi * t / 64)).astype(np.int16)
    block_align = 132  # 4-byte header + 128 nibble bytes → 257 samples/block
    data, recon = _ima_encode_mono(sig, block_align)
    got = mm._decode_ima_adpcm_mono(data, block_align)
    assert (got == recon).all()
    n = len(got)
    assert n == 257 * 3  # three full blocks; the ragged tail is dropped
    assert float(np.abs(got.astype(np.int32) - sig[:n])
                 .mean()) < 500  # tracks the waveform
    with pytest.raises(ValueError, match="step index"):
        bad = bytearray(data)
        bad[2] = 99
        mm._decode_ima_adpcm_mono(bytes(bad), block_align)


def test_compressed_wav_through_pipeline(spark):
    """REAL compressed audio bytes (G.711 µ-law, IMA and MS ADPCM WAV,
    and stereo mid/side FLAC) through audio_features: sample counts,
    container rate, and RMS all match a hand decode."""
    codes = bytes(range(256)) * 4
    ulaw_payload = _wav_bytes_fmt(codes, 8_000, fmt_tag=7, bits=8,
                                  block_align=1)
    expected_u = mm._g711_ulaw_table()[np.frombuffer(codes, np.uint8)]
    sig = (5000 * np.sin(np.arange(513) / 9.0)).astype(np.int16)
    adpcm_data, recon = _ima_encode_mono(sig, 132)
    adpcm_payload = _wav_bytes_fmt(adpcm_data, 16_000, fmt_tag=0x11,
                                   bits=4, block_align=132)
    ms_data, ms_recon = _ms_adpcm_encode_mono(sig, 70)
    ms_payload = _wav_bytes_fmt(ms_data, 22_050, fmt_tag=2,
                                bits=4, block_align=70)
    from tests.test_flaccodec import _encode_flac

    left = sig
    right = np.roll(sig, 13)
    flac_payload = _encode_flac([left, right], rate=16_000, blocksize=256,
                                ca=10, order=2)
    flac_mono = (np.stack([left, right], axis=1).astype(np.int64)
                 .mean(axis=1).astype(np.int16))
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(ulaw_payload), (0, 0, 44_100, 0)),
            (2, "audio", bytearray(adpcm_payload), (0, 0, 44_100, 0)),
            (3, "audio", bytearray(ms_payload), (0, 0, 44_100, 0)),
            (4, "audio", bytearray(flac_payload), (0, 0, 44_100, 0)),
        ],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = {r.media_id: r for r in mm.audio_features(df).collect()}
    assert rows[1].n_samples == 1024
    assert rows[1].duration_s == pytest.approx(1024 / 8_000)
    assert rows[1].rms == pytest.approx(
        float(np.sqrt(np.mean(expected_u.astype(np.float64) ** 2)))
    )
    assert rows[2].n_samples == len(recon)
    assert rows[2].duration_s == pytest.approx(len(recon) / 16_000)
    assert rows[2].rms == pytest.approx(
        float(np.sqrt(np.mean(recon.astype(np.float64) ** 2)))
    )
    assert rows[3].n_samples == len(ms_recon)
    assert rows[3].duration_s == pytest.approx(len(ms_recon) / 22_050)
    assert rows[3].rms == pytest.approx(
        float(np.sqrt(np.mean(ms_recon.astype(np.float64) ** 2)))
    )
    assert rows[4].n_samples == len(flac_mono)
    assert rows[4].duration_s == pytest.approx(len(flac_mono) / 16_000)
    assert rows[4].rms == pytest.approx(
        float(np.sqrt(np.mean(flac_mono.astype(np.float64) ** 2)))
    )


def _bmp_bytes(img_rgb=None, img_idx=None, palette=None, top_down=False,
               bpp=24):
    """Encode a BMP (BITMAPINFOHEADER, BI_RGB): 24/32-bit BGR rows or
    8-bit palette, 4-byte-aligned, bottom-up unless top_down."""
    if img_rgb is not None:
        h, w = img_rgb.shape[:2]
        step = bpp // 8
        row_raw = np.zeros((h, w, step), np.uint8)
        row_raw[:, :, :3] = img_rgb[:, :, ::-1]  # RGB -> BGR
        rows = row_raw.reshape(h, -1)
        n_colors = 0
        pal_bytes = b""
    else:
        h, w = img_idx.shape
        bpp, step = 8, 1
        rows = img_idx
        n_colors = len(palette)
        pal = np.zeros((n_colors, 4), np.uint8)
        pal[:, :3] = palette[:, ::-1]  # stored BGRA
        pal_bytes = pal.tobytes()
    stride = (w * step + 3) & ~3
    raster = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        raster += bytes(rows[y]) + b"\x00" * (stride - w * step)
    data_off = 14 + 40 + len(pal_bytes)
    info = (40).to_bytes(4, "little") \
        + w.to_bytes(4, "little") \
        + (h if not top_down else -h).to_bytes(4, "little", signed=True) \
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little") \
        + bytes(8) + bytes(8) \
        + n_colors.to_bytes(4, "little") + bytes(4)
    total = data_off + len(raster)
    head = b"BM" + total.to_bytes(4, "little") + bytes(4) \
        + data_off.to_bytes(4, "little")
    return head + info + pal_bytes + bytes(raster)


@pytest.mark.parametrize("top_down,bpp", [(False, 24), (True, 24),
                                          (False, 32)])
def test_bmp_truecolor_exact(top_down, bpp):
    rng = np.random.default_rng(bpp + top_down)
    rgb = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
    payload = _bmp_bytes(img_rgb=rgb, top_down=top_down, bpp=bpp)
    assert (mm._decode_bmp(payload) == mm._png_luma(rgb)).all()
    # the dispatcher routes it too (magic + known DIB header size)
    assert (mm._decode_image(payload, 0, 0) == mm._png_luma(rgb)).all()


def test_bmp_palette_and_corruption():
    rng = np.random.default_rng(51)
    idx = rng.integers(0, 16, (6, 9)).astype(np.uint8)
    palette = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    payload = _bmp_bytes(img_idx=idx, palette=palette)
    assert (mm._decode_bmp(payload) == mm._png_luma(palette[idx])).all()
    with pytest.raises(ValueError, match="not a BMP"):
        mm._decode_bmp(b"BX" + payload[2:])
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        mm._decode_bmp(payload[:-3])
    rle = bytearray(payload)
    rle[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        mm._decode_bmp(bytes(rle))


def _qoi_bytes(rgb):
    """Test-side QOI encoder covering every op: RUN for repeats, INDEX
    on hash hits, DIFF/LUMA for small deltas, RGB literals otherwise."""
    h, w = rgb.shape[:2]
    out = bytearray(b"qoif" + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                    + bytes([3, 0]))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    px = [tuple(int(v) for v in p) + (255,) for p in rgb.reshape(-1, 3)]
    i = 0
    while i < len(px):
        cur = px[i]
        if cur == prev:
            run = 1
            while i + run < len(px) and px[i + run] == cur and run < 62:
                run += 1
            out.append(0xC0 | (run - 1))
            i += run
            continue
        slot = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[slot] == cur:
            out.append(slot)
        else:
            dr = (cur[0] - prev[0]) & 0xFF
            dg = (cur[1] - prev[1]) & 0xFF
            db = (cur[2] - prev[2]) & 0xFF
            sdr = dr - 256 if dr > 127 else dr
            sdg = dg - 256 if dg > 127 else dg
            sdb = db - 256 if db > 127 else db
            if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2)
                           | (sdb + 2))
            elif (-32 <= sdg <= 31 and -8 <= sdr - sdg <= 7
                  and -8 <= sdb - sdg <= 7):
                out.append(0x80 | (sdg + 32))
                out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
            else:
                out += bytes([0xFE, cur[0], cur[1], cur[2]])
            index[slot] = cur
        prev = cur
        i += 1
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def test_qoi_roundtrip_all_ops():
    """Smooth gradients (DIFF/LUMA), flat areas (RUN), repeated colors
    (INDEX) and noise (RGB literals) all decode exactly."""
    rng = np.random.default_rng(73)
    smooth = np.zeros((9, 40, 3), np.uint8)
    smooth[:, :, 0] = np.arange(40)[None, :] % 256
    smooth[:, :, 1] = (np.arange(40)[None, :] * 2) % 256
    smooth[:, :, 2] = np.add.outer(np.arange(9) * 3, np.arange(40)) % 256
    for img in (
        smooth,
        np.zeros((5, 7, 3), np.uint8),
        rng.integers(0, 256, (13, 11, 3)).astype(np.uint8),
        np.tile(rng.integers(0, 256, (1, 4, 3)), (6, 3, 1)).astype(
            np.uint8
        ),
    ):
        payload = _qoi_bytes(img)
        got = mm._decode_qoi(payload)
        assert (got == mm._png_luma(img)).all()
        assert (mm._decode_image(payload, 0, 0) == mm._png_luma(img)).all()
    with pytest.raises(ValueError, match="not a QOI"):
        mm._decode_qoi(b"qoix" + b"\x00" * 30)
    good = _qoi_bytes(smooth)
    with pytest.raises(ValueError, match="truncated QOI|missing QOI"):
        mm._decode_qoi(good[:-9])


def _tga_rle(raster_bytes, px_bytes):
    """TGA RLE: repeat runs become run packets, the rest literals."""
    pixels = [raster_bytes[i : i + px_bytes]
              for i in range(0, len(raster_bytes), px_bytes)]
    out = bytearray()
    i = 0
    while i < len(pixels):
        run = 1
        while (i + run < len(pixels) and run < 128
               and pixels[i + run] == pixels[i]):
            run += 1
        if run >= 2:
            out += bytes([0x80 | (run - 1)]) + pixels[i]
            i += run
            continue
        lit_start = i
        while (i < len(pixels) and i - lit_start < 128
               and not (i + 1 < len(pixels) and pixels[i + 1] == pixels[i])):
            i += 1
        chunk = pixels[lit_start:i]
        out += bytes([len(chunk) - 1]) + b"".join(chunk)
    return bytes(out)


def _tga_bytes(img=None, palette=None, idx=None, depth=24, rle=False,
               top_down=False, gray=False):
    """TGA 2.0 writer: gray-8 / palette-8 / truecolor 16(555)/24/32,
    optional RLE, both origins, with the v2 footer the dispatcher keys
    on."""
    if gray:
        h, w = img.shape
        base_type, px_bytes = 3, 1
        raster = img.tobytes()
        cmap = b""
        cmap_hdr = (0, 0, 0, 0)
    elif idx is not None:
        h, w = idx.shape
        base_type, px_bytes = 1, 1
        raster = idx.tobytes()
        bgr = palette[:, ::-1].astype(np.uint8)
        cmap = bgr.tobytes()
        cmap_hdr = (1, 0, len(palette), 24)
    else:
        h, w = img.shape[:2]
        base_type = 2
        cmap = b""
        cmap_hdr = (0, 0, 0, 0)
        if depth == 16:
            px_bytes = 2
            five = (img.astype(np.uint16) * 31 + 127) // 255
            v = (five[:, :, 0] << 10) | (five[:, :, 1] << 5) | five[:, :, 2]
            raster = v.astype("<u2").tobytes()
        else:
            px_bytes = depth // 8
            bgra = np.zeros((h, w, px_bytes), np.uint8)
            bgra[:, :, :3] = img[:, :, ::-1]
            raster = bgra.tobytes()
    rows = np.frombuffer(raster, np.uint8).reshape(h, w * px_bytes)
    if not top_down:
        rows = rows[::-1]
    body = rows.tobytes()
    if rle:
        body = _tga_rle(body, px_bytes)
    head = bytes([0, cmap_hdr[0], base_type | (8 if rle else 0)])
    head += cmap_hdr[1].to_bytes(2, "little")
    head += cmap_hdr[2].to_bytes(2, "little")
    head += bytes([cmap_hdr[3]])
    head += bytes(4)  # x/y origin
    head += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([depth if base_type == 2 else 8,
                   0x20 if top_down else 0])
    footer = bytes(8) + b"TRUEVISION-XFILE.\x00"
    return head + cmap + body + footer


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [False, True])
def test_tga_truecolor_gray_palette(rle, top_down):
    rng = np.random.default_rng(rle * 2 + top_down)
    rgb = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    for depth in (24, 32):
        payload = _tga_bytes(img=rgb, depth=depth, rle=rle,
                             top_down=top_down)
        got = mm._decode_tga(payload)
        assert (got == mm._png_luma(rgb)).all()
        assert (mm._decode_image(payload, 0, 0) == got).all()
    gray = rng.integers(0, 256, (6, 11)).astype(np.uint8)
    payload = _tga_bytes(img=gray, gray=True, rle=rle, top_down=top_down)
    assert (mm._decode_tga(payload) == gray).all()
    idx = rng.integers(0, 16, (5, 8)).astype(np.uint8)
    palette = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    payload = _tga_bytes(idx=idx, palette=palette, rle=rle,
                         top_down=top_down)
    assert (mm._decode_tga(payload) == mm._png_luma(palette[idx])).all()


def test_tga_16bit_and_corruption():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (5, 6, 3)).astype(np.uint8)
    payload = _tga_bytes(img=rgb, depth=16, rle=True)
    five = (rgb.astype(np.uint16) * 31 + 127) // 255
    expected = mm._png_luma(
        np.round(five * (255.0 / 31.0)).astype(np.uint8))
    assert (mm._decode_tga(payload) == expected).all()
    with pytest.raises(ValueError, match="not a TGA"):
        mm._decode_tga(payload[:-18] + b"X" * 18)
    with pytest.raises(ValueError, match="truncated TGA"):
        bad = payload[:20] + payload[-26:]
        mm._decode_tga(bad)


def test_pam_decode():
    """P7 PAM: gray, gray+alpha, RGB and RGBA rasters with a commented
    header."""
    rng = np.random.default_rng(9)
    for pam_depth, tupl in [(1, "GRAYSCALE"), (2, "GRAYSCALE_ALPHA"),
                            (3, "RGB"), (4, "RGB_ALPHA")]:
        px = rng.integers(0, 256, (4, 5, pam_depth)).astype(np.uint8)
        head = (f"P7\n# made by tests\nWIDTH 5\nHEIGHT 4\n"
                f"DEPTH {pam_depth}\nMAXVAL 255\nTUPLTYPE {tupl}\n"
                f"ENDHDR\n").encode()
        payload = head + px.tobytes()
        got = mm._decode_pam(payload)
        if pam_depth <= 2:
            assert (got == px[:, :, 0]).all()
        else:
            assert (got == mm._png_luma(px[:, :, :3])).all()
        assert (mm._decode_image(payload, 0, 0) == got).all()
    with pytest.raises(ValueError, match="not a PAM"):
        mm._decode_pam(b"P8\nENDHDR\n")
    with pytest.raises(ValueError, match="truncated PAM raster"):
        mm._decode_pam(head + px.tobytes()[:-3])


def _ico_bytes(entries):
    """ICO container: entries are (w, h, image_bytes) — image bytes a
    PNG stream or a headerless DIB."""
    out = bytearray(b"\x00\x00\x01\x00")
    out += len(entries).to_bytes(2, "little")
    off = 6 + 16 * len(entries)
    for w, h, data in entries:
        out += bytes([w % 256, h % 256, 0, 0])
        out += (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        out += len(data).to_bytes(4, "little")
        out += off.to_bytes(4, "little")
        off += len(data)
    for _, _, data in entries:
        out += data
    return bytes(out)


def test_ico_png_and_dib_entries():
    """ICO picks the largest entry; PNG payloads route through the PNG
    decoder, DIB payloads (doubled height + AND mask) through the BMP
    path."""
    rng = np.random.default_rng(77)
    big = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    small = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    png_big = _png_bytes(big, color_type=2)
    png_small = _png_bytes(small, color_type=2)
    payload = _ico_bytes([(8, 8, png_small), (24, 24, png_big)])
    assert (mm._decode_ico(payload) == mm._png_luma(big)).all()
    assert (mm._decode_image(payload, 0, 0) == mm._png_luma(big)).all()

    # DIB entry: strip the 14-byte BMP file header, double the height,
    # append the 1-bit AND mask rows (ignored by the decoder)
    bmp = _bmp_bytes(img_rgb=small, bpp=32)
    dib = bytearray(bmp[14:])
    dib[8:12] = (16).to_bytes(4, "little")  # 2 * actual height 8
    mask_stride = ((8 + 31) // 32) * 4
    dib += b"\x00" * (mask_stride * 8)
    payload = _ico_bytes([(8, 8, bytes(dib))])
    assert (mm._decode_ico(payload) == mm._png_luma(small)).all()

    with pytest.raises(ValueError, match="not an ICO"):
        mm._decode_ico(b"\x00\x00\x02\x00" + payload[4:])
    with pytest.raises(ValueError, match="truncated ICO image"):
        mm._decode_ico(payload[:-9])


def _aiff_bytes(samples, rate, n_channels=1):
    """FORM/AIFF with a COMM (80-bit-float rate) and SSND chunk."""
    frames = len(samples) // n_channels
    # 80-bit extended: value = mant * 2^(exp-16383-63); put rate in the
    # high mantissa bit position
    exp = 16383 + rate.bit_length() - 1
    mant = rate << (64 - rate.bit_length())
    comm = (n_channels.to_bytes(2, "big") + frames.to_bytes(4, "big")
            + (16).to_bytes(2, "big")
            + exp.to_bytes(2, "big") + mant.to_bytes(8, "big"))
    ssnd = bytes(8) + samples.astype(">i2").tobytes()
    body = b"COMM" + len(comm).to_bytes(4, "big") + comm
    body += b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
    if len(ssnd) % 2:
        body += b"\x00"
    return b"FORM" + (len(body) + 4).to_bytes(4, "big") + b"AIFF" + body


def test_aiff_decode_and_downmix():
    sig = (4000 * np.sin(np.arange(300) / 7.0)).astype(np.int16)
    got, rate = mm._decode_aiff(_aiff_bytes(sig, 22_050))
    assert rate == 22_050
    assert (got == sig).all()
    stereo = np.empty(600, dtype=np.int16)
    stereo[0::2] = sig
    stereo[1::2] = np.roll(sig, 5)
    got, rate = mm._decode_aiff(_aiff_bytes(stereo, 44_100, n_channels=2))
    assert rate == 44_100
    expected = (stereo.reshape(-1, 2).astype(np.float64).mean(axis=1)
                .astype(np.int16))
    assert (got == expected).all()
    with pytest.raises(ValueError, match="not an AIFF"):
        mm._decode_aiff(b"FORM\x00\x00\x00\x04WAVE")


def _au_bytes(data, encoding, rate, annotation=b""):
    hdr = 24 + len(annotation)
    return (b".snd" + hdr.to_bytes(4, "big")
            + len(data).to_bytes(4, "big") + encoding.to_bytes(4, "big")
            + rate.to_bytes(4, "big") + (1).to_bytes(4, "big")
            + annotation + data)


def test_au_decode_all_encodings():
    codes = bytes(range(256))
    got, rate = mm._decode_au(_au_bytes(codes, 1, 8000))
    assert rate == 8000
    assert (got == mm._g711_ulaw_table()[np.frombuffer(codes, np.uint8)]
            ).all()
    s8 = np.arange(-128, 128, dtype=np.int8)
    got, _ = mm._decode_au(_au_bytes(s8.tobytes(), 2, 16_000))
    assert (got == s8.astype(np.int16) * 256).all()
    s16 = (3000 * np.sin(np.arange(100) / 5.0)).astype(np.int16)
    got, _ = mm._decode_au(_au_bytes(s16.astype(">i2").tobytes(), 3,
                                     44_100, annotation=b"note\x00\x00"))
    assert (got == s16).all()
    with pytest.raises(ValueError, match="unsupported AU encoding"):
        mm._decode_au(_au_bytes(b"\x00" * 8, 27, 8000))
    with pytest.raises(ValueError, match="not an AU"):
        mm._decode_au(b".wav" + b"\x00" * 30)


def _avi_bytes(frames, with_rec=False):
    """Wrap frame payloads as a RIFF/AVI: a minimal hdrl LIST (skipped
    by the demuxer), then the movi LIST with 00dc chunks — optionally
    grouped inside a 'rec ' LIST, with odd sizes word-aligned."""
    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = chunk(b"avih", bytes(56))
    movi = b""
    for f in frames:
        c = chunk(b"00dc", f)
        movi += lst(b"rec ", c) if with_rec else c
    body = lst(b"hdrl", avih) + lst(b"movi", movi)
    return b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body


def test_real_tiff_through_pipeline(spark):
    """REAL TIFF bytes (LZW strips) through image_features: header
    dimensions win and features match a hand decode."""
    from tests.test_tiffcodec import _tiff_bytes

    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (19, 14)).astype(np.uint8)
    payload = _tiff_bytes(img, compression=5, rows_per_strip=7)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (99, 99, 16000, 4))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.image_features(df).collect()[0]
    assert (r.width, r.height) == (14, 19)
    assert r.mean_luma == pytest.approx(float(img.mean()))
    assert r.max_luma == int(img.max())


def test_real_mjpeg_avi_through_pipeline(spark):
    """REAL video bytes: a Motion-JPEG AVI demuxes into its frame
    chunks through sample_frames, and each sampled frame decodes with
    the real JPEG decoder to the encoder's exact reconstruction."""
    from tests.test_jpegcodec import encode_jpeg

    rng = np.random.default_rng(41)
    jpegs, expected = [], []
    for _ in range(5):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        payload, exp = encode_jpeg(img)
        jpegs.append(payload)
        expected.append(exp)
    avi = _avi_bytes(jpegs)
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi), (16, 16, 0, 99))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = sorted(mm.sample_frames(df, every_n=2).collect(),
                  key=lambda r: r.frame_idx)
    # 5 real frames sampled every 2 -> indices 0, 2, 4 (meta n_frames=99
    # is ignored: the container's real frame count wins)
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        assert bytes(r.frame_payload) == jpegs[r.frame_idx]
        got = mm.decode_jpeg_luma(bytes(r.frame_payload))
        assert (got == expected[r.frame_idx]).all()


def test_video_frame_features(spark):
    """Per-frame features over a mixed batch: MJPEG-AVI frames decode
    through the JPEG path, animated-GIF frames through the PGM
    composites — every sampled frame's stats match a hand computation,
    and the two-stage plan stays shuffle-free."""
    from tests.test_jpegcodec import encode_jpeg

    rng = np.random.default_rng(97)
    jpegs, planes = [], []
    for _ in range(4):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        payload, exp = encode_jpeg(img)
        jpegs.append(payload)
        planes.append(exp)
    avi = _avi_bytes(jpegs)
    gpal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    gframes = [{"raster": rng.integers(0, 8, (6, 9)).astype(np.uint8)}
               for _ in range(3)]
    gif = _gif_anim_bytes((9, 6), 0, gpal, gframes, mcs=3)
    gif_planes = _gif_composite_ref((9, 6), 0, gpal, gframes)
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi), (16, 16, 0, 9)),
         (2, "video", bytearray(gif), (9, 6, 0, 9))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    out = mm.video_frame_features(df, every_n=2)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {(r.media_id, r.frame_idx): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 2)}
    for (mid, idx), r in rows.items():
        plane = planes[idx] if mid == 1 else gif_planes[idx]
        assert (r.width, r.height) == (plane.shape[1], plane.shape[0])
        assert r.mean_luma == pytest.approx(float(plane.mean()))
        assert r.max_luma == int(plane.max())
        med = float(np.median(plane))
        bits = (plane.mean(axis=0)[:16] > med).astype(int)
        assert r.phash == "".join(map(str, bits))


def test_avi_demux_rec_groups_and_corruption():
    frames = [b"\xff\xd8\xff" + bytes([i]) * 7 for i in range(4)]
    grouped = mm._avi_video_frames(_avi_bytes(frames, with_rec=True))
    assert grouped == frames
    # odd-size frames exercise word alignment
    odd = [b"\xff\xd8\xff" + bytes([i]) * 4 for i in range(3)]
    assert mm._avi_video_frames(_avi_bytes(odd)) == odd
    with pytest.raises(ValueError, match="not an AVI"):
        mm._avi_video_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="no video frame"):
        mm._avi_video_frames(_avi_bytes([])[:])
    with pytest.raises(ValueError, match="truncated AVI"):
        good = _avi_bytes(frames)
        mm._avi_video_frames(good[:-5])


def test_real_wav_through_pipeline(spark):
    """REAL audio bytes (RIFF/WAV PCM16) through audio_features: the
    sample rate comes from the container and RMS matches the known
    samples exactly."""
    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype=np.int16)
    payload = _wav_bytes(samples, sr=8_000)
    df = spark.createDataFrame(
        [(7, "audio", bytearray(payload), (0, 0, 16_000, 0))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = mm.audio_features(df).collect()[0]
    assert r.n_samples == 6
    assert r.duration_s == pytest.approx(6 / 8_000)  # container rate wins
    assert r.rms == pytest.approx(
        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    )


def test_media_ingestion_from_real_files(spark, tmp_path):
    """End-to-end media pipeline over REAL files on disk: PPM files →
    binaryFile source → media frame → image feature extraction."""
    media_dir = tmp_path / "imgs"
    media_dir.mkdir()
    planes = {}
    for i, shade in enumerate((0, 120, 255)):
        rgb = np.full((2, 2, 3), shade, dtype=np.uint8)
        (media_dir / f"img{i}.ppm").write_bytes(_ppm_bytes(rgb))
        planes[shade] = mm._decode_pnm(_ppm_bytes(rgb))
    df = mm.media_from_files(spark, str(media_dir), glob="*.ppm")
    feats = mm.image_features(df).collect()
    assert len(feats) == 3
    assert len({r.media_id for r in feats}) == 3  # distinct, deterministic
    assert {r.max_luma for r in feats} == {
        int(p.max()) for p in planes.values()
    }
    assert all((r.width, r.height) == (2, 2) for r in feats)


def test_media_ingestion_mixed_formats(spark, tmp_path):
    """Mixed-format media directory → binaryFile source → features:
    the SAME raster stored as PNG, GIF, TIFF, BMP and QOI yields one
    identical feature vector five times (every real decoder agrees)."""
    from tests.test_tiffcodec import _tiff_bytes

    rng = np.random.default_rng(101)
    rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (8, 8)).astype(np.uint8)
    gif_pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    gif_rgb_luma = mm._png_luma(gif_pal[idx])
    media_dir = tmp_path / "mixed"
    media_dir.mkdir()
    (media_dir / "a.png").write_bytes(_png_bytes(rgb, color_type=2))
    (media_dir / "b.gif").write_bytes(_gif_bytes(idx, gif_pal, mcs=4))
    (media_dir / "c.tiff").write_bytes(_tiff_bytes(rgb, compression=5))
    (media_dir / "d.bmp").write_bytes(_bmp_bytes(img_rgb=rgb))
    (media_dir / "e.qoi").write_bytes(_qoi_bytes(rgb))
    df = mm.media_from_files(spark, str(media_dir), glob="*")
    feats = mm.image_features(df).collect()
    assert len(feats) == 5
    rgb_luma = mm._png_luma(rgb)
    expected_means = {
        float(rgb_luma.mean()),  # png/tiff/bmp/qoi agree
        float(gif_rgb_luma.mean()),
    }
    assert {r.mean_luma for r in feats} == expected_means
    # the four containers of the same raster share one phash
    from collections import Counter

    assert sorted(Counter(r.phash for r in feats).values()) in (
        [1, 4], [5],  # [5] iff the gif raster hashes identically (rare)
    )


def test_image_dedup_groups_real_duplicates(spark):
    """Two byte-identical PPMs plus one distinct image: the dedup grouping
    must put the duplicates in one phash group (keeper = min media_id,
    n_dupes = 1) and the distinct image in another."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
    img_b = 255 - img_a  # structurally different profile
    rows = [
        (1, "image", bytearray(_ppm_bytes(img_a)), (0, 0, 16000, 1)),
        (2, "image", bytearray(_ppm_bytes(img_a)), (0, 0, 16000, 1)),  # dup of 1
        (3, "image", bytearray(_ppm_bytes(img_b)), (0, 0, 16000, 1)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["phash"]: r
        for r in mm.image_dedup_groups(media).collect()
    }
    assert len(out) == 2, "identical images must share a phash group"
    groups = sorted(out.values(), key=lambda r: r["n_images"], reverse=True)
    assert groups[0]["n_images"] == 2
    assert groups[0]["keeper_id"] == 1
    assert groups[0]["n_dupes"] == 1
    assert groups[1]["n_images"] == 1
    assert groups[1]["n_dupes"] == 0


def test_png_zero_dimension_rejected_and_inflate_bounded():
    """A height=0 PNG must be rejected at the header — and because
    zlib's max_length=0 means UNLIMITED, the bounded-inflate helper
    independently refuses expect<=0 (defense in depth: a deflate bomb
    behind a zero-area header can't allocate)."""
    import zlib

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _png_bytes(rgb, color_type=2)
    sig = 8
    ihdr = bytearray(good[sig + 8 : sig + 8 + 13])
    ihdr[4:8] = (0).to_bytes(4, "big")  # height = 0
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    bad = (good[:sig + 8] + bytes(ihdr) + crc.to_bytes(4, "big")
           + good[sig + 8 + 13 + 4:])
    with pytest.raises(ValueError, match="dimensions must be positive"):
        mm._decode_png(bad)
    with pytest.raises(ValueError):
        mm._inflate_exact(zlib.compress(b"x" * 50_000), 0)
