"""Property-based codec roundtrips (hypothesis): the lossless decoders
must invert their test-side encoders for ANY input, not just the seeded
fixtures — shrinking surfaces the boundary bugs (1x1 images, all-equal
rasters, extreme samples, odd strip/block geometries) that fixed seeds
never draw. Pure numpy, no Spark session, so examples are cheap."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from culvert_spark import flaccodec as fc
from culvert_spark import multimodal as mm
from culvert_spark import tiffcodec as tc
from tests.test_flaccodec import _encode_flac
from tests.test_multimodal import _gif_bytes, _qoi_bytes
from tests.test_tiffcodec import _tiff_bytes

_MANY = settings(max_examples=30, deadline=None)

_dims = st.tuples(st.integers(1, 20), st.integers(1, 20))


@_MANY
@given(img=hnp.arrays(np.uint8, _dims), mcs=st.integers(2, 8))
def test_gif_lzw_roundtrip_any_raster(img, mcs):
    levels = 1 << mcs
    raster = (img % levels).astype(np.uint8)
    palette = np.stack(
        [np.arange(levels) % 256, (np.arange(levels) * 7) % 256,
         (np.arange(levels) * 13) % 256], axis=1
    ).astype(np.uint8)
    payload = _gif_bytes(raster, palette, mcs=mcs)
    assert (mm._decode_gif(payload) == mm._png_luma(palette[raster])).all()


@_MANY
@given(rgb=hnp.arrays(np.uint8, st.tuples(st.integers(1, 16),
                                          st.integers(1, 16),
                                          st.just(3))))
def test_qoi_roundtrip_any_pixels(rgb):
    payload = _qoi_bytes(rgb)
    assert (mm._decode_qoi(payload) == mm._png_luma(rgb)).all()


@_MANY
@given(sig=hnp.arrays(np.int16, st.integers(1, 300)),
       blocksize=st.integers(1, 96),
       order=st.integers(0, 4))
def test_flac_fixed_roundtrip_any_signal(sig, blocksize, order):
    payload = _encode_flac([sig], blocksize=blocksize, order=order)
    got, rate, bps = fc.decode_flac(payload)
    assert (rate, bps) == (16_000, 16)
    assert (got[:, 0] == sig).all()


@_MANY
@given(data=st.data())
def test_flac_lpc_roundtrip_any_signal(data):
    """LPC subframes with ARBITRARY quantized coefficients and shifts —
    even unstable filters roundtrip exactly, because the residual is
    whatever makes the integer recurrence land on the true samples."""
    order = data.draw(st.integers(1, 3))
    blocksize = data.draw(st.integers(order + 1, 64))
    n = blocksize * data.draw(st.integers(1, 4))
    sig = data.draw(hnp.arrays(np.int16, n))
    coefs = data.draw(st.lists(st.integers(-512, 511), min_size=order,
                               max_size=order))
    shift = data.draw(st.integers(0, 12))
    payload = _encode_flac([sig], blocksize=blocksize, mode="lpc",
                           order=order, lpc=(coefs, 12, shift))
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == sig).all()


@_MANY
@given(left=hnp.arrays(np.int16, st.integers(1, 200)),
       shift=st.integers(0, 50),
       ca=st.sampled_from([None, 8, 9, 10]))
def test_flac_stereo_roundtrip_any_signal(left, shift, ca):
    right = np.roll(left, shift)
    payload = _encode_flac([left, right], blocksize=64, ca=ca, order=1)
    got, _, _ = fc.decode_flac(payload)
    assert (got[:, 0] == left).all()
    assert (got[:, 1] == right).all()


@_MANY
@given(data=st.data())
def test_gif_animation_matches_reference(data):
    """Random frame stacks (placement, transparency, every disposal
    mode) through the vectorized compositor must match the independent
    per-pixel reference frame by frame."""
    from tests.test_multimodal import _gif_anim_bytes, _gif_composite_ref

    w = data.draw(st.integers(4, 14))
    h = data.draw(st.integers(4, 14))
    gpal = np.stack([np.arange(8) * 31 % 256, np.arange(8) * 17 % 256,
                     np.arange(8) * 53 % 256], axis=1).astype(np.uint8)
    bg = data.draw(st.integers(0, 7))
    frames = []
    for _ in range(data.draw(st.integers(1, 4))):
        fw = data.draw(st.integers(1, w))
        fh = data.draw(st.integers(1, h))
        frames.append({
            "raster": data.draw(hnp.arrays(np.uint8, (fh, fw),
                                           elements=st.integers(0, 7))),
            "left": data.draw(st.integers(0, w - fw)),
            "top": data.draw(st.integers(0, h - fh)),
            "disposal": data.draw(st.integers(0, 3)),
            "transparent": data.draw(
                st.one_of(st.none(), st.integers(0, 7))),
        })
    payload = _gif_anim_bytes((w, h), bg, gpal, frames, mcs=3)
    got = mm._gif_frames_luma(payload)
    expected = _gif_composite_ref((w, h), bg, gpal, frames)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert (g == e).all()


@_MANY
@given(data=st.data())
def test_apng_animation_matches_reference(data):
    """Random APNG frame stacks (alpha, SOURCE/OVER blending, every
    dispose op) must match the per-pixel reference."""
    from tests.test_multimodal import _apng_bytes, _apng_composite_ref

    w = data.draw(st.integers(3, 12))
    h = data.draw(st.integers(3, 12))
    frames = []
    first = data.draw(st.booleans())
    for i in range(data.draw(st.integers(1, 3))):
        fw = data.draw(st.integers(1, w))
        fh = data.draw(st.integers(1, h))
        frames.append({
            "rgba": data.draw(hnp.arrays(np.uint8, (fh, fw, 4))),
            "x": data.draw(st.integers(0, w - fw)),
            "y": data.draw(st.integers(0, h - fh)),
            "dispose": data.draw(st.integers(0, 2)),
            "blend": data.draw(st.integers(0, 1)),
        })
    payload = _apng_bytes((w, h), frames, first_in_idat=first)
    got = mm._apng_frames_luma(payload)
    expected = _apng_composite_ref((w, h), frames)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert (g == e).all()


@_MANY
@given(frames=st.lists(st.binary(min_size=0, max_size=40), min_size=1,
                       max_size=6),
       with_rec=st.booleans())
def test_avi_demux_any_frame_bytes(frames, with_rec):
    from tests.test_multimodal import _avi_bytes

    got = mm._avi_video_frames(_avi_bytes(frames, with_rec=with_rec))
    assert got == frames


_PNG_DEPTHS = {0: [1, 2, 4, 8, 16], 2: [8, 16], 3: [1, 2, 4, 8],
               4: [8, 16], 6: [8, 16]}


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_png_roundtrip_every_type_depth_interlace(data):
    """Every legal (color type, bit depth) pair, both interlace
    layouts, all five filters cycling — decode must equal the direct
    per-pixel expectation."""
    from tests.test_multimodal import _png_bytes

    ctype = data.draw(st.sampled_from(sorted(_PNG_DEPTHS)))
    depth = data.draw(st.sampled_from(_PNG_DEPTHS[ctype]))
    interlace = data.draw(st.sampled_from([0, 1]))
    h = data.draw(st.integers(1, 11))
    w = data.draw(st.integers(1, 11))
    chans = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    maxv = (1 << depth) - 1
    shape = (h, w) if chans == 1 else (h, w, chans)
    dtype = np.uint16 if depth == 16 else np.uint8
    img = data.draw(hnp.arrays(
        dtype, shape, elements=st.integers(0, maxv)))
    palette = None
    if ctype == 3:
        palette = np.stack(
            [np.arange(maxv + 1) * 3 % 256, np.arange(maxv + 1) * 5 % 256,
             np.arange(maxv + 1) * 7 % 256], axis=1
        ).astype(np.uint8)
    payload = _png_bytes(img, color_type=ctype, bit_depth=depth,
                         interlace=interlace, filters=[0, 1, 2, 3, 4],
                         palette=palette)
    got = mm._decode_png(payload)
    img3 = img if img.ndim == 3 else img[:, :, None]
    if depth == 16:
        px8 = np.round(img3 / 257.0).astype(np.uint8)
    elif depth < 8 and ctype == 0:
        px8 = (img3 * (255 // maxv)).astype(np.uint8)
    else:
        px8 = img3.astype(np.uint8)
    if ctype in (0, 4):
        expected = px8[:, :, 0]
    elif ctype == 3:
        expected = mm._png_luma(palette[img3[:, :, 0]])
    else:
        expected = mm._png_luma(px8[:, :, :3])
    assert (got == expected).all()


@_MANY
@given(sig=hnp.arrays(np.int16, st.integers(128, 500)),
       pred_idx=st.integers(0, 6))
def test_ms_adpcm_trace_any_signal(sig, pred_idx):
    """The decoder reproduces the encoder's own reconstruction trace
    for ANY signal and every predictor pair (the lossy-codec contract,
    extreme samples included)."""
    from tests.test_multimodal import _ms_adpcm_encode_mono

    data, recon = _ms_adpcm_encode_mono(sig, 70, pred_idx)
    got = mm._decode_ms_adpcm_mono(data, 70)
    assert (got == recon).all()


@_MANY
@given(sig=hnp.arrays(np.int16, st.integers(132, 500)))
def test_ima_adpcm_trace_any_signal(sig):
    from tests.test_multimodal import _ima_encode_mono

    data, recon = _ima_encode_mono(sig, 132)
    got = mm._decode_ima_adpcm_mono(data, 132)
    assert (got == recon).all()


@_MANY
@given(data=st.data())
def test_bmp_roundtrip_any_raster(data):
    from tests.test_multimodal import _bmp_bytes

    h = data.draw(st.integers(1, 14))
    w = data.draw(st.integers(1, 14))
    top_down = data.draw(st.booleans())
    kind = data.draw(st.sampled_from(["rgb24", "rgb32", "pal8"]))
    if kind == "pal8":
        idx = data.draw(hnp.arrays(np.uint8, (h, w),
                                   elements=st.integers(0, 15)))
        palette = np.arange(48, dtype=np.uint8).reshape(16, 3)
        payload = _bmp_bytes(img_idx=idx, palette=palette,
                             top_down=top_down)
        expected = mm._png_luma(palette[idx])
    else:
        rgb = data.draw(hnp.arrays(np.uint8, (h, w, 3)))
        payload = _bmp_bytes(img_rgb=rgb, top_down=top_down,
                             bpp=24 if kind == "rgb24" else 32)
        expected = mm._png_luma(rgb)
    assert (mm._decode_bmp(payload) == expected).all()


@_MANY
@given(img=hnp.arrays(np.uint8, _dims),
       compression=st.sampled_from([1, 5, 8, 32773]),
       rows_per_strip=st.integers(1, 24),
       predictor=st.sampled_from([1, 2]),
       byte_order=st.sampled_from(["little", "big"]))
def test_tiff_roundtrip_any_raster(img, compression, rows_per_strip,
                                   predictor, byte_order):
    payload = _tiff_bytes(img, compression=compression,
                          byte_order=byte_order,
                          rows_per_strip=min(rows_per_strip, img.shape[0]),
                          predictor=predictor)
    assert (tc.decode_tiff(payload) == img).all()


@_MANY
@given(data=st.data())
def test_lossless_jpeg_roundtrip_any_image(data):
    """SOF3 lossless JPEG: any samples, any predictor 1-7, any point
    transform, any precision 2-16, with and without restart intervals,
    decode back exactly (after the deterministic P->8 rescale)."""
    from culvert_spark import jpegcodec as jc
    from tests.test_jpegcodec import encode_jpeg_lossless

    h = data.draw(st.integers(1, 12), label="h")
    w = data.draw(st.integers(1, 12), label="w")
    precision = data.draw(st.integers(2, 16), label="precision")
    pt = data.draw(st.integers(0, min(3, precision - 1)), label="pt")
    predictor = data.draw(st.integers(1, 7), label="predictor")
    restart = data.draw(
        st.sampled_from([0, 1, 3, h * w]), label="restart"
    )
    hi = 1 << (precision - pt)
    img = data.draw(
        hnp.arrays(np.int64, (h, w),
                   elements=st.integers(0, hi - 1)),
        label="img",
    )
    payload = encode_jpeg_lossless(
        [img], precision=precision, predictor=predictor, pt=pt,
        restart=restart,
    )
    got = jc.decode_jpeg_luma(payload)
    recon = (img << pt).astype(np.int64)
    maxval = (1 << precision) - 1
    expected = (
        recon.astype(np.uint8) if precision == 8
        else np.round(recon * (255.0 / maxval)).astype(np.uint8)
    )
    assert (got == expected).all()


@_MANY
@given(data=st.data())
def test_hierarchical_lossless_pyramid_any_image(data):
    """Annex J lossless pyramids: any dims (odd dims exercise the 2n-1
    EXP target), any depth, any base predictor — the full-resolution
    image is restored exactly through every EXP + SOF7 level."""
    from culvert_spark import jpegcodec as jc
    from tests.test_jpegcodec import encode_jpeg_hier_lossless

    h = data.draw(st.integers(2, 24), label="h")
    w = data.draw(st.integers(2, 24), label="w")
    levels = data.draw(st.integers(1, 3), label="levels")
    predictor = data.draw(st.integers(1, 7), label="predictor")
    img = data.draw(
        hnp.arrays(np.uint8, (h, w)), label="img"
    )
    payload, expected = encode_jpeg_hier_lossless(
        img, levels=levels, predictor=predictor
    )
    assert (expected == img.astype(np.int64)).all()
    got = jc.decode_jpeg_luma(payload)
    assert (got == img).all()
