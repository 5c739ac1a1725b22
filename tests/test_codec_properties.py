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
