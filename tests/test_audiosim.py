"""audiosim: band-pair energy-sign fingerprinting + near-dup clip
grouping — design-exact tone fixture through real WAV encode/decode,
quantization margin proof, exact volume invariance. Staged for a
round-10 driver row (m_audio_near_dup_groups)."""

from __future__ import annotations

import numpy as np
import pytest

from culvert_spark.audiosim import (
    _AF_COPIES,
    _AF_N,
    band_energies,
    encode_wav,
    fingerprint_samples,
    near_dup_audio_media,
    audio_fingerprints,
    audio_near_dup_groups,
    audio_near_dup_oracle,
    samples_for_fingerprint,
)
from culvert_spark.imagesim import _ND_CLUSTERS, _ND_SINGLETONS


def test_wav_roundtrip_bit_exact():
    from culvert_spark.multimodal import _decode_audio

    x = samples_for_fingerprint("0101010001010100", seed="rt")
    got, rate = _decode_audio(encode_wav(x))
    assert rate == 16_000
    assert np.array_equal(np.asarray(got, dtype=np.int16)[:_AF_N], x)


@pytest.mark.parametrize(
    "fp", [_ND_CLUSTERS[0][0], _ND_CLUSTERS[4][2], _ND_SINGLETONS[0]]
)
def test_fingerprint_realizes_design_target(fp):
    """The tone construction must produce EXACTLY the target bits after
    int16 quantization + noise (the design-exactness claim)."""
    x = samples_for_fingerprint(fp, seed=f"clip|{fp}")
    assert fingerprint_samples(x) == fp


def test_quantization_margin_proof():
    """Every band pair's decoded energy ratio must beat 4x (design is
    25x) — the sign can then never flip under int16 rounding, the md5
    noise floor, or the half-volume floor division."""
    from culvert_spark.multimodal import _decode_audio

    for fp in (_ND_CLUSTERS[1][1], _ND_SINGLETONS[1]):
        x = samples_for_fingerprint(fp, seed=f"clip|{fp}")
        for vol_den in (1, 2):
            y = (x.astype(np.int32) // vol_den).astype(np.int16)
            dec, _ = _decode_audio(encode_wav(y))
            e = band_energies(np.asarray(dec, dtype=np.float64))
            hi = np.where(np.array(list(fp)) == "1", e[0::2], e[1::2])
            lo = np.where(np.array(list(fp)) == "1", e[1::2], e[0::2])
            assert (hi / lo > 4).all(), (fp, vol_den, (hi / lo).min())


def test_volume_scaling_preserves_fingerprint():
    fp = _ND_CLUSTERS[2][0]
    x = samples_for_fingerprint(fp, seed=f"clip|{fp}")
    for den in (2, 4, 8):
        y = (x.astype(np.int32) // den).astype(np.int16)
        assert fingerprint_samples(y) == fp


def test_fixture_fingerprints_and_grouping_match_design(spark):
    """End-to-end through the real WAV encode -> real decode -> rfft ->
    LSH clustering: the grouping must land exactly on the design
    constants (the same truth the staged DuckDB oracle states)."""
    media = near_dup_audio_media(spark)
    prints = {
        r.media_id: r.fingerprint
        for r in audio_fingerprints(media).collect()
    }
    # copy 1 (half volume) fingerprints equal copy 0's
    for mid, fp in prints.items():
        if mid % 10 == 1 or mid % 100 == 1:
            assert fp == prints[mid - 1]
    want = {}
    for c, cl in enumerate(_ND_CLUSTERS):
        want[min(cl)] = (3 * _AF_COPIES, 3, 1000 * c, 3 * _AF_COPIES - 1)
    for s, fp in enumerate(_ND_SINGLETONS):
        want[fp] = (_AF_COPIES, 1, 9000 + 100 * s, _AF_COPIES - 1)
    got = {
        r.cluster_id: (r.n_clips, r.n_prints, r.keeper_id, r.n_dupes)
        for r in audio_near_dup_groups(media).collect()
    }
    assert got == want


def test_staged_oracle_matches_design(spark):
    """The staged round-10 oracle SQL must state the same truth the
    Spark grouping produces (DuckDB literal VALUES vs the end-to-end
    pipeline)."""
    import duckdb

    spdf = audio_near_dup_groups(near_dup_audio_media(spark)).toPandas()
    ddf = duckdb.connect().execute(audio_near_dup_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


# ---------------------------------------------------------------------------
# Streaming twin (staged round 10 -> round-12 registration candidate)
# ---------------------------------------------------------------------------


def test_audio_stream_dedup_pairs_match_design_order_invariant(spark):
    """The replayed streaming pair set must equal the staged
    constant-folding oracle (ALL within-radius clip pairs from the
    fixture design) at DIFFERENT file splits — the same
    batch-boundary-invariance contract as the video twin, through the
    shared streaming.hamming_pair_stream core. The fixture covers both
    distance-0 pairs (volume copies: exact invariance) and 1-2-bit
    pairs (cluster variants)."""
    import duckdb

    from culvert_spark.audiosim import audio_pair_oracle, audio_pair_replay

    exp = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(audio_pair_oracle())
        .fetchdf()
        .itertuples(index=False, name=None)
    )
    assert len(exp) > 0
    # volume-copy (distance-0) pairs: same cluster+variant, copies 0/1
    assert any(b - a == 1 and a % 10 == 0 for a, b in exp)
    # cross-variant pairs (1-2 bits): different variant digits
    assert any((a // 10) % 100 != (b // 10) % 100 for a, b in exp)
    for n_files in (4, 1):
        got = sorted(
            (r.a_media, r.b_media)
            for r in audio_pair_replay(spark, n_files=n_files).collect()
        )
        assert got == exp, (n_files, len(got), len(exp))
