"""Audio fingerprinting + near-duplicate clip grouping.

The multimodal family has audio FEATURES (duration, RMS —
``multimodal.audio_features``) but no audio DEDUP; this module closes
that gap with a volume-invariant spectral fingerprint and the same
bounded-value-domain Hamming clustering the image/video paths use:

1. **Fingerprint** (16 bits): one magnitude spectrum over the clip's
   first ``_AF_N`` samples (rfft), 32 equal DISJOINT frequency bands,
   bit b = 1 iff energy(band 2b) > energy(band 2b+1). Comparing only
   within disjoint band PAIRS makes every bit independent of the
   others and exactly invariant to volume scaling (both energies scale
   by the same factor). The band-energy-sign idea follows the robust
   audio fingerprinting literature (Haitsma & Kalker, 2002 — theirs
   uses time-difference filterbank signs; this is the stationary
   simplification suited to batch dedup, not sub-clip search).
2. **Near-dup grouping**: fingerprints feed
   :func:`culvert_spark.imagesim.phash_value_clusters` — band-LSH
   candidate pairs on the DISTINCT value table (≤ 2^16 rows at any
   corpus size), exact pigeonhole recall, exact Hamming verify,
   pointer-doubling components, one broadcast label join.

Scale posture (100 TB): decode + FFT run inside one narrow
``mapInPandas`` (CPU scales with executors, nothing shuffles until the
final group aggregate); the pairing never touches clip rows.

The fixture (``near_dup_audio_media``) is DESIGN-exact like the image
one: tones are placed at exact rfft bin centers (an integer-bin
sinusoid over exactly N samples has zero spectral leakage), each band
pair's two amplitudes are set a fixed ratio apart according to the
target bit, and the target fingerprints reuse ``imagesim``'s
import-proven cluster geometry (within-cluster ≤ 2 bits, cross-group
≥ 3). Payloads go through a real minimal PCM16 WAV writer and the real
``multimodal._decode_audio`` WAV path.

Staged in round 9 (pytest-proven: per-clip fingerprint == design
target through real encode/decode, a quantization margin proof on
decoded band energies, exact volume invariance, end-to-end grouping
vs the design constants, WAV round-trip); REGISTERED as the driver
row ``m_audio_near_dup_groups`` in round 10 (the round-9 window was
fully allocated — see ``__spark_entry__.py``'s rotation notes).

Reference scope: prasanthj/culvert has no multimodal surface (SURVEY
§0); this extends the training-data multimodal family mandated by the
build brief.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.imagesim import (
    _ND_CLUSTERS,
    _ND_SINGLETONS,
    phash_value_clusters,
)

_AF_NBITS = 16
_AF_BANDS = 2 * _AF_NBITS   # 32 disjoint bands, compared in pairs
_AF_N = 2048                # samples analyzed (and generated) per clip
# rfft bins per band, derived from _AF_N so the band boundaries track
# the analysis length (round-9 ADVICE: a hard-coded 1024 was correct
# only for _AF_N=2048 and would silently misalign with the tone
# placement in samples_for_fingerprint if _AF_N changed). The DC bin
# is excluded, so the covered bins are 1.._AF_BANDS*_AF_BPB = 1.._AF_N/2
# — the LAST band therefore INCLUDES the Nyquist bin (the fixture's
# tones sit at band centers, far from it; anything injecting energy at
# Nyquist perturbs band _AF_BANDS-1 and can flip fingerprint bit
# _AF_NBITS-1).
_AF_BPB = (_AF_N // 2) // _AF_BANDS
_AF_RATE = 16_000

#: Amplitudes for the (greater, lesser) tone of each band pair. The
#: energy ratio is (1200/240)^2 = 25x — orders of magnitude above the
#: int16 quantization + noise floor, so the comparison sign survives
#: encode/decode exactly (margin pinned by pytest on DECODED energies).
#: The worst-case sample magnitude is bounded by the amplitude SUM,
#: 16*(1200+240) + noise = 23 046 < 32767, so clipping — which would
#: smear energy across band boundaries — is impossible by construction.
_AF_HI, _AF_LO = 1200.0, 240.0
_AF_NOISE = 6.0  # deterministic md5 noise amplitude (well under _AF_LO)


def encode_wav(samples: np.ndarray, sample_rate: int = _AF_RATE) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE writer (the public container spec;
    the production decoder's WAV path reads it back bit-exactly)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def band_energies(x: np.ndarray) -> np.ndarray:
    """The 32 disjoint band energies of the first _AF_N samples (zero-
    padded if shorter): |rfft|^2 summed per band, DC excluded."""
    x = np.asarray(x, dtype=np.float64)[:_AF_N]
    if len(x) < _AF_N:
        x = np.pad(x, (0, _AF_N - len(x)))
    spec = np.abs(np.fft.rfft(x)) ** 2
    return (
        spec[1 : 1 + _AF_BANDS * _AF_BPB]
        .reshape(_AF_BANDS, _AF_BPB)
        .sum(axis=1)
    )


def fingerprint_samples(x: np.ndarray) -> str:
    """16-bit band-pair energy-sign fingerprint of a sample array."""
    e = band_energies(x)
    return "".join((e[0::2] > e[1::2]).astype(int).astype(str))


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, fingerprint) for every audio row: real decode
    (multimodal dispatcher) + numpy rfft per clip, one narrow
    mapInPandas — no shuffle."""
    from culvert_spark.multimodal import _decode_audio

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _ = _decode_audio(bytes(payload))
                rows.append(
                    {
                        "media_id": int(mid),
                        "fingerprint": fingerprint_samples(samples),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "fingerprint"])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(extract, "media_id bigint, fingerprint string")
    )


def audio_near_dup_groups(
    media: DataFrame, max_hamming: int = 2, bands: int = 4
) -> DataFrame:
    """Near-duplicate audio groups: one row per fingerprint cluster
    with clip count, distinct-fingerprint count, keeper (min media_id)
    and dupe count — the audio analog of
    ``imagesim.phash_near_dup_groups``, sharing its clustering (and
    therefore its recall/exactness guarantees) verbatim."""
    prints = audio_fingerprints(media)
    clusters = phash_value_clusters(
        prints.select(F.col("fingerprint").alias("phash")),
        max_hamming,
        bands,
        _AF_NBITS,
    )
    return (
        prints.join(
            F.broadcast(clusters), prints.fingerprint == clusters.phash
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.countDistinct("fingerprint").alias("n_prints"),
            F.min("media_id").alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Design-exact fixture (round-10 registration candidate)
# ---------------------------------------------------------------------------

#: Two encoded copies per fingerprint variant: copy 0 full volume,
#: copy 1 HALF volume — same fingerprint by exact invariance, so the
#: grouping must collapse them (n_prints < n_clips), mirroring the
#: image fixture's container axis with a volume axis.
_AF_COPIES = 2


def samples_for_fingerprint(fp: str, seed: str) -> np.ndarray:
    """A _AF_N-sample int16 clip whose fingerprint IS ``fp``: one tone
    per band at the band's center rfft bin (integer bin over exactly
    _AF_N samples -> zero leakage), the pair's (hi, lo) amplitudes
    ordered by the target bit, plus deterministic md5 noise far below
    the comparison margin."""
    if len(fp) != _AF_NBITS or set(fp) - {"0", "1"}:
        raise ValueError(f"bad fingerprint {fp!r}")
    t = np.arange(_AF_N, dtype=np.float64)
    x = np.zeros(_AF_N, dtype=np.float64)
    for b in range(_AF_NBITS):
        hi_first = fp[b] == "1"
        for which, band in enumerate((2 * b, 2 * b + 1)):
            amp = (
                _AF_HI
                if (which == 0) == hi_first
                else _AF_LO
            )
            centre_bin = 1 + band * _AF_BPB + _AF_BPB // 2
            x += amp * np.sin(2 * np.pi * centre_bin * t / _AF_N)
    # deterministic noise: md5-chained bytes, zero-mean
    import hashlib

    h = hashlib.md5(seed.encode()).digest()
    buf = bytearray()
    while len(buf) < _AF_N:
        buf += h
        h = hashlib.md5(h).digest()
    noise = (np.frombuffer(bytes(buf[:_AF_N]), np.uint8).astype(np.float64)
             - 127.5) / 127.5 * _AF_NOISE
    return np.clip(np.round(x + noise), -32768, 32767).astype(np.int16)


def near_dup_audio_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus: the image
    fixture's import-proven cluster geometry re-used as target audio
    fingerprints, realized as real tones through ``encode_wav`` (copy 1
    at half volume — fingerprint-identical by exact invariance).
    media_id scheme matches imagesim: cluster c, variant v, copy k ->
    1000c + 10v + k; singleton s -> 9000 + 100s + k."""
    spec = []  # (media_id, fingerprint, volume_num, volume_den)
    for c, cl in enumerate(_ND_CLUSTERS):
        for v, fp in enumerate(cl):
            for k in range(_AF_COPIES):
                spec.append((1000 * c + 10 * v + k, fp, 1, 1 + k))
    for s, fp in enumerate(_ND_SINGLETONS):
        for k in range(_AF_COPIES):
            spec.append((9000 + 100 * s + k, fp, 1, 1 + k))
    spec_df = spark.createDataFrame(
        spec, "media_id bigint, fp string, vol_num int, vol_den int"
    )

    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fp, num, den in zip(
                pdf["media_id"], pdf["fp"], pdf["vol_num"], pdf["vol_den"]
            ):
                base = samples_for_fingerprint(fp, seed=f"clip|{fp}")
                x = (
                    base
                    if den == 1
                    else (base.astype(np.int32) * int(num) // int(den))
                    .astype(np.int16)
                )
                rows.append({
                    "media_id": int(mid),
                    "kind": "audio",
                    "payload": encode_wav(x),
                    "meta": {"width": 0, "height": 0,
                             "sample_rate": _AF_RATE, "n_frames": 1},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spec_df.mapInPandas(encode, schema)


def audio_near_dup_oracle() -> str:
    """Constant-folding DuckDB oracle from the fixture DESIGN (staged
    for the round-10 ``m_audio_near_dup_groups`` registration): same
    cluster geometry as the image row, volume copies collapsing onto
    one fingerprint (n_prints = variants, n_clips = variants x
    copies)."""
    rows = []
    for c, cl in enumerate(_ND_CLUSTERS):
        rows.append((min(cl), 3 * _AF_COPIES, 3, 1000 * c))
    for s, fp in enumerate(_ND_SINGLETONS):
        rows.append((fp, _AF_COPIES, 1, 9000 + 100 * s))
    vals = ",\n      ".join(
        f"('{cid}', {ni}, {nh}, {kid}, {ni - 1})"
        for cid, ni, nh, kid in rows
    )
    return f"""
    SELECT cluster_id,
           CAST(n_clips AS BIGINT) AS n_clips,
           CAST(n_prints AS BIGINT) AS n_prints,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(cluster_id, n_clips, n_prints, keeper_id, n_dupes)
    ORDER BY cluster_id
    """


# ---------------------------------------------------------------------------
# Streaming twin (staged round 10 for a round-12 registration)
# ---------------------------------------------------------------------------


def audio_stream_dedup(
    media: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    bucket_cap: int = 64,
) -> DataFrame:
    """Streaming audio near-duplicate PAIR detection: flag each
    arriving clip against every previously seen clip — the audio twin
    of ``videoshots.shot_stream_dedup``, sharing
    ``streaming.hamming_pair_stream`` (and therefore its pigeonhole
    batch-boundary-invariance and capped-state guarantees) verbatim.
    ``audio_fingerprints`` is already streaming-safe (one narrow
    mapInPandas per clip row — decode + rfft need no cross-row state),
    so the whole path is fingerprint -> band explode -> stateful
    verify. Output: canonical (a_media, b_media, band) verified pairs;
    volume copies collide at Hamming distance 0 by exact invariance."""
    from culvert_spark.streaming import single_id_pair_stream

    return single_id_pair_stream(
        audio_fingerprints(media), max_hamming, bands, _AF_NBITS,
        bucket_cap,
    )


def audio_pair_replay(spark: SparkSession, n_files: int = 4) -> DataFrame:
    """The staged ROUND-12 row body (``st_audio_dedup_replay``): the
    design fixture replayed through a REAL file-split stream —
    per-clip fingerprinting, band-keyed stateful pairing, then the
    batch-boundary-invariant distinct-pair projection."""
    from culvert_spark.streaming import replay_stream

    out = replay_stream(
        spark,
        near_dup_audio_media(spark),
        lambda s: audio_stream_dedup(s),
        "st_audio_pairs",
        n_files=n_files,
        output_mode="update",
    )
    return (
        out.select("a_media", "b_media")
        .distinct()
        .orderBy("a_media", "b_media")
    )


def audio_pair_oracle(max_hamming: int = 2) -> str:
    """Constant-folding DuckDB oracle for the staged streaming row: ALL
    unordered within-radius clip pairs stated from the fixture DESIGN —
    volume copies pair at distance 0, cluster variants at 1-2 bits,
    cross-group never (≥ 3 by the import-proven geometry)."""
    from culvert_spark.imagesim import hamming_py

    clips = []  # (media_id, fingerprint)
    for c, cl in enumerate(_ND_CLUSTERS):
        for v, fp in enumerate(cl):
            for k in range(_AF_COPIES):
                clips.append((1000 * c + 10 * v + k, fp))
    for s, fp in enumerate(_ND_SINGLETONS):
        for k in range(_AF_COPIES):
            clips.append((9000 + 100 * s + k, fp))
    from culvert_spark.imagesim import pairs_values_oracle

    pairs = sorted(
        (min(a, b), max(a, b))
        for i, (a, fa) in enumerate(clips)
        for b, fb in clips[i + 1 :]
        if hamming_py(fa, fb) <= max_hamming
    )
    return pairs_values_oracle(pairs, ["a_media", "b_media"])


# ---------------------------------------------------------------------------
# Driver registration (staged round 9, registered round 10)
# ---------------------------------------------------------------------------

from culvert_spark.queries import (  # noqa: E402
    QUERIES,  # noqa: F401  (re-export: __spark_entry__ registry merge)
    ORACLE,  # noqa: F401
    register,
)


@register("m_audio_near_dup_groups", audio_near_dup_oracle())
def m_audio_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup grouping as a FULL hash row,
    end-to-end through the production media path: real PCM16 WAV encode
    -> the production WAV decode -> rfft band-pair energy-sign
    fingerprint -> Hamming-LSH clustering, gated against the fixture's
    design constants. The fixture's half-volume copies make the row
    prove exact volume invariance (they must collapse onto the
    full-volume fingerprint: n_prints < n_clips in every group).
    ``sf_dir`` is unused: like the imagesim/videoshots rows the ground
    truth is a shipped deterministic fixture, constant at every scale
    factor; the operator (``audio_near_dup_groups``) is
    corpus-generic."""
    return audio_near_dup_groups(near_dup_audio_media(spark))


@register("st_audio_dedup_replay", audio_pair_oracle())
def st_audio_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming audio near-dup pairing registered as a FULL hash row
    (staged round 10, registered round 12): the design fixture replayed
    through a REAL file-split stream — per-clip fingerprint, band-keyed
    stateful pairing via the shared ``streaming.hamming_pair_stream``
    core, then the batch-boundary-invariant distinct-pair projection —
    against the constant-folding pair oracle. Pytest proves the pair
    set is IDENTICAL at n_files 4 and 1 (tests/test_audiosim.py), i.e.
    independent of micro-batch boundaries. ``sf_dir`` is unused
    (shipped fixture ground truth, like the other media rows)."""
    return audio_pair_replay(spark)
