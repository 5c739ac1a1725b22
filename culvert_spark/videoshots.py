"""Video shot segmentation + cross-video shot-level dedup.

``multimodal.video_frame_features`` emits a per-FRAME phash stream and
names shot-level dedup as its direct consumer ("shot-level dedup groups
consecutive equal hashes, corpus-level dedup joins frame-hash sets
across videos"). This module is that consumer, upgraded from
equal-hash runs to Hamming-tolerant segmentation:

1. **Shot boundaries**: a frame starts a new shot iff its phash differs
   from the PREVIOUS frame's by more than ``max_hamming`` bits (slight
   compression noise flips a bit or two inside a shot; a cut flips
   many). One LAG window per video ordered by frame_idx — event-level
   adjacency, exactly what windows are for.
2. **Shots**: per (media_id, shot_id) — frame span, length, and a
   representative phash (the FIRST frame's, deterministic by min
   frame_idx).
3. **Cross-video shot dedup**: representative phashes feed the SAME
   bounded-value-domain Hamming-LSH clustering image dedup uses
   (:func:`culvert_spark.imagesim.phash_value_clusters` — exact
   pigeonhole recall, exact verify, pointer-doubling components), so
   shots re-used across videos (intros, ads, duplicated uploads) group
   together no matter the container or per-frame noise.

Scale posture (100 TB): the segmentation window partitions by
media_id — bounded by FRAMES PER VIDEO (thousands), never corpus size,
so no giant-key guard is needed (the hot-key failure mode of user_id
windows does not exist here; a pathological 10⁹-frame "video" is a
corrupt input, not a workload). The clustering never touches frame
rows: the distinct rep-phash table is ≤ 2^nbits at any corpus size,
labels come back through ONE broadcast join, and the final group
aggregate is the only corpus-grain shuffle.

Staged in round 9 (pytest-proven: hand-built cut/noise geometry,
cross-video shared shots, single-frame videos, randomized
run-segmentation cross-check, real-path run over synthetic_media
videos, AND a DESIGN-EXACT container fixture — designed phash
sequences realized as real pixels, per-frame lossless JPEGs packed
into a real RIFF/AVI MJPEG container by ``encode_avi_mjpeg``, demuxed
and decoded back through the production path, with the staged
constant-folding oracle ``video_shot_oracle()`` already matching the
pipeline in DuckDB); REGISTERED as the driver row
``m_video_shot_dedup`` in round 10, with ``every_n=1`` explicit so the
fixture's intra-shot noise frames reach segmentation (round-9 ADVICE —
the round-9 50-row window was fully allocated, see
``__spark_entry__.py``'s rotation notes).

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
from pyspark.sql.window import Window

from culvert_spark.imagesim import (
    _ND_CLUSTERS,
    _ND_SINGLETONS,
    _flip_bits,
    _plane_for_phash,
    phash_value_clusters,
)


def _hamming_expr(a: str, b: str, nbits: int) -> str:
    """Character-compare fold (the imagesim idiom): bit count of a XOR b
    over two fixed-width bitstrings."""
    return (
        f"size(filter(sequence(1, {nbits}), "
        f"i -> substring({a}, i, 1) != substring({b}, i, 1)))"
    )


def shot_frames(
    frames: DataFrame, max_hamming: int = 2, nbits: int = 16
) -> DataFrame:
    """The frame table with its shot assignment: (media_id, frame_idx,
    phash, shot_id) where shot_id is 1-based per video and increments
    whenever consecutive frames' phashes differ by more than
    ``max_hamming`` bits. One narrow LAG window per video."""
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cut = F.when(F.col("_prev").isNull(), F.lit(1)).otherwise(
        F.when(
            F.expr(_hamming_expr("_prev", "phash", nbits)) > max_hamming,
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return (
        frames.select("media_id", "frame_idx", "phash")
        .withColumn("_prev", F.lag("phash").over(w))
        .withColumn("_cut", cut)
        .withColumn(
            "shot_id",
            F.sum("_cut").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("_prev", "_cut")
    )


def video_shots(
    frames: DataFrame, max_hamming: int = 2, nbits: int = 16
) -> DataFrame:
    """One row per detected shot: frame span, length, and the
    representative phash (first frame of the shot — deterministic at
    any parallelism via min_by on frame_idx). The aggregation reuses
    the segmentation window's (media_id) partitioning."""
    sf = shot_frames(frames, max_hamming, nbits)
    return (
        sf.groupBy("media_id", "shot_id")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.min_by("phash", "frame_idx").alias("rep_phash"),
        )
        .orderBy("media_id", "shot_id")
    )


def shot_near_dup_groups(
    frames: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
) -> DataFrame:
    """Cross-video near-duplicate SHOT groups: one row per cluster of
    shots whose representative phashes are connected within
    ``max_hamming`` bits — re-used intros, ads, and duplicated uploads
    across a video corpus. Columns: cluster_id (min rep bitstring),
    n_shots, n_videos, keeper_media_id / keeper_shot_id (the shot with
    the smallest (media_id, shot_id)), n_dupes.

    The pairing runs on the DISTINCT rep-phash value table (bounded by
    2^nbits regardless of corpus size, same guarantee set as
    imagesim); shots join their label through one broadcast."""
    shots = video_shots(frames, max_hamming, nbits)
    clusters = phash_value_clusters(
        shots.select(F.col("rep_phash").alias("phash")),
        max_hamming,
        bands,
        nbits,
    )
    labeled = shots.join(
        F.broadcast(clusters), shots.rep_phash == clusters.phash
    )
    best = F.struct("media_id", "shot_id")
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_shots"),
            F.countDistinct("media_id").alias("n_videos"),
            F.min(best).alias("_keeper"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .select(
            "cluster_id",
            "n_shots",
            "n_videos",
            F.col("_keeper.media_id").alias("keeper_media_id"),
            F.col("_keeper.shot_id").alias("keeper_shot_id"),
            "n_dupes",
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Design-exact fixture (round-10 registration candidate)
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(frames: list[bytes], width: int = 16,
                     height: int = 16) -> bytes:
    """Minimal RIFF/AVI Motion-JPEG writer (public container spec): a
    'hdrl' LIST with the 56-byte main header + one video stream, then a
    'movi' LIST of word-aligned '00dc' chunks, one complete JPEG per
    frame. ``_avi_video_frames`` demuxes it back bit-exactly."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", 40_000, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0, 1, 25,
        0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _last_one_flip(phash: str) -> str:
    """The intra-shot noise frame: the rep with its LAST '1' bit
    cleared — 1 bit from the rep (stays inside the shot radius) and
    one FEWER one-bit (stays inside the plane encoding's <= 8-ones
    constraint)."""
    return _flip_bits(phash, phash.rindex("1"))


#: Fixture layout: media_id -> ordered shot REP phashes, reusing the
#: image fixture's import-proven cluster geometry. Every shot is (rep,
#: rep-with-last-1-cleared): intra-shot steps are 1 bit (no cut), and
#: adjacent shots' reps come from different geometry groups, so every
#: boundary frame pair is >= 3 bits apart (cross-group min distance 4,
#: minus 1 for the noise flip) — a guaranteed cut. Verified
#: exhaustively at import by ``_check_video_fixture_design``.
_VS_VIDEOS: dict[int, list[str]] = {
    10: [_ND_CLUSTERS[0][0], _ND_CLUSTERS[1][0], _ND_CLUSTERS[2][0]],
    20: [_ND_CLUSTERS[0][1], _ND_CLUSTERS[3][0]],
    30: [_ND_CLUSTERS[0][2], _ND_CLUSTERS[1][1], _ND_SINGLETONS[0]],
    40: [_ND_CLUSTERS[4][0], _ND_SINGLETONS[1], _ND_CLUSTERS[4][1]],
}

#: Expected cluster table, stated from the DESIGN (cluster = the set of
#: rep phashes drawn from one geometry group; cluster_id = min PRESENT
#: rep; keeper = lexicographically first (media_id, shot_id)).
def _vs_expected() -> list[tuple[str, int, int, int, int, int]]:
    groups: dict[int, list[tuple[str, int, int]]] = {}
    lookup = {}
    for gi, cl in enumerate(_ND_CLUSTERS):
        for v in cl:
            lookup[v] = gi
    for si, s in enumerate(_ND_SINGLETONS):
        lookup[s] = 100 + si
    for mid, reps in _VS_VIDEOS.items():
        for shot_idx, rep in enumerate(reps, start=1):
            groups.setdefault(lookup[rep], []).append(
                (rep, mid, shot_idx)
            )
    out = []
    for members in groups.values():
        cid = min(m[0] for m in members)
        keeper = min((m[1], m[2]) for m in members)
        n_shots = len(members)
        n_videos = len({m[1] for m in members})
        out.append(
            (cid, n_shots, n_videos, keeper[0], keeper[1], n_shots - 1)
        )
    out.sort()
    return out


def _check_video_fixture_design() -> None:
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    for reps in _VS_VIDEOS.values():
        frames = []
        for rep in reps:
            frames += [rep, _last_one_flip(rep)]
        assert all(len(f) == 16 and f.count("1") <= 8 for f in frames)
        for i, (a, b) in enumerate(zip(frames, frames[1:])):
            d = ham(a, b)
            if i % 2 == 0:
                assert d <= 2, ("intra-shot step cut", a, b, d)
            else:
                assert d >= 3, ("shot boundary missed", a, b, d)


_check_video_fixture_design()


def near_dup_video_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus: each video's
    designed phash sequence realized as REAL pixels, each frame encoded
    as a complete lossless JPEG (mediagen's SOF3 writer — decoded
    bit-exactly by jpegcodec), packed into a real RIFF/AVI MJPEG
    container that ``sample_frames`` demuxes for real. The registered
    round-10 row would therefore gate container demux -> per-frame JPEG
    decode -> phash -> shot segmentation -> cross-video clustering
    end-to-end against design constants."""
    from culvert_spark.mediagen import encode_jpeg_lossless

    spec = sorted(_VS_VIDEOS.items())
    spec_df = spark.createDataFrame(
        [(mid, "|".join(reps)) for mid, reps in spec],
        "media_id bigint, reps string",
    )
    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, reps in zip(pdf["media_id"], pdf["reps"]):
                frames = []
                for rep in reps.split("|"):
                    for ph in (rep, _last_one_flip(rep)):
                        plane = _plane_for_phash(ph)
                        rgb = np.repeat(plane[:, :, None], 3, axis=2)
                        frames.append(encode_jpeg_lossless(rgb))
                rows.append({
                    "media_id": int(mid),
                    "kind": "video",
                    "payload": encode_avi_mjpeg(frames),
                    "meta": {"width": 16, "height": 16,
                             "sample_rate": 0, "n_frames": len(frames)},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spec_df.mapInPandas(encode, schema)


def video_shot_oracle() -> str:
    """Constant-folding DuckDB oracle from the fixture DESIGN (staged
    in round 9; registered as ``m_video_shot_dedup`` in round 10)."""
    vals = ",\n      ".join(
        f"('{cid}', {ns}, {nv}, {km}, {ks}, {nd})"
        for cid, ns, nv, km, ks, nd in _vs_expected()
    )
    return f"""
    SELECT cluster_id,
           CAST(n_shots AS BIGINT) AS n_shots,
           CAST(n_videos AS BIGINT) AS n_videos,
           CAST(keeper_media_id AS BIGINT) AS keeper_media_id,
           CAST(keeper_shot_id AS BIGINT) AS keeper_shot_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(cluster_id, n_shots, n_videos, keeper_media_id,
           keeper_shot_id, n_dupes)
    ORDER BY cluster_id
    """


# ---------------------------------------------------------------------------
# Driver registration (staged round 9, registered round 10)
# ---------------------------------------------------------------------------

from culvert_spark.queries import (  # noqa: E402
    QUERIES,  # noqa: F401  (re-export: __spark_entry__ registry merge)
    ORACLE,  # noqa: F401
    register,
)


@register("m_video_shot_dedup", video_shot_oracle())
def m_video_shot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot segmentation + cross-video shot dedup as a FULL hash
    row, end-to-end through the production media path: real RIFF/AVI
    MJPEG container demux -> per-frame lossless-JPEG decode -> phash ->
    Hamming-tolerant shot segmentation -> cross-video clustering, gated
    against the fixture's design constants. ``every_n=1`` is explicit
    and load-bearing (round-9 ADVICE): the fixture interleaves a 1-bit
    noise frame after every shot rep, and sampling every frame is what
    forces those noise frames through the intra-shot Hamming-tolerance
    path the fixture was designed to prove — ``video_frame_features``'s
    default every_n=2 would skip them and the row would pass without
    exercising it. ``sf_dir`` is unused: like the imagesim row the
    ground truth is a shipped deterministic fixture, constant at every
    scale factor; the operators (``shot_near_dup_groups`` over any
    frame-feature stream) are corpus-generic."""
    from culvert_spark.multimodal import video_frame_features

    return shot_near_dup_groups(
        video_frame_features(near_dup_video_media(spark), every_n=1)
    )
