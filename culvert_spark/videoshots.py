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
    hamming_py,
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
    ham = hamming_py
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
# Streaming twin (staged round 10 for the round-11 registration)
# ---------------------------------------------------------------------------

SHOT_REP_SCHEMA = "media_id bigint, shot_id bigint, rep_phash string"


def shot_rep_stream(
    media: DataFrame, max_hamming: int = 2, every_n: int = 1
) -> DataFrame:
    """(media_id, shot_id, rep_phash) per arriving VIDEO row — the
    streaming form of ``video_shots``'s rep projection. Streaming-safe
    because it is ROW-local: all of a video's frames live inside its
    payload, so demux -> per-frame decode -> phash -> segmentation runs
    in ONE narrow mapInPandas with no window and no shuffle (the batch
    path's LAG window exists only because its frames are separate
    rows). Frame extraction is byte-shared with the batch path
    (``multimodal.payload_frames``) and the cut rule is the identical
    hamming(prev, cur) > max_hamming; rep = first frame of the shot.
    Parity with ``video_shots(video_frame_features(...))`` is pinned by
    pytest on the design fixture AND the synthetic corpus.

    Scale (100 TB): per-video CPU scales with executors; the fan-out is
    shots (not frames) — orders of magnitude fewer rows reach the
    stateful consumer."""
    from culvert_spark.multimodal import (
        _decode_image,
        _plane_features,
        payload_frames,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                prev, shot_id = None, 0
                for _, fp in payload_frames(bytes(payload), meta, every_n):
                    ph = _plane_features(_decode_image(bytes(fp), 16, 16))[
                        "phash"
                    ]
                    if prev is None or hamming_py(prev, ph) > max_hamming:
                        shot_id += 1
                        rows.append(
                            {
                                "media_id": int(mid),
                                "shot_id": shot_id,
                                "rep_phash": ph,
                            }
                        )
                    prev = ph
            yield pd.DataFrame(
                rows, columns=["media_id", "shot_id", "rep_phash"]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(extract, SHOT_REP_SCHEMA)
    )


def shot_stream_dedup(
    shots: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
    bucket_cap: int = 64,
) -> DataFrame:
    """Streaming cross-video shot near-duplicate detection: flag each
    arriving shot against every previously seen shot — without ever
    re-scanning the corpus — the video twin of
    ``streaming.near_dup_stream_filter`` with the imagesim pigeonhole
    replacing MinHash. Each shot's rep phash explodes to its ``bands``
    exact band chunks; a (band, chunk)-keyed ``applyInPandasWithState``
    holds up to ``bucket_cap`` anchor shots per bucket and emits one
    row per VERIFIED (Hamming ≤ max_hamming) pair in canonical order
    (smaller (media_id, shot_id) first), tagged with the band that
    caught it.

    Determinism for the staged driver row: the DISTINCT
    (a_media, a_shot, b_media, b_shot) projection is micro-batch-
    boundary-INVARIANT — any within-radius pair agrees exactly on ≥ 1
    band (pigeonhole: max_hamming < bands), both members land in that
    bucket in whatever order they arrive, and the pair emits exactly
    when the second member does. Which band column tags the hit can
    vary with nothing (bands are value-determined), so even ``band``
    is stable; the projection drops it anyway. Same-batch arrivals are
    processed in (media_id, shot_id) order so intra-batch pairs emit
    deterministically too.

    Scale (100 TB): state is buckets × (≤ cap) shot triples at SHOT
    grain (already orders of magnitude below frame grain); the cap is
    the streaming form of the batch mega-bucket guard. At the cap a
    bucket stops accruing anchors (a pair of two UNSEEN post-cap shots
    in a saturated bucket would be missed — the documented trade, same
    as near_dup_stream_filter); expire cold buckets with a timeout or
    RocksDB in production."""
    from culvert_spark.streaming import hamming_pair_stream

    items = shots.select(
        F.col("media_id").alias("id_a"),
        F.col("shot_id").alias("id_b"),
        F.col("rep_phash").alias("phash"),
    )
    return hamming_pair_stream(
        items, max_hamming, bands, nbits, bucket_cap
    ).select(
        F.col("a_id1").alias("a_media"),
        F.col("a_id2").alias("a_shot"),
        F.col("b_id1").alias("b_media"),
        F.col("b_id2").alias("b_shot"),
        "band",
    )


def shot_pair_replay(spark: SparkSession, n_files: int = 4) -> DataFrame:
    """The staged ROUND-11 row body (``st_shot_dedup_replay``): the
    design fixture replayed through a REAL file-split stream —
    row-local shot extraction, band-keyed stateful pairing, then the
    batch-boundary-invariant distinct-pair projection (see
    shot_stream_dedup's determinism note)."""
    from culvert_spark.streaming import replay_stream

    out = replay_stream(
        spark,
        near_dup_video_media(spark),
        lambda s: shot_stream_dedup(shot_rep_stream(s)),
        "st_shot_pairs",
        n_files=n_files,
        output_mode="update",
    )
    return (
        out.select("a_media", "a_shot", "b_media", "b_shot")
        .distinct()
        .orderBy("a_media", "a_shot", "b_media", "b_shot")
    )


def shot_pair_oracle(max_hamming: int = 2) -> str:
    """Constant-folding DuckDB oracle for the staged streaming row: ALL
    unordered within-radius rep pairs, stated from the fixture DESIGN
    (pigeonhole recall is exact, so the streamed pair set must equal
    this regardless of file split or arrival order)."""
    shots = [
        (mid, si, rep)
        for mid, reps in sorted(_VS_VIDEOS.items())
        for si, rep in enumerate(reps, start=1)
    ]
    pairs = []
    for i in range(len(shots)):
        for j in range(i + 1, len(shots)):
            if hamming_py(shots[i][2], shots[j][2]) <= max_hamming:
                a, b = sorted(
                    [shots[i][:2], shots[j][:2]]
                )
                pairs.append((a[0], a[1], b[0], b[1]))
    pairs.sort()
    # Shared VALUES/typed-empty builder (round-11 self-review): emits
    # the SAME SQL text this function used to inline — byte-identity
    # with the registered round-11 oracle verified at refactor time.
    from culvert_spark.imagesim import pairs_values_oracle

    return pairs_values_oracle(
        pairs, ["a_media", "a_shot", "b_media", "b_shot"]
    )


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


@register("st_shot_dedup_replay", shot_pair_oracle())
def st_shot_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING video shot dedup as a FULL hash row (staged round 10,
    registered round 11): the design fixture's AVI media replayed
    through a REAL file-split Structured Streaming job — row-local
    demux -> per-frame phash -> shot segmentation in ONE narrow
    mapInPandas, then band-keyed capped-anchor stateful pairing via the
    shared ``streaming.hamming_pair_stream`` core — projected to the
    batch-boundary-invariant distinct within-radius pair set and gated
    against the fixture's design constants (``shot_pair_oracle``:
    pigeonhole recall is exact, so the streamed pair set must equal the
    all-pairs ground truth at ANY file split or arrival order; pytest
    proves it at n_files 4 and 1). ``sf_dir`` is unused: like the other
    fixture rows the ground truth is a shipped deterministic fixture;
    the operator (``shot_stream_dedup`` over any bitstring stream) is
    corpus-generic."""
    return shot_pair_replay(spark)
