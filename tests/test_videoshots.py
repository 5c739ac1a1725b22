"""videoshots: Hamming-tolerant shot segmentation + cross-video shot
dedup — hand-built cut geometry, randomized run-segmentation
cross-check, and the real decode path over synthetic_media videos.
Staged for a round-10 driver row (m_video_shot_dedup)."""

from __future__ import annotations

import random

from culvert_spark.videoshots import (
    shot_frames,
    shot_near_dup_groups,
    video_shots,
)

NBITS = 16


def _bits(x: int) -> str:
    return format(x, f"0{NBITS}b")


def _flip(s: str, *positions: int) -> str:
    out = list(s)
    for p in positions:
        out[p] = "1" if out[p] == "0" else "0"
    return "".join(out)


def _frames(spark, rows):
    return spark.createDataFrame(
        rows, "media_id bigint, frame_idx int, phash string"
    )


def test_cut_and_noise_geometry(spark):
    """Frames within 2 bits of their predecessor stay in the shot
    (compression noise); a >2-bit jump opens a new one (a cut). Shot
    spans, lengths, and first-frame representatives all pinned."""
    a = _bits(0b1111000011110000)
    b = _bits(0b0000111100001111)  # 16 bits from a — a hard cut
    rows = [
        (1, 0, a),
        (1, 1, _flip(a, 0)),       # 1 bit of noise: same shot
        (1, 2, _flip(a, 0, 5)),    # 2 bits from prev frame: same shot
        (1, 3, b),                 # cut
        (1, 4, b),
    ]
    shots = video_shots(_frames(spark, rows)).collect()
    got = [
        (r.shot_id, r.start_frame, r.end_frame, r.n_frames, r.rep_phash)
        for r in shots
    ]
    assert got == [(1, 0, 2, 3, a), (2, 3, 4, 2, b)]


def test_boundary_is_vs_previous_frame_not_shot_start(spark):
    """Segmentation compares each frame with its PREDECESSOR, so slow
    drift (1 bit per frame) never cuts even when a frame ends up far
    from the shot's first frame — the standard run-segmentation
    semantics, pinned so a 'compare vs representative' regression
    can't slip in."""
    p = _bits(0)
    rows, cur = [], p
    for i in range(6):
        rows.append((7, i, cur))
        cur = _flip(cur, i)  # drift one NEW bit per frame
    shots = video_shots(_frames(spark, rows)).collect()
    assert len(shots) == 1 and shots[0].n_frames == 6


def test_single_frame_videos_and_shot_numbering(spark):
    rows = [(1, 0, _bits(1)), (2, 0, _bits(2)), (2, 1, _bits(3 << 8))]
    sf = {
        (r.media_id, r.frame_idx): r.shot_id
        for r in shot_frames(_frames(spark, rows)).collect()
    }
    # 2's second frame differs by >2 bits -> its own shot; ids restart
    # per video at 1
    assert sf == {(1, 0): 1, (2, 0): 1, (2, 1): 2}


def test_randomized_run_segmentation_cross_check(spark):
    """Random phash walks per video must segment exactly like an
    independent sequential reference."""
    rng = random.Random(11)
    rows = []
    for mid in range(4):
        cur = _bits(rng.getrandbits(NBITS))
        for i in range(30):
            if i:
                k = rng.choice([0, 1, 2, 3, 5, 9])
                cur = (
                    _flip(cur, *rng.sample(range(NBITS), k)) if k else cur
                )
            rows.append((mid, i, cur))
    # independent reference: sequential scan
    want = {}
    by_vid = {}
    for mid, i, ph in rows:
        by_vid.setdefault(mid, []).append((i, ph))
    for mid, fr in by_vid.items():
        fr.sort()
        sid = 0
        prev = None
        for i, ph in fr:
            d = (
                None
                if prev is None
                else sum(x != y for x, y in zip(prev, ph))
            )
            if d is None or d > 2:
                sid += 1
            want[(mid, i)] = sid
            prev = ph
    got = {
        (r.media_id, r.frame_idx): r.shot_id
        for r in shot_frames(_frames(spark, rows)).collect()
    }
    assert got == want


def test_cross_video_shot_dedup_groups(spark):
    """A shot re-used across two videos (with 1 bit of per-frame noise)
    groups into ONE cluster whose keeper is the earliest (media_id,
    shot_id); unshared shots stay singletons."""
    intro = _bits(0b1100110011001100)
    body1 = _bits(0b0000000011111111)
    body2 = _bits(0b1111111100000000)
    rows = [
        (10, 0, intro), (10, 1, _flip(intro, 3)), (10, 2, body1),
        (10, 3, body1),
        (20, 0, _flip(intro, 7)), (20, 1, intro), (20, 2, body2),
    ]
    got = {
        r.cluster_id: (
            r.n_shots, r.n_videos, r.keeper_media_id, r.keeper_shot_id,
            r.n_dupes,
        )
        for r in shot_near_dup_groups(_frames(spark, rows)).collect()
    }
    # intro cluster: rep phashes are intro (video 10) and flip(intro,7)
    # (video 20) — 1 bit apart -> one cluster, keeper (10, 1)
    intro_cid = min(intro, _flip(intro, 7))
    assert got == {
        intro_cid: (2, 2, 10, 1, 1),
        body1: (1, 1, 10, 2, 0),
        body2: (1, 1, 20, 2, 0),
    }


def test_real_path_over_synthetic_media(spark):
    """End-to-end over the real decode path: synthetic_media videos →
    video_frame_features → segmentation. Every frame lands in exactly
    one shot, spans tile each video's sampled frames, and reps come
    from shot starts."""
    from culvert_spark.multimodal import synthetic_media, video_frame_features
    from tests.conftest import SF_SMALL

    frames = video_frame_features(
        synthetic_media(spark, SF_SMALL), every_n=2
    )
    n_frames = frames.count()
    assert n_frames > 0
    shots = video_shots(frames).collect()
    assert sum(r.n_frames for r in shots) == n_frames
    by_vid = {}
    for r in shots:
        by_vid.setdefault(r.media_id, []).append(r)
    for vid, ss in by_vid.items():
        ss.sort(key=lambda r: r.shot_id)
        assert [r.shot_id for r in ss] == list(range(1, len(ss) + 1))
        for prev, cur in zip(ss, ss[1:]):
            assert prev.end_frame < cur.start_frame


def test_avi_mjpeg_roundtrip_bit_exact():
    """encode_avi_mjpeg -> the production demuxer returns the exact
    frame payloads in order."""
    from culvert_spark.multimodal import _avi_video_frames
    from culvert_spark.videoshots import encode_avi_mjpeg

    frames = [b"JPEGDATA%d" % i for i in range(5)]
    got = _avi_video_frames(encode_avi_mjpeg(frames))
    assert got == frames


def test_video_fixture_end_to_end_matches_design(spark):
    """The full real chain — AVI demux -> per-frame lossless-JPEG
    decode -> phash -> segmentation -> cross-video clustering — must
    land exactly on the design constants (the truth the staged DuckDB
    oracle states)."""
    from culvert_spark.multimodal import video_frame_features
    from culvert_spark.videoshots import (
        _vs_expected,
        near_dup_video_media,
    )

    frames = video_frame_features(near_dup_video_media(spark), every_n=1)
    got = sorted(
        (
            r.cluster_id, r.n_shots, r.n_videos, r.keeper_media_id,
            r.keeper_shot_id, r.n_dupes,
        )
        for r in shot_near_dup_groups(frames).collect()
    )
    assert got == _vs_expected()


def test_staged_video_oracle_matches_design(spark):
    """The staged round-10 oracle SQL must state the same truth the
    Spark pipeline produces."""
    import duckdb

    from culvert_spark.multimodal import video_frame_features
    from culvert_spark.videoshots import (
        near_dup_video_media,
        video_shot_oracle,
    )

    frames = video_frame_features(near_dup_video_media(spark), every_n=1)
    spdf = shot_near_dup_groups(frames).toPandas()
    ddf = duckdb.connect().execute(video_shot_oracle()).fetchdf()
    a = sorted(map(str, spdf.itertuples(index=False, name=None)))
    b = sorted(map(str, ddf.itertuples(index=False, name=None)))
    assert a == b


# ---------------------------------------------------------------------------
# Streaming twin (staged round 10 -> round-11 registration candidate)
# ---------------------------------------------------------------------------


def test_shot_rep_stream_matches_batch(spark):
    """Row-local (streaming-safe) segmentation must equal the batch
    window segmentation's rep projection — on the design fixture AND
    the synthetic corpus (both paths share payload_frames byte-for-byte
    and the same cut rule; this pins it)."""
    from culvert_spark.multimodal import synthetic_media, video_frame_features
    from culvert_spark.videoshots import (
        near_dup_video_media,
        shot_rep_stream,
        video_shots,
    )
    from tests.conftest import SF_SMALL

    for media, every_n in (
        (near_dup_video_media(spark), 1),
        (synthetic_media(spark, SF_SMALL), 2),
    ):
        batch = sorted(
            (r.media_id, r.shot_id, r.rep_phash)
            for r in video_shots(
                video_frame_features(media, every_n=every_n)
            ).collect()
        )
        streamed = sorted(
            (r.media_id, r.shot_id, r.rep_phash)
            for r in shot_rep_stream(media, every_n=every_n).collect()
        )
        assert streamed == batch and len(batch) > 0


def test_shot_stream_dedup_pairs_match_design_order_invariant(spark):
    """The replayed streaming pair set must equal the staged
    constant-folding oracle (ALL within-radius rep pairs from the
    fixture design) at DIFFERENT file splits — the batch-boundary
    invariance the round-11 registration relies on. The fixture covers
    both cross-video and within-video pairs."""
    import duckdb

    from culvert_spark.videoshots import shot_pair_oracle, shot_pair_replay

    exp = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(shot_pair_oracle())
        .fetchdf()
        .itertuples(index=False, name=None)
    )
    assert len(exp) > 0
    assert any(a == b for a, _, b, _ in exp)      # within-video pair
    assert any(a != b for a, _, b, _ in exp)      # cross-video pairs
    for n_files in (4, 1):
        got = sorted(
            (r.a_media, r.a_shot, r.b_media, r.b_shot)
            for r in shot_pair_replay(spark, n_files=n_files).collect()
        )
        assert got == exp, (n_files, got, exp)
