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
videos); registration as a driver row (``m_video_shot_dedup``) is a
ROUND-10 candidate — the round-9 50-row window was fully allocated
(see ``__spark_entry__.py``'s ROUND-9 ROTATION note).

Reference scope: prasanthj/culvert has no multimodal surface (SURVEY
§0); this extends the training-data multimodal family mandated by the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from culvert_spark.imagesim import phash_value_clusters


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
