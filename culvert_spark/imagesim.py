"""Perceptual-hash near-duplicate image grouping (Hamming-distance LSH).

``multimodal.image_dedup_groups`` collapses EXACT phash matches — the
first pass of image corpus cleanup — and names Hamming-distance LSH
over the same bits as the fuzzy next step. This module is that step:
group images whose 16-bit column-profile phashes differ in at most
``max_hamming`` bits, the robust version of container-insensitive
dedup (slight re-encodes, scaling artifacts, or single-pixel noise
flip a bit or two of the column profile; byte dedup and exact-phash
dedup both miss them).

Spark-first scale design — the pairing NEVER touches image rows:

1. The phash domain is BOUNDED (2^nbits bitstrings, 65 536 at the
   16-bit default), so candidate generation runs on the DISTINCT VALUE
   table, whose size is independent of corpus size.
2. Band LSH over the value table: split the bitstring into ``bands``
   equal slices and equi-join values sharing any exact band. The
   pigeonhole guarantee is EXACT, not probabilistic: two values within
   Hamming distance d < bands cannot differ in every band, so every
   qualifying pair IS a candidate (d differing bits cannot hit all
   ``bands`` bands) — recall 1.0 by construction, enforced by
   requiring ``max_hamming < bands``.
3. Exact Hamming verify on the candidate VALUE pairs (a
   character-compare fold over the bitstring — value pairs are
   ≤ C(65536, 2) in the worst theoretical case but in practice bounded
   by the band join's selectivity on values actually present).
4. Connected components over the verified value graph with
   :func:`culvert_spark.textops.min_label_components_doubling`
   (pointer doubling, O(log diameter), raises on non-convergence) —
   near-dup grouping is transitive closure, exactly like text dedup
   clusters.
5. Images join their phash's cluster label through ONE broadcast of
   the (phash → cluster) table (≤ 65 536 rows), then a single shuffle
   on cluster_id aggregates group stats.

At 100 TB the only corpus-scale stages are the distinct() on phash
(partial-agged) and the final grouped aggregate; everything between is
value-domain work a single executor could hold.

Staged in round 8 (pytest-proven: hand-built Hamming clusters with
transitive chaining, randomized brute-force union-find cross-check,
pigeonhole completeness, singleton labeling); registration as a driver
row (``m_phash_near_dup_groups``) is planned for a round-9 window slot
— round 8's 50-row window was already fully allocated (see
``__spark_entry__.py``'s ROUND-8 ROTATION note).

Reference scope: prasanthj/culvert has no multimodal surface (the repo
is a Hive ingest benchmark; see SURVEY §0) — this extends the
training-data multimodal family mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from culvert_spark.textops import _reliable_ckpt, min_label_components_doubling


def phash_value_clusters(
    feats: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
) -> DataFrame:
    """(phash, cluster_id) over the DISTINCT phash values of ``feats``,
    where two values share a cluster iff connected by a chain of pairs
    each within ``max_hamming`` bits. cluster_id is the lexicographic
    minimum bitstring of the component (deterministic at any
    parallelism). Requires ``max_hamming < bands`` (the exact
    pigeonhole recall guarantee) and ``bands`` dividing ``nbits``."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}) for "
            "the pigeonhole guarantee — a pair differing in >= bands "
            "bits can avoid sharing any band"
        )
    if nbits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide nbits ({nbits})")
    width = nbits // bands
    vals = feats.select("phash").distinct()
    # image_features emits min(width, 16)-char hashes, so an image
    # narrower than 16 px produces a SHORT phash: comparing it here
    # would read past the string (band substrings go empty, positions
    # beyond both lengths compare '' == '' equal) and silently merge
    # images of different geometry. Hard-fail with the offending widths
    # instead — group each width separately (distinct geometry is never
    # a near-duplicate of another).
    bad = (
        vals.where(F.length("phash") != nbits)
        .select(F.length("phash").alias("w"))
        .distinct()
        .limit(10)
        .collect()
    )
    if bad:
        raise ValueError(
            f"phash values must be exactly {nbits} chars; found widths "
            f"{sorted(r.w for r in bad)} — filter to one geometry (or "
            f"pass the matching nbits) and group each width separately"
        )
    band = vals.select(
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
    ).select(
        "phash",
        "b",
        F.expr(f"substring(phash, b * {width} + 1, {width})").alias("bits"),
    )
    cand = (
        band.alias("x")
        .join(band.alias("y"), ["b", "bits"])
        .where(F.col("x.phash") < F.col("y.phash"))
        .select(
            F.col("x.phash").alias("pa"), F.col("y.phash").alias("pb")
        )
        .distinct()
    )
    hamming = F.expr(
        f"size(filter(sequence(1, {nbits}), "
        f"i -> substring(pa, i, 1) != substring(pb, i, 1)))"
    )
    verified = cand.where(hamming <= max_hamming)
    # Symmetrize + self-loops so singleton values (no near neighbor)
    # still receive a label — the doubling helper derives its node set
    # from edges.src.
    edges = (
        verified.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(
            verified.select(
                F.col("pb").alias("src"), F.col("pa").alias("dst")
            )
        )
        .unionByName(
            vals.select(
                F.col("phash").alias("src"), F.col("phash").alias("dst")
            )
        )
        .distinct()
    )
    comp = min_label_components_doubling(
        edges, _reliable_ckpt(feats.sparkSession)
    )
    return comp.select(
        F.col("doc_id").alias("phash"), "cluster_id"
    )


def phash_near_dup_groups(
    feats: DataFrame,
    max_hamming: int = 2,
    bands: int = 4,
    nbits: int = 16,
) -> DataFrame:
    """Near-duplicate image groups from an ``image_features``-shaped
    frame (media_id, phash, ...): one row per phash cluster with the
    keeper (min media_id), image count, distinct-hash count, and dupe
    count — the fuzzy analog of ``image_dedup_groups``'s output. The
    (phash → cluster) table is broadcast (bounded value domain), so the
    per-image side pays one narrow join plus the single cluster_id
    aggregation shuffle."""
    clusters = phash_value_clusters(feats, max_hamming, bands, nbits)
    return (
        feats.join(F.broadcast(clusters), "phash")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.countDistinct("phash").alias("n_hashes"),
            F.min("media_id").alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .orderBy("cluster_id")
    )
