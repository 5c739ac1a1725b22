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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.queries import QUERIES, ORACLE, register  # noqa: F401
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
    # a near-duplicate of another). A NULL phash is malformed too
    # (length(NULL) != n is NULL, not true, so it would otherwise slip
    # past this guard and be dropped silently by the null-unsafe joins
    # below — round-8 ADVICE): reject it with the other bad widths.
    bad = (
        vals.where(
            F.col("phash").isNull() | (F.length("phash") != nbits)
        )
        .select(F.length("phash").alias("w"))
        .distinct()
        .limit(10)
        .collect()
    )
    if bad:
        raise ValueError(
            f"phash values must be exactly {nbits} chars; found widths "
            f"{sorted((r.w if r.w is not None else -1) for r in bad)} "
            f"(-1 = NULL) — filter to one geometry (or pass the matching "
            f"nbits) and group each width separately"
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


# ---------------------------------------------------------------------------
# Registered driver row: near-dup grouping over an encoder-real fixture
# ---------------------------------------------------------------------------

def _flip_bits(s: str, *positions: int) -> str:
    out = list(s)
    for p in positions:
        out[p] = "1" if out[p] == "0" else "0"
    return "".join(out)


#: Near-dup fixture DESIGN (the oracle's ground truth): five clusters of
#: three phash variants each — base, base with one bit flipped, base
#: with two bits flipped — so within a cluster every pair is within
#: Hamming distance 2 (a clique at max_hamming=2), plus two singleton
#: values. Bases are pairwise >= 8 bits apart and variants deviate <= 2
#: bits from their base, so every cross-cluster/singleton pair is >= 4
#: bits apart (verified exhaustively at import by
#: ``_check_near_dup_design``) — no chain can merge groups, making the
#: expected clustering a DESIGN CONSTANT, not an output of the code
#: under test. Every value has <= 8 one-bits so the constant-column
#: plane encoding below realizes it exactly (plane median stays below
#: the high-column value; see ``_plane_for_phash``).
_ND_CLUSTERS: list[list[str]] = [
    [b, _flip_bits(b, f1), _flip_bits(b, f1, f2)]
    for b, f1, f2 in [
        ("1111000000000000", 0, 1),
        ("0000111100000000", 4, 5),
        ("0000000011110000", 8, 9),
        ("0000000000001111", 12, 13),
        ("1010101010101010", 0, 2),
    ]
]
_ND_SINGLETONS = ["0011001100110011", "0101010001010100"]

#: Two encoded copies per phash variant: copy 0 is always PPM (so the
#: keeper is a PPM media_id, echoing the cross-format rows) and copy 1
#: cycles through the other real containers — the grouping must hold
#: across container boundaries, not just across bit flips.
_ND_COPIES = 2


def hamming_py(a: str, b: str) -> int:
    """Driver-side Hamming distance over two equal-width bitstrings —
    the single shared implementation for fixture checkers, oracle
    builders, and the streaming pair filters' exact verify (videoshots,
    audiosim, streaming.hamming_pair_stream)."""
    return sum(x != y for x, y in zip(a, b))


def pairs_values_oracle(rows: list[tuple], cols: list[str]) -> str:
    """The shared constant-folding SQL shape for within-radius PAIR
    oracles (videoshots/audiosim/pdfops streaming twins): a typed
    VALUES literal of integer tuples, BIGINT-cast and ordered on every
    column — or a typed EMPTY relation when the design yields no pairs
    (round-10 ADVICE: `FROM (VALUES )` is a syntax error). One
    implementation so a fix lands once, not per twin (round-11
    self-review: the empty-guard had to be applied three times)."""
    if not rows:
        sel = ", ".join(f"CAST(NULL AS BIGINT) AS {c}" for c in cols)
        return f"""
    SELECT {sel}
    WHERE FALSE
    """
    vals = ",\n      ".join(
        "(" + ", ".join(str(v) for v in row) + ")" for row in rows
    )
    sel = ",\n           ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"""
    SELECT {sel}
    FROM (VALUES
      {vals})
      AS t({", ".join(cols)})
    ORDER BY {", ".join(cols)}
    """


def _check_near_dup_design() -> None:
    ham = hamming_py
    allv = [v for cl in _ND_CLUSTERS for v in cl] + _ND_SINGLETONS
    assert len(set(allv)) == len(allv), "fixture phashes must be distinct"
    assert all(len(v) == 16 and v.count("1") <= 8 for v in allv)
    for cl in _ND_CLUSTERS:
        assert all(
            ham(a, b) <= 2 for i, a in enumerate(cl) for b in cl[i + 1:]
        ), "within-cluster pair exceeds the radius"
    groups = _ND_CLUSTERS + [[s] for s in _ND_SINGLETONS]
    for i, gi in enumerate(groups):
        for gj in groups[i + 1:]:
            assert all(ham(a, b) >= 3 for a in gi for b in gj), (
                "cross-group pair within the radius — ground truth broken"
            )


_check_near_dup_design()


def _plane_for_phash(phash: str) -> np.ndarray:
    """A 16x16 gray plane whose column-profile phash IS ``phash``:
    1-bit columns at luma 200, 0-bit columns at 50. With <= 8 high
    columns the plane median is 50 (or 125 at exactly 8), so column
    mean 200 > median and 50 <= median — the feature extractor reads
    the bits back exactly."""
    vals = np.where(np.array(list(phash)) == "1", 200, 50).astype(np.uint8)
    return np.broadcast_to(vals, (16, 16)).copy()


def near_dup_media(spark: SparkSession) -> DataFrame:
    """(media_id, kind, payload, meta) fixture corpus: every fixture
    phash realized as real pixels and ENCODED through the production
    container writers (mediagen) — copy 0 PPM, copy 1 a rotating other
    container — so the registered row exercises encode → real decode →
    phash extraction → Hamming-LSH grouping end-to-end. media_id
    scheme: cluster c, variant v, copy k → 1000c + 10v + k; singleton
    s, copy k → 9000 + 100s + k (keepers = the PPM copies)."""
    from culvert_spark.mediagen import ENCODERS

    spec = []  # (media_id, phash, container_idx)
    alt = 0
    for c, cl in enumerate(_ND_CLUSTERS):
        for v, ph in enumerate(cl):
            for k in range(_ND_COPIES):
                idx = 0 if k == 0 else 1 + alt % (len(ENCODERS) - 1)
                spec.append((1000 * c + 10 * v + k, ph, idx))
                alt += k  # advance the rotation once per variant
    for s, ph in enumerate(_ND_SINGLETONS):
        for k in range(_ND_COPIES):
            idx = 0 if k == 0 else 1 + alt % (len(ENCODERS) - 1)
            spec.append((9000 + 100 * s + k, ph, idx))
            alt += k
    spec_df = spark.createDataFrame(
        spec, "media_id bigint, phash string, enc int"
    )

    schema = (
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, ph, enc_i in zip(
                pdf["media_id"], pdf["phash"], pdf["enc"]
            ):
                plane = _plane_for_phash(ph)
                rgb = np.repeat(plane[:, :, None], 3, axis=2)
                rows.append({
                    "media_id": int(mid),
                    "kind": "image",
                    "payload": ENCODERS[int(enc_i)][1](rgb),
                    "meta": {"width": 16, "height": 16,
                             "sample_rate": 0, "n_frames": 1},
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spec_df.mapInPandas(encode, schema)


def _near_dup_oracle() -> str:
    """Constant-folding DuckDB oracle from the fixture DESIGN (the same
    constants ``near_dup_media`` encodes, independently re-stated as
    literals — NOT derived from the clustering code): cluster_id is the
    lexicographic-min member (phash_value_clusters' documented label),
    each cluster holds 3 variants x 2 copies, singletons 1 x 2."""
    rows = []
    for c, cl in enumerate(_ND_CLUSTERS):
        rows.append((min(cl), 3 * _ND_COPIES, 3, 1000 * c))
    for s, ph in enumerate(_ND_SINGLETONS):
        rows.append((ph, _ND_COPIES, 1, 9000 + 100 * s))
    vals = ",\n      ".join(
        f"('{cid}', {ni}, {nh}, {kid}, {ni - 1})"
        for cid, ni, nh, kid in rows
    )
    return f"""
    SELECT cluster_id,
           CAST(n_images AS BIGINT) AS n_images,
           CAST(n_hashes AS BIGINT) AS n_hashes,
           CAST(keeper_id AS BIGINT) AS keeper_id,
           CAST(n_dupes AS BIGINT) AS n_dupes
    FROM (VALUES
      {vals})
      AS t(cluster_id, n_images, n_hashes, keeper_id, n_dupes)
    ORDER BY cluster_id
    """


@register("m_phash_near_dup_groups", _near_dup_oracle())
def m_phash_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-LSH fuzzy image dedup as a FULL hash row: the fixture's
    five 3-variant phash cliques (bit-flipped re-encodes of a base
    image — the slight-noise shape exact-phash dedup misses) plus two
    singletons must group exactly as designed, across real container
    boundaries (PPM keeper + rotating PNG/BMP/QOI/TIFF/JLS copies).
    ``sf_dir`` is unused: like the cross-format rows the ground truth
    is a shipped deterministic fixture, constant at every scale factor;
    the operator itself (``phash_near_dup_groups``) is corpus-generic.
    Any decoder regression, banding bug (off-by-one slice), Hamming
    miscount, or component-labeling fault hash-mismatches against the
    design constants."""
    from culvert_spark.multimodal import image_features

    return phash_near_dup_groups(image_features(near_dup_media(spark)))
