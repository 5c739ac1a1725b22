"""imagesim: Hamming-distance LSH near-dup grouping over perceptual
hashes — hand-built clusters, randomized union-find cross-check,
pigeonhole completeness, and the bounded-value-domain plan shape.
Staged for a round-9 driver row (m_phash_near_dup_groups)."""

from __future__ import annotations

import random

import pytest

from culvert_spark.imagesim import phash_near_dup_groups, phash_value_clusters

NBITS = 16


def _bits(x: int) -> str:
    return format(x, f"0{NBITS}b")


def _flip(s: str, *positions: int) -> str:
    out = list(s)
    for p in positions:
        out[p] = "1" if out[p] == "0" else "0"
    return "".join(out)


def _feats(spark, rows):
    return spark.createDataFrame(rows, "media_id bigint, phash string")


def _brute_clusters(hashes: list[str], max_hamming: int) -> dict[str, str]:
    """Independent reference: union-find over all pairs within distance."""
    parent = {h: h for h in hashes}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, a in enumerate(hashes):
        for b in hashes[i + 1 :]:
            if sum(x != y for x, y in zip(a, b)) <= max_hamming:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member of the component
    members: dict[str, list[str]] = {}
    for h in hashes:
        members.setdefault(find(h), []).append(h)
    return {h: min(ms) for r, ms in members.items() for h in ms}


def test_hand_built_clusters_and_keepers(spark):
    """Two fuzzy clusters + a singleton: flips within max_hamming group,
    a transitive chain (a~b 2 bits, b~c 2 bits, a~c 4 bits) still forms
    ONE cluster, and keepers are the min media_id of each group."""
    a = _bits(0b1010101010101010)
    b = _flip(a, 0, 7)          # 2 bits from a
    c = _flip(b, 3, 12)         # 2 bits from b, 4 from a
    lone = _bits(0b0000111100001111)
    rows = [(10, a), (11, a), (12, b), (13, c), (20, lone)]
    got = {
        r.cluster_id: (r.n_images, r.n_hashes, r.keeper_id, r.n_dupes)
        for r in phash_near_dup_groups(_feats(spark, rows)).collect()
    }
    big = min(a, b, c)
    assert got == {
        big: (4, 3, 10, 3),
        lone: (1, 1, 20, 0),
    }


def test_distance_beyond_radius_not_grouped(spark):
    """3 bits apart at max_hamming=2 stays separate (and 3 < bands=4 so
    the pair IS a candidate — rejected by the exact verify, not by band
    luck)."""
    a = _bits(0b1111000011110000)
    d3 = _flip(a, 1, 2, 3)
    rows = [(1, a), (2, d3)]
    got = phash_near_dup_groups(_feats(spark, rows)).collect()
    assert len(got) == 2 and all(r.n_images == 1 for r in got)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_union_find_cross_check(spark, seed):
    """Random value sets (drawn near a few seeds so distances spread
    across the radius) must match an independent union-find clustering
    over ALL pairs — recall 1.0, precision 1.0, transitivity included."""
    rng = random.Random(seed)
    hashes = set()
    for _ in range(6):
        center = rng.getrandbits(NBITS)
        hashes.add(_bits(center))
        for _ in range(6):
            k = rng.randint(1, 4)
            flipped = _flip(
                _bits(center), *rng.sample(range(NBITS), k)
            )
            hashes.add(flipped)
    hashes = sorted(hashes)
    want = _brute_clusters(hashes, max_hamming=2)
    rows = [(i, h) for i, h in enumerate(hashes)]
    got = {
        r.phash: r.cluster_id
        for r in phash_value_clusters(_feats(spark, rows)).collect()
    }
    assert got == want


def test_pigeonhole_completeness_dense(spark):
    """Every pair within the radius around one center is grouped — a
    dense ball where band boundaries land on every possible split, so a
    banding bug (off-by-one slice, wrong width) cannot hide."""
    center = _bits(0b0110100110010110)
    ball = {center} | {_flip(center, i) for i in range(NBITS)}
    rows = [(i, h) for i, h in enumerate(sorted(ball))]
    got = phash_near_dup_groups(_feats(spark, rows)).collect()
    # all 17 values are within 2 bits of each other via the center
    assert len(got) == 1
    assert got[0].n_images == 17 and got[0].n_hashes == 17


def test_parameter_validation(spark):
    f = _feats(spark, [(1, _bits(0))])
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_groups(f, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        phash_near_dup_groups(f, bands=3)


def test_null_phash_rejected(spark):
    """length(NULL) != n is NULL (not true), so a NULL phash would slip
    past a naive width guard and then vanish silently in the null-unsafe
    band joins — the guard must reject it loudly with the other
    malformed widths (round-8 ADVICE)."""
    f = _feats(spark, [(1, _bits(0)), (2, None)])
    with pytest.raises(ValueError, match="exactly 16 chars"):
        phash_near_dup_groups(f)


def test_registered_near_dup_row_matches_design(spark):
    """The registered m_phash_near_dup_groups row (fixture planes →
    real container encoders → real decoders → phash → Hamming-LSH →
    components) must land exactly on the fixture DESIGN constants —
    the same ground truth the DuckDB oracle states as literals,
    re-derived here independently from _ND_CLUSTERS/_ND_SINGLETONS."""
    from culvert_spark.imagesim import (
        _ND_CLUSTERS,
        _ND_COPIES,
        _ND_SINGLETONS,
        QUERIES,
    )

    want = {}
    for c, cl in enumerate(_ND_CLUSTERS):
        want[min(cl)] = (3 * _ND_COPIES, 3, 1000 * c, 3 * _ND_COPIES - 1)
    for s, ph in enumerate(_ND_SINGLETONS):
        want[ph] = (_ND_COPIES, 1, 9000 + 100 * s, _ND_COPIES - 1)
    got = {
        r.cluster_id: (r.n_images, r.n_hashes, r.keeper_id, r.n_dupes)
        for r in QUERIES["m_phash_near_dup_groups"](spark, "unused").collect()
    }
    assert got == want


def test_near_dup_fixture_exercises_every_container(spark):
    """The copy-1 rotation must cover all five non-PPM encoders (the
    row's cross-container claim is only as strong as its coverage)."""
    from culvert_spark.imagesim import near_dup_media
    from culvert_spark.mediagen import ENCODERS

    # copy-1 ids all end in 1 (1000c + 10v + 1 and 9000 + 100s + 1)
    payloads = [
        bytes(r.payload)
        for r in near_dup_media(spark).collect()
        if r.media_id % 10 == 1
    ]
    magic = {
        "ppm": b"P6",
        "png": b"\x89PNG",
        "bmp": b"BM",
        "qoi": b"qoif",
        "tiff": b"II*\x00",
        "jls": b"\xff\xd8",
    }
    seen = {
        name
        for name, _ in ENCODERS
        for p in payloads
        if p.startswith(magic[name])
    }
    assert {"png", "bmp", "qoi", "tiff", "jls"} <= seen


def test_short_phash_rejected(spark):
    """image_features emits min(width,16)-char hashes, so an image
    narrower than 16 px yields a short phash; comparing it would read
    past the string and silently merge different geometries — the
    function must hard-fail with the offending widths instead (review
    finding r8)."""
    f = _feats(spark, [(1, _bits(0)), (2, "0101")])
    with pytest.raises(ValueError, match="exactly 16 chars"):
        phash_near_dup_groups(f)
    # and grouping a uniform non-16 width works when nbits says so
    rows = [(1, "01010101"), (2, "01010100"), (3, "10101010")]
    got = phash_near_dup_groups(
        _feats(spark, rows), max_hamming=1, bands=2, nbits=8
    ).collect()
    assert {(r.n_images, r.keeper_id) for r in got} == {(2, 1), (1, 3)}


def test_value_domain_broadcast_plan(spark):
    """The per-image join is a BroadcastHashJoin on the bounded value
    table — the image stream never enters a pair join."""
    rows = [(i, _bits(i % 7)) for i in range(100)]
    df = phash_near_dup_groups(_feats(spark, rows))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
