"""mediagen: the minimal production encoders round-trip through the
real decoders bit-exactly (lossless containers), and the registered
cross-format dedup row collapses the five containers per document."""

from __future__ import annotations

import numpy as np
import pytest

from culvert_spark import mediagen as mg
from culvert_spark import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


def _luma(rgb: np.ndarray) -> np.ndarray:
    luma = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2])
    return np.round(luma).astype(np.uint8)


@pytest.mark.parametrize("name,enc", mg.ENCODERS)
def test_encoders_roundtrip_through_real_decoders(name, enc):
    """Every container of the same pixels decodes to the same luma via
    the REAL decode dispatch (no stub path involved)."""
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = enc(rgb)
    plane = mm._decode_image(payload, 16, 16)
    assert plane.shape == (16, 16)
    assert (plane == _luma(rgb)).all()


def test_encoders_distinct_bytes_same_pixels():
    """The six payloads are byte-distinct (a byte-hash dedup would keep
    all six) while pixel-identical."""
    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payloads = [enc(rgb) for _, enc in mg.ENCODERS]
    assert len({p for p in payloads}) == 6
    planes = [mm._decode_image(p, 16, 16) for p in payloads]
    for p in planes[1:]:
        assert (p == planes[0]).all()


@pytest.mark.parametrize("dims", [(7, 13), (5, 5), (9, 2)])
@pytest.mark.parametrize("name,enc", mg.ENCODERS)
def test_encoders_roundtrip_odd_geometry(name, enc, dims):
    """Non-square / odd dims exercise the padding paths (BMP 4-byte row
    pad, TIFF strip byte counts, PNG per-row filter bytes, lossless-JPEG
    row wrap at odd width) — every container still decodes to the same
    luma bit-exactly."""
    h, w = dims
    rng = np.random.default_rng(h * 100 + w)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    plane = mm._decode_image(enc(rgb), w, h)
    assert plane.shape == (h, w)
    assert (plane == _luma(rgb)).all()


def test_cross_format_dedup_odd_geometry_collapses(spark):
    """The registered odd-geometry row's ground truth, checked
    collision-tolerantly (the registered oracle additionally pins the
    no-collision shape for the shipped test data)."""
    got = mg.cross_format_dedup(spark, SF_DIR, n_docs=10, width=13, height=7).collect()
    assert sum(r.n_images for r in got) == 60
    for r in got:
        assert r.n_images % 6 == 0 and r.n_images >= 6
        assert r.n_dupes == r.n_images - 1
        assert r.keeper_id % 8 == 0


def test_md5_plane_deterministic_and_length():
    a = mg._md5_plane("hello", 768)
    b = mg._md5_plane("hello", 768)
    c = mg._md5_plane("world", 768)
    assert a == b and len(a) == 768
    assert a != c


def test_cross_format_media_shape(spark):
    df = mg.cross_format_media(spark, SF_DIR, n_docs=6)
    rows = df.collect()
    assert len(rows) == 36
    # six container copies per doc, media_id = doc_id*8 + [0..5]
    subs = sorted(r.media_id % 8 for r in rows)
    assert subs == sorted(list(range(6)) * 6)


def test_cross_format_dedup_collapses_containers(spark):
    got = mg.cross_format_dedup(spark, SF_DIR, n_docs=12).collect()
    # every group holds 6·k copies (k docs per 16-bit phash, usually 1)
    assert sum(r.n_images for r in got) == 72
    for r in got:
        assert r.n_images % 6 == 0 and r.n_images >= 6
        assert r.n_dupes == r.n_images - 1
        # keeper is always a PPM copy (sub-index 0 = min media_id)
        assert r.keeper_id % 8 == 0


def test_cross_format_collision_guard_raises(spark):
    """A phash collision between doc planes collapses two 6-container
    groups into one 12-image group; the invariant projection must turn
    that into a diagnosable error pointing at the oracle's caveat, not
    an opaque driver hash mismatch (round-8 ADVICE). Since round 10 the
    guard lives IN the plan (raise_error, no eager probe/persist —
    round-9 ADVICE), so it fires when the plan EXECUTES."""
    groups = spark.createDataFrame(
        [(0, 12, 11), (16, 6, 5)],
        "keeper_id bigint, n_images bigint, n_dupes bigint",
    )
    with pytest.raises(Exception, match="collision"):
        mm._cross_format_invariants(groups).collect()
    # clean groups pass through untouched
    ok = spark.createDataFrame(
        [(0, 6, 5), (8, 6, 5)],
        "keeper_id bigint, n_images bigint, n_dupes bigint",
    )
    got = mm._cross_format_invariants(ok).collect()
    assert [(r.keeper_id, r.keeper_fmt_idx) for r in got] == [(0, 0), (8, 0)]


def test_collision_guard_survives_single_column_pruning(spark):
    """The in-plan guard lives in the n_images column expression, so a
    consumer that prunes n_images would silently skip the safety check
    (round-10 ADVICE). Two backstops: (a) even under single-column
    pruning of every OTHER column the guard still fires as long as
    n_images itself is kept — pinned here on a violating frame — and
    (b) a source-level contract: every production call site of
    _cross_format_invariants is enumerated, so adding a caller fails
    this test until its projection provably keeps n_images."""
    bad = spark.createDataFrame(
        [(0, 12, 11)], "keeper_id bigint, n_images bigint, n_dupes bigint"
    )
    # (a) pruning down TO n_images alone still evaluates the guard
    with pytest.raises(Exception, match="collision"):
        mm._cross_format_invariants(bad).select("n_images").collect()
    # ...while pruning n_images AWAY skips it — the documented narrowing
    # this contract test exists to police in future callers.
    assert (
        mm._cross_format_invariants(bad).select("keeper_id").collect()[0][0]
        == 0
    )
    # (b) enumerate production call sites; each known one keeps n_images
    # in its projection (the registered rows return the full invariant
    # frame). A NEW caller must be audited for that and added here.
    import re
    from pathlib import Path

    pkg = Path(mm.__file__).resolve().parent
    call_lines = [
        (py.name, i)
        for py in sorted(pkg.glob("*.py"))
        for i, line in enumerate(py.read_text().splitlines(), start=1)
        if re.search(r"_cross_format_invariants\s*\(", line)
        and "def _cross_format_invariants" not in line
    ]
    assert [name for name, _ in call_lines] == ["multimodal.py"] * 2, (
        f"new _cross_format_invariants caller(s) {call_lines}: verify the "
        "caller keeps n_images projected (the collision guard lives in "
        "that column) and extend this contract test."
    )
