"""Staged trainprep operators (round 11 -> round-12/13 registration
candidates): per-source document cap."""

from __future__ import annotations

import pytest

from culvert_spark.trainprep import (
    _CAP_K,
    source_cap_oracle_sql,
    source_cap_sample,
)
from culvert_spark.queries import t
from tests.conftest import SF_MED, SF_SMALL, duck_with_views


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_source_cap_matches_oracle_both_sfs(spark, duck, sf_dir):
    """The deterministic hash cap must agree with the DuckDB QUALIFY
    twin row-for-row at both shipped SFs (md5 hex parity is the same
    cross-engine premise the IVF seeding registered)."""
    got = sorted(
        (r.doc_id, r.source, r.cap_rank)
        for r in source_cap_sample(t(spark, sf_dir, "documents")).collect()
    )
    con = duck_with_views(duck, sf_dir)
    exp = sorted(
        tuple(r) for r in con.execute(source_cap_oracle_sql()).fetchall()
    )
    assert got == exp
    # the cap must actually BITE (every shipped SF has >k docs/source)
    per_source: dict[str, int] = {}
    for _, src, rank in got:
        per_source[src] = max(per_source.get(src, 0), rank)
    assert all(v == _CAP_K for v in per_source.values())


def test_source_cap_partitioning_invariant(spark):
    """Same kept set at a pathological input partitioning — the rank is
    a pure function of (doc_id, source), not of arrival order."""
    docs = t(spark, SF_SMALL, "documents")
    a = source_cap_sample(docs).collect()
    b = source_cap_sample(docs.repartition(13, "n_chars")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
