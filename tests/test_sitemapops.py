"""Sitemap ingestion (culvert_spark.sitemapops) — staged round 12 for
round-13/14 registration: both document shapes, forgiveness rules, the
no-Python-in-plan gate, the staged oracle, and frontier composition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from culvert_spark import sitemapops as S


def _rows(spark):
    return [
        (r.host, r.kind, r.loc, r.lastmod, r.lastmod_date, r.changefreq,
         r.priority)
        for r in S.u_sitemap_urls(spark).collect()
    ]


def test_both_shapes_and_forgiveness_rules(spark):
    rows = _rows(spark)
    by_loc = {r[2]: r for r in rows}
    # entity reference decoded in loc
    assert "https://example.com/a?x=1&y=2" in by_loc
    a = by_loc["https://example.com/a?x=1&y=2"]
    assert a[1] == "url" and a[3] == "2026-01-02"
    assert a[4] == "2026-01-02"  # parsed date emitted as ISO string
    assert (a[5], a[6]) == ("daily", 0.8)
    # missing optionals -> NULL
    b = by_loc["https://example.com/b"]
    assert (b[3], b[4], b[5], b[6]) == (None, None, None, 0.5)
    # invalid lastmod: raw string kept, date NULL; 'high' priority NULL
    c = by_loc["https://example.com/c"]
    assert (c[3], c[4], c[6]) == ("not-a-date", None, None)
    # sitemapindex children
    sa = by_loc["https://example.com/sitemap-a.xml"]
    assert sa[1] == "sitemap" and sa[4] == "2026-01-03"
    # the garbage document contributes zero rows
    assert not any(r[0] == "bad.example" for r in rows)
    # full cardinality: 3 urls + 2 index refs + 1 other.org url
    assert len(rows) == 6


def test_staged_oracle_matches(spark):
    """Plain compare: lastmod_date is an ISO STRING by contract — no
    registered query outputs raw DATE (engines disagree on date
    transfer canonicalization; round-12 review of the staged row)."""
    import duckdb

    spdf = S.u_sitemap_urls(spark).toPandas()
    ddf = duckdb.connect().execute(S.sitemap_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_output_schema_is_the_stated_contract(spark):
    """SITEMAP_COLS is the operator's declared contract — pin it so a
    column change must update the constant in lockstep (round-12
    review: an unused DDL constant silently drifts)."""
    got = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in S.sitemap_urls(S.sitemap_fixture(spark)).schema.fields
    )
    assert got == S.SITEMAP_COLS


def test_plan_has_no_python_workers(spark):
    """The deliberate contrast case in the extraction family: XML has
    a first-class Spark parser, so the WHOLE operator must stay
    JVM-side — no Arrow/Python evaluation node anywhere in the plan
    (the build brief's 'UDFs are the slow path' rule)."""
    plan = S.sitemap_urls(S.sitemap_fixture(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "PythonMapInArrow"):
        assert marker not in plan, plan


def test_composes_with_url_frontier(spark):
    """Sitemap locs feed the frontier unchanged: canonicalize + dedup
    over the extracted url rows (kind='url') — all fixture locs are
    distinct and already canonical except the querystring one, which
    survives with its query sorted."""
    from culvert_spark import urlops as U

    locs = (
        S.u_sitemap_urls(spark)
        .where(F.col("kind") == "url")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.lit(1).alias("link_no"),
            F.col("loc").alias("url"),
        )
    )
    out = {r.canonical for r in U.frontier_dedup(locs).collect()}
    assert out == {
        "https://example.com/a?x=1&y=2",
        "https://example.com/b",
        "https://example.com/c",
        "https://other.org/p",
    }
