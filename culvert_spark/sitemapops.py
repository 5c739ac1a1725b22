"""Sitemap ingestion (sitemaps.org XML protocol) — crawl-frontier
seeds, fully DECLARATIVE.

robots.txt advertises per-host sitemaps (``robotsops`` collects the
lines); this module ingests the documents themselves — the third seed
source of a crawl frontier after discovered links (``htmlops.
html_links``) and the archive corpus (``warcops``/``warcsource``).
The sitemaps.org protocol (public spec) has two document shapes:
``<urlset>`` of ``<url>`` entries (loc, lastmod, changefreq,
priority) and ``<sitemapindex>`` of child ``<sitemap>`` references.

Unlike the byte-level container families (PDF/WARC — no Spark-native
parser exists for those), XML has a FIRST-CLASS Spark surface, so the
whole operator is JVM-side Catalyst expressions — ``from_xml`` with
explicit DDL schemas (both shapes tried; the mismatched shape parses
to NULL), ``explode``, ``try_to_date`` — with NO Python worker in the
plan (plan-gated: zero Arrow/Python evaluation nodes). This is the
deliberate contrast case in the extraction family: drop to
``mapInPandas`` only where no built-in parser exists (the build
brief's "UDFs are the slow path" rule).

Forgiving by construction: malformed XML parses to NULL structs and
contributes ZERO rows (pinned), missing optional fields are NULL, a
non-numeric ``<priority>`` is NULL (permissive cast), entity
references decode in the JVM parser, and an invalid ``lastmod``
yields a NULL ``lastmod_date`` via ``try_to_date`` while the raw
string is preserved.

Scale posture (100 TB): parse + explode are narrow; the only exchange
is the staged row's presentation sort. Output ``loc`` values feed
``urlops.canonical_url`` → ``frontier_dedup`` unchanged (composition
pinned).

Reference scope: prasanthj/culvert has no crawl surface (SURVEY §0).

Staged in round 12 for a round-13/14 registration slot
(``u_sitemap_urls`` vs ``sitemap_oracle()``, expected rows stated
from the design table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: priority is read as STRING and try_cast downstream: asking
#: from_xml for DOUBLE makes its permissive mode TRUNCATE the url
#: array at the first non-numeric <priority> (measured: entries after
#: the malformed one are dropped too) — string-then-try_cast keeps
#: every entry and NULLs only the bad field.
_URLSET_SCHEMA = (
    "url ARRAY<STRUCT<loc: STRING, lastmod: STRING, "
    "changefreq: STRING, priority: STRING>>"
)
_INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc: STRING, lastmod: STRING>>"

SITEMAP_COLS = (
    "host string, kind string, loc string, lastmod string, "
    "lastmod_date string, changefreq string, priority double"
)
#: lastmod_date is the PARSED date emitted as an ISO string, not a
#: DATE column: no registered query outputs raw DATE (verified by a
#: schema scan) because engines disagree on date canonicalization in
#: dataframe transfer (duckdb fetchdf returns Timestamps) — the
#: string form is the cross-engine-stable house style.


def sitemap_urls(docs: DataFrame) -> DataFrame:
    """(host, xml) -> one row per ``<url>`` entry (kind='url') and per
    child ``<sitemap>`` reference (kind='sitemap'); see the module
    docstring for the forgiveness rules. Pure JVM expressions."""
    parsed = docs.select(
        "host",
        F.from_xml("xml", _URLSET_SCHEMA).alias("u"),
        F.from_xml("xml", _INDEX_SCHEMA).alias("i"),
    )
    urls = (
        parsed.where(F.col("u.url").isNotNull())
        .select("host", F.explode("u.url").alias("e"))
        .select(
            "host",
            F.lit("url").alias("kind"),
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
            F.try_to_date("e.lastmod").cast("string")
            .alias("lastmod_date"),
            F.col("e.changefreq").alias("changefreq"),
            F.expr("try_cast(e.priority AS DOUBLE)").alias("priority"),
        )
    )
    subs = (
        parsed.where(
            F.col("i.sitemap").isNotNull() & F.col("u.url").isNull()
        )
        .select("host", F.explode("i.sitemap").alias("e"))
        .select(
            "host",
            F.lit("sitemap").alias("kind"),
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
            F.try_to_date("e.lastmod").cast("string")
            .alias("lastmod_date"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("double").alias("priority"),
        )
    )
    return urls.unionByName(subs)


# ---------------------------------------------------------------------------
# Design fixture + staged oracle
# ---------------------------------------------------------------------------

#: (host, kind, entries). urlset entries: (loc, lastmod | None,
#: changefreq | None, priority-literal | None — the STRING as written,
#: so 'high' pins the permissive NULL cast). index entries: (loc,
#: lastmod | None). 'bad.example' is not XML at all and must
#: contribute zero rows.
_SM_DOCS: list[tuple[str, str, object]] = [
    ("example.com", "urlset", [
        ("https://example.com/a?x=1&y=2", "2026-01-02", "daily", "0.8"),
        ("https://example.com/b", None, None, "0.5"),
        ("https://example.com/c", "not-a-date", "weekly", "high"),
    ]),
    ("example.com", "index", [
        ("https://example.com/sitemap-a.xml", "2026-01-03"),
        ("https://example.com/sitemap-b.xml", None),
    ]),
    ("other.org", "urlset", [
        ("https://other.org/p", "2025-12-31", None, None),
    ]),
    ("bad.example", "garbage", None),
]


def _sm_xml(kind: str, entries) -> str:
    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    if kind == "garbage":
        return "this is not xml at all <<<"

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;")

    if kind == "urlset":
        body = "".join(
            "<url><loc>" + esc(loc) + "</loc>"
            + (f"<lastmod>{lm}</lastmod>" if lm else "")
            + (f"<changefreq>{cf}</changefreq>" if cf else "")
            + (f"<priority>{pr}</priority>" if pr else "")
            + "</url>"
            for loc, lm, cf, pr in entries
        )
        return (f'<?xml version="1.0" encoding="UTF-8"?>'
                f'<urlset xmlns="{ns}">{body}</urlset>')
    body = "".join(
        "<sitemap><loc>" + esc(loc) + "</loc>"
        + (f"<lastmod>{lm}</lastmod>" if lm else "")
        + "</sitemap>"
        for loc, lm in entries
    )
    return f'<sitemapindex xmlns="{ns}">{body}</sitemapindex>'


def sitemap_fixture(spark: SparkSession) -> DataFrame:
    """(host, xml) frame of the design documents."""
    return spark.createDataFrame(
        [(h, _sm_xml(k, e)) for h, k, e in _SM_DOCS],
        "host string, xml string",
    )


def sitemap_oracle() -> str:
    """Constant-folding DuckDB oracle: expected rows stated from the
    design table (priority 'high' → NULL, lastmod 'not-a-date' →
    NULL date with the raw string preserved, garbage doc → no rows,
    entity references decoded)."""
    def q(s: str) -> str:
        return s.replace("'", "''")

    def lit(v, cast: str) -> str:
        return "NULL" if v is None else (
            f"'{q(v)}'" if cast == "s" else str(v)
        )

    rows = []
    for host, kind, entries in _SM_DOCS:
        if kind == "urlset":
            for loc, lm, cf, pr in entries:
                try:
                    prv = float(pr) if pr is not None else None
                except ValueError:
                    prv = None
                rows.append(
                    f"('{q(host)}', 'url', '{q(loc)}', {lit(lm, 's')}, "
                    f"CAST(TRY_CAST({lit(lm, 's')} AS DATE) AS VARCHAR), {lit(cf, 's')}, "
                    f"{lit(prv, 'n')})"
                )
        elif kind == "index":
            for loc, lm in entries:
                rows.append(
                    f"('{q(host)}', 'sitemap', '{q(loc)}', {lit(lm, 's')}, "
                    f"CAST(TRY_CAST({lit(lm, 's')} AS DATE) AS VARCHAR), NULL, NULL)"
                )
    vals = ",\n      ".join(rows)
    return f"""
    SELECT CAST(host AS VARCHAR) AS host, CAST(kind AS VARCHAR) AS kind,
           CAST(loc AS VARCHAR) AS loc,
           CAST(lastmod AS VARCHAR) AS lastmod,
           CAST(lastmod_date AS VARCHAR) AS lastmod_date,
           CAST(changefreq AS VARCHAR) AS changefreq,
           CAST(priority AS DOUBLE) AS priority
    FROM (VALUES
      {vals})
      AS t(host, kind, loc, lastmod, lastmod_date, changefreq, priority)
    ORDER BY host, kind, loc
    """


def u_sitemap_urls(spark: SparkSession) -> DataFrame:
    """Staged row body: the design documents through ``sitemap_urls``,
    presentation-sorted."""
    return sitemap_urls(sitemap_fixture(spark)).orderBy(
        "host", "kind", "loc"
    )
