"""Pre-verify the STAGED (not yet registered) row bodies against their
oracles under the exact driver-contract comparison — vanilla
SparkSession, DuckDB, and the same ``canon()`` normalization as
``tools/drive_driver_contract.py`` (kept byte-identical; that script
stays the authoritative emulator for REGISTERED rows). pytest's
str-tuple compares catch value drift but not comparison-layer
surprises (float repr, date/timestamp isoformat, NULL spelling); this
drives each staged pair through the registration-day compare so a
future ``@register`` cannot be the first time the pair meets it.

Usage: ``python tools/drive_staged.py [names...]`` (subset via argv,
all staged pairs otherwise). Expect ``STAGED: ALL MATCH``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.appName("staged-pair-drive")
    .master(os.environ.get("CONTRACT_MASTER", "local[8]"))
    .getOrCreate()
)

from culvert_spark import (  # noqa: E402
    pdfops,
    robotsops,
    sitemapops,
    urlops,
    warcops,
    warcsource,
)

#: name -> (body thunk, oracle SQL). Mirrors the ROUND-14 ROTATION
#: note's registration one-liners exactly
#: (st_pdf_layout_dedup_replay and w_warc_doc_stats left this table
#: when round 13 registered them — drive_driver_contract.py is the
#: authoritative emulator for registered rows).
STAGED = {
    "m_pdf_xref_stream": (
        lambda: pdfops.m_pdf_xref_stream_staged(spark),
        pdfops.pdf_xref_oracle(),
    ),
    "m_pdf_cid_text": (
        lambda: pdfops.m_pdf_cid_text_staged(spark),
        pdfops.pdf_cid_oracle(),
    ),
    "u_url_canonicalize": (
        lambda: urlops.u_url_canonicalize(spark),
        urlops.url_canonicalize_oracle(),
    ),
    "u_frontier_dedup": (
        lambda: urlops.u_frontier_dedup(spark),
        urlops.frontier_oracle(),
    ),
    "u_robots_filter": (
        lambda: robotsops.u_robots_filter(spark),
        robotsops.robots_oracle(),
    ),
    "pds_warc_pages": (
        lambda: warcsource.warc_source_pages(spark),
        warcsource.warc_pages_oracle(),
    ),
    "pds_warc_stream": (
        lambda: warcsource.warc_stream_replay(spark),
        warcsource.warc_pages_oracle(),
    ),
    "w_wet_roundtrip": (
        lambda: warcops.w_wet_roundtrip(spark),
        warcops.wet_roundtrip_oracle(),
    ),
    "u_sitemap_urls": (
        lambda: sitemapops.u_sitemap_urls(spark),
        sitemapops.sitemap_oracle(),
    ),
}


def canon(pdf):  # byte-identical to tools/drive_driver_contract.py
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = []
    for tup in pdf.itertuples(index=False, name=None):
        r = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                r.append("NULL")
            elif isinstance(v, float):
                r.append(repr(v))
            elif hasattr(v, "isoformat"):
                r.append(v.isoformat())
            else:
                r.append(str(v))
        out.append(tuple(r))
    out.sort()
    return cols, out


con = duckdb.connect()
pairs = STAGED
if len(sys.argv) > 1:
    want = set(sys.argv[1:])
    unknown = want - pairs.keys()
    if unknown:
        print(f"STAGED: UNKNOWN NAMES {sorted(unknown)}")
        sys.exit(2)
    pairs = {k: v for k, v in pairs.items() if k in want}
fails = []
for name, (thunk, osql) in sorted(pairs.items()):
    try:
        sc, sr = canon(thunk().toPandas())
        dc, dr = canon(con.execute(osql).fetchdf())
        ok = sc == dc and sr == dr
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(sr)} rows)")
        if not ok:
            fails.append(name)
            if sc != dc:
                print(f"    cols: {sc} vs {dc}")
            else:
                d = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
                print(f"    first diffs: {d}")
    except Exception as ex:  # noqa: BLE001 — report and continue
        fails.append(name)
        print(f"  {name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
print("STAGED:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
