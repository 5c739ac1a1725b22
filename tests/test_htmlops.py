"""HTML extraction tests (culvert_spark.htmlops) — staged round 11 for
round-12/13 registrations (h_html_doc_stats, h_html_links)."""

from __future__ import annotations

from culvert_spark import htmlops as H


def test_fixture_deterministic():
    spec = H._HTML_DOCS[2]
    assert H.html_for_doc(*spec) == H.html_for_doc(*spec)


def test_boilerplate_script_style_comment_excluded():
    e = H.extract_html(H.html_for_doc(*H._HTML_DOCS[1]))
    assert "menu" not in e["text"] and "copyright" not in e["text"]
    assert "junk" not in e["text"] and "color" not in e["text"]
    assert "comment" not in e["text"]
    # chrome decoy links never reach the link table
    assert all("chrome" not in u for u, _ in e["links"])


def test_entities_decode_into_main_text():
    e = H.extract_html(H.html_for_doc(*H._HTML_DOCS[0]))
    assert e["text"].endswith("& < A")


def test_title_captured_and_excluded_from_body():
    spec = H._HTML_DOCS[3]
    e = H.extract_html(H.html_for_doc(*spec))
    assert e["title"] == H._html_title(spec[0])
    assert e["title"] not in e["text"]


def test_nested_chrome_and_unclosed_tags_tolerated():
    html = (
        "<title>t</title><body>"
        "<nav>outer <nav>inner</nav> still-chrome</nav>"
        "<p>real one</p>"
        "<footer>tail never closed"  # truncated document
    )
    e = H.extract_html(html)
    assert e["text"] == "real one"
    # fully malformed soup must not raise
    assert H.extract_html("<a href=><<<&&& <p")["n_tokens"] >= 0


def test_inline_tag_is_token_boundary():
    e = H.extract_html("<p>bo<b>ld</b> word</p>")
    assert e["text"] == "bo ld word"  # the documented lossy choice


def test_anchor_text_and_order():
    e = H.extract_html(
        '<p><a href="u1">first <b>link</b></a>'
        '<a href="u2">second</a><a>no-href skipped</a></p>'
    )
    assert e["links"] == [("u1", "first link"), ("u2", "second")]


def test_all_design_docs_match_expected():
    for spec in H._HTML_DOCS:
        got = H.extract_html(H.html_for_doc(*spec))
        exp = H._expected_doc(spec)
        assert got["title"] == exp["title"]
        assert got["n_headings"] == exp["n_headings"]
        assert got["links"] == exp["links"]
        for k in ("n_tokens", "n_chars", "text_digest"):
            assert got[k] == exp[k], (spec[0], k)


def test_staged_stats_oracle_matches(spark):
    import duckdb

    spdf = H.html_doc_stats(H.html_corpus(spark)).toPandas()
    ddf = duckdb.connect().execute(H.html_stats_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_staged_links_oracle_matches(spark):
    import duckdb

    spdf = H.html_links(H.html_corpus(spark)).toPandas()
    ddf = duckdb.connect().execute(H.html_links_oracle()).fetchdf()
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert len(a) == sum(s[3] for s in H._HTML_DOCS)  # chrome decoys absent


def test_extraction_plan_is_narrow(spark):
    df = H.html_doc_stats(H.html_corpus(spark))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Repartition" not in plan
