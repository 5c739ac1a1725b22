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


def test_unbalanced_anchor_autocloses_and_eof_flushes():
    """Browsers auto-close an open <a> when a new one starts, and a
    truncated document must not swallow its last link (self-review)."""
    e = H.extract_html(
        '<p><a href="u1">one <a href="u2">two</a></p>'
        '<p><a href="u3">dangling till eof'
    )
    assert e["links"] == [("u1", "one"), ("u2", "two"), ("u3",
                                                         "dangling till eof")]


def test_first_title_wins_and_svg_title_ignored():
    e = H.extract_html(
        "<title>Doc</title><body><svg><title>icon tooltip</title></svg>"
        "<p>x</p><title>late</title></body>"
    )
    assert e["title"] == "Doc"
    assert "icon" not in e["title"] and "late" not in e["title"]
    # late/SVG title CONTENT is suppressed, not body text: two pages
    # identical except for an SVG icon tooltip must digest EQUAL
    # (round-11 review)
    assert "tooltip" not in e["text"] and "late" not in e["text"]
    assert e["text"] == "x"
    # a title inside chrome never becomes the document title
    e2 = H.extract_html("<nav><title>menu</title></nav><title>real</title>")
    assert e2["title"] == "real"
    # ...and chrome still owns its close: the </title> inside <nav> must
    # not decrement the late-title counter (separate counters)
    e3 = H.extract_html(
        "<title>T</title><nav><title>menu</title></nav><p>body</p>"
    )
    assert e3["title"] == "T" and e3["text"] == "body"


def test_late_title_nesting_and_recovery():
    """Round-12 review pair: (a) a title nested INSIDE a late title
    deepens the counter, so its close cannot un-suppress the outer
    tooltip's remainder; (b) an UNCLOSED late title (truncated SVG
    tooltip) is closed by the next non-title tag event — title's
    content model is text-only — so one malformed tooltip cannot blank
    the rest of the document."""
    e = H.extract_html(
        "<title>Doc</title><p>x</p>"
        "<svg><title>tip<title>inner</title>LEAK</title></svg>"
    )
    assert e["title"] == "Doc" and e["text"] == "x"
    # unclosed tooltip: </svg> recovers; body text/links keep flowing
    e2 = H.extract_html(
        "<title>Doc</title><p>x</p><svg><title>tip</svg>"
        "<h1>h</h1><p>body text here</p><a href='/y'>link</a>"
    )
    assert e2["text"] == "x h body text here link"
    assert e2["n_headings"] == 1
    assert e2["links"] == [("/y", "link")]
    # recovery also fires on a START tag (tooltip left open, <p> next)
    e3 = H.extract_html(
        "<title>Doc</title><svg><title>tip<p>kept words</p></svg>"
    )
    assert e3["text"] == "kept words"


def test_null_html_is_empty_document(spark):
    """A null html cell is an EMPTY document — not the text 'None'
    collapsing every null row into one bogus digest group."""
    df = spark.createDataFrame(
        [(1, "<p>hi there</p>"), (2, None)], "doc_id bigint, html string"
    )
    rows = {r.doc_id: r for r in H.html_doc_stats(df).collect()}
    assert rows[2].n_tokens == 0 and rows[2].n_chars == 0
    import hashlib

    assert rows[2].text_digest == hashlib.md5(b"").hexdigest()
    assert H.html_links(df).count() == 0


# ---------------------------------------------------------------------------
# Property tests (hypothesis)
# ---------------------------------------------------------------------------

import html as _stdhtml  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

_HPROP = settings(max_examples=40, deadline=None)
_htext = st.text(
    alphabet=st.sampled_from("abc xyz018&<>\"'é"), min_size=0, max_size=60
)


@_HPROP
@given(text=_htext)
def test_prop_escaped_text_roundtrips(text):
    """html.escape -> extract == whitespace-collapsed original, for
    arbitrary markup-significant characters."""
    e = H.extract_html(f"<p>{_stdhtml.escape(text)}</p>")
    assert e["text"] == " ".join(text.split())


@_HPROP
@given(texts=st.lists(_htext.filter(lambda t: t.strip()), min_size=1,
                      max_size=5))
def test_prop_paragraph_concatenation(texts):
    html_doc = "".join(f"<p>{_stdhtml.escape(t)}</p>" for t in texts)
    e = H.extract_html(html_doc)
    assert e["text"] == " ".join(" ".join(texts).split())


@_HPROP
@given(junk=st.text(alphabet=st.sampled_from("<>&\"'=/ab "), min_size=0,
                    max_size=80))
def test_prop_malformed_soup_never_raises(junk):
    e = H.extract_html(junk)
    assert e["n_tokens"] >= 0 and isinstance(e["links"], list)
