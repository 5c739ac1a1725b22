"""robots.txt evaluation (culvert_spark.robotsops) — staged round 12
for round-13/14 registration: RFC 9309 parser/group/precedence
semantics against the hand-stated design tables, the broadcast plan
gate, the staged DuckDB oracle, and composition with the urlops
frontier."""

from __future__ import annotations

import pytest

from culvert_spark import robotsops as R


def test_every_design_case_by_hand():
    """Each hand-stated verdict (group exclusivity, longest-match,
    $ anchor, wildcard, missing file, query-in-path, percent
    consistency, empty-UA inertness) must hold in pure python on the
    CANONICAL axis before Spark ever sees it."""
    from culvert_spark.urlops import canonical_url, url_host

    for i, raw, want_allowed, want_delay in R._ROBOTS_CASES:
        canon = canonical_url(raw)
        host = url_host(canon)
        txt = R._ROBOTS_FILES.get(host)
        if txt is None:
            assert want_allowed is True and want_delay is None
            continue
        rules, delay = R.rules_for_agent(R.parse_robots(txt)[0])
        assert R.is_allowed(rules, R._path_of(canon)) == want_allowed, i
        assert delay == want_delay, i


def test_specific_group_excludes_star_rules():
    """§2.2.1: when a specific user-agent group matches, the '*'
    group's rules do NOT merge in — /private/ is only disallowed for
    generic crawlers."""
    groups, _ = R.parse_robots(R._ROBOTS_FILES["example.com"])
    star_rules, star_delay = R.rules_for_agent(groups, "somebot")
    cb_rules, cb_delay = R.rules_for_agent(groups, "culvertbot")
    assert not R.is_allowed(star_rules, "/private/x")
    assert R.is_allowed(cb_rules, "/private/x")
    assert (star_delay, cb_delay) == (7.0, 2.0)


def test_allow_wins_exact_length_tie():
    """§2.2.2: equal-length Allow and Disallow — Allow wins."""
    rules = [("disallow", "/page"), ("allow", "/page")]
    assert R.is_allowed(rules, "/page/sub")


def test_multi_agent_lines_share_one_group():
    groups, _ = R.parse_robots(R._ROBOTS_FILES["other.org"])
    for agent in ("megabot", "otherbot"):
        rules, _ = R.rules_for_agent(groups, agent)
        assert not R.is_allowed(rules, "/anything")


def test_longest_ua_prefix_wins():
    txt = (
        "User-agent: culvert\nDisallow: /\n\n"
        "User-agent: culvertbot\nAllow: /\n"
    )
    groups, _ = R.parse_robots(txt)
    rules, _ = R.rules_for_agent(groups, "culvertbot")
    assert R.is_allowed(rules, "/x")  # the MORE specific group won


def test_empty_disallow_and_preamble_rules_ignored():
    txt = "Disallow: /orphan\nUser-agent: *\nDisallow:\n"
    groups, _ = R.parse_robots(txt)
    rules, _ = R.rules_for_agent(groups, "anybot")
    assert R.is_allowed(rules, "/orphan")  # preamble rule dropped
    assert R.is_allowed(rules, "/x")       # empty pattern matches nothing


def test_sitemaps_collected_document_wide():
    _, sitemaps = R.parse_robots(R._ROBOTS_FILES["example.com"])
    assert sitemaps == ["https://example.com/sitemap.xml"]


def test_none_text_never_raises():
    groups, sitemaps = R.parse_robots(None)
    assert groups == [] and sitemaps == []
    assert R.is_allowed([], "/x")


def test_percent_encoded_rule_matches_canonical_path():
    """§2.2.2 percent consistency (round-12 review): an encoded
    Disallow pattern ('/%7Ejoe/') must match the canonicalized path
    ('/~joe/...') — patterns are normalized with the SAME rule the
    canonicalizer applies."""
    groups, _ = R.parse_robots("User-agent: *\nDisallow: /%7Ejoe/\n")
    rules, _ = R.rules_for_agent(groups, "anybot")
    assert not R.is_allowed(rules, "/~joe/secret")
    # ...and uppercase-hex consistency for escapes that must stay
    groups2, _ = R.parse_robots("User-agent: *\nDisallow: /a%2fb\n")
    rules2, _ = R.rules_for_agent(groups2, "anybot")
    assert not R.is_allowed(rules2, "/a%2Fb")


def test_empty_user_agent_token_is_inert():
    """A malformed 'User-agent:' line (empty token) must not become a
    match-everything SPECIFIC group that shadows '*' (round-12
    review)."""
    txt = "User-agent:\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    groups, _ = R.parse_robots(txt)
    rules, _ = R.rules_for_agent(groups, "anybot")
    assert R.is_allowed(rules, "/anything")


def test_compiled_rules_equal_single_shot():
    rules = [("disallow", "/tmp/*"), ("allow", "/tmp/ok")]
    compiled = R.compile_rules(rules)
    for path in ("/tmp/x", "/tmp/ok", "/other"):
        assert R.is_allowed_compiled(compiled, path) == R.is_allowed(
            rules, path
        )


def test_spark_filter_matches_python(spark):
    rows = {
        r.url_id: (r.allowed, r.crawl_delay)
        for r in R.u_robots_filter(spark).collect()
    }
    for i, _, want_allowed, want_delay in R._ROBOTS_CASES:
        assert rows[i] == (want_allowed, want_delay), i


def test_staged_oracle_matches(spark):
    import duckdb

    spdf = R.u_robots_filter(spark).toPandas()
    ddf = duckdb.connect().execute(R.robots_oracle()).fetchdf()
    assert list(spdf.columns) == list(ddf.columns)
    a = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    b = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_plan_broadcasts_robots_side(spark):
    """Scale gate: the robots join must be a BROADCAST hash join (one
    small row per host against a billion-row frontier), never a
    shuffled join."""
    df = R.robots_filter(
        R.robots_frontier_fixture(spark), R.robots_fixture(spark),
        R._AGENT,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_composes_with_frontier_dedup(spark):
    """End-to-end crawl-frontier pipeline: raw links -> frontier_dedup
    -> robots_filter. The urlops fixture's example.com URLs meet
    file A's culvertbot group (Allow / => all allowed, delay 2.0);
    other.org URLs fall to its '*' group (no /tmp//.json paths in the
    fixture => allowed, no delay)."""
    from culvert_spark import urlops as U

    frontier = U.frontier_dedup(U.frontier_fixture(spark))
    out = {
        r.canonical: (r.allowed, r.crawl_delay)
        for r in R.robots_filter(
            frontier, R.robots_fixture(spark), R._AGENT
        ).collect()
    }
    assert len(out) == len(U._FRONTIER_EXPECTED)
    for canon, host, *_ in U._FRONTIER_EXPECTED:
        want_delay = 2.0 if host == "example.com" else None
        assert out[canon] == (True, want_delay), canon
