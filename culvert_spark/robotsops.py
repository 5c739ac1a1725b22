"""robots.txt evaluation + crawl politeness metadata (RFC 9309).

After ``urlops.frontier_dedup`` produces the host-partitioned frontier,
the one remaining gate before a fetch queue is the Robots Exclusion
Protocol: parse each host's robots.txt, pick the rule group for the
crawler's product token, and evaluate every frontier path against the
group's allow/disallow patterns. RFC 9309 is a public IETF standard;
everything here implements its §2 semantics:

1. **Parser** (``parse_robots``): line-oriented — comments stripped,
   keys case-insensitive; consecutive ``User-agent`` lines open a
   GROUP whose following ``Allow``/``Disallow`` rules they share
   (§2.2.1); rules before any group are ignored. ``Crawl-delay`` is
   captured per group (NOT part of RFC 9309 — a widely honored
   de-facto extension, recorded as such); ``Sitemap`` lines are
   collected document-wide.
2. **Group selection** (``rules_for_agent``): the group whose
   user-agent token is the LONGEST case-insensitive prefix of the
   crawler's product token wins; groups sharing that token merge; the
   ``*`` group applies only when no specific group matched (§2.2.1 —
   pinned by a test: a specific group EXCLUDES the ``*`` rules).
3. **Evaluation** (``is_allowed``): longest-match precedence over the
   matching rules' pattern OCTET length, ``Allow`` winning ties
   (§2.2.2); patterns support ``*`` wildcards and the ``$`` end
   anchor (§2.2.3); an EMPTY pattern matches nothing; a missing
   robots.txt means allow (§2.3.1.2/4 — unreachable/absent files are
   not a ban).
4. **Operator** (``robots_filter``): frontier (canonical, host, ...)
   LEFT-joined with the per-host robots corpus under an explicit
   ``broadcast()`` (robots.txt is one small row per HOST — thousands
   of hosts vs billions of frontier URLs; plan-gated), then ONE
   narrow ``mapInPandas`` evaluating each path with a per-batch
   parsed-rules cache. Output adds ``allowed`` and ``crawl_delay``
   columns — the fetch scheduler's politeness inputs.

Scale posture (100 TB): the join broadcasts the robots side (per-host,
bounded); evaluation is narrow parser CPU. A single host's frontier
can be huge, but rules parse ONCE per host per batch (the cache), so
cost is rule-match per URL — linear, no shuffle beyond the pre-joined
frontier's existing partitioning.

Reference scope: prasanthj/culvert has no crawl surface (SURVEY §0);
this extends the crawl-frontier family (``urlops``) mandated by the
build brief.

Staged in round 12 for a round-13/14 registration slot: the staged row
(``u_robots_filter`` body) has a constant-folding oracle whose
expected verdicts are stated BY HAND in the design tables, so the
oracle is independent ground truth.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from culvert_spark.urlops import _pct_normalize

#: Product token the staged row evaluates for (any token works — the
#: operator takes it as a parameter).
_AGENT = "culvertbot"


def parse_robots(text: str | None):
    """-> (groups, sitemaps) where groups = [(set[ua_lower],
    [(rule, pattern)], crawl_delay | None), ...] in file order."""
    groups: list[tuple[set, list, float | None]] = []
    sitemaps: list[str] = []
    current: tuple[set, list, float | None] | None = None
    collecting_agents = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_agents:
                current = (set(), [], None)
                groups.append(current)
                collecting_agents = True
            if value:  # an EMPTY token is malformed — ignored, never a
                # match-everything specific group (round-12 review)
                current[0].add(value.lower())
            continue
        collecting_agents = False
        if key == "sitemap":
            sitemaps.append(value)
        elif current is None:
            continue  # rules before any group are ignored (§2.2.1)
        elif key in ("allow", "disallow"):
            # §2.2.2 requires percent-encoding-CONSISTENT comparison:
            # normalize the pattern exactly like urlops normalizes the
            # canonical path (unreserved decode, uppercase escapes) so
            # 'Disallow: /%7Ejoe/' matches the canonical '/~joe/'
            # (round-12 review). '*' and '$' are not escapes — the
            # normalizer never touches them.
            current[1].append((key, _pct_normalize(value)))
        elif key == "crawl-delay":
            try:
                groups[-1] = current = (
                    current[0], current[1], float(value)
                )
            except ValueError:
                pass  # malformed delay: ignored, never fatal
    return groups, sitemaps


def rules_for_agent(groups, agent: str = _AGENT):
    """(rules, crawl_delay) for the crawler token: longest
    user-agent-line prefix match; '*' only if nothing specific
    matched; groups sharing the winning token merge."""
    agent = agent.lower()
    best_len = 0  # empty tokens never qualify (malformed — review)
    for agents, _, _ in groups:
        for ua in agents:
            if ua != "*" and agent.startswith(ua) and len(ua) > best_len:
                best_len = len(ua)
    rules: list = []
    delay: float | None = None
    if best_len > 0:
        want = lambda agents: any(  # noqa: E731
            ua != "*" and agent.startswith(ua) and len(ua) == best_len
            for ua in agents
        )
    else:
        want = lambda agents: "*" in agents  # noqa: E731
    for agents, rls, dly in groups:
        if want(agents):
            rules.extend(rls)
            if dly is not None and delay is None:
                delay = dly
    return rules, delay


def _pattern_regex(pattern: str) -> re.Pattern:
    """§2.2.3: '*' = any octet sequence, trailing '$' = end anchor;
    everything else literal; match is anchored at the path start."""
    anchor_end = pattern.endswith("$")
    if anchor_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("".join(["^", ".*".join(parts)])
                      + ("$" if anchor_end else ""))


def compile_rules(rules):
    """[(precedence_len, is_allow, compiled_regex)] — compile ONCE per
    host, not per URL: the frontier hot path evaluates billions of
    paths against a bounded rule set, and Python's re module purges
    its internal cache past 512 patterns (round-12 review)."""
    return [
        (len(pattern), rule == "allow", _pattern_regex(pattern))
        for rule, pattern in rules
        if pattern  # empty pattern matches nothing
    ]


def is_allowed_compiled(compiled, path: str) -> bool:
    """Longest-match precedence over pattern octet length, Allow wins
    ties (§2.2.2); no matching rule (or no rules at all) = allowed."""
    best: tuple[int, bool] | None = None
    for length, allow, rx in compiled:
        if rx.match(path):
            key = (length, allow)
            if best is None or key > best:
                best = key
    return best is None or best[1]


def is_allowed(rules, path: str) -> bool:
    """Convenience single-shot form of :func:`is_allowed_compiled`."""
    return is_allowed_compiled(compile_rules(rules), path)


def _path_of(canonical: str) -> str:
    """Path + query of a CANONICAL url (the part robots rules see)."""
    sp = urlsplit(canonical)
    return sp.path + (f"?{sp.query}" if sp.query else "")


ROBOTS_COLS = "allowed boolean, crawl_delay double"


def robots_filter(
    frontier: DataFrame, robots: DataFrame, agent: str
) -> DataFrame:
    """Adds (allowed, crawl_delay) to a frontier frame with
    (canonical, host) columns, from a ``robots`` frame of
    (host, robots_txt), evaluated for the REQUIRED crawler product
    token ``agent`` (no default: a silently-wrong crawler identity
    yields wrong politeness verdicts with no error — round-12
    review; the fixture token lives only in the staged row body).
    Broadcast left join on host (robots is one small row per host),
    then one narrow evaluation pass with a per-batch parsed+compiled
    cache; hosts with no robots.txt row are allowed with NULL delay
    (§2.3.1.2)."""
    joined = frontier.join(
        F.broadcast(robots.select("host", "robots_txt")), "host", "left"
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.schema.fields
        if f.name != "robots_txt"
    )

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            allowed, delays = [], []
            for canon, txt in zip(pdf["canonical"], pdf["robots_txt"]):
                if txt is None or (isinstance(txt, float) and txt != txt):
                    allowed.append(True)
                    delays.append(None)
                    continue
                key = str(txt)
                if key not in cache:
                    rules, delay = rules_for_agent(
                        parse_robots(key)[0], agent
                    )
                    cache[key] = (compile_rules(rules), delay)
                compiled, delay = cache[key]
                allowed.append(
                    is_allowed_compiled(compiled, _path_of(str(canon)))
                )
                delays.append(delay)
            out = pdf.drop(columns=["robots_txt"])
            out["allowed"] = allowed
            out["crawl_delay"] = delays
            yield out

    return joined.mapInPandas(evaluate, f"{schema}, {ROBOTS_COLS}")


# ---------------------------------------------------------------------------
# Design tables (expected verdicts stated BY HAND — independent ground
# truth for tests and the staged oracle)
# ---------------------------------------------------------------------------

#: Per-host robots fixture. example.com has a SPECIFIC culvertbot
#: group (which must EXCLUDE the '*' rules); other.org has only
#: megabot/otherbot + '*' groups, so culvertbot falls through to '*'.
_ROBOTS_FILES: dict[str, str] = {
    "example.com": (
        "# fixture file A\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public$\n"
        "Crawl-delay: 7\n"
        "\n"
        "User-agent: culvertbot\n"
        "Disallow: /beta/\n"
        "Allow: /\n"
        "Crawl-delay: 2\n"
        "Sitemap: https://example.com/sitemap.xml\n"
    ),
    "other.org": (
        "User-agent: megabot\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /tmp/*\n"
        "Allow: /tmp/ok\n"
        "Disallow: /*.json$\n"
    ),
    # percent-encoded rule vs canonicalized frontier paths (§2.2.2
    # consistency — round-12 review), plus a malformed empty
    # User-agent line that must NOT become a match-everything group
    "pct.example": (
        "User-agent:\n"
        "Disallow: /never-applies/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /%7Eprivate/\n"
    ),
}

#: (url_id, canonical, expected allowed, expected crawl_delay) for
#: agent 'culvertbot' — each case names the §2 rule it pins.
_ROBOTS_CASES: list[tuple[int, str, bool, float | None]] = [
    # specific group EXCLUDES '*': /private/ is only in the '*' group
    (0, "http://example.com/private/x", True, 2.0),
    # the specific group's own Disallow applies
    (1, "http://example.com/beta/page", False, 2.0),
    # Allow / (len 1) loses to Disallow /beta/ (len 6) inside /beta/
    (2, "http://example.com/beta", True, 2.0),   # /beta (no slash) != /beta/
    # '*' fallback on other.org: /tmp/* (len 6) denies
    (3, "https://other.org/tmp/secret", False, None),
    # Allow /tmp/ok (len 7) beats Disallow /tmp/* (len 6) — tie rule
    # not needed, LENGTH decides
    (4, "https://other.org/tmp/ok", True, None),
    # $ anchor: .json at the end denies...
    (5, "https://other.org/data/feed.json", False, None),
    # ...but not mid-path
    (6, "https://other.org/data/feed.json.txt", True, None),
    # unmatched path on a '*' host
    (7, "https://other.org/index.html", True, None),
    # host with NO robots.txt row at all: allowed, NULL delay
    (8, "https://unlisted.net/anything", True, None),
    # query strings are part of the matched path
    (9, "https://other.org/page?fmt=x.json", False, None),
    # an encoded Disallow pattern matches the CANONICAL (decoded) path
    (10, "http://pct.example/~private/x", False, None),
    # ...including when the raw link itself was encoded (canonicalizes
    # to the same path)
    (11, "http://pct.example/%7eprivate/y", False, None),
    # the malformed empty-UA group matches nobody: its rule is inert
    (12, "http://pct.example/never-applies/z", True, None),
]


def robots_fixture(spark: SparkSession) -> DataFrame:
    """(host, robots_txt) frame of the design files."""
    return spark.createDataFrame(
        list(_ROBOTS_FILES.items()), "host string, robots_txt string"
    )


def robots_frontier_fixture(spark: SparkSession) -> DataFrame:
    """(url_id, canonical, host) frame of the design cases, run
    through ``canonical_url`` first — the operator's contract input IS
    a frontier of canonicals (case 11 exists exactly to prove an
    encoded raw link meets an encoded rule on the canonical axis)."""
    from culvert_spark.urlops import canonical_url, url_host

    rows = []
    for i, c, _, _ in _ROBOTS_CASES:
        canon = canonical_url(c)
        rows.append((i, canon, url_host(canon)))
    return spark.createDataFrame(
        rows, "url_id bigint, canonical string, host string"
    )


def robots_oracle() -> str:
    """Constant-folding DuckDB oracle: the hand-stated verdicts."""
    def q(s: str) -> str:
        return s.replace("'", "''")

    from culvert_spark.urlops import canonical_url, url_host

    vals = ",\n      ".join(
        "({}, '{}', '{}', {}, {})".format(
            i, q(canonical_url(c)), q(url_host(canonical_url(c))),
            str(bool(a)).upper(), "NULL" if d is None else d,
        )
        for i, c, a, d in _ROBOTS_CASES
    )
    return f"""
    SELECT CAST(url_id AS BIGINT) AS url_id, canonical, host,
           CAST(allowed AS BOOLEAN) AS allowed,
           CAST(crawl_delay AS DOUBLE) AS crawl_delay
    FROM (VALUES
      {vals})
      AS t(url_id, canonical, host, allowed, crawl_delay)
    ORDER BY url_id
    """


def u_robots_filter(spark: SparkSession) -> DataFrame:
    """Staged row body: the design frontier through ``robots_filter``,
    ordered by case id."""
    return robots_filter(
        robots_frontier_fixture(spark), robots_fixture(spark), _AGENT
    ).orderBy("url_id").select(
        "url_id", "canonical", "host", "allowed", "crawl_delay"
    )
