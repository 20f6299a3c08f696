"""robots.txt gate (`operators.robots`): RFC 9309 parse + permission
semantics against Python-reference expectations, incl. group merging,
agent fallback, wildcard/anchor patterns, longest-match + Allow-wins
ties, empty Disallow, hosts with no rules."""

import pytest

from data_pipelines_spark.operators.robots import (
    filter_by_robots,
    parse_robots,
)

ROBOTS_A = """
# global group
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok.html

User-agent: goodbot
User-agent: nicebot
Disallow: /members/
Allow: /members/public*
Disallow: /*.pdf$
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""

ROBOTS_C = """
User-agent: *
Disallow: /
Allow: /docs
"""


@pytest.fixture()
def rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("c.com", ROBOTS_C)],
        "host string, content string",
    )
    return parse_robots(df).cache()


def test_parse_groups_and_patterns(rules):
    rows = {(r["host"], r["agent"], r["pattern"]): r for r in rules.collect()}
    # multi-agent group: both agents carry every rule of the group
    assert ("a.com", "goodbot", "/members/") in rows
    assert ("a.com", "nicebot", "/members/") in rows
    assert rows[("a.com", "goodbot", "/*.pdf$")]["allow"] is False
    # empty Disallow parses to NO rule
    assert not [k for k in rows if k[0] == "b.com"]
    # regex compilation: wildcard + anchor + literal escape
    assert rows[("a.com", "goodbot", "/*.pdf$")]["regex"] == r"^/.*\.pdf$"
    assert rows[("a.com", "*", "/tmp")]["regex"] == "^/tmp.*"


def _check(spark, rules, agent, cases):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    out = filter_by_robots(df, rules, agent=agent, keep="all")
    got = {r["i"]: r["allowed"] for r in out.collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (agent, u, got[i], want)


def test_star_group_semantics(spark, rules):
    _check(spark, rules, "somebot", [
        ("http://a.com/", True),
        ("http://a.com/private/x.html", False),
        ("http://a.com/private/ok.html", True),   # longest match: Allow
        ("http://a.com/tmpfile", False),          # prefix match
        ("http://a.com/members/secret", True),    # goodbot group not ours
        ("http://b.com/anything", True),          # empty Disallow
        ("http://c.com/", False),
        ("http://c.com/docs/guide", True),
        ("http://unknown.com/x", True),           # no robots → allowed
    ])


def test_specific_agent_overrides_star(spark, rules):
    _check(spark, rules, "GoodBot", [  # case-insensitive agent
        ("http://a.com/members/secret", False),
        ("http://a.com/members/public/x", True),  # Allow wildcard longer
        ("http://a.com/paper.pdf", False),        # anchored
        ("http://a.com/paper.pdf.html", True),    # $ anchor respected
        # the specific group REPLACES '*' (RFC): /private/ not blocked
        ("http://a.com/private/x.html", True),
    ])


def test_keep_modes_and_query_paths(spark, rules):
    df = spark.createDataFrame(
        [(1, "http://c.com/docs?x=1"), (2, "http://c.com/x")],
        "i long, url string",
    )
    allowed = filter_by_robots(df, rules, keep="allowed").collect()
    assert [r["i"] for r in allowed] == [1]
    denied = filter_by_robots(df, rules, keep="disallowed").collect()
    assert [r["i"] for r in denied] == [2]
    with pytest.raises(ValueError, match="keep"):
        filter_by_robots(df, rules, keep="nope")


def test_partition_invariance(spark, rules):
    urls = [(i, f"http://a.com/private/f{i}.html") for i in range(20)]
    urls += [(100 + i, f"http://a.com/pub/f{i}") for i in range(20)]
    df = spark.createDataFrame(urls, "i long, url string")
    a = sorted(r["i"] for r in filter_by_robots(df, rules).collect())
    b = sorted(
        r["i"]
        for r in filter_by_robots(df.repartition(9), rules).collect()
    )
    assert a == b
    assert a == sorted(i for i, _ in urls if i >= 100)


def test_sitemap_directive_and_crawl_delay(spark):
    from data_pipelines_spark.operators.robots import (
        crawl_delays,
        robots_sitemaps,
    )

    content = """
Sitemap: http://a.com/sitemap.xml
User-agent: *
Crawl-delay: 2
Disallow: /x/

User-agent: fastbot
Crawl-delay: 0.5
Crawl-delay: 1.5
Sitemap: http://a.com/other.xml  # host-wide even inside a group
"""
    df = spark.createDataFrame(
        [("a.com", content), ("b.com", "User-agent: *\nDisallow:\n")],
        "host string, content string",
    )
    sm = {(r["host"], r["sitemap"]) for r in robots_sitemaps(df).collect()}
    assert sm == {
        ("a.com", "http://a.com/sitemap.xml"),
        ("a.com", "http://a.com/other.xml"),
    }

    star = {r["host"]: r["crawl_delay"]
            for r in crawl_delays(df, agent="somebot").collect()}
    assert star == {"a.com": 2.0}  # b.com has no delay -> absent
    fast = {r["host"]: r["crawl_delay"]
            for r in crawl_delays(df, agent="FastBot").collect()}
    assert fast == {"a.com": 1.5}  # specific group, max of its delays
