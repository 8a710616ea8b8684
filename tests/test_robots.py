"""robots.txt crawl-policy layer (sources/robots.py +
operators/url.py robots_audit): the pinned RFC 9309 / REP contract —
group parsing and selection (exact token, substring token, '*',
most-specific-wins), pattern translation ('*' runs, '$' anchor,
literal escaping), longest-match / allow-wins-ties evaluation, and
the Spark audit operator's routing for missing robots, NULL and
unparsable URLs."""

from __future__ import annotations

import pytest

from cerberus_cpp_spark.sources.robots import (
    is_allowed,
    parse_robots,
    rule_regex,
    select_group,
)

BODY = """\
# comment
User-agent: cerbot
User-agent: otherbot
Disallow: /private/*
Allow: /private/public$
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp
Disallow:
Sitemap: https://x/s.xml

User-agent: cer
Disallow: /cer-only
"""


def test_parse_groups_and_sitemaps() -> None:
    r = parse_robots(BODY)
    assert len(r.groups) == 3
    assert r.sitemaps == ["https://x/s.xml"]
    g = r.groups[0]
    assert g.agents == ["cerbot", "otherbot"]
    assert g.rules == [(False, "/private/*"),
                       (True, "/private/public$")]
    assert g.crawl_delay == 2.5
    # empty 'Disallow:' is allow-all -> dropped
    assert r.groups[1].rules == [(False, "/tmp")]
    # comment-only / empty body: no groups
    assert parse_robots("# nothing\n").groups == []


def test_group_selection_specificity() -> None:
    r = parse_robots(BODY)
    # 'cerbot' (len 6) beats 'cer' (len 3) and '*'
    assert select_group(r, "CerBot/1.0").agents[0] == "cerbot"
    # only 'cer' substring-matches 'cerx'
    assert select_group(r, "cerx").agents == ["cer"]
    # nothing matches -> the '*' group
    assert select_group(r, "unknown").agents == ["*"]
    # no '*' group and no match -> None (allow all)
    r2 = parse_robots("User-agent: foo\nDisallow: /x\n")
    assert select_group(r2, "bar") is None


def test_rule_regex_translation() -> None:
    assert rule_regex("/private/*") == "^/private/.*"
    assert rule_regex("/private/public$") == "^/private/public$"
    assert rule_regex("/a+b.c") == "^/a\\+b\\.c"
    # '$' only anchors at the end; elsewhere it is literal
    assert rule_regex("/a$b") == "^/a\\$b"


def test_matching_semantics() -> None:
    r = parse_robots(BODY)
    assert is_allowed(r, "cerbot", "/private/x") == \
        (False, "/private/*")
    # longer $-anchored allow beats the wildcard disallow
    assert is_allowed(r, "cerbot", "/private/public") == \
        (True, "/private/public$")
    # anchor holds: a suffix past '$' falls back to the disallow
    assert is_allowed(r, "cerbot", "/private/publicX")[0] is False
    assert is_allowed(r, "cerbot", "/open") == (True, None)
    # bare pattern is a prefix match
    assert is_allowed(r, "unknown", "/tmpfile")[0] is False
    assert is_allowed(r, "unknown", "/other")[0] is True
    # allow wins a length tie
    tie = parse_robots(
        "User-agent: *\nDisallow: /p/a\nAllow: /p/b\n")
    assert is_allowed(tie, "x", "/p/a")[0] is False
    assert is_allowed(tie, "x", "/p/b")[0] is True


def test_audit_operator_routing(spark) -> None:
    from cerberus_cpp_spark.operators.url import robots_audit

    robots = spark.createDataFrame(
        [("a.com", BODY), ("b.com", None)],
        "host string, robots_txt string")
    urls = spark.createDataFrame([
        ("https://a.com/private/x",),
        ("https://a.com/private/public",),
        ("https://a.com/",),          # empty path -> '/'
        ("https://b.com/anything",),  # NULL body -> allow
        ("https://c.com/nothing",),   # no robots row -> allow
        (None,),
        ("not a url",),
    ], "url string")
    out = {
        r["url"]: (r["host"], r["path"], r["allowed"],
                   r["matched_pattern"])
        for r in robots_audit(urls, robots, agent="cerbot")
        .collect()
    }
    assert out["https://a.com/private/x"] == \
        ("a.com", "/private/x", False, "/private/*")
    assert out["https://a.com/private/public"] == \
        ("a.com", "/private/public", True, "/private/public$")
    assert out["https://a.com/"] == ("a.com", "/", True, None)
    assert out["https://b.com/anything"][2] is True
    assert out["https://c.com/nothing"][2] is True
    assert out[None] == (None, None, True, None)
    assert out["not a url"] == (None, None, True, None)
    assert len(out) == 7


def test_query_string_matching() -> None:
    """RFC 9309 patterns match against path PLUS query: the
    '/*?sid=*' idiom fires on '/p?sid=1', and a '$'-anchored allow
    stops matching once a query string follows."""
    r = parse_robots(
        "User-agent: *\nDisallow: /*?sid=*\n"
        "Disallow: /private/*\nAllow: /private/public$\n")
    assert is_allowed(r, "x", "/p?sid=1") == (False, "/*?sid=*")
    assert is_allowed(r, "x", "/p?other=1")[0] is True
    assert is_allowed(r, "x", "/private/public")[0] is True
    # the $ anchor no longer matches with a query attached; the
    # wildcard disallow wins
    assert is_allowed(r, "x", "/private/public?sid=9")[0] is False


def test_tiebreak_parity_python_vs_operator(spark) -> None:
    """Equal (length, allow) ties resolve to the lexicographically
    LARGEST pattern on BOTH surfaces (the Python helper and the
    Spark operator), so matched_pattern never diverges."""
    from cerberus_cpp_spark.operators.url import robots_audit

    body = "User-agent: *\nAllow: /a*\nAllow: /ab\n"
    r = parse_robots(body)
    assert is_allowed(r, "x", "/ab") == (True, "/ab")
    robots = spark.createDataFrame(
        [("t.com", body)], "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("https://t.com/ab",)], "url string")
    row = robots_audit(urls, robots, agent="x").collect()[0]
    assert (row["allowed"], row["matched_pattern"]) == (True, "/ab")
