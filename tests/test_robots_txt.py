"""robots.txt relational parser + frontier gate (operators/robots_txt.py):
section grouping, *-agent selection, longest-prefix decisions."""

from __future__ import annotations

from pyspark.sql import Row

from ocr_platform_spark.operators.robots_txt import (
    apply_robots_txt,
    path_of,
    robots_decisions,
    robots_rules,
)

ROBOTS = """# example
User-agent: evilbot
Disallow: /

User-Agent: *
Disallow: /private/
Allow: /private/pub
disallow: /tmp
Disallow:
Crawl-delay: 5

User-agent: otherbot
User-agent: *
Disallow: /shared
"""


def _rules(spark, text=ROBOTS, host="h.org"):
    df = spark.createDataFrame([Row(host=host, text=text)])
    return robots_rules(df)


def test_rules_star_groups_only(spark):
    rows = {(r["rule"], r["prefix"]) for r in _rules(spark).collect()}
    # evilbot's 'Disallow: /' ignored; empty Disallow dropped; Crawl-delay
    # is not a rule; the multi-agent group containing * applies
    assert rows == {
        ("disallow", "/private/"),
        ("allow", "/private/pub"),
        ("disallow", "/tmp"),
        ("disallow", "/shared"),
    }


def _decide(spark, urls):
    frontier = spark.createDataFrame(
        [Row(url=u, host="h.org", n_referrers=1) for u in urls]
    )
    return {
        r["url"]: r for r in robots_decisions(frontier, _rules(spark)).collect()
    }


def test_decisions_longest_prefix_and_defaults(spark):
    d = _decide(
        spark,
        [
            "https://h.org/private/x",       # disallow /private/ only
            "https://h.org/private/pub/ok",  # allow /private/pub (11) > disallow (9)
            "https://h.org/tmpfile",         # prefix match, no path-segment split
            "https://h.org/open",            # no rule → allow
            "https://h.org",                 # bare host → path '/'
        ],
    )
    assert d["https://h.org/private/x"]["allowed"] is False
    assert d["https://h.org/private/x"]["dis_len"] == 9
    assert d["https://h.org/private/pub/ok"]["allowed"] is True
    assert d["https://h.org/tmpfile"]["allowed"] is False
    assert d["https://h.org/open"]["allowed"] is True
    assert d["https://h.org"]["path"] == "/"
    assert d["https://h.org"]["allowed"] is True


def test_tie_goes_to_allow(spark):
    text = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    frontier = spark.createDataFrame([Row(url="https://h.org/ab", host="h.org")])
    d = robots_decisions(frontier, _rules(spark, text)).first()
    assert d["allow_len"] == d["dis_len"] == 2
    assert d["allowed"] is True


def test_wildcards_are_literal(spark):
    text = "User-agent: *\nDisallow: /*.pdf\n"
    d = _rules(spark, text).collect()
    assert [(r["rule"], r["prefix"]) for r in d] == [("disallow", "/*.pdf")]
    frontier = spark.createDataFrame(
        [Row(url="https://h.org/x.pdf", host="h.org")]
    )
    # literal '/*.pdf' prefix never matches '/x.pdf' — wildcard out of contract
    assert robots_decisions(frontier, _rules(spark, text)).first()["allowed"] is True


def test_rules_before_any_group_are_ignored(spark):
    text = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    rows = {r["prefix"] for r in _rules(spark, text).collect()}
    assert rows == {"/real"}


def test_apply_robots_txt_filters_frontier(spark):
    frontier = spark.createDataFrame(
        [
            Row(url="https://h.org/private/x", host="h.org", n_referrers=3),
            Row(url="https://h.org/ok", host="h.org", n_referrers=1),
            Row(url="https://norobots.org/a", host="norobots.org", n_referrers=1),
        ]
    )
    kept = {r["url"] for r in apply_robots_txt(frontier, _rules(spark)).collect()}
    assert kept == {"https://h.org/ok", "https://norobots.org/a"}


def test_path_of_keeps_query_string(spark):
    df = spark.createDataFrame([Row(url="https://h.org/p?a=1#f")])
    assert df.select(path_of("url").alias("p")).first()["p"] == "/p?a=1#f"


def _delays(spark, texts):
    from ocr_platform_spark.operators.robots_txt import crawl_delays

    df = spark.createDataFrame(
        [Row(host=h, text=t) for h, t in texts], "host string, text string"
    )
    return {r["host"]: r["delay_s"] for r in crawl_delays(df).collect()}


def test_crawl_delay_star_group_only(spark):
    d = _delays(
        spark,
        [
            ("a.org", ROBOTS),  # Crawl-delay: 5 in the * group
            ("b.org", "User-agent: evilbot\nCrawl-delay: 9\n"),  # foreign only
            ("c.org", "User-agent: *\nDisallow: /x\n"),  # no delay line
        ],
    )
    assert d == {"a.org": 5}


def test_crawl_delay_min_of_valid_lines(spark):
    text = (
        "User-agent: *\n"
        "Crawl-delay: 7\n"
        "crawl-delay: 3  # comment\n"
        "Crawl-delay: 1.5\n"   # fractional → out of contract, ignored
        "Crawl-delay: -2\n"    # negative → ignored
        "Crawl-delay: abc\n"   # non-numeric → ignored
    )
    assert _delays(spark, [("h.org", text)]) == {"h.org": 3}


def test_crawl_delay_overlong_digit_run_ignored(spark):
    # >9 digits would overflow int32; the strict gate drops it
    text = "User-agent: *\nCrawl-delay: 9999999999\nCrawl-delay: 4\n"
    assert _delays(spark, [("h.org", text)]) == {"h.org": 4}
