"""robots.txt parsing → (host, prefix) rules (sources/robots.py).

Verdict equivalence is asserted against stdlib ``urllib.robotparser`` —
an independent implementation of the same 1994-REP state machine — on
fixtures inside the documented shared subset (Disallow-only groups, at
most one group per agent token, exact agent tokens, ASCII paths), plus a
seeded randomized sweep. Structural quirks (blank-line group discard,
agent runs surviving non-rule directives, RFC 9309 group combining) get
direct kernel tests."""

from __future__ import annotations

import random
import urllib.robotparser

from distributed_web_scrapper_and_crawler_c__spark.sources import robots as R


def _stdlib_blocked(text: str, agent: str, path: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(text.splitlines())
    return not rp.can_fetch(agent, path)


def _ours_blocked(text: str, agent: str, path: str) -> bool:
    return any(path.startswith(p) for p in R.parse_robots_text(text, agent))


BASIC = """
# books site
User-agent: *
Disallow: /admin
Disallow: /search

User-agent: archiver
Disallow: /
"""


def test_basic_group_selection():
    assert R.parse_robots_text(BASIC, "*") == ["/admin", "/search"]
    assert R.parse_robots_text(BASIC, "archiver") == ["/"]
    # unknown agent falls back to the * group
    assert R.parse_robots_text(BASIC, "crawler") == ["/admin", "/search"]


def test_empty_disallow_allows_everything():
    txt = "User-agent: bot\nDisallow:\n\nUser-agent: *\nDisallow: /x\n"
    # bot has a group -> specific wins -> no prefixes
    assert R.parse_robots_text(txt, "bot") == []
    assert R.parse_robots_text(txt, "*") == ["/x"]


def test_agent_run_shares_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /p\n"
    assert R.parse_robots_text(txt, "a") == ["/p"]
    assert R.parse_robots_text(txt, "b") == ["/p"]


def test_blank_line_discards_ruleless_agent_run():
    # the 1994-REP/stdlib quirk: agents separated from their rules by a
    # blank line never form a group; the orphan rule has no group either
    txt = "User-agent: a\n\nDisallow: /p\nUser-agent: *\nDisallow: /q\n"
    assert R.parse_robots_text(txt, "a") == ["/q"]  # falls through to *


def test_directive_classes_match_stdlib_group_structure():
    # Crawl-delay is a rule line in robotparser: it CLOSES the agent run,
    # so a (delay-only group) and b (disallow group) are separate
    txt = "User-agent: a\nCrawl-delay: 3\nUser-agent: b\nDisallow: /p\n"
    assert R.parse_robots_text(txt, "a") == []
    assert R.parse_robots_text(txt, "b") == ["/p"]
    # Sitemap is inert in robotparser: the agent run stays open and a, b
    # share one group
    txt2 = "User-agent: a\nSitemap: http://x/s.xml\nUser-agent: b\nDisallow: /p\n"
    assert R.parse_robots_text(txt2, "a") == ["/p"]
    assert R.parse_robots_text(txt2, "b") == ["/p"]


def test_rfc_combining_of_repeated_agent_groups():
    txt = (
        "User-agent: a\nDisallow: /p\n\n"
        "User-agent: a\nDisallow: /q\n"
    )
    # RFC 9309 §2.2.1: groups for the same agent combine (documented
    # divergence from robotparser, which keeps only the first)
    assert R.parse_robots_text(txt, "a") == ["/p", "/q"]


def test_verdicts_match_stdlib_on_subset_fixtures():
    paths = ["/", "/admin", "/admin/x", "/search?q=1", "/catalogue/a_1.html",
             "/private/data", "/pub"]
    fixtures = [
        BASIC,
        "User-agent: *\nDisallow: /\n",
        "User-agent: *\nDisallow:\n",
        "User-agent: spider\nDisallow: /private\nDisallow: /pub\n\n"
        "User-agent: *\nDisallow: /admin\n",
        "# only comments\n\n",
        "",
        "User-agent: a\n\nDisallow: /p\nUser-agent: *\nDisallow: /q\n",
    ]
    for text in fixtures:
        for agent in ("*", "spider", "archiver", "nobody"):
            for path in paths:
                assert _ours_blocked(text, agent, path) == _stdlib_blocked(
                    text, agent, path
                ), (text, agent, path)


def test_verdicts_match_stdlib_randomized():
    rng = random.Random(1009)
    agents_pool = ["alpha", "beta", "gamma", "*"]
    prefix_pool = ["/a", "/ab", "/b/c", "/cat", "/cat/x", "/d"]
    paths = ["/", "/a", "/ab", "/abc", "/b/c/d", "/cat", "/cat/x/1", "/e"]
    for _case in range(300):
        # one group per distinct agent token (the shared subset)
        k = rng.randint(1, 3)
        chosen = rng.sample(agents_pool, k)
        lines: list[str] = []
        for a in chosen:
            lines.append(f"User-agent: {a}")
            for _ in range(rng.randint(0, 3)):
                lines.append(f"Disallow: {rng.choice(prefix_pool)}")
            if rng.random() < 0.3:
                lines.append("Disallow:")
            lines.append("")
        text = "\n".join(lines)
        for agent in ("alpha", "delta", "*"):
            for path in paths:
                assert _ours_blocked(text, agent, path) == _stdlib_blocked(
                    text, agent, path
                ), (text, agent, path)


def test_rules_table_spark_and_frontier_integration(spark):
    from pyspark.sql import functions as F

    from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
        CrawlEngine,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    host = "books.toscrape.com"
    txt = "User-agent: *\nDisallow: /catalogue/category\n"
    robots_df = spark.createDataFrame(
        [(host, txt)], "host STRING, robots_txt STRING"
    )
    rules = R.robots_rules_from_texts(robots_df)
    got = [(r["host"], r["prefix"]) for r in rules.collect()]
    assert got == [(host, "/catalogue/category")]

    # end-to-end: parsed rules block category pages exactly like the
    # hand-built rules table the engine already golden-tests
    spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
    pages = sitegen.pages_dataframe(spark, spec, slices=2)
    eng = CrawlEngine(spark, pages, robots_rules=rules).run(
        "/catalogue/page-1.html"
    )
    n_cat = eng.seen.filter(
        F.col("canonical").contains("/catalogue/category")
    ).count()
    assert n_cat == 0
    assert eng.pages_crawled > 0


# ------------------------------------------------------------- Crawl-delay


def _stdlib_delay(text: str, agent: str):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(text.splitlines())
    return rp.crawl_delay(agent)


def test_crawl_delay_group_selection():
    txt = (
        "User-agent: spark-crawler\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    # specific group beats *, even for the delay value
    assert R.parse_robots_crawl_delay(txt, "spark-crawler") == 2.0
    assert R.parse_robots_crawl_delay(txt, "other") == 10.0
    # a specific group WITHOUT a delay shadows the * group's delay
    # (stdlib crawl_delay agrees: first matching entry wins outright)
    txt2 = "User-agent: a\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 5\n"
    assert R.parse_robots_crawl_delay(txt2, "a") is None
    assert _stdlib_delay(txt2, "a") is None
    assert R.parse_robots_crawl_delay(txt2, "b") == 5.0


def test_crawl_delay_value_parsing():
    # last valid value in a group wins (robotparser overwrites too)
    txt = "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7\n"
    assert R.parse_robots_crawl_delay(txt, "*") == 7.0
    # invalid / negative values are ignored but still close the agent run
    assert R.parse_robots_crawl_delay("User-agent: *\nCrawl-delay: soon\n", "*") is None
    assert R.parse_robots_crawl_delay("User-agent: *\nCrawl-delay: -2\n", "*") is None
    # fractional seconds accepted (documented de-facto extension)
    assert R.parse_robots_crawl_delay("User-agent: *\nCrawl-delay: 0.5\n", "*") == 0.5
    assert R.parse_robots_crawl_delay("", "*") is None
    assert R.parse_robots_crawl_delay(None, "*") is None


def test_crawl_delay_rfc_combining_takes_max():
    txt = (
        "User-agent: a\nCrawl-delay: 2\n\n"
        "User-agent: a\nCrawl-delay: 9\n\n"
        "User-agent: a\nDisallow: /x\n"
    )
    # documented divergence: combined groups -> conservative MAX
    assert R.parse_robots_crawl_delay(txt, "a") == 9.0


def test_crawl_delay_matches_stdlib_on_subset():
    fixtures = [
        BASIC,
        "User-agent: *\nCrawl-delay: 4\nDisallow: /p\n",
        "User-agent: bot\nCrawl-delay: 1\n\nUser-agent: *\nDisallow: /q\n",
        "User-agent: *\nDisallow: /p\n",
        "",
    ]
    for text in fixtures:
        for agent in ("*", "bot", "archiver", "nobody"):
            assert R.parse_robots_crawl_delay(text, agent) == _stdlib_delay(
                text, agent
            ), (text, agent)


def test_crawl_delay_matches_stdlib_randomized():
    rng = random.Random(4099)
    agents_pool = ["alpha", "beta", "gamma", "*"]
    for _case in range(200):
        k = rng.randint(1, 3)
        chosen = rng.sample(agents_pool, k)
        lines: list[str] = []
        for a in chosen:
            lines.append(f"User-agent: {a}")
            if rng.random() < 0.7:
                lines.append(f"Crawl-delay: {rng.randint(1, 9)}")
            for _ in range(rng.randint(0, 2)):
                lines.append("Disallow: /x")
            lines.append("")
        text = "\n".join(lines)
        for agent in ("alpha", "delta", "*"):
            ours = R.parse_robots_crawl_delay(text, agent)
            theirs = _stdlib_delay(text, agent)
            # stdlib returns int for digit values; compare numerically
            assert (ours is None) == (theirs is None), (text, agent)
            if ours is not None:
                assert float(ours) == float(theirs), (text, agent)


def test_crawl_delay_rounds_mapping():
    assert R.crawl_delay_rounds(None, 1.0) == 0
    assert R.crawl_delay_rounds(0.0, 1.0) == 0
    assert R.crawl_delay_rounds(3.0, 1.0) == 3
    assert R.crawl_delay_rounds(3.0, 2.0) == 2   # ceil(1.5)
    assert R.crawl_delay_rounds(0.5, 1.0) == 1
    assert R.crawl_delay_rounds(10.0, 0.0) == 0  # unknown round wall: off


def test_host_delays_table_and_engine_wiring(spark):
    from distributed_web_scrapper_and_crawler_c__spark.oracle import (
        crawl_oracle,
    )
    from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
        CrawlEngine,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    host = "books.toscrape.com"
    robots_df = spark.createDataFrame(
        [
            (host, "User-agent: *\nCrawl-delay: 2\nDisallow: /private\n"),
            ("quiet.example", "User-agent: *\nDisallow: /x\n"),
        ],
        "host STRING, robots_txt STRING",
    )
    delays = {
        r["host"]: r["crawl_delay"]
        for r in R.robots_host_delays_from_texts(robots_df).collect()
    }
    assert delays == {host: 2.0, "quiet.example": None}

    # end-to-end: the parsed delay drives min_delay and the crawl is
    # byte-exact against the oracle run with the same spacing
    d = R.crawl_delay_rounds(delays[host], round_seconds=1.0)
    assert d == 2
    spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
    pages = sitegen.pages_dataframe(spark, spec, slices=2)
    eng = CrawlEngine(spark, pages, min_delay=d, host_budget=3)
    eng.record_dequeues = True
    eng.run("/catalogue/page-1.html")
    res = crawl_oracle.crawl(
        sitegen.pages_dict(spec), host_budget=3, min_delay=d
    )
    assert [(r, s, p, f) for (r, s, p, f) in eng.dequeue_log] == [
        (x.round, x.seq, x.path, x.fetched) for x in res.dequeues
    ]
    assert eng.round_num == res.rounds
