"""Full RFC 9309 robots matching: Allow + wildcards + longest-match.

Three layers, each against a DIFFERENT implementation:
 - pure-kernel unit cases (robots_allowed) for the RFC §2.2.2 precedence
   corners — longest pattern wins, Allow wins ties, `$` anchors only as
   the last octet, `*` spans, no match ⇒ allowed;
 - a seeded randomized differential sweep of the kernel against an
   INDEPENDENT character-walk matcher (greedy-with-backtrack wildcard
   walk, no regex — a different algorithm, not the kernel re-run), plus
   stdlib urllib.robotparser equivalence on shared-subset fixtures;
 - the Catalyst twin (full_rules_from_texts → host_rules_frame →
   robots_allowed_col): same verdicts as the kernel over the same rules,
   evaluated JVM-side; and the CrawlEngine integration — the distributed
   and driver-fast paths produce identical crawl state under full rules,
   with Allow overrides actually reopening a disallowed subtree.
"""

from __future__ import annotations

import random
import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_c__spark.sources import robots as R


# ---------------------------------------------------------------------------
# independent twin: greedy character-walk wildcard match (no regex)
# ---------------------------------------------------------------------------

def _walk_match(pattern: str, path: str) -> bool:
    """Does `pattern` match at the START of `path`? Iterative two-pointer
    wildcard walk with single-star backtracking (the classic glob
    algorithm) — structurally unlike the kernel's regex translation.
    An unanchored robots pattern P is a prefix match, i.e. exactly the
    FULL match of P + '*'; a trailing '$' is the full-match anchor."""
    if pattern.endswith("$"):
        pattern = pattern[:-1]
    else:
        pattern = pattern + "*"
    p = s = 0
    star_p = star_s = -1
    while s < len(path):
        if p < len(pattern) and pattern[p] == path[s]:
            p += 1
            s += 1
        elif p < len(pattern) and pattern[p] == "*":
            star_p, star_s = p, s
            p += 1
        elif star_p != -1:
            p = star_p + 1
            star_s += 1
            s = star_s
        else:
            return False
    while p < len(pattern) and pattern[p] == "*":
        p += 1
    return p == len(pattern)


def _twin_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        if _walk_match(pattern, path):
            key_len = len(pattern)
            if key_len > best_len or (
                key_len == best_len and allow and not best_allow
            ):
                if key_len > best_len:
                    best_len, best_allow = key_len, allow
                else:
                    best_allow = True
    return best_allow if best_len >= 0 else True


# ---------------------------------------------------------------------------
# kernel unit cases
# ---------------------------------------------------------------------------

CASES = [
    # (rules, path, allowed)
    ([("/private/", False), ("/private/public", True)], "/private/x", False),
    ([("/private/", False), ("/private/public", True)],
     "/private/public/x", True),
    # tie: same length, Allow wins (RFC 9309 §2.2.2)
    ([("/page", False), ("/page", True)], "/page1", True),
    # longest wins regardless of file order
    ([("/p", True), ("/page/", False)], "/page/x", False),
    ([("/page/", False), ("/p", True)], "/page/x", False),
    # `$` anchors only as the last octet
    ([("/*.gif$", False)], "/img/a.gif", False),
    ([("/*.gif$", False)], "/img/a.gifs", True),
    # `$` literal mid-pattern
    ([("/a$b", False)], "/a$b/c", False),
    ([("/a$b", False)], "/ab/c", True),
    # `*` spans path separators; multiple stars
    ([("/a*/b*c", False)], "/a1/x/b22c", False),
    ([("/a*/b*c", False)], "/a1/x/b22d", True),
    # no matching rule => allowed
    ([("/x", False)], "/y", True),
    ([], "/anything", True),
    # pattern longer than path never matches
    ([("/abc", False)], "/ab", True),
    # root disallow with allow carve-out (classic shared-subset shape)
    ([("/", False), ("/public/", True)], "/public/a", True),
    ([("/", False), ("/public/", True)], "/secret/a", False),
]


@pytest.mark.parametrize("rules,path,want", CASES)
def test_robots_allowed_cases(rules, path, want):
    assert R.robots_allowed(rules, path) is want
    assert _twin_allowed(rules, path) is want  # twin agrees on the corners


def test_parse_robots_rules_allow_and_groups():
    txt = (
        "User-agent: spark-crawler\n"
        "Disallow: /private/\n"
        "Allow: /private/pub*\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "\n"
        "User-agent: spark-crawler\n"  # RFC combining: second named group
        "Disallow: /*.zip$\n"
        "Allow:\n"  # empty Allow: no rule (RFC: matches nothing)
    )
    rules = R.parse_robots_rules(txt, agent="spark-crawler")
    assert rules == [
        ("/private/", False),
        ("/private/pub*", True),
        ("/*.zip$", False),
    ]
    # specific-beats-default: * group not applied
    assert R.robots_allowed(rules, "/private/public/a") is True
    assert R.robots_allowed(rules, "/private/a") is False
    assert R.robots_allowed(rules, "/data/file.zip") is False
    assert R.robots_allowed(rules, "/open/page") is True


def test_pattern_regex_shape():
    regex, anchored, is_prefix = R.pattern_regex("/plain/prefix")
    assert is_prefix and not anchored and regex == "^/plain/prefix"
    regex, anchored, is_prefix = R.pattern_regex("/a*b$")
    assert anchored and not is_prefix and regex == r"^/a.*b\Z"
    # regex metacharacters in the pattern are escaped
    regex, _, _ = R.pattern_regex("/a.b+c")
    assert regex == r"^/a\.b\+c"


# ---------------------------------------------------------------------------
# randomized differential: kernel vs the character-walk twin
# ---------------------------------------------------------------------------

def test_kernel_vs_walk_twin_randomized():
    rng = random.Random(9309)
    segs = ["a", "b", "cat", "page", "img", "x1", ".gif", ".zip", ""]

    def rand_pattern():
        n = rng.randint(1, 4)
        parts = [rng.choice(segs) for _ in range(n)]
        pat = "/" + "/".join(parts)
        if rng.random() < 0.4:
            i = rng.randint(0, len(pat))
            pat = pat[:i] + "*" + pat[i:]
        if rng.random() < 0.25:
            pat += "$"
        return pat

    def rand_path():
        n = rng.randint(1, 5)
        return "/" + "/".join(rng.choice(segs) for _ in range(n))

    for _ in range(400):
        rules = [
            (rand_pattern(), rng.random() < 0.5)
            for _ in range(rng.randint(0, 6))
        ]
        path = rand_path()
        assert R.robots_allowed(rules, path) == _twin_allowed(rules, path), (
            rules, path,
        )


def test_stdlib_equivalence_shared_subset():
    """Fixtures where RFC longest-match and robotparser first-match agree
    (no two rules of opposite verdicts both match any probed path with
    the shorter one first in file order)."""
    txt = (
        "User-agent: *\n"
        "Allow: /public/\n"
        "Disallow: /\n"
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    rules = R.parse_robots_rules(txt, agent="probe")
    for path in ["/public/a", "/public/", "/x", "/", "/publicish"]:
        assert R.robots_allowed(rules, path) == rp.can_fetch("probe", path), path


# ---------------------------------------------------------------------------
# Catalyst twin + engine integration
# ---------------------------------------------------------------------------

ROBOTS_FIXTURE = [
    (
        "books.toscrape.com",
        "User-agent: spark-crawler\n"
        "Disallow: /catalogue/category/\n"
        "Allow: /catalogue/category/books/mystery*\n"
        "Disallow: /*.gif$\n",
    ),
    ("other.example.com", "User-agent: *\nDisallow: /\n"),
    ("open.example.com", "User-agent: *\nDisallow:\n"),
]


def test_catalyst_twin_matches_kernel(spark):
    robots_df = spark.createDataFrame(
        ROBOTS_FIXTURE, "host STRING, robots_txt STRING"
    )
    full = R.full_rules_from_texts(robots_df, agent="spark-crawler")
    rows = full.collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append((r["pattern"], r["allow"]))
    # open.example.com emits no rules (empty Disallow)
    assert "open.example.com" not in by_host

    paths = [
        ("books.toscrape.com", "/catalogue/category/books/mystery_3/index.html"),
        ("books.toscrape.com", "/catalogue/category/books/travel_2/index.html"),
        ("books.toscrape.com", "/media/cache/x.gif"),
        ("books.toscrape.com", "/media/cache/x.gift"),
        ("books.toscrape.com", "/catalogue/page-2.html"),
        ("other.example.com", "/anything"),
        ("open.example.com", "/anything"),
        ("norules.example.com", "/anything"),
    ]
    probe = spark.createDataFrame(paths, "host STRING, path STRING")
    hr = R.host_rules_frame(full).withColumnRenamed("host", "_rhost")
    got = (
        probe.join(F.broadcast(hr), probe["host"] == F.col("_rhost"), "left")
        .select(
            "host", "path",
            R.robots_allowed_col(F.col("_rules"), F.col("path"))
            .alias("allowed"),
        )
        .collect()
    )
    assert len(got) == len(paths)
    for r in got:
        want = R.robots_allowed(by_host.get(r["host"], []), r["path"])
        assert r["allowed"] == want, (r["host"], r["path"])
        assert _twin_allowed(by_host.get(r["host"], []), r["path"]) == want


def _crawl_state(spark, pages, robots_df, fast_round_rows):
    from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
        CrawlEngine,
    )

    eng = CrawlEngine(
        spark,
        pages,
        robots_rules=R.full_rules_from_texts(robots_df, agent="spark-crawler"),
        fast_round_rows=fast_round_rows,
    ).run("/catalogue/page-1.html")
    seen = sorted(r["canonical"] for r in eng.seen.collect())
    items = sorted(r["canonical_url"] for r in eng.items.collect())
    blocked = sum(m.links_ignored for m in eng.metrics)
    return seen, items, blocked


def test_engine_full_rules_distributed_vs_fast(spark):
    """The distributed robots_allowed_col plan and the driver-fast kernel
    produce identical crawl state under full rules, and the Allow
    carve-out actually reopens part of a disallowed subtree."""
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(n_books=12, n_categories=3, books_per_page=6)
    pages = sitegen.pages_dataframe(spark, spec, slices=2)
    cats = [
        r["url"]
        for r in pages.filter(F.col("url").contains("/category/")).collect()
    ]
    assert cats, "fixture needs category pages"
    # carve one category back open inside a blanket category disallow
    reopened = sorted(cats)[0]
    path = reopened.split("books.toscrape.com", 1)[1]
    stem = path.rsplit("/", 1)[0] + "/"  # its own category dir
    robots_df = spark.createDataFrame(
        [(
            "books.toscrape.com",
            "User-agent: *\nDisallow: /catalogue/category/\n"
            f"Allow: {stem}\n",
        )],
        "host STRING, robots_txt STRING",
    )

    dist = _crawl_state(spark, pages, robots_df, fast_round_rows=0)
    fast = _crawl_state(spark, pages, robots_df, fast_round_rows=10**9)
    assert dist == fast
    seen, _, blocked = dist
    assert blocked > 0, "blanket disallow must block other categories"
    assert any(stem in c for c in seen), "Allow carve-out must be crawled"
    others = [c for c in cats if stem not in c]
    assert others and all(
        not any(o.split("books.toscrape.com", 1)[1] in c for c in seen)
        for o in others
    ), "non-carved categories must stay blocked"


def test_robots_from_pages_latest_capture_wins(spark):
    """Self-configuring crawl: robots.txt rows in the page store become
    the rules table; with warc_ts present the LATEST capture per host
    wins; the derived full-rules table drives the engine end to end."""
    import datetime

    from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
        CrawlEngine,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(n_books=12, n_categories=3, books_per_page=6)
    pages = sitegen.pages_dataframe(spark, spec, slices=2)

    old = (
        "User-agent: *\nDisallow: /media/\n"  # stale capture: mild rule
    )
    new = (
        "User-agent: *\nDisallow: /catalogue/category/\n"  # current rule
    )
    robots_rows = spark.createDataFrame(
        [
            (
                "http://books.toscrape.com/robots.txt",
                datetime.datetime(2026, 1, 1),
                old.encode(),
                old,
                "en",
            ),
            (
                "http://books.toscrape.com/robots.txt",
                datetime.datetime(2026, 6, 1),
                new.encode(),
                new,
                "en",
            ),
        ],
        sitegen.PAGES_SCHEMA,
    )
    store = pages.unionByName(robots_rows)

    full = R.robots_from_pages(store, agent="spark-crawler")
    rules = full.collect()
    assert [(r["pattern"], r["allow"]) for r in rules] == [
        ("/catalogue/category/", False)
    ], "latest warc_ts capture must win"

    eng = CrawlEngine(spark, store, robots_rules=full).run(
        "/catalogue/page-1.html"
    )
    seen = [r["canonical"] for r in eng.seen.collect()]
    assert seen and not any("/catalogue/category/" in c for c in seen)

    # prefix mode from the same store: the anti-join-subset table
    pref = R.robots_from_pages(store, agent="spark-crawler", full=False)
    assert [tuple(r) for r in pref.collect()] == [
        ("books.toscrape.com", "/catalogue/category/")
    ]
