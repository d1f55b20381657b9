"""Round-5 features: geometric in-memory compaction of the seen/items
part unions (frontier._maybe_compact_parts). The fold changes only the
physical layout of the accumulated state — crawl order, books, seen set
and round count must stay byte-exact vs the pure-Python oracle, with the
fold provably firing (not just enabled)."""

from __future__ import annotations

import pytest

from distributed_web_scrapper_and_crawler_c__spark.oracle import crawl_oracle
from distributed_web_scrapper_and_crawler_c__spark.plans import (
    frontier as frontier_mod,
)
from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import CrawlEngine
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

SPEC = sitegen.SiteSpec(n_books=40, n_categories=4, books_per_page=10)


@pytest.fixture(scope="module")
def pages(spark):
    df = sitegen.pages_dataframe(spark, SPEC, slices=8).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pages_map():
    return sitegen.pages_dict(SPEC)


def _run(spark, pages, **kw):
    eng = CrawlEngine(spark, pages, **kw)
    eng.record_dequeues = True
    eng.run("/catalogue/page-1.html")
    return eng


def test_part_compaction_fires_and_stays_golden(
    spark, pages, pages_map, monkeypatch
):
    """Force aggressive folding (fold at 2 parts, hard cap 3) through a
    many-round budgeted crawl: every round after the second folds the
    unions, so any layout-dependent bug (lost rows, reordered increments,
    checkpoint part aliasing) would break byte-exact parity."""
    monkeypatch.setattr(frontier_mod, "COMPACT_MIN_PARTS", 2)
    monkeypatch.setattr(frontier_mod, "COMPACT_MAX_PARTS", 3)
    eng = _run(spark, pages, host_budget=2)
    res = crawl_oracle.crawl(pages_map, host_budget=2)
    assert res.rounds > 20, "fixture must exercise the many-round regime"
    assert eng.crawl_order() == res.crawl_order
    assert {r["canonical"] for r in eng.seen.collect()} == res.processed
    assert eng.round_num == res.rounds
    # the fold provably ran (row counters recorded at the last fold)
    assert eng._seen_last_compact > 0
    assert len(eng._seen_parts) <= 3
    assert len(eng._item_parts) <= 3
    # seen/items row counts survived every fold
    assert eng.seen.count() == eng.seen_count
    assert eng.items.count() == eng.items_count


def test_part_compaction_default_thresholds_fire_on_long_crawl(
    spark, pages, pages_map
):
    """With the shipped thresholds (fold at COMPACT_MIN_PARTS once rows
    doubled — trivially true at the first eligible round), a >20-round
    crawl must fold at least once and remain golden. This crawl's state
    stays below SMALL_COMPACT_ROWS throughout, so the eager small-state
    clause (fold at >= SMALL_COMPACT_PARTS parts, doubling or not) must
    keep the union leaf count BOUNDED — each extra leaf taxes every later
    membership probe with per-plan overhead, measured ~0.3-0.5s/leaf."""
    eng = _run(spark, pages, host_budget=2)
    res = crawl_oracle.crawl(pages_map, host_budget=2)
    assert eng.crawl_order() == res.crawl_order
    assert eng._seen_last_compact > 0, "default schedule never folded"
    assert eng.seen_count < frontier_mod.SMALL_COMPACT_ROWS  # fixture sanity
    # bound, not exact: SMALL_COMPACT_PARTS parts trigger a fold BEFORE the
    # round appends its increment, so post-run counts can sit one above
    assert len(eng._seen_parts) <= frontier_mod.SMALL_COMPACT_PARTS + 1
    assert len(eng._item_parts) <= frontier_mod.SMALL_COMPACT_PARTS + 1


def test_part_compaction_resume_round_trip(
    spark, pages, pages_map, monkeypatch, tmp_path_factory
):
    """Checkpoint increments must stay one-part-per-round through folds:
    kill after a mid-crawl round with aggressive folding, resume, finish —
    the resumed crawl must match the oracle end-to-end."""
    monkeypatch.setattr(frontier_mod, "COMPACT_MIN_PARTS", 2)
    monkeypatch.setattr(frontier_mod, "COMPACT_MAX_PARTS", 3)
    ckpt = str(tmp_path_factory.mktemp("compact_ckpt"))
    eng = CrawlEngine(spark, pages, host_budget=2, checkpoint_dir=ckpt)
    eng.record_dequeues = True
    # stop past the first fold (aggressive schedule fires from round 3 on)
    eng.run("/catalogue/page-1.html", max_rounds=6)
    assert eng._seen_last_compact > 0, "fold must fire before the cut"
    resumed = CrawlEngine.resume(spark, pages, ckpt, host_budget=2)
    resumed.record_dequeues = True
    resumed.run("/catalogue/page-1.html")
    res = crawl_oracle.crawl(pages_map, host_budget=2)
    # pre-cut order + post-resume order must be the oracle's order exactly
    assert eng.crawl_order() + resumed.crawl_order() == res.crawl_order
    assert {r["canonical"] for r in resumed.seen.collect()} == res.processed
    assert resumed.round_num == res.rounds
