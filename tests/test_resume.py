"""Round resumability (SURVEY §5.3): stop after round k, resume from the
checkpoint, final state must equal the uninterrupted run — and a torn
(uncommitted) round directory must be ignored."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import CrawlEngine
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

SPEC = sitegen.SiteSpec(n_books=25, n_categories=3, books_per_page=10)


@pytest.fixture(scope="module")
def pages(spark):
    df = sitegen.pages_dataframe(spark, SPEC, slices=4).cache()
    df.count()
    return df


def state_tuple(eng: CrawlEngine):
    seen = sorted(r["canonical"] for r in eng.seen.collect())
    items = [
        (r["item_seq"], r["title"], r["price"], r["rating"], r["url"])
        for r in eng.items.orderBy("item_seq").collect()
    ]
    frontier = sorted(
        (r["seq"], r["path"]) for r in eng.frontier.collect()
    )
    return (seen, items, frontier, eng.next_seq, eng.pages_crawled, eng.round_num)


def test_resume_equals_uninterrupted(spark, pages, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    part_dir = str(tmp_path_factory.mktemp("part"))

    # uninterrupted run
    full = CrawlEngine(spark, pages, checkpoint_dir=full_dir).run("/catalogue/page-1.html")

    # interrupted: stop after 2 rounds, then resume from disk and finish
    part = CrawlEngine(spark, pages, checkpoint_dir=part_dir)
    part.run("/catalogue/page-1.html", max_rounds=2)
    assert part.round_num == 2

    resumed = CrawlEngine.resume(spark, pages, part_dir)
    assert resumed.round_num == 2
    resumed.run("/catalogue/page-1.html")

    assert state_tuple(resumed) == state_tuple(full)


def test_torn_round_is_ignored(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("torn"))
    eng = CrawlEngine(spark, pages, checkpoint_dir=d)
    eng.run("/catalogue/page-1.html", max_rounds=2)

    # simulate a crash mid-round-3: directory exists, no _COMMIT marker
    torn = Path(d) / "r3"
    (torn / "frontier").mkdir(parents=True)
    (torn / "state.json").write_text("{corrupt")

    resumed = CrawlEngine.resume(spark, pages, d)
    assert resumed.round_num == 2  # torn r3 ignored, r2 is the latest commit

    shutil.rmtree(torn)


def test_periodic_compaction_prunes_resume_inputs(spark, pages, tmp_path_factory):
    """compact_every=2: every 2nd round's checkpoint folds the full
    seen/items into that round's increment and moves the base forward.
    Resume must then read ONLY from the base onward — proven by deleting
    every pre-base increment before resuming — and still finish with state
    identical to an uninterrupted, never-compacted run."""
    import json

    full_dir = str(tmp_path_factory.mktemp("full_nc"))
    comp_dir = str(tmp_path_factory.mktemp("comp"))

    full = CrawlEngine(spark, pages, checkpoint_dir=full_dir).run(
        "/catalogue/page-1.html"
    )

    part = CrawlEngine(
        spark, pages, checkpoint_dir=comp_dir, compact_every=2
    )
    part.run("/catalogue/page-1.html", max_rounds=3)
    state = json.loads((Path(comp_dir) / "r2" / "state.json").read_text())
    assert state["seen_base_round"] == 2  # the fold actually happened
    assert state["items_base_round"] == 2
    # r3 is a plain increment on top of the r2 base
    state3 = json.loads((Path(comp_dir) / "r3" / "state.json").read_text())
    assert state3["seen_base_round"] == 2

    # pre-base increments are dead weight after the fold: remove them
    for r in (0, 1):
        shutil.rmtree(Path(comp_dir) / f"r{r}" / "seen_inc")
        shutil.rmtree(Path(comp_dir) / f"r{r}" / "items_inc")

    resumed = CrawlEngine.resume(
        spark, pages, comp_dir, compact_every=2
    )
    resumed.run("/catalogue/page-1.html")

    assert state_tuple(resumed) == state_tuple(full)
