"""Priority frontier (north-star "partitioned priority frontier").

The reference queue is FIFO, so priority is an ENGINE extension with a
hard parity constraint: priority_expr=None (or any constant) must be
byte-identical to the FIFO goldens. With a real expr, dequeue order
becomes (priority, seq) — lower first, seq tie-break — through both the
host-budget grouped-rank and the max_pages prefix-sum truncation, on the
small-window AND bucketed scale plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_c__spark.functions import kernels as K
from distributed_web_scrapper_and_crawler_c__spark.plans import seq as seq_mod
from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
    CrawlEngine,
)
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

SPEC = sitegen.SiteSpec(n_books=18, n_categories=2, books_per_page=6)
BASE = "http://books.toscrape.com"
SEED = "/catalogue/page-1.html"

def _prio():
    # listings last, everything else first (Column creation needs a live
    # SparkContext, so this cannot be a module-level constant)
    return F.when(F.col("path").contains("page-"), F.lit(1)).otherwise(
        F.lit(0)
    )


@pytest.fixture(scope="module")
def pages(spark):
    df = sitegen.pages_dataframe(spark, SPEC, slices=2).cache()
    df.count()
    return df


def _seed_enqueue_order() -> list[tuple[str, int]]:
    """(path, priority) of the round-1 frontier in its seq order: the
    seed page's extracted links, ignore-filtered, canonical-dedup
    first-wins, in extraction (= enqueue seq) order."""
    html = sitegen.pages_dict(SPEC)[BASE + SEED]
    out, seen = [], set()
    for link in K.extract_all_links(html, BASE + SEED):
        if K.should_ignore_url(link):
            continue
        canon = K.canonicalize_url(link)
        if canon in seen or canon == K.canonicalize_url(BASE + SEED):
            continue
        seen.add(canon)
        # engine's derivation (frontier.py kept): strip base_url when the
        # link starts with it, else keep the raw link as the path
        path = link[len(BASE):] if link.startswith(BASE) else link
        out.append((path, 1 if "page-" in path else 0))
    return out


def _k_that_reorders(order: list[tuple[str, int]]) -> int:
    """Smallest k whose FIFO prefix contains a listing (priority 1) while
    the priority order's first k are all non-listings — the cut where the
    two orders provably differ."""
    k = next(i for i, (_p, pr) in enumerate(order) if pr == 1) + 1
    assert sum(1 for _p, pr in order if pr == 0) >= k
    return k


def _round1_paths(eng: CrawlEngine) -> set[str]:
    return {p for (r, _s, p, _f) in eng.dequeue_log if r == 1}


def test_constant_priority_matches_fifo(spark, pages):
    fifo = CrawlEngine(spark, pages)
    fifo.record_dequeues = True
    fifo.run(SEED)
    prio = CrawlEngine(spark, pages, priority_expr=F.lit(0))
    prio.record_dequeues = True
    prio.run(SEED)
    assert fifo.dequeue_log == prio.dequeue_log
    assert [r["title"] for r in fifo.items.orderBy("item_seq").collect()] == [
        r["title"] for r in prio.items.orderBy("item_seq").collect()
    ]


def test_max_pages_truncation_follows_priority(spark, pages):
    order = _seed_enqueue_order()
    k = _k_that_reorders(order)
    # the truncation counts FETCH HITS (Crawler.cpp:172 semantics): rows
    # pop in (priority, seq) order until the k-th row that exists in the
    # page store; dangling/noise links in between pop as misses
    pm = sitegen.pages_dict(SPEC)
    expected, hits = set(), 0
    for i in sorted(range(len(order)), key=lambda i: (order[i][1], i)):
        if hits >= k:
            break
        path = order[i][0]
        expected.add(path)
        if BASE + path in pm:
            hits += 1
    eng = CrawlEngine(
        spark, pages, max_pages=1 + k, priority_expr=_prio()
    )
    eng.record_dequeues = True
    eng.run(SEED, max_rounds=2)
    got = {p for (r, _s, p, _f) in eng.dequeue_log if r == 1}
    assert got == expected


def test_host_budget_dequeue_follows_priority(spark, pages):
    order = _seed_enqueue_order()
    k = _k_that_reorders(order)
    expected = {
        p for p, _prio in sorted(
            ((p, pr) for (p, pr) in order),
            key=lambda t: (t[1], order.index((t[0], t[1]))),
        )[:k]
    }
    eng = CrawlEngine(spark, pages, host_budget=k, priority_expr=_prio())
    eng.record_dequeues = True
    eng.run(SEED, max_rounds=2)
    assert _round1_paths(eng) == expected


def test_priority_scale_plans_match_window_plans(spark, pages, monkeypatch):
    eng_small = CrawlEngine(
        spark, pages, host_budget=3, max_pages=9, priority_expr=_prio()
    )
    eng_small.record_dequeues = True
    eng_small.run(SEED)

    # force the bucketed / grouped-rank / prefix-sum scale plans
    monkeypatch.setattr(seq_mod, "SMALL_SEQ_ROWS", 1)
    eng_scale = CrawlEngine(
        spark, pages, host_budget=3, max_pages=9, priority_expr=_prio()
    )
    eng_scale.record_dequeues = True
    eng_scale.run(SEED)

    assert eng_small.dequeue_log == eng_scale.dequeue_log
    assert [
        r["title"] for r in eng_small.items.orderBy("item_seq").collect()
    ] == [r["title"] for r in eng_scale.items.orderBy("item_seq").collect()]


def test_priority_column_checkpoints_and_resumes(spark, pages, tmp_path):
    d = str(tmp_path / "ckpt")
    eng = CrawlEngine(
        spark, pages, checkpoint_dir=d, host_budget=4, priority_expr=_prio()
    )
    eng.run(SEED, max_rounds=2)
    resumed = CrawlEngine.resume(
        spark, pages, d, host_budget=4, priority_expr=_prio()
    )
    resumed.run(SEED)
    full = CrawlEngine(spark, pages, host_budget=4, priority_expr=_prio())
    full.run(SEED)
    assert sorted(
        r["canonical"] for r in resumed.seen.collect()
    ) == sorted(r["canonical"] for r in full.seen.collect())
    assert resumed.pages_crawled == full.pages_crawled