"""Golden test for the sequential strategy (crawl_website,
/root/reference/src/Crawler.cpp:37-135): the Spark plan must reproduce the
single-threaded oracle's book list — same books, same discovery order,
same first-wins canonical-url dedup — for several max_pages values."""

from distributed_web_scrapper_and_crawler_c__spark.plans.sequential import (
    sequential_crawl,
    sequential_oracle,
)
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

SPEC = sitegen.SiteSpec(n_books=60, n_categories=5, books_per_page=20)


def _engine_books(spark, pages, max_pages):
    df = sequential_crawl(
        spark, pages, start_path="/catalogue/page-1.html", max_pages=max_pages
    )
    return [
        (r["title"], r["price"], r["rating"], r["url"])
        for r in df.collect()
    ]


def _oracle_books(pages_map, max_pages):
    return [
        (b.title, b.price, b.rating, b.url)
        for b in sequential_oracle(
            pages_map, start_path="/catalogue/page-1.html", max_pages=max_pages
        )
    ]


def test_sequential_matches_oracle(spark):
    pages = sitegen.pages_dataframe(spark, SPEC, slices=4).cache()
    pages_map = sitegen.pages_dict(SPEC)
    for max_pages in (0, 1, 2, 99):
        eng = _engine_books(spark, pages, max_pages)
        ora = _oracle_books(pages_map, max_pages)
        assert eng == ora, f"mismatch at max_pages={max_pages}"
    # unlimited walk covers the whole listing chain
    assert len(_engine_books(spark, pages, 0)) == SPEC.n_books
    pages.unpersist()


def test_sequential_missing_start(spark):
    pages = sitegen.pages_dataframe(spark, SPEC, slices=2)
    df = sequential_crawl(spark, pages, start_path="/catalogue/nope.html")
    assert df.count() == 0
