"""Structured-Streaming ingest (SURVEY §2.10): pages dropped into a
directory flow through the same parse kernels with cross-batch canonical-url
dedup; re-invocation picks up only new files via the source checkpoint."""

from __future__ import annotations

from distributed_web_scrapper_and_crawler_c__spark.functions import kernels as K
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen
from distributed_web_scrapper_and_crawler_c__spark.streaming import (
    stream_ingest_books,
)

SPEC = sitegen.SiteSpec(n_books=24, n_categories=3, books_per_page=8)


def expected_books(pages: dict[str, bytes]) -> set[str]:
    out = set()
    for url, html in pages.items():
        if K.is_category_page(url) or "index.html" in url or "page-" in url:
            for bk in K.parse_books(html, url):
                out.add(K.canonicalize_url(bk.url))
    return out


import pytest


@pytest.mark.parametrize("n_buckets", [0, 8])
def test_stream_ingest_dedups_across_batches(spark, tmp_path, n_buckets):
    """n_buckets=0: flat state layout; n_buckets=8: bucketed layout whose
    per-batch anti-join prunes the state scan to the batch's own buckets."""
    src = str(tmp_path / "drop")
    out = str(tmp_path / "books")
    ck = str(tmp_path / "ck")

    all_pages = list(sitegen.pages_dict(SPEC).items())
    chunk1 = dict(all_pages[: len(all_pages) // 2])
    chunk2 = dict(all_pages[len(all_pages) // 2:])

    def drop(chunk: dict, name: str) -> None:
        spark.createDataFrame(
            [(u, h) for u, h in chunk.items()], "url string, html binary"
        ).coalesce(1).write.mode("append").parquet(src)

    drop(chunk1, "c1")
    stream_ingest_books(spark, src, out, ck, n_buckets=n_buckets)
    got1 = spark.read.parquet(out)
    canon1 = [r["canonical_url"] for r in got1.select("canonical_url").collect()]
    assert set(canon1) == expected_books(chunk1)
    assert len(canon1) == len(set(canon1)), "duplicate books within a drain"

    # second drop overlaps (shared books across listing/category pages):
    # only genuinely-new canonicals may be appended
    drop(chunk2, "c2")
    stream_ingest_books(spark, src, out, ck, n_buckets=n_buckets)
    got2 = spark.read.parquet(out)
    canon2 = [r["canonical_url"] for r in got2.select("canonical_url").collect()]
    assert set(canon2) == expected_books(dict(all_pages))
    assert len(canon2) == len(set(canon2)), "cross-batch dedup failed"

    # a third drain with nothing new appends nothing
    stream_ingest_books(spark, src, out, ck, n_buckets=n_buckets)
    assert spark.read.parquet(out).count() == len(canon2)

    # field-level parity against the kernel oracle for one book
    row = got2.orderBy("canonical_url").first()
    assert row["price_value"] == K.price_to_double(row["price"])

    if n_buckets:
        # bucketed layout: state dir is partitioned by the canonical hash
        from pathlib import Path

        bucket_dirs = [d.name for d in Path(out).iterdir()
                       if d.name.startswith("bucket=")]
        assert bucket_dirs, "bucketed layout must partition by bucket"
        assert len(bucket_dirs) <= n_buckets
