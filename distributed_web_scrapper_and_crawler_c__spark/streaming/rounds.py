"""Structured-Streaming surface (SURVEY §2.10).

The reference is a continuous pull loop (workers poll ``GET_URL`` forever,
/root/reference/src/worker.cpp:1072-1230) — no watermarks, no event-time
windows, no late data. The engine therefore maps the crawl loop to
iterative batch rounds (plans/frontier.py). What Structured Streaming adds
is the INGEST side: pages arriving continuously (a growing WARC/parquet
drop directory) flow through the same parse kernels and the same
first-wins content dedup via ``foreachBatch`` — the reference's
continuous ``addBook`` ingest (server.cpp:523-551) as a stream.

``foreachBatch`` is the right tool here (not a stateful streaming agg):
each micro-batch must dedup against ALL previously-ingested books, which
is an anti-join versus an external state table — exactly the
batch-DataFrame escape hatch ``foreachBatch`` exists for. State lives in
the output parquet directory itself (append-only, the Iceberg-append
shape), so a restart resumes from the source checkpoint with no separate
state store.

Scale notes: the per-batch work is one parse pass (Arrow-vectorized UDFs),
one anti-join against the canonical-url column of the state table (column-
pruned scan), and one window dedup within the batch — all identical to the
batch engine's per-round plans, so throughput characteristics carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import expressions as X
from ..functions import udfs as U

BOOKS_SCHEMA = (
    "title string, price string, rating string, url string, "
    "canonical_url string, price_value double, rating_value int, "
    "batch_id long"
)


def parse_books_batch(pages: DataFrame) -> DataFrame:
    """One parse pass over a (url, html) batch: gated pod extraction
    (P3 — category-shaped pages only), canonicalized, coerced. Same
    kernels, same gate as the batch engine (plans/frontier.py)."""
    parsed = pages.select(
        F.col("url").alias("page_url"),
        F.when(
            X.book_parse_gate_expr(F.col("url")),
            U.parse_books_udf(F.col("html"), F.col("url")),
        ).alias("books"),
    )
    pods = (
        parsed.filter(F.col("books").isNotNull())
        .select(F.posexplode("books").alias("book_rank", "_bk"))
        .select("_bk.*")
    )
    return pods.select(
        "title", "price", "rating", "url",
        U.canonicalize_udf(F.col("url")).alias("canonical_url"),
        U.price_value_udf(F.col("price")).alias("price_value"),
        X.rating_value_expr(F.col("rating")).alias("rating_value"),
    )


def stream_ingest_books(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 0,
) -> None:
    """Consume all currently-available page files from ``source_dir`` (a
    parquet drop directory with the pages schema), parse books, dedup by
    canonical url first-wins — within the batch AND against every book
    already in ``out_dir`` — and append the new ones.

    Runs with ``trigger(availableNow=True)``: drains what exists, then
    stops; re-invoking picks up only NEW files (source offsets live in
    ``checkpoint_dir``), so repeated calls implement the reference's
    continuous ingest loop one drain at a time.

    ``n_buckets > 0`` switches the state table to a BUCKETED layout:
    ``out_dir`` is partitioned by ``bucket = pmod(xxhash64(canonical_url),
    n_buckets)`` and each micro-batch's anti-join reads ONLY the buckets
    its own canonicals hash into (partition pruning via an ``isin`` filter
    on the partition column) — at corpus scale the per-batch state scan is
    bounded by the batch's bucket fan-out instead of the full history.
    ``n_buckets = 0`` keeps the flat layout."""

    stream = (
        spark.readStream.schema("url string, html binary")
        .option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .select("url", "html")
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        books = parse_books_batch(batch_df)
        # in-batch first-wins by canonical url (deterministic: url order)
        w = Window.partitionBy("canonical_url").orderBy("url", "title")
        books = (
            books.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        if n_buckets > 0:
            books = books.withColumn(
                "bucket",
                F.pmod(F.xxhash64("canonical_url"), F.lit(n_buckets)).cast("int"),
            ).localCheckpoint(eager=True)  # bucket set + join read it once
        # cross-batch dedup: anti-join vs the canonical urls already written.
        # Only the missing-path case (first batch: no state dir yet) is
        # tolerated — any OTHER read failure (corrupt file, transient FS
        # error) must propagate, or dedup would silently switch off and
        # duplicates would be appended.
        from pyspark.errors import AnalysisException

        try:
            if n_buckets > 0:
                # bucketed state: prune the scan to the batch's own buckets
                # (isin on the partition column prunes directories)
                batch_buckets = [
                    r["bucket"] for r in books.select("bucket").distinct().collect()
                ]
                seen = (
                    spark.read.parquet(out_dir)
                    .filter(F.col("bucket").isin(batch_buckets))
                    .select("canonical_url")
                )
                seen.schema  # force analysis: missing path surfaces HERE
            else:
                seen = spark.read.schema(BOOKS_SCHEMA).parquet(out_dir).select(
                    "canonical_url"
                )
        except AnalysisException as e:
            if (
                "PATH_NOT_FOUND" not in str(e)
                and "Path does not exist" not in str(e)
            ):
                raise
            seen = None  # first batch: no state dir yet
        if seen is not None:
            books = books.join(seen, "canonical_url", "left_anti")
        out_cols = [
            "title", "price", "rating", "url", "canonical_url",
            "price_value", "rating_value", "batch_id",
        ]
        if n_buckets > 0:
            books.select(*out_cols, "bucket").write.mode("append").partitionBy(
                "bucket"
            ).parquet(out_dir)
        else:
            books.select(*out_cols).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
