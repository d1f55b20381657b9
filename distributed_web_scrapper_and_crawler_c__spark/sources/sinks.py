"""Output sinks matching the reference's CSV shapes.

``save_books_csv`` reproduces save_to_csv (main.cpp:18-46): header
``Title,Price,Rating,URL``, every field quoted, embedded quotes doubled —
Spark's CSV writer with quoteAll already escapes ``"`` → ``""``.

``save_items_csv`` reproduces saveCollectedItems' union-schema behavior
(server.cpp:612-675): type-specific columns are only emitted when that item
type is present in the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOOK_HEADER = [("title", "Title"), ("price", "Price"),
               ("rating", "Rating"), ("url", "URL")]


def save_books_csv(items: DataFrame, path: str, order_col: str = "item_seq") -> None:
    (
        items.orderBy(order_col)
        .select(*[F.col(c).alias(h) for c, h in BOOK_HEADER])
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


_TYPE_COLS = {
    "JOB": ["company", "location", "salary"],
    "PRODUCT": ["brand"],
    "ARTICLE": ["author", "published"],
}


def save_items_csv(items: DataFrame, path: str, order_col: str = "item_seq") -> None:
    """Union schema: base columns + per-type columns only if that type is
    present (server.cpp:627-639). Missing fields are empty strings."""
    present = {
        r["item_type"] for r in items.select("item_type").distinct().collect()
    }
    cols = [
        F.col("item_type").alias("Type"),
        F.col("title").alias("Title"),
        F.col("price_value").cast("string").alias("Price"),
        F.col("rating_value").cast("string").alias("Rating"),
        F.col("url").alias("URL"),
    ]
    for t, extra in _TYPE_COLS.items():
        if t in present:
            for name in extra:
                src = name if name in items.columns else None
                cols.append(
                    (F.col(src) if src else F.lit("")).alias(name.title())
                )
    (
        items.orderBy(order_col)
        .select(*cols)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )
