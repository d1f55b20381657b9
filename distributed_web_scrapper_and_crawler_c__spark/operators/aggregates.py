"""Aggregation operators mirroring the reference's statistics (SURVEY §2.6).

``item_stats`` reproduces getItemStats (server.cpp:678-769) exactly —
including its quirks: SUM(price) gated on price>0 but AVG(price) dividing
by the count of ALL items (server.cpp:727-731), AVG(rating) over rating>0
rows only, and the category list as the comma-joined *sorted* distinct set
(std::set iteration order). ``crawl_rate`` is the per-worker pages/minute
metric (server.cpp:1073-1090) over the engine's metrics/events shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_stats(
    items: DataFrame,
    type_col: str = "item_type",
    price_col: str = "price_value",
    rating_col: str = "rating_value",
    category_col: str = "item_type",
) -> DataFrame:
    """One-row stats frame, A4 semantics (server.cpp:678-769)."""
    t, p, r, c = (F.col(x) for x in (type_col, price_col, rating_col, category_col))
    return items.agg(
        F.count("*").alias("total_items"),
        F.sum(F.when(t == "BOOK", 1).otherwise(0)).alias("book_count"),
        F.sum(F.when(t == "JOB", 1).otherwise(0)).alias("job_count"),
        F.sum(F.when(t == "PRODUCT", 1).otherwise(0)).alias("product_count"),
        F.sum(F.when(t == "ARTICLE", 1).otherwise(0)).alias("article_count"),
        # price sums run in DECIMAL(38,6) so the result is exact and
        # independent of partial-aggregate ordering (double summation order
        # differs between Spark partials and a single-pass oracle); the exact
        # decimal is cast back to double only at the end.
        F.round(
            F.sum(
                F.when(p > 0, p).otherwise(0.0).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("total_price"),
        # quirk reproduced: denominator is ALL items (server.cpp:727-731)
        F.round(
            F.sum(
                F.when(p > 0, p).otherwise(0.0).cast("decimal(38,6)")
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_price"),
        F.round(
            F.sum(F.when(r > 0, r).otherwise(0))
            / F.greatest(F.sum(F.when(r > 0, 1).otherwise(0)), F.lit(1)),
            6,
        ).alias("avg_rating"),
        F.countDistinct(c).alias("category_count"),
        F.concat_ws(", ", F.array_sort(F.collect_set(c))).alias("categories"),
    )


def item_stats_sql(table: str, type_col: str, price_col: str,
                   rating_col: str, category_col: str) -> str:
    t, p, r, c = type_col, price_col, rating_col, category_col
    # The CAST(... AS BIGINT) on the four conditional counts matters for the
    # driver's value hash: DuckDB's sum() over integer literals yields
    # HUGEINT (int128), which serializes differently from Spark's BIGINT
    # even though the values are identical.
    return f"""
SELECT count(*) AS total_items,
       CAST(sum(CASE WHEN {t} = 'BOOK' THEN 1 ELSE 0 END) AS BIGINT) AS book_count,
       CAST(sum(CASE WHEN {t} = 'JOB' THEN 1 ELSE 0 END) AS BIGINT) AS job_count,
       CAST(sum(CASE WHEN {t} = 'PRODUCT' THEN 1 ELSE 0 END) AS BIGINT) AS product_count,
       CAST(sum(CASE WHEN {t} = 'ARTICLE' THEN 1 ELSE 0 END) AS BIGINT) AS article_count,
       round(CAST(sum(CAST(CASE WHEN {p} > 0 THEN {p} ELSE 0 END
                           AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_price,
       round(CAST(sum(CAST(CASE WHEN {p} > 0 THEN {p} ELSE 0 END
                           AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(sum(CASE WHEN {r} > 0 THEN {r} ELSE 0 END) * 1.0
             / greatest(sum(CASE WHEN {r} > 0 THEN 1 ELSE 0 END), 1), 6) AS avg_rating,
       count(DISTINCT {c}) AS category_count,
       array_to_string(list_sort(list(DISTINCT {c})), ', ') AS categories
FROM {table}
"""


def worker_totals(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", active_window_s: int = 3600) -> DataFrame:
    """A1-A3 semantics (server.cpp:130-179) over an event log: per worker
    (key) the lifetime total (A1 totalPagesProcessed), the last-window
    increment (A3 per-round delta), and the active flag (A2 — last event
    within ``active_window_s`` of the global latest event, the reference's
    heartbeat-timeout check). The global horizon is a broadcast one-row
    aggregate, not a global window."""
    k = F.col(key_col)
    horizon = events.agg(F.max(ts_col).alias("_maxts"))
    per = events.groupBy(k.alias("worker")).agg(
        F.count("*").alias("total_processed"),
        F.max(ts_col).alias("last_ts"),
        F.min(ts_col).alias("first_ts"),
    )
    recent = (
        events.crossJoin(F.broadcast(horizon))
        .filter(
            F.unix_timestamp(ts_col)
            >= F.unix_timestamp("_maxts") - F.lit(active_window_s)
        )
        .groupBy(k.alias("worker"))
        .agg(F.count("*").alias("last_window_increment"))
    )
    return (
        per.join(recent, "worker", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "worker", "total_processed", "first_ts", "last_ts",
            F.coalesce("last_window_increment", F.lit(0)).alias(
                "last_window_increment"
            ),
            (
                F.unix_timestamp("last_ts")
                >= F.unix_timestamp("_maxts") - F.lit(active_window_s)
            ).alias("is_active"),
        )
        .orderBy("worker")
    )


def worker_totals_sql(table: str = "events", key: str = "user_id",
                      ts: str = "ts", active_window_s: int = 3600) -> str:
    return f"""
WITH horizon AS (SELECT max({ts}) AS maxts FROM {table}),
per AS (
    SELECT {key} AS worker, count(*) AS total_processed,
           min({ts}) AS first_ts, max({ts}) AS last_ts
    FROM {table} GROUP BY {key}
),
recent AS (
    SELECT {key} AS worker, count(*) AS last_window_increment
    FROM {table}, horizon
    WHERE epoch({ts}) >= epoch(maxts) - {active_window_s}
    GROUP BY {key}
)
SELECT per.worker, total_processed, first_ts, last_ts,
       coalesce(last_window_increment, 0) AS last_window_increment,
       (epoch(last_ts) >= epoch(maxts) - {active_window_s}) AS is_active
FROM per LEFT JOIN recent ON per.worker = recent.worker, horizon
ORDER BY per.worker
"""


def crawl_rate(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """A5 analog: per-key events/minute over the key's active span
    (server.cpp:1073-1090 pagesProcessed / uptime_minutes)."""
    k = F.col(key_col)
    span_min = (
        F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
    ) / 60.0
    return (
        events.groupBy(k.alias("key"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.count("*") / F.greatest(span_min, F.lit(1.0)), 6
            ).alias("events_per_minute"),
        )
        .orderBy("key")
    )


def crawl_rate_sql(table: str = "events", key: str = "user_id",
                   ts: str = "ts") -> str:
    return f"""
SELECT {key} AS key, count(*) AS n_events,
       round(count(*) / greatest(
           (epoch(max({ts})) - epoch(min({ts}))) / 60.0, 1.0), 6
       ) AS events_per_minute
FROM {table}
GROUP BY {key}
ORDER BY key
"""
