"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a 3-round frontier crawl over the synthetic
page store (the engine's real workload) summarized per rating, joined with
a quality-filter pass over the sf0.001 ``documents`` table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data operators (dedup /
similarity / text analysis). Spark sides exercise the real operators
(pandas-UDF kernels, expression forms, window dedups); oracle sides are
independent DuckDB SQL. Aggregate/computed columns are aliased identically
on both sides; doubles are rounded before comparison.

Deterministic crawl-state entries (crawl_summary, status_snapshot,
crawl_worker_totals, crawl_sequential, multimodal_synthetic) carry
GOLDEN-CONSTANT oracles: the pure-Python crawl/sequential oracles (which
are differential-tested against the compiled reference) compute the
expected outputs over the seeded corpora and emit them as literal SELECTs.
The non-SQL-expressible kernels (SimHash, winnowing fingerprints, LSH-ANN,
LSH near-dup) are value-checked too, via independent pure-Python golden
reimplementations over the fixed sf0.01 testdata (different algorithms
than the engine — see the oracle helpers at the bottom of this file);
since round 3 every entry in queries() has an oracle_sql() twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_c__spark.functions import (
    expressions as X,
)
from distributed_web_scrapper_and_crawler_c__spark.functions import udfs as U
from distributed_web_scrapper_and_crawler_c__spark.operators import (
    aggregates as AGG,
)
from distributed_web_scrapper_and_crawler_c__spark.operators import dedup as DD
from distributed_web_scrapper_and_crawler_c__spark.operators import (
    multimodal as MM,
)
from distributed_web_scrapper_and_crawler_c__spark.operators import (
    similarity as SIM,
)
from distributed_web_scrapper_and_crawler_c__spark.operators import (
    textstats as TS,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_t + scan-parallelism guard (plans/parallelize.spread): the testdata
    tables are single-row-group parquet files, which pin every fused
    downstream stage (synth-column build + pandas-UDF parse) to ONE scan
    task; spread() repartitions to the session parallelism only when the
    scan is narrower — a no-op on real multi-file cluster layouts. Used by
    the queries whose per-row work (UDFs, regexp, hashing) dominates."""
    from distributed_web_scrapper_and_crawler_c__spark.plans.parallelize import (
        spread,
    )

    return spread(_t(spark, sf_dir, name))


# ---------------------------------------------------------------------------
# entry — flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Crawl the synthetic site for 3 rounds, aggregate extracted books per
    rating (A4 shape), and attach corpus-quality counts from the sf0.001
    documents table."""
    from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
        CrawlEngine,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(n_books=30, n_categories=3, books_per_page=10)
    pages = sitegen.pages_dataframe(spark, spec, slices=4)
    eng = CrawlEngine(spark, pages).run("/catalogue/page-1.html", max_rounds=3)

    by_rating = eng.items.groupBy("rating").agg(
        F.count("*").alias("n_books"),
        F.round(F.avg("price_value"), 2).alias("avg_price"),
        F.min("item_seq").alias("first_seen_seq"),
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    q = TS.quality_scores(docs).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("quality") >= 0.5, 1).otherwise(0)).alias(
            "n_quality_docs"
        ),
    )
    return by_rating.crossJoin(q).orderBy("rating")


# ---------------------------------------------------------------------------
# shared SQL fragments (identical text used against DuckDB; Spark runs the
# real operators instead and must agree)
# ---------------------------------------------------------------------------

# mixed-shape synthetic URLs from `part` (same text evaluates in both engines)
URL_EXPR = (
    "concat("
    "CASE WHEN p_partkey % 4 = 0 THEN 'HTTP://WWW.Books.toscrape.com'"
    "     WHEN p_partkey % 4 = 1 THEN 'https://books.toscrape.com'"
    "     WHEN p_partkey % 4 = 2 THEN 'http://example.com'"
    "     ELSE 'http://books.toscrape.com' END,"
    "'/catalogue/', replace(p_name, ' ', '-'), '_',"
    "CAST(p_partkey AS STRING),"
    "CASE WHEN p_partkey % 5 = 0 THEN '#frag'"
    "     WHEN p_partkey % 5 = 1 THEN '?q=1'"
    "     WHEN p_partkey % 5 = 2 THEN '/search?q=x'"
    "     WHEN p_partkey % 5 = 3 THEN '/'"
    "     ELSE '/index.html' END)"
)

HOST_EXPR = (
    "CASE CAST(c_custkey % 8 AS INT)"
    " WHEN 0 THEN 'books.toscrape.com'"
    " WHEN 1 THEN 'www.indeed.com'"
    " WHEN 2 THEN 'de.linkedin.com'"
    " WHEN 3 THEN 'amazon.co.uk'"
    " WHEN 4 THEN 'shop.ebay.com'"
    " WHEN 5 THEN 'medium.com'"
    " WHEN 6 THEN 'news.ycombinator.com'"
    " ELSE 'example.org' END"
)

PRICE_STR_EXPR = (
    "CASE WHEN p_partkey % 7 = 6 THEN 'Free'"
    " ELSE concat("
    "CASE WHEN p_partkey % 3 = 0 THEN '£'"
    "     WHEN p_partkey % 3 = 1 THEN '$' ELSE '€' END,"
    "CAST(CAST(p_partkey % 90 + 10 AS INT) AS STRING),"
    "CASE WHEN p_partkey % 2 = 0 THEN '.' ELSE ',' END,"
    "lpad(CAST(CAST(p_partkey % 100 AS INT) AS STRING), 2, '0')) END"
)

# malformed-url mix exercising F12/F13 (worker.cpp:311-348)
MALFORMED_URL_EXPR = (
    "CASE CAST(p_partkey % 5 AS INT)"
    " WHEN 0 THEN concat('http://books.toscrape.comhttp://books.toscrape.com/x', CAST(p_partkey AS STRING))"
    " WHEN 1 THEN concat('mhttp://books.toscrape.com/y', CAST(p_partkey AS STRING))"
    " WHEN 2 THEN concat('http://http://books.toscrape.com/z', CAST(p_partkey AS STRING))"
    " WHEN 3 THEN ''"
    " ELSE concat('http://books.toscrape.com/ok', CAST(p_partkey AS STRING)) END"
)

RATING_WORD_EXPR = (
    "CASE CAST(p_partkey % 7 AS INT)"
    " WHEN 0 THEN 'One' WHEN 1 THEN 'Two' WHEN 2 THEN 'Three'"
    " WHEN 3 THEN 'Four' WHEN 4 THEN 'Five' WHEN 5 THEN 'star-rating Three'"
    " ELSE 'Unknown' END"
)

ITEMS_LIKE_SQL = (
    "SELECT p_partkey AS id,"
    " CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'BOOK' WHEN 1 THEN 'JOB'"
    "  WHEN 2 THEN 'PRODUCT' WHEN 3 THEN 'ARTICLE' ELSE 'GENERIC' END AS item_type,"
    " CASE WHEN p_partkey % 11 = 0 THEN 0.0 ELSE round(p_retailprice, 2) END AS price_value,"
    " CAST(p_size % 6 AS INT) AS rating_value,"
    " p_brand AS category"
    " FROM part"
)

# D3/D4 content-dedup fixture: coarse value grids manufacture duplicate
# (title, price, rating[, type]) groups; first-wins keeps min id
# (server.cpp:523-581 sequential insert order).
ITEMS_CONTENT_SQL = (
    "SELECT p_partkey AS id,"
    " concat('T', CAST(CAST(p_partkey % 50 AS INT) AS STRING)) AS title,"
    " round(CAST(p_partkey % 25 AS INT) * 1.0 + 0.99, 2) AS price_value,"
    " CAST(p_partkey % 7 AS INT) AS rating_value,"
    " CASE WHEN p_partkey % 2 = 0 THEN 'BOOK' ELSE 'PRODUCT' END AS item_type"
    " FROM part"
)

# --------------------------------------------------------------------------
# synthesized HTML (Spark-side only — the oracles below derive the expected
# kernel outputs from the SAME part columns, i.e. from the generative ground
# truth, never by re-parsing)
# --------------------------------------------------------------------------

PK = "CAST(p_partkey AS STRING)"
PAGE_URL_EXPR = (
    f"concat('http://books.toscrape.com/catalogue/page-', {PK}, '.html')"
)
# shared text (Spark builds HTML with it; DuckDB rebuilds the expected string)
PRICE0_EXPR = (
    "concat('£', CAST(CAST(p_partkey % 90 + 10 AS INT) AS STRING), '.',"
    " lpad(CAST(CAST(p_partkey % 100 AS INT) AS STRING), 2, '0'))"
)
PRICE1_EXPR = (
    "CASE WHEN p_partkey % 6 = 0 THEN 'Free'"
    " ELSE concat('$', CAST(CAST(p_partkey % 40 + 5 AS INT) AS STRING), ',',"
    " lpad(CAST(CAST(p_partkey % 100 AS INT) AS STRING), 2, '0')) END"
)
RATING0_WORD = (
    "CASE CAST(p_partkey % 6 AS INT) WHEN 0 THEN 'One' WHEN 1 THEN 'Two'"
    " WHEN 2 THEN 'Three' WHEN 3 THEN 'Four' WHEN 4 THEN 'Five'"
    " ELSE 'Silly' END"
)

# F3 — listing page with two product pods: pod a<pk> always kept (title-attr
# path unless pk%4=1, which exercises the '">…</a>' fallback); pod b<pk> has
# no href when pk%3=0 → empty url → dropped (HtmlParser.cpp:73 gate)
BOOKS_HTML_EXPR = (
    "concat('<html><body>',"
    f"'<article class=\"product_pod\"><h3><a href=\"a', {PK}, '.html\"',"
    f" CASE WHEN p_partkey % 4 = 1 THEN ''"
    f"      ELSE concat(' title=\"T', {PK}, ' ', p_name, '\"') END,"
    f" '>FB', {PK}, '</a></h3><p class=\"price_color\">', {PRICE0_EXPR},"
    f" '</p><p class=\"star-rating ', {RATING0_WORD}, '\"></p></article>',"
    "'<article class=\"product_pod\"><h3><a ',"
    f" CASE WHEN p_partkey % 3 = 0 THEN ''"
    f"      ELSE concat('href=\"b', {PK}, '\" ') END,"
    f" 'title=\"U', {PK}, '\">x</a></h3><p class=\"price_color\">',"
    f" {PRICE1_EXPR}, '</p><p class=\"star-rating Two\"></p></article>',"
    "'</body></html>')"
)

# F4 — detail page exercising the classStart=pos+18 quirk (HtmlParser.cpp:
# 304): pk%5=1 has an empty class ('ing' slice → 'Unknown'); pk%5=4 has no
# closing quote (→ rating ''); pk%7=0 drops <h1>; pk%11=0 drops the price
DETAIL_HTML_EXPR = (
    "concat("
    f"CASE WHEN p_partkey % 7 = 0 THEN ''"
    f"     ELSE concat('<h1>H', {PK}, ' ', p_name, '</h1>') END,"
    f"CASE WHEN p_partkey % 11 = 0 THEN ''"
    f"     ELSE concat('<p class=\"price_color\">', {PRICE0_EXPR}, '</p>') END,"
    "CASE CAST(p_partkey % 5 AS INT)"
    " WHEN 0 THEN '<p class=\"star-rating Three\"></p>'"
    " WHEN 1 THEN '<p class=\"star-rating\"></p>'"
    " WHEN 2 THEN ''"
    " WHEN 3 THEN '<p class=\"star-rating Five\"></p>'"
    " ELSE '<p class=\"star-rating Two' END)"
)

# F5 — next-link li present / present-without-anchor / absent
NEXT_HTML_EXPR = (
    "concat('<ul><li class=\"a\">x</li>',"
    "CASE CAST(p_partkey % 3 AS INT)"
    f" WHEN 0 THEN concat('<li class=\"next\"><a href=\"page-', {PK},"
    f" '.html\">next</a></li>')"
    " WHEN 1 THEN '<li class=\"next\">noanchor</li>'"
    " ELSE '' END, '</ul>')"
)

# F6 — (link, base) shape matrix: absolute http/https, empty,
# scheme-relative, root-relative, path-relative long base, schemeless base
NORM_LINK_EXPR = (
    "CASE CAST(p_partkey % 7 AS INT)"
    " WHEN 0 THEN 'http://x.com/a'"
    " WHEN 1 THEN 'https://y.com/b'"
    " WHEN 2 THEN ''"
    " WHEN 3 THEN '//cdn.example/z'"
    f" WHEN 4 THEN concat('/abs/p', {PK})"
    f" WHEN 5 THEN concat('rel', {PK}, '.html')"
    " ELSE 'c.html' END"
)
NORM_BASE_EXPR = (
    "CASE CAST(p_partkey % 7 AS INT)"
    " WHEN 3 THEN 'http://books.toscrape.com'"
    " WHEN 5 THEN 'http://books.toscrape.com/catalogue/page-2.html'"
    " WHEN 6 THEN 'books.toscrape.com'"
    " ELSE 'http://books.toscrape.com/catalogue/page-1.html' END"
)

# F8 — href mix: kept relative, static (.png), off-domain, duplicate,
# malformed domain-concat, and (even pk) an absolute same-domain link
LINKS_HTML_EXPR = (
    "concat("
    f"'<a href=\"a', {PK}, '.html\">x</a>',"
    "'<img href=\"x.png\">',"
    "'<a href=\"http://example.com/off\">o</a>',"
    f"'<a href=\"a', {PK}, '.html\">dup</a>',"
    "'<a href=\"http://books.toscrape.comhttp://books.toscrape.com/m\">bad</a>',"
    f"CASE WHEN p_partkey % 2 = 0 THEN"
    f" concat('<a href=\"http://books.toscrape.com/extra', {PK}, '\">e</a>')"
    f" ELSE '' END)"
)

# F1 — extract_between marker matrix
BETWEEN_TEXT_EXPR = (
    "CASE CAST(p_partkey % 4 AS INT)"
    f" WHEN 0 THEN concat('<title>Name', {PK}, '</title>')"
    " WHEN 1 THEN '<title>unterminated'"
    " WHEN 2 THEN 'no markers here'"
    " ELSE '<title>A</title><title>B</title>' END"
)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- crawl kernels over synthesized URLs (F6/F7/F9/F10/F11/F16) ----

    def url_canonicalize(spark, sf):
        u = _ts(spark, sf, "part").selectExpr("p_partkey", f"{URL_EXPR} AS url")
        return u.select(
            "p_partkey", "url", U.canonicalize_udf(F.col("url")).alias("canonical")
        )

    q["url_canonicalize"] = url_canonicalize

    def url_canonicalize_expr(spark, sf):
        # expression (codegen) form of F7 — same answer as the UDF form
        u = _ts(spark, sf, "part").selectExpr("p_partkey", f"{URL_EXPR} AS url")
        return u.selectExpr(
            "p_partkey", "url", X.canonicalize_url_sql("url") + " AS canonical"
        )

    q["url_canonicalize_expr"] = url_canonicalize_expr

    def url_predicates(spark, sf):
        u = _ts(spark, sf, "part").selectExpr("p_partkey", f"{URL_EXPR} AS url")
        return u.select(
            "p_partkey",
            X.is_book_page_expr(F.col("url")).alias("is_book"),
            X.is_category_page_expr(F.col("url")).alias("is_category"),
            X.should_ignore_url_expr(F.col("url")).alias("ignored"),
        )

    q["url_predicates"] = url_predicates

    def url_classify(spark, sf):
        h = _ts(spark, sf, "customer").selectExpr("c_custkey", f"{HOST_EXPR} AS host")
        return h.select(
            "c_custkey", "host",
            X.classify_item_type_expr(F.col("host")).alias("item_type"),
        )

    q["url_classify"] = url_classify

    def price_rating_coercion(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey",
            f"{PRICE_STR_EXPR} AS price_str",
            f"{RATING_WORD_EXPR} AS rating_word",
        )
        return p.select(
            "p_partkey", "price_str", "rating_word",
            U.price_value_udf(F.col("price_str")).alias("price_value"),
            X.rating_value_expr(F.col("rating_word")).alias("rating_value"),
            X.parse_rating_expr(F.col("rating_word")).alias("rating_parsed"),
        )

    q["price_rating_coercion"] = price_rating_coercion

    def url_repair(spark, sf):
        u = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{MALFORMED_URL_EXPR} AS url"
        )
        return u.select(
            "p_partkey", "url",
            X.is_valid_url_expr(F.col("url")).alias("is_valid"),
            X.fix_malformed_url_expr(F.col("url")).alias("repaired"),
        )

    q["url_repair"] = url_repair

    # ---- HTML parse kernels over synthesized pages (F1/F3/F4/F5/F6/F8) ----

    def parse_extract_between(spark, sf):
        t = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{BETWEEN_TEXT_EXPR} AS text"
        )
        return t.select(
            "p_partkey", "text",
            U.extract_between_udf(
                F.col("text"), F.lit("<title>"), F.lit("</title>")
            ).alias("between"),
        )

    q["parse_extract_between"] = parse_extract_between

    def parse_books(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{BOOKS_HTML_EXPR} AS html",
            f"{PAGE_URL_EXPR} AS page_url",
        )
        return p.select(
            "p_partkey",
            F.posexplode(
                U.parse_books_udf(F.encode("html", "utf-8"), F.col("page_url"))
            ).alias("book_rank", "_bk"),
        ).select("p_partkey", "book_rank", "_bk.*")

    q["parse_books"] = parse_books

    def parse_book_page(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{DETAIL_HTML_EXPR} AS html",
            f"{PAGE_URL_EXPR} AS page_url",
        )
        return p.select(
            "p_partkey",
            U.parse_book_page_udf(
                F.encode("html", "utf-8"), F.col("page_url")
            ).alias("_bk"),
        ).select("p_partkey", "_bk.*")

    q["parse_book_page"] = parse_book_page

    def parse_find_next_link(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{NEXT_HTML_EXPR} AS html"
        )
        return p.select(
            "p_partkey",
            U.find_next_link_udf(F.encode("html", "utf-8")).alias("next_href"),
        )

    q["parse_find_next_link"] = parse_find_next_link

    def url_normalize(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{NORM_LINK_EXPR} AS link", f"{NORM_BASE_EXPR} AS base"
        )
        return p.select(
            "p_partkey", "link", "base",
            U.normalize_udf(F.col("link"), F.col("base")).alias("normalized"),
        )

    q["url_normalize"] = url_normalize

    def parse_extract_links(spark, sf):
        p = _ts(spark, sf, "part").selectExpr(
            "p_partkey", f"{LINKS_HTML_EXPR} AS html",
            f"{PAGE_URL_EXPR} AS page_url",
        )
        return p.select(
            "p_partkey",
            F.posexplode(
                U.extract_links_udf(F.encode("html", "utf-8"), F.col("page_url"))
            ).alias("pos", "link"),
        )

    q["parse_extract_links"] = parse_extract_links

    # ---- content dedup on items (D3/D4, server.cpp:523-581) ----

    def dedup_content_book(spark, sf):
        _t(spark, sf, "part").createOrReplaceTempView("part")
        items = spark.sql(ITEMS_CONTENT_SQL)
        return DD.content_dedup(
            items, ["title", "price_value", "rating_value"], "id"
        ).select("id", "title", "price_value", "rating_value")

    q["dedup_content_book"] = dedup_content_book

    def dedup_content_item(spark, sf):
        _t(spark, sf, "part").createOrReplaceTempView("part")
        items = spark.sql(ITEMS_CONTENT_SQL)
        return DD.content_dedup(
            items, ["item_type", "title", "price_value", "rating_value"], "id"
        ).select("id", "item_type", "title", "price_value", "rating_value")

    q["dedup_content_item"] = dedup_content_item

    # ---- aggregations (A1-A6) ----

    def item_stats(spark, sf):
        _t(spark, sf, "part").createOrReplaceTempView("part")
        items = spark.sql(ITEMS_LIKE_SQL)
        return AGG.item_stats(items, "item_type", "price_value",
                              "rating_value", "category")

    q["item_stats"] = item_stats

    def crawl_rate(spark, sf):
        return AGG.crawl_rate(_t(spark, sf, "events"))

    q["crawl_rate"] = crawl_rate

    def worker_totals(spark, sf):
        # A1-A3 (server.cpp:130-179): lifetime totals, last-window
        # increments, heartbeat-style active flag per worker key
        return AGG.worker_totals(_t(spark, sf, "events"),
                                 active_window_s=86400)

    q["worker_totals"] = worker_totals

    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 1).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    q["q1_pricing_summary"] = q1_pricing_summary

    def q3_top_orders(spark, sf):
        # join order reassociated (identical inner-equi-join result): attach
        # the BUILDING customers to orders first, then broadcast that
        # pre-filtered order set to the lineitem scan — lineitem (the big
        # side) is never shuffled, and the partial aggregation runs map-side
        # before the only exchange (guide §3.1/§2.3). The broadcast side is
        # the segment's orders (~1/5 of orders, projected to 4 columns).
        c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        return (
            li.select("l_orderkey", "l_extendedprice", "l_discount")
            .join(F.broadcast(oc), li.l_orderkey == oc.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    q["q3_top_orders"] = q3_top_orders

    def broadcast_dim_join(spark, sf):
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"))
            .agg(
                F.count("*").alias("n_customers"),
                F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
            )
        )

    q["broadcast_dim_join"] = broadcast_dim_join

    # ---- dedup / set ops (D1-D4, §2.8) ----

    def dedup_first_wins(spark, sf):
        # min-struct aggregation instead of a per-key row_number window:
        # the struct min orders by (o_orderdate, o_orderkey) — exactly the
        # window's ORDER BY — so the kept row is identical, but the
        # map-side partial aggregation collapses each partition's rows
        # before the exchange (guide §2.3 "aggregate before you shuffle")
        # and no sort runs at all.
        o = _t(spark, sf, "orders")
        return (
            o.groupBy("o_custkey")
            .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("_w"))
            .select(
                F.col("o_custkey").alias("custkey"),
                F.col("_w.o_orderkey").alias("first_orderkey"),
                F.col("_w.o_orderdate").alias("first_orderdate"),
            )
        )

    q["dedup_first_wins"] = dedup_first_wins

    def seen_anti_join(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return (
            c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select(F.col("c_custkey").alias("custkey"),
                    F.col("c_name").alias("name"))
        )

    q["seen_anti_join"] = seen_anti_join

    def cuckoo_seen_filter(spark, sf):
        """URL-seen pre-filter, cuckoo family (plans/cuckoo, north-star
        "bloom/cuckoo URL-seen"): candidates that miss the filter are
        definitely new; hits go through the exact anti-join backstop — so
        the result is EXACTLY the anti-join, which is what the DuckDB
        oracle computes with no knowledge of the filter."""
        from distributed_web_scrapper_and_crawler_c__spark.plans import (
            cuckoo as CKm,
        )

        d = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.concat(
                F.lit("http://docs.example.com/"), F.col("source"),
                F.lit("/"), F.col("doc_id").cast("string"),
            ).alias("url"),
        )
        seen = d.filter(F.col("doc_id") % 3 == 0).select(
            F.col("url").alias("canonical")
        )
        nb = CKm.next_pow2_buckets(2 * max(1, seen.count()))
        table = CKm.cuckoo_local(seen, "canonical", nb)
        probe = CKm.maybe_seen_col(spark, table.tobytes(), nb)
        flagged = d.withColumn(
            "_maybe",
            probe(
                F.xxhash64("url", F.lit(CKm.FP_SEED)),
                F.xxhash64("url", F.lit(CKm.IX_SEED)),
            ),
        )
        sure_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
        checked = maybe.join(
            seen, maybe.url == seen.canonical, "left_anti"
        )
        return sure_new.unionByName(checked).select("doc_id", "url")

    q["cuckoo_seen_filter"] = cuckoo_seen_filter

    def priority_dequeue(spark, sf):
        """Priority-frontier politeness dequeue (plans/seq.with_grouped_rank,
        the order key CrawlEngine uses under priority_expr): synthesize a
        frontier from documents (host = source, seq = doc_id, priority =
        n_chars mod 7), rank per host by (priority, seq) through the
        grouped-rank SCALE plan (approx_rows omitted -> two-phase range
        partition + boundary offsets, the same plan big rounds take), keep
        rank <= budget. The DuckDB oracle is the semantic definition: one
        ROW_NUMBER window per host."""
        from distributed_web_scrapper_and_crawler_c__spark.plans import (
            seq as seq_mod,
        )

        budget = 5
        fr = _t(spark, sf, "documents").select(
            F.col("source").alias("host"),
            F.col("doc_id").cast("long").alias("seq"),
            (F.col("n_chars") % 7).cast("int").alias("priority"),
        )
        ranked = seq_mod.with_grouped_rank(
            fr, "host", ["priority", "seq"], rank_col="rank"
        )
        return ranked.filter(F.col("rank") <= budget).select(
            "host", "seq", "priority", F.col("rank").cast("long").alias("rank")
        )

    q["priority_dequeue"] = priority_dequeue

    def union_dedup(spark, sf):
        c = _t(spark, sf, "customer").select(
            F.col("c_nationkey").cast("int").alias("nationkey")
        )
        s = _t(spark, sf, "supplier").select(
            F.col("s_nationkey").cast("int").alias("nationkey")
        )
        return (
            c.unionByName(s).distinct()
            .groupBy().agg(F.count("*").alias("n_distinct_nations"))
        )

    q["union_dedup"] = union_dedup

    def topk_sample(spark, sf):
        return (
            _t(spark, sf, "orders")
            .orderBy("o_orderkey")
            .limit(5)
            .select("o_orderkey", "o_custkey", "o_orderstatus")
        )

    q["topk_sample"] = topk_sample

    def window_last_n(spark, sf):
        from pyspark.sql import Window

        e = _t(spark, sf, "events")
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(-3, -1)
        )
        return e.select(
            "event_id", "user_id",
            F.round(F.coalesce(F.avg("value").over(w), F.lit(0.0)), 6).alias(
                "trailing_avg"
            ),
        )

    q["window_last_n"] = window_last_n

    # ---- training-data ops: dedup ----

    def dedup_exact(spark, sf):
        # plain read: md5+groupBy is cheap enough that a spread shuffle of
        # the text column costs more than the single-task scan it saves
        docs = _t(spark, sf, "documents")
        return (
            docs.select("doc_id", F.md5("text").alias("text_md5"))
            .groupBy("text_md5")
            .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        )

    q["dedup_exact"] = dedup_exact

    def dedup_minhash_lsh(spark, sf):
        return DD.lsh_candidate_pairs(_t(spark, sf, "documents"))

    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_minhash_signatures(spark, sf):
        return DD.minhash_signatures(_t(spark, sf, "documents"))

    q["dedup_minhash_signatures"] = dedup_minhash_signatures

    def dedup_ngram_jaccard(spark, sf):
        # ungated exact form — kept oracle-checkable; production scale path
        # is near_dup_pipeline below (LSH-gated)
        return DD.ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.1)

    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def near_dup_pipeline(spark, sf):
        return DD.near_dup_pipeline(_t(spark, sf, "documents"), threshold=0.1)

    q["near_dup_pipeline"] = near_dup_pipeline

    def dedup_simhash(spark, sf):  # oracle: independent all-pairs numpy golden
        # max_hamming=3 — the largest distance the 4×16-bit band blocking
        # pigeonhole-guarantees full recall for (dedup.py simhash docstring).
        return DD.simhash_near_dups(_t(spark, sf, "documents"), max_hamming=3)

    q["dedup_simhash"] = dedup_simhash

    # ---- training-data ops: similarity ----

    def ann_cosine_topk(spark, sf):
        return SIM.brute_force_topk(_t(spark, sf, "embeddings"), n_queries=5, k=10)

    q["ann_cosine_topk"] = ann_cosine_topk

    def ann_lsh_topk(spark, sf):
        # dim=None: the hyperplanes derive deterministically from the first
        # Arrow batch inside the UDFs — no one-row dimension-sniff job
        return SIM.lsh_ann_topk(
            _t(spark, sf, "embeddings"), None, n_queries=5, k=10
        )

    q["ann_lsh_topk"] = ann_lsh_topk

    def ann_ivf_topk(spark, sf):
        # IVF coarse-quantizer ANN — the data-adapted twin of the LSH path
        return SIM.ivf_ann_topk(_t(spark, sf, "embeddings"), n_queries=5, k=10)

    q["ann_ivf_topk"] = ann_ivf_topk

    # near-dup fixture: the synthetic embeddings are near-orthogonal (no
    # natural pairs above cosine 0.5), so the near-dup queries run over the
    # table augmented with SCALED copies (positive scaling preserves cosine
    # → planted pairs at cosine ≈ 1.0); both engines build it identically
    def _augmented_emb(spark, sf):
        e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        dups = e.filter(F.col("vec_id") < 100).selectExpr(
            "vec_id + 10000 AS vec_id",
            "transform(embedding,"
            " x -> CAST(x * CAST(1.01 AS DOUBLE) AS FLOAT)) AS embedding",
        )
        return e.filter(F.col("vec_id") < 200).unionByName(dups)

    def embedding_near_dup_exact(spark, sf):
        return SIM.exact_near_dup_pairs(_augmented_emb(spark, sf),
                                        threshold=0.9)

    q["embedding_near_dup_exact"] = embedding_near_dup_exact

    def embedding_near_dup_lsh(spark, sf):  # oracle: per-bucket numpy golden
        return SIM.embedding_cosine_near_dups(
            _augmented_emb(spark, sf), threshold=0.9
        ).select("id_a", "id_b", "cosine")

    q["embedding_near_dup_lsh"] = embedding_near_dup_lsh

    def embedding_norms(spark, sf):
        emb = _t(spark, sf, "embeddings")
        return emb.groupBy("label").agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(SIM._norm(F.col("embedding"))), 6).alias("avg_norm"),
        )

    q["embedding_norms"] = embedding_norms

    # ---- training-data ops: text analysis ----

    def text_token_counts(spark, sf):
        out = TS.token_counts(_t(spark, sf, "documents"))
        return out.select(
            "doc_id",
            F.col("ws_tokens").cast("long").alias("ws_tokens"),
            F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )

    q["text_token_counts"] = text_token_counts

    def text_quality(spark, sf):
        out = TS.quality_scores(_t(spark, sf, "documents"))
        return out.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_punct").cast("long").alias("n_punct"),
            F.col("n_stop").cast("long").alias("n_stop"),
            "quality",
        )

    q["text_quality"] = text_quality

    def text_langid(spark, sf):
        out = TS.langid(_t(spark, sf, "documents"))
        return out.select(
            "doc_id", "lang",
            *[F.col(f"s_{lang}").cast("long").alias(f"s_{lang}")
              for lang in ("en", "de", "fr", "es")],
            "predicted_lang",
        )

    q["text_langid"] = text_langid

    def doc_fingerprints(spark, sf):  # oracle: textbook rolling-hash golden
        return TS.fingerprints(_t(spark, sf, "documents")).select(
            "doc_id", F.size("fingerprint").alias("n_hashes")
        )

    q["doc_fingerprints"] = doc_fingerprints

    # ---- crawl summary metrics, A6 (golden-constant oracle from the
    # differential-tested pure-Python crawl oracle) ----

    def crawl_summary(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
            CrawlEngine,
        )
        from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

        spec = sitegen.SiteSpec(n_books=30, n_categories=3, books_per_page=10)
        pages = sitegen.pages_dataframe(spark, spec, slices=4)
        eng = CrawlEngine(spark, pages).run("/catalogue/page-1.html")
        # A6 (Crawler.cpp:303-314): end-of-run totals over per-round metrics.
        # metrics_df is per (round, partition) — collapse to rounds first.
        # F.max, not F.first: the values are constant per round (one
        # metrics row per (round, partition) repeats the round totals), and
        # max makes that invariant deterministic by construction.
        per_round = eng.metrics_df().groupBy("round").agg(
            F.max("urls_fetched").alias("urls_fetched"),
            F.max("links_new").alias("links_new"),
            F.max("links_dup").alias("links_dup"),
            F.max("links_ignored").alias("links_ignored"),
            F.max("books_found").alias("books_found"),
        )
        return per_round.agg(
            F.sum("urls_fetched").alias("pages_crawled"),
            F.sum("links_new").alias("unique_urls_queued"),
            F.sum("links_dup").alias("duplicate_urls_skipped"),
            F.sum("links_ignored").alias("ignored_urls"),
            F.sum("books_found").alias("unique_books"),
            F.max("round").alias("last_round"),
        )

    q["crawl_summary"] = crawl_summary

    # ---- sequential crawl strategy (golden-constant oracle) ----

    def crawl_sequential(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.plans.sequential import (
            sequential_crawl,
        )
        from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

        spec = sitegen.SiteSpec(n_books=30, n_categories=3, books_per_page=10)
        pages = sitegen.pages_dataframe(spark, spec, slices=4)
        return sequential_crawl(spark, pages, max_pages=0)

    q["crawl_sequential"] = crawl_sequential

    # ---- multimodal plumbing (stub decode; oracle-checked rollup) ----

    def multimodal_features(spark, sf):
        # real mapInPandas path over a deterministic part-derived media
        # table, so the per-kind rollup has a DuckDB oracle
        media = MM.media_from_part(spark, _t(spark, sf, "part"))
        return MM.media_summary(MM.extract_features(media))

    q["multimodal_features"] = multimodal_features

    def multimodal_synthetic(spark, sf):  # oracle: golden-constant rollup
        media = MM.synthetic_media(spark, n=64)
        return MM.media_summary(MM.extract_features(media))

    q["multimodal_synthetic"] = multimodal_synthetic

    # ---- S6 status view + A1-A3 over real crawl metrics
    # (golden-constant oracles) ----

    def status_snapshot(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
            CrawlEngine,
        )
        from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

        spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
        pages = sitegen.pages_dataframe(spark, spec, slices=2)
        eng = CrawlEngine(spark, pages).run("/catalogue/page-1.html")
        return eng.status_df()

    q["status_snapshot"] = status_snapshot

    def crawl_worker_totals(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.plans.frontier import (
            CrawlEngine,
        )
        from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

        spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
        pages = sitegen.pages_dataframe(spark, spec, slices=2)
        eng = CrawlEngine(spark, pages).run("/catalogue/page-1.html")
        # A1/A3 (server.cpp:130-179) over the engine's own lineage metrics,
        # keyed by ROUND: the per-round fleet fetch increment (A3's delta)
        # and the running lifetime total (A1). Round-keyed — unlike a
        # partition_id grouping — these are a pure function of the seeded
        # corpus, so the Python crawl oracle emits them as a golden-constant
        # SQL oracle. (Per-PARTITION worker totals remain oracle-asserted in
        # pytest, where the engine's own partitioning is in scope.)
        from pyspark.sql import Window

        # F.max, not F.first: urls_fetched is constant per round; max is
        # deterministic by construction where first is documented not to be.
        m = eng.metrics_df().groupBy("round").agg(
            F.max("urls_fetched").alias("urls_fetched")
        )
        w = Window.orderBy("round").rowsBetween(Window.unboundedPreceding, 0)
        return m.select(
            "round", "urls_fetched",
            F.sum("urls_fetched").over(w).alias("cum_fetched"),
        ).orderBy("round")

    q["crawl_worker_totals"] = crawl_worker_totals

    # ---- D5/D6/D7 distributed-mode emulation (SURVEY §2.9's reserved
    # flag, worker.cpp:848-899,919-968,1211-1223): deterministic
    # serialization over a literal fixture; golden-constant oracles from
    # an independent global-interleave twin (see _emu_*_golden) ----

    def dedup_emulated_url(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.operators import (
            distributed_emulation as DE,
        )

        df = spark.createDataFrame(
            _emu_url_fixture(), "seq BIGINT, url STRING"
        )
        return DE.emulated_url_dedup(
            df, n_workers=2, max_processed=4, seed_url=_EMU_SEED
        )

    q["dedup_emulated_url"] = dedup_emulated_url

    def dedup_emulated_ring(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.operators import (
            distributed_emulation as DE,
        )

        df = spark.createDataFrame(
            _emu_book_fixture(),
            "seq BIGINT, title STRING, price STRING, rating INT",
        )
        return DE.emulated_recent_book_dedup(df, n_workers=2, ring_size=3)

    q["dedup_emulated_ring"] = dedup_emulated_ring

    # ---- robots.txt -> rules table (politeness front half; oracle from
    # stdlib urllib.robotparser's independently parsed entries) ----

    def robots_rules(spark, sf):
        from distributed_web_scrapper_and_crawler_c__spark.sources import (
            robots as R,
        )

        df = spark.createDataFrame(
            _robots_fixture(), "host STRING, robots_txt STRING"
        )
        return R.robots_rules_from_texts(df, agent="spark-crawler")

    q["robots_rules"] = robots_rules

    # ---- robots.txt -> per-host Crawl-delay (politeness pacing: feeds
    # CrawlEngine(min_delay=crawl_delay_rounds(...)); oracle from stdlib
    # urllib.robotparser.crawl_delay, an independent parser) ----

    def robots_crawl_delay(spark, sf):
        from pyspark.sql import functions as F

        from distributed_web_scrapper_and_crawler_c__spark.sources import (
            robots as R,
        )

        df = spark.createDataFrame(
            _robots_delay_fixture(), "host STRING, robots_txt STRING"
        )
        # delay_rounds = the engine knob for a crawl whose rounds take
        # ~2 s of wall clock (crawl_delay_rounds twin, Spark-side)
        return (
            R.robots_host_delays_from_texts(df, agent="spark-crawler")
            .withColumn(
                "delay_rounds",
                F.ceil(F.col("crawl_delay") / F.lit(2.0)).cast("int"),
            )
            .orderBy("host")
        )

    q["robots_crawl_delay"] = robots_crawl_delay

    # ---- full RFC 9309 robots matching (Allow + wildcards + longest
    # match): the Catalyst verdict plan (one broadcast join of a one-row-
    # per-host rules array + higher-order-function filter) over a fixed
    # probe list; oracle = golden constants from an independent NFA-walk
    # matcher + line parser (_robots_allow_golden) ----

    def robots_allow_verdicts(spark, sf):
        from pyspark.sql import functions as F

        from distributed_web_scrapper_and_crawler_c__spark.sources import (
            robots as R,
        )

        robots_df = spark.createDataFrame(
            _robots_allow_fixture(), "host STRING, robots_txt STRING"
        )
        full = R.full_rules_from_texts(robots_df, agent="spark-crawler")
        hr = R.host_rules_frame(full).withColumnRenamed("host", "_rhost")
        probes = spark.createDataFrame(
            _robots_allow_probes(), "host STRING, path STRING"
        )
        return (
            probes.join(
                F.broadcast(hr), probes["host"] == F.col("_rhost"), "left"
            )
            .select(
                "host", "path",
                R.robots_allowed_col(F.col("_rules"), F.col("path")).alias(
                    "allowed"
                ),
            )
            .orderBy("host", "path")
        )

    q["robots_allow_verdicts"] = robots_allow_verdicts

    return q


# ---------------------------------------------------------------------------
# golden-constant oracles (VERDICT r2 task 3)
#
# The crawl-state queries run over the SEEDED sitegen corpus, so their
# expected outputs are computable constants: the pure-Python crawl oracle
# (itself differential-tested against the compiled reference) produces the
# exact values, which are emitted as literal-SELECT SQL. This turns the
# formerly rows-only driver entries into fully value-checked rows without
# the oracle ever re-running Spark.
# ---------------------------------------------------------------------------

import functools


def _sql_lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    return f"CAST({v} AS {typ})"


def _literal_select(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    if not rows:
        # typed zero-row SELECT — an empty UNION ALL chain would be
        # invalid SQL, and the schema must still match the Spark side
        return (
            "SELECT "
            + ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
            + " WHERE FALSE"
        )
    sels = [
        "SELECT "
        + ", ".join(f"{_sql_lit(v, t)} AS {n}" for (n, t), v in zip(cols, row))
        for row in rows
    ]
    return "\nUNION ALL\n".join(sels)


@functools.lru_cache(maxsize=None)
def _crawl_golden(n_books: int, n_categories: int, books_per_page: int):
    from distributed_web_scrapper_and_crawler_c__spark.oracle import (
        crawl_oracle,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(
        n_books=n_books, n_categories=n_categories, books_per_page=books_per_page
    )
    return crawl_oracle.crawl(sitegen.pages_dict(spec))


@functools.lru_cache(maxsize=None)
def _sequential_golden(
    n_books: int, n_categories: int, books_per_page: int
) -> tuple:
    """Pure-Python twin of plans.sequential.sequential_crawl over the seeded
    corpus: the next-link walk + first-wins canonical book dedup, with
    (chain_idx, book_rank) attached (Crawler.cpp:37-135 order)."""
    from distributed_web_scrapper_and_crawler_c__spark.functions import (
        kernels as K,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(
        n_books=n_books, n_categories=n_categories, books_per_page=books_per_page
    )
    pages_map = sitegen.pages_dict(spec)
    cur = "http://books.toscrape.com/catalogue/page-1.html"
    seen: set[str] = set()
    visited: set[str] = set()
    rows: list[tuple] = []
    idx = 0
    while cur and cur not in visited:
        visited.add(cur)
        html = pages_map.get(cur)
        if html is None:
            break
        for rank, b in enumerate(K.parse_books(html, cur)):
            c = K.canonicalize_url(b.url)
            if c not in seen:
                seen.add(c)
                rows.append((idx, rank, b.title, b.price, b.rating, b.url, c))
        nxt = K.find_next_link(html)
        cur = K.normalize_url(nxt, cur) if nxt else ""
        idx += 1
    return tuple(rows)


# ---------------------------------------------------------------------------
# independent pure-Python golden oracles for the non-SQL kernels
#
# The driver's correctness gate runs at sf=0.01 over the fixed testdata, so
# the pandas-UDF queries (winnowing fingerprints, SimHash pairs, LSH-ANN,
# LSH-blocked embedding near-dup) ALSO have computable expected outputs.
# Each helper below is an INDEPENDENT reimplementation of the operator's
# spec — classic O(n) rolling hash vs the UDF's matrix form, np.unpackbits
# vs the UDF's shift matrix, per-bucket nested loops vs the engine's joins —
# so agreement checks the Spark plumbing (joins, dedup, ranking, banding),
# not one code path against itself.
# ---------------------------------------------------------------------------

_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's gate runs at sf=0.01


def _round_half_up6(x: float) -> float:
    """Spark's ROUND(x, 6) semantics on DoubleType: BigDecimal.valueOf
    (i.e. the decimal *string* repr of the double — Python repr matches
    Double.toString's round-trip repr) quantized HALF_UP at scale 6.
    Python's round() is half-even and a binary floor(x*1e6+0.5) re-rounds
    in binary; both can diverge from Spark at knife-edge ties."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _fold_dot(a, b) -> float:
    """Dot product with the engine's exact summation order: a sequential
    left fold of acc + x*y over per-element float→double widenings —
    matching similarity._dot's F.aggregate(F.zip_with(...)) so the golden
    double is bit-identical to Spark's, not numpy's pairwise-summed dot."""
    s = 0.0
    for x, y in zip(a.tolist(), b.tolist()):
        s += x * y
    return s


def _fold_norm(a) -> float:
    """L2 norm with similarity._norm's fold order (sqrt of sequential
    sum of squares)."""
    import math

    s = 0.0
    for x in a.tolist():
        s += x * x
    return math.sqrt(s)


@functools.lru_cache(maxsize=None)
def _docs_rows() -> tuple:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{_ORACLE_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    return tuple(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )


@functools.lru_cache(maxsize=None)
def _emb_matrix():
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    return ids, m


@functools.lru_cache(maxsize=None)
def _fingerprint_golden(k: int = 5, w: int = 4) -> tuple:
    """Winnowing (doc_id, n_hashes) via the textbook O(n) rolling update —
    not the UDF's power-matrix multiply."""
    M = 1 << 64
    B = 1_000_003
    rows = []
    for doc_id, t in _docs_rows():
        if not t or len(t) < k:  # quirk preserved: gate on CHAR length
            rows.append((doc_id, 0))
            continue
        b = t.lower().encode("utf-8", "replace")
        n = len(b) - k + 1
        h = 0
        for c in b[:k]:
            h = (h * B + c) % M
        hashes = [h]
        top = pow(B, k - 1, M)
        for i in range(1, n):
            h = ((h - b[i - 1] * top) * B + b[i + k - 1]) % M
            hashes.append(h)
        if n <= w:
            sel = {min(hashes)}
        else:
            sel = set()
            for i in range(n - w + 1):
                win = hashes[i : i + w]
                m0 = min(win)
                sel.add(win[w - 1 - win[::-1].index(m0)])  # rightmost min
        rows.append((doc_id, len(sel)))
    return tuple(rows)


@functools.lru_cache(maxsize=None)
def _simhash_golden(max_hamming: int = 3) -> tuple:
    """All-pairs SimHash Hamming ≤ max_hamming — exact nested loop (the
    banded join's pigeonhole guarantee says Spark must find exactly these).
    Fingerprints via np.unpackbits, not the UDF's shift matrix."""
    import hashlib

    import numpy as np

    ids, fps = [], []
    for doc_id, t in _docs_rows():
        toks = t.lower().split() if t else []
        if not toks:
            ids.append(doc_id)
            fps.append(0)
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                for w in toks
            ],
            dtype=np.uint64,
        )
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
        fp = 0
        for j in range(64):
            if votes[j] > 0:
                fp |= 1 << j
        ids.append(doc_id)
        fps.append(fp)
    rows = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= max_hamming:
                i, j = sorted((ids[a], ids[b]))
                rows.append((i, j, d))
    return tuple(rows)


@functools.lru_cache(maxsize=None)
def _ann_lsh_golden(
    n_queries: int = 5, k: int = 10, n_planes: int = 8, seed: int = 42,
    n_probes: int = 4,
) -> tuple:
    """Multi-probe LSH-ANN top-k — per-query nested loops over a bucket
    membership dict, vs the engine's explode + broadcast join + window."""
    import numpy as np

    ids, m = _emb_matrix()
    md = m.astype(np.float64)
    planes = np.random.RandomState(seed).standard_normal((n_planes, md.shape[1]))
    proj = md @ planes.T
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = ((proj > 0) @ weights).astype(np.int64)
    # cosines via the engine's exact fold order over the raw float32 rows
    # (numpy's pairwise dot could differ in the last ulp → 6th-decimal tie)
    norms = np.array([_fold_norm(m[i]) for i in range(len(ids))])
    flips = min(max(n_probes - 1, 0), n_planes)
    rows = []
    for qi in np.where(ids < n_queries)[0]:
        order = np.argsort(np.abs(proj[qi]))
        probe = {int(buckets[qi])} | {
            int(buckets[qi] ^ (1 << int(order[j]))) for j in range(flips)
        }
        scored = [
            (
                int(ids[ci]),
                _round_half_up6(
                    _fold_dot(m[qi], m[ci]) / (norms[qi] * norms[ci])
                ),
            )
            for ci in range(len(ids))
            if int(buckets[ci]) in probe and ids[ci] != ids[qi]
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        for r, (vid, cos) in enumerate(scored[:k], 1):
            rows.append((int(ids[qi]), vid, cos, r))
    return tuple(rows)


@functools.lru_cache(maxsize=None)
def _ann_ivf_golden(
    n_queries: int = 5, k: int = 10, n_cells: int = 16, n_probe: int = 4,
    sample: int = 2048, seed: int = 13,
) -> tuple:
    """IVF-ANN top-k — the centroids are index parameters (the same seeded
    Lloyd's as the engine, like LSH's shared hyperplanes); cell assignment,
    probing and ranking are independent plain-numpy loops."""
    import numpy as np

    from distributed_web_scrapper_and_crawler_c__spark.operators.similarity import (
        ivf_centroids,
    )

    ids, m = _emb_matrix()
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    md = m.astype(np.float64)
    cents = ivf_centroids(md[:sample], n_cells, seed=seed)
    c_sq = (cents * cents).sum(axis=1)
    cells = (c_sq[None, :] - 2.0 * (md @ cents.T)).argmin(axis=1)
    # cosines via the engine's exact fold order (see _fold_dot)
    norms = np.array([_fold_norm(m[i]) for i in range(len(ids))])
    rows = []
    for qi in np.where(ids < n_queries)[0]:
        d = c_sq - 2.0 * (cents @ md[qi])
        probes = set(np.argsort(d)[: min(n_probe, len(cents))].tolist())
        scored = [
            (
                int(ids[ci]),
                _round_half_up6(
                    _fold_dot(m[qi], m[ci]) / (norms[qi] * norms[ci])
                ),
            )
            for ci in range(len(ids))
            if cells[ci] in probes and ids[ci] != ids[qi]
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        for r, (vid, cos) in enumerate(scored[:k], 1):
            rows.append((int(ids[qi]), vid, cos, r))
    return tuple(rows)


@functools.lru_cache(maxsize=None)
def _embedding_near_dup_lsh_golden(
    threshold: float = 0.9, n_planes: int = 6, seed: int = 7
) -> tuple:
    """LSH-blocked embedding near-dup pairs over the augmented fixture —
    per-bucket nested loops + set union across the two plane sets, vs the
    engine's bucket self-joins."""
    import numpy as np

    ids, m = _emb_matrix()
    bids = ids[ids < 200]
    bm = m[ids < 200]
    # same augmentation as _augmented_emb: x * 1.01 in double, cast to float
    dm = (m[ids < 100].astype(np.float64) * 1.01).astype(np.float32)
    dids = ids[ids < 100] + 10000
    aids = np.concatenate([bids, dids])
    am = np.concatenate([bm, dm]).astype(np.float64)
    pair_set = set()
    for s in (seed, seed + 1):
        planes = np.random.RandomState(s).standard_normal((n_planes, am.shape[1]))
        w = (1 << np.arange(n_planes)).astype(np.int64)
        bk = (((am @ planes.T) > 0) @ w).astype(np.int64)
        for b in np.unique(bk):
            mem = np.where(bk == b)[0]
            for x in range(len(mem)):
                for y in range(x + 1, len(mem)):
                    i, j = int(aids[mem[x]]), int(aids[mem[y]])
                    if i != j:
                        pair_set.add((min(i, j), max(i, j)))
    # cosines via the engine's exact fold order (see _fold_dot); am rows
    # are exact float64 widenings of the augmented float32 vectors
    norms = np.array([_fold_norm(am[t]) for t in range(len(aids))])
    idx = {int(a): t for t, a in enumerate(aids)}
    rows = []
    for (i, j) in sorted(pair_set):
        cos = _round_half_up6(
            _fold_dot(am[idx[i]], am[idx[j]]) / (norms[idx[i]] * norms[idx[j]])
        )
        if cos >= threshold:
            rows.append((i, j, cos))
    return tuple(rows)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered)
# ---------------------------------------------------------------------------


# ---- D5/D6/D7 emulation fixture + independent interleave twins ----------
#
# The engine groups by worker and scans each group (operators/
# distributed_emulation.py); the twins below instead walk the GLOBAL
# stream once, dispatching to per-worker states — a different program
# shape over the same spec (worker.cpp:848-899,919-968,1211-1223), so a
# grouping/ordering bug on the Spark side cannot cancel out.

_EMU_SEED = "http://emu.test/Catalogue/page-1.html"  # raw mixed case: the
# D7 re-insert keeps it verbatim (worker.cpp:1219), so a lowercase
# canonical revisit of the seed must NOT hit it


def _emu_url_fixture() -> list[tuple[int, str]]:
    """Deterministic 24-row URL stream: each worker (round-robin seq%2)
    walks the same 12-step script, which fires every D5/D7 branch IN that
    worker — slug near-dup (incl. before-exact precedence), ident='index'
    silence, exact dup, a D7 eviction at max_processed=4 with re-seen and
    post-eviction-exact follow-ups, and the raw-seed-case-miss quirk."""
    script = [
        "http://emu.test/catalogue/alpha-{j}_1.html",     # first-seen
        "http://emu.test/catalogue/alpha-{j}_2.html",     # slug near-dup
        "http://emu.test/CATALOGUE/alpha-{j}_1.html/",    # slug, NOT exact:
        #   the slug scan precedes the set probe (worker.cpp:948-958)
        "http://emu.test/catalogue/cat-{j}_7/index.html", # ident 'index',
        #   no underscore -> heuristic silent -> first-seen
        "http://emu.test/catalogue/cat-{j}_7/index.html", # exact
        "http://emu.test/page-{j}a",                      # set size 3
        "http://emu.test/page-{j}b/",                     # size 4
        "http://emu.test/page-{j}c",                      # size 5 > 4 ->
        #   D7 clear, keep RAW seed
        "http://emu.test/catalogue/alpha-{j}_1.html",     # first-seen AGAIN
        "http://emu.test/catalogue/page-1.html",          # first-seen: the
        #   retained seed is raw mixed-case, canonical is lowercase -> miss
        "http://emu.test/page-{j}b",                      # first-seen again
        "http://emu.test/page-{j}b/",                     # exact post-evict
    ]
    urls: list[tuple[int, str]] = []
    for i, s in enumerate(script):
        for j in (0, 1):
            urls.append((2 * i + j, s.format(j=j)))
    return sorted(urls)


def _emu_book_fixture() -> list[tuple[int, str, str, int]]:
    """Deterministic 24-row book stream (12 distinct x2): exact-triple
    repeats, shorter-in-longer containment both ways (incl. case-folded),
    an empty-title bypass, and enough keepers to roll the ring at
    ring_size=3. price stays the raw scraped string per Item.h."""
    base = [
        ("The Silent Sea", "10.00", 3),
        ("Silent Sea", "8.00", 2),       # contained in the previous title
        ("A Voyage Home", "12.00", 4),
        ("The Silent Sea", "10.00", 3),  # exact triple repeat
        ("", "1.00", 1),                 # empty title bypasses the block
        ("Red Harvest", "7.00", 5),
        ("harvest", "2.00", 1),          # lowercase containment
        ("Long Road North", "9.00", 2),
        ("Winter Light", "6.00", 4),
        ("The Glass Door", "5.00", 2),
        ("A VOYAGE HOME", "12.00", 4),   # case-insensitive containment
        ("The Silent Sea", "10.00", 3),  # ring has rolled -> kept again
    ]
    return [(i, t, p, r) for i, (t, p, r) in enumerate(base * 2)]


@functools.lru_cache(maxsize=None)
def _emu_url_golden(
    n_workers: int = 2, max_processed: int = 4
) -> tuple[tuple, ...]:
    """Independent D5+D7 twin: one pass over the global stream, per-worker
    set dict, split()-based slug extraction (vs the kernel's find
    arithmetic)."""
    states: dict[int, set] = {w: set() for w in range(n_workers)}
    out = []
    for seq, url in _emu_url_fixture():
        w = seq % n_workers
        s = states[w]
        c = url.lower()
        if c.endswith("/"):
            c = c[:-1]
        name = None
        if "/catalogue/" in c and ".html" in c:
            h, ls = c.find(".html"), c.rfind("/")
            ident = c[ls + 1 : h] if h >= ls + 1 else c[ls + 1 :]
            if "_" in ident:
                name = ident.split("_", 1)[0]
        if name is not None and any(name in p for p in s):
            kind = "slug"
        elif c in s:
            kind = "exact"
        else:
            s.add(c)
            kind = None
        out.append((w, seq, url, c, kind))
        if len(s) > max_processed:
            s.clear()
            s.add(_EMU_SEED)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _emu_ring_golden(
    n_workers: int = 2, ring_size: int = 3
) -> tuple[tuple, ...]:
    """Independent D6 twin: global pass with per-worker deque(maxlen=ring)
    — the bounded-append container expresses the append-then-pop-front of
    worker.cpp:890-894 structurally instead of imperatively."""
    from collections import deque

    rings: dict[int, object] = {
        w: deque(maxlen=ring_size) for w in range(n_workers)
    }
    out = []
    for seq, title, price, rating in _emu_book_fixture():
        w = seq % n_workers
        ring = rings[w]
        kind = None
        if title:
            for rt, rp, rr in ring:
                if (rt, rp, rr) == (title, price, rating):
                    kind = "exact"
                    break
                lo, hi = sorted((rt.lower(), title.lower()), key=len)
                if rt and lo in hi:
                    kind = "contain"
                    break
            if kind is None:
                ring.append((title, price, rating))
        out.append((w, seq, title, price, rating, kind))
    return tuple(out)


# ---- robots.txt fixture + stdlib-robotparser golden ----------------------


def _robots_fixture() -> list[tuple[str, str]]:
    """Three hosts inside the documented shared subset (Disallow-only
    groups, unique agent tokens per host): a specific group that beats *,
    a *-only host, and an allow-everything host."""
    return [
        (
            "a.example",
            "User-agent: spark-crawler\nDisallow: /private\n"
            "Disallow: /tmp\n\nUser-agent: *\nDisallow: /\n",
        ),
        (
            "b.example",
            "# comment\nUser-agent: *\nDisallow: /admin\n"
            "Sitemap: http://b.example/s.xml\nDisallow: /search\n",
        ),
        ("c.example", "User-agent: *\nDisallow:\n"),
    ]


def _robots_allow_fixture() -> list[tuple[str, str]]:
    """Full-RFC bodies (one group per host, so any spec-compliant parser
    derives the same rule list): Allow carve-outs, `*` wildcards, a `$`
    end anchor, and a host whose rules never apply to the probe agent."""
    return [
        (
            "a.example",
            "User-agent: spark-crawler\nDisallow: /private/\n"
            "Allow: /private/pub*\nDisallow: /*.gif$\n",
        ),
        (
            "b.example",
            "User-agent: *\nAllow: /public/\nDisallow: /\n",
        ),
        (
            "c.example",
            "User-agent: otherbot\nDisallow: /\n",
        ),
    ]


def _robots_allow_probes() -> list[tuple[str, str]]:
    return [
        ("a.example", "/private/secret.html"),
        ("a.example", "/private/pub/page.html"),
        ("a.example", "/img/banner.gif"),
        ("a.example", "/img/banner.gift"),
        ("a.example", "/open/page.html"),
        ("b.example", "/public/a"),
        ("b.example", "/publicish"),
        ("b.example", "/x/y"),
        ("c.example", "/anything"),
        ("d.example", "/no/rules/host"),
    ]


def _robots_allow_golden(
    agent: str = "spark-crawler",
) -> list[tuple[str, str, bool]]:
    """Independent twin for robots_allow_verdicts: a from-scratch line
    parser (no shared state machine — single-group fixtures make the
    grammar unambiguous) plus an NFA position-set wildcard matcher (no
    regex, unlike the engine's pattern_regex translation). RFC 9309
    precedence reimplemented directly: longest matching pattern wins,
    Allow wins length ties, no match ⇒ allowed."""

    def parse(text: str) -> list[tuple[str, bool]]:
        groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
        agents: list[str] = []
        rules: list[tuple[str, bool]] = []
        in_rules = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if ":" not in line:
                continue
            key, val = (s.strip() for s in line.split(":", 1))
            key = key.lower()
            if key == "user-agent":
                if in_rules:
                    groups.append((agents, rules))
                    agents, rules, in_rules = [], [], False
                agents.append(val.lower())
            elif key in ("allow", "disallow"):
                in_rules = True
                if val:
                    rules.append((val, key == "allow"))
        if agents or rules:
            groups.append((agents, rules))
        named = [r for a, rs in groups if agent.lower() in a for r in rs]
        if any(agent.lower() in a for a, _ in groups):
            return named
        return [r for a, rs in groups if "*" in a for r in rs]

    def nfa_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern

        def eps(states: set) -> set:
            out: set = set()
            stack = list(states)
            while stack:
                i = stack.pop()
                if i in out:
                    continue
                out.add(i)
                if i < len(core) and core[i] == "*":
                    stack.append(i + 1)
            return out

        states = eps({0})
        if not anchored and len(core) in states:
            return True
        for ch in path:
            nxt = set()
            for i in states:
                if i < len(core):
                    if core[i] == "*":
                        nxt.add(i)
                    elif core[i] == ch:
                        nxt.add(i + 1)
            states = eps(nxt)
            if not states:
                return False
            if not anchored and len(core) in states:
                return True
        return len(core) in states

    rules_by_host = {h: parse(t) for h, t in _robots_allow_fixture()}
    rows: list[tuple[str, str, bool]] = []
    for host, path in _robots_allow_probes():
        best: tuple[int, bool] | None = None
        for pattern, allow in rules_by_host.get(host, []):
            if nfa_match(pattern, path):
                key = (len(pattern), allow)
                if best is None or key > best:
                    best = key
        rows.append((host, path, True if best is None else best[1]))
    return sorted(rows)


def _robots_delay_fixture() -> list[tuple[str, str]]:
    """Crawl-delay bodies inside the shared stdlib subset (integer delays,
    one group per agent token): specific-beats-default, *-only, absent,
    and a non-numeric value both parsers must ignore."""
    return [
        (
            "a.example",
            "User-agent: spark-crawler\nCrawl-delay: 3\nDisallow: /x\n\n"
            "User-agent: *\nCrawl-delay: 10\n",
        ),
        ("b.example", "User-agent: *\nCrawl-delay: 7\nDisallow: /admin\n"),
        ("c.example", "User-agent: *\nDisallow: /q\n"),
        ("d.example", "User-agent: *\nCrawl-delay: soon\n"),
    ]


def _robots_delay_golden(
    agent: str = "spark-crawler",
) -> list[tuple[str, float | None, int | None]]:
    """Independent twin for robots_crawl_delay: stdlib urllib.robotparser
    parses each body and reports crawl_delay(agent); the rounds mapping is
    recomputed here with math.ceil (round_seconds=2.0, matching the Spark
    side's F.ceil(crawl_delay / 2.0))."""
    import math
    import urllib.robotparser

    rows: list[tuple[str, float | None, int | None]] = []
    for host, text in _robots_delay_fixture():
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(text.splitlines())
        d = rp.crawl_delay(agent)
        rows.append(
            (
                host,
                None if d is None else float(d),
                None if d is None else math.ceil(float(d) / 2.0),
            )
        )
    return sorted(rows)


def _robots_golden(agent: str = "spark-crawler") -> list[tuple[str, str]]:
    """Independent twin: let stdlib urllib.robotparser parse each body,
    then read the Disallow prefixes out of ITS entry objects — a separately
    maintained implementation of the same 1994-REP state machine."""
    import urllib.robotparser

    rows: list[tuple[str, str]] = []
    for host, text in _robots_fixture():
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(text.splitlines())
        entry = next(
            (e for e in rp.entries if agent.lower() in e.useragents),
            rp.default_entry,
        )
        if entry is None:
            continue
        for rl in entry.rulelines:
            # RuleLine normalizes empty-Disallow to an allow-all rule;
            # only real disallow prefixes enter the engine's table
            if not rl.allowance and rl.path:
                rows.append((host, rl.path))
    return rows


def oracle_sql() -> dict[str, str]:
    canon = X.canonicalize_url_sql("url")
    url_cte = f"WITH u AS (SELECT p_partkey, {URL_EXPR} AS url FROM part)"
    o: dict[str, str] = {}

    o["url_canonicalize"] = (
        f"{url_cte} SELECT p_partkey, url, {canon} AS canonical FROM u"
    )
    o["url_canonicalize_expr"] = o["url_canonicalize"]

    o["url_predicates"] = f"""{url_cte}
SELECT p_partkey,
       (instr(url, '/catalogue/') > 0 AND instr(url, '.html') = 0
        AND NOT url LIKE '%/') AS is_book,
       (instr(url, '/category/') > 0 OR instr(url, 'index.html') > 0
        OR instr(url, 'page-') > 0) AS is_category,
       (instr(url, '/accounts/') > 0 OR instr(url, '/login') > 0
        OR instr(url, '/logout') > 0 OR instr(url, '/admin') > 0
        OR instr(url, '/static/') > 0 OR instr(url, '.jpg') > 0
        OR instr(url, '.png') > 0 OR instr(url, '.css') > 0
        OR instr(url, '.js') > 0
        OR instr(url, 'books.toscrape.com') = 0) AS ignored
FROM u"""

    o["url_repair"] = f"""
WITH u AS (SELECT p_partkey, {MALFORMED_URL_EXPR} AS url FROM part),
s AS (SELECT p_partkey, url,
        CASE WHEN instr(url, 'http://books.toscrape.comhttp') > 0
             THEN substr(url, instr(url, 'http://books.toscrape.comhttp') + 24)
             ELSE url END AS stripped
      FROM u)
SELECT p_partkey, url,
       (url <> '' AND instr(url, 'http://http://') = 0
        AND instr(url, 'http://https://') = 0
        AND instr(url, 'https://http://') = 0
        AND instr(url, 'https://https://') = 0
        AND instr(url, 'http://books.toscrape.comhttp') = 0) AS is_valid,
       CASE WHEN stripped LIKE 'mhttp%' THEN substr(stripped, 2)
            ELSE stripped END AS repaired
FROM s"""

    o["url_classify"] = f"""
WITH h AS (SELECT c_custkey, {HOST_EXPR} AS host FROM customer)
SELECT c_custkey, host,
       CASE WHEN instr(host, 'toscrape.com') > 0 THEN 'BOOK'
            WHEN instr(host, 'indeed') > 0 OR instr(host, 'linkedin') > 0
                 OR instr(host, 'monster') > 0 THEN 'JOB'
            WHEN instr(host, 'amazon') > 0 OR instr(host, 'ebay') > 0
                 OR instr(host, 'walmart') > 0 THEN 'PRODUCT'
            WHEN instr(host, 'medium') > 0 OR instr(host, 'news.') > 0
                 OR instr(host, 'blog.') > 0 THEN 'ARTICLE'
            ELSE 'GENERIC' END AS item_type
FROM h"""

    o["price_rating_coercion"] = f"""
WITH p AS (SELECT p_partkey, {PRICE_STR_EXPR} AS price_str,
                  {RATING_WORD_EXPR} AS rating_word FROM part)
SELECT p_partkey, price_str, rating_word,
       CASE WHEN regexp_extract(price_str, '([0-9][0-9.,]*)', 1) = '' THEN 0.0
            ELSE CAST(replace(regexp_extract(price_str, '([0-9][0-9.,]*)', 1),
                              ',', '.') AS DOUBLE) END AS price_value,
       CASE rating_word WHEN 'One' THEN 1 WHEN 'Two' THEN 2 WHEN 'Three' THEN 3
            WHEN 'Four' THEN 4 WHEN 'Five' THEN 5 ELSE 0 END AS rating_value,
       CASE WHEN instr(rating_word, 'One') > 0 THEN 'One'
            WHEN instr(rating_word, 'Two') > 0 THEN 'Two'
            WHEN instr(rating_word, 'Three') > 0 THEN 'Three'
            WHEN instr(rating_word, 'Four') > 0 THEN 'Four'
            WHEN instr(rating_word, 'Five') > 0 THEN 'Five'
            ELSE 'Unknown' END AS rating_parsed
FROM p"""

    # ---- parse kernels: expected values derived from the generative ground
    # truth (the same part columns the HTML was synthesized from) ----

    o["parse_extract_between"] = f"""
SELECT p_partkey, {BETWEEN_TEXT_EXPR} AS text,
       CASE CAST(p_partkey % 4 AS INT)
            WHEN 0 THEN concat('Name', {PK})
            WHEN 1 THEN ''
            WHEN 2 THEN ''
            ELSE 'A' END AS between
FROM part"""

    o["parse_books"] = f"""
SELECT p_partkey, 0 AS book_rank,
       CASE WHEN p_partkey % 4 = 1 THEN concat('FB', {PK})
            ELSE concat('T', {PK}, ' ', p_name) END AS title,
       {PRICE0_EXPR} AS price,
       CASE WHEN p_partkey % 6 = 5 THEN 'Unknown' ELSE {RATING0_WORD} END AS rating,
       concat('http://books.toscrape.com/catalogue/a', {PK}, '.html') AS url
FROM part
UNION ALL
SELECT p_partkey, 1 AS book_rank,
       concat('U', {PK}) AS title,
       {PRICE1_EXPR} AS price,
       'Two' AS rating,
       concat('http://books.toscrape.com/catalogue/b', {PK}) AS url
FROM part WHERE p_partkey % 3 <> 0"""

    o["parse_book_page"] = f"""
SELECT p_partkey,
       CASE WHEN p_partkey % 7 = 0 THEN ''
            ELSE concat('H', {PK}, ' ', p_name) END AS title,
       CASE WHEN p_partkey % 11 = 0 THEN '' ELSE {PRICE0_EXPR} END AS price,
       CASE CAST(p_partkey % 5 AS INT)
            WHEN 0 THEN 'Three'
            WHEN 1 THEN 'Unknown'
            WHEN 2 THEN ''
            WHEN 3 THEN 'Five'
            ELSE '' END AS rating
FROM part"""

    o["parse_find_next_link"] = f"""
SELECT p_partkey,
       CASE WHEN p_partkey % 3 = 0 THEN concat('page-', {PK}, '.html')
            ELSE '' END AS next_href
FROM part"""

    o["url_normalize"] = f"""
SELECT p_partkey, {NORM_LINK_EXPR} AS link, {NORM_BASE_EXPR} AS base,
       CASE CAST(p_partkey % 7 AS INT)
            WHEN 0 THEN 'http://x.com/a'
            WHEN 1 THEN 'https://y.com/b'
            WHEN 2 THEN ''
            WHEN 3 THEN 'http://cdn.example/z'
            WHEN 4 THEN concat('http://books.toscrape.com/abs/p', {PK})
            WHEN 5 THEN concat(
                'http://books.toscrape.com/catalogue/rel', {PK}, '.html')
            ELSE 'http://books.toscrape.com/c.html' END AS normalized
FROM part"""

    o["parse_extract_links"] = f"""
SELECT p_partkey, 0 AS pos,
       concat('http://books.toscrape.com/catalogue/a', {PK}, '.html') AS link
FROM part
UNION ALL
SELECT p_partkey, 1 AS pos,
       concat('http://books.toscrape.com/extra', {PK}) AS link
FROM part WHERE p_partkey % 2 = 0"""

    # ---- D3/D4 content dedup ----

    o["dedup_content_book"] = DD.content_dedup_sql(
        ITEMS_CONTENT_SQL, ["title", "price_value", "rating_value"], "id",
        ["id", "title", "price_value", "rating_value"],
    )
    o["dedup_content_item"] = DD.content_dedup_sql(
        ITEMS_CONTENT_SQL,
        ["item_type", "title", "price_value", "rating_value"], "id",
        ["id", "item_type", "title", "price_value", "rating_value"],
    )

    o["item_stats"] = AGG.item_stats_sql(
        f"({ITEMS_LIKE_SQL})", "item_type", "price_value", "rating_value",
        "category",
    )

    o["crawl_rate"] = AGG.crawl_rate_sql("events", "user_id", "ts")
    o["worker_totals"] = AGG.worker_totals_sql(
        "events", "user_id", "ts", active_window_s=86400
    )

    o["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 1) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    o["q3_top_orders"] = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

    o["broadcast_dim_join"] = """
SELECT r_name AS region_name, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

    o["dedup_first_wins"] = """
SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
       o_orderdate AS first_orderdate
FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
) WHERE rn = 1
"""

    o["seen_anti_join"] = """
SELECT c_custkey AS custkey, c_name AS name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

    o["cuckoo_seen_filter"] = """
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'http://docs.example.com/' || source || '/'
               || CAST(doc_id AS VARCHAR) AS url
    FROM documents
)
SELECT doc_id, url FROM d
WHERE url NOT IN (SELECT url FROM d WHERE doc_id % 3 = 0)
"""

    o["priority_dequeue"] = """
WITH fr AS (
    SELECT source AS host,
           CAST(doc_id AS BIGINT) AS seq,
           CAST(n_chars % 7 AS INT) AS priority
    FROM documents
), ranked AS (
    SELECT host, seq, priority,
           ROW_NUMBER() OVER (
               PARTITION BY host ORDER BY priority, seq
           ) AS rank
    FROM fr
)
SELECT host, seq, priority, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""

    o["union_dedup"] = """
SELECT count(*) AS n_distinct_nations FROM (
    SELECT DISTINCT nationkey FROM (
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    )
)
"""

    o["topk_sample"] = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders ORDER BY o_orderkey LIMIT 5
"""

    o["window_last_n"] = """
SELECT event_id, user_id,
       round(coalesce(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0.0), 6) AS trailing_avg
FROM events
"""

    o["dedup_exact"] = """
SELECT md5(text) AS text_md5, count(*) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY md5(text)
"""

    o["dedup_minhash_lsh"] = DD.LSH_PAIRS_SQL
    o["dedup_minhash_signatures"] = DD.MINHASH_SQL
    o["dedup_ngram_jaccard"] = DD.ngram_jaccard_sql(0.1)
    o["near_dup_pipeline"] = DD.near_dup_pipeline_sql(0.1)

    o["ann_cosine_topk"] = SIM.brute_force_topk_sql(n_queries=5, k=10)
    # same augmentation as the Spark side (DuckDB spells transform as
    # list_transform; float math is identical IEEE either way)
    aug = """
SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
UNION ALL
SELECT vec_id + 10000 AS vec_id,
       list_transform(embedding,
                      x -> CAST(x * CAST(1.01 AS DOUBLE) AS FLOAT)) AS embedding
FROM embeddings WHERE vec_id < 100
"""
    o["embedding_near_dup_exact"] = SIM.exact_near_dup_pairs_sql(0.9).replace(
        "FROM embeddings a JOIN embeddings b",
        f"FROM ({aug}) a JOIN ({aug}) b",
    )

    o["embedding_norms"] = """
SELECT label, count(*) AS n_vectors,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_norm
FROM embeddings GROUP BY label
"""

    o["text_token_counts"] = TS.TOKEN_COUNTS_SQL
    o["text_quality"] = TS.QUALITY_SQL
    o["text_langid"] = TS.LANGID_SQL

    o["multimodal_features"] = MM.MEDIA_SUMMARY_SQL

    # ---- golden-constant oracles over the seeded corpora (see helpers
    # above): the crawl/sequential/synthetic-media entries are deterministic,
    # so their expected outputs are literal SELECTs computed by the pure-
    # Python oracles (never by re-running Spark) ----

    res30 = _crawl_golden(30, 3, 10)
    o["crawl_summary"] = _literal_select(
        [(
            res30.pages_crawled,
            len(res30.processed) - 1,       # seed is enqueued, not discovered
            res30.duplicate_links,
            res30.ignored_links,
            len(res30.books),
            res30.rounds - 1,
        )],
        [
            ("pages_crawled", "BIGINT"),
            ("unique_urls_queued", "BIGINT"),
            ("duplicate_urls_skipped", "BIGINT"),
            ("ignored_urls", "BIGINT"),
            ("unique_books", "BIGINT"),
            ("last_round", "INTEGER"),
        ],
    )

    res12 = _crawl_golden(12, 2, 6)
    o["status_snapshot"] = _literal_select(
        [(
            0, len(res12.processed), len(res12.books),
            res12.pages_crawled, res12.rounds, False,
        )],
        [
            ("queue_size", "BIGINT"),
            ("processed", "BIGINT"),
            ("books_found", "BIGINT"),
            ("pages_crawled", "BIGINT"),
            ("current_round", "INTEGER"),
            ("stopped", "BOOLEAN"),
        ],
    )

    per_round: dict[int, int] = {}
    for d in res12.dequeues:
        per_round.setdefault(d.round, 0)
        if d.fetched:
            per_round[d.round] += 1
    wt_rows, cum = [], 0
    for r in sorted(per_round):
        cum += per_round[r]
        wt_rows.append((r, per_round[r], cum))
    o["crawl_worker_totals"] = _literal_select(
        wt_rows,
        [
            ("round", "INTEGER"),
            ("urls_fetched", "BIGINT"),
            ("cum_fetched", "BIGINT"),
        ],
    )

    o["crawl_sequential"] = _literal_select(
        list(_sequential_golden(30, 3, 10)),
        [
            ("chain_idx", "INTEGER"),
            ("book_rank", "INTEGER"),
            ("title", "VARCHAR"),
            ("price", "VARCHAR"),
            ("rating", "VARCHAR"),
            ("url", "VARCHAR"),
            ("canonical_url", "VARCHAR"),
        ],
    )

    o["multimodal_synthetic"] = _literal_select(
        MM.synthetic_media_summary_rows(n=64),
        [
            ("kind", "VARCHAR"),
            ("n_media", "BIGINT"),
            ("total_bytes", "BIGINT"),
            ("avg_frames", "DOUBLE"),
            ("distinct_payloads", "BIGINT"),
        ],
    )

    # ---- independent-reimplementation golden oracles for the non-SQL
    # kernels (see helpers above): computed over the same fixed sf0.01
    # testdata the driver's gate reads, emitted as literal SELECTs ----

    o["doc_fingerprints"] = _literal_select(
        list(_fingerprint_golden()),
        [("doc_id", "BIGINT"), ("n_hashes", "INTEGER")],
    )
    o["dedup_simhash"] = _literal_select(
        list(_simhash_golden(max_hamming=3)),
        [("doc_a", "BIGINT"), ("doc_b", "BIGINT"), ("hamming", "INTEGER")],
    )
    o["ann_lsh_topk"] = _literal_select(
        list(_ann_lsh_golden()),
        [
            ("query_id", "BIGINT"),
            ("vec_id", "BIGINT"),
            ("cosine", "DOUBLE"),
            ("rank", "INTEGER"),
        ],
    )
    o["embedding_near_dup_lsh"] = _literal_select(
        list(_embedding_near_dup_lsh_golden()),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("cosine", "DOUBLE")],
    )
    o["ann_ivf_topk"] = _literal_select(
        list(_ann_ivf_golden()),
        [
            ("query_id", "BIGINT"),
            ("vec_id", "BIGINT"),
            ("cosine", "DOUBLE"),
            ("rank", "INTEGER"),
        ],
    )

    o["dedup_emulated_url"] = _literal_select(
        list(_emu_url_golden()),
        [
            ("worker", "INTEGER"),
            ("seq", "BIGINT"),
            ("url", "VARCHAR"),
            ("canonical", "VARCHAR"),
            ("dup_kind", "VARCHAR"),
        ],
    )
    o["dedup_emulated_ring"] = _literal_select(
        list(_emu_ring_golden()),
        [
            ("worker", "INTEGER"),
            ("seq", "BIGINT"),
            ("title", "VARCHAR"),
            ("price", "VARCHAR"),
            ("rating", "INTEGER"),
            ("dup_kind", "VARCHAR"),
        ],
    )

    o["robots_rules"] = _literal_select(
        _robots_golden(),
        [("host", "VARCHAR"), ("prefix", "VARCHAR")],
    )

    o["robots_crawl_delay"] = _literal_select(
        _robots_delay_golden(),
        [
            ("host", "VARCHAR"),
            ("crawl_delay", "DOUBLE"),
            ("delay_rounds", "INTEGER"),
        ],
    )

    o["robots_allow_verdicts"] = _literal_select(
        _robots_allow_golden(),
        [("host", "VARCHAR"), ("path", "VARCHAR"), ("allowed", "BOOLEAN")],
    )

    # every queries() entry now has an oracle_sql() twin: SQL-expressible
    # operators get independent DuckDB SQL; deterministic crawl state gets
    # golden constants from the Python crawl oracle; the pandas-UDF kernels
    # get golden constants from independent pure-Python reimplementations.
    return o
