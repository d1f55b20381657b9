"""The reference's *sequential* crawl strategy as a Spark plan.

``crawl_website`` (/root/reference/src/Crawler.cpp:37-135) is the
single-chain strategy: fetch the start page, parse its books
(parse_books, F3), dedup each book by canonical url first-wins
(Crawler.cpp:84-95), follow the ``<li class="next">`` link (find_next_link,
F5), repeat until no next link / fetch failure / ``max_pages``.

Spark-first shape — the chain is a linked list, so the *walk* is inherently
serial, but everything per-page is not:

1. ONE distributed pass over listing-shaped pages precomputes
   ``(url, next_href)`` edges — tiny metadata (two strings per page),
   collected to the driver.
2. The driver chases pointers over that map (pure in-memory walk, no Spark
   jobs in the loop).
3. ONE distributed job fetches + parses the chain's pages with the chain
   index attached, explodes books, and applies the first-wins canonical-url
   dedup ordered by ``(chain_idx, book_rank)`` — identical to the
   reference's sequential insert order.

Divergence note (deliberate): the reference passes the raw ``next`` href as
the HTTP request path (HttpClient.cpp:152 builds ``GET <href> HTTP/1.1``
with no resolution), so a path-relative href like ``page-2.html`` yields a
request only lenient servers resolve. We resolve hrefs with the
reference's own normalize_url (F6, HtmlParser.cpp:102-146) against the
current page's url — the crawl a compliant client would perform. A next
url absent from the page store ends the chain (empty-response break,
Crawler.cpp:66-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import expressions as X
from ..functions import kernels as K
from ..functions import udfs as U

BOOKS_OUT_SCHEMA = (
    "chain_idx int, book_rank int, title string, price string, "
    "rating string, url string, canonical_url string"
)


def next_edges(pages: DataFrame) -> DataFrame:
    """Distributed precompute of the next-link graph over ALL pages (the
    reference's ``crawl_website`` calls find_next_link on every fetched
    page, Crawler.cpp:99-103 — not only listing-shaped ones): returns
    (url, next_url) for pages that HAVE a next link. next_url is
    F6-resolved. Pages without a ``<li class="next">`` emit no edge, which
    both ends the driver walk (chain break) and bounds the collect to the
    chain-bearing subset — on book-site shapes that is the listing pages,
    a tiny fraction of the store."""
    edges = pages.select(
        "url",
        U.normalize_udf(
            U.find_next_link_udf(F.col("html")), F.col("url")
        ).alias("next_url"),
    )
    return edges.filter(F.col("next_url") != "")


def chain_indices_distributed(
    spark: SparkSession, edges: DataFrame, start_url: str
) -> DataFrame:
    """(url, chain_idx) for the next-pointer chain from ``start_url``,
    computed by binary lifting over the edge table: each iteration composes
    the pointer with itself (p'(u) = p(p(u)), w'(u) = w(u) + w(p(u))), so
    after O(log L) self-joins every node knows its terminal and its
    distance to it — no driver-held chain, collect-free. The chain is then
    ``{u : terminal(u) = terminal(start), dist(u) ≤ dist(start)}`` with
    ``chain_idx = dist(start) - dist(u)``.

    Requires an acyclic pointer graph whose chains do not merge upstream of
    the start's chain (true for pagination next-links); both conditions are
    verified and a ``ValueError`` is raised otherwise so the caller can
    fall back to the driver walk."""
    p = edges.select(
        "url", F.col("next_url").alias("p"), F.lit(1).cast("long").alias("w")
    ).localCheckpoint(eager=True)
    n_edges = p.count()
    if n_edges == 0:
        return spark.createDataFrame([(start_url, 0)], "url string, chain_idx int")
    # an acyclic chain of E edges converges once 2^k ≥ E; one extra
    # iteration of headroom — anything still growing past that is a cycle
    max_iters = max(1, n_edges - 1).bit_length() + 1
    converged = False
    mx_old = None
    for _ in range(max_iters):
        b = p.selectExpr("url AS p", "p AS p2", "w AS w2")
        p = (
            p.join(b, "p", "left")
            .select(
                "url",
                F.coalesce("p2", F.col("p")).alias("p"),
                (F.col("w") + F.coalesce("w2", F.lit(0))).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        mx_new = p.agg(F.max("w")).first()[0]
        if mx_new == mx_old:
            converged = True
            break
        mx_old = mx_new
    if not converged and p.agg(F.max("w")).first()[0] > n_edges:
        raise ValueError("next-pointer graph has a cycle (no convergence)")

    srow = p.filter(F.col("url") == start_url).first()
    if srow is None:
        # start has no next link: the chain is the start page alone
        return spark.createDataFrame([(start_url, 0)], "url string, chain_idx int")
    end, wstart = srow["p"], srow["w"]
    chain = (
        p.filter((F.col("p") == end) & (F.col("w") <= wstart))
        .select("url", (F.lit(wstart) - F.col("w")).cast("int").alias("chain_idx"))
        .unionByName(
            spark.createDataFrame(
                [(end, int(wstart))], "url string, chain_idx int"
            )
        )
    ).localCheckpoint(eager=True)
    n = chain.count()
    n_idx = chain.select("chain_idx").distinct().count()
    if n != wstart + 1 or n_idx != n:
        raise ValueError(
            "pointer chains merge upstream of the start's chain — "
            "chain membership is ambiguous; use the driver walk"
        )
    return chain


# above this many next-bearing edges the driver walk's collect is replaced
# by the binary-lifting plan (log L self-joins, nothing driver-held)
DISTRIBUTED_EDGE_THRESHOLD = 100_000


def sequential_crawl(
    spark: SparkSession,
    pages: DataFrame,
    hostname: str = "books.toscrape.com",
    start_path: str = "/catalogue/page-1.html",
    max_pages: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    """Run the sequential strategy; returns the deduped book DataFrame in
    discovery order (chain_idx, book_rank) — the exact order
    ``crawl_website`` appends to ``all_books``.

    ``strategy``: 'driver' walks the collected edge map on the driver (the
    round-1 shape; exact, bounded by the next-bearing page count);
    'distributed' uses :func:`chain_indices_distributed` (collect-free);
    'auto' switches on :data:`DISTRIBUTED_EDGE_THRESHOLD`."""
    base_url = "http://" + hostname
    start_url = base_url + start_path

    edge_df = next_edges(pages.select("url", "html")).localCheckpoint(
        eager=True
    )
    auto = strategy == "auto"
    if auto:
        strategy = (
            "distributed"
            if edge_df.count() >= DISTRIBUTED_EDGE_THRESHOLD
            else "driver"
        )

    if strategy == "distributed":
        # binary lifting rejects pointer graphs with cycles or merging
        # chains ANYWHERE in the edge table (even unreachable from start).
        # Under 'auto' that is a plan choice, not an answer — fall back to
        # the exact driver walk; an explicit strategy='distributed' request
        # propagates the error so callers see why their plan was invalid.
        try:
            chain_df = chain_indices_distributed(spark, edge_df, start_url)
        except ValueError:
            if not auto:
                raise
            strategy = "driver"
        else:
            if max_pages > 0:
                chain_df = chain_df.filter(F.col("chain_idx") < max_pages)
    if strategy == "driver":
        edges = {r["url"]: r["next_url"] for r in edge_df.collect()}
        chain: list[str] = []
        cur = start_url
        seen_urls = set()
        while cur and (max_pages <= 0 or len(chain) < max_pages):
            if cur in seen_urls:  # defensive: a next-cycle would loop forever
                break
            if cur not in edges:
                # page either absent from the store (fetch failure → break,
                # Crawler.cpp:66-69) or carrying no next link; the reference
                # still parses it and stops at its empty next link.
                chain.append(cur)
                break
            seen_urls.add(cur)
            chain.append(cur)
            cur = edges[cur]

        chain_df = spark.createDataFrame(
            list(enumerate(chain)), "chain_idx int, url string"
        )
    # driver-mode chains are tiny → broadcast; distributed-mode chains can
    # be arbitrarily long → let the planner shuffle on url
    if strategy == "distributed":
        fetched = pages.select("url", "html").join(chain_df, "url", "inner")
    else:
        fetched = pages.select("url", "html").join(
            F.broadcast(chain_df), "url", "inner"
        )

    pods = (
        fetched.select(
            "chain_idx",
            F.posexplode(
                U.parse_books_udf(F.col("html"), F.col("url"))
            ).alias("book_rank", "_bk"),
        )
        .select("chain_idx", "book_rank", "_bk.*")
        # F7 expression twin (codegen; byte-equal to the kernel, fuzz-tested)
        .withColumn("canonical_url", F.expr(X.canonicalize_url_sql("url")))
    )
    w = Window.partitionBy("canonical_url").orderBy("chain_idx", "book_rank")
    return (
        pods.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(
            "chain_idx", "book_rank", "title", "price", "rating", "url",
            "canonical_url",
        )
        .orderBy("chain_idx", "book_rank")
    )


def sequential_oracle(
    pages_map: dict[str, bytes],
    hostname: str = "books.toscrape.com",
    start_path: str = "/catalogue/page-1.html",
    max_pages: int = 0,
) -> list[K.Book]:
    """Single-threaded transliteration of crawl_website
    (Crawler.cpp:37-135) with F6-resolved next hrefs, for the golden test."""
    base_url = "http://" + hostname
    cur = base_url + start_path
    out: list[K.Book] = []
    seen = set()
    pages_crawled = 0
    visited = set()
    while cur and (max_pages <= 0 or pages_crawled < max_pages):
        if cur in visited:
            break
        visited.add(cur)
        html = pages_map.get(cur)
        if html is None:
            break
        for b in K.parse_books(html, cur):
            c = K.canonicalize_url(b.url)
            if c not in seen:
                seen.add(c)
                out.append(b)
        nxt = K.find_next_link(html)
        cur = K.normalize_url(nxt, cur) if nxt else ""
        pages_crawled += 1
    return out
