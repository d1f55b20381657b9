"""Opt-in emulation of the reference's distributed-mode dedup heuristics.

SURVEY §2.9 documents three per-worker, order-dependent heuristics the
deterministic spec excludes (their reference output depends on thread and
network timing): D5 product-slug URL near-dup (worker.cpp:919-968), D6
recent-book ring dedup (worker.cpp:848-899 over the last-50 ring declared
at worker.cpp:80-82), and D7 seen-cache eviction (worker.cpp:1211-1223).
This module is the "future flag" §2.9 reserves: a DETERMINISTIC
serialization of those heuristics, so their effect can be studied and
regression-tested even though no racy reference run is reproducible.

Determinism contract (documented divergence from the racy original):

 - worker assignment is ``pmod(seq, n_workers)`` — a deterministic
   round-robin stand-in for the reference's arrival-order URL handout
   (server.cpp GET_URL dispatch), chosen because it is the only
   assignment a re-run can reproduce;
 - within a worker, rows are processed in global ``seq`` order — the
   per-worker serialization of the reference's single consumer thread;
 - all per-worker state (the ``processedUrls`` set, the 50-book ring) is
   worker-local exactly as in the reference, so results for one worker
   never depend on another worker's stream.

Spark-first shape: one ``applyInPandas`` grouped by the worker column —
parallel ACROSS workers, sequential WITHIN a worker, which is precisely
the reference's parallelism model (N independent worker processes, each
single-threaded over its own stream). Per-worker state is O(1)-bounded by
construction: D7 caps the URL set at ``max_processed`` entries (which also
bounds D5's linear substring scan), and the D6 ring holds at most
``ring_size`` books. At 1000 workers the stage is 1000 independent
sequential scans — the same aggregate throughput curve as the reference
fleet, which is the point of an emulation.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference constants (worker.cpp:82, worker.cpp:1213)
MAX_RECENT_BOOKS = 50
MAX_PROCESSED_URLS = 10000


# ---------------------------------------------------------------------------
# D5 + D7: per-worker URL dedup with slug near-dup and cache eviction
# ---------------------------------------------------------------------------


def d5_canonical(url: str) -> str:
    """worker.cpp:920-929: lowercase, strip ONE trailing slash. (Distinct
    from the deterministic path's canonicalize_url F7 — the distributed
    mode never scheme/host-normalizes.)"""
    c = url.lower()
    if c.endswith("/"):
        c = c[:-1]
    return c


def d5_product_name(canonical: str) -> str | None:
    """The slug-before-underscore the near-dup heuristic keys on, or None
    when the heuristic does not fire (worker.cpp:932-948).

    Faithful quirks: the identifier is sliced between the LAST '/' and the
    FIRST '.html' (so ``/catalogue/<slug>_<id>/index.html`` yields
    ``index`` — no underscore, heuristic silent — while the flat
    ``/catalogue/<slug>_<id>.html`` shape fires); when '.html' occurs
    BEFORE the last slash the C++ length underflows size_t and substr
    clamps to end-of-string, reproduced here by slicing to the end."""
    if "/catalogue/" not in canonical or ".html" not in canonical:
        return None
    last_slash = canonical.rfind("/")
    dot_html = canonical.find(".html")
    # find_last_of/find both succeeded (both substrings exist); C++ then
    # slices substr(last_slash+1, dot_html-last_slash-1)
    if dot_html >= last_slash + 1:
        ident = canonical[last_slash + 1 : dot_html]
    else:  # size_t underflow -> count clamps to end of string
        ident = canonical[last_slash + 1 :]
    underscore = ident.find("_")
    if underscore == -1:
        return None
    return ident[:underscore]


def _run_d5_d7(
    seqs: Iterable[int],
    urls: Iterable[str],
    max_processed: int,
    seed_url: str,
) -> list[tuple[int, str, str, str | None]]:
    """One worker's sequential scan (worker.cpp:919-968 + :1211-1223).
    Returns (seq, url, canonical, dup_kind) with dup_kind in
    {None, 'exact', 'slug'}."""
    processed: set[str] = set()
    out: list[tuple[int, str, str, str | None]] = []
    for seq, url in zip(seqs, urls):
        canonical = d5_canonical(url)
        dup_kind: str | None = None
        name = d5_product_name(canonical)
        if name is not None and any(name in p for p in processed):
            # slug hit returns true WITHOUT inserting (worker.cpp:954-958)
            dup_kind = "slug"
        elif canonical in processed:
            dup_kind = "exact"
        else:
            processed.add(canonical)
        out.append((seq, url, canonical, dup_kind))
        # D7: after each URL cycle, clear the cache past the cap and keep
        # only the seed — the RAW startUrl, not its canonical form
        # (worker.cpp:1211-1223 inserts startUrl verbatim, a faithful
        # quirk: a lowercase re-visit of the seed will NOT hit it unless
        # the seed was already lowercase). The cap also bounds the slug
        # scan above to max_processed set entries.
        if len(processed) > max_processed:
            processed.clear()
            if seed_url:
                processed.add(seed_url)
    return out


def emulated_url_dedup(
    urls: DataFrame,
    n_workers: int = 4,
    max_processed: int = MAX_PROCESSED_URLS,
    seed_url: str = "",
) -> DataFrame:
    """D5+D7 emulation over a (seq BIGINT, url STRING) stream.

    Output: (worker INT, seq BIGINT, url STRING, canonical STRING,
    dup_kind STRING) — dup_kind NULL for first-seen URLs, 'exact' for a
    canonical-set hit, 'slug' for the product-name near-dup. One shuffle
    (groupBy worker); each group is a bounded-state sequential scan."""
    schema = (
        "worker INT, seq BIGINT, url STRING, canonical STRING, "
        "dup_kind STRING"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        rows = _run_d5_d7(
            pdf["seq"].tolist(), pdf["url"].tolist(), max_processed, seed_url
        )
        out = pd.DataFrame(
            rows, columns=["seq", "url", "canonical", "dup_kind"]
        )
        out.insert(0, "worker", int(pdf["worker"].iloc[0]))
        return out

    return (
        urls.withColumn(
            "worker", F.pmod(F.col("seq"), F.lit(n_workers)).cast("int")
        )
        .groupBy("worker")
        .applyInPandas(scan, schema)
    )


# ---------------------------------------------------------------------------
# D6: per-worker recent-book ring dedup
# ---------------------------------------------------------------------------


def _run_d6(
    rows: list[tuple[int, str, str, int]],
    ring_size: int,
) -> list[tuple[int, str, str, int, str | None]]:
    """One worker's ring scan (worker.cpp:848-899). Returns
    (seq, title, price, rating, dup_kind) with dup_kind in
    {None, 'exact', 'contain'}; only non-dup books enter the ring."""
    ring: list[tuple[str, str, int]] = []
    out: list[tuple[int, str, str, int, str | None]] = []
    for seq, title, price, rating in rows:
        dup_kind: str | None = None
        if title:  # empty titles bypass the whole block (worker.cpp:848)
            for r_title, r_price, r_rating in ring:
                if r_title == title and r_price == price and r_rating == rating:
                    dup_kind = "exact"
                    break
                if r_title:
                    # shorter-in-longer containment, lowercased; ties make
                    # the RECENT book the "longer" (worker.cpp:865-885)
                    if len(r_title) < len(title):
                        shorter, longer = r_title, title
                    else:
                        shorter, longer = title, r_title
                    if shorter.lower() in longer.lower():
                        dup_kind = "contain"
                        break
            if dup_kind is None:
                ring.append((title, price, rating))
                if len(ring) > ring_size:
                    ring.pop(0)
        out.append((seq, title, price, rating, dup_kind))
    return out


def emulated_recent_book_dedup(
    books: DataFrame,
    n_workers: int = 4,
    ring_size: int = MAX_RECENT_BOOKS,
) -> DataFrame:
    """D6 emulation over a (seq BIGINT, title STRING, price STRING,
    rating INT) stream. price stays a STRING because the reference
    compares the raw scraped text, not the parsed double (Item.h Book
    fields are std::string / int).

    Output adds (worker INT, dup_kind STRING) — NULL keep, 'exact'
    triple-match, 'contain' title containment. A plain
    ``Window.rowsBetween(-50, -1)`` over seq would NOT be faithful: the
    reference ring holds only RETAINED books (dups never enter it), so the
    comparison set depends on prior verdicts — inherently a sequential
    scan, bounded at ring_size comparisons per row exactly like the
    reference."""
    schema = (
        "worker INT, seq BIGINT, title STRING, price STRING, rating INT, "
        "dup_kind STRING"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        rows = _run_d6(
            list(
                zip(
                    pdf["seq"].tolist(),
                    pdf["title"].tolist(),
                    pdf["price"].tolist(),
                    pdf["rating"].tolist(),
                )
            ),
            ring_size,
        )
        out = pd.DataFrame(
            rows, columns=["seq", "title", "price", "rating", "dup_kind"]
        )
        out.insert(0, "worker", int(pdf["worker"].iloc[0]))
        return out

    return (
        books.withColumn(
            "worker", F.pmod(F.col("seq"), F.lit(n_workers)).cast("int")
        )
        .groupBy("worker")
        .applyInPandas(scan, schema)
    )
