"""Single-threaded Python oracle of the reference crawl semantics.

A line-faithful emulation of ``crawl_website_queue``
(/root/reference/src/Crawler.cpp:135-317): FIFO frontier of relative paths,
canonical URL-seen set populated at *enqueue* time (first-enqueuer wins,
Crawler.cpp:259-264), book dedup by canonical book URL in discovery order
(Crawler.cpp:218-230), empty-fetch skip that still consumes the URL
(Crawler.cpp:193-198), and ``max_pages`` counting only successful fetches.

Generalized with the server-mode frontier/budget model (SURVEY §2.5 Q2/Q8):
``host_budget`` caps URLs dequeued per host per round, and ``min_delay``
models the reference's pacing (the 50 ms dispatch sleep, server.cpp:869,
and the 3-10 s worker backoff, worker.cpp:432-443) as rounds-between-visits:
a host dequeued in round r is ineligible again until round r+min_delay;
rounds where every queued host is inside its revisit window pass as idle
rounds (the round clock advances, nothing is dequeued). With
``host_budget=None`` and no delay, rounds are exactly the BFS levels of the
FIFO queue and the dequeue order is byte-identical to the C++ loop; the
pytest golden tests assert the Spark engine reproduces this oracle state
for all settings.

"Fetching" is a lookup into a ``pages`` dict (url → html bytes): the literal
string ``base_url + path`` is the key, so malformed paths (absolute https://
links kept verbatim, ``..`` non-resolution) miss exactly like the reference's
404/empty-response path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions import kernels as K


@dataclass
class Dequeue:
    round: int
    order: int          # global dequeue position (the reference's crawl order)
    seq: int            # enqueue sequence number (frontier identity)
    path: str
    fetched: bool


@dataclass
class OracleResult:
    dequeues: list[Dequeue] = field(default_factory=list)
    books: list[K.Book] = field(default_factory=list)
    processed: set[str] = field(default_factory=set)   # canonical seen-set
    rounds: int = 0
    pages_crawled: int = 0
    duplicate_links: int = 0
    ignored_links: int = 0
    duplicate_books: int = 0

    @property
    def crawl_order(self) -> list[str]:
        return [d.path for d in self.dequeues]


def crawl(
    pages: dict[str, bytes],
    hostname: str = "books.toscrape.com",
    start_path: str = "/catalogue/page-1.html",
    max_pages: int = 0,
    host_budget: int | None = None,
    robots_disallow: list[tuple[str, str]] | None = None,
    min_delay: int = 0,
) -> OracleResult:
    base_url = "http://" + hostname
    res = OracleResult()
    # min_delay revisit spacing: host -> round of its last actual dequeue
    host_last: dict[str, int] = {}

    # queue entries: (seq, path). seq is the enqueue position — with no
    # budget, dequeue order == seq order (plain FIFO).
    queue: list[tuple[int, str]] = [(0, start_path)]
    next_seq = 1
    res.processed.add(K.canonicalize_url(base_url + start_path))
    book_urls: set[str] = set()
    crawl_all = max_pages <= 0
    order = 0
    stopped = False

    while queue and not stopped:
        # cap check at loop TOP, like the reference (Crawler.cpp:172) and
        # the engine's run_round preamble — when the cap lands exactly on a
        # slice boundary no further round starts (no trailing idle rounds)
        if not crawl_all and res.pages_crawled >= max_pages:
            break
        rnd = res.rounds
        # --- dequeue under per-host budget + revisit spacing (Q2/Q8) ------
        if host_budget is None and min_delay <= 1:
            take, queue = queue, []
        else:
            take, rest, counts = [], [], {}
            for seq, path in queue:
                h = K.url_host(base_url + path)
                delayed = (
                    min_delay > 1
                    and h in host_last
                    and rnd - host_last[h] < min_delay
                )
                if delayed or (
                    host_budget is not None
                    and counts.get(h, 0) >= host_budget
                ):
                    rest.append((seq, path))
                else:
                    take.append((seq, path))
                    counts[h] = counts.get(h, 0) + 1
            queue = rest
        if not take:
            if min_delay > 1 and queue:
                # every queued host is inside its revisit window: the round
                # clock advances with nothing dequeued (idle round)
                res.rounds += 1
                continue
            break

        discovered: list[tuple[int, str]] = []
        for i, (seq, path) in enumerate(take):
            if not crawl_all and res.pages_crawled >= max_pages:
                # cap reached: the rest of this slice is never popped —
                # return it to the queue ahead of leftovers (it has lower seq)
                queue = take[i:] + queue
                stopped = True
                break

            # stamp on ACTUAL pop (post max_pages truncation) — the engine
            # updates its (host, last_round) table from the popped slice
            if min_delay > 1:
                host_last[K.url_host(base_url + path)] = rnd
            html = pages.get(base_url + path)
            res.dequeues.append(Dequeue(rnd, order, seq, path, html is not None))
            order += 1
            if html is None:
                # failed fetch: skipped but stays consumed (Crawler.cpp:193-198)
                continue

            # --- book extraction gate (Crawler.cpp:210-231) ---
            if K.is_category_page(path) or "index.html" in path or "page-" in path:
                for book in K.parse_books(html, base_url + path):
                    cbu = K.canonicalize_url(book.url)
                    if cbu not in book_urls:
                        res.books.append(book)
                        book_urls.add(cbu)
                    else:
                        res.duplicate_books += 1

            # --- link discovery & enqueue-time dedup (Crawler.cpp:234-271) ---
            for link in K.extract_all_links(html, base_url + path):
                if K.should_ignore_url(link):
                    res.ignored_links += 1
                    continue
                rel = link[len(base_url):] if link.startswith(base_url) else link
                if robots_disallow is not None:
                    lh = K.url_host(link)
                    if any(lh == h and rel.startswith(pre)
                           for h, pre in robots_disallow):
                        res.ignored_links += 1
                        continue
                canon = K.canonicalize_url(link)
                if canon not in res.processed:
                    discovered.append((next_seq, rel))
                    next_seq += 1
                    res.processed.add(canon)
                else:
                    res.duplicate_links += 1

            res.pages_crawled += 1

        queue = queue + discovered
        res.rounds += 1

    return res
