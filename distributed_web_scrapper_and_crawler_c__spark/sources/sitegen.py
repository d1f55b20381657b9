"""Deterministic synthetic web: a books.toscrape.com-shaped site graph.

Materializes the engine input table fixed by BASELINE.json's input_hint:

    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

The graph mirrors the structures the reference parser targets
(HtmlParser.cpp:36-37, 88, 201-213): listing pages ``/catalogue/page-N.html``
with ``<article class="product_pod">`` blocks and a ``<li class="next">``
link, category pages ``/catalogue/category/books/<slug>_<id>/index.html``,
and book detail pages ``/catalogue/<slug>_<id>/index.html`` — plus noise
links that exercise every filter/normalize/canonicalize branch: static
resources, /accounts//login, off-domain hosts, mailto:, #fragments, ?query
with and without search/filter, www./HTTPS:// canonicalization collisions,
``comhttp`` malformations, and dangling URLs absent from the table (the
404/empty-fetch path, Crawler.cpp:193-198).

Everything is a pure function of ``(page kind, id, seed)`` — no wall clock,
no global RNG state — so generation parallelizes per partition
(``pages_dataframe`` uses mapInPandas over id ranges) and the same spec at
any scale factor yields the same site prefix.

The ``text`` column is the *reference-parser extraction* for the page
(FIXTURES.md §1), computed with the same byte-exact kernels the oracle uses:
for detail pages ``title\nprice\nrating``; for listing/category pages the
concatenated parse_books records. This is the byte-identity invariant target.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Iterator, NamedTuple

from ..functions import kernels as K

HOST = "books.toscrape.com"
BASE = "http://" + HOST
EPOCH = datetime(2025, 6, 14, 0, 0, 0, tzinfo=timezone.utc)

_ADJ = ("light", "sharp", "quiet", "velvet", "iron", "amber", "hollow",
        "golden", "broken", "silent", "crimson", "pale", "wild", "lost")
_NOUN = ("attic", "garden", "river", "signal", "harbor", "cipher", "meadow",
         "lantern", "compass", "orchard", "archive", "thicket", "sparrow",
         "foundry")
_CATS = ("travel", "mystery", "historical-fiction", "sequential-art",
         "classics", "philosophy", "romance", "womens-fiction", "fiction",
         "childrens", "religion", "nonfiction", "music", "science")
_RATING_WORDS = ("One", "Two", "Three", "Four", "Five")
_LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")


class SiteSpec(NamedTuple):
    """Parameters fully determining the synthetic site."""

    n_books: int = 60
    n_categories: int = 5
    books_per_page: int = 20
    seed: int = 42

    @property
    def n_listing_pages(self) -> int:
        return max(1, -(-self.n_books // self.books_per_page))


def _book_rng(spec: SiteSpec, book_id: int) -> random.Random:
    return random.Random((spec.seed << 20) ^ book_id)


def book_slug(spec: SiteSpec, book_id: int) -> str:
    r = _book_rng(spec, book_id)
    return f"{r.choice(_ADJ)}-{r.choice(_NOUN)}-{book_id}_{1000 + book_id}"


def book_title(spec: SiteSpec, book_id: int) -> str:
    r = _book_rng(spec, book_id)
    t = f"The {r.choice(_ADJ).title()} {r.choice(_NOUN).title()} #{book_id}"
    if book_id % 17 == 0:
        # titles with doubled quotes exercise the CSV escaping path
        t = f'A "{r.choice(_NOUN).title()}" Story #{book_id}'
    return t


def book_price(spec: SiteSpec, book_id: int) -> str:
    r = _book_rng(spec, book_id)
    return f"£{r.randint(10, 59)}.{r.randint(0, 99):02d}"


def book_rating(spec: SiteSpec, book_id: int) -> str:
    return _RATING_WORDS[_book_rng(spec, book_id).randint(0, 4)]


def book_category(spec: SiteSpec, book_id: int) -> int:
    return book_id % spec.n_categories


def book_url(spec: SiteSpec, book_id: int) -> str:
    return f"{BASE}/catalogue/{book_slug(spec, book_id)}/index.html"


def category_url(spec: SiteSpec, cat_id: int) -> str:
    slug = _CATS[cat_id % len(_CATS)]
    return f"{BASE}/catalogue/category/books/{slug}_{2 + cat_id}/index.html"


def listing_url(spec: SiteSpec, n: int) -> str:
    return f"{BASE}/catalogue/page-{n}.html"


def _noise_links(page_key: str) -> str:
    """Noise anchors exercising filter branches; deterministic per page
    (crc32, not hash() — hash() is salted per process)."""
    import zlib

    h = zlib.crc32(page_key.encode()) % 7
    bits = [
        '<link href="/static/main.css" rel="stylesheet"/>',
        '<a href="/static/logo.png">logo</a>',
        '<script src="/static/app.js"></script>',
        '<a href="/accounts/profile">account</a>',
        '<a href="/login">login</a>',
        '<a href="http://example.com/elsewhere">offsite</a>',
        '<a href="mailto:info@books.toscrape.com">mail</a>',
        f'<a href="{BASE}/index.html#promo">promo</a>',
        f'<a href="{BASE}/index.html?utm=1">tracked</a>',
        f'<a href="{BASE}/catalogue/search?q=sea">search</a>',
        f'<a href="HTTPS://WWW.{HOST}/index.html">dup-scheme</a>',
        f'<a href="http://www.{HOST}/catalogue/page-1.html">dup-www</a>',
        f'<a href="http://{HOST}http://{HOST}/x">malformed</a>',
        f'<a href="{BASE}/catalogue/ghost-{h}_404/index.html">dangling</a>',
        '<a href="../oops/deeper.html">dotdot</a>',
    ]
    # rotate deterministically so different pages carry different subsets
    return "".join(bits[h:] + bits[:h])


def _pod(spec: SiteSpec, book_id: int, href: str) -> str:
    title = book_title(spec, book_id).replace('"', "&quot;")
    return (
        '<article class="product_pod">'
        f'<div class="image_container"><a href="{href}">'
        f'<img src="media/cache/{book_id}.jpg" alt=""/></a></div>'
        f'<p class="star-rating {book_rating(spec, book_id)}"><i></i></p>'
        f'<h3><a href="{href}" title="{title}">'
        f"{book_title(spec, book_id)[:18]}...</a></h3>"
        '<div class="product_price">'
        f'<p class="price_color">{book_price(spec, book_id)}</p>'
        "</div></article>"
    )


def render_listing(spec: SiteSpec, n: int) -> bytes:
    lo = (n - 1) * spec.books_per_page
    hi = min(lo + spec.books_per_page, spec.n_books)
    pods = "".join(
        _pod(spec, b, f"{book_slug(spec, b)}/index.html") for b in range(lo, hi)
    )
    nav = "".join(
        f'<a href="{category_url(spec, c)}">cat {c}</a>'
        for c in range(min(spec.n_categories, 3))
    )
    nxt = (
        f'<li class="next"><a href="page-{n + 1}.html">next</a></li>'
        if n < spec.n_listing_pages
        else ""
    )
    prev = f'<li class="previous"><a href="page-{n - 1}.html">previous</a></li>' if n > 1 else ""
    return (
        f"<html><head><title>Page {n}</title></head><body>"
        f"{_noise_links(f'listing-{n}')}{nav}<section>{pods}</section>"
        f"<ul class=\"pager\">{prev}{nxt}</ul></body></html>"
    ).encode("utf-8")


def render_category(spec: SiteSpec, cat_id: int) -> bytes:
    members = [b for b in range(spec.n_books) if book_category(spec, b) == cat_id]
    # root-relative hrefs here (listing pages use path-relative) so both
    # normalize_url branches are exercised on real graph edges
    pods = "".join(
        _pod(spec, b, f"/catalogue/{book_slug(spec, b)}/index.html") for b in members
    )
    return (
        f"<html><head><title>Category {cat_id}</title></head><body>"
        f"{_noise_links(f'cat-{cat_id}')}"
        f'<a href="/catalogue/page-1.html">all books</a>'
        f"<section>{pods}</section></body></html>"
    ).encode("utf-8")


def render_detail(spec: SiteSpec, book_id: int) -> bytes:
    cat = book_category(spec, book_id)
    r = _book_rng(spec, book_id)
    related = [(book_id + 7 * (i + 1)) % spec.n_books for i in range(2)]
    rel_links = "".join(
        f'<a href="/catalogue/{book_slug(spec, b)}/index.html">related</a>'
        for b in related
        if b != book_id
    )
    desc_words = " ".join(r.choice(_NOUN) for _ in range(30))
    return (
        f"<html><head><title>{book_title(spec, book_id)}</title></head><body>"
        f"{_noise_links(f'detail-{book_id}')}"
        f'<a href="{category_url(spec, cat)}">category</a>'
        f"<div class=\"product_main\"><h1>{book_title(spec, book_id)}</h1>"
        f'<p class="price_color">{book_price(spec, book_id)}</p>'
        f'<p class="star-rating {book_rating(spec, book_id)}"><i></i></p></div>'
        f"<p>{desc_words}</p>{rel_links}</body></html>"
    ).encode("utf-8")


def render_root(spec: SiteSpec) -> bytes:
    cats = "".join(
        f'<a href="{category_url(spec, c)}">c{c}</a>' for c in range(spec.n_categories)
    )
    return (
        "<html><head><title>All products</title></head><body>"
        f"{_noise_links('root')}"
        '<a href="/catalogue/page-1.html">catalogue</a>'
        f"{cats}</body></html>"
    ).encode("utf-8")


def extracted_text(url: str, html: bytes) -> str:
    """The reference-parser extraction for a page — the per-row byte-identity
    invariant (FIXTURES.md §1). Uses the same kernels as the oracle."""
    path = url[len(BASE):] if url.startswith(BASE) else url
    if K.is_category_page(path):
        books = K.parse_books(html, BASE + path)
        return "\n".join(f"{b.title}\t{b.price}\t{b.rating}\t{b.url}" for b in books)
    b = K.parse_book_page(html, HOST, url)
    return f"{b.title}\n{b.price}\n{b.rating}"


class Page(NamedTuple):
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


def _page_ts(spec: SiteSpec, kind: str, ident: int):
    """warc_ts is a pure function of page IDENTITY (kind, ident) — never of
    row position — so it is unique and identical no matter how generation is
    sliced. Details live at offset [0, n_books); hub pages in a dedicated
    space immediately above them at n_books + global hub id (root=0,
    listing n=n, category c after the listings) — derived from the spec so
    the uniqueness invariant holds at ANY n_books, not only below a fixed
    constant."""
    if kind == "detail":
        off = ident
    elif kind == "root":
        off = spec.n_books
    elif kind == "listing":
        off = spec.n_books + ident
    else:  # category
        off = spec.n_books + spec.n_listing_pages + 1 + ident
    return EPOCH + timedelta(seconds=off)


def iter_pages(spec: SiteSpec) -> Iterator[Page]:
    """All pages of the site in a stable order (identity drives warc_ts)."""
    for kind, ident, url, html in _iter_raw(spec, 0, spec.n_books):
        lang = _LANGS[(ident + (0 if kind == "detail" else 7)) % len(_LANGS)]
        yield Page(
            url, _page_ts(spec, kind, ident), html, extracted_text(url, html), lang
        )


def _iter_raw(spec: SiteSpec, lo: int, hi: int, slice_idx: int = 0,
              n_slices: int = 1):
    """Pages for the book-id range [lo, hi) plus this slice's share of the
    hub pages. Partition-parallel building block.

    Hub pages (root/listing/category) are striped across slices by id —
    listing and especially category pages are the LARGEST html on the site
    (every book of the category appears as a pod), so packing them all into
    slice 0 would manufacture a straggler partition that serializes every
    downstream parse. Striping models reality: big hub pages of a host are
    spread across the page-store's partitions."""
    if slice_idx == 0:
        yield "root", 0, BASE + "/index.html", render_root(spec)
    for n in range(1, spec.n_listing_pages + 1):
        if n % n_slices == slice_idx:
            yield "listing", n, listing_url(spec, n), render_listing(spec, n)
    for c in range(spec.n_categories):
        if c % n_slices == slice_idx:
            yield "category", c, category_url(spec, c), render_category(spec, c)
    for b in range(lo, hi):
        yield "detail", b, book_url(spec, b), render_detail(spec, b)


def pages_dict(spec: SiteSpec) -> dict[str, bytes]:
    """url → html map for the single-threaded Python oracle."""
    return {p.url: p.html for p in iter_pages(spec)}


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_dataframe(spark, spec: SiteSpec, slices: int = 32):
    """Distributed generation: shard the book-id space; shard 0 adds the
    root/listing/category pages. Deterministic regardless of parallelism.

    At 10^10-page scale this is the pattern that matters: generation (or in
    real life, WARC ingestion) is embarrassingly parallel over id ranges and
    never collects to the driver.
    """
    import pandas as pd

    n = spec.n_books
    slices = max(1, min(slices, n))
    bounds = [
        (i, i * n // slices, (i + 1) * n // slices) for i in range(slices)
    ]
    sdf = spark.createDataFrame(
        bounds, "idx long, lo long, hi long"
    ).repartition(slices, "idx")

    def gen(batches):
        for pdf in batches:
            for idx, lo, hi in zip(pdf["idx"], pdf["lo"], pdf["hi"]):
                rows = []
                for kind, ident, url, html in _iter_raw(
                    spec, int(lo), int(hi), int(idx), slices
                ):
                    lang = _LANGS[(ident + (0 if kind == "detail" else 7)) % len(_LANGS)]
                    # identity-keyed warc_ts: unique across pages and
                    # invariant under slicing (see _page_ts)
                    ts = _page_ts(spec, kind, int(ident))
                    rows.append((url, ts, html, extracted_text(url, html), lang))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text", "lang"]
                    )

    return sdf.mapInPandas(gen, PAGES_SCHEMA)
