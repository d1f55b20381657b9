"""Byte-exact pure-Python ports of the reference parser kernels.

Each function is a line-faithful transliteration of the C++ in
``/root/reference/src/HtmlParser.cpp`` / ``include/Item.h`` (file:line cited
per function). These serve double duty:

1. the *normative oracle* the pytest suite asserts against, and
2. the kernel bodies executed inside the Arrow-vectorized pandas UDFs
   (``functions/udfs.py``) — so the engine and the oracle share one
   implementation and can only diverge through Spark plumbing bugs, which the
   parity tests catch.

HTML is handled as ``bytes`` throughout (C++ ``std::string`` is a byte
string; prices contain the 2-byte UTF-8 ``£`` and ``Item.h:63`` branches on
raw bytes > 127). URLs are ASCII and handled as ``str``.

No Spark imports here — this module must be importable on executors and in
plain pytest without a JVM.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# ---------------------------------------------------------------------------
# F1 — extract_between (HtmlParser.cpp:6-19)
# ---------------------------------------------------------------------------


def extract_between(text: bytes, start: bytes, end: bytes) -> bytes:
    """First ``start`` occurrence, then first ``end`` after it; b"" if either
    is missing. (HtmlParser.cpp:6-19)"""
    i = text.find(start)
    if i == -1:
        return b""
    i += len(start)
    j = text.find(end, i)
    if j == -1:
        return b""
    return text[i:j]


# ---------------------------------------------------------------------------
# F2 — parse_rating (HtmlParser.cpp:22-29)
# ---------------------------------------------------------------------------

_RATING_WORDS = (b"One", b"Two", b"Three", b"Four", b"Five")


def parse_rating(rating_class: bytes) -> str:
    """Substring-contains check in declared order One..Five, else "Unknown".
    Order is load-bearing: "Twenty-One" yields "One". (HtmlParser.cpp:22-29)
    """
    for w in _RATING_WORDS:
        if w in rating_class:
            return w.decode("ascii")
    return "Unknown"


# ---------------------------------------------------------------------------
# Book record (Book.h:6-21)
# ---------------------------------------------------------------------------


class Book(NamedTuple):
    title: str
    price: str
    rating: str
    url: str


def _decode(b: bytes) -> str:
    # surrogateescape round-trips arbitrary bytes losslessly through str, so
    # the kernels stay byte-faithful to the C++ (std::string = bytes) even on
    # invalid UTF-8. Spark-facing string columns re-decode with 'replace'
    # (udfs.py); the byte-identity invariant rides on BinaryType columns.
    return b.decode("utf-8", "surrogateescape")


def _encode(s: str) -> bytes:
    return s.encode("utf-8", "surrogateescape")


# C++ std::tolower in the C locale lowers A-Z only; Python str.lower() would
# also lower non-ASCII letters — byte-faithful ASCII-only table instead.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


# ---------------------------------------------------------------------------
# F6 — normalize_url (HtmlParser.cpp:102-146)
# ---------------------------------------------------------------------------


def normalize_url(url: str, base_url: str) -> str:
    """Relative→absolute URL resolution, reference semantics exactly.
    Operates on BYTES internally: the C++ index arithmetic (notably the
    ``last_slash > 8`` guard) counts bytes, which diverges from character
    indices when URLs contain multi-byte UTF-8. (HtmlParser.cpp:102-146)"""
    u = _encode(url)
    b = _encode(base_url)
    if u.startswith(b"http://") or u.startswith(b"https://"):
        return url
    if u == b"":
        return ""
    if u[:2] == b"//":
        return "http:" + url
    # extract scheme+host from base_url (HtmlParser.cpp:119-132)
    ds = b.find(b"://")
    if ds != -1:
        ds += 3
        de = b.find(b"/", ds)
        domain = b[:de] if de != -1 else b
    else:
        # C++ substr(0, find('/')) — npos means the whole string
        sl = b.find(b"/")
        domain = b"http://" + (b if sl == -1 else b[:sl])
    if u[:1] == b"/":
        return _decode(domain + u)
    # path-relative, guarded last_slash > 8 in BYTE position (HtmlParser.cpp:140-145)
    last_slash = b.rfind(b"/")
    if last_slash != -1 and last_slash > 8:
        return _decode(b[: last_slash + 1] + u)
    return _decode(domain + b"/" + u)


# ---------------------------------------------------------------------------
# F7 — canonicalize_url (HtmlParser.cpp:216-255)
# ---------------------------------------------------------------------------


def canonicalize_url(url: str) -> str:
    """lowercase whole URL → strip scheme → strip leading www. → strip ONE
    trailing '/' → strip #fragment → strip ?query unless the url contains
    'search' or 'filter'. Step order is load-bearing (trailing slash is
    stripped BEFORE the fragment, so "host/a/#f" → "host/a/").
    (HtmlParser.cpp:216-255)"""
    r = url.translate(_ASCII_LOWER)
    p = r.find("://")
    if p != -1:
        r = r[p + 3 :]
    if r[:4] == "www.":
        r = r[4:]
    if r and r[-1] == "/":
        r = r[:-1]
    a = r.find("#")
    if a != -1:
        r = r[:a]
    q = r.find("?")
    if q != -1 and "search" not in r and "filter" not in r:
        r = r[:q]
    return r


# ---------------------------------------------------------------------------
# F3 — parse_books (HtmlParser.cpp:32-83)
# ---------------------------------------------------------------------------

_BOOK_START = b'<article class="product_pod">'
_BOOK_END = b"</article>"


def parse_books(html: bytes, base_url: str) -> list[Book]:
    """Split on product_pod article blocks; extract title (title-attr with
    text-content fallback), href→normalize, price, star-rating class; drop
    books with an empty url. (HtmlParser.cpp:32-83)"""
    books: list[Book] = []
    pos = 0
    while True:
        pos = html.find(_BOOK_START, pos)
        if pos == -1:
            break
        end_pos = html.find(_BOOK_END, pos)
        if end_pos == -1:
            break
        book_html = html[pos : end_pos + len(_BOOK_END)]

        title_tag = extract_between(book_html, b"<h3>", b"</h3>")
        title = extract_between(title_tag, b'title="', b'"')
        if title == b"":
            # fallback: text content of the <a> (HtmlParser.cpp:57-59)
            title = extract_between(title_tag, b'">', b"</a>")
        rel = extract_between(title_tag, b'href="', b'"')
        url = normalize_url(_decode(rel), base_url)
        price = extract_between(book_html, b'<p class="price_color">', b"</p>")
        rating_class = extract_between(book_html, b'<p class="star-rating ', b'"')
        if url != "":
            books.append(
                Book(
                    title=_decode(title),
                    price=_decode(price),
                    rating=parse_rating(rating_class),
                    url=url,
                )
            )
        pos = end_pos + len(_BOOK_END)
    return books


# ---------------------------------------------------------------------------
# F4 — parse_book_page (HtmlParser.cpp:281-329)
# ---------------------------------------------------------------------------


def parse_book_page(html: bytes, hostname: str, url: str) -> Book:
    """Detail-page extraction. Reproduces the ``classStart = pos + 18`` quirk
    (the search string ``<p class="star-rating`` is 21 bytes, so the class
    slice keeps a leading ``ing``) and the empty-string (NOT "Unknown")
    rating when the closing quote is missing. (HtmlParser.cpp:281-329)"""
    title = extract_between(html, b"<h1>", b"</h1>")
    price = extract_between(html, b'<p class="price_color">', b"</p>")
    rating = ""
    pos = html.find(b'<p class="star-rating')
    if pos != -1:
        class_start = pos + 18  # quirk: 18, not len(...)==21 (HtmlParser.cpp:304)
        class_end = html.find(b'"', class_start)
        if class_end != -1:
            rating_class = html[class_start:class_end]
            rating = "Unknown"
            for w in _RATING_WORDS:
                if w in rating_class:
                    rating = w.decode("ascii")
                    break
    return Book(title=_decode(title), price=_decode(price), rating=rating, url=url)


# ---------------------------------------------------------------------------
# F5 — find_next_link (HtmlParser.cpp:86-99)
# ---------------------------------------------------------------------------


def find_next_link(html: bytes) -> str:
    next_li = extract_between(html, b'<li class="next">', b"</li>")
    if next_li == b"":
        return ""
    return _decode(extract_between(next_li, b'href="', b'"'))


# ---------------------------------------------------------------------------
# F8 — extract_all_links (HtmlParser.cpp:149-197)
# ---------------------------------------------------------------------------

_STATIC_MARKERS = (b".css", b".js", b".ico", b".jpg", b".png", b"/static/")
_MALFORMED_MARKERS = (
    "http://books.toscrape.comhttp",   # catches ...comhttps too
    "mhttp",                           # catches mhttps too
)
_DOMAIN = "books.toscrape.com"


def extract_all_links(html: bytes, base_url: str) -> list[str]:
    """Scan every href="…"; drop static-resource hrefs pre-normalization;
    normalize; drop malformed domain concatenations; keep only same-domain
    URLs. Returns the *sorted, deduped* list (C++ returns std::set — its
    iteration order is the crawl-order tie-break, SURVEY §3.1).
    (HtmlParser.cpp:149-197)"""
    links: set[str] = set()
    a_href = b'href="'
    pos = 0
    while True:
        pos = html.find(a_href, pos)
        if pos == -1:
            break
        pos += len(a_href)
        end_pos = html.find(b'"', pos)
        if end_pos == -1:
            break
        href = html[pos:end_pos]
        pos = end_pos + 1
        if any(m in href for m in _STATIC_MARKERS):
            continue
        full_url = normalize_url(_decode(href), base_url)
        if any(m in full_url for m in _MALFORMED_MARKERS):
            continue
        if full_url != "" and _DOMAIN in full_url:
            links.add(full_url)
    return sorted(links)


# ---------------------------------------------------------------------------
# F9/F10/F11 — URL predicates (HtmlParser.cpp:200-213, 258-278)
# ---------------------------------------------------------------------------


def is_book_page(url: str) -> bool:
    """contains /catalogue/ AND no .html anywhere AND no trailing slash.
    (HtmlParser.cpp:200-205; C++ url.back() on "" is UB — we define False)"""
    return "/catalogue/" in url and ".html" not in url and not url.endswith("/")


def is_category_page(url: str) -> bool:
    """(HtmlParser.cpp:208-213)"""
    return "/category/" in url or "index.html" in url or "page-" in url


_IGNORE_MARKERS = (
    "/accounts/", "/login", "/logout", "/admin", "/static/",
    ".jpg", ".png", ".css", ".js",
)


def should_ignore_url(url: str) -> bool:
    """Scope/robots-analog rule. (HtmlParser.cpp:258-278)"""
    if any(m in url for m in _IGNORE_MARKERS):
        return True
    return _DOMAIN not in url


# ---------------------------------------------------------------------------
# F12/F13 — worker URL validity/repair (worker.cpp:311-348)
# ---------------------------------------------------------------------------


def is_valid_url(url: str) -> bool:
    """Reject empty, double-protocol, domain-concatenation urls.
    (worker.cpp:311-332)"""
    if url == "":
        return False
    for bad in ("http://http://", "http://https://", "https://http://",
                "https://https://"):
        if bad in url:
            return False
    # 'comhttp' marker also covers 'comhttps' (substring)
    if "http://books.toscrape.comhttp" in url:
        return False
    return True


def fix_malformed_url(url: str) -> str:
    """Strip a duplicated-domain prefix: drop 24 chars (the glued
    'http://books.toscrape.com') from the concatenation point; worker's
    crawl path additionally strips a leading 'm' of 'mhttp...'.
    (worker.cpp:335-348, 800-803)"""
    marker = "http://books.toscrape.comhttp"
    p = url.find(marker)
    if p != -1:
        # substr(pos+24): the glued prefix is 25 bytes, so one 'm' survives —
        # reference bug reproduced; the mhttp strip below then removes it.
        url = url[p + 24 :]
    if url.startswith("mhttp"):
        url = url[1:]
    return url


# ---------------------------------------------------------------------------
# F15 — Item coercions (Item.h:40-103)
# ---------------------------------------------------------------------------

_STOD_PREFIX = re.compile(rb"[0-9]+(\.[0-9]*)?")


def price_to_double(price: str | bytes) -> float:
    """price string → double, byte-faithful to Item.h:54-89:
    while no digit seen, skip '$' and any byte > 127 (the UTF-8 bytes of
    £/€; the C++ wide-literal comparisons never match a narrow char);
    keep digits; keep '.'/',' (as '.') only after the first digit; drop
    everything else; then std::stod (longest-valid-prefix) with 0.0 on
    failure."""
    if isinstance(price, str):
        price = price.encode("utf-8")
    if price == b"":
        return 0.0
    clean = bytearray()
    found_digit = False
    for b in price:
        if not found_digit and (b == 0x24 or b > 127):  # '$' or non-ASCII
            continue
        if 0x30 <= b <= 0x39:
            clean.append(b)
            found_digit = True
        elif (b == 0x2E or b == 0x2C) and found_digit:
            clean.append(0x2E)
    if not clean:
        return 0.0
    m = _STOD_PREFIX.match(bytes(clean))
    if m is None:
        return 0.0
    try:
        return float(m.group(0))
    except ValueError:
        return 0.0


_RATING_TO_INT = {"One": 1, "Two": 2, "Three": 3, "Four": 4, "Five": 5}


def rating_to_int(rating: str) -> int:
    """Exact-equality word→int map, else 0. (Item.h:92-96)"""
    return _RATING_TO_INT.get(rating, 0)


# ---------------------------------------------------------------------------
# F16 — host → item-type classification (server.cpp:255-275, 291-308)
# ---------------------------------------------------------------------------

_TYPE_RULES = (
    ("toscrape.com", "BOOK"),
    ("indeed", "JOB"),
    ("linkedin", "JOB"),
    ("monster", "JOB"),
    ("amazon", "PRODUCT"),
    ("ebay", "PRODUCT"),
    ("walmart", "PRODUCT"),
    ("medium", "ARTICLE"),
    ("news.", "ARTICLE"),
    ("blog.", "ARTICLE"),
)


def classify_item_type(host: str) -> str:
    """Hostname substring dispatch, first match wins. (server.cpp:255-308)"""
    for marker, t in _TYPE_RULES:
        if marker in host:
            return t
    return "GENERIC"


# ---------------------------------------------------------------------------
# S2 — header/body split (HttpClient.cpp:206-215)
# ---------------------------------------------------------------------------


def extract_body(response: bytes) -> bytes:
    """Body = everything after the first CRLFCRLF; whole response if absent
    (C++ returns response unchanged when the marker is missing)."""
    i = response.find(b"\r\n\r\n")
    if i == -1:
        return response
    return response[i + 4 :]


def url_host(url: str) -> str:
    """scheme-stripped host portion (helper for partitioning; not a
    reference kernel — the reference crawls one fixed hostname)."""
    r = url
    p = r.find("://")
    if p != -1:
        r = r[p + 3 :]
    s = r.find("/")
    if s != -1:
        r = r[:s]
    return r
