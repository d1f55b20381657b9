"""Catalyst expression forms of the reference kernels.

Everything here compiles into whole-stage codegen (no Python in the hot
path). For kernels whose semantics are pure substring/byte tests these are
*provably* equal to the normative kernels on ASCII input — asserted against
the pandas-UDF forms in the Spark parity tests. The crawl engine uses
expressions for predicates/gates and the UDFs for parsing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DOMAIN = "books.toscrape.com"

# --- F2: rating word → word, ordered contains (HtmlParser.cpp:22-29) ---


def parse_rating_expr(cls: Column) -> Column:
    # C++ checks One..Five in order; first match wins (HtmlParser.cpp:22-29)
    return (
        F.when(cls.contains("One"), "One")
        .when(cls.contains("Two"), "Two")
        .when(cls.contains("Three"), "Three")
        .when(cls.contains("Four"), "Four")
        .when(cls.contains("Five"), "Five")
        .otherwise("Unknown")
    )


# --- F7: canonicalize_url as a SQL expression (HtmlParser.cpp:216-255) ---


def canonicalize_url_sql(col: str) -> str:
    """SQL-text pipeline for F7 — usable verbatim in Spark SQL and (with the
    same semantics) in DuckDB for the oracle. Steps in C++ order:
    lower → strip scheme → strip www. → strip ONE trailing '/' →
    strip #fragment → strip ?query unless 'search'/'filter' in the url.

    Lowering is ``translate`` over A-Z only — C++ ``std::tolower`` in the C
    locale is ASCII-only, while SQL ``lower()`` also lowers non-ASCII
    letters; translate keeps the expression byte-identical to the kernel
    (kernels.py ``_ASCII_LOWER``) on arbitrary input, which lets the crawl
    engine run this form in whole-stage codegen instead of the Python UDF."""
    lowered = (
        f"translate({col}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        f" 'abcdefghijklmnopqrstuvwxyz')"
    )
    no_scheme = (
        f"CASE WHEN instr({lowered}, '://') > 0 "
        f"THEN substring({lowered}, instr({lowered}, '://') + 3) "
        f"ELSE {lowered} END"
    )
    no_www = (
        f"CASE WHEN substring(({no_scheme}), 1, 4) = 'www.' "
        f"THEN substring(({no_scheme}), 5) ELSE ({no_scheme}) END"
    )
    no_slash = (
        f"CASE WHEN ({no_www}) LIKE '%/' "
        f"THEN substring(({no_www}), 1, length({no_www}) - 1) ELSE ({no_www}) END"
    )
    no_frag = (
        f"CASE WHEN instr(({no_slash}), '#') > 0 "
        f"THEN substring(({no_slash}), 1, instr(({no_slash}), '#') - 1) "
        f"ELSE ({no_slash}) END"
    )
    no_query = (
        f"CASE WHEN instr(({no_frag}), '?') > 0 "
        f"AND instr(({no_frag}), 'search') = 0 "
        f"AND instr(({no_frag}), 'filter') = 0 "
        f"THEN substring(({no_frag}), 1, instr(({no_frag}), '?') - 1) "
        f"ELSE ({no_frag}) END"
    )
    return no_query


# --- F9/F10/F11: predicates (HtmlParser.cpp:200-213, 258-278) ---


def is_book_page_expr(url: Column) -> Column:
    return (
        url.contains("/catalogue/")
        & ~url.contains(".html")
        & ~url.endswith("/")
        & (F.length(url) > 0)
    )


def is_category_page_expr(url: Column) -> Column:
    return (
        url.contains("/category/")
        | url.contains("index.html")
        | url.contains("page-")
    )


def should_ignore_url_expr(url: Column) -> Column:
    ignore = F.lit(False)
    for m in ("/accounts/", "/login", "/logout", "/admin", "/static/",
              ".jpg", ".png", ".css", ".js"):
        ignore = ignore | url.contains(m)
    return ignore | ~url.contains(DOMAIN)


def book_parse_gate_expr(path: Column) -> Column:
    """Crawler.cpp:210-211 — run parse_books only on category-ish pages."""
    return (
        is_category_page_expr(path)
        | path.contains("index.html")
        | path.contains("page-")
    )


# --- F15: coercions (Item.h:40-103) ---


def rating_value_expr(rating: Column) -> Column:
    m = F.create_map(
        *[x for w, i in
          [("One", 1), ("Two", 2), ("Three", 3), ("Four", 4), ("Five", 5)]
          for x in (F.lit(w), F.lit(i))]
    )
    return F.coalesce(m[rating], F.lit(0))


def price_value_expr(price: Column) -> Column:
    """Byte-exact expression twin of ``kernels.price_to_double``
    (Item.h:54-89), fuzz-asserted equal to the kernel on hostile inputs:

    - every byte before the first digit is dropped (the C++ skips '$'/>127
      explicitly and appends nothing else pre-digit — same net effect);
    - from the first digit on, keep [0-9.,] with ',' → '.';
    - ``std::stod`` = longest valid prefix ``[0-9]+(\\.[0-9]*)?``, 0.0 when
      nothing parses.

    Runs in whole-stage codegen — this is the engine's hot-path form; the
    pandas UDF (udfs.price_value_udf) remains the normative spec."""
    tail = F.regexp_extract(price, r"(?s)([0-9].*)", 1)
    cleaned = F.regexp_replace(
        F.regexp_replace(tail, r"[^0-9.,]", ""), ",", "."
    )
    stod = F.regexp_extract(cleaned, r"^([0-9]+(\.[0-9]*)?)", 1)
    # try_cast: '' (nothing parsed) → NULL → 0.0, ANSI-mode safe
    return F.coalesce(stod.try_cast("double"), F.lit(0.0))


# --- F16: host classification (server.cpp:255-308) ---


def classify_item_type_expr(host: Column) -> Column:
    return (
        F.when(host.contains("toscrape.com"), "BOOK")
        .when(
            host.contains("indeed") | host.contains("linkedin")
            | host.contains("monster"), "JOB")
        .when(
            host.contains("amazon") | host.contains("ebay")
            | host.contains("walmart"), "PRODUCT")
        .when(
            host.contains("medium") | host.contains("news.")
            | host.contains("blog."), "ARTICLE")
        .otherwise("GENERIC")
    )


def url_host_expr(url: Column) -> Column:
    """scheme-stripped host (split at first '/' after the scheme)."""
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    return F.substring_index(no_scheme, "/", 1)


# --- F12/F13: URL validity + repair (worker.cpp:311-348) ---

_MARKER = "http://" + DOMAIN + "http"


def is_valid_url_expr(url: Column) -> Column:
    """F12 — reject empty, double-protocol, domain-concatenation urls
    (worker.cpp:311-332). Expression twin of kernels.is_valid_url."""
    bad = (
        url.contains("http://http://")
        | url.contains("http://https://")
        | url.contains("https://http://")
        | url.contains("https://https://")
        | url.contains(_MARKER)
    )
    return (url != F.lit("")) & ~bad


def fix_malformed_url_expr(url: Column) -> Column:
    """F13 — strip a duplicated-domain prefix (substr(pos+24): one 'm'
    survives, reference bug reproduced, worker.cpp:335-348), then the
    worker's leading-'mhttp' strip (worker.cpp:800-803). Expression twin of
    kernels.fix_malformed_url."""
    pos = F.instr(url, _MARKER)  # 1-based; 0 = absent
    stripped = F.when(
        pos > 0, url.substr(pos + 24, F.length(url))
    ).otherwise(url)
    return F.when(
        stripped.startswith("mhttp"),
        stripped.substr(F.lit(2), F.length(stripped)),
    ).otherwise(stripped)
