"""Arrow-vectorized pandas UDFs wrapping the byte-exact kernels.

These are the *normative* engine path (SURVEY §2.11): html travels as
``BinaryType`` (no unicode round-trip), batches cross the JVM↔Python
boundary via Arrow, and the per-element work calls the same kernel
functions the pytest oracle uses — so UDF output ≡ oracle output by
construction, re-checked by the Spark parity tests.

Per-row *Python UDFs* are never used; where a kernel is provable as a pure
Catalyst expression (predicates, rating words, host classify), prefer
``expressions.py`` — those stay in whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)

from . import kernels as K

BOOK_STRUCT = StructType(
    [
        StructField("title", StringType()),
        StructField("price", StringType()),
        StructField("rating", StringType()),
        StructField("url", StringType()),
    ]
)


def _san(s: str) -> str:
    # surrogateescape chars can't cross Arrow; corpus is valid UTF-8 so this
    # is a no-op there, and lossy-but-stable on hostile bytes.
    return s.encode("utf-8", "replace").decode("utf-8") if s is not None else None


@F.pandas_udf(ArrayType(BOOK_STRUCT))
def parse_books_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """F3 — listing-page extraction; one array<struct> per page, exploded by
    the caller with posexplode to keep the in-page book rank."""
    out = []
    for h, b in zip(html, base_url):
        if h is None:
            out.append([])
            continue
        out.append(
            [
                {"title": _san(bk.title), "price": _san(bk.price),
                 "rating": bk.rating, "url": _san(bk.url)}
                for bk in K.parse_books(bytes(h), b)
            ]
        )
    return pd.Series(out)


@F.pandas_udf(
    StructType(
        [
            StructField("title", StringType()),
            StructField("price", StringType()),
            StructField("rating", StringType()),
        ]
    )
)
def parse_book_page_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """F4 — detail-page extraction (the byte-identity invariant fields)."""
    rows = []
    for h, u in zip(html, url):
        if h is None:
            rows.append((None, None, None))
        else:
            bk = K.parse_book_page(bytes(h), K.url_host(u or ""), u or "")
            rows.append((_san(bk.title), _san(bk.price), bk.rating))
    return pd.DataFrame(rows, columns=["title", "price", "rating"])


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """F8 — sorted, deduped link set per page (ordering is the crawl-order
    tie-break, SURVEY §3.1)."""
    out = []
    for h, b in zip(html, base_url):
        if h is None:
            out.append([])
        else:
            out.append([_san(x) for x in K.extract_all_links(bytes(h), b)])
    return pd.Series(out)


@F.pandas_udf(StringType())
def find_next_link_udf(html: pd.Series) -> pd.Series:
    """F5 — href inside <li class="next"> (HtmlParser.cpp:86-99); '' if
    none. Drives the sequential strategy (plans/sequential.py)."""
    return pd.Series(
        [
            _san(K.find_next_link(bytes(h))) if h is not None else ""
            for h in html
        ]
    )


@F.pandas_udf(StringType())
def extract_between_udf(
    text: pd.Series, start: pd.Series, end: pd.Series
) -> pd.Series:
    """F1 — extract_between (HtmlParser.cpp:6-19): text after the first
    ``start`` up to the next ``end``; '' if either marker is missing.
    Byte-exact: operates on UTF-8 bytes like the C++ std::string::find."""
    return pd.Series(
        [
            _san(
                K.extract_between(
                    t.encode("utf-8"), s.encode("utf-8"), e.encode("utf-8")
                ).decode("utf-8", "surrogateescape")
            )
            if t is not None
            else None
            for t, s, e in zip(text, start, end)
        ]
    )


@F.pandas_udf(StringType())
def canonicalize_udf(url: pd.Series) -> pd.Series:
    """F7 — normative canonicalization (expression form in expressions.py is
    the optimized equivalent, asserted equal in tests)."""
    return url.map(lambda u: K.canonicalize_url(u) if u is not None else None)


@F.pandas_udf(StringType())
def normalize_udf(url: pd.Series, base: pd.Series) -> pd.Series:
    """F6 — relative→absolute resolution."""
    return pd.Series(
        [
            K.normalize_url(u, b) if u is not None else None
            for u, b in zip(url, base)
        ]
    )


@F.pandas_udf(DoubleType())
def price_value_udf(price: pd.Series) -> pd.Series:
    """F15 — byte-exact price→double (Item.h:54-89)."""
    return price.map(lambda p: K.price_to_double(p) if p is not None else 0.0)


@F.pandas_udf(StringType())
def url_host_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: K.url_host(u) if u is not None else None)


@F.pandas_udf(StringType())
def extracted_text_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """The per-row invariant: the reference-parser extraction for a page
    (detail → title\\nprice\\nrating; listing → TSV of parse_books rows)."""
    from ..sources.sitegen import extracted_text

    return pd.Series(
        [
            extracted_text(u, bytes(h)) if h is not None else None
            for u, h in zip(url, html)
        ]
    )
