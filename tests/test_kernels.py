"""Branch-coverage unit tests for the byte-exact parser kernels.

Each case pins one branch of the C++ reference (file:line in comments) so a
regression in the Python port is caught without any Spark involvement.
"""

from distributed_web_scrapper_and_crawler_c__spark.functions import kernels as K

BASE = "http://books.toscrape.com"


# ---- F1 extract_between (HtmlParser.cpp:6-19) ----

def test_extract_between_basic():
    assert K.extract_between(b"<a>x</a>", b"<a>", b"</a>") == b"x"

def test_extract_between_missing_start():
    assert K.extract_between(b"x</a>", b"<a>", b"</a>") == b""

def test_extract_between_missing_end():
    assert K.extract_between(b"<a>x", b"<a>", b"</a>") == b""

def test_extract_between_end_searched_after_start():
    # end delim occurring before start must not match
    assert K.extract_between(b"</a><a>x</a>", b"<a>", b"</a>") == b"x"


# ---- F2 parse_rating (HtmlParser.cpp:22-29) ----

def test_parse_rating_order_precedence():
    # checked in order One..Five: "Twenty-One" hits "One" via substring
    assert K.parse_rating(b"Twenty-One") == "One"
    assert K.parse_rating(b"star-rating Three") == "Three"
    assert K.parse_rating(b"nothing") == "Unknown"
    assert K.parse_rating(b"") == "Unknown"


# ---- F6 normalize_url (HtmlParser.cpp:102-146) ----

def test_normalize_absolute_passthrough():
    assert K.normalize_url("https://x.com/a", BASE + "/b") == "https://x.com/a"

def test_normalize_empty():
    assert K.normalize_url("", BASE) == ""

def test_normalize_protocol_relative():
    assert K.normalize_url("//cdn.x.com/a", BASE) == "http://cdn.x.com/a"

def test_normalize_root_relative():
    assert K.normalize_url("/cat/x.html", BASE + "/a/b.html") == BASE + "/cat/x.html"

def test_normalize_root_relative_base_is_domain():
    # base has no path → domain = whole base (HtmlParser.cpp:127)
    assert K.normalize_url("/x", BASE) == BASE + "/x"

def test_normalize_path_relative():
    assert (
        K.normalize_url("page-2.html", BASE + "/catalogue/page-1.html")
        == BASE + "/catalogue/page-2.html"
    )

def test_normalize_path_relative_guard_gt8():
    # last slash at index <= 8 (the scheme's //) → domain + "/" + url
    assert K.normalize_url("x.html", BASE) == BASE + "/x.html"

def test_normalize_base_without_protocol():
    # no "://" in base → http:// + host part (HtmlParser.cpp:129-132)
    assert K.normalize_url("/x", "books.toscrape.com/a") == "http://books.toscrape.com/x"
    assert K.normalize_url("/x", "books.toscrape.com") == "http://books.toscrape.com/x"


# ---- F7 canonicalize_url (HtmlParser.cpp:216-255) ----

def test_canonicalize_lowercase_and_scheme():
    assert K.canonicalize_url("HTTPS://Books.Toscrape.COM/A") == "books.toscrape.com/a"

def test_canonicalize_www_strip():
    assert K.canonicalize_url("http://www.books.toscrape.com/x") == "books.toscrape.com/x"

def test_canonicalize_single_trailing_slash():
    assert K.canonicalize_url("http://h.com/a//") == "h.com/a/"

def test_canonicalize_slash_before_fragment_order():
    # trailing '/' stripped BEFORE '#': "h/a/#f" keeps the slash
    assert K.canonicalize_url("http://h.com/a/#f") == "h.com/a/"

def test_canonicalize_fragment():
    assert K.canonicalize_url("http://h.com/a#sec") == "h.com/a"

def test_canonicalize_query_stripped():
    assert K.canonicalize_url("http://h.com/a?b=1") == "h.com/a"

def test_canonicalize_query_kept_for_search_filter():
    assert K.canonicalize_url("http://h.com/search?q=1") == "h.com/search?q=1"
    assert K.canonicalize_url("http://h.com/a?filter=x") == "h.com/a?filter=x"
    # 'search' ANYWHERE in the (lowered, stripped) url preserves the query
    assert K.canonicalize_url("http://h.com/research/a?x=1") == "h.com/research/a?x=1"


# ---- F3 parse_books (HtmlParser.cpp:32-83) ----

POD = (
    b'<article class="product_pod">'
    b'<h3><a href="catalogue/a_1/index.html" title="A Light">A Li...</a></h3>'
    b'<p class="price_color">\xc2\xa351.77</p>'
    b'<p class="star-rating Three">x</p>'
    b"</article>"
)

def test_parse_books_title_attr_and_fields():
    books = K.parse_books(POD, BASE + "/index.html")
    assert len(books) == 1
    b = books[0]
    assert b.title == "A Light"
    assert b.price == "£51.77"
    assert b.rating == "Three"
    assert b.url == BASE + "/catalogue/a_1/index.html"

def test_parse_books_title_fallback():
    html = POD.replace(b' title="A Light"', b"")
    assert K.parse_books(html, BASE)[0].title == "A Li..."

def test_parse_books_empty_url_dropped():
    html = POD.replace(b'href="catalogue/a_1/index.html" ', b'href="" ')
    # href="" → normalize("") = "" → book dropped (HtmlParser.cpp:74-76)
    assert K.parse_books(html, BASE) == []

def test_parse_books_multiple_and_unclosed():
    html = POD + POD.replace(b"a_1", b"b_2") + b'<article class="product_pod"><h3>'
    books = K.parse_books(html, BASE + "/i.html")
    assert [b.url for b in books] == [
        BASE + "/catalogue/a_1/index.html",
        BASE + "/catalogue/b_2/index.html",
    ]


# ---- F4 parse_book_page (HtmlParser.cpp:281-329) ----

DETAIL = (
    b"<html><h1>A Light in the ...</h1>"
    b'<p class="price_color">\xc2\xa351.77</p>'
    b'<p class="star-rating Three">' b"</html>"
)

def test_parse_book_page_fields():
    b = K.parse_book_page(DETAIL, "books.toscrape.com", BASE + "/c/a_1")
    assert b.title == "A Light in the ..."
    assert b.price == "£51.77"
    assert b.rating == "Three"

def test_parse_book_page_plus18_quirk():
    # classStart = pos+18 keeps b'ing' + the word; still contains-matches
    b = K.parse_book_page(b'<p class="star-rating One">', "h", "u")
    assert b.rating == "One"

def test_parse_book_page_no_closing_quote_rating_empty():
    # closing quote missing → rating stays "" (not "Unknown")
    b = K.parse_book_page(b'<p class=\x22star-rating Two', "h", "u")
    assert b.rating == ""

def test_parse_book_page_no_word_unknown():
    b = K.parse_book_page(b'<p class="star-rating">', "h", "u")
    assert b.rating == "Unknown"


# ---- F5 find_next_link (HtmlParser.cpp:86-99) ----

def test_find_next_link():
    html = b'<li class="next"><a href="page-2.html">next</a></li>'
    assert K.find_next_link(html) == "page-2.html"
    assert K.find_next_link(b"<li>no</li>") == ""


# ---- F8 extract_all_links (HtmlParser.cpp:149-197) ----

def test_extract_all_links_filters_sorts_dedups():
    html = (
        b'<a href="/catalogue/b.html">x</a>'
        b'<a href="/catalogue/a.html">x</a>'
        b'<a href="/catalogue/a.html">dup</a>'
        b'<a href="/style.css">s</a>'
        b'<a href="/img.jpg">s</a>'
        b'<a href="/static/x">s</a>'
        b'<a href="http://other.com/a">off-domain</a>'
        b'<a href="http://books.toscrape.comhttp://x">malformed</a>'
        b'<a href="mhttp://books.toscrape.com/x">malformed</a>'
    )
    assert K.extract_all_links(html, BASE) == [
        BASE + "/catalogue/a.html",
        BASE + "/catalogue/b.html",
    ]

def test_extract_all_links_sorted_order_is_bytewise():
    html = b'<a href="/z">.</a><a href="/A">.</a><a href="/a">.</a>'
    # off-domain hosts are dropped; same-domain sorted lexicographically
    html = html.replace(b'"/', b'"http://books.toscrape.com/')
    assert K.extract_all_links(html, BASE) == [
        BASE + "/A", BASE + "/a", BASE + "/z",
    ]


# ---- F9/F10/F11 predicates ----

def test_is_book_page():
    assert K.is_book_page(BASE + "/catalogue/a_1")
    assert not K.is_book_page(BASE + "/catalogue/a_1/index.html")
    assert not K.is_book_page(BASE + "/catalogue/a_1/")
    assert not K.is_book_page("")

def test_is_category_page():
    assert K.is_category_page("/catalogue/category/books/x_2/index.html")
    assert K.is_category_page("/catalogue/page-3.html")
    assert K.is_category_page("/x/index.html")
    assert not K.is_category_page("/catalogue/a_1")

def test_should_ignore_url():
    assert K.should_ignore_url(BASE + "/accounts/x")
    assert K.should_ignore_url(BASE + "/a.png")
    assert K.should_ignore_url("http://other.com/a")  # out of scope
    assert not K.should_ignore_url(BASE + "/catalogue/a_1/index.html")


# ---- F12/F13 worker url validity/repair (worker.cpp:311-348) ----

def test_is_valid_url():
    assert not K.is_valid_url("")
    assert not K.is_valid_url("http://http://x")
    assert not K.is_valid_url("http://books.toscrape.comhttp://x")
    assert K.is_valid_url(BASE + "/x")

def test_fix_malformed_url_off_by_one_reproduced():
    # substr(pos+24) leaves the trailing 'm' → then the mhttp strip removes it
    assert (
        K.fix_malformed_url("http://books.toscrape.comhttp://books.toscrape.com/x")
        == "http://books.toscrape.com/x"
    )


# ---- F15 Item coercions (Item.h:40-103) ----

def test_price_to_double_pound_utf8():
    assert K.price_to_double("£51.77") == 51.77

def test_price_to_double_dollar_and_euro():
    assert K.price_to_double("$9.99") == 9.99
    assert K.price_to_double("€3,50") == 3.5  # comma → dot after digit

def test_price_to_double_comma_before_digit_dropped():
    assert K.price_to_double(",.5") == 5.0

def test_price_to_double_stod_prefix():
    # two dots: std::stod parses the longest valid prefix
    assert K.price_to_double("1.2.3") == 1.2

def test_price_to_double_garbage():
    assert K.price_to_double("") == 0.0
    assert K.price_to_double("free") == 0.0
    assert K.price_to_double("abc12xyz34") == 1234.0  # letters dropped

def test_rating_to_int():
    assert K.rating_to_int("Three") == 3
    assert K.rating_to_int("Unknown") == 0
    assert K.rating_to_int("") == 0


# ---- F16 classify (server.cpp:255-308) ----

def test_classify_item_type():
    assert K.classify_item_type("books.toscrape.com") == "BOOK"
    assert K.classify_item_type("www.indeed.com") == "JOB"
    assert K.classify_item_type("amazon.co.uk") == "PRODUCT"
    assert K.classify_item_type("blog.example.com") == "ARTICLE"
    assert K.classify_item_type("example.com") == "GENERIC"


# ---- S2 extract_body (HttpClient.cpp:206-215) ----

def test_extract_body():
    assert K.extract_body(b"HTTP/1.1 200 OK\r\nA: b\r\n\r\n<html>") == b"<html>"
    assert K.extract_body(b"no headers") == b"no headers"


def test_url_host():
    assert K.url_host(BASE + "/catalogue/x") == "books.toscrape.com"
    assert K.url_host("books.toscrape.com/x") == "books.toscrape.com"
