"""Differential fuzz: compiled UNMODIFIED reference parser vs Python kernels.

Feeds thousands of adversarial inputs through both and asserts identical
output bytes. This is the verification drive for the kernel library —
the reference binary IS the ground truth.
"""
import base64
import random
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from distributed_web_scrapper_and_crawler_c__spark.functions import kernels as K

proc = subprocess.Popen(
    ["/root/repo/.work/ref_harness"],
    stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
)

def ask(op, *args):
    enc = [base64.b64encode(a if isinstance(a, bytes) else a.encode()).decode() for a in args]
    while len(enc) < 3:
        enc.append("")
    proc.stdin.write(op + "\t" + "\t".join(enc) + "\n")
    proc.stdin.flush()
    return proc.stdout.readline().rstrip("\n")

def d(s):
    return base64.b64decode(s)

rng = random.Random(42)
BASE = "http://books.toscrape.com"
URL_PARTS = [
    "http://", "https://", "HTTPS://", "//", "www.", "books.toscrape.com",
    "BOOKS.toscrape.COM", "other.com", "/catalogue/", "page-1.html", "index.html",
    "a_1/", "x.html", "#frag", "?q=1", "?search=x", "/filter/", "/static/",
    "img.png", "style.css", ".js", "/accounts/", "/login", "mhttp", "comhttp",
    "/", "..", "a b", "£", "", "search", "É", "Ü/À",
]
HTML_PARTS = [
    b'<article class="product_pod">', b"</article>", b"<h3>", b"</h3>",
    b'<a href="', b'" title="', b'">', b"</a>", b'<p class="price_color">',
    b"</p>", b'<p class="star-rating ', b'<p class="star-rating',
    b"One", b"Two", b"Three", b"Twenty-One", b'"', b"\xc2\xa351.77",
    b"\xa3", b"<h1>", b"</h1>", b'<li class="next">', b"</li>",
    b'href="/catalogue/a.html"', b'href="page-2.html"', b"\xff\xfe", b" ",
]

fail = 0
checks = 0

def chk(name, got, want, ctx):
    global fail, checks
    checks += 1
    if got != want:
        fail += 1
        print(f"MISMATCH {name}: ref={want!r} py={got!r} ctx={ctx!r}")

# --- URL ops on random concatenations ---
for i in range(4000):
    url = "".join(rng.choices(URL_PARTS, k=rng.randint(0, 6)))
    base = "".join(rng.choices(URL_PARTS, k=rng.randint(0, 4)))
    r = ask("normalize_url", url, base)
    chk("normalize_url", K.normalize_url(url, base), d(r).decode("utf-8", "surrogateescape"), (url, base))
    r = ask("canonicalize_url", url)
    chk("canonicalize_url", K.canonicalize_url(url), d(r).decode("utf-8", "surrogateescape"), url)
    r = ask("predicates", url)
    bp, cp, ig = r.split(":")
    if url:  # C++ url.back() on empty string is UB — excluded
        chk("is_book_page", int(K.is_book_page(url)), int(bp), url)
    chk("is_category_page", int(K.is_category_page(url)), int(cp), url)
    chk("should_ignore_url", int(K.should_ignore_url(url)), int(ig), url)

# --- HTML ops on random tag soup ---
for i in range(3000):
    html = b"".join(rng.choices(HTML_PARTS, k=rng.randint(0, 25)))
    base = "".join(rng.choices(URL_PARTS, k=rng.randint(0, 4)))
    r = ask("extract_all_links", html, base)
    ref_links = [d(x).decode("utf-8", "surrogateescape") for x in r.split("\t") if x]
    chk("extract_all_links", K.extract_all_links(html, base), ref_links, (html, base))

    r = ask("parse_books", html, base)
    ref_books = []
    for b in r.split("\t"):
        if not b:
            continue
        t, p, ra, u = b.split(":")
        ref_books.append((d(t), d(p), d(ra).decode(), d(u).decode("utf-8", "surrogateescape")))
    py_books = [(x.title.encode("utf-8", "surrogateescape") if isinstance(x.title, str) else x.title,
                 x.price.encode("utf-8", "surrogateescape"), x.rating, x.url)
                for x in K.parse_books(html, base)]
    # reference bytes vs python-decoded-re-encoded bytes
    ref_cmp = [(t, p, ra, u) for (t, p, ra, u) in ref_books]
    chk("parse_books", py_books, ref_cmp, (html, base))

    r = ask("parse_book_page", html, "books.toscrape.com", base)
    t, p, ra, u = r.split(":")
    pb = K.parse_book_page(html, "books.toscrape.com", base)
    chk("parse_book_page",
        (pb.title.encode("utf-8", "surrogateescape"), pb.price.encode("utf-8", "surrogateescape"), pb.rating),
        (d(t), d(p), d(ra).decode()), (html, base))

    r = ask("find_next_link", html)
    chk("find_next_link", K.find_next_link(html).encode("utf-8", "surrogateescape"), d(r), html)

# --- extract_between / parse_rating ---
for i in range(2000):
    text = b"".join(rng.choices(HTML_PARTS, k=rng.randint(0, 8)))
    s = rng.choice(HTML_PARTS)
    e = rng.choice(HTML_PARTS)
    chk("extract_between", K.extract_between(text, s, e), d(ask("extract_between", text, s, e)), (text, s, e))
    chk("parse_rating", K.parse_rating(text), d(ask("parse_rating", text)).decode(), text)

print(f"{checks} checks, {fail} mismatches")
proc.stdin.close()
sys.exit(1 if fail else 0)
