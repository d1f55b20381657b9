"""Diff the UNMODIFIED reference crawl loop (compiled) vs the Python oracle
on the synthetic site: crawl order (every http_get in dequeue order) and the
collected book list must match exactly."""
import base64
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")
from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen
from distributed_web_scrapper_and_crawler_c__spark.oracle import crawl_oracle

fails = 0
for n_books, max_pages, start in [
    (30, 0, "/catalogue/page-1.html"),
    (60, 0, "/catalogue/page-1.html"),
    (60, 25, "/catalogue/page-1.html"),
    (60, 1, "/catalogue/page-1.html"),
    (60, 0, "/index.html"),
    (13, 7, "/catalogue/category/books/travel_2/index.html"),
]:
    spec = sitegen.SiteSpec(n_books=n_books, n_categories=4, books_per_page=10)
    pages = sitegen.pages_dict(spec)
    with tempfile.TemporaryDirectory() as td:
        site = Path(td) / "site.tsv"
        out = Path(td) / "out.tsv"
        with open(site, "w") as f:
            for url, html in pages.items():
                f.write(url + "\t" + base64.b64encode(html).decode() + "\n")
        proc = subprocess.Popen(
            ["/root/repo/.work/ref_crawl_harness", str(site),
             "books.toscrape.com", start, str(max_pages), str(out)],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        # keep stdin OPEN and empty: _kbhit() treats EOF/closed as keypress
        proc.wait(timeout=120)
        proc.stdin.close()
        assert proc.returncode == 0
        ref_pops, ref_books = [], []
        for line in out.read_text().splitlines():
            parts = line.split("\t")
            if parts[0] == "POP":
                ref_pops.append(base64.b64decode(parts[1]).decode())
            elif parts[0] == "BOOK":
                ref_books.append(tuple(base64.b64decode(p).decode() for p in parts[1:]))

    res = crawl_oracle.crawl(pages, "books.toscrape.com", start, max_pages)
    py_pops = res.crawl_order
    py_books = [(b.title, b.price, b.rating, b.url) for b in res.books]

    ok = py_pops == ref_pops and py_books == ref_books
    print(f"n_books={n_books} max={max_pages} start={start}: "
          f"pops ref={len(ref_pops)} py={len(py_pops)} books ref={len(ref_books)} py={len(py_books)} "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        fails += 1
        for i, (a, b) in enumerate(zip(ref_pops, py_pops)):
            if a != b:
                print(f"  first pop divergence at {i}: ref={a!r} py={b!r}")
                break
        if len(ref_pops) != len(py_pops):
            print(f"  len diff; ref tail={ref_pops[len(py_pops):][:3]} py tail={py_pops[len(ref_pops):][:3]}")
        for i, (a, b) in enumerate(zip(ref_books, py_books)):
            if a != b:
                print(f"  first book divergence at {i}: ref={a!r} py={b!r}")
                break

sys.exit(1 if fails else 0)
