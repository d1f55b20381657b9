"""D5/D6/D7 distributed-mode emulation (SURVEY §2.9's reserved flag).

The racy reference heuristics have no reproducible reference output, so
these tests pin the DETERMINISTIC serialization the module documents:
round-robin worker assignment, seq order within a worker, per-worker
state. Branch coverage follows worker.cpp:919-968 (D5), :848-899 (D6),
:1211-1223 (D7)."""

from __future__ import annotations

import pytest

from distributed_web_scrapper_and_crawler_c__spark.operators import (
    distributed_emulation as DE,
)


# ------------------------------------------------------------- pure kernels


def test_d5_canonical_lowercase_and_single_slash():
    assert DE.d5_canonical("HTTP://X/A/") == "http://x/a"
    # C++ pops exactly one trailing slash
    assert DE.d5_canonical("http://x/a//") == "http://x/a/"
    assert DE.d5_canonical("") == ""


def test_d5_product_name_shapes():
    # flat catalogue page: slug before underscore
    assert (
        DE.d5_product_name("http://h/catalogue/great-book_12.html")
        == "great-book"
    )
    # books.toscrape shape: ident is 'index' -> no underscore -> None
    assert (
        DE.d5_product_name("http://h/catalogue/great-book_12/index.html")
        is None
    )
    # outside /catalogue/ or without .html -> None
    assert DE.d5_product_name("http://h/other/great-book_12.html") is None
    assert DE.d5_product_name("http://h/catalogue/great-book_12") is None
    # size_t-underflow quirk: .html BEFORE the last slash -> ident is the
    # tail after the last slash, clamped to end of string
    assert (
        DE.d5_product_name("http://h/catalogue/x.html/deep-page_2")
        == "deep-page"
    )


def test_d5_d7_scan_branches():
    seed = "http://h/Catalogue/page-1.html"  # raw, mixed case on purpose
    urls = [
        "http://h/catalogue/alpha_1.html",   # 0 first-seen
        "http://h/CATALOGUE/alpha_1.html/",  # 1 slug, NOT exact: the slug
                                             #   scan runs before the set
                                             #   probe (worker.cpp:948-958)
                                             #   and 'alpha' is in alpha_1
        "http://h/catalogue/alpha_2.html",   # 2 slug ('alpha' seen)
        "http://h/catalogue/alpha_2.html",   # 3 STILL slug: slug hits never
                                             #   insert, and alpha_1 remains
        "http://h/catalogue/beta_1.html",    # 4 first-seen -> set size 2
        "http://h/plain-page",               # 5 first-seen -> size 3 > 2
                                             #   -> D7 clear, keep raw seed
        "http://h/catalogue/alpha_1.html",   # 6 first-seen AGAIN (evicted)
        seed.lower(),                        # 7 first-seen: raw seed in set
                                             #   is mixed-case, canonical is
                                             #   lowercase -> miss (faithful
                                             #   worker.cpp:1219 quirk);
                                             #   'page-1' has no underscore
                                             #   so no slug check either
    ]
    rows = DE._run_d5_d7(range(len(urls)), urls, max_processed=2, seed_url=seed)
    kinds = [r[3] for r in rows]
    assert kinds == [
        None, "slug", "slug", "slug", None, None, None, None,
    ]


def test_d6_scan_branches():
    rows = [
        (0, "The Great Gatsby", "10.0", 3),
        (1, "The Great Gatsby", "10.0", 3),   # exact triple
        (2, "The Great Gatsby", "12.0", 3),   # same title, diff price ->
                                              #   containment fires instead
        (3, "great gatsby", "9.0", 1),        # shorter-in-longer, lowercase
        (4, "", "1.0", 1),                    # empty title bypasses block
        (5, "Moby Dick", "8.0", 5),
        (6, "Solaris", "7.0", 2),
    ]
    out = DE._run_d6(rows, ring_size=50)
    assert [r[4] for r in out] == [
        None, "exact", "contain", "contain", None, None, None,
    ]


def test_d6_dups_never_enter_ring_and_ring_evicts():
    # ring_size=1: after B enters, A is evicted; a repeat of A is kept
    rows = [
        (0, "Alpha", "1", 1),
        (1, "Alpha", "1", 1),   # exact dup -> NOT added to ring
        (2, "Beta", "2", 2),    # ring [Alpha] -> append Beta -> pop Alpha
        (3, "Alpha", "1", 1),   # vs ring [Beta] -> kept
    ]
    out = DE._run_d6(rows, ring_size=1)
    assert [r[4] for r in out] == [None, "exact", None, None]


def test_d6_equal_length_titles_contain():
    # equal lengths: shorter=new, longer=recent; equal lowercased -> dup
    out = DE._run_d6([(0, "AbC", "1", 1), (1, "aBc", "2", 2)], ring_size=50)
    assert [r[4] for r in out] == [None, "contain"]


# ------------------------------------------------------------ spark plumbing


@pytest.fixture(scope="module")
def url_stream(spark):
    urls = [
        (0, "http://h/catalogue/alpha_1.html"),
        (1, "http://h/catalogue/ALPHA_1.html"),
        (2, "http://h/catalogue/alpha_9.html"),
        (3, "http://h/page-a"),
        (4, "http://h/page-a/"),
        (5, "http://h/page-b"),
    ]
    return spark.createDataFrame(urls, "seq BIGINT, url STRING")


def test_emulated_url_dedup_single_worker(spark, url_stream):
    got = {
        r["seq"]: r["dup_kind"]
        for r in DE.emulated_url_dedup(url_stream, n_workers=1).collect()
    }
    # seq 1 is 'slug' not 'exact': the slug scan precedes the set probe
    assert got == {0: None, 1: "slug", 2: "slug", 3: None, 4: "exact", 5: None}


def test_emulated_url_dedup_worker_isolation(spark, url_stream):
    # round-robin split: seqs {0,2,4} -> worker 0, {1,3,5} -> worker 1.
    # worker 1 never saw alpha_1 (seq 0), so seq 1 is first-seen there;
    # seq 4 (page-a/) is first-seen on worker 0 because its twin seq 3
    # went to worker 1 — per-worker state isolation made visible.
    rows = DE.emulated_url_dedup(url_stream, n_workers=2).collect()
    got = {r["seq"]: (r["worker"], r["dup_kind"]) for r in rows}
    assert got == {
        0: (0, None),
        2: (0, "slug"),
        4: (0, None),
        1: (1, None),
        3: (1, None),
        5: (1, None),
    }


def test_emulated_url_dedup_matches_exact_dedup_when_gates_off(spark):
    # no catalogue URLs + huge cap -> D5/D7 silent; the scan must agree
    # with plain canonical-set dedup
    urls = [(i, f"http://h/p{i % 4}") for i in range(16)]
    df = spark.createDataFrame(urls, "seq BIGINT, url STRING")
    rows = DE.emulated_url_dedup(df, n_workers=1).collect()
    seen: set[str] = set()
    for r in sorted(rows, key=lambda r: r["seq"]):
        expect = "exact" if r["canonical"] in seen else None
        seen.add(r["canonical"])
        assert r["dup_kind"] == expect


def test_emulated_book_ring_spark(spark):
    books = [
        (0, "The Great Gatsby", "10.0", 3),
        (1, "The Great Gatsby", "10.0", 3),
        (2, "great gatsby", "9.0", 1),
        (3, "Moby Dick", "8.0", 5),
    ]
    df = spark.createDataFrame(
        books, "seq BIGINT, title STRING, price STRING, rating INT"
    )
    got = {
        r["seq"]: r["dup_kind"]
        for r in DE.emulated_recent_book_dedup(df, n_workers=1).collect()
    }
    assert got == {0: None, 1: "exact", 2: "contain", 3: None}


def test_driver_fixture_not_vacuous_and_matches_golden(spark):
    # the driver-gate fixture must exercise every branch on BOTH workers,
    # and the engine must agree row-for-row with the independent
    # global-interleave twin that feeds the golden-constant oracle
    import __spark_entry__ as E

    url_df = spark.createDataFrame(
        E._emu_url_fixture(), "seq BIGINT, url STRING"
    )
    got = {
        r["seq"]: (r["worker"], r["url"], r["canonical"], r["dup_kind"])
        for r in DE.emulated_url_dedup(
            url_df, n_workers=2, max_processed=4, seed_url=E._EMU_SEED
        ).collect()
    }
    golden = {s: (w, u, c, k) for w, s, u, c, k in E._emu_url_golden()}
    assert got == golden
    kinds_by_worker = {
        w: {k for (w2, _, _, k) in golden.values() if w2 == w}
        for w in (0, 1)
    }
    assert kinds_by_worker[0] >= {None, "exact", "slug"}
    assert kinds_by_worker[1] >= {None, "exact", "slug"}

    book_df = spark.createDataFrame(
        E._emu_book_fixture(),
        "seq BIGINT, title STRING, price STRING, rating INT",
    )
    got_b = {
        r["seq"]: (r["worker"], r["title"], r["price"], r["rating"],
                   r["dup_kind"])
        for r in DE.emulated_recent_book_dedup(
            book_df, n_workers=2, ring_size=3
        ).collect()
    }
    golden_b = {
        s: (w, t, p, rr, k) for w, s, t, p, rr, k in E._emu_ring_golden()
    }
    assert got_b == golden_b
    all_kinds = {k for (_, _, _, _, k) in golden_b.values()}
    assert all_kinds >= {None, "exact", "contain"}


def test_emulation_single_shuffle_plan(spark, url_stream):
    # one Exchange (the worker groupBy) and a FlatMapGroupsInPandas —
    # parallel across workers, sequential within, like the reference fleet
    plan = DE.emulated_url_dedup(url_stream, n_workers=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan
