"""CSV sink shape tests vs the reference writers.

save_to_csv (main.cpp:18-46): header Title,Price,Rating,URL; every field
quoted; embedded '"' doubled. saveCollectedItems (server.cpp:612-675):
union schema — type-specific columns appear only when that type exists.
"""

import glob

from distributed_web_scrapper_and_crawler_c__spark.sources.sinks import (
    save_books_csv,
    save_items_csv,
)


def _read_csv(path: str) -> list[str]:
    (part,) = glob.glob(path + "/part-*.csv")
    return open(part).read().splitlines()


def test_books_csv_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (0, 'A "Quoted" Title', "£51.77", "Three", "http://x/a"),
            (1, "Plain", "£10.00", "One", "http://x/b"),
        ],
        "item_seq long, title string, price string, rating string, url string",
    )
    out = str(tmp_path / "books")
    save_books_csv(df, out)
    lines = _read_csv(out)
    assert lines[0] == '"Title","Price","Rating","URL"'
    assert lines[1] == '"A ""Quoted"" Title","£51.77","Three","http://x/a"'
    assert lines[2] == '"Plain","£10.00","One","http://x/b"'


def test_items_csv_union_schema(spark, tmp_path):
    base = "item_seq long, item_type string, title string, price_value double, rating_value int, url string"
    books_only = spark.createDataFrame(
        [(0, "BOOK", "T", 9.99, 3, "http://x")], base
    )
    out1 = str(tmp_path / "items1")
    save_items_csv(books_only, out1)
    hdr1 = _read_csv(out1)[0]
    assert "Company" not in hdr1 and "Brand" not in hdr1

    with_job = spark.createDataFrame(
        [(0, "BOOK", "T", 9.99, 3, "http://x"),
         (1, "JOB", "J", 0.0, 0, "http://y")], base
    )
    out2 = str(tmp_path / "items2")
    save_items_csv(with_job, out2)
    hdr2 = _read_csv(out2)[0]
    # JOB present -> its columns appear (server.cpp:627-639)
    assert "Company" in hdr2 and "Location" in hdr2 and "Salary" in hdr2
    assert "Brand" not in hdr2
