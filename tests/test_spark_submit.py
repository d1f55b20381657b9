"""The north rule's deployment shape, literally: package the engine as a
zip, ship it with ``spark-submit --py-files`` to a multi-executor master
(local-cluster: separate executor JVMs), run a crawl, and check the
result against the pure-Python crawl oracle. The scaling harness uses the
PYTHONPATH equivalent for speed; this test pins the real submit path."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "distributed_web_scrapper_and_crawler_c__spark"

DRIVER = """
import json
import sys

from pyspark.sql import SparkSession

from {pkg}.oracle import crawl_oracle
from {pkg}.plans.frontier import CrawlEngine
from {pkg}.sources import sitegen

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
pages = sitegen.pages_dataframe(spark, spec, slices=2)
eng = CrawlEngine(spark, pages, num_partitions=2).run("/catalogue/page-1.html")
books = [r["title"] for r in eng.items.orderBy("item_seq").collect()]
print("RESULT " + json.dumps({{
    "pages_crawled": eng.pages_crawled,
    "rounds": eng.round_num,
    "n_executors": spark.sparkContext.getConf().get("spark.executor.instances",
                                                    "n/a"),
    "books": books,
}}))
"""


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_local_cluster(tmp_path):
    # package the engine exactly as a cluster deploy would
    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in (REPO / PKG).rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER.format(pkg=PKG))

    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # run from tmp_path so the engine can ONLY come from --py-files
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,1,1024]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(driver),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")
    )
    got = json.loads(line[len("RESULT "):])

    # oracle ground truth for the same seeded site
    sys.path.insert(0, str(REPO))
    from distributed_web_scrapper_and_crawler_c__spark.oracle import (
        crawl_oracle,
    )
    from distributed_web_scrapper_and_crawler_c__spark.sources import sitegen

    spec = sitegen.SiteSpec(n_books=12, n_categories=2, books_per_page=6)
    res = crawl_oracle.crawl(sitegen.pages_dict(spec))
    assert got["pages_crawled"] == res.pages_crawled
    assert got["rounds"] == res.rounds
    assert got["books"] == [b.title for b in res.books]
