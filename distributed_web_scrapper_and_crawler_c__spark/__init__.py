"""PySpark-native batch URL-frontier engine.

A brand-new Spark-first reimplementation of the observable semantics of the
reference C++ distributed crawler (``/root/reference``): crawl ordering,
URL-seen set, and byte-identical extracted fields per URL — expressed as
DataFrame plans over a ``pages(url, warc_ts, html, text, lang)`` table,
plus the training-data-pipeline operators (dedup, similarity, text stats)
a 100 TB corpus build needs.

Layout:
    functions/   byte-exact parser kernels (pure-Python oracle + pandas UDFs
                 + Catalyst expression forms)
    sources/     synthetic page-store generator, table-format adapter, sinks
    operators/   dedup, similarity search, text analysis, multimodal plumbing
    plans/       frontier engine: round planning, seq assignment, budgets,
                 Bloom seen-set, checkpoint/resume
    oracle/      single-threaded Python crawl oracle (golden semantics)
    streaming/   foreachBatch round wrapper
"""

__version__ = "0.1.0"
