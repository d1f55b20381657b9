"""Table-format seam for checkpoint/state I/O (SURVEY §4).

The engine's durable state (frontier snapshot, seen/items increments,
Bloom shard table) is written through ONE adapter interface so the storage
format is a deployment choice, not an engine concern. In this sandbox only
the parquet implementation is runnable; on a real cluster the Iceberg
adapter slots in unchanged — the engine's write pattern is already the
Iceberg-append shape (per-round increments + a commit marker, never a
rewrite of history), so the swap buys ACID commits, snapshot time-travel
over rounds, and storage-partitioned joins against the page store without
touching plans/frontier.py.

Reference parity note: the reference keeps all crawl state in memory and
persists nothing until shutdown, when it writes the result CSVs
(server.cpp:583-675; signal path server.cpp:1101-1140) — it has no
checkpoint/resume. This seam is where the Spark engine ADDS durability the
reference lacks (SURVEY §2.5 Q5 reassign-on-loss → resumable rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormatAdapter:
    """Interface: append-shaped snapshot I/O keyed by a location string.

    ``write(df, loc)`` persists a frame whole; ``read(spark, schema, locs)``
    unions one-or-more previously written locations (the engine's
    increment-union on resume). Implementations must be idempotent per
    location (task retries / round re-runs overwrite, never double-append).
    """

    name = "abstract"

    def write(self, df: DataFrame, loc: str) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, schema: str, locs: list[str]) -> DataFrame:
        raise NotImplementedError

    def exists(self, loc: str) -> bool:
        raise NotImplementedError


class ParquetAdapter(TableFormatAdapter):
    """Parquet-directory implementation (the sandbox default): one
    directory per (round, table) snapshot, overwrite-idempotent."""

    name = "parquet"

    def write(self, df: DataFrame, loc: str) -> None:
        df.write.mode("overwrite").parquet(loc)

    def read(self, spark: SparkSession, schema: str, locs: list[str]) -> DataFrame:
        return spark.read.schema(schema).parquet(*locs)

    def exists(self, loc: str) -> bool:
        from pathlib import Path

        return Path(loc).exists()


class IcebergAdapter(TableFormatAdapter):
    """Documented Iceberg slot. Not runnable here (no Iceberg runtime jar in
    the sandbox); on a cluster configure a catalog, e.g.::

        spark.sql.catalog.crawl = org.apache.spark.sql.iceberg.SparkCatalog
        spark.sql.catalog.crawl.type = hadoop
        spark.sql.catalog.crawl.warehouse = <warehouse-uri>

    and ``loc`` becomes a table identifier (``crawl.db.frontier_r3``); write
    maps to ``df.writeTo(loc).createOrReplace()`` and read to
    ``spark.read.table``. The per-round increment layout maps 1:1 onto
    Iceberg appends with the _COMMIT marker replaced by the table commit."""

    name = "iceberg"

    def __init__(self, catalog: str = "crawl"):
        self.catalog = catalog

    def _check(self, spark: SparkSession) -> None:
        if spark.conf.get(f"spark.sql.catalog.{self.catalog}", None) is None:
            raise RuntimeError(
                f"Iceberg catalog '{self.catalog}' is not configured on this "
                f"session (no Iceberg runtime in this sandbox); use "
                f"ParquetAdapter, or configure spark.sql.catalog.{self.catalog}"
            )

    def write(self, df: DataFrame, loc: str) -> None:
        self._check(df.sparkSession)
        df.writeTo(loc).createOrReplace()

    def read(self, spark: SparkSession, schema: str, locs: list[str]) -> DataFrame:
        self._check(spark)
        out = None
        for loc in locs:
            t = spark.read.table(loc)
            out = t if out is None else out.unionByName(t)
        return out

    def exists(self, loc: str) -> bool:
        raise RuntimeError("IcebergAdapter.exists needs a configured catalog")
