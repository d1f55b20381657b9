"""Scalable deterministic global sequence assignment.

The frontier needs a dense, gap-free, globally ordered ``seq`` for every
newly discovered URL (SURVEY §3.1: children are ordered by
``(parent_seq, link_rank)`` and numbered after all existing seqs). A naive
``row_number() OVER (ORDER BY ...)`` collapses everything into ONE partition
— fine at test scale, fatal at 10^10. This module implements the standard
two-phase prefix-sum instead:

1. ``repartitionByRange`` on the order columns (range partitions are emitted
   in sorted order), sort within partitions, pin with ``localCheckpoint`` so
   both passes see identical placement;
2. count rows per partition (a tiny aggregate collected to the driver),
   compute per-partition offsets;
3. ``mapInPandas`` stamps ``seq = offset[pid] + running_row_index``.

Cost: one shuffle + one small collect — no single-partition bottleneck, and
the result is independent of the number of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# below this many rows a single-partition row_number beats the two-phase
# prefix sum (range-partitioner sampling pass + shuffle + offset collect);
# above it the serial numbering task dominates (~30µs/row) while the
# two-phase fixed cost stays ~2s — callers pin their input first, so the
# sampling pass reads checkpointed data, not the UDF pipeline
SMALL_SEQ_ROWS = 100_000


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int = 0,
    seq_col: str = "seq",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Assign ``seq_col`` = start, start+1, ... in ``order_cols`` order.

    ``order_cols`` must be a unique key of ``df`` (ties would make the
    global order ambiguous).

    ``approx_rows`` is a physical-plan hint only (AQE-style size switch):
    when the caller knows the input is small, a plain global-window
    ``row_number`` is used — one shuffle, no sampling pass, no offset
    collect. A wrong hint never changes the assigned sequence, only which
    plan computes it. With no hint (or a large one) the scalable two-phase
    prefix-sum path runs; that path returns a localCheckpoint-pinned frame.
    """
    import pandas as pd

    if approx_rows is not None and approx_rows < SMALL_SEQ_ROWS:
        from pyspark.sql import Window

        w = Window.orderBy(*order_cols)
        return df.withColumn(
            seq_col, (F.row_number().over(w) - 1 + F.lit(start)).cast("long")
        )

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = parted.drop("_pid").schema.add(seq_col, "long")
    cols = [f.name for f in schema.fields]

    # offsets ride in the pickled closure, NOT a sc.broadcast: the Python
    # Broadcast wrapper would die with this frame while the returned plan
    # is still lazy, and the ContextCleaner can then remove the broadcast
    # before the caller materializes ("Block broadcast_N does not exist").
    # The dict is ≤ num_partitions entries — closure capture is free.
    def stamp(batches):
        seen = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid] + seen
            out = pdf.drop(columns=["_pid"])
            out[seq_col] = range(base, base + len(pdf))
            seen += len(pdf)
            yield pd.DataFrame(out, columns=cols)

    return parted.mapInPandas(stamp, schema)


def with_global_seq_bucketed(
    df: DataFrame,
    order_cols: list[str],
    bucket_expr,
    n_buckets: int,
    start: int = 0,
    seq_col: str = "seq",
    n_partitions: int | None = None,
):
    """Scale-path twin of :func:`with_global_seq` for callers that can name
    an explicit ORDER-ALIGNED bucket expression (values in [0, n_buckets),
    monotone non-decreasing in ``order_cols`` order — e.g. a range bucket
    over ``parent_seq``, whose bounds the engine already holds from the
    round's stats agg).

    Why it exists: ``repartitionByRange`` SAMPLES its input to pick range
    boundaries — a full extra execution of the upstream plan — which forces
    callers to pre-pin UDF-heavy inputs (one whole extra materialization
    per round). An explicit bucket needs no sampling: one hash shuffle on
    the bucket id (a bucket lands wholly in one partition; use more buckets
    than partitions — several per partition — to smooth the hash placement),
    sort within partitions on (bucket, order), pin ONCE, per-bucket counts
    → offsets, stamp. The bucket only shapes the physical partitioning; the
    assigned sequence is identical to :func:`with_global_seq` for any valid
    bucket expression (asserted in tests against skewed bucketings).

    Returns ``(stamped_df, total_rows)`` — the total falls out of the
    offsets pass, saving the caller's count job. ``stamped_df`` is a
    mapInPandas over the internally pinned shuffle, NOT itself pinned.
    """
    import pandas as pd

    spark = df.sparkSession
    parted = (
        df.withColumn("_bkt", bucket_expr.cast("int"))
        .repartition(n_partitions or n_buckets, F.col("_bkt"))
        .sortWithinPartitions("_bkt", *order_cols)
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_bkt"]: r["cnt"]
        for r in parted.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = start
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    total = acc - start

    schema = parted.drop("_bkt").schema.add(seq_col, "long")
    cols = [f.name for f in schema.fields]

    # closure-captured offsets, not sc.broadcast — same lifetime rationale
    # as in with_global_seq: the wrapper dying with this frame lets the
    # ContextCleaner race the caller's eager pin. ≤ n_buckets entries.
    def stamp(batches):
        carried: dict = {}  # bucket -> rows already stamped this partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.drop(columns=["_bkt"])
            local = pdf.groupby("_bkt", sort=False).cumcount().to_numpy()
            base = {
                int(b): offsets[int(b)] + carried.get(int(b), 0)
                for b in pdf["_bkt"].unique()
            }
            out[seq_col] = (
                pdf["_bkt"].map(base).to_numpy(dtype="int64") + local
            )
            for b, c in pdf.groupby("_bkt", sort=False).size().items():
                carried[int(b)] = carried.get(int(b), 0) + int(c)
            yield pd.DataFrame(out, columns=cols)

    return parted.mapInPandas(stamp, schema), total


def with_global_seq_known_counts(
    df: DataFrame,
    order_cols: list[str],
    bucket_expr,
    bucket_counts: dict[int, int],
    start: int = 0,
    seq_col: str = "seq",
    n_partitions: int | None = None,
) -> DataFrame:
    """Zero-materialization twin of :func:`with_global_seq_bucketed` for
    callers that ALREADY KNOW the per-bucket row counts (e.g. from a narrow
    side-channel aggregation over the same logical rows — the books plan
    derives survivor counts per bucket from a 3-column pass before the wide
    rows ever shuffle).

    Both other seq paths must pin their shuffle so the offsets pass and the
    stamp pass see identical data; with the counts supplied, the pin and the
    counts job disappear — the caller gets a LAZY stamped frame (one hash
    shuffle on the bucket id + in-partition sort + mapInPandas) and decides
    itself where to materialize. Same contract as the bucketed twin:
    ``bucket_expr`` values in [0, n_buckets-ish), monotone non-decreasing in
    ``order_cols`` order, each bucket wholly in one partition (hash
    placement); ``order_cols`` a unique key. ``bucket_counts`` MUST be the
    exact per-bucket cardinalities of ``df`` — a mismatch misnumbers rows,
    so callers derive both from one narrow plan and keep goldens over the
    result (tests assert equality with :func:`with_global_seq` under dups,
    skew, and adversarial bucketings).
    """
    import pandas as pd

    offsets: dict[int, int] = {}
    acc = start
    for b in sorted(bucket_counts):
        offsets[b] = acc
        acc += bucket_counts[b]

    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.withColumn("_bkt", bucket_expr.cast("int"))
        .repartition(n, F.col("_bkt"))
        .sortWithinPartitions("_bkt", *order_cols)
    )
    schema = parted.drop("_bkt").schema.add(seq_col, "long")
    cols = [f.name for f in schema.fields]

    # closure-captured offsets, not sc.broadcast — same lifetime rationale
    # as the other stamps. ≤ n_buckets entries.
    def stamp(batches):
        carried: dict = {}  # bucket -> rows already stamped this partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.drop(columns=["_bkt"])
            local = pdf.groupby("_bkt", sort=False).cumcount().to_numpy()
            base = {
                int(b): offsets[int(b)] + carried.get(int(b), 0)
                for b in pdf["_bkt"].unique()
            }
            out[seq_col] = (
                pdf["_bkt"].map(base).to_numpy(dtype="int64") + local
            )
            for b, c in pdf.groupby("_bkt", sort=False).size().items():
                carried[int(b)] = carried.get(int(b), 0) + int(c)
            yield pd.DataFrame(out, columns=cols)

    return parted.mapInPandas(stamp, schema)


def range_bucket_expr(col: str, lo: int, hi: int, n_buckets: int):
    """[0, n_buckets) bucket of ``col`` over the known value range
    [lo, hi] — the order-aligned bucket for :func:`with_global_seq_bucketed`
    when the leading order column's bounds are already in hand."""
    span = max(int(hi) - int(lo) + 1, 1)
    return F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(col) - F.lit(int(lo))) * n_buckets / F.lit(span)),
    )


def with_grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    rank_col: str = "_grk",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """``rank_col`` = 1-based rank of the row within its ``group_col`` group
    in ``order_cols`` order — the per-host politeness rank (Q2/Q8) without a
    per-group window: ``Window.partitionBy(host)`` puts a mega-host's ENTIRE
    frontier in one task, which on a single-host workload degenerates into a
    global single-partition sort. Instead the same two-phase machinery as
    :func:`with_global_seq`, generalized to grouped keys:

    1. range-partition on ``(group, *order)`` + sort within partitions (a
       group therefore occupies a contiguous run of partitions);
    2. per-(partition, group) counts — but only groups that SPAN a partition
       boundary need cross-partition offsets, and a range partitioning can
       split at most one group per boundary, so the driver collects at most
       ``2 * num_partitions`` rows no matter how many groups exist;
    3. ``mapInPandas`` stamps rank = broadcast offset + local running count.

    ``(group_col, *order_cols)`` must be a unique key. ``approx_rows`` is the
    same physical-plan-only size hint as in :func:`with_global_seq`: small
    inputs take the one-shuffle per-group window fallback, identical values
    either way.
    """
    import pandas as pd

    if approx_rows is not None and approx_rows < SMALL_SEQ_ROWS:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(*order_cols)
        return df.withColumn(rank_col, F.row_number().over(w).cast("long"))

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(
            n, F.col(group_col), *[F.col(c) for c in order_cols]
        )
        .sortWithinPartitions(group_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_pid", group_col).agg(F.count("*").alias("cnt"))
    spanning = (
        counts.groupBy(group_col)
        .agg(F.count("*").alias("n_pids"))
        .filter(F.col("n_pids") > 1)
        .select(group_col)
    )
    boundary = (
        counts.join(spanning, group_col, "left_semi")
        .select("_pid", group_col, "cnt")
        .collect()
    )
    # exclusive per-group offset for each (pid, group) of a spanning group;
    # groups contained in one partition are absent → offset 0
    by_group: dict = {}
    for r in boundary:
        by_group.setdefault(r[group_col], []).append((r["_pid"], r["cnt"]))
    offsets: dict = {}
    for g, lst in by_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            offsets[(pid, g)] = acc
            acc += cnt

    schema = parted.drop("_pid").schema.add(rank_col, "long")
    cols = [f.name for f in schema.fields]

    # closure-captured offsets (≤ 2·num_partitions boundary entries), not
    # sc.broadcast — the wrapper dying with this frame would let the
    # ContextCleaner remove the broadcast before the caller materializes
    def stamp(batches):
        pid = None
        carried: dict = {}  # group -> rows already stamped in this partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            out = pdf.drop(columns=["_pid"])
            local = out.groupby(group_col, sort=False).cumcount().to_numpy()
            # per-GROUP base lookup (distinct groups per batch, not per row)
            comb = {
                g: offsets.get((pid, g), 0) + carried.get(g, 0)
                for g in out[group_col].unique()
            }
            base = out[group_col].map(comb).to_numpy(dtype="int64")
            out[rank_col] = base + local + 1
            for g, c in out.groupby(group_col, sort=False).size().items():
                carried[g] = carried.get(g, 0) + int(c)
            yield pd.DataFrame(out, columns=cols)

    return parted.mapInPandas(stamp, schema)


def with_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "_before",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """``out_col`` = exclusive running sum of ``value_col`` in ``order_cols``
    order (sum over all strictly-earlier rows; 0 for the first row).

    Same two-phase shape as :func:`with_global_seq` — range-partition on the
    order key, per-partition totals collected to the driver, offsets
    broadcast, exclusive cumsum stamped per partition — so there is never a
    single-partition global window. ``order_cols`` must be a unique key.
    ``approx_rows`` is the same physical-plan-only hint: small inputs take a
    one-shuffle window plan (the size-gated fallback), large inputs the
    scalable path; the computed values are identical either way.
    """
    import pandas as pd

    if approx_rows is not None and approx_rows < SMALL_SEQ_ROWS:
        from pyspark.sql import Window

        # small-input fallback (size-gated): single-partition window is
        # cheaper than the sampling pass below under SMALL_SEQ_ROWS rows
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return df.withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long"),
        )

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["_pid"]: r["s"]
        for r in parted.groupBy("_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    schema = parted.drop("_pid").schema.add(out_col, "long")
    cols = [f.name for f in schema.fields]

    # closure-captured offsets (≤ num_partitions entries), not sc.broadcast
    # — same ContextCleaner-lifetime rationale as the other stamp closures
    def stamp(batches):
        carried = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            vals = pdf[value_col].to_numpy()
            out = pdf.drop(columns=["_pid"])
            out[out_col] = offsets[pid] + carried + vals.cumsum() - vals
            carried += int(vals.sum())
            yield pd.DataFrame(out, columns=cols)

    return parted.mapInPandas(stamp, schema)
