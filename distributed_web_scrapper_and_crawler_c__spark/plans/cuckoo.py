"""Cuckoo-filter URL-seen pre-filter — the deletable twin of plans/bloom.

Same role as the Bloom filter (north-star: "bloom/cuckoo URL-seen"): an
approximate pre-filter ahead of the exact seen anti-join. Probe misses are
*definitely new* and skip the exact join; probe hits (true dups + a ~1.2e-4
false-positive fraction at 16-bit fingerprints) go through the exact
anti-join, so exactness is preserved either way.

What the cuckoo filter adds over Bloom is DELETION (Fan, Andersen,
Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014): ``add_seed`` force-requeue (reference ``server.cpp:790-812``)
removes a URL from the seen-set, and a Bloom bitmap cannot un-set its bits
(the engine documents the resulting stale positive); the cuckoo filter
removes the fingerprint copy, so the filter stays tight across requeues.

Layout (standard partial-key cuckoo hashing):
 - ``n_buckets`` (power of two) buckets x 4 slots of 16-bit fingerprints;
   0 = empty, fingerprints are forced into [1, 0xFFFF].
 - fp    = xxhash64(key, seed=3) mod 0xFFFF + 1        (JVM-side hash)
 - i1    = xxhash64(key, seed=4) & (n_buckets - 1)     (JVM-side hash)
 - i2    = i1 XOR ((fp * 0x5bd1e995) & (n_buckets - 1))
   so either index is recoverable from the other plus the fingerprint —
   that is what makes eviction (and deletion) possible without the key.

Deletion safety: inserts keep MULTISET semantics (a fingerprint copy per
inserted key, never deduplicated), and the engine inserts each canonical
URL exactly once (the seen-set is distinct). Deleting a key removes one
copy; any other key colliding on (fp, bucket pair) still has its own copy,
so deletion can never create a false negative for a still-seen URL.

Two physical layouts mirroring plans/bloom: a driver-held table broadcast
to a pandas UDF below the shard threshold, and a sharded
``(shard int, table binary)`` DataFrame above it, probed/updated via
cogroup ``applyInPandas`` so no table is ever broadcast and per-task
memory is capacity/S. All key hashing stays JVM-side ``xxhash64``; the
Python side only does vectorized numpy over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
FP_SEED = 3   # xxhash64 seed for the fingerprint base
IX_SEED = 4   # xxhash64 seed for the primary bucket index
_ALT_MULT = np.uint64(0x5BD1E995)  # MurmurHash2 multiplier (public constant)

N_SHARDS = 64
SHARD_SCHEMA = "shard int, table binary"


class CuckooCapacityError(RuntimeError):
    """Insert failed after the kick budget — the table is over capacity.

    The engine sizes tables for load <= 0.5 and rebuilds before the load
    crosses it, so this is a loud invariant failure, not a recoverable
    condition."""


def next_pow2_buckets(n_keys: int) -> int:
    """Buckets for ``n_keys`` at load <= 0.5: 4 slots/bucket, 2x headroom."""
    need = max(1, (n_keys + SLOTS - 1) // 2)  # slots/2 buckets => load 0.5
    return 1 << max(4, (need - 1).bit_length())


def capacity(n_buckets: int) -> int:
    return n_buckets * SLOTS


def hash_cols(col: str) -> list:
    """The two JVM-side probe bases (fingerprint base, index base)."""
    return [
        F.xxhash64(F.col(col), F.lit(FP_SEED)).alias("hfp"),
        F.xxhash64(F.col(col), F.lit(IX_SEED)).alias("hix"),
    ]


def _fp_i1(hfp: np.ndarray, hix: np.ndarray, n_buckets: int):
    """(fingerprint uint16 in [1,0xFFFF], primary bucket index) from the
    two signed-int64 xxhash64 bases."""
    fp = (hfp.astype(np.int64).view(np.uint64) % np.uint64(0xFFFF)).astype(
        np.uint64
    ) + np.uint64(1)
    i1 = hix.astype(np.int64).view(np.uint64) & np.uint64(n_buckets - 1)
    return fp.astype(np.uint16), i1.astype(np.int64)


def _alt_index(fp: np.ndarray, idx: np.ndarray, n_buckets: int) -> np.ndarray:
    mask = np.uint64(n_buckets - 1)
    scr = (fp.astype(np.uint64) * _ALT_MULT) & mask
    return (idx.astype(np.uint64) ^ scr).astype(np.int64)


def new_table(n_buckets: int) -> np.ndarray:
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def _compact_buckets(table: np.ndarray, buckets: np.ndarray) -> None:
    """Shift nonzero fingerprints left in the given buckets so the
    insert fast path's slot = count_nonzero invariant holds after holes
    are poked by deletion."""
    for b in np.unique(buckets):
        row = table[b]
        nz = row[row != 0]
        row[: len(nz)] = nz
        row[len(nz):] = 0


def _place(table: np.ndarray, fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """Vectorized one-choice placement: append each fp to its bucket if a
    free slot remains (empties are packed right, so slot = used + rank).
    Returns a placed-mask aligned with ``fps``."""
    n = len(fps)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    bs = buckets[order]
    # rank of each row within its equal-bucket run
    firsts = np.zeros(n, dtype=np.int64)
    if n > 1:
        newgrp = np.nonzero(np.diff(bs))[0] + 1
        firsts[newgrp] = newgrp
    starts = np.maximum.accumulate(firsts)
    rank = np.arange(n, dtype=np.int64) - starts
    used = np.count_nonzero(table[bs], axis=1)
    can = rank < (SLOTS - used)
    table[bs[can], (used + rank)[can]] = fps[order][can]
    placed = np.zeros(n, dtype=bool)
    placed[order[can]] = True
    return placed


def bulk_insert(
    table: np.ndarray, fp: np.ndarray, i1: np.ndarray, max_kicks: int = 500
) -> None:
    """Insert all (fp, i1) keys into ``table`` in place. Two vectorized
    passes (primary bucket, then alternate) place almost everything at the
    engine's <= 0.5 load; the residue runs the standard per-key eviction
    loop with a deterministic victim slot (kick count mod 4)."""
    n_buckets = table.shape[0]
    i2 = _alt_index(fp, i1, n_buckets)
    rem = np.arange(len(fp), dtype=np.int64)
    for idx in (i1, i2):
        if rem.size == 0:
            return
        placed = _place(table, fp[rem], idx[rem])
        rem = rem[~placed]
    for j in rem:
        f = np.uint16(fp[j])
        b = int(i1[j])
        for kick in range(max_kicks):
            row = table[b]
            used = int(np.count_nonzero(row))
            if used < SLOTS:
                table[b, used] = f
                break
            s = kick % SLOTS
            f, table[b, s] = row[s], f
            b = int(_alt_index(np.array([f]), np.array([b]), n_buckets)[0])
        else:
            raise CuckooCapacityError(
                f"cuckoo insert failed after {max_kicks} kicks at "
                f"{np.count_nonzero(table)}/{table.size} slots"
            )


def bulk_probe(table: np.ndarray, fp: np.ndarray, i1: np.ndarray) -> np.ndarray:
    """True = possibly seen (goes to the exact anti-join); False only if
    definitely new."""
    if len(fp) == 0:
        return np.zeros(0, dtype=bool)
    i2 = _alt_index(fp, i1, table.shape[0])
    hit1 = (table[i1] == fp[:, None]).any(axis=1)
    hit2 = (table[i2] == fp[:, None]).any(axis=1)
    return hit1 | hit2


def bulk_delete(table: np.ndarray, fp: np.ndarray, i1: np.ndarray) -> int:
    """Remove ONE fingerprint copy per key (multiset semantics); buckets
    touched are re-compacted. Returns the number of copies removed."""
    n_buckets = table.shape[0]
    i2 = _alt_index(fp, i1, n_buckets)
    touched = []
    removed = 0
    for j in range(len(fp)):
        f = fp[j]
        for b in (int(i1[j]), int(i2[j])):
            s = np.nonzero(table[b] == f)[0]
            if s.size:
                table[b, s[0]] = 0
                touched.append(b)
                removed += 1
                break
    if touched:
        _compact_buckets(table, np.asarray(touched))
    return removed


# ---------------------------------------------------------------------------
# driver-held layout (< shard threshold): one table, broadcast probe UDF
# ---------------------------------------------------------------------------


def _collect_hashes(df: DataFrame, col: str):
    pdf = df.select(*hash_cols(col)).toPandas()
    return pdf["hfp"].to_numpy(), pdf["hix"].to_numpy()


def cuckoo_local(df: DataFrame, col: str, n_buckets: int) -> np.ndarray:
    """Driver-side table build/increment source: collect only the two
    xxhash64 bases (16 bytes/row, Arrow transfer) and insert with numpy —
    the same shape as ``bloom.bloom_bits_local``."""
    table = new_table(n_buckets)
    hfp, hix = _collect_hashes(df, col)
    if len(hfp):
        fp, i1 = _fp_i1(hfp, hix, n_buckets)
        bulk_insert(table, fp, i1)
    return table


def insert_local(table: np.ndarray, df: DataFrame, col: str) -> None:
    hfp, hix = _collect_hashes(df, col)
    if len(hfp):
        fp, i1 = _fp_i1(hfp, hix, table.shape[0])
        bulk_insert(table, fp, i1)


def delete_local(table: np.ndarray, df: DataFrame, col: str) -> int:
    hfp, hix = _collect_hashes(df, col)
    if not len(hfp):
        return 0
    fp, i1 = _fp_i1(hfp, hix, table.shape[0])
    return bulk_delete(table, fp, i1)


def maybe_seen_col(spark, table_bytes: bytes, n_buckets: int):
    """(hfp_col, hix_col) -> boolean Column; True = possibly seen."""
    bc = spark.sparkContext.broadcast(
        np.frombuffer(table_bytes, dtype=np.uint16).reshape(n_buckets, SLOTS)
    )

    @F.pandas_udf("boolean")
    def probe(hfp: pd.Series, hix: pd.Series) -> pd.Series:
        if len(hfp) == 0:
            return pd.Series([], dtype=bool)
        fp, i1 = _fp_i1(hfp.to_numpy(), hix.to_numpy(), n_buckets)
        return pd.Series(bulk_probe(bc.value, fp, i1))

    return probe


# ---------------------------------------------------------------------------
# sharded layout (the >= 10^9-keys path): table state is a DataFrame,
# probe/insert/delete are cogroups — nothing broadcast, per-task memory
# is capacity/S. Shard key reuses the Bloom module's independent seed-2
# hash so placement is uncorrelated with seeds 3/4.
# ---------------------------------------------------------------------------

from . import bloom as _BL  # noqa: E402  (shard_col only)

shard_col = _BL.shard_col


def _hashed(df: DataFrame, col: str, n_shards: int) -> DataFrame:
    return df.select(
        shard_col(col, n_shards).alias("shard"), *hash_cols(col)
    )


def build_shard_tables(
    df: DataFrame, col: str, n_buckets: int, n_shards: int = N_SHARDS
) -> DataFrame:
    """(shard, table) rows over ``df[col]``; ``n_buckets`` is PER-SHARD.
    One shuffle on the shard key; each group bulk-inserts with numpy.
    Shards with no keys emit no row (probe treats a missing shard as
    all-definitely-new)."""
    def mk(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        table = new_table(n_buckets)
        fp, i1 = _fp_i1(
            pdf["hfp"].to_numpy(), pdf["hix"].to_numpy(), n_buckets
        )
        bulk_insert(table, fp, i1)
        return pd.DataFrame({"shard": [int(key[0])], "table": [table.tobytes()]})

    return _hashed(df, col, n_shards).groupBy("shard").applyInPandas(
        mk, SHARD_SCHEMA
    )


def _shard_update(
    state: DataFrame,
    df: DataFrame,
    col: str,
    n_buckets: int,
    n_shards: int,
    delete: bool,
) -> DataFrame:
    """(state shard table) + (this round's keys) -> updated shard table.
    Shards with no new keys pass through unchanged; shards with keys but no
    table yet start empty. One shuffle on the shard key — the same exchange
    the probe already pays.

    Implemented as UNION + groupBy.applyInPandas, deliberately NOT a
    cogroup: Catalyst's size-only estimate survives ``localCheckpoint``
    (the LogicalRDD leaf carries the origin plan's stats over) and a
    binary node's default estimate is the PRODUCT of its children — a
    cogroup that folds state back into itself therefore SQUARES the
    estimate every round, and after ~20 rounds the driver OOMs just
    computing the gigabit-wide BigInteger. Union children ADD instead, so
    the estimate grows linearly with rounds. State rows travel with
    ``hfp = hix = 0`` (never read) rather than NULL so the hash columns
    stay exact int64 through Arrow — a nullable int64 would reach pandas
    as float64 and corrupt 63-bit hashes."""
    keys = _hashed(df, col, n_shards).withColumn(
        "table", F.lit(None).cast("binary")
    )
    st = state.select(
        "shard",
        F.lit(0).cast("long").alias("hfp"),
        F.lit(0).cast("long").alias("hix"),
        "table",
    )
    both = st.unionByName(keys.select("shard", "hfp", "hix", "table"))

    def upd(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        has_tbl = pdf["table"].notna()
        krows = pdf[~has_tbl]
        tbl = pdf[has_tbl]
        if len(tbl):
            table = np.frombuffer(
                tbl["table"].iloc[0], dtype=np.uint16
            ).reshape(n_buckets, SLOTS)
            if len(krows) == 0:  # no keys for this shard: passthrough
                return pd.DataFrame(
                    {"shard": [shard], "table": [tbl["table"].iloc[0]]}
                )
            table = table.copy()
        else:
            table = new_table(n_buckets)
        fp, i1 = _fp_i1(
            krows["hfp"].to_numpy(), krows["hix"].to_numpy(), n_buckets
        )
        if delete:
            bulk_delete(table, fp, i1)
        else:
            bulk_insert(table, fp, i1)
        return pd.DataFrame({"shard": [shard], "table": [table.tobytes()]})

    return both.groupBy("shard").applyInPandas(upd, SHARD_SCHEMA)


def insert_shard_tables(
    state: DataFrame, df: DataFrame, col: str, n_buckets: int,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    return _shard_update(state, df, col, n_buckets, n_shards, delete=False)


def delete_shard_tables(
    state: DataFrame, df: DataFrame, col: str, n_buckets: int,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    return _shard_update(state, df, col, n_buckets, n_shards, delete=True)


def probe_sharded(
    cand: DataFrame,
    shards: DataFrame,
    col: str,
    n_buckets: int,
    n_shards: int = N_SHARDS,
    out_col: str = "_maybe",
) -> DataFrame:
    """``cand`` + boolean ``out_col`` (True = possibly seen). Cogroup on
    the shard key: each task sees one shard's candidates and that shard's
    single table row — no broadcast of any table."""
    keyed = (
        cand.withColumn("_shard", shard_col(col, n_shards))
        .withColumn("_hfp", F.xxhash64(F.col(col), F.lit(FP_SEED)))
        .withColumn("_hix", F.xxhash64(F.col(col), F.lit(IX_SEED)))
    )
    out_schema = cand.schema.add(out_col, "boolean")
    out_cols = [f.name for f in out_schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=out_cols)
        out = left.drop(columns=["_shard", "_hfp", "_hix"])
        if len(right) == 0:
            out[out_col] = False
            return out[out_cols]
        table = np.frombuffer(
            right["table"].iloc[0], dtype=np.uint16
        ).reshape(n_buckets, SLOTS)
        fp, i1 = _fp_i1(
            left["_hfp"].to_numpy(), left["_hix"].to_numpy(), n_buckets
        )
        out[out_col] = bulk_probe(table, fp, i1)
        return out[out_cols]

    return (
        keyed.groupBy("_shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )
