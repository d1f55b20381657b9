"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus with the dot product evaluated JVM-side
(``zip_with`` + ``aggregate``, whole-stage codegen; no Python in the hot
path). Scale path: random-hyperplane LSH bucketing — corpus vectors are
signed against a fixed seeded hyperplane set (vectorized pandas UDF over
Arrow batches), probes hit only their own bucket, turning top-k into a
per-bucket problem (an IVF-style coarse quantizer would slot in the same
way: bucket id = nearest centroid).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..plans.parallelize import local_df, spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids (excluding
    self). Query side is broadcast; ranking is deterministic
    (cosine rounded to 6 places desc, then vec_id asc)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        spread(emb.select("vec_id", "embedding"))
        .join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def brute_force_topk_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
    SELECT q.query_id, e.vec_id,
           round(CAST(list_cosine_similarity(
                 list_transform(q.qv, x -> CAST(x AS DOUBLE)),
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE))
           ) AS DOUBLE), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; verified by recall vs brute force, not SQL)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int | None, n_planes: int = 8, seed: int = 42):
    """``dim=None`` derives the plane matrix lazily from the first batch's
    vector length — _hyperplanes is a pure function of (dim, n_planes,
    seed), so every task materializes the identical matrix and the caller
    saves the one-row dimension-sniff job."""
    state = {"planes": _hyperplanes(dim, n_planes, seed) if dim else None}

    @F.pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        if state["planes"] is None:
            state["planes"] = _hyperplanes(m.shape[1], n_planes, seed)
        signs = (m @ state["planes"].T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket


def lsh_probe_buckets_udf(dim: int | None, n_planes: int = 8, seed: int = 42,
                          n_probes: int = 4):
    """Multi-probe bucket list for the QUERY side: the query's own bucket
    plus the buckets reached by flipping the sign of the ``n_probes - 1``
    hyperplanes with the smallest |margin| (the planes the vector most
    nearly straddles — the standard multi-probe LSH heuristic). A true
    neighbor that landed just across one of those planes is recovered
    without growing the corpus-side index at all. ``dim=None`` derives the
    planes from the first batch (see lsh_bucket_udf)."""
    state = {"planes": _hyperplanes(dim, n_planes, seed) if dim else None}

    @F.pandas_udf(ArrayType(LongType()))
    def probes(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        if state["planes"] is None:
            state["planes"] = _hyperplanes(m.shape[1], n_planes, seed)
        proj = m @ state["planes"].T
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        base = ((proj > 0) @ weights).astype(np.int64)
        # per-row planes sorted by |margin| ascending = flip order
        order = np.argsort(np.abs(proj), axis=1)
        flips = min(max(n_probes - 1, 0), n_planes)
        out = [
            [int(base[i])]
            + [int(base[i] ^ (1 << int(order[i, j]))) for j in range(flips)]
            for i in range(len(base))
        ]
        return pd.Series(out)

    return probes


def lsh_ann_topk(
    emb: DataFrame, dim: int | None, n_queries: int = 5, k: int = 10,
    n_planes: int = 8, seed: int = 42, n_probes: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe buckets
    (its own hyperplane-sign bucket plus the ``n_probes - 1`` lowest-margin
    single-bit flips — multi-probe lifts recall without touching the
    corpus-side layout). Recall < 1 by construction; the accompanying test
    measures it against brute force. At corpus scale the bucket column is
    precomputed and the corpus is partitioned by it, so each probe touches
    one partition and a query costs ``n_probes`` partition reads."""
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    probe = lsh_probe_buckets_udf(dim, n_planes, seed, n_probes)
    tagged = spread(emb.select("vec_id", "embedding")).withColumn(
        "bucket", bucket(F.col("embedding"))
    )
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode(probe(F.col("embedding"))).alias("bucket"),
        )
    )
    cands = (
        tagged.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        # a corpus vector can land in several of a query's probe buckets —
        # dedup BEFORE scoring so the dot product runs once per pair
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF ANN (coarse k-means quantizer; the index-partitioned scale path)
# ---------------------------------------------------------------------------


def ivf_centroids(
    m: np.ndarray, n_cells: int, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Seeded Lloyd's k-means over a (sampled) vector matrix — the coarse
    quantizer. Runs on the DRIVER over a bounded sample: the centroid set
    is index metadata (n_cells × dim floats), like LSH's hyperplanes."""
    rs = np.random.RandomState(seed)
    m = m.astype(np.float64)
    cents = m[rs.choice(len(m), size=min(n_cells, len(m)), replace=False)].copy()
    for _ in range(iters):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(cents)):
            sel = m[assign == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
    return cents


def ivf_cell_udf(cents: np.ndarray):
    """Nearest-centroid cell id per vector (vectorized L2 argmin over the
    broadcast centroid matrix)."""
    c = cents.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    @F.pandas_udf(LongType())
    def cell(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        d = c_sq[None, :] - 2.0 * (m @ c.T)  # ||x||² constant per row
        return pd.Series(d.argmin(axis=1).astype(np.int64))

    return cell


def ivf_ann_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10, n_cells: int = 16,
    n_probe: int = 4, sample: int = 2048, seed: int = 13,
) -> DataFrame:
    """IVF approximate top-k: a coarse k-means quantizer partitions the
    corpus into cells; each query scans only its ``n_probe`` nearest cells.
    The centroids are trained on a bounded deterministic sample (lowest
    vec_ids) collected to the driver; at corpus scale the cell column is
    precomputed and the corpus is laid out partitioned by cell, so a probe
    reads ``n_probe`` partitions — the IVF twin of the LSH bucket layout,
    with data-adapted cells instead of data-oblivious hyperplanes."""
    srows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(sample)
        .collect()
    )
    samp = np.array([r["embedding"] for r in srows], dtype=np.float64)
    cents = ivf_centroids(samp, n_cells, seed=seed)
    cell = ivf_cell_udf(cents)
    tagged = spread(emb.select("vec_id", "embedding")).withColumn(
        "cell", cell(F.col("embedding"))
    )

    # query-side probe list: n_probe nearest centroids, computed on the
    # driver for the (small) query set. The query rows (vec_id < n_queries)
    # sort before everything else in the vec_id-ordered sample, so when the
    # sample provably covers the query range — it holds the whole table, or
    # its last id is already past the range — they come from the SAME
    # collect: one driver job instead of two. Otherwise fall back to the
    # old filter collect (degenerate configs only).
    if len(srows) < sample or (srows and srows[-1]["vec_id"] >= n_queries):
        qrows = [r for r in srows if r["vec_id"] < n_queries]
    else:
        qrows = (
            emb.filter(F.col("vec_id") < n_queries)
            .select("vec_id", "embedding")
            .collect()
        )
    c_sq = (cents * cents).sum(axis=1)
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        d = c_sq - 2.0 * (cents @ qv)
        for cid in np.argsort(d)[: min(n_probe, len(cents))]:
            probe_rows.append((int(r["vec_id"]), list(r["embedding"]), int(cid)))
    q = local_df(
        emb.sparkSession, probe_rows,
        "query_id long, qv array<float>, cell long",
    )

    scored = (
        tagged.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def exact_near_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All-pairs cosine ≥ threshold — the exact baseline the LSH-blocked
    path (:func:`embedding_cosine_near_dups`) is measured against. O(n²)
    nested-loop join: oracle/test scale only; never the 100 TB path."""
    l = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    r = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def exact_near_dup_pairs_sql(threshold: float = 0.95) -> str:
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CAST(list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))
       ) AS DOUBLE), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(CAST(list_cosine_similarity(
          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          list_transform(b.embedding, x -> CAST(x AS DOUBLE))
      ) AS DOUBLE), 6) >= {threshold}
"""


def embedding_cosine_near_dups(emb: DataFrame, threshold: float = 0.95,
                               n_planes: int = 6, seed: int = 7,
                               dim: int | None = None) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, LSH-blocked
    (multi-band: two independent plane sets; a high-cosine pair almost
    surely agrees in at least one). Pass ``dim`` when known (it is index
    metadata, like ``lsh_ann_topk``'s) to skip the one-row sniff job."""
    if dim is None:
        dim = len(emb.select("embedding").first()[0])
    corpus = spread(emb.select("vec_id", "embedding"))
    pairs = None
    for s in (seed, seed + 1):
        bucket = lsh_bucket_udf(dim, n_planes, s)
        tagged = corpus.select(
            "vec_id", "embedding", bucket(F.col("embedding")).alias("bucket")
        )
        l = tagged.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "bucket"
        )
        r = tagged.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "bucket"
        )
        p = l.join(r, "bucket").filter(F.col("id_a") < F.col("id_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b",
            F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
