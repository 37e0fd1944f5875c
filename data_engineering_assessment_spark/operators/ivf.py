"""IVF (inverted-file) approximate nearest neighbor search.

The second classic ANN scale path next to hyperplane LSH
(operators/similarity.py): a k-means coarse quantizer partitions the
corpus into ``n_clusters`` cells; a query probes only its ``nprobe``
nearest cells and rescores exactly inside them.  Cost drops from
|corpus| to ~|corpus|·nprobe/n_clusters per query; recall is tuned by
nprobe (nprobe = n_clusters is exhaustive and equals brute force —
asserted in tests/test_pipeline.py).

Scale design:
- centroids are tiny driver state (k × dim floats) — Lloyd iterations
  keep ALL row-level work distributed (assignment via one Arrow-batch
  matmul per partition; centroid update is a (cluster, dim-position)
  groupBy-avg, i.e. one bounded shuffle per iteration);
- the search is a hash join corpus.cell == probed cell — candidate
  generation never nested-loops;
- deterministic end-to-end: init picks the k corpus vectors with the
  smallest xxhash64(id) (a seeded "random" sample any engine can
  reproduce), and Lloyd updates are exact averages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.tables import spread
from .similarity import _micro, pd_cosine


def _assign_udf(centroids: np.ndarray):
    """cluster id = argmax of cosine against the centroid matrix."""
    C = centroids.astype(np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def _assign(xs: pd.Series) -> pd.Series:
        A = np.stack(xs.values).astype(np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(An @ Cn.T, axis=1).astype(np.int32))

    return _assign


def train_kmeans(
    corpus: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd's k-means over spherical (cosine) distance;
    returns the (n_clusters × dim) centroid matrix."""
    v = spread(corpus).select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seed_rows = (
        v.withColumn("h", F.xxhash64("id"))
        .orderBy("h")
        .limit(n_clusters)
        .select("vec")
        .collect()
    )
    centroids = np.array([list(r.vec) for r in seed_rows], dtype=np.float64)
    for _ in range(n_iter):
        assigned = v.select("id", "vec", _assign_udf(centroids)("vec").alias("cell"))
        # exact mean per (cell, position): one bounded shuffle
        sums = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for cell, pos_map in by_cell.items():
            for pos, m in pos_map.items():
                new[cell, pos] = m
        if np.allclose(new, centroids, atol=1e-9):
            break
        centroids = new
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 16,
    nprobe: int = 4,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF probing."""
    centroids = train_kmeans(corpus, n_clusters, n_iter, id_col, vec_col)
    assign = _assign_udf(centroids)

    c = spread(corpus).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("cell", assign("c_vec"))

    Cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def _probes(xs: pd.Series) -> pd.Series:
        A = np.stack(xs.values).astype(np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(An @ Cn.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("cell", F.explode(_probes(F.col("q_vec"))))

    cand = c.join(F.broadcast(q), ["cell"]).filter(F.col("q_id") != F.col("c_id"))
    scored = cand.select(
        "q_id", "c_id", pd_cosine("q_vec", "c_vec").alias("cosine")
    ).dropDuplicates(["q_id", "c_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("c_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            _micro("cosine").alias("cosine_micro"),
        )
    )


# Single source of truth for this trainer's sample bound: the IVF-PQ
# composition's shared-sample guard imports it (ADVICE r15 — a literal
# copy there could silently desync from this default, breaking the
# bit-identity the guard promises).
KM_TRAIN_CAP = 4096


def train_kmeans_sampled(
    corpus: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = KM_TRAIN_CAP,
    sample_rows: list | None = None,
    n_total: int | None = None,
) -> np.ndarray:
    """Sample-trained twin of ``train_kmeans``: same spherical
    Lloyd's, same smallest-xxhash seeding, but the iterations run in
    vectorized NumPy over a deterministic hash-sample of ≤
    ``train_cap`` vectors (the pq.py training regime — FAISS
    practice: quantizers need a representative sample, not the
    corpus).  One bounded Spark job total instead of two jobs per
    round; used by the IVF-PQ composition, where BOTH quantizers
    train this way.  ``train_kmeans`` above stays the
    distributed-update variant for the plain IVF index (each design
    is the right one somewhere: distributed updates when the index is
    rebuilt rarely and drift matters, sample training when the build
    itself must be cheap).  ``sample_rows`` (r15) injects a
    pre-collected sample (pq.collect_train_sample semantics) so the
    IVF-PQ composition pays one count+collect for both trainers."""
    if sample_rows is not None:
        rows = sample_rows[:train_cap]
    else:
        from .pq import collect_train_sample

        rows = collect_train_sample(corpus, train_cap, id_col, vec_col, n_total=n_total)
    if len(rows) < n_clusters:
        raise ValueError(f"sample {len(rows)} smaller than n_clusters={n_clusters}")
    X = np.array([list(r.vec) for r in rows], dtype=np.float64)
    centroids = X[:n_clusters].copy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    for _ in range(n_iter):
        Cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        cells = np.argmax(Xn @ Cn.T, axis=1)
        new = centroids.copy()
        for c in np.unique(cells):
            new[c] = X[cells == c].mean(axis=0)
        if np.allclose(new, centroids, atol=1e-9):
            break
        centroids = new
    return centroids
