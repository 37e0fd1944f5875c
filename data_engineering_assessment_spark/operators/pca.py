"""PCA projection over an embedding column.

The reference has no ML-adjacent operators; this is part of the
training-data extension surface (embedding whitening / dimensionality
reduction before clustering or ANN indexing).

Scale design: the fit never moves row-level data to the driver — each
partition emits one (count, sum-vector, Gram-matrix) partial via an
Arrow-batched ``mapInPandas``, the driver combines the
O(partitions × d²) partials (d = 64 here → a few KiB each) and runs a
d×d eigendecomposition locally.  The projection broadcasts the (d, k)
component matrix back and applies it with one vectorized pandas UDF —
the same two-phase shape `spark.ml`'s PCA uses, without dragging in
the MLlib Vector UDT.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Fit PCA; returns (mean (d,), components (d, k), eigvals (k,)).

    Components carry a deterministic sign convention (largest-|entry|
    coordinate is positive) so repeated fits agree up to float
    summation order."""

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).reshape(-1).tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order]  # (d, k)
    vals = eigvals[order]
    # sign convention: make the largest-magnitude entry of each
    # component positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip, vals


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the fitted components (mean-centered).

    The (d, k) matrix rides the closure → task broadcast; scoring is
    one Arrow-batched matmul per batch, no per-row Python."""
    mean_b = mean.copy()
    comp_b = components.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype(np.float64) - mean_b
        p = m @ comp_b
        return pd.Series(list(p))

    return df.withColumn(out_col, project(F.col(vec_col)))
