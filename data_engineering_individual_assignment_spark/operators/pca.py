"""Distributed PCA over an embedding column.

The scalable decomposition: the d x d Gram matrix (and the mean vector)
is computed as PARTITION-WISE numpy partials inside mapInPandas —
each task emits one (count, sum-vector, flattened X'X) row — and those
d²-sized partials reduce to a single driver-side matrix whose size is
independent of the row count.  The eigendecomposition then runs on the
driver over a 64x64 array (microseconds); the resulting components
broadcast back as literal arrays and the projection is a JVM
higher-order expression (zip_with + aggregate), so scoring the corpus
is a map-only pass with no Python.

This is the textbook split for 100 TB PCA: O(n·d²) distributed work,
O(d²) driver state, O(d·k) broadcast — nothing driver-side scales
with n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row per Arrow batch: (n, sum_vec, flattened gram X'X).
    ``dim`` is validated against the actual vector width so a mismatch
    fails loudly at the partial, not as an opaque reshape later."""
    import numpy as np
    import pandas as pd

    def part(batches):
        for pdf in batches:
            if pdf.empty:  # np.vstack raises on a zero-row batch
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            if X.shape[1] != dim:
                raise ValueError(
                    f"embedding width {X.shape[1]} != declared dim {dim}"
                )
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    )


def cov_matrix(df: DataFrame, vec_col: str, dim: int):
    """Reduce the partition-wise gram partials to the d x d population
    covariance matrix (plus mean vector and row count) on the driver —
    the SQL-expressible half of PCA (each entry equals covar_pop of two
    coordinate columns), split out so the gram path can be checked
    differentially against an engine that has covar_pop but no
    eigendecomposition."""
    import numpy as np

    parts = gram_partials(df, vec_col, dim).collect()
    n = sum(p.n for p in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for p in parts:
        s += np.asarray(p.s)
        g += np.asarray(p.g).reshape(dim, dim)
    mean = s / n
    return g / n - np.outer(mean, mean), mean, n


def fit_pca(df: DataFrame, vec_col: str, dim: int, k: int):
    """Returns (eigenvalues desc, components [k][dim], mean vector,
    trace) as plain Python values.  The trace (total variance, sum of
    ALL eigenvalues) is what explained-variance shares must divide by —
    dividing by the top-k sum would always report shares summing to 1
    no matter how little the PCs explain.  The reduce collects only
    d²-sized partials."""
    import numpy as np

    cov, mean, _n = cov_matrix(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    trace = float(vals.sum())
    order = np.argsort(vals)[::-1][:k]
    # sign convention: make each component's largest-|coord| entry
    # positive so the fit is deterministic run-to-run
    comps = []
    for i in order:
        v = vecs[:, i]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v.tolist())
    return [float(vals[i]) for i in order], comps, mean.tolist(), trace


def project(df: DataFrame, vec_col: str, components, mean) -> DataFrame:
    """Adds pc0..pc{k-1} columns via JVM zip_with/aggregate expressions —
    the scoring pass never crosses the Python boundary."""
    out = df
    mean_arr = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(F.col(vec_col), mean_arr, lambda x, m: x - m)
    for i, comp in enumerate(components):
        comp_arr = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(centered, comp_arr, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"pc{i}", dot)
    return out
