"""Distributed linear algebra over embedding columns: per-dimension
moments and PCA via a map-side Gram matrix.

The reference has no embedding surface at all; this extends the ANN
tier (operators/similarity.py) with the matrix-shaped statistics a
training-data pipeline needs before indexing: which dimensions carry
variance, how correlated adjacent dimensions are, and the principal
spectrum (whitening / dimensionality-reduction decisions hang off
these).

Scale design (100 TB):

* ``dim_moments`` is a posexplode + d-group aggregate: the shuffle
  carries d groups of decimal partial sums no matter the row count,
  and the explode multiplies rows by d only INSIDE the map stage
  (combiner reduces before the exchange). Pure JVM, oracle-parity
  decimal sums.
* ``gram_matrix`` never explodes: each Arrow batch contributes ONE
  d x d partial (a single BLAS syrk/gemm over the batch), so the
  cross-partition traffic is (#batches) x d^2 doubles — for d = 64
  that is 32 KiB per batch, independent of row count. The final
  elementwise reduce is a d^2-group aggregate. Driver-side eigh then
  costs O(d^3) on a 64 x 64 matrix — microseconds, and NOT a
  scalability term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_moments", "gram_matrix", "pca_spectrum"]


def dim_moments(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension count / mean / variance / adjacent-dimension
    covariance. Decimal-quantized sums keep the aggregate
    order-independent and cross-engine exact; the only doubles are
    derived from those sums with a fixed expression tree."""
    x = F.col("x").cast("double")
    nxt = F.col("x_next").cast("double")
    e = emb.select(
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
        F.col(vec_col).alias("_v"),
    ).select(
        "dim",
        "x",
        # F.get: 0-based, returns NULL past the end under BOTH ANSI
        # settings (element_at would throw under ANSI for the last dim)
        F.get(F.col("_v"), F.col("dim") + 1).alias("x_next"),
    )
    agg = e.groupBy("dim").agg(
        F.count("x").alias("n"),
        F.sum(x.cast("decimal(28,12)")).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(28,12)")).cast("double").alias("s2"),
        F.sum(
            F.when(nxt.isNotNull(), (x * nxt).cast("decimal(28,12)"))
        )
        .cast("double")
        .alias("s12"),
        F.count("x_next").alias("n12"),
        F.sum(F.when(nxt.isNotNull(), x.cast("decimal(28,12)")))
        .cast("double")
        .alias("s1p"),
        F.sum(F.when(nxt.isNotNull(), nxt.cast("decimal(28,12)")))
        .cast("double")
        .alias("s2p"),
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s1") / F.col("n"), 6).alias("mean"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"),
            6,
        ).alias("var"),
        F.when(
            F.col("n12") > 0,
            F.round(
                (F.col("s12") - F.col("s1p") * F.col("s2p") / F.col("n12"))
                / F.col("n12"),
                6,
            ),
        ).alias("cov_next"),
    ).orderBy("dim")


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_vec[d], G[d,d]) with G = sum over rows of x xᵀ,
    computed as one BLAS product per Arrow batch (`mapInPandas`) and
    an elementwise d^2-group reduce — no per-element explode ever
    crosses an exchange. Returns driver-side numpy (d is small by
    contract; d^2 doubles = 32 KiB for d=64)."""
    # Contract: vectors are non-null and uniform-length. NULL embeddings
    # are dropped here (not an error); a ragged vector fails loudly in
    # the batch below instead of silently mis-shaping the Gram.
    emb = emb.filter(F.col(vec_col).isNotNull())
    first = emb.select(vec_col).first()
    if first is None:
        return 0, np.zeros(0), np.zeros((0, 0))
    d = len(first[0])

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            if X.ndim != 2 or X.shape[1] != d:
                raise ValueError(
                    f"gram_matrix: ragged/mis-sized vectors in '{vec_col}' "
                    f"(expected uniform dim {d}, got batch shape {X.shape})"
                )
            g = X.T @ X
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    part = emb.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    )
    # final reduce: one row per batch -> tiny; explode the flat gram
    # only here (batch-count x d^2 rows, NOT row-count x d^2)
    red = part.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("s"),
            F.array_repeat(F.lit(0.0), d),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("s"),
        F.aggregate(
            F.collect_list("g"),
            F.array_repeat(F.lit(0.0), d * d),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("g"),
    ).collect()[0]
    n = red["n"] or 0
    if n == 0:
        return 0, np.zeros(d), np.zeros((d, d))
    return n, np.array(red["s"]), np.array(red["g"]).reshape(d, d)


def pca_spectrum(emb: DataFrame, vec_col: str = "embedding", top_k: int = 16):
    """Eigen-spectrum of the sample covariance: list of
    (component, eigenvalue, share, cumulative_share) for the top_k
    components, eigenvalues descending. Covariance is assembled from
    the distributed Gram matrix; `numpy.linalg.eigh` runs on the
    d x d driver-side result (deterministic for symmetric input)."""
    n, s, G = gram_matrix(emb, vec_col)
    if n < 2:
        return []
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    evals = np.linalg.eigh(cov)[0][::-1]  # descending
    evals = np.clip(evals, 0.0, None)
    total = float(evals.sum())
    out, cum = [], 0.0
    for i, ev in enumerate(evals[:top_k]):
        share = float(ev) / total if total > 0 else 0.0
        cum += share
        out.append((i + 1, float(ev), share, cum))
    return out
