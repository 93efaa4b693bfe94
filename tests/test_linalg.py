"""Embedding linear-algebra tier (operators/linalg.py): the PCA
spectrum must be consistent with the ORACLE-CHECKED per-dimension
profile (trace == eigenvalue sum), mathematically well-formed, and
total on empty input."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.operators.linalg import (
    dim_moments,
    gram_matrix,
    pca_spectrum,
)
from elb_log_etl_enrichment_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pca_spectrum_matches_dim_profile_trace(spark):
    emb = load_table(spark, SF, "embeddings")
    # trace of covariance = sum of per-dim variances (exact decimal path)
    prof = dim_moments(emb).collect()
    trace = sum(r.var for r in prof)
    n, s, G = gram_matrix(emb)
    cov = G / n - np.outer(s / n, s / n)
    evals = np.linalg.eigh(cov)[0]
    # eigensum == trace (both ~ the unrounded covariance; prof.var is
    # rounded to 6dp per dim, so allow d * 5e-7)
    assert abs(float(evals.sum()) - trace) < len(prof) * 5e-7 + 1e-9
    spec = pca_spectrum(emb)
    shares = [sh for _, _, sh, _ in spec]
    assert shares == sorted(shares, reverse=True)
    assert all(sh >= 0 for sh in shares)
    assert spec[-1][3] <= 1.0 + 1e-9  # cumulative share bounded


def test_gram_matrix_agrees_with_numpy(spark):
    emb = load_table(spark, SF, "embeddings")
    X = np.array(
        [r[0] for r in emb.select("embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    n, s, G = gram_matrix(emb)
    assert n == len(X)
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(G, X.T @ X, rtol=1e-9)


def test_linalg_empty_input(spark):
    emb = load_table(spark, SF, "embeddings").filter(F.lit(False))
    assert dim_moments(emb).count() == 0
    n, s, G = gram_matrix(emb)
    assert n == 0
    assert pca_spectrum(emb) == []


def test_gram_matrix_drops_null_vectors(spark):
    """NULL embeddings are dropped (not a crash — ADVICE r02): the
    Gram over a corpus with injected NULL rows equals the Gram over
    the non-null subset."""
    emb = load_table(spark, SF, "embeddings")
    nulls = emb.limit(3).select(
        F.lit(None).cast("array<float>").alias("embedding")
    )
    mixed = emb.select("embedding").unionByName(nulls)
    n0, s0, G0 = gram_matrix(emb)
    n1, s1, G1 = gram_matrix(mixed)
    assert n1 == n0
    np.testing.assert_allclose(s1, s0, rtol=1e-12)
    np.testing.assert_allclose(G1, G0, rtol=1e-12)


def test_embedding_centroid_drift_hand_case(spark, tmp_path):
    """Two even-id vectors vs two odd-id vectors with known means:
    the per-dim shifts are exact."""
    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=0),
        Row(vec_id=2, embedding=[3.0, 0.0], label=0),   # period 0 mean (2, 0)
        Row(vec_id=1, embedding=[5.0, 2.0], label=1),
        Row(vec_id=3, embedding=[7.0, 4.0], label=1),   # period 1 mean (6, 3)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {
        r.dim: (r.mean_a, r.mean_b, r.abs_shift)
        for r in REGISTRY["embedding_centroid_drift"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[0] == (2.0, 6.0, 4.0)
    assert out[1] == (0.0, 3.0, 3.0)


def test_knn_label_agreement_hand_case(spark, tmp_path):
    """Query vec 0 (label 0) whose 5 nearest neighbors split 3
    same-label / 2 other-label by construction → agree_bp = 6000."""
    import math

    from pyspark.sql import Row

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

    all_queries()

    def vec(angle_deg):
        a = math.radians(angle_deg)
        return [math.cos(a), math.sin(a)]

    rows = [Row(vec_id=0, embedding=vec(0), label=0)]       # the query
    # 3 same-label close neighbors, 2 other-label slightly farther,
    # the rest far away with label 9
    for i, (ang, lab) in enumerate(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (80, 9), (85, 9), (90, 9)]
    ):
        rows.append(Row(vec_id=101 + i, embedding=vec(ang), label=lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {
        r.label: r
        for r in REGISTRY["knn_label_agreement"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0].n_queries == 1
    assert out[0].n_agree == 3
    assert out[0].agree_bp == 6000
