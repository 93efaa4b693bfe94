"""Vector column functions for embedding similarity search.

Dot products are left-fold ``aggregate`` over ``zip_with`` in double
precision — the same element order DuckDB's ``list_dot_product``
uses, so cosine values agree bit-for-bit with the oracle.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: deterministic random hyperplanes for sign-LSH bucketing, generated
#: once with a fixed seed and embedded as literals in BOTH the Spark
#: plan and the oracle SQL (4-decimal values round-trip exactly).
LSH_PLANES = 8
EMBED_DIM = 64


def _gen_hyperplanes(n: int = LSH_PLANES, dim: int = EMBED_DIM, seed: int = 2024):
    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 4) for _ in range(dim)] for _ in range(n)]


HYPERPLANES: list[list[float]] = _gen_hyperplanes()


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def lit_vector(values: list[float]) -> Column:
    return F.array(*[F.lit(v) for v in values])


def lsh_sql_ctes() -> str:
    """DuckDB CTE fragment defining ``planes``/``b``/``nb`` over an
    existing ``n(vec_id, v, nrm)`` CTE — the single source of the
    hyperplane literals and the ``> 0`` bucket rule for every sign-LSH
    oracle query (keeps the SQL in lock-step with ``lsh_bucket``)."""
    plane_rows = ",\n               ".join(
        f"({i}, {HYPERPLANES[i]}::DOUBLE[])" for i in range(LSH_PLANES)
    )
    return f"""planes AS (
        SELECT * FROM (VALUES
               {plane_rows}
        ) AS pl(i, w)
    ),
    b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(n.v, planes.w) > 0
                             THEN (1 << i) ELSE 0 END) AS BIGINT) AS bkt
        FROM n CROSS JOIN planes GROUP BY vec_id
    ),
    nb AS (SELECT n.vec_id, n.v, n.nrm, b.bkt FROM n JOIN b USING (vec_id))"""


def lsh_bucket(vec: Column) -> Column:
    """Sign-LSH bucket id in [0, 2^planes): bit i set iff
    dot(vec, hyperplane_i) > 0."""
    bits = sum(
        (
            F.when(dot(vec, lit_vector(HYPERPLANES[i])) > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            for i in range(LSH_PLANES)
        ),
        F.lit(0),
    )
    return bits.cast("long")
