"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-way join+agg on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(elb_log_etl_enrichment_spark/plans/queries.py, SURVEY.md §2) for the
driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from elb_log_etl_enrichment_spark.plans.queries import (  # noqa: E402
    all_oracle_sql,
    all_queries,
    revenue_by_nation,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; keys omitted here get the
    driver's weaker rows-only check."""
    return all_oracle_sql()
