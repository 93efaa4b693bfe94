"""Differential tests: every registry query vs its DuckDB oracle SQL
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import os

import pytest

from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries

all_queries()  # force extension registries to load before parametrize

from .oracle_harness import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    result = spec.fn(spark, SF_DIR)
    assert result is not None
    if spec.sql is None:
        assert result.count() >= 0  # rows-only check, like the driver
        return
    oracle = con.execute(spec.sql).fetchdf()
    issues = compare(result, oracle, name)
    assert not issues, "\n".join(issues)
