"""Physical-plan regression guards.

Correctness is the oracle harness's job; these tests pin the PLAN
properties the 100 TB design depends on — filter pushdown reaching
the parquet scan, column pruning, dims broadcast instead of shuffled,
pre-aggregation below joins. A regression here is invisible to the
oracle (results stay right) but catastrophic at scale.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(spark, name):
    from elb_log_etl_enrichment_spark.plans.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()
    return REGISTRY[name].fn(spark, SF)


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(_q(spark, "pricing_summary"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_on_wide_table(spark):
    # pricing_summary touches 7 of lineitem's 16 columns; the scan
    # schema must not contain untouched ones
    plan = _plan(_q(spark, "pricing_summary"))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_flagship_broadcasts_dims_and_preaggregates(spark):
    plan = _plan(_q(spark, "revenue_by_nation"))
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region
    # lineitem pre-agg below the join: a HashAggregate keyed on
    # l_orderkey must appear (partial-agg pushdown)
    assert "Keys [1]: [l_orderkey" in plan


def test_scalar_subquery_threshold_is_broadcast(spark):
    plan = _plan(_q(spark, "important_parts_value_threshold"))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row threshold side
    # two lineitem scans (per-part agg + grand total), each pruned
    assert plan.count("InMemoryFileIndex") == 2
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "l_comment" not in line


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = _plan(_q(spark, "top_orders_by_revenue"))
    assert "TakeOrderedAndProject" in plan


def test_chunking_is_shuffle_free_before_final_agg(spark):
    plan = _plan(_q(spark, "doc_chunking_stats"))
    # explode+substring pipeline: the ONLY exchanges allowed are the
    # two for the final global aggregate (partial -> single partition)
    # count plan NODES (detail-section headers), not tree lines —
    # explain('formatted') prints each node twice
    exchanges = [
        l
        for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    ]
    assert len(exchanges) <= 2, exchanges
