"""Physical-plan introspection: is this query scale-shaped?

Thin parser over ``df.explain('formatted')`` output exposing the
properties that matter at 100 TB — whether filters reached the scan,
what columns the scan reads, how many shuffle exchanges / broadcasts
the plan contains. Used by ``tests/test_plans.py`` as regression
guards and available to users auditing their own compositions::

    from elb_log_etl_enrichment_spark.plans.audit import plan_stats
    plan_stats(df)   # {'scans': 2, 'exchanges': 1, 'broadcasts': 2,
                     #  'read_schemas': [...], 'pushed_filters': [...]}
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _detail_nodes(plan: str) -> list[str]:
    """Node headers from the detail section — each plan node exactly
    once (the tree section lists them a second time)."""
    return [
        line
        for line in plan.splitlines()
        if line.startswith("(") and ")" in line
    ]


def plan_stats(df_or_plan: DataFrame | str) -> dict:
    """Summary counts + scan details for a plan."""
    plan = (
        df_or_plan
        if isinstance(df_or_plan, str)
        else plan_text(df_or_plan)
    )
    nodes = _detail_nodes(plan)
    lines = plan.splitlines()
    return {
        "scans": sum("Scan parquet" in n or "Scan orc" in n for n in nodes),
        "exchanges": sum(
            "Exchange" in n and "Broadcast" not in n for n in nodes
        ),
        "broadcasts": sum("BroadcastExchange" in n for n in nodes),
        "broadcast_joins": sum(
            "BroadcastHashJoin" in n or "BroadcastNestedLoopJoin" in n
            for n in nodes
        ),
        "read_schemas": [
            line.split("ReadSchema:", 1)[1].strip()
            for line in lines
            if "ReadSchema:" in line
        ],
        "pushed_filters": [
            line.split("PushedFilters:", 1)[1].strip()
            for line in lines
            if "PushedFilters:" in line
        ],
    }
