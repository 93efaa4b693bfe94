"""Grouped custom operators via ``applyInPandas`` (the engine's UDAF/
per-group extension point, SURVEY.md §2.9).

The reference exposes no UDAF surface (its agg lambdas all reduced to
``count_if``); this module is the escape hatch for per-group logic
Spark's built-ins genuinely can't express. Each group arrives as one
Arrow-backed pandas frame, so group cardinality must be bounded
(state per group lives in one executor's Python heap — the same
contract pandas puts on the reference).

``zscore_outliers`` is deliberately SQL-expressible so the DuckDB
oracle can hash-check the whole applyInPandas round trip; real users
plug in logic that is not (model scoring, per-group curve fitting).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ZSCORE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


def zscore_outliers(events: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Per-user z-score outlier detection: |value − mean| / stddev >
    threshold (sample stddev, ddof=1 — matches SQL ``stddev_samp``).
    Groups with fewer than 2 rows have undefined stddev → no output.
    """

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["user_id", "event_id", "value"]].assign(zscore=0.0)
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        if std == 0.0 or pd.isna(std):
            return pdf.iloc[0:0][["user_id", "event_id", "value"]].assign(zscore=0.0)
        out = pdf[["user_id", "event_id", "value"]].copy()
        out["zscore"] = (out["value"] - mean) / std
        return out[out["zscore"].abs() > threshold]

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(per_user, schema=ZSCORE_SCHEMA)
    )


COGROUP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_orders", LongType()),
        StructField("n_events_after_last_order", LongType()),
    ]
)


def cogroup_user_activity(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Cogrouped-map (``groupBy().cogroup().applyInPandas``, SURVEY.md
    §2.9): both tables shuffle-partitioned on the user key, then each
    key's (events, orders) frame PAIR lands in one Python call — the
    per-key two-table merge shape (custom as-of logic, per-entity
    reconciliation) that neither a join nor a single-table
    applyInPandas expresses directly.

    Deliberately SQL-expressible (two aggs + a filtered count) so the
    DuckDB oracle hash-checks the whole cogrouped Arrow round trip.
    Keys present in either side appear in the output (outer cogroup
    semantics — one side's frame may be empty).
    """

    def merge(key: tuple, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        n_events = len(ev)
        n_orders = len(od)
        if n_orders and n_events:
            last_order = od["o_orderdate"].max()
            n_after = int((ev["ts"] > last_order).sum())
        else:
            n_after = 0
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_orders": [n_orders],
                "n_events_after_last_order": [n_after],
            }
        )

    ev = events.select("user_id", "ts")
    od = orders.select("o_custkey", "o_orderdate")
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("o_custkey"))
        .applyInPandas(merge, schema=COGROUP_SCHEMA)
    )
