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
from pyspark.sql import functions as F
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


def cogroup_user_activity(
    events: DataFrame, orders: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """Cogrouped-map (``groupBy().cogroup().applyInPandas``, SURVEY.md
    §2.9): both tables shuffle-partitioned on the same key, then each
    key's (events, orders) frame PAIR lands in one Python call — the
    per-key two-table merge shape (custom as-of logic, per-entity
    reconciliation) that neither a join nor a single-table
    applyInPandas expresses directly.

    Scale design: cogrouping on the raw user key costs one Python
    invocation per key — O(key-cardinality) interpreter round trips
    (measured 17.9 s at sf0.1's 15k keys). Instead both sides cogroup
    on ``user_id % n_buckets`` and the per-user merge is vectorized
    pandas inside each bucket: exactly ``n_buckets`` Python calls
    regardless of key cardinality, the same amortization trick as
    salting. Per-user semantics are unchanged (a bucket contains every
    row of each of its users on both sides).

    Deliberately SQL-expressible (two aggs + a filtered count) so the
    DuckDB oracle hash-checks the whole cogrouped Arrow round trip.
    Keys present in either side appear in the output (outer cogroup
    semantics — one side's frame may be empty).
    """

    def merge(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        e_cnt = ev.groupby("user_id").size()
        o_agg = od.groupby("user_id")["o_orderdate"].agg(["size", "max"])
        # events strictly after that user's last order (users with no
        # orders map to NaT, which compares False — n_after stays 0)
        last_order = ev["user_id"].map(o_agg["max"]) if len(od) else None
        if last_order is not None and len(ev):
            after = (
                (ev["ts"] > last_order).groupby(ev["user_id"]).sum()
            )
        else:
            after = pd.Series(dtype="int64")
        keys = e_cnt.index.union(o_agg.index)
        return pd.DataFrame(
            {
                "user_id": keys.astype("int64"),
                "n_events": e_cnt.reindex(keys).fillna(0).astype("int64").values,
                "n_orders": (
                    o_agg["size"].reindex(keys).fillna(0).astype("int64").values
                    if len(od)
                    else 0
                ),
                "n_events_after_last_order": after.reindex(keys)
                .fillna(0)
                .astype("int64")
                .values,
            }
        )

    ev = events.select("user_id", "ts", (F.col("user_id") % n_buckets).alias("b"))
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        (F.col("o_custkey") % n_buckets).alias("b"),
    )
    return (
        ev.groupBy("b")
        .cogroup(od.groupBy("b"))
        .applyInPandas(lambda e, o: merge(e, o), schema=COGROUP_SCHEMA)
    )


def zscore_outliers_builtin(events: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Window-function formulation of ``zscore_outliers`` — identical
    semantics (sample stddev, <2-row and zero-variance groups emit
    nothing), zero Python in the plan: `avg`/`stddev_samp`/`count`
    over a user_id window stay inside whole-stage codegen, so the only
    cost is the one `user_id` exchange the grouping requires.

    This is the hot-path form (SURVEY §2.9: prefer built-ins); the
    ``applyInPandas`` version above stays as the documented
    extension-point demo for logic SQL can't express. Both share one
    DuckDB oracle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    t = events.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("m"),
        F.stddev_samp("value").over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    z = (F.col("value") - F.col("m")) / F.col("s")
    return t.filter(
        (F.col("n") >= 2)
        & F.col("s").isNotNull()
        & (F.col("s") != 0)
        & (F.abs(z) > threshold)
    ).select("user_id", "event_id", "value", z.alias("zscore"))
