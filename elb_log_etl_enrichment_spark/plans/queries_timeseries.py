"""Time-series tier: OHLC bars, time-weighted averages, gap-filled
LOCF series (operators/timeseries.py).

Extends the reference's time-bucketed aggregation surface
(etl/aggregate.py hourly rollups) with the hypertable-style operators
a telemetry pipeline needs: deterministic open/close bars under
timestamp ties, step-function time-weighted means, and dense spines
with last-observation-carried-forward fill.

Determinism: open/close pick values by (ts, event_id) struct order —
never by arrival order; all float outputs are rounded AFTER ratio
formation (raw weighted sums are order-dependent at 1e15 magnitude,
ratios are not); bucket timestamps are emitted as epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import gapfill_locf, ohlc_bars, time_weighted_avg
from .queries import _t, register

_BUCKET_S = 21600  # 6-hour bars


@register(
    "ohlc_bars_events",
    sql=f"""
    WITH b AS (
        SELECT event_type AS series,
               CAST(FLOOR(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT)
                   AS bucket_epoch,
               value, ts, event_id
        FROM events
    ),
    w AS (
        SELECT series, bucket_epoch, value,
               first_value(value) OVER
                   (PARTITION BY series, bucket_epoch
                    ORDER BY ts, event_id) AS open_v,
               last_value(value) OVER
                   (PARTITION BY series, bucket_epoch
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS close_v
        FROM b
    )
    SELECT series, bucket_epoch,
           ROUND(MIN(open_v), 6)  AS open,
           ROUND(MAX(value), 6)   AS high,
           ROUND(MIN(value), 6)   AS low,
           ROUND(MIN(close_v), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM w
    GROUP BY series, bucket_epoch
    """,
    tags=("timeseries", "agg", "ohlc"),
)
def ohlc_bars_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash agg, no window pass: open/close via min_by/max_by on a
    (ts, event_id) struct — the oracle reproduces the same pick with
    deterministic-order window functions."""
    e = _t(spark, sf_dir, "events")
    return ohlc_bars(
        e,
        series_col="event_type",
        ts_col="ts",
        value_col="value",
        bucket_seconds=_BUCKET_S,
        tiebreak_col="event_id",
    )


@register(
    "time_weighted_avg_users",
    sql="""
    WITH d AS (
        SELECT user_id AS key, value AS v,
               lead(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                 - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT key,
           ROUND(SUM(v * dt_us) / SUM(dt_us), 6) AS twa,
           CAST(SUM(dt_us) AS BIGINT)   AS total_us,
           CAST(COUNT(*) AS BIGINT)     AS n_intervals
    FROM d
    WHERE dt_us IS NOT NULL
    GROUP BY key
    """,
    tags=("timeseries", "window", "agg"),
)
def time_weighted_avg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-function TWA per user: one Exchange on user_id serves both
    the lead() window and the final hash agg."""
    e = _t(spark, sf_dir, "events")
    return time_weighted_avg(
        e, key_col="user_id", ts_col="ts", value_col="value", tiebreak_col="event_id"
    )


@register(
    "gapfill_locf_hourly",
    sql="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
        FROM bounds
    ),
    series AS (SELECT DISTINCT event_type AS series FROM events),
    obs AS (
        SELECT event_type AS series,
               date_trunc('hour', ts) AS bucket_ts,
               ROUND(AVG(value), 6) AS observed
        FROM events
        GROUP BY 1, 2
    ),
    g AS (
        SELECT s.series, sp.bucket_ts, o.observed
        FROM spine sp
        CROSS JOIN series s
        LEFT JOIN obs o ON o.series = s.series AND o.bucket_ts = sp.bucket_ts
    )
    SELECT series,
           CAST(epoch(bucket_ts) AS BIGINT) AS bucket_epoch,
           observed,
           last_value(observed IGNORE NULLS) OVER
               (PARTITION BY series ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           observed IS NULL AS is_gap
    FROM g
    """,
    tags=("timeseries", "gapfill", "locf", "window"),
)
def gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per event_type with LOCF fill. Spine
    cardinality is series x hours — independent of event volume; the
    running fill windows over the spine, never over raw events."""
    e = _t(spark, sf_dir, "events")
    filled = gapfill_locf(
        e, series_col="event_type", ts_col="ts", agg_expr=F.round(F.avg("value"), 6)
    )
    return filled.select(
        "series",
        F.unix_timestamp("bucket_ts").alias("bucket_epoch"),
        "observed",
        "filled",
        "is_gap",
    )
