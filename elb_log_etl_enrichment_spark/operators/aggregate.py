"""Aggregation operators (SURVEY.md §2.5 A1-A10) and the reference's
three report queries.

All pure built-in aggregations — the reference's Python agg lambdas
(``count_2xx`` etc., elb_logs.py:361-363) become ``count_if``; median
is Spark's exact ``median`` (the oracle-checked form), with
``percentile_approx`` exposed as the single-pass approximation for
100 TB runs (never silently substituted — SURVEY.md §7.4 trap 6).
Catalyst plans every group-by here as partial (map-side) + final hash
aggregation, so the shuffle carries one row per group per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_geo_aggregates(df: DataFrame, approx: bool = False) -> DataFrame:
    """Hourly traffic rollup by geo (reference export_hourly_aggregates,
    elb_logs.py:351-364): 6 grouping keys, 9 aggregates."""
    median_fn = (
        (lambda c: F.percentile_approx(c, 0.5)) if approx else (lambda c: F.median(c))
    )
    uniq_fn = F.approx_count_distinct if approx else F.count_distinct
    return df.groupBy(
        "request_year", "request_month", "request_day", "request_hour",
        "countryName", "city",
    ).agg(
        F.count("client_ip").alias("request_count"),
        uniq_fn(F.col("client_ip")).alias("unique_client_ips_count"),
        F.avg("total_processing_time").alias("average_total_processing_time"),
        median_fn(F.col("total_processing_time")).alias("median_total_processing_time"),
        F.sum("sent_bytes").alias("sum_sent_bytes"),
        F.sum("received_bytes").alias("sum_received_bytes"),
        F.count_if(F.col("status_code_type") == "2xx_Success").alias("count_2xx"),
        F.count_if(F.col("status_code_type") == "4xx_ClientError").alias("count_4xx"),
        F.count_if(F.col("status_code_type") == "5xx_ServerError").alias("count_5xx"),
    )


ERROR_REPORT_COLS = [
    "time", "client_ip", "city", "countryName", "isp", "http_method", "full_url",
    "elb_status_code", "target_status_code_list", "user_agent",
    "ua_browser_family", "ua_os_family", "error_reason",
]


def error_summary(df: DataFrame) -> DataFrame:
    """4xx/5xx detail report (reference export_error_summary,
    elb_logs.py:370-377): IN-list filter + projection (F3/F5)."""
    return df.filter(
        F.col("status_code_type").isin("4xx_ClientError", "5xx_ServerError")
    ).select(*ERROR_REPORT_COLS)


BOT_DETAIL_COLS = ["time", "client_ip", "city", "countryName", "isp", "full_url", "user_agent"]


def bot_traffic(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Bot detail + per-origin summary (reference export_bot_traffic,
    elb_logs.py:380-391): boolean filter (F4), projection, and a
    ``count(*)`` group size (A8 — row count, vs A2's non-null count)."""
    bots = df.filter(F.col("is_bot"))
    detail = bots.select(*BOT_DETAIL_COLS)
    summary = bots.groupBy("countryName", "isp").agg(
        F.count(F.lit(1)).alias("bot_request_count")
    )
    return detail, summary
