"""Parquet-backed geolocation cache (SURVEY.md §2.1 S4/S8).

Cross-run keyed state of the reference pipeline: one row per client
IP, last-write-wins on ``api_fetch_timestamp``
(reference elb_logs.py:150-163, 212-228).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.utils import AnalysisException

from ..operators.dedup import upsert_keep_latest

#: reference elb_logs.py:157-160 + the client_ip index column.
GEO_SCHEMA = StructType(
    [
        StructField("client_ip", StringType()),
        StructField("countryCode", StringType()),
        StructField("countryName", StringType()),
        StructField("regionName", StringType()),
        StructField("city", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("isp", StringType()),
        StructField("api_fetch_timestamp", TimestampType()),
    ]
)


def load_geo_cache(spark: SparkSession, cache_path: str) -> DataFrame:
    """Load the cache, or an empty typed frame when missing
    (reference load_geolocation_cache, elb_logs.py:150-163)."""
    try:
        return spark.read.schema(GEO_SCHEMA).parquet(cache_path)
    except AnalysisException:
        return spark.createDataFrame([], GEO_SCHEMA)


def update_geo_cache(
    spark: SparkSession, new_entries: DataFrame, cache_path: str
) -> DataFrame:
    """Merge new lookups into the cache with last-write-wins dedup and
    overwrite the parquet (reference update_geolocation_cache,
    elb_logs.py:212-228, S8/J4).

    The union+dedup plan is materialized before the overwrite (the
    sink would otherwise truncate its own input).
    """
    old = load_geo_cache(spark, cache_path)
    merged = upsert_keep_latest(old, new_entries, ["client_ip"], "api_fetch_timestamp")
    rows = merged.collect()  # cache is tiny: one row per distinct IP
    out = spark.createDataFrame(rows, GEO_SCHEMA)
    out.write.mode("overwrite").parquet(cache_path)
    return spark.read.schema(GEO_SCHEMA).parquet(cache_path)
