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
    replace the parquet (reference update_geolocation_cache,
    elb_logs.py:212-228, S8/J4).

    The merged frame is staged to a sibling directory and swapped in,
    because the sink would otherwise truncate its own input — and
    staging keeps the merge DISTRIBUTED: the previous driver-collect
    materialization pulled one row per distinct IP onto the driver,
    which at web scale (millions of IPs) is a driver OOM on every
    upsert (code-review r05 finding). A crash between the remove and
    the rename degrades to a cold cache (refetch), never a corrupt
    one; on object stores the same staging pattern lands with a
    manifest swap (see ``sinks.writers.write_audit_publish``)."""
    import os
    import shutil

    old = load_geo_cache(spark, cache_path)
    merged = upsert_keep_latest(old, new_entries, ["client_ip"], "api_fetch_timestamp")
    staging = cache_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(cache_path):
        shutil.rmtree(cache_path)
    os.rename(staging, cache_path)
    return spark.read.schema(GEO_SCHEMA).parquet(cache_path)
