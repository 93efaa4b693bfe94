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
    one; the swap goes through the Hadoop FileSystem API (r7, same
    discipline as ``streaming.stream.compact_ingest_index``) so an
    ``s3a://``/``hdfs://`` cache path takes the same code path as a
    local one instead of stranding the staging copy; on object stores
    prefer the manifest-pointer swap (``sinks.writers
    .write_audit_publish``) — rename is not atomic there.

    When ``new_entries`` is EMPTY the cache is returned untouched: a
    cron tick with no unseen IPs (the steady state of a mature
    deployment) must not rewrite the full cache — at web scale that is
    a per-tick rewrite of millions of rows that changes nothing. The
    probe rides the persisted frame the merge would consume anyway, so
    the non-empty path does no extra work."""
    old = load_geo_cache(spark, cache_path)
    new_entries = new_entries.persist()
    try:
        if not new_entries.take(1):
            return old
        merged = upsert_keep_latest(
            old, new_entries, ["client_ip"], "api_fetch_timestamp"
        )
        commit_geo_cache(spark, merged, cache_path)
    finally:
        new_entries.unpersist()
    return spark.read.schema(GEO_SCHEMA).parquet(cache_path)


def commit_geo_cache(spark: SparkSession, merged: DataFrame, cache_path: str) -> None:
    """Stage-and-swap commit of a PREBUILT keep-latest merge — the
    write half of :func:`update_geo_cache`, split out (r9) so the
    streaming deferred path can commit the exact merge plan its
    enrichment join already constructed instead of re-loading the
    cache and rebuilding the upsert per micro-batch (~0.25 s of eager
    re-analysis per cron tick for byte-identical plans). Staging keeps
    the merge from truncating its own parquet input; the swap goes
    through the Hadoop FileSystem API so remote cache paths share the
    code path (see update_geo_cache's docstring for the full
    rationale)."""
    from ..hadoop_fs import fs_swap

    staging = cache_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    fs_swap(spark, staging, cache_path)
