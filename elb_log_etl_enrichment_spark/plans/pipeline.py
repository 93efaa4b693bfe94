"""The full ELB ETL pipeline, composed (reference main(),
elb_logs.py:398-437 / SURVEY.md §3.1).

Where the reference eagerly materializes a pandas frame between every
stage, this composition is ONE lazy logical plan per sink: Catalyst
fuses parse→enrich→filter→features into a handful of codegen stages,
the enriched frame is ``persist()``-ed once before the 4-sink fan-out,
and the only shuffles are the two the semantics require (the
``client_ip`` window partitioning, reused by sessionization and both
rolling features, and the aggregate exchanges).

Incremental state: the geo cache round-trips through parquet exactly
like the reference (anti-join detects new IPs, upsert keeps the
newest row per IP), so a second run over the same logs fetches zero
new IPs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import bot_traffic, error_summary, hourly_geo_aggregates
from ..operators.enrich import enrich_with_geo, new_keys
from ..operators.features import (
    add_path_features,
    add_rolling_features,
    calculate_processing_times,
    extract_time_features,
    sessionize,
)
from ..sinks.writers import write_cleaned_logs, write_csv, write_parquet
from ..sources.elb_logs import LOCAL_TZ, filter_categorize, parse_elb_lines, read_raw_lines
from ..sources.geo_cache import load_geo_cache, update_geo_cache
from ..sources.http_geo import fake_fetch, fetch_geolocations


def _feature_chain(parsed: DataFrame, cache: DataFrame) -> DataFrame:
    """Steps 3-6 as one lazy plan: broadcast geo join, filters, time /
    processing / session / rolling / path features."""
    enriched = filter_categorize(enrich_with_geo(parsed, cache))
    # reference extracts calendar features from US/Eastern wall-clock
    # (elb_logs.py:83,295-303); windows order by the underlying instant.
    enriched = enriched.withColumn(
        "time_local", F.from_utc_timestamp(F.col("time"), LOCAL_TZ)
    )
    enriched = extract_time_features(enriched, ts="time_local")
    enriched = calculate_processing_times(enriched)
    # trace_id is per-request-unique → deterministic order among rows
    # with identical timestamps (SURVEY.md §7.4 trap 7)
    enriched = sessionize(enriched, key="client_ip", ts="time", tiebreak="trace_id")
    enriched = add_rolling_features(enriched, key="client_ip", ts="time")
    enriched = add_path_features(enriched)
    return enriched.drop("time_local")


def enrich_and_featurize(
    spark: SparkSession,
    parsed: DataFrame,
    geo_cache_path: str,
    fetch_fn: Callable[[str], dict] = fake_fetch,
) -> DataFrame:
    """Steps 2-6 of the reference main(): geo lookup/cache/join, then
    the feature chain. Pure plan construction except the cache upsert
    (which, as in the reference, is a materialized side effect)."""
    cache = load_geo_cache(spark, geo_cache_path)
    new_ips = new_keys(parsed, cache)
    fetched = fetch_geolocations(new_ips, fetch_fn=fetch_fn)
    cache = update_geo_cache(spark, fetched, geo_cache_path)
    return _feature_chain(parsed, cache)


def enrich_and_featurize_deferred(
    spark: SparkSession,
    parsed: DataFrame,
    geo_cache_path: str,
    fetch_fn: Callable[[str], dict] = fake_fetch,
) -> tuple[DataFrame, Callable[[], None]]:
    """The micro-batch variant of :func:`enrich_and_featurize`
    (VERDICT r07 item 7): returns ``(enriched, finalize)`` where the
    enrichment joins the upsert-merged cache as a LAZY frame and the
    cache parquet write is deferred to ``finalize()``.

    Why: the eager form costs a standalone fetch-probe job per call
    (distinct → anti-join → Arrow fetch, just to learn emptiness)
    before the sink job runs. Here the fetched frame is persisted and
    first materialized INSIDE the caller's sink job (the broadcast
    build of the merged cache), so by the time ``finalize()`` probes
    it the answer is already cached — one fewer Spark job per
    micro-batch, worth ~0.3-0.5 s of scheduling at cron-tick batch
    sizes. Semantics are unchanged: the enrichment sees exactly the
    merged cache content, an empty fetch still skips the cache
    rewrite (idle-tick contract), and a crash between sink commit and
    cache swap degrades to a cold cache (refetch next tick), never a
    corrupt one — the cache is a cache.

    ``finalize()`` must be called after the enriched frame has been
    materialized (it unpersists the fetch buffer)."""
    from ..operators.dedup import upsert_keep_latest

    cache = load_geo_cache(spark, geo_cache_path)
    new_ips = new_keys(parsed, cache)
    fetched = fetch_geolocations(new_ips, fetch_fn=fetch_fn).persist()
    merged = upsert_keep_latest(
        cache, fetched, ["client_ip"], "api_fetch_timestamp"
    )
    enriched = _feature_chain(parsed, merged)

    def finalize() -> None:
        try:
            update_geo_cache(spark, fetched, geo_cache_path)
        finally:
            fetched.unpersist()

    return enriched, finalize


def run_pipeline(
    spark: SparkSession,
    logs_path: str | DataFrame,
    output_dir: str,
    geo_cache_path: str | None = None,
    fetch_fn: Callable[[str], dict] = fake_fetch,
) -> dict[str, DataFrame]:
    """End-to-end ETL: raw log lines → 4 sinks (reference Step 1-7).

    ``logs_path`` may be a glob of (gzip) log files or a pre-built
    lines DataFrame (tests). Returns the intermediate frames for
    inspection; sinks land under ``output_dir`` in the reference's
    layout (cleaned_logs/ aggregated_stats/ reports/).
    """
    geo_cache_path = geo_cache_path or os.path.join(
        output_dir, "ip_geolocation_cache.parquet"
    )
    lines = (
        logs_path
        if isinstance(logs_path, DataFrame)
        else read_raw_lines(spark, logs_path)
    )
    parsed = parse_elb_lines(lines)
    enriched = enrich_and_featurize(spark, parsed, geo_cache_path, fetch_fn)

    # Persisted across the sink fan-out AND the returned frames: the
    # caller inspects them after we return (unpersisting here would
    # silently re-run the whole enrichment per caller action). The
    # cache entry is LRU-evictable; callers that are done can
    # `frames["enriched"].unpersist()` — which is why the RETURNED frame
    # must be this persisted plan, not the observe() wrapper below:
    # DataFrame.unpersist matches by sameResult, and CollectMetrics(...)
    # does not match the pre-observe persisted plan.
    enriched = enriched.persist()
    persisted = enriched
    # Pipeline observability (df.observe): named aggregate metrics
    # computed DURING the first action over the enriched frame — no
    # extra pass, no extra job, the accumulation rides the existing
    # scan. The reference's only telemetry is log lines; a production
    # pipeline alerts on these counters per run.
    from pyspark.sql import Observation

    obs = Observation("pipeline_metrics")
    enriched = enriched.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("is_bot")).alias("n_bots"),
        F.count_if(F.col("waf_blocked")).alias("n_waf_blocked"),
        F.count_if(F.col("countryCode").isNull()).alias("n_geo_missing"),
    )
    write_cleaned_logs(enriched, os.path.join(output_dir, "cleaned_logs"))
    hourly = hourly_geo_aggregates(enriched)
    write_parquet(
        hourly,
        os.path.join(output_dir, "aggregated_stats", "hourly_traffic_by_geo.parquet"),
    )
    errors = error_summary(enriched)
    write_csv(errors, os.path.join(output_dir, "reports", "error_summary_geo.csv"))
    bot_detail, bot_summary = bot_traffic(enriched)
    write_parquet(
        bot_detail, os.path.join(output_dir, "reports", "bot_traffic_details.parquet")
    )
    write_csv(
        bot_summary,
        os.path.join(output_dir, "reports", "bot_traffic_by_origin_summary.csv"),
    )
    return {
        "enriched": persisted,
        "hourly": hourly,
        "errors": errors,
        "bot_detail": bot_detail,
        "bot_summary": bot_summary,
        "metrics": obs.get,
    }
