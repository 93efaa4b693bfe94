"""End-to-end pipeline test: fixture ALB lines → 4 sinks, plus the
incremental geo-cache contract (second run fetches zero new IPs)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.pipeline import run_pipeline
from elb_log_etl_enrichment_spark.sources.geo_cache import load_geo_cache
from elb_log_etl_enrichment_spark.sources.http_geo import fake_fetch

from elb_log_etl_enrichment_spark.sources.alb_fixtures import fixture_lines


def _lines_df(spark):
    return spark.createDataFrame([Row(value=ln) for ln in fixture_lines()])


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "out")
    res = run_pipeline(spark, _lines_df(spark), out, fetch_fn=fake_fetch)

    enriched = res["enriched"]
    rows = enriched.collect()
    # garbage dropped (3), health checks filtered (5): 22 of 30 remain
    assert len(rows) == 22
    # geo enrichment joined a country for every row (fake fetch)
    assert all(r.countryName is not None for r in rows)
    # sessionization: burst IP got a second session after the 40-min gap
    sess = {
        r.session_id
        for r in rows
        if r.client_ip == "10.1.1.1"
    }
    assert sess == {"10.1.1.1_s0", "10.1.1.1_s1"}
    # rolling 5-min count peaks at the burst size
    burst_max = enriched.filter(F.col("client_ip") == "10.1.1.1").agg(
        F.max("rolling_5min_request_count")
    ).first()[0]
    assert burst_max == 10
    # '-' timings became NULL, total_processing_time treats them as 0
    dash = [r for r in rows if r.client_ip == "10.2.2.2" and r.request_processing_time is None]
    assert dash and all(r.total_processing_time is not None for r in dash)
    # WAF flag
    assert any(r.waf_blocked for r in rows if r.client_ip == "10.2.2.2")
    # error report holds only 4xx/5xx
    statuses = {r.elb_status_code for r in res["errors"].collect()}
    assert statuses == {404, 500, 503, 403}
    # bot summary counts the bot IP's requests
    bots = {(r.countryName, r.bot_request_count) for r in res["bot_summary"].collect()}
    assert sum(n for _, n in bots) == 5
    # sinks on disk: hive-partitioned cleaned logs + reports
    parts = glob.glob(os.path.join(out, "cleaned_logs", "request_year=*/request_month=*/request_day=*/countryCode=*"))
    assert parts, "expected hive-partitioned cleaned_logs layout"
    assert glob.glob(os.path.join(out, "reports", "error_summary_geo.csv", "*.csv"))

    # incremental state: the cache holds one row per distinct IP seen
    # pre-filter (3 analytic + 1 health-check IP — the reference also
    # geo-looks-up before filtering, elb_logs.py:408 vs 423)
    cache_path = os.path.join(out, "ip_geolocation_cache.parquet")
    cache = load_geo_cache(spark, cache_path)
    assert sorted(r.client_ip for r in cache.collect()) == [
        "10.0.9.9", "10.1.1.1", "10.2.2.2", "10.3.3.3",
    ]

    # second run over the same logs must fetch NOTHING: a fetch_fn that
    # raises proves the anti-join found no new IPs
    def poisoned_fetch(ip: str) -> dict:
        raise AssertionError(f"unexpected geo lookup for {ip}")

    run_pipeline(spark, _lines_df(spark), str(tmp_path / "out2"),
                 geo_cache_path=cache_path, fetch_fn=poisoned_fetch)
    cache2 = load_geo_cache(spark, cache_path)
    assert cache2.count() == 4  # keep-latest dedup, no growth


def test_pipeline_golden_output_hash(spark, tmp_path):
    """Golden e2e pin (SURVEY §5.3): md5 of the sorted, stringified
    enriched output over the fixture corpus. Pins EVERY column's
    semantics at once — parser, enrichment, sessionization, rolling
    features, flags. `api_fetch_timestamp` is excluded (wall-clock by
    design, mirroring the reference's cache-at-fetch-time field).

    If a deliberate semantic change lands, recompute with the
    recipe in this test and update the constant in the same commit.
    (r02: constant updated when the UA heuristic gained uap-core
    parity families — fixture Googlebot rows now classify as
    browser='Googlebot' instead of 'Other', like the reference lib.)
    """
    import hashlib

    res = run_pipeline(spark, _lines_df(spark), str(tmp_path / "g"), fetch_fn=fake_fetch)
    e = res["enriched"].drop("api_fetch_timestamp")
    cols = sorted(e.columns)

    def cell(v):
        return f"{v:.6f}" if isinstance(v, float) else str(v)

    serial = sorted(
        "|".join(cell(v) for v in r) for r in e.select(*cols).collect()
    )
    digest = hashlib.md5("\n".join(serial).encode()).hexdigest()
    assert digest == "10493d08998d697c70150709e9b0ae3a"


def test_pipeline_observe_metrics_ride_the_first_action(spark, tmp_path):
    """run_pipeline attaches df.observe counters to the enriched frame;
    they must be collected by the sink actions (no extra job) and agree
    with direct recounts of the returned frame."""
    from elb_log_etl_enrichment_spark.plans.pipeline import run_pipeline

    lines = spark.createDataFrame(
        [(ln,) for ln in fixture_lines()], "value string"
    )
    frames = run_pipeline(spark, lines, str(tmp_path / "obs_out"))
    m = frames["metrics"]
    enriched = frames["enriched"]
    assert m["n_rows"] == enriched.count() > 0
    assert m["n_bots"] == enriched.filter("is_bot").count()
    assert m["n_waf_blocked"] == enriched.filter("waf_blocked").count()
    assert m["n_geo_missing"] == enriched.filter("countryCode IS NULL").count()


def test_run_pipeline_returned_enriched_unpersists_cache(spark, tmp_path):
    """The returned frames["enriched"] must be the PERSISTED plan, so a
    caller's .unpersist() actually releases the cache entry (ADVICE r01:
    the observe() wrapper would not sameResult-match the cached plan)."""
    frames = run_pipeline(spark, _lines_df(spark), str(tmp_path / "out"))
    enriched = frames["enriched"]
    assert enriched.storageLevel.useMemory or enriched.storageLevel.useDisk
    enriched.unpersist(blocking=True)
    assert not (enriched.storageLevel.useMemory or enriched.storageLevel.useDisk)
