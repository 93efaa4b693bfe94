"""Streaming-tier tests: incremental ELB processing with exactly-once
file tracking (the reference's cron re-read problem, fixed)."""

from __future__ import annotations

import glob
import gzip
import os

from elb_log_etl_enrichment_spark.sources.alb_fixtures import fixture_lines
from elb_log_etl_enrichment_spark.streaming.elb_stream import stream_elb_pipeline


def _write_gz(path: str, lines: list[str]) -> None:
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines) + "\n")


def _cleaned_count(spark, out: str) -> int:
    files = glob.glob(os.path.join(out, "cleaned_logs", "**", "*.parquet"), recursive=True)
    if not files:
        return 0
    return spark.read.parquet(os.path.join(out, "cleaned_logs")).count()


def test_incremental_elb_stream_processes_each_file_once(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    out = str(tmp_path / "out")
    lines = fixture_lines()
    # valid analytic lines: 30 parse-able, 8 filtered (5 health-check
    # lines + 3 garbage) → 22 cleaned rows in the first file batch
    _write_gz(str(logs / "a.log.gz"), lines)

    stream_elb_pipeline(spark, str(logs / "*.gz"), out)
    n1 = _cleaned_count(spark, out)
    assert n1 == 22

    # cron tick with NO new files: nothing is reprocessed
    stream_elb_pipeline(spark, str(logs / "*.gz"), out)
    assert _cleaned_count(spark, out) == n1

    # a new file lands: only its rows are appended
    _write_gz(str(logs / "b.log.gz"), lines[:5])  # 5 more browser lines
    stream_elb_pipeline(spark, str(logs / "*.gz"), out)
    assert _cleaned_count(spark, out) == n1 + 5


def test_streaming_dedup_drops_replayed_records(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes at-least-once replays:
    the same event file delivered as two micro-batch inputs yields
    each event exactly once downstream."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.streaming.stream import (
        EVENTS_RAW_SCHEMA,
        deduped_stream,
        run_available_now,
    )

    src = spark.createDataFrame(
        [(i, 1_700_000_000_000_000_000 + i * 1_000_000_000, i % 3, "click", 1.0, "{}")
         for i in range(50)],
        EVENTS_RAW_SCHEMA,
    )
    in_dir = str(tmp_path / "in")
    # two identical files = a replayed delivery of the same 50 events
    src.coalesce(1).write.mode("overwrite").parquet(in_dir + "/a")
    src.coalesce(1).write.mode("overwrite").parquet(in_dir + "/b")
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("recursiveFileLookup", True)
        .parquet(in_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = run_available_now(
        deduped_stream(stream),
        spark,
        name="dedup_stream_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )
    assert out.count() == 50
    assert out.select("event_id").distinct().count() == 50
