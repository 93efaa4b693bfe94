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
