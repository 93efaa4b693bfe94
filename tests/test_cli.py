"""CLI surface test: ``python -m elb_log_etl_enrichment_spark`` as a
cron job would invoke it (fresh process, env-configured)."""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys

from elb_log_etl_enrichment_spark.sources.alb_fixtures import fixture_lines

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_stream_mode_end_to_end(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    with gzip.open(logs / "a.log.gz", "wt") as f:
        f.write("\n".join(fixture_lines()))
    env = dict(
        os.environ,
        ELB_LOGS_PATH=str(logs / "*.gz"),
        ELB_OUTPUT_DIR=str(tmp_path / "out"),
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "-m", "elb_log_etl_enrichment_spark"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "stream" and summary["rows_total"] == 22


def test_cli_usage_error():
    proc = subprocess.run(
        [sys.executable, "-m", "elb_log_etl_enrichment_spark"],
        cwd=REPO, env={k: v for k, v in os.environ.items() if not k.startswith("ELB_")},
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 2
    assert "usage:" in proc.stderr
