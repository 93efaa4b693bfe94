"""Incremental ELB pipeline: the reference's cron loop
(cron_test.txt: re-list + re-parse the whole S3 prefix every ~2 min,
elb_logs.py:402) re-expressed as a Structured Streaming text source
with checkpointed, exactly-once file tracking — each log object is
parsed exactly once across runs, the fix for the reference's 100%
re-read amplification (SURVEY.md §2.8).

The per-batch work runs in ``foreachBatch`` so the full batch engine
(geo-cache anti-join/upsert, broadcast enrichment, window features,
partitioned sinks in append mode) applies unchanged to each
micro-batch.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import enrich_and_featurize
from ..session import ensure_engine_confs
from ..sinks.writers import CLEANED_PARTITIONS
from ..sources.elb_logs import parse_elb_lines
from ..sources.http_geo import fake_fetch


def stream_elb_pipeline(
    spark: SparkSession,
    logs_glob: str,
    output_dir: str,
    geo_cache_path: str | None = None,
    fetch_fn: Callable[[str], dict] = fake_fetch,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain all unprocessed log files through the full pipeline
    (Trigger.AvailableNow) and append to the partitioned cleaned-logs
    sink. Re-running after new files land processes ONLY the new
    files; re-running with nothing new writes nothing.
    """
    ensure_engine_confs(spark)
    geo_cache_path = geo_cache_path or os.path.join(
        output_dir, "ip_geolocation_cache.parquet"
    )
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")

    lines = (
        spark.readStream.text(logs_glob)
        .withColumn("log_source_file", F.input_file_name())
    )
    parsed = parse_elb_lines(lines)

    def process(batch: DataFrame, _batch_id: int) -> None:
        if not batch.take(1):
            return
        enriched = enrich_and_featurize(spark, batch, geo_cache_path, fetch_fn)
        (
            enriched.write.mode("append")
            .partitionBy(*CLEANED_PARTITIONS)
            .parquet(os.path.join(output_dir, "cleaned_logs"))
        )

    query = (
        parsed.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
