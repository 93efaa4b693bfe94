"""Layout/cost-estimation tier scale-stress.

Builds a 10x key-shifted copy of orders + lineitem + events (the same
protocol as the near-dup and streaming stress runs: copy k shifts
every key by k * max_key, so join fan-outs, key domains, and group
counts all grow with the data instead of collapsing onto hot keys),
writes it as parquet, and times each layout-tier query cold + 2 warm
runs. Prints one JSON line per query with rows-out and wall times.

Run:  python scripts/layout_stress.py [sf_dir] [n_copies]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, n: int) -> str:
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    base = tempfile.mkdtemp(prefix="layout_stress_")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    mx = o.agg(
        F.max("o_orderkey").alias("ok"), F.max("o_custkey").alias("ck")
    ).collect()[0]
    emx = ev.agg(
        F.max("event_id").alias("ei"), F.max("user_id").alias("ui")
    ).collect()[0]

    o_parts = [
        o.select(
            (F.col("o_orderkey") + k * (mx.ok + 1)).alias("o_orderkey"),
            (F.col("o_custkey") + k * (mx.ck + 1)).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        for k in range(n)
    ]
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + k * (mx.ok + 1))
        for k in range(n)
    ]
    ev_parts = [
        ev.select(
            (F.col("event_id") + k * (emx.ei + 1)).alias("event_id"),
            "ts",
            (F.col("user_id") + k * (emx.ui + 1)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(n)
    ]
    from functools import reduce

    reduce(lambda a, b: a.unionByName(b), o_parts).write.parquet(
        f"{base}/orders.parquet"
    )
    reduce(lambda a, b: a.unionByName(b), li_parts).write.parquet(
        f"{base}/lineitem.parquet"
    )
    reduce(lambda a, b: a.unionByName(b), ev_parts).write.parquet(
        f"{base}/events.parquet"
    )
    return base


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from elb_log_etl_enrichment_spark.session import get_spark
    from elb_log_etl_enrichment_spark.plans.queries import (
        REGISTRY,
        all_queries,
    )

    spark = get_spark(app_name="layout_stress")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()

    base = build_corpus(spark, sf_dir, n)
    try:
        for name in (
            "zorder_layout_audit",
            "compaction_binpack_plan",
            "mergeable_histogram_quantiles",
            "join_cardinality_estimate",
            "chi_square_independence",
            "temporal_embargo_split_audit",
            "incremental_join_rollup",
            "write_audit_publish_stats",
        ):
            times = []
            rows = None
            for _ in range(3):
                t0 = time.monotonic()
                rows = len(REGISTRY[name].fn(spark, base).collect())
                times.append(round(time.monotonic() - t0, 2))
            print(
                json.dumps(
                    {
                        "query": name,
                        "rows_out": rows,
                        "cold_s": times[0],
                        "warm_s": times[1:],
                        "copies": n,
                        "sf_dir": sf_dir,
                    }
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
