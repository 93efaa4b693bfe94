"""Multimodal codec tier scale-stress.

The six codec queries sample the documents table (doc_id % 50 == 0)
and run fixed per-asset work (decode + feature extraction) inside
mapInPandas — the 100 TB question is whether cost stays strictly
per-asset-linear with zero shuffle growth. Protocol: 10 key-shifted
copies of the documents table (copy k shifts doc_id by k * max_id,
so the sampled-asset count grows 10x with the data), written as
parquet, then each query runs cold + 2 warm. Prints one JSON line
per query per scale with rows-out and wall times.

Run:  python scripts/multimodal_stress.py [sf_dir] [n_copies]
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

QUERIES = [
    "multimodal_pixel_roundtrip_stats",
    "multimodal_wav_roundtrip_stats",
    "multimodal_video_frame_sample_stats",
    "multimodal_image_resize_stats",
    "multimodal_audio_frame_features",
    "multimodal_video_motion_stats",
]


def build_corpus(spark, sf_dir: str, n: int) -> str:
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    base = tempfile.mkdtemp(prefix="multimodal_stress_")
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("di")).collect()[0]
    copies = [
        d.select(
            (F.col("doc_id") + k * (mx.di + 1)).alias("doc_id"),
            *[c for c in d.columns if c != "doc_id"],
        )
        for k in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    return base


def main() -> None:
    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()

    for label, path in (("1x", None), (f"{n}x", build_corpus(spark, sf_dir, n))):
        d = path or sf_dir
        for name in QUERIES:
            fn = REGISTRY[name].fn
            times = []
            rows = None
            for _ in range(3):
                t0 = time.time()
                rows = fn(spark, d).count()
                times.append(round(time.time() - t0, 2))
            print(
                json.dumps(
                    {
                        "scale": label,
                        "query": name,
                        "rows": rows,
                        "cold_s": times[0],
                        "warm_s": min(times[1:]),
                    }
                ),
                flush=True,
            )
        if path:
            shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
