"""Text-dedup tier scale-stress (VERDICT r03 item 5).

Builds an n-copy variant of the documents table under the same
key-shift protocol as layout/streaming stress — copy k shifts doc_id
by k * (max_id + 1) AND rewrites every token with a copy-k prefix, so
the shingle/vocabulary domain grows with the data instead of turning
every row into an exact cross-copy duplicate (a plain copy would make
candidate growth quadratic BY CONSTRUCTION and measure nothing about
the banding). Within-copy near-dup structure replicates exactly, so
the sub-quadratic contract is: true pairs grow ~n×, candidate pairs
grow ~n×, wall time grows ≲ n×.

For the two band-key miners the script also counts RAW candidate
pairs straight off the band tables (sum over buckets of c·(c−1)/2),
which is the quantity the LSH design bounds.

Run:  python scripts/textdedup_stress.py [sf_dir] [n_copies]
Emits one JSON line per (query, copies) with rows-out, candidate
counts where applicable, and cold + 2 warm wall times.
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

QUERIES = (
    "minhash_lsh_near_dup",
    "ngram_jaccard_near_dup",
    "simhash_near_dup",
    "shingle_containment_pairs",
)


def build_corpus(spark, sf_dir: str, n: int) -> str:
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    base = tempfile.mkdtemp(prefix="textdedup_stress_")
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mi")).collect()[0]
    parts = []
    for k in range(n):
        text = F.regexp_replace(F.col("text"), r"(\S+)", rf"c{k}_$1")
        parts.append(
            d.select(
                (F.col("doc_id") + k * (mx.mi + 1)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    from functools import reduce

    reduce(lambda a, b: a.unionByName(b), parts).write.parquet(
        f"{base}/documents.parquet"
    )
    return base


def raw_candidates(spark, base: str) -> dict[str, int]:
    """Bucket-pair volume straight off the band tables: the quantity
    the banding bounds, before any distinct/verify."""
    from elb_log_etl_enrichment_spark.operators.text_dedup import (
        SIMHASH_BLOCK_BITS,
        SIMHASH_BLOCKS,
        minhash_band_keys,
        simhash,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    d = load_table(spark, base, "documents")
    pair_sum = (F.sum(F.col("c") * (F.col("c") - 1) / 2)).cast("long")
    mh = (
        minhash_band_keys(d)
        .groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(pair_sum.alias("p"))
        .collect()[0]
        .p
    )
    sig = simhash(d)
    dom = 1 << SIMHASH_BLOCK_BITS
    byte_blocks = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        (
                            F.shiftright(F.col("simhash"), SIMHASH_BLOCK_BITS * k)
                            % dom
                        ).alias("byte"),
                    )
                    for k in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk")
    ).select("blk.k", "blk.byte")
    sh = (
        byte_blocks.groupBy("k", "byte")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(pair_sum.alias("p"))
        .collect()[0]
        .p
    )
    return {"minhash_band_pairs": int(mh), "simhash_block_pairs": int(sh)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = [1, int(sys.argv[2]) if len(sys.argv) > 2 else 10]

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.session import get_spark

    spark = get_spark(app_name="textdedup_stress")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()

    for n in copies:
        base = build_corpus(spark, sf_dir, n)
        try:
            cands = raw_candidates(spark, base)
            print(json.dumps({"copies": n, "sf_dir": sf_dir, **cands}), flush=True)
            for name in QUERIES:
                times = []
                rows = None
                for _ in range(3):
                    spark.catalog.clearCache()  # miners persist shingles
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
                        }
                    ),
                    flush=True,
                )
        finally:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
