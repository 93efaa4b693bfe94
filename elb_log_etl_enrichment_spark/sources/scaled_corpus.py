"""Key-shifted N× corpus generator — reproduces the PERF.md scale
stresses.

Replicates each fact table N times with primary/foreign keys shifted
by ``i · (max_key + 1)`` per copy, so volume scales N× while (a)
referential integrity holds (customer keys shift with orders), (b)
per-key distributions are preserved exactly (each user/customer/order
reappears once per copy under a fresh key), and (c) document text
replicates verbatim — the crawl-snapshot duplicate-density worst case
for the near-dup tier. Dimension tables (region/nation/part/supplier,
embeddings) copy unscaled: more volume over the same dims is the
realistic growth axis.

Usage::

    from elb_log_etl_enrichment_spark.sources.scaled_corpus import (
        write_scaled_corpus,
    )
    write_scaled_corpus(spark, "/root/testdata/sf0.1", "/tmp/sfx10", n=10)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .tables import load_table

#: fact table → key columns shifted per copy (PK and the FKs that
#: must move with it to keep joins referentially intact)
SHIFTED: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}

#: copied verbatim (dimensions + the embedding corpus)
UNSCALED: tuple[str, ...] = ("region", "nation", "supplier", "part", "embeddings")


def write_scaled_corpus(
    spark: SparkSession, src_dir: str, dest_dir: str, n: int = 10
) -> None:
    """Materialize the N× corpus under ``dest_dir`` (one parquet dir
    per table, same layout as the source scale-factor dirs)."""
    for t in UNSCALED:
        load_table(spark, src_dir, t).write.mode("overwrite").parquet(
            f"{dest_dir}/{t}.parquet"
        )
    for t, keys in SHIFTED.items():
        df = load_table(spark, src_dir, t)
        mx = {k: (df.agg(F.max(k)).first()[0] or 0) + 1 for k in keys}
        parts = []
        for i in range(n):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * mx[k]))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest_dir}/{t}.parquet")
