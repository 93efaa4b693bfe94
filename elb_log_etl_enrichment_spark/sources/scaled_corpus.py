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

#: key DOMAIN → every (table, column) that draws from it. Strides are
#: computed PER DOMAIN (max across all member columns + 1), never per
#: table: a per-table stride desynchronizes join keys across copies —
#: e.g. events.user_id joins customer.c_custkey in the enrichment
#: queries, and with separate strides copy-1 user 3 would point at an
#: ORIGINAL customer (or, past the key range, at nothing), silently
#: breaking the docstring's referential-integrity claim
#: (code-review r05 finding; the old orphan test only passed because
#: max(o_custkey) happened to equal max(c_custkey) in this data).
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "custkey": [
        ("orders", "o_custkey"),
        ("customer", "c_custkey"),
        ("events", "user_id"),
    ],
    "eventkey": [("events", "event_id")],
    "dockey": [("documents", "doc_id")],
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
    tables = sorted({t for cols in KEY_DOMAINS.values() for t, _ in cols})
    dfs = {t: load_table(spark, src_dir, t) for t in tables}
    stride = {
        dom: max(
            (dfs[t].agg(F.max(c)).first()[0] or 0) for t, c in cols
        )
        + 1
        for dom, cols in KEY_DOMAINS.items()
    }
    shifted_cols = {
        t: [(c, stride[dom]) for dom, cols in KEY_DOMAINS.items() for tt, c in cols if tt == t]
        for t in tables
    }
    for t in tables:
        df = dfs[t]
        parts = []
        for i in range(n):
            p = df
            for c, s in shifted_cols[t]:
                p = p.withColumn(c, F.col(c) + F.lit(i * s))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest_dir}/{t}.parquet")
