"""Synthesize an sf1-scale testdata directory (VERDICT r03 item 8).

The driver ships sf{0.001,0.01,0.1}; the full-bench 10× sweep needs a
10× corpus, so this builds one from sf0.1 under the key-shift
protocol shared by the stress scripts: copy k shifts every entity key
by k * (max_key + 1) so key domains, group counts, and join fan-outs
grow with the data. Dimension tables (nation, region) stay single —
facts in every copy reference the same 25 nations, exactly how a real
10× grows. Content columns that feed similarity operators are made
copy-distinct (documents: copy-k token prefix; embeddings: rotate the
vector by k positions — norm- and distribution-preserving) so
near-dup volume grows linearly instead of exploding on synthetic
exact duplicates.

Run:  python scripts/make_sf1.py [src_sf_dir] [dst_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _shift(df, col, step, k):
    return df.withColumn(col, (F.col(col) + F.lit(k * step)).cast("long"))


def build(spark, src: str, dst: str, n: int) -> None:
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    t = {
        name: load_table(spark, src, name)
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    mx = {
        "cust": t["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "supp": t["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "part": t["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "ord": t["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "ev": t["events"].agg(F.max("event_id")).first()[0] + 1,
        "user": t["events"].agg(F.max("user_id")).first()[0] + 1,
        "doc": t["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vec": t["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
    }
    dim = t["embeddings"].select(F.size("embedding")).first()[0]

    def copies(name, fn):
        return reduce(
            lambda a, b: a.unionByName(b), [fn(t[name], k) for k in range(n)]
        )

    out = {
        # dims: single copy
        "region": t["region"],
        "nation": t["nation"],
        "customer": copies(
            "customer", lambda d, k: _shift(d, "c_custkey", mx["cust"], k)
        ),
        "supplier": copies(
            "supplier", lambda d, k: _shift(d, "s_suppkey", mx["supp"], k)
        ),
        "part": copies("part", lambda d, k: _shift(d, "p_partkey", mx["part"], k)),
        "orders": copies(
            "orders",
            lambda d, k: _shift(
                _shift(d, "o_orderkey", mx["ord"], k), "o_custkey", mx["cust"], k
            ),
        ),
        "lineitem": copies(
            "lineitem",
            lambda d, k: _shift(
                _shift(
                    _shift(d, "l_orderkey", mx["ord"], k),
                    "l_partkey",
                    mx["part"],
                    k,
                ),
                "l_suppkey",
                mx["supp"],
                k,
            ),
        ),
        # events.user_id references customer keys in the join queries
        "events": copies(
            "events",
            lambda d, k: _shift(
                _shift(d, "event_id", mx["ev"], k), "user_id", mx["cust"], k
            ),
        ),
        "documents": copies(
            "documents",
            lambda d, k: _shift(d, "doc_id", mx["doc"], k)
            .withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"c{k}_$1")
            )
            .withColumn("n_chars", F.length("text").cast("long")),
        ),
        "embeddings": copies(
            "embeddings",
            lambda d, k: _shift(d, "vec_id", mx["vec"], k).withColumn(
                "embedding",
                F.col("embedding")
                if k == 0
                else F.concat(
                    F.slice("embedding", k % dim + 1, dim - k % dim),
                    F.slice("embedding", 1, k % dim),
                ),
            ),
        ),
    }
    os.makedirs(dst, exist_ok=True)
    for name, df in out.items():
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"wrote {name}", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from elb_log_etl_enrichment_spark.session import get_spark

    spark = get_spark(app_name="make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, dst, n)


if __name__ == "__main__":
    main()
