"""Python Data Source (Spark 4): the synthetic ALB generator is
partition-parallel, deterministic, and parser-compatible."""

from __future__ import annotations

from elb_log_etl_enrichment_spark.sources.synthetic_elb import make_line, register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("elb_synthetic")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_partitioning_and_determinism(spark):
    df = _read(spark, partitions=4, rows_per_partition=50, seed=7)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    # same options -> identical corpus; different seed -> different
    a = sorted(r["value"] for r in df.collect())
    b = sorted(r["value"] for r in _read(spark, partitions=4, rows_per_partition=50, seed=7).collect())
    c = sorted(r["value"] for r in _read(spark, partitions=4, rows_per_partition=50, seed=8).collect())
    assert a == b and a != c
    # and matches the pure-Python generator exactly
    expected = sorted(make_line(7, p, i) for p in range(4) for i in range(50))
    assert a == expected


def test_source_feeds_the_elb_parser(spark):
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.sources.elb_logs import parse_elb_lines

    parsed = parse_elb_lines(_read(spark, partitions=2, rows_per_partition=200, seed=1))
    rows = parsed.count()
    assert rows == 400  # no corrupt-line fallout from the generator
    stats = parsed.agg(
        F.count_if(F.col("time").isNull()).alias("bad_ts"),
        F.count_if(F.col("elb_status_code").isNull()).alias("bad_status"),
        F.count_if(F.col("client_ip_port").isNull()).alias("bad_ip"),
        F.count_if(
            F.col("request_processing_time").isNull()
            & (F.col("elb_status_code") < 500)
        ).alias("bad_rpt"),
    ).collect()[0]
    assert tuple(stats) == (0, 0, 0, 0)
    # the '-' sentinel on 5xx parses to NULL, never to a string error
    fivehundreds = parsed.filter("elb_status_code >= 500")
    assert fivehundreds.count() > 0
    assert fivehundreds.filter("request_processing_time IS NOT NULL").count() == 0


def test_streaming_source_is_deterministic_and_exactly_once(spark, tmp_path):
    """The streaming tier must (a) deliver the same splitmix64 lines
    the offline generator defines, with no duplicates across
    micro-batches, and (b) resume from the checkpoint after a restart
    without re-emitting committed batches."""
    import time

    from elb_log_etl_enrichment_spark.sources.synthetic_elb import (
        make_line,
        register,
    )

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_until(min_rows, timeout_s=60):
        q = (
            spark.readStream.format("elb_synthetic")
            .option("rows_per_batch", 50)
            .option("seed", 7)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= min_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)

    run_until(150)  # ≥3 committed micro-batches
    first = spark.read.parquet(out).count()
    run_until(first + 100)  # restart from checkpoint, make progress

    got = [r.value for r in spark.read.parquet(out).collect()]
    n_batches = len(got) // 50
    assert len(got) == n_batches * 50  # whole batches only
    expected = [
        make_line(7, b, r) for b in range(n_batches) for r in range(50)
    ]
    assert sorted(got) == sorted(expected)  # deterministic, no dup/loss


def test_scaled_corpus_preserves_integrity(spark, tmp_path):
    """The N× generator must scale fact volume exactly N×, keep every
    FK resolvable (no orphans introduced), and keep per-key history
    shape (each scaled user has exactly the original row count)."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.sources.scaled_corpus import (
        write_scaled_corpus,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "x3")
    write_scaled_corpus(spark, src, dst, n=3)
    for t in ("lineitem", "orders", "customer", "events", "documents"):
        assert (
            load_table(spark, dst, t).count()
            == 3 * load_table(spark, src, t).count()
        ), t
    o = load_table(spark, dst, "orders")
    c = load_table(spark, dst, "customer")
    orphans = o.join(
        c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    ).count()
    assert orphans == 0
    # per-user event volume preserved under each shifted key; the
    # user/custkey DOMAIN stride (shared across events.user_id,
    # c_custkey, o_custkey — code-review r05) is what folds copies back
    src_e = load_table(spark, src, "events")
    src_c = load_table(spark, src, "customer")
    src_o = load_table(spark, src, "orders")
    stride = (
        max(
            src_e.agg(F.max("user_id")).first()[0],
            src_c.agg(F.max("c_custkey")).first()[0],
            src_o.agg(F.max("o_custkey")).first()[0],
        )
        + 1
    )
    per_user_src = src_e.groupBy("user_id").count()
    per_user_dst = (
        load_table(spark, dst, "events")
        .withColumn("user_id", F.col("user_id") % stride)
        .groupBy("user_id")
        .count()
        .withColumn("count", (F.col("count") / 3).cast("long"))
    )
    assert per_user_src.exceptAll(per_user_dst).count() == 0
    # cross-domain join parity: events.user_id joins customer.c_custkey
    # in the enrichment queries; with per-TABLE strides copy-k users
    # pointed at original customers (or nothing) — matched volume must
    # scale exactly Nx
    def matched(d):
        return (
            load_table(spark, d, "events")
            .join(
                load_table(spark, d, "customer").select(
                    F.col("c_custkey").alias("user_id")
                ),
                "user_id",
            )
            .count()
        )

    assert matched(dst) == 3 * matched(src)


def test_committed_corpus_matches_live_source(spark):
    """The oracle for `synthetic_source_status_counts` aggregates the
    COMMITTED corpus parquet; this pin guarantees the live Data Source
    emits exactly those lines for the registry options (r7: the
    rows-only → oracle promotion is only sound under this identity)."""
    from elb_log_etl_enrichment_spark.sources.synthetic_elb import (
        CORPUS_PARQUET,
        CORPUS_PARTITIONS,
        CORPUS_ROWS_PER_PARTITION,
        CORPUS_SEED,
        corpus_lines,
        register,
    )

    register(spark)
    live = sorted(
        r.value
        for r in (
            spark.read.format("elb_synthetic")
            .option("partitions", CORPUS_PARTITIONS)
            .option("rows_per_partition", CORPUS_ROWS_PER_PARTITION)
            .option("seed", CORPUS_SEED)
            .load()
            .collect()
        )
    )
    committed = sorted(
        r.value for r in spark.read.parquet(CORPUS_PARQUET).collect()
    )
    assert live == committed == sorted(corpus_lines())


#: Expected on-disk arrow schema per driver table (VERDICT r08 item
#: 7): the driver's generation has changed shape twice already
#: (events.ts shipped as TIMESTAMP(NANOS) then naive us; lineitem
#: dropped l_shipmode/l_receiptdate), each time costing a mid-sweep
#: mystery. This canary turns the next flip into a 1-minute
#: diagnosis: it loud-fails with the exact expected-vs-found diff.
_EXPECTED_TABLE_SCHEMAS = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


def test_testdata_schema_drift_canary():
    """Fast (no Spark) snapshot of every driver table's parquet
    schema at every generated scale; a driver-generation flip fails
    HERE with the full diff instead of deep inside a sweep."""
    import os

    import pyarrow.parquet as pq

    problems = []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        root = f"/root/testdata/{sf}"
        if not os.path.isdir(root):
            continue
        for table, expected in _EXPECTED_TABLE_SCHEMAS.items():
            path = f"{root}/{table}.parquet"
            if not os.path.exists(path):
                problems.append(f"{sf}/{table}: MISSING FILE")
                continue
            found = [
                (f.name, str(f.type)) for f in pq.read_schema(path)
            ]
            if found != expected:
                gone = [c for c in expected if c not in found]
                new = [c for c in found if c not in expected]
                problems.append(
                    f"{sf}/{table}: expected {expected}\n"
                    f"  found    {found}\n"
                    f"  dropped/changed: {gone}\n"
                    f"  added/changed:   {new}"
                )
    assert not problems, (
        "DRIVER TESTDATA GENERATION CHANGED SHAPE:\n" + "\n".join(problems)
    )
