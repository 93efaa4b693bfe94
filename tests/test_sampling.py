"""Deterministic sampling tier: the guarantees built-in `df.sample`
cannot give — layout independence, rerun stability, leakage-proof
splits — verified directly, plus the rate/plan contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elb_log_etl_enrichment_spark.plans.queries_sampling import (
    GROUP_K,
    STRAT_BP,
    STRAT_DEFAULT_BP,
    UNIFORM_BP,
    deterministic_uniform_sample,
    hash_bucket,
    leakproof_customer_split,
    per_nation_deterministic_sample,
    stratified_sample_audit,
)

SF_DIR = "/root/testdata/sf0.001"


def test_uniform_sample_is_layout_independent(spark):
    """The same rows are kept regardless of physical partitioning —
    the property that motivates hash sampling over df.sample()."""
    base = deterministic_uniform_sample(spark, SF_DIR)
    keys = sorted(r.o_orderkey for r in base.collect())
    assert keys, "sample must be non-empty at sf0.001"

    # Recompute the identical decision over a deliberately reshuffled
    # copy of the input: membership must not move.
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(13)
    b = hash_bucket(F.col("o_orderkey"), "uniform|")
    keys2 = sorted(
        r.o_orderkey
        for r in o.filter(b < UNIFORM_BP).select("o_orderkey").collect()
    )
    assert keys == keys2


def test_uniform_sample_rate_within_binomial_bounds(spark):
    n_total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    n_kept = deterministic_uniform_sample(spark, SF_DIR).count()
    p = UNIFORM_BP / 10_000
    mean = n_total * p
    # 5-sigma binomial envelope: deterministic, so a failure here is a
    # hash-quality bug, not flakiness.
    sigma = (n_total * p * (1 - p)) ** 0.5
    assert abs(n_kept - mean) <= 5 * sigma + 1


def test_stratified_rates_and_single_pass(spark):
    rows = {r.o_orderpriority: r for r in stratified_sample_audit(spark, SF_DIR).collect()}
    assert rows, "orders must have priorities"
    for prio, r in rows.items():
        want_bp = STRAT_BP.get(prio, STRAT_DEFAULT_BP)
        assert r.rate_bp == want_bp
        p = want_bp / 10_000
        sigma = (r.n_total * p * (1 - p)) ** 0.5
        assert abs(r.n_sampled - r.n_total * p) <= 5 * sigma + 1
    # single scan: no join/second aggregate in the plan
    plan = stratified_sample_audit(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_split_is_leakproof_and_total(spark):
    out = leakproof_customer_split(spark, SF_DIR)
    rows = {r.split: r for r in out.collect()}
    assert set(rows) == {"train", "val", "test"}
    assert all(r.leaked_customers == 0 for r in rows.values())
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in rows.values()) == n_orders
    # entity granularity: distinct customers partition across splits
    n_cust = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows.values()) == n_cust


def test_per_group_sample_exact_k(spark):
    out = per_nation_deterministic_sample(spark, SF_DIR)
    counts = out.groupBy("n_name").count().collect()
    assert counts
    # every nation with >= GROUP_K customers yields exactly GROUP_K
    cust_per_nation = {
        r.n_name: r["count"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .count()
        .collect()
    }
    for r in counts:
        assert r["count"] == min(GROUP_K, cust_per_nation[r.n_name])


def test_sample_decisions_are_domain_separated(spark):
    """uniform| and strat| salts must give INDEPENDENT decisions: the
    5% uniform picks are not systematically inside the 2-20% strata
    picks (they would be iff both used the same unsalted hash)."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    u = hash_bucket(F.col("o_orderkey"), "uniform|")
    s = hash_bucket(F.col("o_orderkey"), "strat|")
    both = o.select(
        (u < UNIFORM_BP).alias("in_u"), (s < UNIFORM_BP).alias("in_s")
    )
    agg = both.agg(
        F.count_if(F.col("in_u") & F.col("in_s")).alias("overlap"),
        F.count_if("in_u").alias("nu"),
    ).collect()[0]
    # under independence overlap ~ nu * 5%; identical hashes would
    # give overlap == nu. Require it strictly below half of nu.
    assert agg.overlap < max(2, agg.nu // 2)


def test_uniform_sample_plan_has_no_exchange(spark):
    """The sampling decision itself must be embarrassingly parallel:
    filter + project in the scan stage, zero shuffles."""
    plan = (
        deterministic_uniform_sample(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hrw_monotonicity_only_new_shard_winners_move(spark):
    """The defining consistency property of rendezvous hashing: when
    shards are ADDED, a key either keeps its shard or moves to one of
    the NEW shards — no key reshuffles between surviving shards. And
    the moved fraction tracks the theoretical new-shard share (4/20)
    while mod-hashing scatters ~4/5 of all keys."""
    from pyspark.sql import functions as F

    from elb_log_etl_enrichment_spark.plans.queries import REGISTRY, all_queries
    from elb_log_etl_enrichment_spark.plans.queries_sampling import (
        _HRW_NEW,
        _HRW_OLD,
        _hrw_col,
    )
    from elb_log_etl_enrichment_spark.sources.tables import load_table

    all_queries()
    sf = "/root/testdata/sf0.01"
    o = load_table(spark, sf, "orders")
    a = o.select(
        _hrw_col(F.col("o_orderkey"), _HRW_OLD).alias("old"),
        _hrw_col(F.col("o_orderkey"), _HRW_NEW).alias("new"),
    )
    # monotonicity: moved ⟹ destination is a brand-new shard
    violations = a.filter(
        (F.col("old") != F.col("new")) & (F.col("new") < _HRW_OLD)
    ).count()
    assert violations == 0

    r = REGISTRY["shard_rebalance_audit"].fn(spark, sf).collect()[0]
    assert 1700 <= r.hrw_moved_bp <= 2300   # ~4/20 of keys
    assert 7700 <= r.mod_moved_bp <= 8300   # ~4/5 of keys


def test_hash_bucket_matches_duckdb_on_random_keys(spark):
    """Cross-engine pin of the portable bucket formula itself (r7: the
    Spark side moved from decimal to long arithmetic — exact only
    because the 60-bit conv value fits a long; this differential
    guards the formula against any future 'optimization' that breaks
    bit-parity). Random printable keys incl. unicode, empty string,
    and pipe characters (the salt delimiter)."""
    import random

    import duckdb

    from elb_log_etl_enrichment_spark.plans.queries_sampling import (
        _sql_bucket,
        hash_bucket,
    )

    rng = random.Random(1729)
    alphabet = "abcXYZ0189 |_éß漢-"
    keys = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        for _ in range(500)
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.k: r.b
        for r in df.select(
            "k", hash_bucket(F.col("k"), "prop|").alias("b")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    want = dict(
        con.execute(
            f"SELECT k, CAST({_sql_bucket('k', 'prop|')} AS BIGINT) FROM t"
        ).fetchall()
    )
    assert got == want
