"""Deterministic sampling & dataset-split tier.

Training-data pipelines need samples and train/val/test splits that
are (a) reproducible run-to-run, (b) independent of physical layout
(partition count, file order, cluster size), and (c) auditable by an
external engine. Spark's built-in ``df.sample()`` fails (b): it draws
per-partition from a seeded RNG, so a repartition or a different file
split silently changes WHICH rows are kept. Every operator here
instead derives its decision from a portable 60-bit content hash —
``conv(substring(md5(key), 1, 15), 16, 10)`` on the Spark side,
``('0x' || substr(md5(key), 1, 15))::UBIGINT`` in DuckDB — the same
recipe `queries_profiling.table_content_digest` uses for cross-system
integrity. Sampling becomes a pure row-local predicate:

* no shuffle and no RNG state — the filter rides the scan stage and
  whole-stage codegen, embarrassingly parallel at any cluster size;
* the keep/drop decision for a row is a function of its KEY alone, so
  reruns, backfills, and incremental ingest agree forever;
* the DuckDB oracle replays the identical decision, so the sample
  membership itself is hash-checked, not just its size.

Decisions are domain-separated by a salt prefix (``uniform|``,
``strat|``, ``split|``…) so e.g. the 5 % uniform sample is NOT a
subset of the 20 % stratified tier — independent decisions need
independent hash inputs.

Reference grounding: the reference has no sampling surface at all
(elb_logs.py processes 100 % of parsed lines); this tier is part of
the mandated LLM-pipeline generalization, same family as the
leakage-safe split audit in plans/queries_training.py (which splits
by near-dup CLUSTER; here the unit is the natural entity key).

Scale notes (100 TB): the sample predicate evaluates one md5 per row
inside codegen — no exchange, no state, no skew sensitivity. The
split AUDIT aggregates carry one row per (split,) or (priority,)
group. `per-group top-k sample` is the only window consumer and
partitions by the group key like every other ranking query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register

#: Buckets for rate arithmetic: rates are integers out of 10_000
#: (basis points), so every threshold compare is exact integer math —
#: no double rounding anywhere in the keep/drop decision.
BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Portable deterministic bucket in [0, BUCKETS): 60-bit md5
    prefix of ``salt || key`` reduced mod BUCKETS. Identical in DuckDB
    as ``('0x' || substr(md5(salt || key), 1, 15))::UBIGINT % 10000``.
    The 60-bit prefix keeps the value exact in both engines' integer
    types (UBIGINT there, LONG here — < 2^60 ≤ Long.MAX, r7);
    mod-10k bias is 2^-47, i.e. none. Bit-parity on random keys is
    pinned against DuckDB in test_sampling.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    )
    # LONG, not decimal(20,0): the 60-bit value (< 2^60 ≤ Long.MAX)
    # casts losslessly, and the decimal modulo was the tier's hot-path
    # cost — 2.0 s vs 0.8 s for the 600k-row bucket filter at sf0.1
    # (r7; decimal arithmetic runs outside the fast integer codegen
    # path). The DuckDB twin (_sql_bucket, UBIGINT) is unchanged —
    # identical values, identical buckets.
    return h.cast("long") % BUCKETS


def _sql_bucket(key_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (key_expr must be VARCHAR)."""
    return (
        f"(('0x' || substr(md5('{salt}' || {key_expr}), 1, 15))::UBIGINT "
        f"% {BUCKETS})"
    )


# --------------------------------------------------------------------------
# Uniform deterministic sample: keep o_orderkey iff bucket < rate.
# --------------------------------------------------------------------------
UNIFORM_BP = 500  # 5.00 % in basis points

_U_BUCKET = _sql_bucket("CAST(o_orderkey AS VARCHAR)", "uniform|")


@register(
    "deterministic_uniform_sample",
    sql=f"""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS total_price,
           CAST({_U_BUCKET} AS BIGINT) AS sample_bucket
    FROM orders
    WHERE {_U_BUCKET} < {UNIFORM_BP}
    """,
    tags=("sampling", "deterministic", "filter", "llm_pipeline"),
)
def deterministic_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 % uniform sample of ``orders``, membership decided by the
    portable key hash — the layout-independent replacement for
    ``df.sample(0.05)``. The predicate is row-local (scan-stage
    codegen, zero exchanges); the oracle replays the exact same
    membership, so this is the rare sample whose CONTENT is
    hash-verified across engines. Returning the bucket column keeps
    the decision auditable downstream."""
    o = _t(spark, sf_dir, "orders")
    b = hash_bucket(F.col("o_orderkey"), "uniform|")
    return (
        o.withColumn("sample_bucket", b)
        .filter(F.col("sample_bucket") < UNIFORM_BP)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).cast("double").alias("total_price"),
            "sample_bucket",
        )
    )


# --------------------------------------------------------------------------
# Stratified sample: per-stratum basis-point rates via a CASE rate
# table, then one audit aggregate per stratum.
# --------------------------------------------------------------------------
#: Per-priority sampling rates in basis points: up-sample the rare
#: urgent tiers, down-sample the bulk — the canonical curation move
#: (quality-tiered retention) expressed as pure integer thresholds.
STRAT_BP = {
    "1-URGENT": 2000,
    "2-HIGH": 1000,
}
STRAT_DEFAULT_BP = 200

_S_BUCKET = _sql_bucket("CAST(o_orderkey AS VARCHAR)", "strat|")
_S_RATE_SQL = (
    "CASE o_orderpriority "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRAT_BP.items())
    + f" ELSE {STRAT_DEFAULT_BP} END"
)


@register(
    "stratified_sample_audit",
    sql=f"""
    SELECT o_orderpriority,
           CAST({_S_RATE_SQL} AS BIGINT)                    AS rate_bp,
           CAST(COUNT(*) AS BIGINT)                         AS n_total,
           CAST(COUNT(*) FILTER (WHERE {_S_BUCKET} < {_S_RATE_SQL})
                AS BIGINT)                                  AS n_sampled,
           CAST(ROUND(SUM(CASE WHEN {_S_BUCKET} < {_S_RATE_SQL}
                               THEN CAST(o_totalprice AS DECIMAL(18,6))
                               ELSE 0 END), 2) AS DOUBLE)   AS sampled_revenue
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sampling", "stratified", "agg", "llm_pipeline"),
)
def stratified_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling with per-stratum rates
    (urgent 20 %, high 10 %, rest 2 %) and its audit in ONE pass: the
    keep-decision is the same hash-vs-threshold compare with the
    threshold looked up from a CASE rate table, and the per-stratum
    totals/samples come out of a single grouped aggregate over the
    full table (conditional aggregation — no second scan, no join
    between sample and population). Revenue sums in DECIMAL so the
    audit is order-independent across engines."""
    o = _t(spark, sf_dir, "orders")
    rate = F.lit(STRAT_DEFAULT_BP)
    for k, v in reversed(STRAT_BP.items()):
        rate = F.when(F.col("o_orderpriority") == k, F.lit(v)).otherwise(rate)
    b = hash_bucket(F.col("o_orderkey"), "strat|")
    keep = b < rate
    return (
        o.withColumn("rate_bp", rate.cast("long"))
        .groupBy("o_orderpriority", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(keep).alias("n_sampled"),
            F.round(
                F.sum(
                    F.when(
                        keep, F.col("o_totalprice").cast("decimal(18,6)")
                    ).otherwise(F.lit(0).cast("decimal(18,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("sampled_revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Leakage-proof train/val/test split: hash the ENTITY key (customer),
# not the row key, so every order of a customer lands in one split.
# --------------------------------------------------------------------------
TRAIN_BP, VAL_BP = 8000, 9000  # [0,8000) train, [8000,9000) val, rest test

_SPLIT_BUCKET = _sql_bucket("CAST(o_custkey AS VARCHAR)", "split|")


@register(
    "leakproof_customer_split",
    sql=f"""
    WITH assigned AS (
        SELECT o_custkey, o_totalprice,
               CASE WHEN {_SPLIT_BUCKET} < {TRAIN_BP} THEN 'train'
                    WHEN {_SPLIT_BUCKET} < {VAL_BP}   THEN 'val'
                    ELSE 'test' END AS split
        FROM orders
    ),
    leak AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT o_custkey FROM assigned
              GROUP BY o_custkey HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT)                  AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE)                           AS revenue,
           (SELECT n FROM leak)                      AS leaked_customers
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
    tags=("sampling", "split", "leakage", "agg", "llm_pipeline"),
)
def leakproof_customer_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment hashed on ``o_custkey`` —
    the entity-granular split that makes cross-split leakage
    impossible BY CONSTRUCTION (all of a customer's orders share the
    customer's bucket), plus the audit that proves it: the
    ``leaked_customers`` column counts customers observed in more
    than one split and must be 0. Complements
    `queries_training.leakage_safe_split_audit`, which splits by
    near-dup cluster; here the unit is the natural entity key and the
    whole assignment is one row-local CASE (no clustering
    prerequisite, no shuffle to assign). The audit itself is one
    grouped aggregate plus a customer-level distinct — both partition
    on the same key."""
    o = _t(spark, sf_dir, "orders")
    b = hash_bucket(F.col("o_custkey"), "split|")
    split = (
        F.when(b < TRAIN_BP, F.lit("train"))
        .when(b < VAL_BP, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    assigned = o.select(
        "o_custkey", "o_totalprice", split.alias("split")
    )
    leak = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_customers"))
    )
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("revenue"),
    )
    # leak is a 1-row frame -> broadcast cross join stamps the audit
    # column onto each split row without an exchange.
    return per_split.crossJoin(F.broadcast(leak)).orderBy("split")


# --------------------------------------------------------------------------
# Per-group deterministic top-k sample: k rows per group, chosen by
# hash order — a reservoir-sample replacement whose picks are stable.
# --------------------------------------------------------------------------
GROUP_K = 3

_G_BUCKET = _sql_bucket("CAST(c_custkey AS VARCHAR)", "gk|")


@register(
    "per_nation_deterministic_sample",
    sql=f"""
    SELECT n_name, c_custkey, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT n.n_name, c.c_custkey,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_name
                   ORDER BY {_G_BUCKET}, c.c_custkey) AS rk
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE rk <= {GROUP_K}
    ORDER BY n_name, rk
    """,
    tags=("sampling", "window", "join", "llm_pipeline"),
)
def per_nation_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ``k`` customers per nation, selected by ranking the
    portable hash within each group — same guarantees as a per-group
    reservoir sample (uniform over the group) but deterministic and
    engine-replayable. ``c_custkey`` breaks the (astronomically
    unlikely) hash tie so row_number is total. One exchange on the
    group key, the same shape as every ranking-window query; the
    nation dim joins broadcast."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    b = hash_bucket(F.col("c_custkey"), "gk|")
    w = Window.partitionBy("n_name").orderBy(b.asc(), F.col("c_custkey").asc())
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_K)
        .orderBy("n_name", "rk")
    )


# --------------------------------------------------------------------------
# Temporal train/test split with an embargo gap (backtest hygiene)
# --------------------------------------------------------------------------

#: train/test cut at 80% of the observed time span; 1-day embargo.
_EMBARGO_MS = 86_400_000


@register(
    "temporal_embargo_split_audit",
    sql=f"""
    WITH b AS (
        SELECT MIN(epoch_ms(ts)) AS mn,
               MIN(epoch_ms(ts))
               + (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) * 8 // 10 AS cut
        FROM events
    ),
    tagged AS (
        SELECT user_id,
               CASE WHEN epoch_ms(ts) <= b.cut THEN 'train'
                    WHEN epoch_ms(ts) <= b.cut + {_EMBARGO_MS}
                        THEN 'embargo'
                    ELSE 'test' END AS part,
               epoch_ms(ts) AS ms
        FROM events CROSS JOIN b
    ),
    agg AS (
        SELECT COUNT(CASE WHEN part = 'train' THEN 1 END) AS n_train,
               COUNT(CASE WHEN part = 'embargo' THEN 1 END)
                   AS n_embargo_dropped,
               COUNT(CASE WHEN part = 'test' THEN 1 END) AS n_test,
               MAX(CASE WHEN part = 'train' THEN ms END) AS mx_train,
               MIN(CASE WHEN part = 'test' THEN ms END) AS mn_test
        FROM tagged
    ),
    overlap AS (
        SELECT COUNT(*) AS users_in_both FROM (
            SELECT DISTINCT user_id FROM tagged WHERE part = 'train'
        ) tr JOIN (
            SELECT DISTINCT user_id FROM tagged WHERE part = 'test'
        ) te USING (user_id)
    )
    SELECT CAST(agg.n_train AS BIGINT) AS n_train,
           CAST(agg.n_embargo_dropped AS BIGINT) AS n_embargo_dropped,
           CAST(agg.n_test AS BIGINT) AS n_test,
           CAST(CASE WHEN agg.n_train > 0 AND agg.n_test > 0
                     AND agg.mn_test - agg.mx_train > {_EMBARGO_MS}
                THEN 1 ELSE 0 END AS BIGINT) AS gap_ok,
           CAST(overlap.users_in_both AS BIGINT) AS users_in_both
    FROM agg CROSS JOIN overlap
    """,
    tags=("sampling", "split", "temporal", "llm_pipeline"),
)
def temporal_embargo_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split with an embargo gap — the split
    hygiene for forecasting / sequence models, where hash splits
    (``leakproof_customer_split``) leak future context into training.
    Cut at 80 % of the observed span (pure epoch-ms integer math),
    drop a 1-day embargo band after the cut (so lag/rolling features
    computed on train rows can't peek across the boundary), and audit
    the result: partition row counts, a proof the realized gap
    exceeds the embargo, and how many users appear on both sides
    (expected for panel data — reported, not forbidden; the
    entity-granular alternative is the hash split).

    Scale shape (r10): one events scan into ONE per-user rollup that
    feeds both the 5-slot global aggregate and the train∩test overlap
    count — all map-side combinable, no windows, no global sort, no
    branch re-scans.
    """
    e = _t(spark, sf_dir, "events")
    ms = F.expr("unix_millis(ts)")
    b = e.agg(
        F.min(ms).alias("mn"),
        (
            F.min(ms)
            + F.expr(
                "(max(unix_millis(ts)) - min(unix_millis(ts))) * 8 div 10"
            )
        ).alias("cut"),
    )
    tagged = e.crossJoin(F.broadcast(b)).select(
        "user_id",
        F.when(ms <= F.col("cut"), "train")
        .when(ms <= F.col("cut") + _EMBARGO_MS, "embargo")
        .otherwise("test")
        .alias("part"),
        ms.alias("ms"),
    )
    # ONE per-user rollup feeds the global counts AND the overlap
    # (r10): the old shape referenced `tagged` three times (global agg
    # + two DISTINCT arms), re-running the events scan per branch. All
    # five global stats merge from per-user partials, and
    # users_in_both is a count_if over the same rollup — one events
    # pass, one map-combined user shuffle, identical results.
    per_user = tagged.groupBy("user_id").agg(
        F.count(F.when(F.col("part") == "train", 1)).alias("u_train"),
        F.count(F.when(F.col("part") == "embargo", 1)).alias("u_embargo"),
        F.count(F.when(F.col("part") == "test", 1)).alias("u_test"),
        F.max(F.when(F.col("part") == "train", F.col("ms"))).alias("u_mx_train"),
        F.min(F.when(F.col("part") == "test", F.col("ms"))).alias("u_mn_test"),
    )
    agg = per_user.agg(
        # coalesce: SUM over an empty rollup is NULL where the old
        # direct COUNT was 0 — the empty-corpus row must stay all-zero
        F.coalesce(F.sum("u_train"), F.lit(0)).alias("n_train"),
        F.coalesce(F.sum("u_embargo"), F.lit(0)).alias("n_embargo_dropped"),
        F.coalesce(F.sum("u_test"), F.lit(0)).alias("n_test"),
        F.max("u_mx_train").alias("mx_train"),
        F.min("u_mn_test").alias("mn_test"),
        # user_id IS NOT NULL (ADVICE r10): the oracle counts overlap
        # via a DISTINCT self-join, which drops NULL keys; the rollup
        # keeps a NULL-user group, so exclude it explicitly — current
        # fixtures never produce NULL user_ids, making this a parity
        # guard, not a result change.
        F.count_if(
            F.col("user_id").isNotNull()
            & (F.col("u_train") > 0)
            & (F.col("u_test") > 0)
        ).alias("users_in_both"),
    )
    return agg.select(
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_embargo_dropped").cast("long").alias("n_embargo_dropped"),
        F.col("n_test").cast("long").alias("n_test"),
        F.when(
            (F.col("n_train") > 0)
            & (F.col("n_test") > 0)
            & (F.col("mn_test") - F.col("mx_train") > _EMBARGO_MS),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("gap_ok"),
        F.col("users_in_both").cast("long").alias("users_in_both"),
    )


# --------------------------------------------------------------------------
# Shard-rebalance audit: rendezvous (HRW) hashing vs mod-hashing when
# the shard count changes. Resharding 16 → 20 with mod-hash moves
# ~(1 - 1/20 - gcd-share) of all keys — nearly everything re-shuffles;
# highest-random-weight hashing moves only the keys whose argmax shard
# is one of the NEW shards (~4/20). Both assignments are portable md5
# arithmetic, so the audit itself is hash-verified cross-engine.
# --------------------------------------------------------------------------
_HRW_OLD = 16
_HRW_NEW = 20


def _hrw_sql(key_expr: str, n: int) -> str:
    """DuckDB argmax-by-weight shard pick: GREATEST of n md5 weights,
    then the first shard whose weight equals the max."""
    w = [
        f"(('0x' || substr(md5('hrw{s}|' || {key_expr}), 1, 15))::UBIGINT)"
        for s in range(n)
    ]
    mx = f"GREATEST({', '.join(w)})"
    case = " ".join(
        f"WHEN {w[s]} = {mx} THEN {s}" for s in range(n)
    )
    return f"(CASE {case} END)"


def _hrw_col(key, n: int):
    """Spark twin of :func:`_hrw_sql` via array + array_position."""
    weights = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"hrw{s}|"), key.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            # long: lossless for the 60-bit value; max/position compare
            # identically and integer ops stay in codegen (r7)
            ).cast("long")
            for s in range(n)
        ]
    )
    return (F.array_position(weights, F.array_max(weights)) - 1).cast("long")


@register(
    "shard_rebalance_audit",
    sql=f"""
    WITH k AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders
    ),
    a AS (
        SELECT {_hrw_sql('key', _HRW_OLD)} AS hrw_old,
               {_hrw_sql('key', _HRW_NEW)} AS hrw_new,
               {_sql_bucket('key', 'shard|')} % {_HRW_OLD} AS mod_old,
               {_sql_bucket('key', 'shard|')} % {_HRW_NEW} AS mod_new
        FROM k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(CASE WHEN hrw_old <> hrw_new THEN 1 END) AS BIGINT)
               AS hrw_moved,
           CAST(COUNT(CASE WHEN hrw_old <> hrw_new THEN 1 END) * 10000
                // COUNT(*) AS BIGINT) AS hrw_moved_bp,
           CAST(COUNT(CASE WHEN mod_old <> mod_new THEN 1 END) AS BIGINT)
               AS mod_moved,
           CAST(COUNT(CASE WHEN mod_old <> mod_new THEN 1 END) * 10000
                // COUNT(*) AS BIGINT) AS mod_moved_bp
    FROM a
    """,
    tags=("sampling", "sharding", "rendezvous", "rebalance"),
)
def shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many keys move when resharding 16 → 20?  Rendezvous
    hashing (argmax over per-shard md5 weights) relocates only keys
    whose winning weight now belongs to a NEW shard — ~2000 bp —
    while mod-hashing relocates ~7500+ bp (everything whose residue
    changes).  At 100 TB that is the difference between re-shuffling
    a twentieth of the corpus and re-shuffling most of it on every
    topology change.  Row-local expressions only (20 md5s per key,
    codegen'd), one 5-slot summary aggregate, zero joins; both
    engines compute identical assignments so the audit hash-matches
    exactly."""
    o = _t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    mod = hash_bucket(key, "shard|")
    a = o.select(
        _hrw_col(key, _HRW_OLD).alias("hrw_old"),
        _hrw_col(key, _HRW_NEW).alias("hrw_new"),
        (mod % _HRW_OLD).alias("mod_old"),
        (mod % _HRW_NEW).alias("mod_new"),
    )
    moved = F.count(F.when(F.col("hrw_old") != F.col("hrw_new"), 1))
    mod_moved = F.count(F.when(F.col("mod_old") != F.col("mod_new"), 1))
    return a.agg(
        F.count(F.lit(1)).alias("n_keys"),
        moved.alias("hrw_moved"),
        F.expr(
            "CAST(count(CASE WHEN hrw_old <> hrw_new THEN 1 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("hrw_moved_bp"),
        mod_moved.alias("mod_moved"),
        F.expr(
            "CAST(count(CASE WHEN mod_old <> mod_new THEN 1 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("mod_moved_bp"),
    )
